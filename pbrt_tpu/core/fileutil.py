"""Search-directory-aware filename resolution.

Mirrors /root/reference/src/core/fileutil.rs but fixes its inverted
``is_absolute_path`` (fileutil.rs:29-31 returns ``!is_absolute()`` —
SURVEY.md §2.1 bug list).
"""

from __future__ import annotations

import os
import threading
from pathlib import Path

_lock = threading.Lock()
_search_directory: Path | None = None


def is_absolute_path(filename) -> bool:
    return Path(filename).is_absolute()


def absolute_path(filename) -> Path:
    return Path(filename).resolve()


def resolve_filename(filename) -> Path:
    """Resolve relative to the scene file's directory (fileutil.rs:39-48)."""
    with _lock:
        sd = _search_directory
    p = Path(filename)
    if sd is None or str(filename) == "" or p.is_absolute():
        return p
    return sd / p


def directory_containing(filename) -> Path:
    return Path(filename).resolve().parent


def set_search_directory(dirname) -> None:
    global _search_directory
    with _lock:
        _search_directory = Path(dirname) if dirname is not None else None


def has_extension(path, ext: str) -> bool:
    """Case-insensitive extension test (fileutil.rs:77-83)."""
    return str(path).lower().endswith(str(ext).lower())
