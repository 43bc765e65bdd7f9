"""Fatal-error utility (reference src/core/error.rs:23-28).

The reference's ``severe!`` macro logs at error level then panics; here
:func:`severe` logs and raises :class:`SevereError`.  Recoverable scene
problems are logged-and-ignored at their call sites (the three-tier error
philosophy, SURVEY.md §5).
"""

from __future__ import annotations

import logging

log = logging.getLogger("pbrt_tpu")


class SevereError(RuntimeError):
    pass


def severe(msg: str, *args) -> None:
    text = msg % args if args else msg
    log.error(text)
    raise SevereError(text)
