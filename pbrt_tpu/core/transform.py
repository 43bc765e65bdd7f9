"""4x4 transforms: host construction, device application.

Host side mirrors the reference ``Matrix4x4``/``Transform`` semantics
(/root/reference/src/core/transform.rs) — row-major matrices, cached
inverses, translate/rotate/scale/look_at constructors — computed in numpy
float64 for stability, stored at the active Float width.

Composition fixes the reference's inverse-order bug: ``(A*B)^-1`` is
``B^-1 * A^-1`` (transform.rs:618-626 computes ``self.m_inv * rhs.m_inv``,
which is wrong; pbrt-v3 C++ composes ``t2.mInv * mInv`` — SURVEY.md §2.1).

Device side: :func:`apply_point`, :func:`apply_vector`, :func:`apply_normal`
operate on ``[..., 3]`` jnp arrays against a single (4,4) matrix — transforms
are applied to megabatches, never one point at a time.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from pbrt_tpu import float_t


class Transform:
    """A 4x4 matrix and its cached inverse (host)."""

    __slots__ = ("m", "m_inv")

    def __init__(self, m=None, m_inv=None):
        if m is None:
            m = np.eye(4, dtype=np.float64)
        m = np.asarray(m, dtype=np.float64).reshape(4, 4)
        if m_inv is None:
            m_inv = np.linalg.inv(m)
        else:
            m_inv = np.asarray(m_inv, dtype=np.float64).reshape(4, 4)
        self.m = m
        self.m_inv = m_inv

    # -- constructors -----------------------------------------------------

    @staticmethod
    def identity() -> "Transform":
        e = np.eye(4, dtype=np.float64)
        return Transform(e, e.copy())

    @staticmethod
    def translate(delta) -> "Transform":
        dx, dy, dz = (float(v) for v in delta)
        m = np.eye(4)
        m[0, 3], m[1, 3], m[2, 3] = dx, dy, dz
        mi = np.eye(4)
        mi[0, 3], mi[1, 3], mi[2, 3] = -dx, -dy, -dz
        return Transform(m, mi)

    @staticmethod
    def scale(sx, sy, sz) -> "Transform":
        m = np.diag([float(sx), float(sy), float(sz), 1.0])
        mi = np.diag([1.0 / sx, 1.0 / sy, 1.0 / sz, 1.0])
        return Transform(m, mi)

    @staticmethod
    def rotate_x(deg) -> "Transform":
        return Transform.rotate(deg, [1.0, 0.0, 0.0])

    @staticmethod
    def rotate_y(deg) -> "Transform":
        return Transform.rotate(deg, [0.0, 1.0, 0.0])

    @staticmethod
    def rotate_z(deg) -> "Transform":
        return Transform.rotate(deg, [0.0, 0.0, 1.0])

    @staticmethod
    def rotate(deg, axis) -> "Transform":
        """Axis-angle rotation, angle in degrees (transform.rs:444-481)."""
        a = np.asarray(axis, dtype=np.float64)
        a = a / np.linalg.norm(a)
        theta = np.deg2rad(float(deg))
        s, c = np.sin(theta), np.cos(theta)
        m = np.eye(4)
        x, y, z = a
        m[0, 0] = x * x + (1 - x * x) * c
        m[0, 1] = x * y * (1 - c) - z * s
        m[0, 2] = x * z * (1 - c) + y * s
        m[1, 0] = x * y * (1 - c) + z * s
        m[1, 1] = y * y + (1 - y * y) * c
        m[1, 2] = y * z * (1 - c) - x * s
        m[2, 0] = x * z * (1 - c) - y * s
        m[2, 1] = y * z * (1 - c) + x * s
        m[2, 2] = z * z + (1 - z * z) * c
        return Transform(m, m.T.copy())

    @staticmethod
    def look_at(pos, look, up) -> "Transform":
        """World-to-camera from eye/target/up (transform.rs:485-520).

        Builds camera-to-world columns (right, newUp, dir, pos) and stores
        its inverse as the forward matrix — identical to pbrt-v3 LookAt.
        """
        pos = np.asarray(pos, dtype=np.float64)
        look = np.asarray(look, dtype=np.float64)
        up = np.asarray(up, dtype=np.float64)
        dir_ = look - pos
        dir_ = dir_ / np.linalg.norm(dir_)
        upn = up / np.linalg.norm(up)
        right = np.cross(upn, dir_)
        nr = np.linalg.norm(right)
        if nr < 1e-12:
            raise ValueError("look_at: up vector parallel to viewing direction")
        right = right / nr
        new_up = np.cross(dir_, right)
        c2w = np.eye(4)
        c2w[0:3, 0] = right
        c2w[0:3, 1] = new_up
        c2w[0:3, 2] = dir_
        c2w[0:3, 3] = pos
        return Transform(np.linalg.inv(c2w), c2w)

    @staticmethod
    def orthographic(z_near, z_far) -> "Transform":
        return Transform.scale(1.0, 1.0, 1.0 / (z_far - z_near)) * Transform.translate(
            [0.0, 0.0, -z_near]
        )

    @staticmethod
    def perspective(fov_deg, n, f) -> "Transform":
        """Perspective projection (pbrt-v3 §6.2.2)."""
        persp = np.array(
            [
                [1.0, 0.0, 0.0, 0.0],
                [0.0, 1.0, 0.0, 0.0],
                [0.0, 0.0, f / (f - n), -f * n / (f - n)],
                [0.0, 0.0, 1.0, 0.0],
            ]
        )
        inv_tan = 1.0 / np.tan(np.deg2rad(float(fov_deg)) / 2.0)
        return Transform.scale(inv_tan, inv_tan, 1.0) * Transform(persp)

    @staticmethod
    def from_flat(vals) -> "Transform":
        """From 16 scene-file values.

        pbrt scene files store matrices column-major (pbrt-v3
        ``pbrtTransform``); the reference's ``Transform::from([Float;16])``
        reads row-major via Matrix4x4::from — we follow pbrt-v3 proper and
        treat scene-file input as column-major.
        """
        m = np.asarray(vals, dtype=np.float64).reshape(4, 4).T
        return Transform(m)

    # -- algebra ----------------------------------------------------------

    def inverse(self) -> "Transform":
        return Transform(self.m_inv.copy(), self.m.copy())

    def transpose(self) -> "Transform":
        return Transform(self.m.T.copy(), self.m_inv.T.copy())

    def is_identity(self) -> bool:
        return np.allclose(self.m, np.eye(4), atol=1e-12)

    def __mul__(self, other: "Transform") -> "Transform":
        # (A*B)^-1 = B^-1 * A^-1 — fixing transform.rs:618-626.
        return Transform(self.m @ other.m, other.m_inv @ self.m_inv)

    def __eq__(self, other) -> bool:
        return isinstance(other, Transform) and np.allclose(self.m, other.m, atol=1e-10)

    def __repr__(self) -> str:
        return f"Transform({self.m.tolist()})"

    def swaps_handedness(self) -> bool:
        return np.linalg.det(self.m[:3, :3]) < 0.0

    # -- host application -------------------------------------------------

    def apply_p(self, pts):
        """Apply to host points [..., 3] (with homogeneous divide)."""
        pts = np.asarray(pts, dtype=np.float64)
        xyz = pts @ self.m[:3, :3].T + self.m[:3, 3]
        w = pts @ self.m[3, :3].T + self.m[3, 3]
        w = np.where(w == 0.0, 1.0, w)
        return (xyz / w[..., None]).astype(float_t)

    def apply_v(self, vecs):
        vecs = np.asarray(vecs, dtype=np.float64)
        return (vecs @ self.m[:3, :3].T).astype(float_t)

    def apply_n(self, normals):
        normals = np.asarray(normals, dtype=np.float64)
        return (normals @ self.m_inv[:3, :3]).astype(float_t)

    # -- device handoff ---------------------------------------------------

    def device(self):
        """Return (m, m_inv) as float device arrays for jitted use."""
        return (
            jnp.asarray(self.m.astype(float_t)),
            jnp.asarray(self.m_inv.astype(float_t)),
        )


# ---------------------------------------------------------------------------
# Device application (batched over [..., 3])
# ---------------------------------------------------------------------------


def apply_point(m, p):
    """m: (4,4) device matrix; p: [..., 3] points."""
    xyz = p @ m[:3, :3].T + m[:3, 3]
    w = p @ m[3, :3] + m[3, 3]
    w = jnp.where(w == 0.0, 1.0, w)
    return xyz / w[..., None]


def apply_vector(m, v):
    return v @ m[:3, :3].T


def apply_normal(m_inv, n):
    """Normals transform by the inverse transpose: n @ m_inv[:3,:3]."""
    return n @ m_inv[:3, :3]
