"""Camera math: perspective / look_at / orbit rigs / npz camera I/O.

Numerically identical formulas to the reference's twin implementations
(torch_renderer.py:24-54 and model_viewer_main.cpp:15-75): OpenGL-style
perspective with m[3,2] = -1, right-handed look_at with rows [s; u2; -f],
both row-major float32. Orbit rig matches fit_multiview_stub.py:70-90
(radius 2.5, pitch 0.2, yaw = 2*pi*i/V, fovy 60 deg, near 0.01, far 100).
Camera npz schema matches fit_multiview_stub.py:93-111 (`view`/`proj`
arrays of shape (V,4,4)).
"""

from __future__ import annotations

import math
from pathlib import Path
from typing import Union

import jax.numpy as jnp
import numpy as np

from tpu_gaussians.core.types import Array, Camera


def perspective(
    fovy_deg: float, aspect: float, znear: float, zfar: float
) -> Array:
    """OpenGL-style perspective projection (torch_renderer.py:24-32)."""
    f = 1.0 / math.tan(math.radians(fovy_deg) * 0.5)
    m = np.zeros((4, 4), dtype=np.float32)
    m[0, 0] = f / aspect
    m[1, 1] = f
    m[2, 2] = (zfar + znear) / (znear - zfar)
    m[2, 3] = (2.0 * zfar * znear) / (znear - zfar)
    m[3, 2] = -1.0
    return jnp.asarray(m)


def look_at(eye, target, up) -> Array:
    """Right-handed look_at view matrix (torch_renderer.py:35-54).

    Differentiable in eye/target/up (jnp throughout); the 1e-8 norm guards
    match the reference.
    """
    eye = jnp.asarray(eye, dtype=jnp.float32)
    target = jnp.asarray(target, dtype=jnp.float32)
    up = jnp.asarray(up, dtype=jnp.float32)

    f = target - eye
    f = f / (jnp.linalg.norm(f) + 1e-8)
    u = up / (jnp.linalg.norm(up) + 1e-8)
    s = jnp.cross(f, u)
    s = s / (jnp.linalg.norm(s) + 1e-8)
    u2 = jnp.cross(s, f)

    rot = jnp.eye(4, dtype=jnp.float32)
    rot = rot.at[0, :3].set(s)
    rot = rot.at[1, :3].set(u2)
    rot = rot.at[2, :3].set(-f)

    trans = jnp.eye(4, dtype=jnp.float32)
    trans = trans.at[:3, 3].set(-eye)
    return jnp.matmul(rot, trans, precision="highest")


def camera_position_from_view(view: Array) -> Array:
    """World-space camera center = inv(view)[:3, 3] (torch_renderer.py:81-83).

    Uses the rigid-transform closed form (R^T, -R^T t) instead of a general
    4x4 inverse: cheaper, differentiable, and exact for view matrices.
    """
    rot = view[..., :3, :3]
    t = view[..., :3, 3]
    return -jnp.einsum("...ji,...j->...i", rot, t,
                       precision="highest")


def orbit_cameras(
    num_views: int,
    width: int,
    height: int,
    *,
    radius: float = 2.5,
    pitch: float = 0.2,
    fovy_deg: float = 60.0,
    znear: float = 0.01,
    zfar: float = 100.0,
) -> Camera:
    """Fallback orbit rig (fit_multiview_stub.py:70-90), returned as a
    batched Camera with stacked (V,4,4) matrices."""
    proj = perspective(fovy_deg, width / height, znear, zfar)
    target = jnp.zeros((3,), dtype=jnp.float32)
    up = jnp.asarray([0.0, 1.0, 0.0], dtype=jnp.float32)

    views = []
    for i in range(num_views):
        yaw = (2.0 * math.pi * i) / max(1, num_views)
        eye = jnp.asarray(
            [
                radius * math.cos(pitch) * math.sin(yaw),
                radius * math.sin(pitch),
                radius * math.cos(pitch) * math.cos(yaw),
            ],
            dtype=jnp.float32,
        )
        views.append(look_at(eye, target, up))

    return Camera(
        view=jnp.stack(views, axis=0),
        proj=jnp.broadcast_to(proj, (num_views, 4, 4)),
    )


def load_cameras_npz(path: Union[str, Path], expected_views: int | None = None) -> Camera:
    """Load a camera npz with `view`/`proj` (V,4,4) arrays
    (schema of fit_multiview_stub.py:93-111)."""
    data = np.load(Path(path))
    if "view" not in data or "proj" not in data:
        raise KeyError("camera npz must contain arrays: view (V,4,4), proj (V,4,4)")
    views = np.asarray(data["view"], dtype=np.float32)
    projs = np.asarray(data["proj"], dtype=np.float32)
    if views.ndim != 3 or views.shape[1:] != (4, 4) or projs.shape != views.shape:
        raise ValueError("view/proj must both be (V,4,4)")
    if expected_views is not None and views.shape[0] != expected_views:
        raise ValueError("camera count mismatch with number of target images")
    return Camera(view=jnp.asarray(views), proj=jnp.asarray(projs))


def save_cameras_npz(path: Union[str, Path], cameras: Camera) -> None:
    view = np.asarray(cameras.view, dtype=np.float32)
    proj = np.asarray(cameras.proj, dtype=np.float32)
    if view.ndim == 2:
        view = view[None]
        proj = proj[None]
    np.savez(Path(path), view=view, proj=proj)
