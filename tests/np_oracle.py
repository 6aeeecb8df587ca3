"""Independent NumPy oracle for the renderer math.

A from-scratch float64-capable NumPy implementation of the reference
renderer semantics (torch_renderer.py:57-203 weighted-average mode and
renderer_cpu.cpp:125-257 depth-sorted mode), used as the golden model in
tests. Written directly from the math contract, deliberately in a
different style (dense, unchunked) from both the reference and the
framework code so that agreement is meaningful.
"""

from __future__ import annotations

import numpy as np


def perspective(fovy_deg, aspect, znear, zfar):
    f = 1.0 / np.tan(np.radians(fovy_deg) * 0.5)
    m = np.zeros((4, 4), dtype=np.float64)
    m[0, 0] = f / aspect
    m[1, 1] = f
    m[2, 2] = (zfar + znear) / (znear - zfar)
    m[2, 3] = (2.0 * zfar * znear) / (znear - zfar)
    m[3, 2] = -1.0
    return m


def look_at(eye, target, up):
    eye, target, up = (np.asarray(v, dtype=np.float64) for v in (eye, target, up))
    f = target - eye
    f = f / (np.linalg.norm(f) + 1e-8)
    u = up / (np.linalg.norm(up) + 1e-8)
    s = np.cross(f, u)
    s = s / (np.linalg.norm(s) + 1e-8)
    u2 = np.cross(s, f)
    m = np.eye(4, dtype=np.float64)
    m[0, :3], m[1, :3], m[2, :3] = s, u2, -f
    t = np.eye(4, dtype=np.float64)
    t[:3, 3] = -eye
    return m @ t


def eval_colors(colors, means, view):
    colors = np.asarray(colors, dtype=np.float64)
    if colors.ndim == 2:
        return colors
    inv_view = np.linalg.inv(view)
    cam_pos = inv_view[:3, 3]
    dirs = cam_pos[None, :] - means
    dirs = dirs / (np.linalg.norm(dirs, axis=1, keepdims=True) + 1e-8)
    return (
        colors[:, 0, :]
        + colors[:, 1, :] * dirs[:, 0:1]
        + colors[:, 2, :] * dirs[:, 1:2]
        + colors[:, 3, :] * dirs[:, 2:3]
    )


def _screen_quantities(means, scales, view, proj, width, height):
    n = means.shape[0]
    p_obj = np.concatenate([means, np.ones((n, 1))], axis=1)
    p_cam = p_obj @ view.T
    p_clip = p_cam @ proj.T
    w = p_clip[:, 3]
    w_safe = np.where(np.abs(w) < 1e-8, 1.0, w)
    ndc = p_clip[:, :3] / w_safe[:, None]
    px = (ndc[:, 0] * 0.5 + 0.5) * (width - 1)
    py = (1.0 - (ndc[:, 1] * 0.5 + 0.5)) * (height - 1)
    valid = (ndc[:, 2] >= -1.0) & (ndc[:, 2] <= 1.0) & (w != 0.0)
    z_abs = np.maximum(np.abs(p_cam[:, 2]), 1e-6)
    fx, fy = abs(proj[0, 0]), abs(proj[1, 1])
    sx = np.maximum(np.abs(scales[:, 0]) * 0.5 * width * fx / z_abs, 1.0)
    sy = np.maximum(np.abs(scales[:, 1]) * 0.5 * height * fy / z_abs, 1.0)
    return px, py, z_abs, valid, sx, sy, p_cam[:, 2]


def render_accum(means, scales, colors, opacities, view, proj, width, height,
                 background=(0.0, 0.0, 0.0)):
    """Weighted-average mode -> (image, alpha, depth), float64."""
    means, scales, view, proj = (
        np.asarray(a, dtype=np.float64) for a in (means, scales, view, proj)
    )
    opacities = np.asarray(opacities, dtype=np.float64)
    background = np.asarray(background, dtype=np.float64)

    px, py, z_abs, valid, sx, sy, _ = _screen_quantities(
        means, scales, view, proj, width, height
    )
    col = np.clip(eval_colors(colors, means, view), 0.0, 1.0)
    op = np.maximum(opacities, 0.0)

    ys = np.arange(height, dtype=np.float64) + 0.5
    xs = np.arange(width, dtype=np.float64) + 0.5
    gy, gx = np.meshgrid(ys, xs, indexing="ij")

    dx = gx[None] - px[:, None, None]
    dy = gy[None] - py[:, None, None]
    e = -0.5 * (dx**2 / sx[:, None, None] ** 2 + dy**2 / sy[:, None, None] ** 2)
    w = op[:, None, None] * np.exp(e) * valid[:, None, None]

    wsum = w.sum(axis=0)
    rgb = np.einsum("nhw,nc->hwc", w, col)
    d = np.einsum("nhw,n->hw", w, z_abs)

    image = np.clip((background[None, None] + rgb) / (1.0 + wsum)[..., None], 0, 1)
    alpha = np.clip(wsum / (1.0 + wsum), 0, 1)
    depth = np.maximum(d / (wsum + 1e-6), 0.0)
    return image, alpha, depth


def render_sorted(means, scales, colors, opacities, view, proj, width, height,
                  background=(0.0, 0.0, 0.0), alpha_cutoff=1e-5):
    """Depth-sorted front-to-back mode -> (image, alpha, depth), float64.

    depth is the alpha-weighted expected camera depth
    sum_i contrib_i * z_abs_i / (alpha + 1e-6) — the sorted-mode analog of
    the accumulation depth aux (torch_renderer.py:202-203)."""
    means, scales, view, proj = (
        np.asarray(a, dtype=np.float64) for a in (means, scales, view, proj)
    )
    opacities = np.asarray(opacities, dtype=np.float64)
    background = np.asarray(background, dtype=np.float64)

    px, py, z_abs, valid, sx, sy, zc = _screen_quantities(
        means, scales, view, proj, width, height
    )
    col = np.clip(eval_colors(colors, means, view), 0.0, 1.0)
    op = np.maximum(opacities, 0.0)

    ys = np.arange(height, dtype=np.float64) + 0.5
    xs = np.arange(width, dtype=np.float64) + 0.5
    gy, gx = np.meshgrid(ys, xs, indexing="ij")

    order = np.argsort(-zc, kind="stable")
    rgb = np.zeros((height, width, 3))
    a_acc = np.zeros((height, width))
    d_acc = np.zeros((height, width))
    for i in order:
        if not valid[i]:
            continue
        dx = gx - px[i]
        dy = gy - py[i]
        e = -0.5 * (dx**2 / sx[i] ** 2 + dy**2 / sy[i] ** 2)
        a = op[i] * np.exp(e)
        a = np.where(a < alpha_cutoff, 0.0, np.clip(a, 0.0, 1.0))
        contrib = (1.0 - a_acc) * a
        rgb += contrib[..., None] * col[i][None, None]
        d_acc += contrib * z_abs[i]
        a_acc += contrib
    image = np.clip(rgb + (1.0 - a_acc)[..., None] * background[None, None], 0, 1)
    depth = np.maximum(d_acc / (a_acc + 1e-6), 0.0)
    return image, a_acc, depth
