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


def _quat_rotations(quats):
    """(N,4) wxyz -> (N,3,3), float64, via the outer-product identity
    R = (w^2 - q.q) I + 2 q q^T + 2 w [q]_x  (a different construction
    from the framework's element-wise formula; equal for unit q)."""
    q = np.asarray(quats, dtype=np.float64)
    q = q / np.linalg.norm(q, axis=1, keepdims=True)
    w, v = q[:, 0], q[:, 1:]
    n = q.shape[0]
    eye = np.eye(3, dtype=np.float64)
    cross = np.zeros((n, 3, 3), dtype=np.float64)
    cross[:, 0, 1], cross[:, 0, 2] = -v[:, 2], v[:, 1]
    cross[:, 1, 0], cross[:, 1, 2] = v[:, 2], -v[:, 0]
    cross[:, 2, 0], cross[:, 2, 1] = -v[:, 1], v[:, 0]
    return (
        (w**2 - (v * v).sum(axis=1))[:, None, None] * eye[None]
        + 2.0 * v[:, :, None] * v[:, None, :]
        + 2.0 * w[:, None, None] * cross
    )


def conic_ewa(means, scales, quats, view, proj, width, height,
              blur=0.3, min_sigma=0.3):
    """Float64 EWA projected conic (the ops/ewa.py contract, independently
    built from full matrices + np.linalg.inv): per gaussian returns
    (a, b, c, sigma_x, sigma_y) with w = op*exp(-0.5*(a dx^2 + 2b dx dy
    + c dy^2)). Replicates the spec'd guards (blur dilation, covariance
    cap 1e10, PSD cross-term bound, det floor, min_sigma floor)."""
    means, scales, view, proj = (
        np.asarray(a, dtype=np.float64) for a in (means, scales, view, proj)
    )
    n = means.shape[0]
    rot = _quat_rotations(quats)
    # Sigma3 = (R S)(R S)^T with S = diag(s)
    rs = rot * np.asarray(scales, dtype=np.float64)[:, None, :]
    sigma3 = rs @ np.transpose(rs, (0, 2, 1))

    vrot = view[:3, :3]
    t = means @ vrot.T + view[:3, 3]
    tz = t[:, 2]
    tz = np.where(np.abs(tz) < 1e-6,
                  np.where(tz == 0.0, 1e-6, np.sign(tz) * 1e-6), tz)

    fx = abs(proj[0, 0]) * 0.5 * (width - 1)
    fy = abs(proj[1, 1]) * 0.5 * (height - 1)
    inv_mz = 1.0 / (-tz)
    jac = np.zeros((n, 2, 3), dtype=np.float64)
    jac[:, 0, 0] = fx * inv_mz
    jac[:, 0, 2] = fx * t[:, 0] * inv_mz**2
    jac[:, 1, 1] = -fy * inv_mz
    jac[:, 1, 2] = -fy * t[:, 1] * inv_mz**2

    jv = jac @ vrot[None]
    m = jv @ sigma3 @ np.transpose(jv, (0, 2, 1))
    m00 = np.clip(m[:, 0, 0] + blur, 1e-8, 1e10)
    m11 = np.clip(m[:, 1, 1] + blur, 1e-8, 1e10)
    bound = 0.999 * np.sqrt(m00 * m11)
    m01 = np.clip(m[:, 0, 1], -bound, bound)

    # Inverse via np.linalg.inv of the guarded 2x2 (det floored the same
    # way the framework floors it).
    det = np.maximum(m00 * m11 - m01 * m01, 1e-12)
    sigma2 = np.stack(
        [np.stack([m00, m01], axis=1), np.stack([m01, m11], axis=1)], axis=1
    )
    inv = (np.linalg.inv(sigma2)
           * (sigma2[:, 0, 0] * sigma2[:, 1, 1]
              - sigma2[:, 0, 1] ** 2)[:, None, None]
           / det[:, None, None])
    a, b, c = inv[:, 0, 0], inv[:, 0, 1], inv[:, 1, 1]
    sx = np.sqrt(np.maximum(m00, min_sigma**2))
    sy = np.sqrt(np.maximum(m11, min_sigma**2))
    return a, b, c, sx, sy


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
                 background=(0.0, 0.0, 0.0), quats=None):
    """Weighted-average mode -> (image, alpha, depth), float64.

    quats=None: the reference's axis-aligned footprint. quats (N,4) wxyz:
    the EWA footprint (conic from conic_ewa) — the independent oracle for
    the north star's geometry model (VERDICT r2 #4)."""
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
    if quats is None:
        e = -0.5 * (dx**2 / sx[:, None, None] ** 2
                    + dy**2 / sy[:, None, None] ** 2)
    else:
        ca, cb, cc, _, _ = conic_ewa(
            means, scales, quats, view, proj, width, height)
        e = -0.5 * (ca[:, None, None] * dx**2
                    + 2.0 * cb[:, None, None] * dx * dy
                    + cc[:, None, None] * dy**2)
    w = op[:, None, None] * np.exp(e) * valid[:, None, None]

    wsum = w.sum(axis=0)
    rgb = np.einsum("nhw,nc->hwc", w, col)
    d = np.einsum("nhw,n->hw", w, z_abs)

    image = np.clip((background[None, None] + rgb) / (1.0 + wsum)[..., None], 0, 1)
    alpha = np.clip(wsum / (1.0 + wsum), 0, 1)
    depth = np.maximum(d / (wsum + 1e-6), 0.0)
    return image, alpha, depth


def render_sorted(means, scales, colors, opacities, view, proj, width, height,
                  background=(0.0, 0.0, 0.0), alpha_cutoff=1e-5, quats=None):
    """Depth-sorted front-to-back mode -> (image, alpha, depth), float64.

    depth is the alpha-weighted expected camera depth
    sum_i contrib_i * z_abs_i / (alpha + 1e-6) — the sorted-mode analog of
    the accumulation depth aux (torch_renderer.py:202-203).
    quats (N,4) selects the EWA footprint (conic_ewa), else axis-aligned."""
    means, scales, view, proj = (
        np.asarray(a, dtype=np.float64) for a in (means, scales, view, proj)
    )
    opacities = np.asarray(opacities, dtype=np.float64)
    background = np.asarray(background, dtype=np.float64)

    px, py, z_abs, valid, sx, sy, zc = _screen_quantities(
        means, scales, view, proj, width, height
    )
    if quats is not None:
        ca, cb, cc, _, _ = conic_ewa(
            means, scales, quats, view, proj, width, height)
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
        if quats is None:
            e = -0.5 * (dx**2 / sx[i] ** 2 + dy**2 / sy[i] ** 2)
        else:
            e = -0.5 * (ca[i] * dx**2 + 2.0 * cb[i] * dx * dy
                        + cc[i] * dy**2)
        a = op[i] * np.exp(e)
        a = np.where(a < alpha_cutoff, 0.0, np.clip(a, 0.0, 1.0))
        contrib = (1.0 - a_acc) * a
        rgb += contrib[..., None] * col[i][None, None]
        d_acc += contrib * z_abs[i]
        a_acc += contrib
    image = np.clip(rgb + (1.0 - a_acc)[..., None] * background[None, None], 0, 1)
    depth = np.maximum(d_acc / (a_acc + 1e-6), 0.0)
    return image, a_acc, depth
