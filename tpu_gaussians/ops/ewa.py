"""EWA splatting: quaternion rotation + full 3D covariance -> 2D conic.

The north-star superset of the reference's axis-aligned footprint
(BASELINE.json north_star: "3D covariance from quaternion+scale, EWA 2D
projection"; the reference itself never rotates — scales[:,2] is unused,
renderer.cu:47). Math follows the original 3D Gaussian Splatting /
EWA-splatting formulation:

  R = quat_to_rot(q)                     (unit quaternion, wxyz)
  Sigma3 = R diag(s)^2 R^T               world-space covariance
  t = view @ [mean, 1]                   camera-space center
  J = d(pixel)/d(t)                      perspective Jacobian at t, with
                                         this framework's pixel mapping
                                         (x right, y DOWN: the y-flip of
                                         torch_renderer.py:72 folds a sign
                                         into J's second row)
  Sigma2 = J V Sigma3 V^T J^T + blur*I   (V = view rotation; low-pass
                                         dilation, 0.3px like 3DGS)
  conic (a, b, c) = inverse(Sigma2)      footprint: w = op*exp(-0.5*
                                         (a dx^2 + 2b dx dy + c dy^2))

All differentiable jnp; the splat kernels consume the conic directly.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp

from tpu_gaussians.core.types import Array


def quat_to_rot(q: Array) -> Array:
    """(N,4) wxyz quaternions -> (N,3,3) rotation matrices. Normalizes."""
    q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-12)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z),
                       2 * (x * z + w * y)], axis=-1),
            jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z),
                       2 * (y * z - w * x)], axis=-1),
            jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x),
                       1 - 2 * (x * x + y * y)], axis=-1),
        ],
        axis=-2,
    )


class Conic(NamedTuple):
    a: Array        # (N,)
    b: Array        # (N,)
    c: Array        # (N,)
    sigma_x: Array  # (N,) effective x stddev in pixels (for culling/bbox)
    sigma_y: Array  # (N,) effective y stddev in pixels


def axis_aligned_conic(sigma_x: Array, sigma_y: Array) -> Conic:
    """The reference footprint as a conic: a=1/sx^2, b=0, c=1/sy^2."""
    return Conic(
        a=1.0 / (sigma_x * sigma_x),
        b=jnp.zeros_like(sigma_x),
        c=1.0 / (sigma_y * sigma_y),
        sigma_x=sigma_x,
        sigma_y=sigma_y,
    )


def ewa_conic(
    means: Array,
    scales: Array,
    quats: Array,
    view: Array,
    proj: Array,
    width: int,
    height: int,
    blur: float = 0.3,
    min_sigma: float = 0.3,
) -> Conic:
    """Full EWA projected conic for each gaussian.

    means (N,3), scales (N,3), quats (N,4) wxyz, view/proj (4,4).
    `blur` is the screen-space low-pass dilation (pixels^2) ensuring each
    splat covers at least ~a pixel; `min_sigma` floors the eigenvalues.
    """
    rot = quat_to_rot(quats)                      # (N,3,3)
    s2 = scales * scales                          # (N,3)
    # Sigma3 = R S^2 R^T
    rs = rot * s2[:, None, :]                     # R @ diag(s^2)
    # precision="highest" on every contraction: TPU default MXU
    # precision rounds operands to bf16 (~4e-3 rel), which is visible in
    # conic coefficients and broke compiled parity (round-2 audit).
    sigma3 = jnp.einsum("nij,nkj->nik", rs, rot,
                        precision="highest")  # (N,3,3)

    # Camera space.
    vrot = view[:3, :3]
    t = jnp.matmul(means, vrot.T, precision="highest") + view[:3, 3]
    tx, ty, tz = t[..., 0], t[..., 1], t[..., 2]
    tz = jnp.where(jnp.abs(tz) < 1e-6, jnp.sign(tz) * 1e-6 + (tz == 0) * 1e-6,
                   tz)

    # Pixel-space focal lengths for this framework's screen mapping:
    # px = (ndc_x*0.5 + 0.5)*(W-1), ndc_x = fx * tx / (-tz) for the OpenGL
    # proj (w = -tz), so d(px)/d(tx) = 0.5*(W-1)*fx / (-tz).
    fx = jnp.abs(proj[0, 0]) * 0.5 * (width - 1)
    fy = jnp.abs(proj[1, 1]) * 0.5 * (height - 1)
    inv_mz = 1.0 / (-tz)                          # camera looks down -z
    # y-flip: py decreases with ndc_y, so row 2 carries a minus sign.
    j00 = fx * inv_mz
    j02 = fx * tx * inv_mz * inv_mz
    j11 = -fy * inv_mz
    j12 = -fy * ty * inv_mz * inv_mz

    # M = J V Sigma3 V^T J^T with J = [[j00, 0, j02], [0, j11, j12]].
    cov_cam = jnp.einsum("ij,njk,lk->nil", vrot, sigma3, vrot,
                         precision="highest")  # (N,3,3)
    r0 = jnp.stack([j00, jnp.zeros_like(j00), j02], axis=-1)    # (N,3)
    r1 = jnp.stack([jnp.zeros_like(j11), j11, j12], axis=-1)
    m00 = jnp.einsum("ni,nij,nj->n", r0, cov_cam, r0,
                     precision="highest") + blur
    m01 = jnp.einsum("ni,nij,nj->n", r0, cov_cam, r1,
                     precision="highest")
    m11 = jnp.einsum("ni,nij,nj->n", r1, cov_cam, r1,
                     precision="highest") + blur

    # f32 overflow guard: gaussians crossing the camera plane blow the
    # Jacobian up (1/tz^2) and det = m00*m11 - m01^2 becomes inf - inf =
    # NaN, which poisons the accumulators even at zero opacity. Clamp the
    # 2D covariance to a huge-but-finite ceiling and keep it PSD by
    # bounding the cross term below sqrt(m00*m11).
    cap = 1e10
    m00 = jnp.clip(m00, 1e-8, cap)
    m11 = jnp.clip(m11, 1e-8, cap)
    m01_bound = 0.999 * jnp.sqrt(m00 * m11)
    m01 = jnp.clip(m01, -m01_bound, m01_bound)

    det = jnp.maximum(m00 * m11 - m01 * m01, 1e-12)
    a = m11 / det
    b = -m01 / det
    c = m00 / det

    sigma_x = jnp.sqrt(jnp.maximum(m00, min_sigma**2))
    sigma_y = jnp.sqrt(jnp.maximum(m11, min_sigma**2))
    return Conic(a=a, b=b, c=c, sigma_x=sigma_x, sigma_y=sigma_y)
