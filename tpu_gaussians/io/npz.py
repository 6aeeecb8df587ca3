"""Gaussian npz import/export — exact reference schema.

Export schema (fit_multiview_stub.py:339-354): float32 arrays `means` (N,3),
`scales` (N,3) *activated*, `colors` (N,3) *activated* (for SH models: the
clamped dc term, :333), `opacities` (N,) *activated*, and optionally
`sh_coeffs` (N,4,3). Import tolerates `(N,)` or `(N,1)` opacities
(model_viewer_main.cpp:123-129). Only alive rows are exported, so files
remain loadable by the reference viewers.
"""

from __future__ import annotations

from pathlib import Path
from typing import Union

import numpy as np

from tpu_gaussians.core.types import Gaussians, make_gaussians
from tpu_gaussians.models.gaussian_model import RawParams, activate


def save_gaussians_npz(path: Union[str, Path], g: Gaussians) -> None:
    """Write activated Gaussians (alive rows only) in the reference schema."""
    alive = np.asarray(g.alive_mask()) > 0.5
    means = np.asarray(g.means, dtype=np.float32)[alive]
    scales = np.asarray(g.scales, dtype=np.float32)[alive]
    opacities = np.asarray(g.opacities, dtype=np.float32)[alive]

    arrays = {"means": means, "scales": scales, "opacities": opacities}
    if g.use_sh:
        sh = np.asarray(g.sh, dtype=np.float32)[alive]
        if sh.shape[1] > 4:  # 3DGS convention: dc color = 0.5 + C0*sh0
            from tpu_gaussians.ops.sh import SH_C0

            dc_rgb = 0.5 + SH_C0 * sh[:, 0, :]
        else:  # reference convention: dc IS the color (:333)
            dc_rgb = sh[:, 0, :]
        arrays["colors"] = np.clip(dc_rgb, 0.0, 1.0).astype(np.float32)
        arrays["sh_coeffs"] = sh
    else:
        arrays["colors"] = np.asarray(g.colors, dtype=np.float32)[alive]
    if g.quats is not None:
        # Extension key; reference viewers ignore unknown arrays.
        q = np.asarray(g.quats, dtype=np.float32)[alive]
        q = q / (np.linalg.norm(q, axis=1, keepdims=True) + 1e-12)
        arrays["quaternions"] = q
    np.savez(Path(path), **arrays)


def save_raw_npz(path: Union[str, Path], raw: RawParams) -> None:
    save_gaussians_npz(path, activate(raw))


def load_gaussians_npz(path: Union[str, Path]) -> Gaussians:
    """Load a reference-schema npz into an activated Gaussians pytree."""
    data = np.load(Path(path))
    for k in ("means", "scales", "colors", "opacities"):
        if k not in data:
            raise KeyError(f"gaussians npz missing required array {k!r}")
    means = np.asarray(data["means"], dtype=np.float32)
    scales = np.asarray(data["scales"], dtype=np.float32)
    colors = np.asarray(data["colors"], dtype=np.float32)
    opacities = np.asarray(data["opacities"], dtype=np.float32)
    if opacities.ndim == 2 and opacities.shape[1] == 1:
        opacities = opacities[:, 0]  # (N,1) tolerance, model_viewer_main.cpp:123-129
    sh = None
    if "sh_coeffs" in data:
        sh = np.asarray(data["sh_coeffs"], dtype=np.float32)
    quats = None
    if "quaternions" in data:
        quats = np.asarray(data["quaternions"], dtype=np.float32)
    if sh is not None:
        return make_gaussians(means, scales, opacities, sh=sh, quats=quats)
    return make_gaussians(means, scales, opacities, colors=colors,
                          quats=quats)
