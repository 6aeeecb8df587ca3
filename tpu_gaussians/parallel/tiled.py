"""Tiled (row-band) single-frame rendering across a device mesh.

Large-frame render parallelism (SURVEY.md §5 "tile/pixel parallelism …
optionally across chips for big frames"). Training already shards image
rows via GSPMD (parallel/sharded.py), but the Pallas render kernels are
opaque to the partitioner, so distributed *rendering* of one frame uses
`shard_map`: every device holds the full (replicated) gaussians and
renders its own horizontal band, and the bands concatenate into the
frame — no cross-device communication at all after the broadcast.

A band is rendered as a ROW WINDOW: projection runs against the full
(H, W) viewport, then per-gaussian screen y is shifted by the band's
first row (weights depend only on gy - py, so the shift is exact) and
the splat stage evaluates just band_rows of pixels. Every quantity —
projection, sigma, validity, depth order — is bit-identical to the
full-frame render; only the pixel subset differs.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from tpu_gaussians.core.types import Camera, Gaussians, RenderConfig


def render_tiled(
    gaussians: Gaussians,
    camera: Camera,
    config: RenderConfig,
    mesh: Optional[Mesh] = None,
    n_devices: Optional[int] = None,
):
    """Render ONE frame with its rows sharded across devices.

    Returns the same structure as ops.dispatch.render (image or tuple
    with aux, per config.mode/return_aux) at full (H, W) resolution.
    `mesh` may be any 1-axis mesh; default builds one over `n_devices`
    (or all) local devices.
    """
    import numpy as np

    from tpu_gaussians.ops.dispatch import render_accum, render_sorted

    if camera.batched:
        raise ValueError("render_tiled expects a single (unbatched) camera")
    if mesh is None:
        devs = jax.devices()[: (n_devices or len(jax.devices()))]
        mesh = Mesh(np.asarray(devs), ("bands",))
    axis = mesh.axis_names[0]
    n_bands = mesh.shape[axis]

    band_rows = -(-config.height // n_bands)
    band_config = config.replace(height=band_rows,
                                 proj_height=config.full_height())

    def render_band(g, view, proj):
        row0 = (jax.lax.axis_index(axis) * band_rows).astype(jnp.float32)
        if config.mode == "sorted":
            image, alpha, depth = render_sorted(g, view, proj, band_config,
                                                row0=row0)
        else:
            image, alpha, depth = render_accum(g, view, proj, band_config,
                                               row0=row0)
        out = (image, alpha, depth) if config.return_aux else image
        return jax.tree.map(lambda a: a[None], out)

    # check_vma off: the band render is embarrassingly parallel (no
    # collectives), and the varying-axis analysis rejects unvarying scan
    # carries inside the per-band renderer.
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map
    try:
        smap = shard_map(render_band, mesh=mesh, in_specs=(P(), P(), P()),
                         out_specs=P(axis), check_vma=False)
    except TypeError:  # older jax spells it check_rep
        smap = shard_map(render_band, mesh=mesh, in_specs=(P(), P(), P()),
                         out_specs=P(axis), check_rep=False)
    out = jax.jit(smap)(gaussians, camera.view, camera.proj)

    def assemble(a):  # (n_bands, band_rows, W, ...) -> (H, W, ...)
        return a.reshape((n_bands * band_rows,) + a.shape[2:])[
            : config.height]

    return jax.tree.map(assemble, out)
