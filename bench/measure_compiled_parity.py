"""Measure (don't assert) the compiled-TPU parity deltas the test tier
gates on, per kernel family — the source of tests/test_tpu_compiled.py's
tolerances. Prints max image diffs vs the float64 oracle / the compiled
jnp path and max per-param grad diffs relative to grad scale.

Usage (TPU): python bench/measure_compiled_parity.py
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from tpu_gaussians.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from tpu_gaussians.core import camera as cam
    from tpu_gaussians.core.types import RenderConfig
    from tpu_gaussians.ops.dispatch import render_accum, render_sorted

    from tests import np_oracle
    from tests.utils import random_scene

    W = H = 128
    g = random_scene(300, seed=0)
    c = cam.orbit_cameras(1, W, H)
    view, proj = c.view[0], c.proj[0]

    def grads(render_fn, cfg):
        def loss(gg):
            out = render_fn(gg, view, proj, cfg)
            return jnp.sum(out[0] * jnp.cos(
                jnp.arange(out[0].size).reshape(out[0].shape) * 0.01))
        return jax.jit(jax.grad(loss))(g)

    def report(tag, render_fn, cfg_p, cfg_j, oracle_img):
        img_p = np.asarray(jax.jit(
            lambda gg: render_fn(gg, view, proj, cfg_p)[0])(g))
        img_j = np.asarray(jax.jit(
            lambda gg: render_fn(gg, view, proj, cfg_j)[0])(g))
        lines = [f"{tag}:"]
        if oracle_img is not None:
            lines.append(f"  img vs f64 oracle: pallas "
                         f"{np.abs(img_p - oracle_img).max():.2e}, jnp "
                         f"{np.abs(img_j - oracle_img).max():.2e}")
        lines.append(f"  img pallas vs jnp: "
                     f"{np.abs(img_p - img_j).max():.2e}")
        gp, gj = grads(render_fn, cfg_p), grads(render_fn, cfg_j)
        for name in ("means", "scales", "opacities"):
            a = np.asarray(getattr(gp, name))
            b = np.asarray(getattr(gj, name))
            scale = max(np.abs(b).max(), 1e-3)
            lines.append(f"  grad {name}: absmax {np.abs(a - b).max():.2e}"
                         f"  rel {np.abs(a - b).max() / scale:.2e}")
        print("\n".join(lines), flush=True)

    ref_accum, _, _ = np_oracle.render_accum(
        np.asarray(g.means), np.asarray(g.scales), np.asarray(g.colors),
        np.asarray(g.opacities), np.asarray(view), np.asarray(proj), W, H)
    ref_sorted, _, _ = np_oracle.render_sorted(
        np.asarray(g.means), np.asarray(g.scales), np.asarray(g.colors),
        np.asarray(g.opacities), np.asarray(view), np.asarray(proj), W, H)

    cj = RenderConfig(width=W, height=H, impl="jnp", chunk_size=64)
    for binned in ("off", "on"):
        report(f"accum axis binned={binned}", render_accum,
               RenderConfig(width=W, height=H, impl="pallas",
                            accum_binned=binned),
               cj, ref_accum)
    report("sorted axis", render_sorted,
           RenderConfig(width=W, height=H, impl="pallas", mode="sorted"),
           RenderConfig(width=W, height=H, impl="jnp", mode="sorted",
                        chunk_size=64), ref_sorted)
    report("accum ewa", render_accum,
           RenderConfig(width=W, height=H, impl="pallas",
                        footprint="ewa"),
           RenderConfig(width=W, height=H, impl="jnp", chunk_size=64,
                        footprint="ewa"), None)


if __name__ == "__main__":
    main()
