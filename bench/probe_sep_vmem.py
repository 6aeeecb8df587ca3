"""Pin _sep_fits' VMEM model to compiler ground truth (r4 VERDICT #6).

The separable path's capacity model (splat._sep_fits: resident gdata +
`temps = (wp + 8R + 64) * 512 * 4 * 10`) carried a bare ×10 fudge
factor; since r5 the constant sizes the multi-pass super-blocks, so a
mis-model no longer flips dispatch to binned — it just moves a pass
boundary — but the model should still match the machine. The oracle is
Mosaic itself: a kernel whose VMEM demand exceeds the pallas_call's
vmem_limit_bytes (100 MB here, physical 128 MB) FAILS TO COMPILE with a
scoped-vmem RESOURCE_EXHAUSTED. This probe compiles the backward kernel
at model-capacity multiples and reports where the compiler actually
draws the line.

Usage: python bench/probe_sep_vmem.py [--wp 1024] [--rows 32]
Prints one line per probe point: n_pad, model-fits?, compiles?.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--wp", type=int, default=1024)
    ap.add_argument("--rows", type=int, default=0,
                    help="band height R (0 = _sep_rows at scale)")
    ap.add_argument("--mults", default="1.0,1.15,1.3,1.5,1.8")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tpu_gaussians.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from tpu_gaussians.ops.pallas import splat as sp

    wp = args.wp
    rows = args.rows or sp.SEP_ROWS_LARGE
    nb = 512
    n_bands = 4  # band count does not affect VMEM (per-band blocks)
    model_blocks = sp._sep_capacity_blocks(wp, rows, nb, backward=True)
    print(f"wp={wp} rows={rows}: model capacity = {model_blocks * nb} "
          f"({model_blocks} blocks of {nb}; budget "
          f"{sp.SEP_VMEM_BUDGET // (1024*1024)} MB model vs "
          f"100 MB Mosaic limit)")

    for m in [float(x) for x in args.mults.split(",")]:
        n_pad = max(nb, int(model_blocks * m) * nb)
        lo = jnp.zeros((1, n_bands), jnp.int32)
        cnt = jnp.ones((1, n_bands), jnp.int32)
        gdata = jnp.zeros((sp.GD_ROWS, n_pad), jnp.float32)
        gband = jnp.zeros((n_bands * sp.FEAT_PAD * rows, wp), jnp.float32)
        fits = sp._sep_fits(n_pad, wp, backward=True)
        try:
            jax.jit(lambda a, b, c, d: sp._bwd_call_sep(
                a, b, c, d, n_bands, wp, nb, rows)).lower(
                    lo, cnt, gdata, gband).compile()
            ok = True
            err = ""
        except Exception as e:  # noqa: BLE001 — the failure IS the data
            ok = False
            err = str(e).splitlines()[0][:100]
        print(f"  x{m:4.2f} n_pad={n_pad:8d} model_fits={str(fits):5s} "
              f"compiles={ok} {err}", flush=True)


if __name__ == "__main__":
    main()
