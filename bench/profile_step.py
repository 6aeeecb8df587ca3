"""Stage-level breakdown of the bench.py train step (STATUS.md gap #3).

Times each pipeline stage with the marginal-scan method (K2-step scan
minus K1-step scan, all on device, durations read from the PROFILER
trace — r4: the stages dropped under ~0.1 ms, below the wall-clock
marginal's ~ms host-jitter floor, so wall timing printed 0.000 rows)
at the bench config: 1200 SH gaussians, 256x256, one view. Stages:

  splat_fwd      Pallas accumulation kernel alone
  splat_fwdbwd   kernel + hand-fused VJP (via jax.grad of a sum)
  render_fwd     prepare + kernel + resolve (render_accum)
  loss_grad      full value_and_grad of the loss stack
  full_step      loss_grad + Adam + grad stats (== bench.py)

Usage: python bench/profile_step.py [--size 256] [--n 1200]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp

from tpu_gaussians.utils.cache import enable_compilation_cache


def marginal(jf, args, k1=16, k2=216, reps=2):
    def run(k):
        out = jf(*args, k)
        float(jax.tree.leaves(out)[0].reshape(-1)[0])  # sync via fetch

    run(k1)
    run(k2)  # warm/compile both trip counts

    from tpu_gaussians.utils.profiling import device_program_times_us

    try:
        # Select the two scan executions BY PROGRAM NAME (the chained
        # driver below is always `multi` -> trace name "jit_multi"), in
        # trace order — the r4 rank-by-duration pick could grab an
        # unrelated program if any fetch/convert event outran the K1
        # scan (advisor finding). Sanity-gate on d2/d1 ~ k2/k1 before
        # trusting the pair; otherwise fall through to wall timing.
        durs = device_program_times_us(lambda: (run(k1), run(k2)),
                                       prefix="jit_multi")
        if len(durs) == 2:
            d1, d2 = durs
            ratio = d2 / max(d1, 1e-9)
            if 0.2 * k2 / k1 <= ratio <= 5.0 * k2 / k1:
                return max((d2 - d1) * 1e-6 / (k2 - k1), 1e-9)
    except Exception:
        pass
    # Fallback: wall marginal (coarse below ~1 ms/stage).
    def timed(k):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            run(k)
            best = min(best, time.perf_counter() - t0)
        return best
    return max((timed(k2) - timed(k1)) / (k2 - k1), 1e-9)


def chain(fn):
    """fn(x) -> scalar; returns jitted (x, k) -> scalar running fn k times
    with a data dependence so XLA cannot elide iterations."""
    def multi(x, k):
        def body(i, carry):
            x2, acc = carry
            out = fn(jax.tree.map(
                lambda a: a + 0.0 * acc if jnp.issubdtype(a.dtype, jnp.floating) else a,
                x2))
            return (x2, out)
        return jax.lax.fori_loop(0, k, body, (x, jnp.float32(0.0)))[1]
    return jax.jit(multi)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--n", type=int, default=1200)
    args = ap.parse_args()

    enable_compilation_cache()

    from tpu_gaussians.core import camera as cam
    from tpu_gaussians.core.types import RenderConfig
    from tpu_gaussians.fit.loss import LossConfig, loss_fn
    from tpu_gaussians.fit.step import init_state, make_optimizer, make_train_step
    from tpu_gaussians.models.gaussian_model import activate, init_params
    from tpu_gaussians.ops.common import prepare_splats
    from tpu_gaussians.ops.dispatch import render_accum
    from tpu_gaussians.ops.pallas.splat import splat_accumulate

    SIZE, N = args.size, args.n
    key = jax.random.PRNGKey(0)
    raw = init_params(key, N, N, use_sh=True)
    g = activate(raw)
    cams = cam.orbit_cameras(1, SIZE, SIZE)
    view = cams.view[0]
    proj = cams.proj[0]
    targets = jax.random.uniform(jax.random.PRNGKey(1), (1, SIZE, SIZE, 3),
                                 jnp.float32)
    zeros = jnp.zeros((1, SIZE, SIZE), jnp.float32)
    rc = RenderConfig(width=SIZE, height=SIZE, impl="auto", return_aux=True)
    lc = LossConfig(silhouette_weight=0.0, depth_weight=0.0)

    s = prepare_splats(g, view, proj, SIZE, SIZE)
    results = {}

    # --- splat forward only (input: SplatInputs)
    def f_splat(si):
        return jnp.sum(splat_accumulate(si, SIZE, SIZE))
    results["splat_fwd"] = marginal(chain(f_splat), (s,))

    # --- splat fwd+bwd
    def f_splatg(si):
        gr = jax.grad(lambda q: jnp.sum(splat_accumulate(q, SIZE, SIZE)))(si)
        return jnp.sum(gr.px) + jnp.sum(gr.feats)
    results["splat_fwdbwd"] = marginal(chain(f_splatg), (s,))

    # --- prepare only, fwd+bwd
    def f_prepg(gg):
        def f(q):
            si = prepare_splats(q, view, proj, SIZE, SIZE)
            return (jnp.sum(si.px) + jnp.sum(si.py) + jnp.sum(si.conic_a)
                    + jnp.sum(si.conic_c) + jnp.sum(si.op_eff)
                    + jnp.sum(si.feats))
        gr = jax.grad(f, allow_int=True)(gg)
        return jnp.sum(gr.means)
    results["prep_fwdbwd"] = marginal(chain(f_prepg), (g,))

    # --- separable (axis-footprint) kernels
    def f_splat_sep(si):
        return jnp.sum(splat_accumulate(si, SIZE, SIZE, axis=True))
    results["splat_fwd_sep"] = marginal(chain(f_splat_sep), (s,))

    def f_splatg_sep(si):
        gr = jax.grad(lambda q: jnp.sum(
            splat_accumulate(q, SIZE, SIZE, axis=True)))(si)
        return jnp.sum(gr.px) + jnp.sum(gr.feats)
    results["splat_fwdbwd_sep"] = marginal(chain(f_splatg_sep), (s,))

    # --- splat fwd+bwd without the py-sort
    def f_splatg_nosort(si):
        gr = jax.grad(lambda q: jnp.sum(
            splat_accumulate(q, SIZE, SIZE, sort=False)))(si)
        return jnp.sum(gr.px) + jnp.sum(gr.feats)
    results["splat_fwdbwd_nosort"] = marginal(chain(f_splatg_nosort), (s,))

    # --- force v2 kernels at this size
    from tpu_gaussians.ops.pallas import splat as splat_mod
    saved = splat_mod.V1_MAX_GRID_STEPS
    splat_mod.V1_MAX_GRID_STEPS = 0
    results["splat_fwd_v2"] = marginal(chain(f_splat), (s,))
    results["splat_fwdbwd_v2"] = marginal(chain(f_splatg), (s,))
    splat_mod.V1_MAX_GRID_STEPS = saved

    # --- full render forward (prepare + kernel + resolve)
    def f_render(gg):
        img, alpha, depth = render_accum(gg, view, proj, rc)
        return jnp.sum(img) + jnp.sum(alpha) + jnp.sum(depth)
    results["render_fwd"] = marginal(chain(f_render), (g,))

    # --- render fwd+bwd (grads wrt gaussian fields)
    def f_renderg(gg):
        gr = jax.grad(lambda q: f_render(q), allow_int=True)(gg)
        return jnp.sum(gr.means)
    results["render_fwdbwd"] = marginal(chain(f_renderg), (g,))

    # --- loss value_and_grad on raw params
    def f_lossg(r):
        def f(tr):
            return loss_fn(r.with_trainable(tr), cams, targets, None, None,
                           rc, lc)
        (lv, _), gr = jax.value_and_grad(f, has_aux=True)(r.trainable())
        return lv + jnp.sum(gr["means"])
    results["loss_grad"] = marginal(chain(f_lossg), (raw,))

    # --- full train step (same as bench.py)
    tx = make_optimizer(0.02)
    inner = make_train_step(tx, rc, lc, False, False, jit=False)

    def multi_step(state, k):
        def body(i, carry):
            st, _ = carry
            st2, m = inner(st, cams, targets, zeros, zeros)
            return (st2, m["loss"])
        return jax.lax.fori_loop(0, k, body, (state, jnp.float32(0.0)))[1]
    jf = jax.jit(multi_step)
    st0 = init_state(raw, tx)
    results["full_step"] = marginal(jf, (st0,))

    print(f"config: N={N} size={SIZE}")
    for name, t in results.items():
        print(f"  {name:14s} {t*1e3:8.3f} ms  ({SIZE*SIZE/t/1e6:8.1f} Mpix/s)")


if __name__ == "__main__":
    main()
