"""Multi-pass separable path (r5 VERDICT #3): streaming gaussian
super-blocks through the band kernels must be EXACT vs the single-pass
path (accumulation is order-independent; backward emits per-super-block
grads), and the pass-range intersection must partition the per-band
active ranges. Reference anchor: renderer.cu:27-104 scales the scatter
to 1M in the reference viewer (model_viewer_main.cpp:158); this is the
TPU answer beyond VMEM capacity."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpu_gaussians.ops.pallas import splat as sp


def _mk(n, key=0):
    ks = jax.random.split(jax.random.PRNGKey(key), 6)
    px = jax.random.uniform(ks[0], (n,), jnp.float32, 0.0, 64.0)
    py = jax.random.uniform(ks[1], (n,), jnp.float32, 0.0, 64.0)
    ca = jax.random.uniform(ks[2], (n,), jnp.float32, 0.05, 0.5)
    cb = jnp.zeros((n,), jnp.float32)
    cc = jax.random.uniform(ks[3], (n,), jnp.float32, 0.05, 0.5)
    op = jax.random.uniform(ks[4], (n,), jnp.float32, 0.1, 0.9)
    feats = jax.random.uniform(ks[5], (n, sp.FEAT_DIM), jnp.float32)
    return px, py, ca, cb, cc, op, feats


class TestPassRanges:
    def test_partition(self):
        # Random per-band ranges; the per-pass intersections must tile
        # them exactly.
        rng = np.random.RandomState(0)
        n_blocks = 37
        lo = jnp.asarray(rng.randint(0, n_blocks, (1, 16)), jnp.int32)
        cnt = jnp.asarray(rng.randint(0, n_blocks, (1, 16)), jnp.int32)
        cnt = jnp.minimum(cnt, n_blocks - lo)
        for sbb in (1, 4, 16, 64):
            total = np.zeros((1, 16), np.int64)
            for b0, b1 in sp._sep_pass_bounds(n_blocks, sbb):
                lo_s, cnt_s = sp._sep_pass_ranges(lo, cnt, b0, b1)
                lo_s, cnt_s = np.asarray(lo_s), np.asarray(cnt_s)
                assert (cnt_s >= 0).all()
                assert (lo_s + cnt_s <= b1 - b0).all()
                total += cnt_s
            np.testing.assert_array_equal(total, np.asarray(cnt))

    def test_capacity_blocks_inverts_fits(self):
        # The pass-size model and _sep_fits must agree at the boundary.
        for wp in (256, 512, 1024):
            rows = sp.SEP_ROWS_LARGE
            nb = 512
            sbb = sp._sep_capacity_blocks(wp, rows, nb, backward=True)
            assert sp._sep_fits(sbb * nb, wp, backward=True)
            assert not sp._sep_fits((sbb + 1) * nb, wp, backward=True)


class TestMultipassParity:
    @pytest.mark.parametrize("n", [1500, 3000])
    def test_forced_multipass_matches_single(self, n, monkeypatch):
        px, py, ca, cb, cc, op, feats = _mk(n)

        def run():
            def f(px_, feats_):
                acc = sp._splat(px_, py, ca, cb, cc, op, feats_,
                                64, 64, True)
                return jnp.sum(acc * jnp.cos(acc)), acc
            (val, acc), grads = jax.value_and_grad(
                f, argnums=(0, 1), has_aux=True)(px, feats)
            return np.asarray(acc), [np.asarray(g) for g in grads]

        acc1, g1 = run()
        # Shrink the VMEM budget so the same problem needs >= 3 passes.
        nbv = sp._v2_block(n)
        temps = int((128 + sp.FEAT_PAD * sp._sep_rows(n) + 64) * 512 * 4
                    * sp.SEP_TEMPS_MARGIN)
        budget = temps + (n // 3 + nbv) * sp.GD_ROWS * 4 * 2
        monkeypatch.setattr(sp, "SEP_VMEM_BUDGET", budget)
        sbb = sp._sep_capacity_blocks(128, sp._sep_rows(n), nbv, True)
        assert sbb * nbv < n, "patched budget must force multiple passes"
        accm, gm = run()

        np.testing.assert_allclose(accm, acc1, rtol=0, atol=1e-5)
        for a, b in zip(gm, g1):
            np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)
