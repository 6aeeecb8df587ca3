"""Unit tests for the round-4 machinery: permutation-as-matmul y-sort,
the separable path's VMEM feasibility gate, the footprint-aware training
mode resolver, and the bf16x3 pair-matmul scheme."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_gaussians.ops.pallas import splat as sp


class TestPermMatrix:
    def test_matches_argsort_one_hot(self):
        key = jax.random.PRNGKey(0)
        py = jax.random.uniform(key, (600,), jnp.float32, 0.0, 100.0)
        r = np.asarray(sp._perm_matrix_by_y(py))
        order = np.asarray(jnp.argsort(py))
        # R applied to cols reproduces take(cols, order).
        cols = np.asarray(
            jax.random.normal(jax.random.PRNGKey(1), (5, 600)))
        np.testing.assert_allclose(cols @ r, cols[:, order], rtol=0,
                                   atol=0)

    def test_stable_on_ties(self):
        py = jnp.asarray([3.0, 1.0, 3.0, 1.0, 1.0], jnp.float32)
        r = np.asarray(sp._perm_matrix_by_y(py))
        idx = np.arange(5, dtype=np.float64)[None, :]
        order = (idx @ r)[0].astype(int)
        np.testing.assert_array_equal(order, np.asarray(jnp.argsort(py)))

    def test_rows_are_one_hot(self):
        py = jax.random.normal(jax.random.PRNGKey(2), (257,))
        r = np.asarray(sp._perm_matrix_by_y(py))
        assert (r.sum(axis=0) == 1).all() and (r.sum(axis=1) == 1).all()

    def test_splat_uses_matmul_below_cutover(self):
        # The permutation path must agree with the explicit argsort+take
        # path through the full accumulation (600 > 512 triggers the
        # sort; 600 <= SORT_MM_MAX triggers the matmul form).
        from tests.utils import random_scene

        from tpu_gaussians.core import camera as cam
        from tpu_gaussians.ops.common import prepare_splats

        assert 512 < 600 <= sp.SORT_MM_MAX
        g = random_scene(600, seed=3)
        c = cam.orbit_cameras(1, 64, 64)
        s = prepare_splats(g, c.view[0], c.proj[0], 64, 64)
        acc_mm = np.asarray(
            sp.splat_accumulate(s, 64, 64, sort=True, axis=True))
        acc_nosort = np.asarray(
            sp.splat_accumulate(s, 64, 64, sort=False, axis=True))
        # Permuting 600 summands reassociates the accumulation; compare
        # relative to the accumulator scale.
        scale = max(1.0, np.abs(acc_nosort).max())
        assert np.abs(acc_mm - acc_nosort).max() <= 1e-4 * scale


class TestSepFits:
    def test_monotone_in_n(self):
        wp = 1024
        fits = [sp._sep_fits(n, wp, backward=True)
                for n in (1024, 100_000, 300_000, 1_000_000)]
        assert fits == sorted(fits, reverse=True)

    def test_backward_needs_more(self):
        wp = 1024
        # Find an n where fwd fits but bwd does not: fwd resident is half.
        n = 1_000_000
        assert sp._sep_fits(n, wp, backward=False)
        assert not sp._sep_fits(n, wp, backward=True)

    def test_pinned_to_compiler_boundary(self):
        # r5 (VERDICT r4 #6): the model is pinned to the MEASURED Mosaic
        # compile boundary at wp=1024/R=32 (bench/probe_sep_vmem.py,
        # 2026-08-22, 100 MB vmem_limit_bytes): backward COMPILES at
        # n_pad=739,328 and FAILS at 765,952. The model must stay on the
        # safe side of the band and within a recorded tolerance of it
        # (>= 75% — if it drifts conservative again, re-run the probe
        # before loosening this).
        compile_ok, compile_fail = 739_328, 765_952
        cap = sp._sep_capacity_blocks(1024, 32, sp.NB2,
                                      backward=True) * sp.NB2
        assert cap <= compile_ok, "model claims capacity the compiler refused"
        assert cap >= int(0.75 * compile_ok), (
            "model drifted far below the measured compile boundary")

    def test_public_predicate_matches_kernel_gate(self):
        # dispatch and the kernels must share ONE dense/binned decision
        # (r4 review finding: hand-copied gates desynchronize). The
        # public predicate is conservative: it answers for fwd AND bwd.
        assert sp.sep_path_available(600_000, 1024)
        assert not sp.sep_path_available(700_000, 1024)
        assert sp.sep_path_available(100_000, 1024)
        assert sp.sep_path_available(1200, 256)


class TestResolveRenderMode:
    def _cfg(self, **kw):
        from tpu_gaussians.utils.config import FitConfig
        return FitConfig(**kw)

    def test_axis_auto_is_accum(self):
        from tpu_gaussians.utils.config import resolve_render_mode
        assert resolve_render_mode(self._cfg(), 1_000_000) == "accum"

    def test_ewa_small_is_accum(self):
        # r5: the sorted/accum speed crossover measured between 2k and
        # 4k (SORTED_EWA_MIN_CAPACITY=4096); below it accum-dense wins.
        from tpu_gaussians.utils.config import resolve_render_mode
        cfg = self._cfg(footprint="ewa")
        assert resolve_render_mode(cfg, 2_000) == "accum"

    def test_ewa_at_scale_is_sorted(self):
        from tpu_gaussians.utils.config import (
            SORTED_EWA_MIN_CAPACITY,
            resolve_render_mode,
        )
        cfg = self._cfg(footprint="ewa")
        assert resolve_render_mode(
            cfg, SORTED_EWA_MIN_CAPACITY) == "sorted"

    def test_explicit_wins(self):
        from tpu_gaussians.utils.config import resolve_render_mode
        cfg = self._cfg(footprint="ewa", render_mode="accum")
        assert resolve_render_mode(cfg, 1_000_000) == "accum"


class TestDotPairB3:
    @pytest.fixture(autouse=True)
    def _force_b3(self, monkeypatch):
        monkeypatch.setenv("TPUGS_MM_PRECISION", "b3")
        yield

    def test_b3_close_to_exact(self):
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        a = jax.random.normal(k1, (128, 256), jnp.float32)
        b = jax.random.normal(k2, (256, 512), jnp.float32)
        dn = (((1,), (0,)), ((), ()))
        got = np.asarray(sp._dot_pair(a, b, dn))
        want = np.asarray(jax.lax.dot_general(
            a, b, dn, precision="highest",
            preferred_element_type=jnp.float32))
        scale = np.abs(want).max()
        # bf16x3 drops the lo*lo term: ~2^-16 relative.
        assert np.abs(got - want).max() <= 1e-4 * scale

    def test_exact_flag_pins_highest(self):
        k1, k2 = jax.random.split(jax.random.PRNGKey(1))
        a = jax.random.normal(k1, (64, 128), jnp.float32)
        b = jax.random.normal(k2, (128, 128), jnp.float32)
        dn = (((1,), (0,)), ((), ()))
        # env override empty -> exact=True must give the f32 answer.
        import os
        os.environ.pop("TPUGS_MM_PRECISION", None)
        got = np.asarray(sp._dot_pair(a, b, dn, exact=True))
        want = np.asarray(jax.lax.dot_general(
            a, b, dn, precision="highest",
            preferred_element_type=jnp.float32))
        np.testing.assert_allclose(got, want, atol=0, rtol=0)
