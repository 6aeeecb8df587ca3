"""Culling-path correctness: multi-band, multi-block scenes where the
band/block mask actually skips work, must still match the dense oracle
(including gradients through the py-sort gather)."""

import jax
import jax.numpy as jnp
import numpy as np

from tpu_gaussians.core.types import RenderConfig
from tpu_gaussians.ops.common import SplatInputs, prepare_splats
from tpu_gaussians.ops.dispatch import render
from tpu_gaussians.ops.jnp_renderer import accumulate_jnp
from tpu_gaussians.ops.pallas.splat import _band_block_mask, splat_accumulate

from .utils import orbit_camera, random_scene

# 160x128: hw=20480 -> tile 2048 pixels -> 10 bands; N=700 -> 2 blocks
# after padding to 1024... use N=1100 -> padded 1280, blocks of 512? nb
# chooses min(512, ...) => 3 blocks of 512 (padded 1536).
W, H = 128, 160


def _tight_scene(n=1100, seed=0):
    """Small sigmas + clustered y so the mask is genuinely sparse."""
    rng = np.random.default_rng(seed)
    from tpu_gaussians.core.types import make_gaussians

    means = rng.uniform(-0.55, 0.55, size=(n, 3)).astype(np.float32)
    scales = rng.uniform(0.002, 0.01, size=(n, 3)).astype(np.float32)
    opac = rng.uniform(0.2, 0.9, size=(n,)).astype(np.float32)
    colors = rng.uniform(0, 1, size=(n, 3)).astype(np.float32)
    return make_gaussians(means, scales, opac, colors=colors)


def test_mask_is_sparse_for_tight_scene():
    g = _tight_scene()
    c = orbit_camera(W, H)
    s = prepare_splats(g, c.view, c.proj, W, H)
    order = jnp.argsort(s.py)
    s = jax.tree.map(lambda a: a[order], s)

    from tpu_gaussians.ops.pallas.splat import _round_up, _tile_sizes
    n = s.px.shape[0]
    hw = H * W
    nb, tp = _tile_sizes(n, hw)
    n_pad = _round_up(n, nb)
    pad = lambda a, v=0.0: jnp.concatenate(
        [a, jnp.full((n_pad - n,), v, a.dtype)])
    mask = _band_block_mask(pad(s.py), pad(s.sigma_y, 1.0), pad(s.op_eff),
                            _round_up(hw, tp) // tp, tp, nb, W)
    density = float(jnp.mean(mask.astype(jnp.float32)))
    assert density < 0.8, f"mask not sparse: density={density:.2f}"


def test_culled_forward_matches_dense():
    g = _tight_scene(seed=1)
    c = orbit_camera(W, H, index=2)
    s = prepare_splats(g, c.view, c.proj, W, H)
    acc_ref = np.asarray(accumulate_jnp(s, H, W, chunk=128))
    acc_pal = np.asarray(splat_accumulate(s, H, W))
    np.testing.assert_allclose(acc_pal, acc_ref, rtol=1e-4, atol=1e-5)


def test_culled_gradients_match_dense():
    g = _tight_scene(n=600, seed=2)
    c = orbit_camera(W, H)
    target = jnp.full((H, W, 3), 0.4, jnp.float32)

    def loss(means, impl):
        gg = g.replace(means=means)
        cfg = RenderConfig(width=W, height=H, impl=impl, chunk_size=128)
        img = render(gg, c, cfg)
        return jnp.mean(jnp.abs(img - target))

    gj = jax.grad(lambda m: loss(m, "jnp"))(g.means)
    gp = jax.grad(lambda m: loss(m, "pallas"))(g.means)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gj),
                               rtol=5e-4, atol=1e-6)


def test_vmapped_render_pallas():
    """The loss vmaps render over views; pallas_call (+SMEM mask input)
    must batch correctly."""
    from tpu_gaussians.core import camera as cam

    g = _tight_scene(n=600, seed=3)
    cams = cam.orbit_cameras(3, W, H)
    cfg_p = RenderConfig(width=W, height=H, impl="pallas")
    cfg_j = RenderConfig(width=W, height=H, impl="jnp", chunk_size=128)
    imgs_p = render(g, cams, cfg_p)
    imgs_j = render(g, cams, cfg_j)
    assert imgs_p.shape == (3, H, W, 3)
    np.testing.assert_allclose(np.asarray(imgs_p), np.asarray(imgs_j),
                               rtol=1e-4, atol=1e-5)


def test_v2_range_kernels_match_dense(monkeypatch):
    """Force the v2 (range-loop) kernels on a small scene and check both
    forward and gradient parity against the dense jnp oracle."""
    from tpu_gaussians.ops.pallas import splat as S

    monkeypatch.setattr(S, "V1_MAX_GRID_STEPS", 0)  # always pick v2

    g = _tight_scene(n=700, seed=9)
    c = orbit_camera(W, H)
    s = prepare_splats(g, c.view, c.proj, W, H)
    acc_ref = np.asarray(accumulate_jnp(s, H, W, chunk=128))
    acc_pal = np.asarray(splat_accumulate(s, H, W))
    np.testing.assert_allclose(acc_pal, acc_ref, rtol=1e-4, atol=1e-5)

    target = jnp.full((H, W, 3), 0.3, jnp.float32)

    def loss(means, impl):
        gg = g.replace(means=means)
        cfg = RenderConfig(width=W, height=H, impl=impl, chunk_size=128)
        img = render(gg, c, cfg)
        return jnp.mean(jnp.abs(img - target))

    gj = jax.grad(lambda m: loss(m, "jnp"))(g.means)
    gp = jax.grad(lambda m: loss(m, "pallas"))(g.means)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gj),
                               rtol=5e-4, atol=1e-6)


def test_mask_bit_packing_roundtrip():
    from tpu_gaussians.ops.pallas.splat import _pack_mask_bits

    rng = np.random.default_rng(0)
    mask = (rng.uniform(size=(7, 70)) < 0.3).astype(np.int32)
    packed = np.asarray(_pack_mask_bits(jnp.asarray(mask)))
    assert packed.shape == (7, 3)  # ceil(70/32) words
    for i in range(7):
        for k in range(70):
            bit = (packed[i, k >> 5] >> (k & 31)) & 1
            assert bit == mask[i, k], (i, k)
