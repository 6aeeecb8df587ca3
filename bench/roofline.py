"""Speed-of-light roofline for the hot kernels (VERDICT r2 #2).

Counts, per kernel family and shape, the arithmetic the kernels actually
issue — MXU matmul FLOPs, VPU elementwise ops, transcendental (exp)
count, and HBM bytes — from the kernels' own blocking parameters plus
the binner's measured per-tile list lengths, then converts each resource
to a time lower bound on TPU v5e and reports measured time as % of the
binding bound.

Peak-rate model (documented assumptions, published v5e numbers):
  MXU bf16             197e12 FLOP/s
  MXU b3 (bf16x3)      197e12/3  — the separable AXIS kernels run the
                       hand-rolled 3-product bf16x3 scheme on TPU since
                       r4 (splat.py _dot_pair; ~2^-16 relative)
  MXU f32 ("highest")  197e12/6  — 6 bf16 passes for f32-exact
                       products; the general/EWA and sorted kernels
                       stay pinned here
  VPU f32              3.9e12 op/s  (8x128 lanes x 4 ALUs x 0.94 GHz)
  exp                  3 VPU ops each (transcendental unit estimate)
  HBM                  819e9 B/s

The counts are exact for matmul/exp (they follow the kernel code); the
elementwise VPU counts are pass-by-pass counts from the kernel bodies
(noted per family). Measured times come from bench/at_scale.py /
bench/profile_binned_bwd.py / bench/profile_step.py and are passed with
--measured "name=ms,..." or read from their defaults recorded in
BASELINE.md.

Usage: python bench/roofline.py [--n 100000] [--sizes 512,1024]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp

MXU_F32 = 197e12 / 6
MXU_B3 = 197e12 / 3
VPU = 3.9e12
EXP_OPS = 3
HBM = 819e9


def bound(mxu_flops, vpu_ops, exps, hbm_bytes, mxu_rate=MXU_F32):
    t_mxu = mxu_flops / mxu_rate
    t_vpu = (vpu_ops + EXP_OPS * exps) / VPU
    t_hbm = hbm_bytes / HBM
    binding = max(("MXU", t_mxu), ("VPU", t_vpu), ("HBM", t_hbm),
                  key=lambda kv: kv[1])
    return t_mxu, t_vpu, t_hbm, binding


def report(name, counts, measured_ms=None, mxu_rate=MXU_F32):
    t_mxu, t_vpu, t_hbm, (which, t) = bound(*counts, mxu_rate=mxu_rate)
    line = (f"{name:34s} SOL {t*1e3:7.3f} ms ({which}-bound; "
            f"mxu {t_mxu*1e3:6.3f} vpu {t_vpu*1e3:6.3f} "
            f"hbm {t_hbm*1e3:6.3f})")
    if measured_ms is not None:
        line += f"  measured {measured_ms:7.2f} ms = {100*t*1e3/measured_ms:5.1f}% SOL"
    print(line)
    return t * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--sizes", default="512,1024")
    ap.add_argument("--measured", default="",
                    help="name=ms comma list to annotate (optional)")
    args = ap.parse_args()
    measured = {}
    for part in args.measured.split(","):
        if "=" in part:
            k, v = part.split("=")
            measured[k] = float(v)

    from tpu_gaussians.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from tpu_gaussians.core import camera as cam
    from tpu_gaussians.core.types import Gaussians
    from tpu_gaussians.ops.common import prepare_splats
    from tpu_gaussians.ops.pallas import binned as bn
    from tpu_gaussians.ops.pallas import sorted as srt
    from tpu_gaussians.ops.pallas import splat as sp

    N = args.n
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    g = Gaussians(
        means=jax.random.uniform(ks[0], (N, 3), jnp.float32, -1.0, 1.0),
        scales=jax.random.uniform(ks[1], (N, 3), jnp.float32, 0.005, 0.03),
        colors=jax.random.uniform(ks[2], (N, 3), jnp.float32),
        opacities=jax.random.uniform(ks[3], (N,), jnp.float32, 0.2, 0.9),
    )

    TWC, TH, NBS, TPS = srt.TWC, srt.TH, srt.NBS, srt.TPS
    GD = srt.GD_ROWS

    for size in [int(x) for x in args.sizes.split(",")]:
        W = H = size
        c = cam.orbit_cameras(1, W, H)
        view, proj = c.view[0], c.proj[0]
        s = jax.jit(lambda gg: prepare_splats(gg, view, proj, W, H))(g)
        tiles_x = (W + TWC - 1) // TWC
        tiles_y = (H + TH - 1) // TH
        n_tiles = tiles_x * tiles_y

        # Dense separable band kernels — the r4 at-scale accum champion
        # (auto-dispatch whenever _sep_fits; binned serves only beyond).
        nb_d, wp_d, hp_d, n_bands_d, rows_d = sp._sep_dims(N, H, W)
        def _sorted_cnt(s_):
            # Mirror splat_accumulate's y-sort: block activity ranges
            # are computed on the y-SORTED arrays.
            order = jnp.argsort(s_.py)
            return sp._sep_prep(
                s_.px[order], s_.py[order], s_.conic_a[order],
                s_.conic_b[order], s_.conic_c[order], s_.op_eff[order],
                s_.feats[order], H, W)[1]
        cnt_d = jax.jit(_sorted_cnt)(s)
        blocks_d = int(jax.device_get(cnt_d).sum())
        br_d = sp.FEAT_PAD * rows_d
        mxu_d = blocks_d * 3 * (2 * br_d * nb_d * wp_d)  # fwd + 2 bwd
        exps_d = blocks_d * nb_d * (wp_d + rows_d) * 2
        vpu_d = blocks_d * (nb_d * (wp_d + rows_d) * 8
                            + 2 * br_d * nb_d
                            + 4 * (2 * br_d * nb_d + 2 * wp_d * nb_d
                                   + br_d * wp_d))
        hbm_d = 3 * n_bands_d * br_d * wp_d * 4
        report(f"dense_sep@{size} kernels fwd+bwd",
               (mxu_d, vpu_d, exps_d, hbm_d),
               measured.get(f"dense_sep@{size}"), mxu_rate=MXU_B3)
        print(f"    [dense_sep@{size}: bands={n_bands_d} nb={nb_d} "
              f"wp={wp_d} active blocks={blocks_d}]")

        for label, cutoff, zsort, cap_default, kk in (
            ("binned_accum_exact", sp.W_CULL, False, 8192,
             bn._k_pairs(N, budget=bn.ACCUM_PAIR_BUDGET,
                         kmin=bn.ACCUM_K_MIN)),
            ("binned_accum_alpha", srt.ALPHA_CUTOFF, False, 8192,
             bn._k_pairs(N, budget=bn.ACCUM_PAIR_BUDGET,
                         kmin=bn.ACCUM_K_MIN)),
            ("sorted", srt.ALPHA_CUTOFF, True, 2048, srt._k_pairs(N)),
        ):
            cap = cap_default
            z = None
            if zsort:
                from tpu_gaussians.ops.projection import camera_z
                z = camera_z(g.means, view)
            _, _, cnt, stats = jax.jit(
                lambda s_, z_: srt._bin_pairs_2d(
                    s_.px, s_.py, s_.sigma_x, s_.sigma_y, s_.op_eff, z_,
                    tiles_x, tiles_y, cap, W, H, cutoff=cutoff,
                    zsort=zsort, k=kk))(s, z)
            cnt = jax.device_get(cnt)[0]
            pairs = int(cnt.sum())
            chunks = int(((cnt + NBS - 1) // NBS).sum())
            S = n_tiles * cap

            if label.startswith("binned"):
                # separable tile kernels (axis footprint), fwd+bwd.
                # r4: the selector matmuls are gone (exact broadcast
                # expansions) and the remaining pair matmuls run b3
                # (3-pass bf16x3) — one fwd matmul + two bwd matmuls of
                # 2*br*NBS*TWC each.
                br = bn.FEAT_PAD * TH  # 128 G2 rows
                mxu_f = chunks * (2 * br * NBS * TWC)
                mxu_b = chunks * (2 * br * NBS * TWC      # gG2
                                  + 2 * TWC * NBS * br)   # gEx
                exps = chunks * NBS * (TWC + TH) * 2      # fwd + bwd rebuild
                # factor builds + g2 expansion + moments + b3 splits
                # (~4 ops per operand element, 3 dots)
                vpu = chunks * (NBS * (TWC + TH) * 8
                                + 2 * br * NBS            # g2 build x2
                                + 4 * (2 * br * NBS + 2 * TWC * NBS
                                       + br * TWC))       # b3 splits
                hbm = (2 * S * GD * 4          # gdense read fwd+bwd
                       + 2 * S * GD * 4        # raw moments write + postpass
                       + 3 * n_tiles * br * TWC * 4)  # acc write + g read
                name = f"{label}@{size}"
                report(name + " kernels fwd+bwd",
                       (mxu_f + mxu_b, vpu, exps, hbm),
                       measured.get(name), mxu_rate=MXU_B3)
                # supporting passes (gather + scatter), HBM-only bound
                hbm_gs = (S * GD * 4 * 2       # gather read+write
                          + S * GD * 4 * 3)    # scatter read g, RMW out
                report(name + " gather+scatter", (0, 0, 0, hbm_gs))
                # binner: pair keys through chunked sort (~14 passes RW)
                kpad = ((N * kk + srt.CHUNK_TARGET - 1)
                        // srt.CHUNK_TARGET) * srt.CHUNK_TARGET
                hbm_bin = kpad * 4 * 2 * 14 + N * 9 * 4
                report(name + " binner sort", (0, 0, 0, hbm_bin))
            else:
                # sorted compositing kernels (axis path), fwd + bwd with
                # EXACT pass counts from the kernel bodies (VERDICT r3
                # #4 — replaces the old "~2x the forward (est)"):
                #
                # forward (_sorted_kernel, per sub-block over sub*TPS):
                #   a_raw concat-build 2 + where/clip 3 + exclusive
                #   cumprod (init 2 + 7 doubling steps x (roll+where+
                #   mul) = 23) + contrib 1 => ~29 passes; one (sub,8)x
                #   (8,TPS) matmul; (TWC+TH) exps per gaussian.
                # backward (_sorted_bwd_kernel, per sub-block):
                #   a_raw 2 + dx/dy concats 3 + pass_g 3 + a_s 3 +
                #   cumprod 23 + t_i/contrib 2 + u 1 + inclusive cumsum
                #   (7 x (roll+where+add) + carry = 22) + g_a 5 + g_e 2
                #   + ux/vy 2 + moment reduces/products 7 + trans/carry
                #   2 => ~72 passes; two matmuls (gf, g_feat); exps
                #   rebuilt once.
                sub = NBS // 4
                FWD_PASSES, BWD_PASSES = 29, 72
                mxu_f = chunks * 4 * 2 * sub * 8 * TPS
                mxu_b = chunks * 4 * 2 * (2 * sub * 8 * TPS)
                exps = chunks * NBS * (TWC + TH) * 2
                vpu = chunks * 4 * (FWD_PASSES + BWD_PASSES) * sub * TPS
                hbm = (2 * S * GD * 4          # gdense read fwd+bwd
                       + S * GD * 4            # raw moments write
                       + 3 * n_tiles * 8 * TPS * 4)
                name = f"sorted@{size}"
                report(name + " kernels fwd+bwd",
                       (mxu_f + mxu_b, vpu, exps, hbm),
                       measured.get(name))
            print(f"    [{label}@{size}: pairs={pairs} chunks={chunks} "
                  f"slots={S} fill={pairs/S:.2f}]")

    # Flagship: separable band kernels, 1200 SH gaussians @ 256^2
    W = H = 256
    N_F = 1200
    kf = jax.random.split(jax.random.PRNGKey(1), 4)
    sh = jnp.zeros((N_F, 4, 3), jnp.float32).at[:, 0].set(
        jax.random.uniform(kf[2], (N_F, 3), jnp.float32))
    gf = Gaussians(
        means=jax.random.uniform(kf[0], (N_F, 3), jnp.float32, -0.6, 0.6),
        scales=jax.random.uniform(kf[1], (N_F, 3), jnp.float32, 0.02, 0.25),
        colors=None, sh=sh,
        opacities=jax.random.uniform(kf[3], (N_F,), jnp.float32, 0.05, 0.95),
    )
    c = cam.orbit_cameras(1, W, H)
    s = jax.jit(lambda gg: prepare_splats(gg, c.view[0], c.proj[0], W, H))(gf)
    nb, wp, hp, n_bands, rows_f = sp._sep_dims(N_F, H, W)
    lo, cnt_b, gdata = jax.jit(
        lambda s_: sp._sep_prep(s_.px, s_.py, s_.conic_a, s_.conic_b,
                                s_.conic_c, s_.op_eff, s_.feats,
                                H, W)[:3])(s)
    blocks = int(jax.device_get(cnt_b).sum())
    br = sp.FEAT_PAD * rows_f
    # r4: selector matmuls replaced by broadcasts; pair matmuls run b3.
    mxu_f = blocks * (2 * br * nb * wp)
    mxu_b = blocks * (2 * br * nb * wp + 2 * wp * nb * br)
    exps = blocks * nb * (wp + rows_f) * 2
    vpu = blocks * (nb * (wp + rows_f) * 8
                    + 2 * br * nb                       # g_mat build x2
                    + 4 * (2 * br * nb + 2 * wp * nb
                           + br * wp))                  # b3 splits
    hbm = (2 * N_F * GD * 4 * n_bands * 0  # gdata resident in VMEM
           + 3 * n_bands * br * wp * 4)
    sol = report("flagship@256 band kernels fwd+bwd",
                 (mxu_f + mxu_b, vpu, exps, hbm),
                 measured.get("flagship"), mxu_rate=MXU_B3)
    print(f"    [flagship: bands={n_bands} nb={nb} wp={wp} "
          f"active blocks={blocks}]")
    if "flagship_step" in measured:
        ms = measured["flagship_step"]
        print(f"    full step measured {ms:.3f} ms -> kernel SOL share "
              f"{100*sol/ms:.1f}%; the remainder is launch/fusion overhead "
              f"+ prepare/loss/Adam (see bench/trace_step.py)")


if __name__ == "__main__":
    main()
