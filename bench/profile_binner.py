"""Marginal device-time breakdown of _bin_pairs_2d's internal stages.

Each stage re-runs everything upstream of it (so the marginal difference
between consecutive rows is that stage's own cost; DCE of upstream work
is prevented by consuming every stage's output in the returned scalar).

Usage: python bench/profile_binner.py --n 1000000
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--width", type=int, default=960)
    ap.add_argument("--height", type=int, default=540)
    args = ap.parse_args()

    from tpu_gaussians.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    sys.path.insert(0, str(Path(__file__).parent))
    from profile_sorted_marginal import marginal
    from tpu_gaussians.core import camera as cam
    from tpu_gaussians.core.types import Gaussians
    from tpu_gaussians.ops.common import prepare_splats
    from tpu_gaussians.ops.pallas import sorted as srt
    from tpu_gaussians.ops.projection import camera_z

    N, W, H = args.n, args.width, args.height
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)
    g = Gaussians(
        means=jax.random.uniform(ks[0], (N, 3), jnp.float32, -1.0, 1.0),
        scales=jax.random.uniform(ks[1], (N, 3), jnp.float32, 0.005, 0.03),
        colors=jax.random.uniform(ks[2], (N, 3), jnp.float32),
        opacities=jax.random.uniform(ks[3], (N,), jnp.float32, 0.2, 0.9),
    )
    c = cam.orbit_cameras(1, W, H)
    view, proj = c.view[0], c.proj[0]

    s = jax.jit(lambda gg: prepare_splats(gg, view, proj, W, H))(g)
    z = jax.jit(lambda gg: camera_z(gg.means, view))(g)
    jax.block_until_ready((s, z))

    tiles_x = srt._round_up(W, srt.TWC) // srt.TWC
    tiles_y = srt._round_up(H, srt.TH) // srt.TH
    n_tiles = tiles_x * tiles_y
    cap = min(srt._round_up(N, srt.NBS), max(2048, srt.NBS))
    k = srt._k_pairs(N)

    def upto(stage):
        def f(si, zz):
            n = si.px.shape[0]
            px, py = si.px, si.py
            prio = srt._zkey_desc(zz)
            _, order, pxs, pys, sxs, sys_, ops = jax.lax.sort(
                (prio, jnp.arange(n, dtype=jnp.int32),
                 px, py, si.sigma_x, si.sigma_y, si.op_eff), num_keys=1)
            tx_lo, ty_lo, kx_c, ky_c, count, _clip = srt._tile_rects(
                pxs, pys, sxs, sys_, ops,
                tiles_x, tiles_y, k, W, H)
            if stage == "perm+rects":
                return (tx_lo + ty_lo + kx_c + ky_c + count
                        ).astype(jnp.float32)

            m_per = max(1, srt.CHUNK_TARGET // k)
            chunk_l = m_per * k
            c_chunks = max(1, (n + m_per - 1) // m_per)
            n_pad = c_chunks * m_per
            lbits = max(1, int(chunk_l - 1).bit_length())

            def _padc(a, const=0):
                return jnp.pad(a, (0, n_pad - n),
                               constant_values=const).reshape(
                    c_chunks, m_per, 1)

            jj = jnp.arange(k, dtype=jnp.int32)[None, None, :]
            jjf = jj.astype(jnp.float32)
            rkx = 1.0 / _padc(kx_c, 1).astype(jnp.float32)
            drow = jnp.floor(jjf * rkx + 1e-4).astype(jnp.int32)
            dcol = jj - drow * _padc(kx_c, 1)
            tile = (_padc(ty_lo) + drow) * tiles_x + (_padc(tx_lo) + dcol)
            tile = jnp.where(jj < _padc(count), tile, n_tiles)
            m_loc = (jnp.arange(n_pad, dtype=jnp.int32) % m_per).reshape(
                c_chunks, m_per, 1) * k + jj
            key_c = ((tile << lbits) | m_loc).reshape(c_chunks, chunk_l)
            if stage == "keygen":
                return jnp.sum(key_c[:, ::997].astype(jnp.float32))
            (key_s,) = jax.lax.sort((key_c,), dimension=1, num_keys=1,
                                    is_stable=False)
            if stage == "sort":
                return jnp.sum(key_s[:, ::997].astype(jnp.float32))

            ty_ax = jnp.arange(tiles_y, dtype=jnp.int32)
            tx_ax = jnp.arange(tiles_x, dtype=jnp.int32)
            fy = ((ty_ax[None, :] >= ty_lo[:, None])
                  & (ty_ax[None, :] < (ty_lo + ky_c)[:, None])
                  ).astype(jnp.float32)
            fx = ((tx_ax[None, :] >= tx_lo[:, None])
                  & (tx_ax[None, :] < (tx_lo + kx_c)[:, None])
                  & (count > 0)[:, None]).astype(jnp.float32)
            fy = jnp.pad(fy, ((0, n_pad - n), (0, 0))).reshape(
                c_chunks, m_per, tiles_y)
            fx = jnp.pad(fx, ((0, n_pad - n), (0, 0))).reshape(
                c_chunks, m_per, tiles_x)
            h = jnp.einsum("cmy,cmx->cyx", fy, fx,
                           preferred_element_type=jnp.float32)
            h = h.reshape(c_chunks, n_tiles).astype(jnp.int32)
            p_start = jnp.cumsum(h, axis=1) - h
            cum_h = jnp.cumsum(h, axis=0)
            q = (p_start - (cum_h - h)
                 + (jnp.arange(c_chunks, dtype=jnp.int32)
                    * chunk_l)[:, None])
            cnt = jnp.minimum(cum_h[-1], cap).astype(jnp.int32)
            if stage == "hist":
                return (jnp.sum(q.astype(jnp.float32))
                        + jnp.sum(key_s[:, ::997].astype(jnp.float32)))

            rank = jnp.arange(cap, dtype=jnp.int32)
            q0 = jnp.broadcast_to(q[0][:, None],
                                  (n_tiles, cap)).astype(jnp.int32)
            if c_chunks > 1:
                dq = q[1:] - q[:-1]
                cum_hx = cum_h[:-1]

                def _tele(cc, acc):
                    return acc + dq[cc][:, None] * (
                        cum_hx[cc][:, None] <= rank[None, :]
                    ).astype(jnp.int32)

                qsel = jax.lax.fori_loop(0, c_chunks - 1, _tele, q0)
            else:
                qsel = q0
            src = rank[None, :] + qsel
            if stage == "telescope":
                return (jnp.sum(src.astype(jnp.float32))
                        + jnp.sum(key_s[:, ::997].astype(jnp.float32)))

            keep = rank[None, :] < cnt[:, None]
            src = jnp.clip(src, 0, c_chunks * chunk_l - 1)
            m_sel = key_s.reshape(-1)[src] & ((1 << lbits) - 1)
            g_rank = (src // chunk_l) * m_per + m_sel // k
            slots = jnp.where(keep, jnp.clip(g_rank, 0, n - 1),
                              n).reshape(-1)
            return jnp.sum(slots.astype(jnp.float32))
        return f

    stages = ["perm+rects", "keygen", "sort", "hist", "telescope", "full"]
    prev = 0.0
    print(f"config: N={N} {W}x{H} cap={cap} K={k} (cumulative | delta ms)")
    for st in stages:
        t = marginal(upto(st), (s, z))
        print(f"  {st:12s} {t*1e3:9.2f} | {(t-prev)*1e3:7.2f}")
        prev = t


if __name__ == "__main__":
    main()
