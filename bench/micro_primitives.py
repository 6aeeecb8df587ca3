"""Microbench of the XLA primitives the sorted-path binner is built from.

Establishes the on-chip cost model (sorts, gathers, cumsum, searchsorted)
so binner redesigns are priced before they are built.

Usage: python bench/micro_primitives.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp


def timeit(jf, args, reps=3):
    out = jf(*args)
    jax.block_until_ready(out)
    float(jax.tree.leaves(out)[0].reshape(-1)[0])
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = jf(*args)
        float(jax.tree.leaves(out)[0].reshape(-1)[0])
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    from tpu_gaussians.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    key = jax.random.PRNGKey(0)
    results = {}

    for n, label in [(1_000_000, "1M"), (12_000_000, "12M")]:
        k32 = jax.random.randint(key, (n,), 0, 1 << 30, dtype=jnp.int32)
        ku = k32.astype(jnp.uint32)
        v32 = jnp.arange(n, dtype=jnp.int32)
        f32 = jax.random.uniform(key, (n,), jnp.float32)
        jax.block_until_ready((ku, v32, f32))

        results[f"sort1key_{label}"] = timeit(
            jax.jit(lambda a, b: jax.lax.sort((a, b), num_keys=1)[1]),
            (ku, v32))
        results[f"sort1key_nostab_{label}"] = timeit(
            jax.jit(lambda a, b: jax.lax.sort((a, b), num_keys=1,
                                              is_stable=False)[1]),
            (ku, v32))
        results[f"sortkeyonly_{label}"] = timeit(
            jax.jit(lambda a: jax.lax.sort((a,), num_keys=1)[0]), (ku,))
        results[f"sort3key_{label}"] = timeit(
            jax.jit(lambda a, b, c: jax.lax.sort((a, b, c), num_keys=3)[2]),
            (ku, ku, v32))
        results[f"cumsum_{label}"] = timeit(
            jax.jit(lambda a: jnp.cumsum(a)), (v32,))
        idx = jax.random.randint(key, (n,), 0, n, dtype=jnp.int32)
        results[f"gather1_{label}"] = timeit(
            jax.jit(lambda a, i: a[i]), (f32, idx))
        # row gather: (n/16, 16) rows
        rows = f32.reshape(-1, 16) if n % 16 == 0 else None
        if rows is not None:
            ridx = jax.random.randint(key, (n // 16,), 0, n // 16,
                                      dtype=jnp.int32)
            results[f"gather_rows16_{label}"] = timeit(
                jax.jit(lambda a, i: a[i]), (rows, ridx))
        results[f"searchsorted_272_{label}"] = timeit(
            jax.jit(lambda a, q: jnp.searchsorted(a, q)),
            (jnp.sort(ku), jnp.arange(272, dtype=jnp.uint32) << 22))

    # chunked vmapped sort: 12M as 1536 x 8192
    a = jax.random.randint(key, (1536, 8192), 0, 1 << 30, dtype=jnp.int32)
    b = jnp.broadcast_to(jnp.arange(8192, dtype=jnp.int32), (1536, 8192))
    results["sort_chunked_1536x8k"] = timeit(
        jax.jit(lambda x, y: jax.lax.sort((x, y), dimension=1,
                                          num_keys=1)[1]),
        (a, jnp.asarray(b)))
    a2 = a.reshape(96, 131072)
    b2 = jnp.asarray(b).reshape(96, 131072)
    results["sort_chunked_96x128k"] = timeit(
        jax.jit(lambda x, y: jax.lax.sort((x, y), dimension=1,
                                          num_keys=1)[1]),
        (a2, b2))

    for name, t in results.items():
        print(f"  {name:28s} {t*1e3:9.2f} ms")


if __name__ == "__main__":
    main()
