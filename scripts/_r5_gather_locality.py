"""Round-5 microbench: does gather index COHERENCE beat the random-row
wall on v5e?

The curved frame is encode-gather-bound: 8 hashed levels x one random
128-lane bf16 row per sample at ~18 ns/index (docs/PERF.md r4).  Random
256 B rows pay tile-granularity reads ((16,128) bf16 tile = 4 KB per
row).  If COHERENT index streams (neighboring samples -> neighboring
rows, as a baked surface-texture atlas would produce) amortize the tile
fetch across the ~16 rows it contains, a baked render mode breaks the
wall.  This measures exactly that.

Run on the TPU: python scripts/_r5_gather_locality.py
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def emit(**kw):
    print(json.dumps(kw), flush=True)


def timed(fn, *args, n=8):
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    np.asarray(out.ravel()[0])          # real sync (async backend)
    t0 = time.perf_counter()
    for _ in range(n):
        out = jax.jit(fn)(*args)
    np.asarray(out.ravel()[0])
    return (time.perf_counter() - t0) / n


R = 1 << 20          # 1M rows
Q = 1 << 21          # 2M queries (~ a 228K-live x cap5 frame x 2 tables)
rng = np.random.default_rng(0)

idx_rand = rng.integers(0, R, Q).astype(np.int32)
idx_sorted = np.sort(idx_rand)
# image-coherent: a sweep over rows with +-8 jitter (adjacent queries hit
# adjacent rows, like scanline-ordered rays sampling a 2D atlas)
base = np.linspace(8, R - 9, Q)
idx_coh = (base + rng.integers(-8, 9, Q)).astype(np.int32)
# block-coherent: 16 consecutive queries share one 16-row tile
idx_blk = ((np.arange(Q) // 16) % (R // 16) * 16
           + rng.integers(0, 16, Q)).astype(np.int32)

for width, dt in ((128, jnp.bfloat16), (128, jnp.float32),
                  (32, jnp.bfloat16), (16, jnp.float32)):
    tab = jnp.asarray(rng.standard_normal((R, width)), dt)
    for name, idx in (("random", idx_rand), ("sorted", idx_sorted),
                      ("coherent", idx_coh), ("block16", idx_blk)):
        ix = jnp.asarray(idx)
        t = timed(lambda tb, ii: jnp.take(tb, ii, axis=0), tab, ix)
        emit(table=f"{R}x{width}:{dt.__name__}", pattern=name,
             ms=round(t * 1e3, 2), ns_per_idx=round(t / Q * 1e9, 2))
