"""A/B: live-ray permutation via stable argsort vs cumsum+scatter.

_live_permutation orders the live pixel indices first (stable), which
today is one 640K-element stable argsort per frame.  A bitonic sort is
O(n log^2 n) passes on TPU; the same permutation is two cumsums and one
unique-index scatter.  This measures both on the real chip at frame
sizes, and checks they produce identical permutations.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")


@jax.jit
def perm_argsort(hits):
    return (jnp.argsort(~hits, stable=True).astype(jnp.int32),
            jnp.sum(hits.astype(jnp.int32)))


@jax.jit
def perm_scatter(hits):
    n = hits.shape[0]
    hi = hits.astype(jnp.int32)
    live_rank = jnp.cumsum(hi) - hi            # exclusive
    dead_rank = jnp.cumsum(1 - hi) - (1 - hi)
    count = live_rank[-1] + hi[-1]
    dest = jnp.where(hits, live_rank, count + dead_rank)
    perm = jnp.zeros((n,), jnp.int32).at[dest].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop", unique_indices=True)
    return perm, count


def main():
    n = 800 * 800
    rng = np.random.default_rng(0)
    hits = jnp.asarray(rng.random(n) < 0.4)

    for name, fn in [("argsort", perm_argsort), ("scatter", perm_scatter)]:
        p, c = fn(hits)
        jax.block_until_ready(p)
        t0 = time.perf_counter()
        for _ in range(20):
            p, c = fn(hits)
        jax.block_until_ready(p)
        dt = (time.perf_counter() - t0) / 20
        print(f"{name}: {dt*1e3:.2f} ms  count={int(c)}")

    pa, ca = perm_argsort(hits)
    ps, cs = perm_scatter(hits)
    assert int(ca) == int(cs)
    assert np.array_equal(np.asarray(pa), np.asarray(ps)), "perm mismatch"
    print("parity OK")


if __name__ == "__main__":
    main()
