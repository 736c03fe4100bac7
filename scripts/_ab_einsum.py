"""Race the packed-encode weighted-reduction formulations on chip."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
import numpy as np

L, B, K, C = 8, 2_097_152, 27, 4
R = 65536 * 8  # table rows


def timeit(fn, *args, n=5):
    out = fn(*args)
    float(jnp.sum(out))
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    float(jnp.sum(out))
    return (time.time() - t0) / n * 1e3


key = jax.random.PRNGKey(0)
tab = jax.random.normal(key, (R, K * C), jnp.bfloat16)
idx = jax.random.randint(key, (L * B,), 0, R)
w = jax.random.uniform(key, (L, B, K))


@jax.jit
def v_einsum_kmajor(tab, idx, w):
    rows = jnp.take(tab, idx, axis=0)
    rows = rows.reshape(L, B, K, C).astype(jnp.float32)
    return jnp.einsum("lbk,lbkc->blc", w, rows).reshape(B, L * C)


@jax.jit
def v_mulsum_kmajor(tab, idx, w):
    rows = jnp.take(tab, idx, axis=0)
    rows = rows.reshape(L, B, K, C).astype(jnp.float32)
    return jnp.sum(rows * w[..., None], axis=2).transpose(1, 0, 2) \
        .reshape(B, L * C)


@jax.jit
def v_einsum_cmajor(tab, idx, w):
    rows = jnp.take(tab, idx, axis=0)
    rows = rows.reshape(L, B, C, K).astype(jnp.float32)
    return jnp.einsum("lbk,lbck->blc", w, rows).reshape(B, L * C)


@jax.jit
def v_mulsum_cmajor(tab, idx, w):
    rows = jnp.take(tab, idx, axis=0)
    rows = rows.reshape(L, B, C, K).astype(jnp.float32)
    return jnp.sum(rows * w[:, :, None, :], axis=3).transpose(1, 0, 2) \
        .reshape(B, L * C)


for name, fn in [("einsum k-major (current)", v_einsum_kmajor),
                 ("mul+sum k-major", v_mulsum_kmajor),
                 ("einsum c-major", v_einsum_cmajor),
                 ("mul+sum c-major", v_mulsum_cmajor)]:
    try:
        print(f"{name}: {timeit(fn, tab, idx, w):.1f} ms", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAILED {str(e)[:120]}", flush=True)
