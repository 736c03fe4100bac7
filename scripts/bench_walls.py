"""Measure raw TPU-through-tunnel walls: per-op fixed cost, gather rate,
matmul rate, dispatch latency.  Iteration harness, not part of bench.py."""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    def sync(x):
        return jax.block_until_ready(x)

    out = {}

    # dispatch latency: tiny jitted fn, many calls
    @jax.jit
    def tiny(x):
        return x + 1.0

    x = jnp.zeros((8, 128))
    sync(tiny(x))
    t0 = time.perf_counter()
    for _ in range(50):
        x = tiny(x)
    sync(x)
    out["dispatch_us"] = round((time.perf_counter() - t0) / 50 * 1e6)

    # chain of N elementwise ops inside ONE jit (op fusion check)
    def chain(x, n):
        for _ in range(n):
            x = x * 1.000001 + 0.5
            x = x - 0.5
        return x

    for n in (8, 64):
        f = jax.jit(lambda x, n=n: chain(x, n))
        sync(f(x))
        t0 = time.perf_counter()
        for _ in range(20):
            y = f(x)
        sync(y)
        out[f"chain{n}_us"] = round((time.perf_counter() - t0) / 20 * 1e6)

    # gather wall: 2M indices from a 64K x 8 table
    tab = jnp.zeros((65536, 8))
    idx = jnp.asarray(np.random.randint(0, 65536, 2_000_000), jnp.int32)
    g = jax.jit(lambda t, i: jnp.take(t, i, axis=0).sum())
    sync(g(tab, idx))
    t0 = time.perf_counter()
    for _ in range(10):
        y = g(tab, idx)
    sync(y)
    out["gather2M_ms"] = round((time.perf_counter() - t0) / 10 * 1e3, 2)

    # argsort wall: [8192, 256]
    a = jnp.asarray(np.random.rand(8192, 256), jnp.float32)
    s = jax.jit(lambda a: jnp.argsort(a, axis=-1)[:, :64].sum())
    sync(s(a))
    t0 = time.perf_counter()
    for _ in range(10):
        y = s(a)
    sync(y)
    out["argsort2M_ms"] = round((time.perf_counter() - t0) / 10 * 1e3, 2)

    # matmul wall: bf16 4096^2 x 4096
    m = jnp.zeros((4096, 4096), jnp.bfloat16)
    mm = jax.jit(lambda a: (a @ a).sum())
    sync(mm(m))
    t0 = time.perf_counter()
    for _ in range(10):
        y = mm(m)
    sync(y)
    dt = (time.perf_counter() - t0) / 10
    out["matmul4k_ms"] = round(dt * 1e3, 2)
    out["matmul_tflops"] = round(2 * 4096 ** 3 / dt / 1e12, 1)

    # host->device and device->host transfer of 2.56 MB
    h = np.zeros((640, 1000), np.float32)
    t0 = time.perf_counter()
    for _ in range(10):
        d = jnp.asarray(h)
        sync(d)
    out["h2d_2.5MB_ms"] = round((time.perf_counter() - t0) / 10 * 1e3, 2)
    t0 = time.perf_counter()
    for _ in range(10):
        _ = np.asarray(d)
    out["d2h_2.5MB_ms"] = round((time.perf_counter() - t0) / 10 * 1e3, 2)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
