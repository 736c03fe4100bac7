"""Microbench: is the inference hash-table gather really running at
bf16 bandwidth?  `encode_position` casts the 189 MB f32 table to bf16
INSIDE the jitted program (models/ngp.py table_dtype path); XLA must
materialize the converted table per program -- and inside the
whole-frame while_loop the convert may not be hoisted out of the body.

Compares, at the bench chunk shape (16K rays x cap samples):
  a) f32 table, no cast
  b) astype(bf16) inside the jit (current path)
  c) table pre-cast to bf16 on the host, passed in directly
  d) (c) inside a 4-iteration while_loop (chunk-loop conditions)
Run: timeout 600 python scripts/_prof_encode_dtype.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from nerf_texture_tpu.models.ngp import NGPConfig
from nerf_texture_tpu.ops.hashgrid_packed import packed_encode_bound

cfg = NGPConfig(bound=1.0, num_levels=8, level_dim=4, log2_bricks=16,
                desired_resolution=2048)
spec = cfg.packed_spec
key = jax.random.PRNGKey(0)
table_f32 = spec.init(key)
table_bf16 = table_f32.astype(jnp.bfloat16)
N = 16384 * 8            # bench chunk 16K rays x cap 8 samples
x = jax.random.uniform(jax.random.PRNGKey(1), (N, 3), minval=-0.6,
                       maxval=0.6)


def _sync(out):
    # through the axon tunnel block_until_ready does not actually wait;
    # fetch a scalar for a real sync (see .claude/skills/verify)
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(np.asarray(leaf.reshape(-1)[0]))


def time_it(fn, *a, n=20):
    _sync(fn(*a))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*a)
    _sync(out)
    return (time.perf_counter() - t0) / n * 1e3


@jax.jit
def enc_f32(table, x):
    return packed_encode_bound(x, table, spec, bound=1.0, fast=True,
                               amp=False)


@jax.jit
def enc_cast_inside(table, x):
    return packed_encode_bound(x, table.astype(jnp.bfloat16), spec,
                               bound=1.0, fast=True, amp=False)


@jax.jit
def enc_pre(table, x):
    return packed_encode_bound(x, table, spec, bound=1.0, fast=True,
                               amp=False)


@jax.jit
def enc_loop(table, xs):
    def body(c):
        i, acc = c
        f = packed_encode_bound(xs[i], table.astype(jnp.bfloat16), spec,
                                bound=1.0, fast=True, amp=False)
        return i + 1, acc + jnp.sum(f.astype(jnp.float32))
    _, acc = jax.lax.while_loop(lambda c: c[0] < 4, body,
                                (jnp.int32(0), jnp.float32(0)))
    return acc


@jax.jit
def enc_loop_pre(table, xs):
    def body(c):
        i, acc = c
        f = packed_encode_bound(xs[i], table, spec, bound=1.0,
                                fast=True, amp=False)
        return i + 1, acc + jnp.sum(f.astype(jnp.float32))
    _, acc = jax.lax.while_loop(lambda c: c[0] < 4, body,
                                (jnp.int32(0), jnp.float32(0)))
    return acc


xs = x.reshape(4, N // 4, 3)
print(f"N={N} rows={spec.table_rows} width={spec.storage_width}",
      flush=True)
print(f"a) f32 table:            {time_it(enc_f32, table_f32, x):7.2f} ms",
      flush=True)
print(f"b) astype inside jit:    {time_it(enc_cast_inside, table_f32, x):7.2f} ms",
      flush=True)
print(f"c) pre-cast bf16 table:  {time_it(enc_pre, table_bf16, x):7.2f} ms",
      flush=True)
print(f"d) loop astype inside:   {time_it(enc_loop, table_f32, xs):7.2f} ms"
      " (4 its of N/4)", flush=True)
print(f"e) loop pre-cast:        {time_it(enc_loop_pre, table_bf16, xs):7.2f} ms"
      " (4 its of N/4)", flush=True)
