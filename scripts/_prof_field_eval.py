"""Decompose the inference field eval (the dominant chunk phase,
42.4 ms at 64K rays x cap 8) into encode / sigma MLP / SH / color MLP /
glue, each separately jitted at the bench chunk shape.  The encode
gather alone measures 10.2 ms (scripts/_prof_encode_dtype.py), so ~30 ms
is layout/glue -- find it.
Run: timeout 600 python scripts/_prof_field_eval.py
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

from nerf_texture_tpu.models import ngp
from nerf_texture_tpu.models.ngp import NGPConfig
from nerf_texture_tpu.ops.encoding import sh_encode
from nerf_texture_tpu.ops.hashgrid_packed import packed_encode_bound
from nerf_texture_tpu.utils.mlp import apply_mlp
from nerf_texture_tpu.train.trainer import ngp_field_apply

cfg = NGPConfig(bound=1.0, num_levels=8, level_dim=4, log2_bricks=16,
                desired_resolution=2048)
params = ngp.init(jax.random.PRNGKey(0), cfg)
N = 65536 * 8                   # 64K rays x cap 8 (the measured shape)
x = jax.random.uniform(jax.random.PRNGKey(1), (N, 3), minval=-0.6,
                       maxval=0.6)
d = jax.random.normal(jax.random.PRNGKey(2), (N, 3))
d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(np.asarray(leaf.reshape(-1)[0]))


def time_it(fn, *a, n=10):
    _sync(fn(*a))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*a)
    _sync(out)
    return (time.perf_counter() - t0) / n * 1e3


table_bf16 = params["grid"].astype(jnp.bfloat16)


@jax.jit
def encode_only(table, x):
    return packed_encode_bound(x, table, cfg.packed_spec, bound=1.0,
                               fast=True, amp=False)


@jax.jit
def enc_sigma(table, x):
    feat = packed_encode_bound(x, table, cfg.packed_spec, bound=1.0,
                               fast=True, amp=False)
    h = apply_mlp(params["sigma_net"], feat)
    return h


@jax.jit
def sh_only(d):
    return sh_encode(d, cfg.sh_degree)


@jax.jit
def color_only(d_enc, geo):
    h = jnp.concatenate([d_enc, geo], axis=-1)
    return apply_mlp(params["color_net"], h,
                     final_activation=jax.nn.sigmoid)


@jax.jit
def full_field(x, d):
    return ngp_field_apply(params, x, d, cfg)


feat = encode_only(table_bf16, x)
h = enc_sigma(table_bf16, x)
d_enc = sh_only(d)
geo = h[..., 1:]

print(f"N={N}", flush=True)
print(f"encode only:        {time_it(encode_only, table_bf16, x):7.2f} ms",
      flush=True)
print(f"encode+sigma MLP:   {time_it(enc_sigma, table_bf16, x):7.2f} ms",
      flush=True)
print(f"SH encode:          {time_it(sh_only, d):7.2f} ms", flush=True)
print(f"color MLP:          {time_it(color_only, d_enc, geo):7.2f} ms",
      flush=True)
print(f"FULL field apply:   {time_it(full_field, x, d):7.2f} ms",
      flush=True)
