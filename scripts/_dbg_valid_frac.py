"""How much of the proxy-mode field eval is wasted on invalid samples?

Loads the saved bench state, runs the prepass + proxy selection for the
bench pose, and reports: live rays, rays with any weight-bearing sample,
valid-sample fraction of the dense [live, cap] field-eval grid, and the
per-ray survivor-count histogram.  If the valid fraction is low, a
train-style sample pool (compact valid samples, eval, scatter back)
would cut the dominant hash-gather cost proportionally.
Run: timeout 600 python scripts/_dbg_valid_frac.py
"""
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from nerf_texture_tpu.data.poses import orbit_pose
from nerf_texture_tpu.data.rays import get_rays
from nerf_texture_tpu.render import renderer as R

with open("/root/repo/.bench/ngp_bench_state.pkl", "rb") as fh:
    st = pickle.load(fh)
rcfg = st["rcfg"]
print("rcfg:", rcfg, flush=True)

occ = jnp.asarray(st["occ"])
density = jnp.asarray(st["density"])
H = W = 800
pose = orbit_pose(np.pi / 2 + 0.2, 0.4, st["radius"])
intr = np.asarray(st["intrinsics"], np.float32)

aabb_np, occ_dil = R._occ_prepass_arrays(occ, rcfg, density=density)
dens8 = R._dens8_cached(density, rcfg)
aabb = jnp.asarray(aabb_np)
B = max(1, rcfg.prepass_block)
Hb, Wb = -(-H // B), -(-W // B)
nb = Hb * Wb
intr_b = intr / B
rays_b = get_rays(jnp.asarray(pose), jnp.asarray(intr_b), Hb, Wb)
blk = min(131072, R._round_up(nb, 8192))
perm, count_d, t0_d, t1_d = R._prepass_compact(
    rays_b["rays_o"], rays_b["rays_d"], occ_dil, aabb, rcfg.bound,
    rcfg.min_near, grid_size=rcfg.grid_size, block=blk,
    margin_steps=rcfg.prepass_margin_steps, H=H, W=W, Hb=Hb, Wb=Wb,
    B=B, nb=nb)
count = int(count_d)
print(f"live rays {count} / {H*W} ({count/(H*W):.3f})", flush=True)

rays = get_rays(jnp.asarray(pose), jnp.asarray(intr), H, W)
idx_c = np.asarray(perm)[:count]
ro = jnp.take(rays["rays_o"], jnp.asarray(idx_c), axis=0)
rd = jnp.take(rays["rays_d"], jnp.asarray(idx_c), axis=0)
idx_b = (idx_c // (W * B)) * Wb + (idx_c % W) // B
nears = jnp.take(t0_d, jnp.asarray(idx_b))
fars = jnp.take(t1_d, jnp.asarray(idx_b))

K = rcfg.proxy_refined
cap = min(rcfg.infer_color_cap, K)
from nerf_texture_tpu.ops.proxy_select import proxy_select

span = jnp.maximum(fars - nears, 0.0)
frac = (jnp.arange(K, dtype=jnp.float32) + 0.5) / K
ts = nears[:, None] + span[:, None] * frac
sig_p = R._proxy_sigma(dens8, ro, rd, ts, rcfg.grid_size, rcfg.bound)
ts2, skip2, valid2 = proxy_select(ts, sig_p, nears, fars, cap=cap,
                                  w_eps=float(rcfg.infer_w_eps))
v = np.asarray(valid2)
per_ray = v.sum(-1)
print(f"valid fraction of [live, cap={cap}] grid: {v.mean():.3f}",
      flush=True)
print(f"rays with 0 survivors: {(per_ray == 0).mean():.3f}", flush=True)
hist = np.bincount(per_ray, minlength=cap + 1)
print("survivors/ray histogram:", dict(enumerate(hist.tolist())),
      flush=True)
print(f"field evals/frame dense: {count * cap}  pooled: {int(v.sum())} "
      f"({v.sum() / (count * cap):.2f}x)", flush=True)
