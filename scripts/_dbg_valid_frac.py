"""How much of the proxy-mode field eval is wasted on invalid samples?

Pure-numpy replication of the proxy pass on a live-ray subsample of the
bench state (no device compiles): live rays, rays with any
weight-bearing sample, valid fraction of the dense [live, cap] grid,
survivor histogram.  If the valid fraction is low, a train-style sample
pool (compact valid samples -> eval -> scatter back) cuts the dominant
hash-gather cost proportionally.
Run: timeout 550 python scripts/_dbg_valid_frac.py
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
from nerf_texture_tpu.data.synthetic import SyntheticSphereDataset
from nerf_texture_tpu.render import renderer as R

with open("/root/repo/.bench/ngp_bench_state.pkl", "rb") as fh:
    st = pickle.load(fh)

H = W = 800
ds = SyntheticSphereDataset(n_frames=8, H=H, W=W)
rcfg = R.RenderConfig(bound=1.0, cascades=1, grid_size=128,
                      max_steps=384, max_samples_train=192,
                      max_samples_infer=96, ray_chunk=16384,
                      pool_mean_samples=64, pool_mean_samples_infer=24,
                      proxy_samples=0, proxy_refined=24)

occ = jnp.asarray(st["occ"])
density = jnp.asarray(st["density"])
pose = orbit_pose(np.pi / 2 + 0.2, 0.4, ds.radius)
intr = np.asarray(ds.intrinsics, np.float32)

aabb_np, occ_dil = R._occ_prepass_arrays(occ, rcfg, density=density)
aabb = jnp.asarray(aabb_np)
B = max(1, rcfg.prepass_block)
Hb, Wb = -(-H // B), -(-W // B)
nb = Hb * Wb
rays_b = get_rays(jnp.asarray(pose), jnp.asarray(intr / B), Hb, Wb)
blk = min(131072, R._round_up(nb, 8192))
perm, count_d, t0_d, t1_d = R._prepass_compact(
    rays_b["rays_o"], rays_b["rays_d"], occ_dil, aabb, rcfg.bound,
    rcfg.min_near, grid_size=rcfg.grid_size, block=blk,
    margin_steps=rcfg.prepass_margin_steps, H=H, W=W, Hb=Hb, Wb=Wb,
    B=B, nb=nb)
count = int(count_d)
print(f"live rays {count} / {H*W} ({count/(H*W):.3f})", flush=True)

rng = np.random.default_rng(0)
NS = min(32768, count)
sel = np.sort(rng.choice(count, size=NS, replace=False))
idx_c = np.asarray(perm)[sel]
rays = get_rays(jnp.asarray(pose), jnp.asarray(intr), H, W)
ro = np.asarray(rays["rays_o"])[idx_c]
rd = np.asarray(rays["rays_d"])[idx_c]
idx_b = (idx_c // (W * B)) * Wb + (idx_c % W) // B
nears = np.asarray(t0_d)[idx_b]
fars = np.asarray(t1_d)[idx_b]

K = rcfg.proxy_refined
cap = min(rcfg.infer_color_cap, K)
G = rcfg.grid_size
dens = np.asarray(density).reshape(G, G, G)

span = np.maximum(fars - nears, 0.0)
frac = (np.arange(K) + 0.5) / K
ts = nears[:, None] + span[:, None] * frac                    # [N, K]
x = ro[:, None, :] + ts[..., None] * rd[:, None, :]           # [N, K, 3]

# trilinear density lookup (same grid convention as occupancy.update:
# cell centers at (i+0.5)/G * 2b - b)
g = (x / rcfg.bound + 1.0) * 0.5 * G - 0.5
g0 = np.floor(g).astype(np.int64)
f = g - g0
val = np.zeros(ts.shape, np.float32)
for dz in (0, 1):
    for dy in (0, 1):
        for dx in (0, 1):
            c = np.clip(g0 + [dx, dy, dz], 0, G - 1)
            w = (np.where(dx, f[..., 0], 1 - f[..., 0])
                 * np.where(dy, f[..., 1], 1 - f[..., 1])
                 * np.where(dz, f[..., 2], 1 - f[..., 2]))
            val += w * dens[c[..., 0], c[..., 1], c[..., 2]]

dts = span / K
sdt = val * dts[:, None]
cs = np.cumsum(sdt, -1)
trans = np.exp(-(cs - sdt))
w = trans * (1.0 - np.exp(-sdt))
w = np.where(span[:, None] > 0, w, 0.0)

kth = np.sort(w, -1)[:, -cap]
cand = (w >= kth[:, None]) & (w > rcfg.infer_w_eps) & (span[:, None] > 0)
rank = np.cumsum(cand, -1) - 1
keep = cand & (rank < cap)

per_ray = keep.sum(-1)
print(f"sampled {NS} live rays:", flush=True)
print(f"  valid fraction of [live, cap={cap}]: {per_ray.mean()/cap:.3f}",
      flush=True)
print(f"  rays with 0 survivors: {(per_ray == 0).mean():.3f}", flush=True)
hist = np.bincount(per_ray, minlength=cap + 1)
print(f"  survivors/ray histogram: {dict(enumerate(hist.tolist()))}",
      flush=True)
print(f"  field evals/frame dense {count*cap}  pooled "
      f"{int(count*per_ray.mean())} ({per_ray.mean()/cap:.2f}x)",
      flush=True)
