"""Phase breakdown of the proxy render on a carved grid (decay 0.85),
with the slot-based survivor code.  Saves state for later iterations."""
import dataclasses
import os
import pickle
import sys
import time

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
from nerf_texture_tpu.models.ngp import NGPConfig
from nerf_texture_tpu.ops.occupancy import OccupancyGrid
from nerf_texture_tpu.render import renderer as R
from nerf_texture_tpu.render.renderer import RenderConfig, render_image
from nerf_texture_tpu.train.trainer import (TrainConfig, Trainer,
                                            ngp_field_apply)

H = W = 800
ds = SyntheticSphereDataset(n_frames=8, H=H, W=W)
mcfg = NGPConfig(bound=1.0, num_levels=8, level_dim=4, log2_bricks=16,
                 desired_resolution=2048)
rcfg = RenderConfig(bound=1.0, cascades=1, grid_size=128, max_steps=384,
                    max_samples_train=192, max_samples_infer=96,
                    ray_chunk=40000, pool_mean_samples=64,
                    pool_mean_samples_infer=24)
tcfg = TrainConfig(lr=1e-2, total_steps=2000, num_rays=4096,
                   grid_decay=0.85)
tr = Trainer(ds, mcfg, rcfg, tcfg, key=jax.random.PRNGKey(7))

STATE = "/tmp/ngp_carved.npz"
PARAMS = "/tmp/ngp_carved_params.pkl"
if os.path.exists(PARAMS):
    st = np.load(STATE)
    with open(PARAMS, "rb") as f:
        params = pickle.load(f)
    tr.state = tr.state._replace(
        params=jax.tree.map(jnp.asarray, params),
        occ=OccupancyGrid(density=jnp.asarray(st["density"]),
                          occ=jnp.asarray(st["occ"]),
                          mean_density=jnp.asarray(st["mean_density"]),
                          iter_density=tr.state.occ.iter_density))
    tr._marked = True
    print("loaded saved state", flush=True)
else:
    t0 = time.time()
    tr.train(700)
    print("train700", time.time() - t0, flush=True)
    np.savez(STATE, density=np.asarray(tr.state.occ.density),
             occ=np.asarray(tr.state.occ.occ),
             mean_density=np.asarray(tr.state.occ.mean_density))
    with open(PARAMS, "wb") as f:
        pickle.dump(jax.tree.map(np.asarray, tr.state.params), f)

occ_frac = float(jnp.mean(tr.state.occ.occ.astype(jnp.float32)))
print("occ_frac", occ_frac, flush=True)

pose = orbit_pose(np.pi / 2 + 0.2, 0.4, ds.radius)
params = tr.state.params
occ = tr.state.occ.occ
density = tr.state.occ.density
intr = jnp.asarray(ds.intrinsics)
pose_j = jnp.asarray(pose)

aabb_np, occ_dil = R._occ_prepass_arrays(occ, rcfg, density=density)
dens8 = R._dens8_cached(density, rcfg)
float(jnp.sum(occ_dil)), float(jnp.sum(dens8))

rays = get_rays(pose_j, intr, H, W)
B = rcfg.prepass_block
Hb, Wb = -(-H // B), -(-W // B)
rays_b = get_rays(pose_j, intr.astype(jnp.float32) / B, Hb, Wb)
aabb = jnp.asarray(aabb_np)
blk = min(131072, ((Hb * Wb + 8191) // 8192) * 8192)
npad = ((Hb * Wb + blk - 1) // blk) * blk
ro_p = jnp.concatenate([rays_b["rays_o"], jnp.broadcast_to(
    rays_b["rays_o"][:1], (npad - Hb * Wb, 3))])
rd_p = jnp.concatenate([rays_b["rays_d"], jnp.broadcast_to(
    rays_b["rays_d"][:1], (npad - Hb * Wb, 3))])
for tag in ("cold", "warm"):
    t0 = time.time()
    hit_d, t0_d, t1_d = R._occ_ray_hits(ro_p, rd_p, occ_dil, aabb,
                                        rcfg.bound, rcfg.min_near,
                                        rcfg.grid_size, block=blk,
                                        margin_steps=2.0)
    float(jnp.sum(hit_d))
    print(f"prepass {tag}:", round(time.time() - t0, 3), flush=True)
hits_b = np.asarray(hit_d)[:Hb * Wb]
hits = np.repeat(np.repeat(hits_b.reshape(Hb, Wb), B, 0), B, 1)[
    :H, :W].reshape(-1)
live = np.nonzero(hits)[0]
print("live rays:", live.size, "of", H * W, flush=True)
span = np.asarray(t1_d - t0_d)[:Hb * Wb][hits_b]
print("span p50/p90:", np.percentile(span, [50, 90]), flush=True)

chunk = rcfg.ray_chunk
n_pad = ((live.size + chunk - 1) // chunk) * chunk
live_pad = np.concatenate([live, np.full(n_pad - live.size, live[0])])
idx = jnp.asarray(live_pad)
ro = jnp.take(rays["rays_o"], idx, axis=0)
rd = jnp.take(rays["rays_d"], idx, axis=0)
blk_of_pix = (live_pad // W // B) * Wb + (live_pad % W) // B
idx_b = jnp.asarray(blk_of_pix)
nears_l = jnp.take(t0_d, idx_b, axis=0)
fars_l = jnp.take(t1_d, idx_b, axis=0)

sl = slice(0, chunk)
for tag in ("cold", "warm", "warm2"):
    t0 = time.time()
    img, dep, ws = R._render_chunk(
        ngp_field_apply, mcfg, params, occ, ro[sl], rd[sl], 1.0, rcfg,
        nears=nears_l[sl], fars=fars_l[sl], dens8=dens8)
    float(jnp.sum(ws))
    print(f"chunk {tag}:", round(time.time() - t0, 3), flush=True)
print("chunks:", n_pad // chunk, flush=True)

for tag in ("cold", "warm", "warm2"):
    t0 = time.time()
    out = render_image(ngp_field_apply, mcfg, params, occ, pose, intr,
                       H, W, rcfg, density=density)
    float(jnp.sum(out["weights_sum"]))
    print(f"frame {tag}:", round(time.time() - t0, 3), flush=True)

psnr = tr.eval_psnr([0], use_ema=False)
print("PSNR:", psnr, flush=True)
