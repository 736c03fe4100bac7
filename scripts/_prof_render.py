"""Phase-level breakdown of the proxy 800x800 render on the real chip."""
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

from nerf_texture_tpu.data.rays import get_rays
from nerf_texture_tpu.data.synthetic import SyntheticSphereDataset
from nerf_texture_tpu.models.ngp import NGPConfig
from nerf_texture_tpu.render import renderer as R
from nerf_texture_tpu.render.renderer import RenderConfig
from nerf_texture_tpu.train.trainer import (TrainConfig, Trainer,
                                            ngp_field_apply)


def sync_scalar(x):
    return float(jnp.sum(x))


H = W = 800
ds = SyntheticSphereDataset(n_frames=4, H=H, W=W)
mcfg = NGPConfig(bound=1.0, num_levels=8, level_dim=4, log2_bricks=16,
                 desired_resolution=2048)
rcfg = RenderConfig(bound=1.0, cascades=1, grid_size=128, max_steps=384,
                    max_samples_train=192, max_samples_infer=96,
                    ray_chunk=40000, pool_mean_samples=64,
                    pool_mean_samples_infer=24)
tcfg = TrainConfig(lr=1e-2, total_steps=2000, num_rays=4096)
tr = Trainer(ds, mcfg, rcfg, tcfg, key=jax.random.PRNGKey(7))
t0 = time.time()
tr.train(400)
sync_scalar(tr.state.params["grid"][:1])
print("train400 done", time.time() - t0, flush=True)

pose = jnp.asarray(ds.poses[1])
intr = jnp.asarray(ds.intrinsics)
params = tr.state.params
occ = tr.state.occ.occ
density = tr.state.occ.density

# phase A: prepass arrays (host-side, cached)
t0 = time.time()
aabb_np, occ_dil = R._occ_prepass_arrays(occ, rcfg)
sync_scalar(occ_dil)
print("A: occ dilate+aabb", time.time() - t0, flush=True)
t0 = time.time()
aabb_np, occ_dil = R._occ_prepass_arrays(occ, rcfg)
print("A cached:", time.time() - t0, flush=True)

dens8 = R._dens8_cached(density, rcfg)
sync_scalar(dens8)

# phase B: ray gen + block prepass
n = H * W
rays = get_rays(pose, intr, H, W)
B = rcfg.prepass_block
Hb, Wb = -(-H // B), -(-W // B)
intr_b = intr.astype(jnp.float32) / B
rays_b = get_rays(pose, intr_b, Hb, Wb)
aabb = jnp.asarray(aabb_np)
blk = min(131072, ((Hb * Wb + 8191) // 8192) * 8192)
npad = ((Hb * Wb + blk - 1) // blk) * blk
ro_p = jnp.concatenate([rays_b["rays_o"],
                        jnp.broadcast_to(rays_b["rays_o"][:1],
                                         (npad - Hb * Wb, 3))])
rd_p = jnp.concatenate([rays_b["rays_d"],
                        jnp.broadcast_to(rays_b["rays_d"][:1],
                                         (npad - Hb * Wb, 3))])
for tag in ("cold", "warm"):
    t0 = time.time()
    hit_d, t0_d, t1_d = R._occ_ray_hits(ro_p, rd_p, occ_dil, aabb,
                                        rcfg.bound, rcfg.min_near,
                                        rcfg.grid_size, block=blk,
                                        margin_steps=2.0)
    sync_scalar(hit_d)
    print(f"B prepass {tag}:", time.time() - t0, flush=True)

t0 = time.time()
hits_b = np.asarray(hit_d)[:Hb * Wb]
print("B fetch hits (", hits_b.size, "bools):", time.time() - t0,
      flush=True)

hits = np.repeat(np.repeat(hits_b.reshape(Hb, Wb), B, 0), B, 1)[
    :H, :W].reshape(-1)
live = np.nonzero(hits)[0]
print("live rays:", live.size, "of", n, flush=True)

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

# phase C: one chunk through _render_chunk (proxy)
sl = slice(0, chunk)
for tag in ("cold", "warm", "warm2"):
    t0 = time.time()
    img, dep, ws = R._render_chunk(
        ngp_field_apply, mcfg, params, occ, ro[sl], rd[sl], 1.0, rcfg,
        nears=nears_l[sl], fars=fars_l[sl], dens8=dens8)
    sync_scalar(ws)
    print(f"C chunk {tag}:", time.time() - t0, flush=True)

n_chunks = n_pad // chunk
print("chunks needed:", n_chunks, flush=True)

# phase D: full frame via the public API
from nerf_texture_tpu.render.renderer import render_image
for tag in ("cold", "warm"):
    t0 = time.time()
    out = render_image(ngp_field_apply, mcfg, params, occ, pose, intr,
                       H, W, rcfg, density=density)
    sync_scalar(out["weights_sum"])
    print(f"D frame {tag} (no image fetch):", time.time() - t0,
          flush=True)

t0 = time.time()
img_np = np.asarray(out["image"])
print("E fetch image", img_np.nbytes / 1e6, "MB:", time.time() - t0,
      flush=True)

# d2h rate checks
for mb in (0.64, 2.56, 7.68):
    a = jnp.zeros((int(mb * 1e6 / 4),), jnp.float32) + 1.0
    sync_scalar(a[:1])
    t0 = time.time()
    _ = np.asarray(a)
    print(f"d2h {mb} MB:", time.time() - t0, flush=True)
