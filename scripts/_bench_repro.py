"""Replicate bench.py's NGP render path with diagnostics."""
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

from nerf_texture_tpu.data.poses import orbit_pose
from nerf_texture_tpu.data.synthetic import SyntheticSphereDataset
from nerf_texture_tpu.models.ngp import NGPConfig
from nerf_texture_tpu.render.renderer import RenderConfig
from nerf_texture_tpu.train.trainer import TrainConfig, Trainer


def sync(x):
    return jax.block_until_ready(np.asarray(x))


H = W = 800
ds = SyntheticSphereDataset(n_frames=8, H=H, W=W)
mcfg = NGPConfig(bound=1.0, num_levels=8, level_dim=4,
                 log2_bricks=16, desired_resolution=2048)
rcfg = RenderConfig(bound=1.0, cascades=1, grid_size=128,
                    max_steps=384, max_samples_train=192,
                    max_samples_infer=96, ray_chunk=80000,
                    pool_mean_samples=64, pool_mean_samples_infer=24)
tcfg = TrainConfig(lr=1e-2, total_steps=2000, num_rays=4096,
                   grid_decay=0.85)
trainer = Trainer(ds, mcfg, rcfg, tcfg, key=jax.random.PRNGKey(7))
import pickle
from nerf_texture_tpu.ops.occupancy import OccupancyGrid
if os.path.exists("/tmp/ngp_carved_params.pkl"):
    st = np.load("/tmp/ngp_carved.npz")
    with open("/tmp/ngp_carved_params.pkl", "rb") as f:
        params = pickle.load(f)
    trainer.state = trainer.state._replace(
        params=jax.tree.map(jnp.asarray, params),
        occ=OccupancyGrid(density=jnp.asarray(st["density"]),
                          occ=jnp.asarray(st["occ"]),
                          mean_density=jnp.asarray(st["mean_density"]),
                          iter_density=trainer.state.occ.iter_density))
    trainer._marked = True
else:
    trainer.train(700)
    sync(trainer.state.params["grid"][:1])
occ_frac = float(jnp.mean(trainer.state.occ.occ.astype(jnp.float32)))
md = float(trainer.state.occ.mean_density)
print("occ_frac", occ_frac, "mean_density", md, flush=True)

psnr = trainer.eval_psnr([0], use_ema=False)
print("PSNR", psnr, flush=True)

poses = [orbit_pose(np.pi / 2 + 0.2, 0.3 + 0.1 * i, ds.radius)
         for i in range(4)]
out = trainer.render_frame(poses[0], use_ema=False)
sync(out["image"][:1, :1])
for i, p in enumerate(poses):
    t0 = time.perf_counter()
    out = trainer.render_frame(p, use_ema=False)
    sync(out["image"][:1, :1])
    print(f"pose{i}: {time.perf_counter()-t0:.3f}s", flush=True)

# repeat pose renders (steady state, same pose)
t0 = time.perf_counter()
for _ in range(3):
    out = trainer.render_frame(poses[1], use_ema=False)
sync(out["image"][:1, :1])
print("pose1 x3 unsynced:", (time.perf_counter() - t0) / 3, flush=True)
