"""A/B render quality+speed matrix on the saved carved state."""
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

from nerf_texture_tpu.data.synthetic import SyntheticSphereDataset
from nerf_texture_tpu.models.ngp import NGPConfig
from nerf_texture_tpu.ops.occupancy import OccupancyGrid
from nerf_texture_tpu.render.renderer import RenderConfig
from nerf_texture_tpu.train.trainer import TrainConfig, Trainer

st = np.load("/tmp/ngp_carved.npz")
with open("/tmp/ngp_carved_params.pkl", "rb") as f:
    params = pickle.load(f)

H = W = 800
ds = SyntheticSphereDataset(n_frames=8, H=H, W=W)
base_m = dict(bound=1.0, num_levels=8, level_dim=4, log2_bricks=16,
              desired_resolution=2048)
rcfg0 = RenderConfig(bound=1.0, cascades=1, grid_size=128, max_steps=384,
                     max_samples_train=192, max_samples_infer=96,
                     ray_chunk=262144, pool_mean_samples=64,
                     pool_mean_samples_infer=24)
tcfg = TrainConfig(lr=1e-2, total_steps=2000, num_rays=4096)


def make_trainer(mcfg, rcfg):
    tr = Trainer(ds, mcfg, rcfg, tcfg, key=jax.random.PRNGKey(7))
    tr.state = tr.state._replace(
        params=jax.tree.map(jnp.asarray, params),
        occ=OccupancyGrid(density=jnp.asarray(st["density"]),
                          occ=jnp.asarray(st["occ"]),
                          mean_density=jnp.asarray(st["mean_density"]),
                          iter_density=tr.state.occ.iter_density))
    tr._marked = True
    return tr


from nerf_texture_tpu.data.poses import orbit_pose

pose = orbit_pose(np.pi / 2 + 0.2, 0.4, ds.radius)

cases = [
    ("2-round K32/24", dict(), {}),
    ("1-round K32", dict(), dict(proxy_samples=0, proxy_refined=32)),
    ("1-round K48", dict(), dict(proxy_samples=0, proxy_refined=48)),
]
for name, mkw, rkw in cases:
    mcfg = NGPConfig(**base_m, **mkw)
    rcfg = dataclasses.replace(rcfg0, **rkw)
    tr = make_trainer(mcfg, rcfg)
    p = tr.eval_psnr([0], use_ema=False)
    out = tr.render_frame(pose, use_ema=False)
    float(jnp.sum(out["weights_sum"]))
    t0 = time.time()
    for _ in range(3):
        out = tr.render_frame(pose, use_ema=False)
    float(jnp.sum(out["weights_sum"]))
    dt = (time.time() - t0) / 3
    print(f"{name}: PSNR={p:.3f} frame={dt*1e3:.0f}ms ({1/dt:.2f} fps)",
          flush=True)
