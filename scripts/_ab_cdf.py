"""A/B: inverse-CDF survivor placement vs top-k at the bench point.

Loads the trained bench state and renders a novel view under each
config, reporting PSNR vs the analytic GT and (on TPU) frame time.
Run on TPU for timings; on CPU (H=200) it verifies the path end to end:
  timeout 1700 python scripts/_ab_cdf.py [H]
"""
import dataclasses
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax

if "cpu" in os.environ.get("JAX_PLATFORMS", "").lower():
    # sitecustomize registers the axon plugin regardless of the env var;
    # only the config update actually keeps the wedged tunnel out
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      "/root/repo/.jax_cache_cpu")
else:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from nerf_texture_tpu.data.poses import orbit_pose
from nerf_texture_tpu.data.synthetic import (SyntheticSphereDataset,
                                             render_gt_sphere)
from nerf_texture_tpu.models.ngp import NGPConfig
from nerf_texture_tpu.ops.occupancy import OccupancyGrid
from nerf_texture_tpu.render.renderer import RenderConfig
from nerf_texture_tpu.train.trainer import TrainConfig, Trainer
from nerf_texture_tpu.utils.metrics import psnr as psnr_fn

STATE = "/root/repo/.bench/ngp_bench_state.pkl"
H = W = int(sys.argv[1]) if len(sys.argv) > 1 else 800
ds = SyntheticSphereDataset(n_frames=8, H=H, W=W)
mcfg = NGPConfig(bound=1.0, num_levels=8, level_dim=4, log2_bricks=16,
                 desired_resolution=2048)
base = RenderConfig(bound=1.0, cascades=1, grid_size=128, max_steps=384,
                    max_samples_train=192, max_samples_infer=96,
                    ray_chunk=16384, pool_mean_samples=64,
                    pool_mean_samples_infer=24, proxy_samples=0,
                    proxy_refined=24)
tcfg = TrainConfig(lr=1e-2, total_steps=2000, num_rays=4096,
                   grid_decay=0.85)

tr = Trainer(ds, mcfg, base, tcfg, key=jax.random.PRNGKey(7))
with open(STATE, "rb") as fh:
    st = pickle.load(fh)
tr.state = tr.state._replace(
    params=jax.tree.map(jnp.asarray, st["params"]),
    occ=OccupancyGrid(density=jnp.asarray(st["density"]),
                      occ=jnp.asarray(st["occ"]),
                      mean_density=jnp.asarray(st["mean_density"]),
                      iter_density=tr.state.occ.iter_density))
tr._marked = True

pose = orbit_pose(np.pi / 2 + 0.2, 0.4, ds.radius)
gt = render_gt_sphere(pose, ds.intrinsics, H, W, ds.sphere_radius)
gt_rgb = gt[..., :3].astype(np.float32) / 255.0
gt_a = gt[..., 3:].astype(np.float32) / 255.0
gt_white = gt_rgb * gt_a + (1.0 - gt_a)

on_tpu = jax.devices()[0].platform == "tpu"
CONFIGS = [
    ("topk  cap8 K24 (bench)", base),
    ("cdf   cap4 K24", dataclasses.replace(base, infer_cdf=True,
                                           infer_color_cap=4)),
    ("cdf   cap5 K24", dataclasses.replace(base, infer_cdf=True,
                                           infer_color_cap=5)),
    ("cdf   cap6 K24", dataclasses.replace(base, infer_cdf=True,
                                           infer_color_cap=6)),
    ("cdf   cap3 K24", dataclasses.replace(base, infer_cdf=True,
                                           infer_color_cap=3)),
    ("cdf   cap5 K16", dataclasses.replace(base, infer_cdf=True,
                                           infer_color_cap=5,
                                           proxy_refined=16)),
    ("cdf   cap4 K16", dataclasses.replace(base, infer_cdf=True,
                                           infer_color_cap=4,
                                           proxy_refined=16)),
]
if not on_tpu and not os.environ.get("AB_ALL"):
    CONFIGS = CONFIGS[:4]

for name, rc in CONFIGS:
    tr.rcfg = rc
    out = tr.render_frame(pose, use_ema=False)
    img = np.asarray(out["image"])
    p = float(psnr_fn(img, gt_white))
    if on_tpu:
        t0 = time.perf_counter()
        for i in range(3):
            out = tr.render_frame(orbit_pose(np.pi / 2 + 0.2,
                                             0.41 + 0.01 * i, ds.radius),
                                  use_ema=False)
        np.asarray(out["image"][:1, :1])
        dt = (time.perf_counter() - t0) / 3
        print(f"{name}: psnr {p:.2f}  {dt*1e3:.0f} ms ({1/dt:.2f} fps)",
              flush=True)
    else:
        print(f"{name}: psnr {p:.2f}", flush=True)
