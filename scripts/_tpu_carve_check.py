"""After the decay fix: grid occupancy fraction, live-ray fraction, and
frame time vs ray_chunk on the real chip."""
import dataclasses
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

from nerf_texture_tpu.data.synthetic import SyntheticSphereDataset
from nerf_texture_tpu.models.ngp import NGPConfig
from nerf_texture_tpu.render.renderer import RenderConfig
from nerf_texture_tpu.train.trainer import TrainConfig, Trainer

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

for tranche in (100, 200, 400):
    t0 = time.time()
    tr.train(tranche)
    occ_frac = float(jnp.mean(tr.state.occ.occ.astype(jnp.float32)))
    md = float(tr.state.occ.mean_density)
    print(f"after +{tranche}: occ_frac={occ_frac:.4f} "
          f"mean_density={md:.3f} ({time.time()-t0:.0f}s)", flush=True)

psnr = tr.eval_psnr([0], use_ema=False)
print("PSNR:", psnr, flush=True)

from nerf_texture_tpu.data.poses import orbit_pose
pose = orbit_pose(np.pi / 2 + 0.2, 0.4, ds.radius)
for chunk in (40000, 80000):
    for mode in ("proxy", "pool"):
        tr.rcfg = dataclasses.replace(rcfg, ray_chunk=chunk,
                                      infer_mode=mode)
        out = tr.render_frame(pose, use_ema=False)     # compile
        float(jnp.sum(out["weights_sum"]))
        t0 = time.time()
        for _ in range(3):
            out = tr.render_frame(pose, use_ema=False)
        float(jnp.sum(out["weights_sum"]))
        dt = (time.time() - t0) / 3
        print(f"chunk={chunk} mode={mode}: {dt*1e3:.0f} ms/frame "
              f"({1.0/dt:.2f} fps)", flush=True)
