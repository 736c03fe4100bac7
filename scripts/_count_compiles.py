"""Count distinct XLA compilations along the bench path (CPU, tiny shapes).

Warmup attack (VERDICT r1 weak #4): every distinct compiled program costs
seconds-to-minutes through the remote TPU compiler on first run.  The
program COUNT is shape-independent, so count them here on CPU with tiny
configs and shrink the set (unify chunk shapes, drop variant programs).
"""
import collections
import logging
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_log_compiles", True)

import numpy as np

compiles = []


class H(logging.Handler):
    def emit(self, rec):
        m = rec.getMessage()
        mm = re.search(r"Compiling (\S+)", m)
        if mm:
            compiles.append(mm.group(1))
            print(f"C{len(compiles):3d} [{mm.group(1)[:60]}]", flush=True)


for name in ("jax._src.interpreters.pxla", "jax._src.dispatch"):
    lg = logging.getLogger(name)
    lg.setLevel(logging.DEBUG)
    lg.addHandler(H())

from nerf_texture_tpu.data.poses import orbit_pose
from nerf_texture_tpu.data.synthetic import SyntheticSphereDataset
from nerf_texture_tpu.models.ngp import NGPConfig
from nerf_texture_tpu.render.renderer import RenderConfig
from nerf_texture_tpu.train.trainer import TrainConfig, Trainer

H_ = W_ = 32
ds = SyntheticSphereDataset(n_frames=4, H=H_, W=W_)
mcfg = NGPConfig(bound=1.0, num_levels=4, level_dim=2, log2_bricks=10,
                 desired_resolution=128)
rcfg = RenderConfig(bound=1.0, cascades=1, grid_size=32, max_steps=48,
                    max_samples_train=24, max_samples_infer=16,
                    ray_chunk=1024, pool_mean_samples=8,
                    pool_mean_samples_infer=8, proxy_samples=0,
                    proxy_refined=8, infer_color_cap=4)
tcfg = TrainConfig(lr=1e-2, total_steps=2000, num_rays=256,
                   grid_decay=0.85, grid_update_interval=16)
trainer = Trainer(ds, mcfg, rcfg, tcfg, key=jax.random.PRNGKey(7))
print("== PHASE train(50)", flush=True)
trainer.train(50)
n0 = len(compiles)
print("== PHASE train(20) more -- expect 0 new", flush=True)
trainer.train(20)
print(f"   (+{len(compiles) - n0})", flush=True)
n0 = len(compiles)
print("== PHASE eval_psnr([0])", flush=True)
trainer.eval_psnr([0], use_ema=False)
print(f"   (+{len(compiles) - n0})", flush=True)
n0 = len(compiles)
print("== PHASE render_frame(novel)", flush=True)
trainer.render_frame(orbit_pose(np.pi / 2 + 0.2, 0.3, ds.radius),
                     use_ema=False)
print(f"   (+{len(compiles) - n0})", flush=True)
n0 = len(compiles)
print("== PHASE render_frame(novel 2) -- expect 0 new", flush=True)
trainer.render_frame(orbit_pose(np.pi / 2 + 0.2, 0.4, ds.radius),
                     use_ema=False)
print(f"   (+{len(compiles) - n0})", flush=True)
print("== TOTAL", len(compiles), flush=True)
for k, v in collections.Counter(compiles).most_common():
    print(f"  {v:3d}x {k[:70]}")
