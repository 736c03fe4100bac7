"""Count distinct XLA compilations along the CURVED bench path (CPU).

Companion to _count_compiles.py: the flagship NeRF-Texture trainer has
its own program set (projection, scan-fused steps, sparse grid refresh,
anchor table).  Tiny configs; the program COUNT is shape-independent.
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
from nerf_texture_tpu.geometry.mesh import make_icosphere
from nerf_texture_tpu.geometry.projector import MeshProjector
from nerf_texture_tpu.models import mesh_field
from nerf_texture_tpu.models.curved_field import CurvedFieldConfig
from nerf_texture_tpu.models.mesh_field import MeshFieldConfig
from nerf_texture_tpu.render.renderer import RenderConfig
from nerf_texture_tpu.train.curved_trainer import (CurvedTrainConfig,
                                                   CurvedTrainer)

H_ = W_ = 32
ds = SyntheticSphereDataset(n_frames=4, H=H_, W=W_)
mp = MeshProjector(make_icosphere(1, radius=0.5))
rcfg = RenderConfig(bound=1.0, cascades=1, grid_size=32, max_steps=48,
                    max_samples_train=24, max_samples_infer=16,
                    ray_chunk=1024, pool_mean_samples=8,
                    pool_mean_samples_infer=8, march_steps_infer=24,
                    proxy_samples=0, proxy_refined=8, infer_color_cap=4)
tcfg = CurvedTrainConfig(lr=5e-3, total_steps=2000, num_rays=256,
                         grid_update_interval=16, grid_full_updates=0)
ccfg = CurvedFieldConfig(field=MeshFieldConfig(
    num_levels=3, level_dim=2, base_resolution=16, desired_resolution=32,
    log2_bricks=9, h_threshold=0.12), light_model="SH")
tr = CurvedTrainer(ds, mesh_field.make_state(mp), ccfg, rcfg, tcfg,
                   key=jax.random.PRNGKey(7))
print("== PHASE initialize_states(1)", flush=True)
tr.initialize_states(1)
n0 = len(compiles)
print(f"   (init total {n0})", flush=True)
print("== PHASE train(17) -- step compile + one refresh", flush=True)
tr.train(17)
print(f"   (+{len(compiles) - n0})", flush=True)
n0 = len(compiles)
print("== PHASE train(16) more -- expect 0 new", flush=True)
tr.train(16)
print(f"   (+{len(compiles) - n0})", flush=True)
n0 = len(compiles)
print("== PHASE render_frame(novel)", flush=True)
tr.render_frame(orbit_pose(np.pi / 2 + 0.2, 0.3, ds.radius),
                use_ema=False)
print(f"   (+{len(compiles) - n0})", flush=True)
n0 = len(compiles)
print("== PHASE render_frame(novel 2) -- expect 0 new", flush=True)
tr.render_frame(orbit_pose(np.pi / 2 + 0.2, 0.4, ds.radius),
                use_ema=False)
print(f"   (+{len(compiles) - n0})", flush=True)
print("== TOTAL", len(compiles), flush=True)
for k, v in collections.Counter(compiles).most_common():
    print(f"  {v:3d}x {k[:70]}")
