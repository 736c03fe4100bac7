"""Reproduce the bench-curved NaN (r5): train the exact bench curved
config (8 frames) and check params/renders for NaN along the way."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from nerf_texture_tpu.data.synthetic import SyntheticSphereDataset
from nerf_texture_tpu.geometry.mesh import make_icosphere
from nerf_texture_tpu.geometry.projector import MeshProjector
from nerf_texture_tpu.models import mesh_field
from nerf_texture_tpu.models.curved_field import CurvedFieldConfig
from nerf_texture_tpu.models.mesh_field import MeshFieldConfig
from nerf_texture_tpu.render.renderer import RenderConfig
from nerf_texture_tpu.train.curved_trainer import (CurvedTrainConfig,
                                                   CurvedTrainer)


def emit(**kw):
    print(json.dumps(kw), flush=True)


H = W = 800
ds = SyntheticSphereDataset(n_frames=8, H=H, W=W)
mp = MeshProjector(make_icosphere(4, radius=0.5))
rcfg = RenderConfig(bound=1.0, cascades=1, grid_size=128, max_steps=512,
                    max_samples_train=128, max_samples_infer=96,
                    ray_chunk=16384, pool_mean_samples=64,
                    pool_mean_samples_infer=24, march_steps_infer=256,
                    proxy_samples=0, proxy_refined=24, infer_color_cap=5)
tcfg = CurvedTrainConfig(lr=1e-2, total_steps=4000, num_rays=4096,
                         grid_update_interval=16, grid_full_updates=0)
ccfg = CurvedFieldConfig(field=MeshFieldConfig(), light_model="SH")
tr = CurvedTrainer(ds, mesh_field.make_state(mp), ccfg, rcfg, tcfg,
                   key=jax.random.PRNGKey(7))

tab = np.asarray(tr._anchor_table())
emit(stage="anchor_tab", nan=int(np.isnan(tab).sum()),
     hit_frac=round(float((tab.reshape(-1, 16)[:, 15] > 0.5).mean()), 3))

tr.initialize_states(1)
tr.train(17)
for blk in (100, 200, 200, 183):
    t0 = time.perf_counter()
    m = tr.train(blk)
    nan_params = sum(int(jnp.isnan(l).sum())
                     for l in jax.tree.leaves(tr.state.params)
                     if jnp.issubdtype(l.dtype, jnp.floating))
    emit(step=int(tr.state.step), loss=float(m["loss"]),
         nan_params=nan_params,
         s=round(time.perf_counter() - t0, 1))
from nerf_texture_tpu.data.poses import orbit_pose
npose = orbit_pose(np.pi / 2 + 0.2, 0.3, ds.radius)
img = np.asarray(tr.render_frame(npose, use_ema=False)["image"])
emit(stage="render_live", nan_px=int(np.isnan(img).sum()),
     mean=float(np.nanmean(img)))
imgp = np.asarray(tr.render_frame(npose, use_ema=False,
                                  parity=True)["image"])
emit(stage="render_pool", nan_px=int(np.isnan(imgp).sum()))
