"""TPU render timing with AABB chunk culling (fast path only)."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
import jax
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

H = W = 800
ds = SyntheticSphereDataset(n_frames=4, H=H, W=W)
mp = MeshProjector(make_icosphere(4, radius=0.5))
state = mesh_field.make_state(mp)
rcfg = RenderConfig(bound=1.0, cascades=1, grid_size=128, max_steps=512,
                    max_samples_train=128, max_samples_infer=96,
                    ray_chunk=16384, pool_mean_samples=64,
                    pool_mean_samples_infer=24, march_steps_infer=192)
tcfg = CurvedTrainConfig(lr=1e-2, total_steps=4000, num_rays=4096,
                         grid_update_interval=10**9, grid_full_updates=0)
ccfg = CurvedFieldConfig(field=MeshFieldConfig(), light_model="SH")
tr = CurvedTrainer(ds, state, ccfg, rcfg, tcfg, key=jax.random.PRNGKey(7))
t0 = time.perf_counter(); tr.initialize_states(1)
print(f"grid refresh {time.perf_counter()-t0:.1f}s", flush=True)
t0 = time.perf_counter(); tr.train(20)
print(f"20 steps {time.perf_counter()-t0:.1f}s", flush=True)
for i in range(3):
    t0 = time.perf_counter()
    out = tr.render_frame(ds.poses[i % 4], use_ema=False)
    float(np.asarray(out["image"]).sum())
    r = time.perf_counter()-t0
    print(f"render{i} {r:.2f}s = {1.0/r:.2f} fps", flush=True)
