"""Quality check: curved model converges with per-ray projection (TPU)."""
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

ds = SyntheticSphereDataset(n_frames=8, H=400, W=400)
mp = MeshProjector(make_icosphere(4, radius=0.5))
rcfg = RenderConfig(bound=1.0, cascades=1, grid_size=128, max_steps=512,
                    max_samples_train=128, max_samples_infer=96,
                    ray_chunk=16384, pool_mean_samples=64,
                    pool_mean_samples_infer=24, march_steps_infer=256)
tcfg = CurvedTrainConfig(lr=1e-2, total_steps=1500, num_rays=4096,
                         grid_update_interval=500, grid_full_updates=1)
ccfg = CurvedFieldConfig(field=MeshFieldConfig(), light_model="SH")
tr = CurvedTrainer(ds, mesh_field.make_state(mp), ccfg, rcfg, tcfg,
                   key=jax.random.PRNGKey(3))
t0 = time.perf_counter()
for block in range(15):
    m = tr.train(100)
    print(f"step {(block+1)*100} loss={m['loss']:.5f} "
          f"({time.perf_counter()-t0:.0f}s)", flush=True)
p = tr.eval_psnr([0, 3], use_ema=False)
pe = tr.eval_psnr([0, 3], use_ema=True)
print(f"PSNR raw={p:.2f} ema={pe:.2f}", flush=True)
