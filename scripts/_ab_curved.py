"""Curved trainer: paired-encode train step + render chunk sweep."""
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
from nerf_texture_tpu.geometry.mesh import make_icosphere
from nerf_texture_tpu.geometry.projector import MeshProjector
from nerf_texture_tpu.models import mesh_field
from nerf_texture_tpu.models.curved_field import CurvedFieldConfig
from nerf_texture_tpu.models.mesh_field import MeshFieldConfig
from nerf_texture_tpu.render.renderer import RenderConfig
from nerf_texture_tpu.train.curved_trainer import (CurvedTrainConfig,
                                                   CurvedTrainer)

ds = SyntheticSphereDataset(n_frames=4, H=800, W=800)
mp = MeshProjector(make_icosphere(4, radius=0.5))
rcfg = RenderConfig(bound=1.0, cascades=1, grid_size=128, max_steps=512,
                    max_samples_train=128, max_samples_infer=96,
                    ray_chunk=16384, pool_mean_samples=64,
                    pool_mean_samples_infer=24, march_steps_infer=256)
tcfg = CurvedTrainConfig(lr=1e-2, total_steps=4000, num_rays=4096,
                         grid_update_interval=10 ** 9,
                         grid_full_updates=0)
ccfg = CurvedFieldConfig(field=MeshFieldConfig(), light_model="SH")
state0 = mesh_field.make_state(mp)

for pair in (True, False, True, False):
    cc = dataclasses.replace(ccfg, field=MeshFieldConfig(
        pair_prob_encode=pair))
    tr = CurvedTrainer(ds, state0, cc, rcfg, tcfg,
                       key=jax.random.PRNGKey(7))
    tr.initialize_states(1)
    tr.train(1)
    float(jnp.sum(tr.state.params["sigma_net"][0]["w"]))
    t0 = time.time()
    tr.train(8)
    float(jnp.sum(tr.state.params["sigma_net"][0]["w"]))
    print(f"train pair={pair}: {(time.time()-t0)/8*1000:.0f} ms/step",
          flush=True)
tr = CurvedTrainer(ds, state0, ccfg, rcfg, tcfg,
                   key=jax.random.PRNGKey(7))
tr.initialize_states(1)

for chunk in (16384,):
    tr.rcfg = dataclasses.replace(rcfg, ray_chunk=chunk)
    try:
        out = tr.render_frame(ds.poses[1], use_ema=False)
        float(jnp.sum(out["weights_sum"]))
        t0 = time.time()
        for _ in range(3):
            out = tr.render_frame(ds.poses[1], use_ema=False)
        float(jnp.sum(out["weights_sum"]))
        dt = (time.time() - t0) / 3
        print(f"render chunk={chunk}: {dt*1e3:.0f}ms ({1/dt:.2f} fps)",
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"render chunk={chunk}: FAILED {str(e)[:150]}", flush=True)
