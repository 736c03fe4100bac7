"""Curved train-step cost bisection on the real chip."""
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
tcfg0 = CurvedTrainConfig(lr=1e-2, total_steps=4000, num_rays=4096,
                          grid_update_interval=10 ** 9,
                          grid_full_updates=0)

state0 = mesh_field.make_state(mp)


def step_ms(ccfg, tcfg, n=8, label=""):
    tr = CurvedTrainer(ds, state0, ccfg, rcfg, tcfg,
                       key=jax.random.PRNGKey(7))
    tr.initialize_states(1)
    tr.train(1)
    float(jnp.sum(tr.state.params["sigma_net"][0]["w"]))
    t0 = time.time()
    tr.train(n)
    float(jnp.sum(tr.state.params["sigma_net"][0]["w"]))
    dt = (time.time() - t0) / n * 1000.0
    print(f"{label}: {dt:.0f} ms/step", flush=True)
    return dt


base = CurvedFieldConfig(field=MeshFieldConfig(), light_model="SH")
step_ms(base, tcfg0, label="SH baseline (dual table)")
step_ms(dataclasses.replace(
    base, field=MeshFieldConfig(pred_normal=False)), tcfg0,
    label="SH pred_normal=False")
step_ms(dataclasses.replace(
    base, field=MeshFieldConfig(prob_model=False)), tcfg0,
    label="SH prob_model=False")
step_ms(base, dataclasses.replace(tcfg0, num_rays=8192),
        label="SH num_rays=8192")
rc48 = dataclasses.replace(rcfg, pool_mean_samples=48)
tr = CurvedTrainer(ds, state0, base, rc48, tcfg0,
                   key=jax.random.PRNGKey(7))
tr.initialize_states(1)
tr.train(1)
float(jnp.sum(tr.state.params["sigma_net"][0]["w"]))
t0 = time.time()
tr.train(8)
float(jnp.sum(tr.state.params["sigma_net"][0]["w"]))
print(f"SH pool=48: {(time.time()-t0)/8*1000:.0f} ms/step", flush=True)
