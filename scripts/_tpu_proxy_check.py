"""TPU check: proxy vs pool eval PSNR + frame time on the saved state."""
import dataclasses
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
import numpy as np

from nerf_texture_tpu.data.synthetic import SyntheticSphereDataset
from nerf_texture_tpu.models.ngp import NGPConfig
from nerf_texture_tpu.ops.occupancy import OccupancyGrid
from nerf_texture_tpu.render.renderer import RenderConfig
from nerf_texture_tpu.train.trainer import TrainConfig, Trainer

st = np.load("/tmp/ngp_state.npz")
with open("/tmp/ngp_params.pkl", "rb") as f:
    params = pickle.load(f)

ds = SyntheticSphereDataset(n_frames=24, H=400, W=400)
mcfg = NGPConfig(bound=1.0)
rcfg = RenderConfig.for_bound(1.0, dt_gamma=0.0, max_steps=384)
tcfg = TrainConfig(lr=1e-2, total_steps=2000, num_rays=4096)
tr = Trainer(ds, mcfg, rcfg, tcfg, key=jax.random.PRNGKey(0))
occ = OccupancyGrid(density=jnp.asarray(st["density"]),
                    occ=jnp.asarray(st["occ"]),
                    mean_density=jnp.asarray(st["mean_density"]),
                    iter_density=tr.state.occ.iter_density)
tr.state = tr.state._replace(
    params=jax.tree.map(jnp.asarray, params), occ=occ)

for mode in ("proxy", "pool"):
    tr.rcfg = dataclasses.replace(rcfg, infer_mode=mode)
    t0 = time.time()
    p = tr.eval_psnr([0], use_ema=False)
    t_cold = time.time() - t0
    t0 = time.time()
    p = tr.eval_psnr([0], use_ema=False)
    t_warm = time.time() - t0
    print(f"{mode}: PSNR={p:.3f} cold={t_cold:.1f}s warm={t_warm:.2f}s",
          flush=True)
