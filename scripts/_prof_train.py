"""Profile train_step vs grid_step on the real chip; save trained state."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from nerf_texture_tpu.data.synthetic import SyntheticSphereDataset
from nerf_texture_tpu.models.ngp import NGPConfig
from nerf_texture_tpu.render.renderer import RenderConfig
from nerf_texture_tpu.train.trainer import (TrainConfig, Trainer,
                                            grid_step, train_step)


def sync(x):
    jax.block_until_ready(x)


ds = SyntheticSphereDataset(n_frames=24, H=400, W=400)
mcfg = NGPConfig(bound=1.0)
rcfg = RenderConfig.for_bound(1.0, dt_gamma=0.0, max_steps=384)
tcfg = TrainConfig(lr=1e-2, total_steps=2000, num_rays=4096)
tr = Trainer(ds, mcfg, rcfg, tcfg, key=jax.random.PRNGKey(0))
print("ctor done", flush=True)

# warm up both programs
t0 = time.time()
tr.train(40)
sync(tr.state.params["grid"])
print("warm40", time.time() - t0, flush=True)

# train_step alone (no grid updates): call the jitted fn directly
poses = tr._poses if hasattr(tr, "_poses") else None
key = jax.random.PRNGKey(1)
state = tr.state
images = tr.images if hasattr(tr, "images") else None
# use trainer internals the way train() does
import inspect
src = inspect.getsource(tr.train)
print("--- timing pieces ---", flush=True)

# steady-state mixed train (includes grid updates)
for n in (48, 48):
    t0 = time.time()
    tr.train(n)
    sync(tr.state.params["grid"])
    print(f"train{n} mixed: {(time.time()-t0)/n*1000:.1f} ms/step",
          flush=True)

# grid_step alone
k = jax.random.PRNGKey(2)
t0 = time.time()
s2 = grid_step(tr.state, k, mcfg=tr.mcfg, rcfg=tr.rcfg, full=False,
               decay=tr.tcfg.grid_decay)
sync(s2.occ.density)
print("grid_step partial (incl compile):", time.time() - t0, flush=True)
t0 = time.time()
s2 = grid_step(tr.state, jax.random.PRNGKey(3), mcfg=tr.mcfg,
               rcfg=tr.rcfg, full=False, decay=tr.tcfg.grid_decay)
sync(s2.occ.density)
print("grid_step partial (warm):", time.time() - t0, flush=True)
t0 = time.time()
s3 = grid_step(tr.state, jax.random.PRNGKey(4), mcfg=tr.mcfg,
               rcfg=tr.rcfg, full=True, decay=tr.tcfg.grid_decay)
sync(s3.occ.density)
print("grid_step full (incl compile):", time.time() - t0, flush=True)
t0 = time.time()
s3 = grid_step(tr.state, jax.random.PRNGKey(5), mcfg=tr.mcfg,
               rcfg=tr.rcfg, full=True, decay=tr.tcfg.grid_decay)
sync(s3.occ.density)
print("grid_step full (warm):", time.time() - t0, flush=True)

# now train longer so the field is realistic, then save state
t0 = time.time()
tr.train(400)
sync(tr.state.params["grid"])
print("train400:", (time.time() - t0) / 400 * 1000, "ms/step", flush=True)

np.savez("/tmp/ngp_state.npz",
         density=np.asarray(tr.state.occ.density),
         occ=np.asarray(tr.state.occ.occ),
         mean_density=np.asarray(tr.state.occ.mean_density),
         **{f"p_{k}": np.asarray(v) for k, v in
            jax.tree_util.tree_leaves_with_path(tr.state.params) and []})
# params pytree saved via pickle instead (nested dicts)
import pickle
with open("/tmp/ngp_params.pkl", "wb") as f:
    pickle.dump(jax.tree.map(np.asarray, tr.state.params), f)
print("saved state", flush=True)

psnr = tr.eval_psnr([0], use_ema=False)
print("PSNR(proxy after ~500 steps):", psnr, flush=True)
import dataclasses
tr.rcfg = dataclasses.replace(rcfg, infer_mode="pool")
print("PSNR(pool):", tr.eval_psnr([0], use_ema=False), flush=True)
