"""Round-5: validate the column-collapsed anchor chart.

Trains the bench curved config (700 steps) with collapse_columns=True,
saves the state to .bench/curved_r5_state.pkl, and evals novel-view
PSNR (proxy + pool) and frame time, including the B=8 prepass arm.

Run: python scripts/_r5_train_collapsed.py
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import dataclasses
import json
import pickle
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from nerf_texture_tpu.data.poses import orbit_pose
from nerf_texture_tpu.data.synthetic import render_gt_sphere
from nerf_texture_tpu.ops import occupancy as occ_mod
from nerf_texture_tpu.utils.metrics import psnr as psnr_fn
from _prof_curved_frame import RCFG, build_trainer, H, W

STATE = "/root/repo/.bench/curved_r5_state.pkl"


def emit(**kw):
    print(json.dumps(kw), flush=True)


tr, ds = build_trainer()
tr.anchor_collapse = True
if os.path.exists(STATE):
    with open(STATE, "rb") as fh:
        st = pickle.load(fh)
    tr.state = tr.state._replace(
        params=jax.tree.map(jnp.asarray, st["params"]),
        occ=occ_mod.OccupancyGrid(
            density=jnp.asarray(st["density"]),
            occ=jnp.asarray(st["occ"]),
            mean_density=jnp.asarray(st["mean_density"]),
            iter_density=tr.state.occ.iter_density),
        step=jnp.asarray(700, jnp.int32))
    emit(loaded=STATE)
else:
    tr.initialize_states(1)
    t0 = time.perf_counter()
    tr.train(700)
    emit(trained_s=round(time.perf_counter() - t0, 1))
    os.makedirs(os.path.dirname(STATE), exist_ok=True)
    with open(STATE, "wb") as fh:
        pickle.dump({
            "params": jax.tree.map(np.asarray, tr.state.params),
            "density": np.asarray(tr.state.occ.density),
            "occ": np.asarray(tr.state.occ.occ),
            "mean_density": np.asarray(tr.state.occ.mean_density),
        }, fh)

npose = orbit_pose(np.pi / 2 + 0.2, 0.3, ds.radius)
gt = render_gt_sphere(npose, ds.intrinsics, H, W, ds.sphere_radius)
gtw = (gt[..., :3] / 255.0 * (gt[..., 3:] / 255.0)
       + 1.0 - gt[..., 3:] / 255.0)


def timed(fn, n=4):
    out = fn()
    np.asarray(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    np.asarray(out)
    return (time.perf_counter() - t0) / n


for name, kw in (("cap5_k24_B4", dict(infer_color_cap=5, proxy_refined=24)),
                 ("cap5_k24_B8", dict(infer_color_cap=5, proxy_refined=24,
                                      prepass_block=8)),
                 ("cap4_k24_B8", dict(infer_color_cap=4, proxy_refined=24,
                                      prepass_block=8))):
    tr.rcfg = dataclasses.replace(RCFG, **kw)
    dt = timed(lambda: tr.render_frame(npose, use_ema=False)["image"])
    img = np.asarray(tr.render_frame(npose, use_ema=False)["image"])
    emit(arm=name, ms=round(dt * 1e3), fps=round(1 / dt, 2),
         psnr=round(float(psnr_fn(img, gtw)), 2))

tr.rcfg = dataclasses.replace(RCFG, infer_color_cap=5, proxy_refined=24)
imgp = np.asarray(tr.render_frame(npose, use_ema=False,
                                  parity=True)["image"])
emit(arm="pool_parity", psnr=round(float(psnr_fn(imgp, gtw)), 2))
