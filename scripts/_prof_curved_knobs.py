"""Sweep sampling-machinery knobs on the saved curved bench state
(companion to _prof_curved_frame.py; state must exist)."""
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
from _prof_curved_frame import RCFG, STATE, build_trainer, H, W


def emit(**kw):
    print(json.dumps(kw), flush=True)


tr, ds = build_trainer()
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


ARMS = {
    "base_cap5": dict(infer_color_cap=5),
    "cap5_k24": dict(infer_color_cap=5, proxy_refined=24),
    "cap5_k24_B8": dict(infer_color_cap=5, proxy_refined=24,
                        prepass_block=8),
    "cap5_B8": dict(infer_color_cap=5, prepass_block=8),
    "cap4_k24": dict(infer_color_cap=4, proxy_refined=24),
    "cap8_k24": dict(infer_color_cap=8, proxy_refined=24),
    "cap5_tau01": dict(infer_color_cap=5, prepass_tau_cull=0.01),
    "cap5_tau03": dict(infer_color_cap=5, prepass_tau_cull=0.03),
}
for name, kw in ARMS.items():
    tr.rcfg = dataclasses.replace(RCFG, **kw)
    dt = timed(lambda: tr.render_frame(npose, use_ema=False)["image"])
    img = np.asarray(tr.render_frame(npose, use_ema=False)["image"])
    emit(arm=name, frame_s=round(dt, 3), fps=round(1 / dt, 2),
         psnr=round(float(psnr_fn(img, gtw)), 2))
