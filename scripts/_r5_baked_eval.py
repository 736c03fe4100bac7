"""Round-5: baked-texture render eval on the trained r5 state (TPU).

Measures bake build time, then frame time + novel-view PSNR across
caps / chunk sizes / prepass blocks, baked vs live field.

Run: python scripts/_r5_baked_eval.py
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

t0 = time.perf_counter()
bake, _ext = tr.bake_atlas()
jax.block_until_ready(bake.atlas)
emit(stage="bake", s=round(time.perf_counter() - t0, 2),
     tiles_rows=int(bake.atlas.shape[0]), T=bake.T,
     gb=round(bake.atlas.shape[0] * 256 / 1e9, 2))


def timed(fn, n=5):
    """Pipelined frame timing, matching bench.py: dispatch n frames,
    sync once at the end (no per-frame d2h of the full image)."""
    out = fn()
    np.asarray(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    float(np.asarray(out).sum())
    return (time.perf_counter() - t0) / n


# round-5b: prepass window refinement tightens the per-ray sweep span
# to ~the shell thickness, so fewer refined samples (K) should hold
# PSNR; sweep K x cap at B8 + tau 0.1
ARMS = {
    "baked_cap5_K24": dict(infer_color_cap=5, proxy_refined=24,
                           prepass_block=8, prepass_tau_cull=0.1),
    "baked_cap5_K20": dict(infer_color_cap=5, proxy_refined=20,
                           prepass_block=8, prepass_tau_cull=0.1),
    "baked_cap5_K16": dict(infer_color_cap=5, proxy_refined=16,
                           prepass_block=8, prepass_tau_cull=0.1),
    "baked_cap6_K20": dict(infer_color_cap=6, proxy_refined=20,
                           prepass_block=8, prepass_tau_cull=0.1),
}
for name, kw in ARMS.items():
    baked = name.startswith("baked")
    tr.rcfg = dataclasses.replace(RCFG, **kw)
    fn = lambda: tr.render_frame(npose, use_ema=False,
                                 baked=baked)["image"]
    dt = timed(fn)
    img = np.asarray(fn())
    emit(arm=name, ms=round(dt * 1e3), fps=round(1 / dt, 2),
         psnr=round(float(psnr_fn(img, gtw)), 2))
