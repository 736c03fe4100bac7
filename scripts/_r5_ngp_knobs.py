"""Round-5: NGP render-knob sweep on a saved bench-config state (TPU).

Trains the bench NGP config once (700 steps, pickled to
.bench/ngp_bench_state.pkl, shared with _prof_bench_frame.py), then
measures pipelined fps + novel-view PSNR across proxy_refined / cap
arms -- the window-refined prepass (round 5b) should let K=16 match
K=24.  Run: python scripts/_r5_ngp_knobs.py
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import dataclasses
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from _prof_bench_frame import make_trainer, rcfg0, ds, H, W

from nerf_texture_tpu.data.poses import orbit_pose
from nerf_texture_tpu.data.synthetic import render_gt_sphere
from nerf_texture_tpu.utils.metrics import psnr as psnr_fn


def emit(**kw):
    print(json.dumps(kw), flush=True)


jnp_sum = jax.jit(jnp.sum)
tr = make_trainer(dataclasses.replace(rcfg0, prepass_block=8,
                                      prepass_tau_cull=0.1,
                                      infer_color_cap=4))
npose = orbit_pose(np.pi / 2 + 0.2, 0.3, ds.radius)
poses = [orbit_pose(np.pi / 2 + 0.2, 0.3 + 0.1 * i, ds.radius)
         for i in range(4)]
gt = render_gt_sphere(npose, ds.intrinsics, H, W, ds.sphere_radius)
gtw = (gt[..., :3] / 255.0 * (gt[..., 3:] / 255.0)
       + 1.0 - gt[..., 3:] / 255.0)

ARMS = {
    "cap4_K24": dict(proxy_refined=24, infer_color_cap=4),
    "cap4_K16": dict(proxy_refined=16, infer_color_cap=4),
    "cap4_K12": dict(proxy_refined=12, infer_color_cap=4),
    "cap5_K16": dict(proxy_refined=16, infer_color_cap=5),
}
for name, kw in ARMS.items():
    tr.rcfg = dataclasses.replace(rcfg0, prepass_block=8,
                                  prepass_tau_cull=0.1, **kw)
    for p in poses:
        out = tr.render_frame(p, use_ema=False)
    jax.block_until_ready(out["image"])
    n = 6
    t0 = time.perf_counter()
    for i in range(n):
        out = tr.render_frame(poses[1 + i % 3], use_ema=False)
    float(jnp_sum(out["image"]))
    dt = (time.perf_counter() - t0) / n
    img = np.asarray(tr.render_frame(npose, use_ema=False)["image"])
    emit(arm=name, ms=round(dt * 1e3, 1), fps=round(1 / dt, 2),
         psnr=round(float(psnr_fn(img, gtw)), 2))
