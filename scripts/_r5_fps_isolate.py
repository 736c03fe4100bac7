"""Round-5: isolate the bench-vs-profiler curved fps gap.

Times render_frame on the saved r5 state: same pose vs rotating poses,
K24 vs K16, block_until_ready vs asarray-sum sync.
Run: python scripts/_r5_fps_isolate.py
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
from nerf_texture_tpu.ops import occupancy as occ_mod
from _prof_curved_frame import RCFG, build_trainer, H, W

STATE = "/root/repo/.bench/curved_r5_state.pkl"

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


def emit(**kw):
    print(json.dumps(kw), flush=True)


npose = orbit_pose(np.pi / 2 + 0.2, 0.3, ds.radius)
poses = [orbit_pose(np.pi / 2 + 0.2, 0.3 + 0.1 * i, ds.radius)
         for i in range(4)]

for K in (24, 16):
    tr.rcfg = dataclasses.replace(RCFG, infer_color_cap=5,
                                  proxy_refined=K, prepass_block=8,
                                  prepass_tau_cull=0.1)
    # warm every pose's host path + programs
    for p in poses:
        out = tr.render_frame(p, use_ema=False, baked=True)
    jax.block_until_ready(out["image"])

    n = 6
    t0 = time.perf_counter()
    for i in range(n):
        out = tr.render_frame(npose, use_ema=False, baked=True)
    jax.block_until_ready(out["image"])
    same = (time.perf_counter() - t0) / n * 1e3

    t0 = time.perf_counter()
    for i in range(n):
        out = tr.render_frame(poses[1 + i % 3], use_ema=False, baked=True)
    jax.block_until_ready(out["image"])
    rot = (time.perf_counter() - t0) / n * 1e3

    t0 = time.perf_counter()
    for i in range(n):
        out = tr.render_frame(poses[1 + i % 3], use_ema=False, baked=True)
    float(np.asarray(out["image"]).sum())
    rot_sum = (time.perf_counter() - t0) / n * 1e3

    emit(K=K, same_pose_ms=round(same, 1), rot_pose_ms=round(rot, 1),
         rot_sum_ms=round(rot_sum, 1))
