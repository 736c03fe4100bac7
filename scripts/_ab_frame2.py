"""Frame-time A/B on the carved grid: baseline vs proxy_bf16 vs
proxy_pallas (and full-update cost), all in ONE process reusing one
trainer (the two-trainer version OOM'd the chip).

Run: timeout 900 python scripts/_ab_frame2.py
"""
import dataclasses
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from nerf_texture_tpu.data.poses import orbit_pose
from nerf_texture_tpu.data.synthetic import SyntheticSphereDataset
from nerf_texture_tpu.models.ngp import NGPConfig
from nerf_texture_tpu.ops.occupancy import OccupancyGrid
from nerf_texture_tpu.render import renderer as R
from nerf_texture_tpu.train import trainer as T
from nerf_texture_tpu.train.trainer import TrainConfig, Trainer

STATE = "/root/repo/.bench/ngp_bench_state.pkl"
H = W = 800
ds = SyntheticSphereDataset(n_frames=8, H=H, W=W)
mcfg = NGPConfig(bound=1.0, num_levels=8, level_dim=4, log2_bricks=16,
                 desired_resolution=2048)
rcfg0 = R.RenderConfig(bound=1.0, cascades=1, grid_size=128, max_steps=384,
                       max_samples_train=192, max_samples_infer=96,
                       ray_chunk=262144, pool_mean_samples=64,
                       pool_mean_samples_infer=24, proxy_samples=0,
                       proxy_refined=32)
tcfg = TrainConfig(lr=1e-2, total_steps=2000, num_rays=4096,
                   grid_decay=0.85)

tr = Trainer(ds, mcfg, rcfg0, tcfg, key=jax.random.PRNGKey(7))
if not os.path.exists(STATE):
    sys.exit(f"{STATE} missing -- run scripts/_prof_bench_frame.py first "
             "(it trains and saves the bench state)")
with open(STATE, "rb") as fh:
    st = pickle.load(fh)
tr.state = tr.state._replace(
    params=jax.tree.map(jnp.asarray, st["params"]),
    occ=OccupancyGrid(density=jnp.asarray(st["density"]),
                      occ=jnp.asarray(st["occ"]),
                      mean_density=jnp.asarray(st["mean_density"]),
                      iter_density=tr.state.occ.iter_density))
tr._marked = True

# full refresh cost + carve
t0 = time.perf_counter()
tr.state = T.grid_step(tr.state, jax.random.PRNGKey(1), mcfg=mcfg,
                       rcfg=rcfg0, full=True, decay=0.85)
jax.block_until_ready(tr.state.occ.occ)
print(f"full grid_step (compile+run): {time.perf_counter()-t0:.2f}s",
      flush=True)
for i in range(12):
    t0 = time.perf_counter()
    tr.state = T.grid_step(tr.state, jax.random.PRNGKey(2 + i), mcfg=mcfg,
                           rcfg=rcfg0, full=True, decay=0.85)
    jax.block_until_ready(tr.state.occ.occ)
    if i == 11:
        print(f"full grid_step warm: {(time.perf_counter()-t0)*1000:.0f} ms",
              flush=True)
occ_frac = float(np.asarray(tr.state.occ.occ).mean())
print("occ frac after 13 full refreshes:", occ_frac, flush=True)

pose = orbit_pose(2.0, 0.6, 1.1)


def time_frames(tag, rcfg, n=4):
    tr.rcfg = rcfg
    out = tr.render_frame(pose, use_ema=False)      # compile
    jax.block_until_ready(out["image"])
    ts = []
    for i in range(n):
        t0 = time.perf_counter()
        out = tr.render_frame(pose, use_ema=False)
        jax.block_until_ready(out["image"])
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    img = np.asarray(out["image"])
    print(f"{tag}: {dt*1000:.0f} ms = {1/dt:.2f} fps  "
          f"(img mean {img.mean():.4f})", flush=True)
    return out


base = time_frames("baseline           ", rcfg0)
b16 = time_frames("proxy_bf16         ",
                  dataclasses.replace(rcfg0, proxy_bf16=True))
pal = time_frames("proxy_pallas       ",
                  dataclasses.replace(rcfg0, proxy_pallas=True))
both = time_frames("bf16+pallas        ",
                   dataclasses.replace(rcfg0, proxy_bf16=True,
                                       proxy_pallas=True))
time_frames("chunk=131072        ",
            dataclasses.replace(rcfg0, ray_chunk=131072))
time_frames("refined=24          ",
            dataclasses.replace(rcfg0, proxy_refined=24))
i0 = np.asarray(base["image"])
for tag, o in [("bf16", b16), ("pallas", pal), ("both", both)]:
    d = float(np.abs(np.asarray(o["image"]) - i0).max())
    print(f"max|img diff| {tag}: {d:.5f}", flush=True)
