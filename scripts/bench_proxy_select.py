"""A/B: Pallas fused survivor selection vs the XLA chain, on real TPU.

Run when the chip is reachable (bound it: `timeout 1800 python
scripts/bench_proxy_select.py`).  Uses the saved carved state from
scripts/_train_save.py if present, else trains 700 steps first.
Reports frame time + PSNR for proxy_pallas on/off with infer_cdf
pinned False on BOTH arms -- under top-k selection they must match to
~1e-3 dB (tests/test_proxy_select.py proves exact math parity in
interpret mode; this script proves the Mosaic compile + the speedup).
The inverse-CDF placement (infer_cdf=True, the shipping default) has
no XLA twin, so it is excluded from this parity comparison.
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

from nerf_texture_tpu.data.synthetic import SyntheticSphereDataset
from nerf_texture_tpu.models.ngp import NGPConfig
from nerf_texture_tpu.ops.occupancy import OccupancyGrid
from nerf_texture_tpu.render.renderer import RenderConfig
from nerf_texture_tpu.train.trainer import TrainConfig, Trainer

H = W = 800
ds = SyntheticSphereDataset(n_frames=8, H=H, W=W)
mcfg = NGPConfig(bound=1.0, num_levels=8, level_dim=4, log2_bricks=16,
                 desired_resolution=2048)
rcfg0 = RenderConfig(bound=1.0, cascades=1, grid_size=128, max_steps=384,
                     max_samples_train=192, max_samples_infer=96,
                     ray_chunk=262144, pool_mean_samples=64,
                     pool_mean_samples_infer=24, proxy_samples=0,
                     proxy_refined=32,
                     # pin both arms to top-k: cdf has no XLA twin, so
                     # the xla-chain arm would silently run a different
                     # algorithm if infer_cdf (default True) leaked in
                     proxy_pallas=False, infer_cdf=False)
tcfg = TrainConfig(lr=1e-2, total_steps=2000, num_rays=4096,
                   grid_decay=0.85)


def make_trainer(rcfg):
    tr = Trainer(ds, mcfg, rcfg, tcfg, key=jax.random.PRNGKey(7))
    if os.path.exists("/tmp/ngp_carved.npz"):
        st = np.load("/tmp/ngp_carved.npz")
        with open("/tmp/ngp_carved_params.pkl", "rb") as f:
            params = pickle.load(f)
        tr.state = tr.state._replace(
            params=jax.tree.map(jnp.asarray, params),
            occ=OccupancyGrid(density=jnp.asarray(st["density"]),
                              occ=jnp.asarray(st["occ"]),
                              mean_density=jnp.asarray(st["mean_density"]),
                              iter_density=tr.state.occ.iter_density))
        tr._marked = True
    else:
        print("no saved state; training 700 steps...", flush=True)
        tr.train(700)
    return tr


from nerf_texture_tpu.data.poses import orbit_pose

pose = orbit_pose(np.pi / 2 + 0.2, 0.4, ds.radius)

for name, rkw in [("xla-chain ", {}),
                  ("pallas-sel", dict(proxy_pallas=True)),
                  ("bf16-table", dict(proxy_bf16=True)),
                  ("pallas+b16", dict(proxy_pallas=True, proxy_bf16=True))]:
    rcfg = dataclasses.replace(rcfg0, **rkw)
    tr = make_trainer(rcfg)
    p = tr.eval_psnr([0], use_ema=False)
    out = tr.render_frame(pose, use_ema=False)      # compile
    float(jnp.sum(out["weights_sum"]))
    t0 = time.time()
    for _ in range(5):
        out = tr.render_frame(pose, use_ema=False)
    float(jnp.sum(out["weights_sum"]))
    dt = (time.time() - t0) / 5
    print(f"{name}: PSNR={p:.3f} frame={dt*1e3:.0f}ms ({1/dt:.2f} fps)",
          flush=True)
