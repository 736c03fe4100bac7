"""Sweep marching-cubes thresholds on the FAST parity tier's 200-step
NGP field: report component structure of the extracted mesh per
threshold (diagnoses the 0-patch failure: largest component was a
212-face blob at threshold 10).
Run: python scripts/_dbg_mc_threshold.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  "/root/repo/.jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from nerf_texture_tpu.data.synthetic import SyntheticShellDataset
from nerf_texture_tpu.models import ngp as ngp_mod
from nerf_texture_tpu.models.ngp import NGPConfig
from nerf_texture_tpu.render.renderer import RenderConfig
from nerf_texture_tpu.train.trainer import TrainConfig, Trainer

H = W = 28
ds = SyntheticShellDataset(n_frames=6, H=H, W=W)
mcfg = NGPConfig(bound=1.0, num_levels=6, level_dim=2, base_resolution=16,
                 desired_resolution=96, log2_hashmap_size=13,
                 hidden_dim=64, hidden_dim_color=64)
rcfg = RenderConfig(bound=1.0, cascades=1, grid_size=32, max_steps=96,
                    max_samples_train=48, max_samples_infer=64,
                    ray_chunk=1600, infer_mode="pool")
tcfg = TrainConfig(lr=1e-2, total_steps=200, num_rays=512,
                   grid_update_interval=16, grid_decay=0.85)
tr = Trainer(ds, mcfg, rcfg, tcfg, key=jax.random.PRNGKey(3))
tr.train(200)
params = tr.state.params


def density(p):
    return ngp_mod.density(params, p, mcfg)[0]


from nerf_texture_tpu.ops.isosurface import extract_mesh
from nerf_texture_tpu.geometry.mesh import Mesh
from nerf_texture_tpu.geometry import shape_tools

for thr in [10.0, 5.0, 2.5, 1.0, 0.5]:
    try:
        v, f = extract_mesh(density, resolution=40, bound=1.0,
                            threshold=thr)
    except Exception as e:      # noqa: BLE001
        print(f"thr {thr}: extract failed: {e}", flush=True)
        continue
    if not len(f):
        print(f"thr {thr}: empty", flush=True)
        continue
    m = Mesh(np.asarray(v, np.float32), np.asarray(f))
    big = shape_tools.keep_largest_component(m)
    radii = np.linalg.norm(big.vertices, axis=-1)
    print(f"thr {thr}: mesh {len(v)}v/{len(f)}f largest-comp "
          f"{len(big.vertices)}v/{len(big.faces)}f "
          f"r_med {np.median(radii):.3f} "
          f"r_range {radii.min():.3f}..{radii.max():.3f} "
          f"(base {ds.base})", flush=True)
