import sys, os; sys.path.insert(0, "/root/repo")
import time, json
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from nerf_texture_tpu.data.synthetic import SyntheticSphereDataset
from nerf_texture_tpu.models.ngp import NGPConfig
from nerf_texture_tpu.render.renderer import RenderConfig
from nerf_texture_tpu.train.trainer import TrainConfig, Trainer

H = W = 800
t0 = time.perf_counter()
ds = SyntheticSphereDataset(n_frames=8, H=H, W=W)
print("dataset", time.perf_counter()-t0, flush=True)
mcfg = NGPConfig(bound=1.0, num_levels=16, level_dim=2,
                 log2_hashmap_size=19, desired_resolution=2048)
rcfg = RenderConfig(bound=1.0, cascades=1, grid_size=128,
                    max_steps=512, max_samples_train=192,
                    max_samples_infer=128, ray_chunk=8192)
tcfg = TrainConfig(lr=1e-2, total_steps=1000, num_rays=4096)
tr = Trainer(ds, mcfg, rcfg, tcfg, key=jax.random.PRNGKey(7))
t0=time.perf_counter(); tr.mark_untrained(); jax.block_until_ready(tr.state.occ.density); print("mark", time.perf_counter()-t0, flush=True)
t0=time.perf_counter(); tr.train(1); print("step1", time.perf_counter()-t0, flush=True)
t0=time.perf_counter(); tr.train(15); print("15 steps", time.perf_counter()-t0, flush=True)
t0=time.perf_counter(); tr.train(64); print("64 steps", time.perf_counter()-t0, flush=True)
t0=time.perf_counter(); tr.train(320); print("320 steps", time.perf_counter()-t0, flush=True)
t0=time.perf_counter(); out = tr.render_frame(ds.poses[0], use_ema=False); jax.block_until_ready(out["image"]); print("render1 (compile)", time.perf_counter()-t0, flush=True)
t0=time.perf_counter(); out = tr.render_frame(ds.poses[1], use_ema=False); jax.block_until_ready(out["image"]); print("render2", time.perf_counter()-t0, flush=True)
t0=time.perf_counter(); out = tr.render_frame(ds.poses[2], use_ema=False); jax.block_until_ready(out["image"]); print("render3", time.perf_counter()-t0, flush=True)
gt = np.asarray(ds.images[0]).astype(np.float32)/255.0
gt = gt[...,:3]*gt[...,3:] + (1-gt[...,3:])
out0 = tr.render_frame(ds.poses[0], use_ema=False)
mse = float(np.mean((np.asarray(out0["image"])-gt)**2))
print("psnr", -10*np.log10(mse), flush=True)
