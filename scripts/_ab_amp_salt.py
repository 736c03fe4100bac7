"""A/B: train_table_bf16 (AMP) on/off at the EXACT bench point (800^2,
8 levels x 4ch, 700 steps): empty-space salt density, PSNR, live rays,
frame time.  Diagnoses the r2 1.755->1.087 fps + 27.17->25.86 dB drop.
Run: timeout 1700 python scripts/_ab_amp_salt.py [on|off]
"""
import os
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
from nerf_texture_tpu.models import ngp
from nerf_texture_tpu.models.ngp import NGPConfig
from nerf_texture_tpu.render.renderer import RenderConfig
from nerf_texture_tpu.train.trainer import TrainConfig, Trainer

amp = (sys.argv[1] if len(sys.argv) > 1 else "on") == "on"
H = W = 800
ds = SyntheticSphereDataset(n_frames=8, H=H, W=W)
mcfg = NGPConfig(bound=1.0, num_levels=8, level_dim=4, log2_bricks=16,
                 desired_resolution=2048, train_table_bf16=amp)
rcfg = RenderConfig(bound=1.0, cascades=1, grid_size=128, max_steps=384,
                    max_samples_train=192, max_samples_infer=96,
                    ray_chunk=32768, pool_mean_samples=64,
                    pool_mean_samples_infer=24, proxy_samples=0,
                    proxy_refined=24)
tcfg = TrainConfig(lr=1e-2, total_steps=2000, num_rays=4096,
                   grid_decay=0.85)
tr = Trainer(ds, mcfg, rcfg, tcfg, key=jax.random.PRNGKey(7))
t0 = time.perf_counter()
tr.train(700)
np.asarray(tr.state.params["grid"][:1])
print(f"train 700: {time.perf_counter()-t0:.0f}s", flush=True)

dens = np.asarray(tr.state.occ.density)[0]
print(f"amp={amp} occ_frac {(np.asarray(tr.state.occ.occ)).mean():.4f}",
      flush=True)

# fresh field resample at cell centers (salt = far-field density)
from nerf_texture_tpu.ops import occupancy as occ_mod
Hg = 128
coords = occ_mod.grid_coords(Hg).astype(jnp.float32)
xyz = 2.0 * (coords + 0.5) / Hg - 1.0
xyz = xyz * (1.0 - 1.0 / Hg) / (1.0 - 1.0 / Hg)

@jax.jit
def chunk_sig(p):
    s, _ = ngp.density(tr.state.params, p, mcfg)
    return s

sig = []
x = np.asarray(xyz)
for s0 in range(0, Hg ** 3, 262144):
    sig.append(np.asarray(chunk_sig(jnp.asarray(x[s0:s0 + 262144]))))
sig = np.concatenate(sig)
r = np.linalg.norm(x, axis=-1)
far = r > 0.7
print(f"fresh salt (r>0.7): >0.01 {(sig[far]>0.01).mean():.4f} "
      f">0.04 {(sig[far]>0.04).mean():.4f} p99 {np.percentile(sig[far],99):.4f}",
      flush=True)
ema_far = dens.reshape(-1)[far[:len(dens)]] if len(dens)==len(far) else None
print(f"EMA salt  (r>0.7): >0.01 {(dens[far]>0.01).mean():.4f} "
      f">0.04 {(dens[far]>0.04).mean():.4f}", flush=True)

psnr = tr.eval_psnr([0], use_ema=False)
print(f"train-pose PSNR: {psnr:.2f}", flush=True)

pose = orbit_pose(np.pi / 2 + 0.2, 0.4, ds.radius)
out = tr.render_frame(pose, use_ema=False)
np.asarray(out["image"])[0, 0]
t0 = time.perf_counter()
for i in range(3):
    out = tr.render_frame(pose, use_ema=False)
np.asarray(out["image"])[0, 0]
dt = (time.perf_counter() - t0) / 3
ws = float(np.asarray(out["weights_sum"]).sum())
print(f"frame: {dt*1e3:.0f} ms ({1/dt:.2f} fps) wsum={ws:.0f}", flush=True)
