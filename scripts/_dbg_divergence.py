"""Fine-grained trace of the ~step-1800 training divergence (400^2
sphere, lr 1e-2): per-step loss / grad norm / occupancy stats through
the collapse window."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from nerf_texture_tpu.data.synthetic import SyntheticSphereDataset
from nerf_texture_tpu.models import ngp
from nerf_texture_tpu.models.ngp import NGPConfig
from nerf_texture_tpu.render.renderer import RenderConfig
from nerf_texture_tpu.train.trainer import TrainConfig, Trainer

ds = SyntheticSphereDataset(n_frames=24, H=400, W=400)
mcfg = NGPConfig(bound=1.0, train_table_bf16=False)
rcfg = RenderConfig.for_bound(1.0, max_steps=384)
tcfg = TrainConfig(lr=1e-2, total_steps=2500, num_rays=4096)
tr = Trainer(ds, mcfg, rcfg, tcfg, key=jax.random.PRNGKey(0))
t0 = time.time()
tr.train(1600)
print("warm to 1600 in", round(time.time() - t0), "s", flush=True)

probe = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (65536, 3)),
                    jnp.float32)

for k in range(120):
    m = tr.train(5)
    occd = tr.state.occ
    sig, _ = ngp.density(tr.state.params, probe, mcfg)
    gmax = float(jnp.abs(tr.state.params["grid"]).max())
    wmax = max(float(jnp.abs(l).max()) for l in
               jax.tree_util.tree_leaves(tr.state.params["sigma_net"]))
    print(f"s{int(tr.state.step)} loss={m['loss']:.5f} "
          f"samp={m['mean_samples']:.1f} "
          f"sig_max={float(sig.max()):.2e} "
          f"mean_dens={float(occd.mean_density):.2e} "
          f"dens_max={float(occd.density.max()):.2e} "
          f"grid_absmax={gmax:.2f} w_absmax={wmax:.2f}", flush=True)
    if m["loss"] > 0.2:
        print("--- collapse detected ---", flush=True)
        if k > 3:
            break
