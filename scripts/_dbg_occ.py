"""Diagnose the 80% occ frac at step 700: haze vs stale EMA.

Loads the state saved by _prof_bench_frame.py, reports the EMA density
histogram, then a FRESH full resample (no EMA) to see what the field
itself says.
"""
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from nerf_texture_tpu.models import ngp
from nerf_texture_tpu.models.ngp import NGPConfig
from nerf_texture_tpu.ops import occupancy as occ_mod

STATE = "/root/repo/.bench/ngp_bench_state.pkl"
mcfg = NGPConfig(bound=1.0, num_levels=8, level_dim=4, log2_bricks=16,
                 desired_resolution=2048)
BOUND = 1.0     # must match mcfg.bound / the producer's RenderConfig
if not os.path.exists(STATE):
    sys.exit(f"{STATE} missing -- run scripts/_prof_bench_frame.py first "
             "(it trains and saves the bench state)")
with open(STATE, "rb") as fh:
    st = pickle.load(fh)
params = jax.tree.map(jnp.asarray, st["params"])
dens = np.asarray(st["density"])  # [cas, H^3]
occ = np.asarray(st["occ"])
H = 128
print("EMA density: trained frac", float((dens >= 0).mean()),
      "occ frac", float(occ.mean()))
d = dens[dens >= 0]
print("mean", d.mean(), "p50", np.percentile(d, 50), "p90",
      np.percentile(d, 90), "frac>0.01", (d > 0.01).mean())

def density_fn(pts):
    sigma, _ = ngp.density(params, pts, mcfg)
    return sigma

# cell centers exactly as occupancy.update samples them (cascade 0):
# occupancy.py:94-99 -- cas_bound = min(2**cas, bound), half-cell inset
cas_bound = min(2.0 ** 0, BOUND)
half = cas_bound / H
coords = occ_mod.grid_coords(H).astype(jnp.float32)
xyz = 2.0 * (coords + 0.5) / H - 1.0
xyz = xyz * (cas_bound - half) / (1.0 - 1.0 / H)

@jax.jit
def chunk_sig(pts):
    return density_fn(pts)

sig = []
x = np.asarray(xyz)
for s in range(0, H ** 3, 262144):
    sig.append(np.asarray(chunk_sig(jnp.asarray(x[s:s + 262144]))))
sig = np.concatenate(sig)
print("FRESH resample: frac>0.01", float((sig > 0.01).mean()),
      "frac>mean", float((sig > sig.mean()).mean()),
      "mean", float(sig.mean()), "p50", float(np.percentile(sig, 50)),
      "p90", float(np.percentile(sig, 90)),
      "p99", float(np.percentile(sig, 99)))
# what occ would be with fresh values only, at the production threshold
mean_density = np.clip(sig, 0, None).mean()
thresh = min(mean_density, 0.01)
print("fresh occ frac at thresh", thresh, ":", float((sig > thresh).mean()))
