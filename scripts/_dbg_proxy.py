"""Debug proxy-vs-pool mismatch on CPU with the real trained state."""
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from nerf_texture_tpu.data.rays import get_rays
from nerf_texture_tpu.data.synthetic import SyntheticSphereDataset
from nerf_texture_tpu.models import ngp
from nerf_texture_tpu.models.ngp import NGPConfig
from nerf_texture_tpu.ops.marching import near_far_from_aabb
from nerf_texture_tpu.render.renderer import (RenderConfig,
                                              density_corner_table,
                                              render_rays,
                                              render_rays_proxy,
                                              _occ_prepass_arrays,
                                              _occ_ray_hits, _proxy_sigma)

st = np.load("/tmp/ngp_state.npz")
with open("/tmp/ngp_params.pkl", "rb") as f:
    params = pickle.load(f)
params = jax.tree.map(jnp.asarray, params)
density = jnp.asarray(st["density"])          # [1, H^3]
occ = jnp.asarray(st["occ"])                  # [H^3]
print("density stats:", float(density.min()), float(density.max()),
      float((density > 0).mean()), "mean_density",
      float(st["mean_density"]))
print("occ frac:", float(occ.mean()))

mcfg = NGPConfig(bound=1.0)
rcfg = RenderConfig.for_bound(1.0, dt_gamma=0.0, max_steps=384)
ds = SyntheticSphereDataset(n_frames=2, H=100, W=100)

pose = jnp.asarray(ds.poses[0])
intr = jnp.asarray(ds.intrinsics) / 4.0       # 100x100 from the 400 cam
rays = get_rays(pose, intr, 100, 100)
o, d = rays["rays_o"], rays["rays_d"]

field = lambda x, dd: ngp.forward(params, x, dd, mcfg)

# prepass spans exactly as render_image computes them
aabb_np, occ_dil = _occ_prepass_arrays(occ, rcfg)
aabb = jnp.asarray(aabb_np)
hit, t0, t1 = _occ_ray_hits(o, d, occ_dil, aabb, rcfg.bound,
                            rcfg.min_near, rcfg.grid_size, block=10000,
                            margin_steps=2.0)
print("prepass hit frac:", float(hit.mean()))
span = np.asarray(t1 - t0)
print("span stats (hit rays):", np.percentile(span[np.asarray(hit)],
                                              [5, 50, 95]))

dens8 = density_corner_table(density[0], rcfg.grid_size)
out_p = render_rays_proxy(field, dens8, o, d, t0, t1, rcfg)
out_e = render_rays(field, occ, o, d, rcfg,
                    max_samples=rcfg.max_samples_infer,
                    nears=jnp.where(hit, t0, 0.0),
                    fars=jnp.where(hit, t1, 0.0),
                    pool_mean=rcfg.pool_mean_samples_infer)
img_p = np.asarray(out_p["image"])
img_e = np.asarray(out_e["image"])
ws_p = np.asarray(out_p["weights_sum"])
ws_e = np.asarray(out_e["weights_sum"])
print("proxy ws:", ws_p.mean(), " pool ws:", ws_e.mean())
print("proxy img mean:", img_p.mean(), " pool img mean:", img_e.mean())
print("max |img diff|:", np.abs(img_p - img_e).max())

# drill into round-1 proxy weights for rays the pool says are solid
solid = (ws_e > 0.5) & np.asarray(hit)
print("solid rays:", solid.sum())
idx = np.nonzero(solid)[0][:8]
K1 = rcfg.proxy_samples
frac = (jnp.arange(K1) + 0.5) / K1
tt = t0[idx, None] + (t1 - t0)[idx, None] * frac
sig_p = _proxy_sigma(dens8, o[idx], d[idx], tt, rcfg.grid_size,
                     rcfg.bound)
print("proxy sigma along solid rays (max per ray):",
      np.asarray(sig_p).max(-1))
print("proxy ws on those rays:", ws_p[idx])
print("pool ws:", ws_e[idx])

# frame-level PSNR proxy vs pool (white bg already composited)
def psnr(a, b):
    mse = np.mean((a - b) ** 2)
    return -10.0 * np.log10(mse)

print("PSNR(proxy vs pool):", psnr(img_p, img_e))

# with a larger color cap
import dataclasses
rc16 = dataclasses.replace(rcfg, infer_color_cap=16)
out16 = render_rays_proxy(field, dens8, o, d, t0, t1, rc16)
img16 = np.asarray(out16["image"])
print("PSNR(proxy cap16 vs pool):", psnr(img16, img_e))
rc32 = dataclasses.replace(rcfg, infer_color_cap=16, proxy_refined=48)
out32 = render_rays_proxy(field, dens8, o, d, rc32 and t0, t1, rc32)
img32 = np.asarray(out32["image"])
print("PSNR(cap16 K48 vs pool):", psnr(img32, img_e))
