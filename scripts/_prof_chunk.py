"""Bisect the proxy chunk cost: proxy+selection vs field eval; chunk-size
scaling.  Uses the saved carved state."""
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
from nerf_texture_tpu.data.rays import get_rays
from nerf_texture_tpu.data.synthetic import SyntheticSphereDataset
from nerf_texture_tpu.models import ngp
from nerf_texture_tpu.models.ngp import NGPConfig
from nerf_texture_tpu.render import renderer as R
from nerf_texture_tpu.render.renderer import (RenderConfig,
                                              render_rays_proxy)

st = np.load("/tmp/ngp_carved.npz")
with open("/tmp/ngp_carved_params.pkl", "rb") as f:
    params = pickle.load(f)
params = jax.tree.map(jnp.asarray, params)
density = jnp.asarray(st["density"])
mcfg = NGPConfig(bound=1.0, num_levels=8, level_dim=4, log2_bricks=16,
                 desired_resolution=2048)
rcfg = RenderConfig(bound=1.0, cascades=1, grid_size=128, max_steps=384,
                    ray_chunk=40000, pool_mean_samples=64,
                    pool_mean_samples_infer=24)
dens8 = R.density_corner_table(density[0], rcfg.grid_size)

H = W = 800
ds = SyntheticSphereDataset(n_frames=2, H=H, W=W)
pose = orbit_pose(np.pi / 2 + 0.2, 0.4, ds.radius)
rays = get_rays(jnp.asarray(pose), jnp.asarray(ds.intrinsics), H, W)
# central rays (likely live)
sel = np.arange(H * W).reshape(H, W)[100:700, 100:700].reshape(-1)
aabb = jnp.asarray([-0.7] * 3 + [0.7] * 3)
from nerf_texture_tpu.ops.marching import near_far_from_aabb


def timeit(fn, n=5):
    out = fn()
    jax.tree.map(lambda a: float(jnp.sum(a)) if hasattr(a, "dtype")
                 else a, out)
    t0 = time.time()
    for _ in range(n):
        out = fn()
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf))
    return (time.time() - t0) / n


field = jax.tree_util.Partial(
    lambda x, d: ngp.forward(params, x, d, mcfg))
trivial = jax.tree_util.Partial(
    lambda x, d: (jnp.full(x.shape[:-1], 5.0),
                  jnp.ones(x.shape[:-1] + (3,))))

for N in (40000, 80000, 160000):
    idx = jnp.asarray(np.random.default_rng(0).choice(sel, N, False))
    o = jnp.take(rays["rays_o"], idx, axis=0)
    d = jnp.take(rays["rays_d"], idx, axis=0)
    nears, fars = near_far_from_aabb(o, d, aabb, rcfg.min_near)

    f_full = jax.jit(lambda o, d, nr, fr: render_rays_proxy(
        field, dens8, o, d, nr, fr, rcfg)["image"])
    f_triv = jax.jit(lambda o, d, nr, fr: render_rays_proxy(
        trivial, dens8, o, d, nr, fr, rcfg)["image"])
    t_full = timeit(lambda: f_full(o, d, nears, fars))
    t_triv = timeit(lambda: f_triv(o, d, nears, fars))

    # field eval alone on N*cap points
    M = N * rcfg.infer_color_cap
    pts = jnp.asarray(
        np.random.default_rng(1).uniform(-0.6, 0.6, (M, 3)), jnp.float32)
    dirs = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (M, 3))
    f_field = jax.jit(lambda p, dd: ngp.forward(params, p, dd, mcfg)[0])
    t_field = timeit(lambda: f_field(pts, dirs))
    print(f"N={N}: full={t_full*1e3:.1f}ms proxy-only={t_triv*1e3:.1f}ms "
          f"field({M})={t_field*1e3:.1f}ms", flush=True)
