"""Per-ray projection fast path vs exact per-sample projection.

The fast path (MeshFieldConfig.per_ray_projection) casts each RAY against
the template once and approximates the surface by the tangent plane at the
hit; exact per-sample projection (tools/map.py:414-433 equivalent) stays
available with the flag off.  On a smooth mesh the two must agree to
curvature order.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from nerf_texture_tpu.geometry import projector as proj
from nerf_texture_tpu.geometry.mesh import make_icosphere
from nerf_texture_tpu.geometry.projector import MeshProjector

import pytest

pytestmark = pytest.mark.slow


def _sphere_rays(n=48, radius=0.6, seed=0):
    rng = np.random.default_rng(seed)
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = -1.8 * d                     # rays through the origin -> hit sphere
    return jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32)


def test_anchor_h_matches_exact_sdf():
    mp = MeshProjector(make_icosphere(3, radius=0.6))
    rays_o, rays_d = _sphere_rays()
    frames = proj.ray_anchor_frames(mp.arrays, rays_o, rays_d)
    assert np.asarray(frames["hit"]).all()

    # samples along each ray within the shell around the hit
    ts = jnp.linalg.norm(frames["p0"] - rays_o, axis=-1, keepdims=True)
    offs = jnp.asarray([-0.04, -0.01, 0.02, 0.05], jnp.float32)
    x = (rays_o[:, None] + (ts + offs)[..., None] * rays_d[:, None])
    xf = x.reshape(-1, 3)

    h_fast = jnp.sum(
        (xf - jnp.repeat(frames["p0"], 4, 0))
        * jnp.repeat(frames["normal"], 4, 0), axis=-1)
    _, sdf, h_mask, n_exact, _ = proj.project(mp.arrays, xf, k=8,
                                              h_threshold=0.1)
    err = np.abs(np.asarray(h_fast) - np.asarray(sdf[:, 0]))
    assert err.mean() < 5e-3 and err.max() < 3e-2   # curvature-order gap
    # anchor normal agrees with the per-sample normal
    cos = np.sum(np.asarray(jnp.repeat(frames["normal"], 4, 0))
                 * np.asarray(n_exact), -1)
    assert cos.mean() > 0.95 and cos.min() > 0.85


def test_render_parity_fast_vs_exact():
    from nerf_texture_tpu.data.synthetic import SyntheticSphereDataset
    from nerf_texture_tpu.models import mesh_field
    from nerf_texture_tpu.models.curved_field import CurvedFieldConfig
    from nerf_texture_tpu.models.mesh_field import MeshFieldConfig
    from nerf_texture_tpu.render.renderer import RenderConfig
    from nerf_texture_tpu.train.curved_trainer import (CurvedTrainConfig,
                                                       CurvedTrainer)

    rcfg = RenderConfig(bound=1.0, cascades=1, grid_size=16, max_steps=48,
                        max_samples_train=24, max_samples_infer=24,
                        ray_chunk=576, pool_mean_samples=12,
                        pool_mean_samples_infer=12)
    tcfg = CurvedTrainConfig(lr=5e-3, total_steps=50, num_rays=64,
                             grid_update_interval=16, grid_full_updates=1)
    ds = SyntheticSphereDataset(n_frames=2, H=24, W=24)
    mp = MeshProjector(make_icosphere(2, radius=0.5))
    state = mesh_field.make_state(mp)

    imgs = {}
    for fast in (True, False):
        fcfg = MeshFieldConfig(num_levels=3, level_dim=2,
                               base_resolution=16, desired_resolution=32,
                               log2_bricks=9, h_threshold=0.12,
                               clustering=False, per_ray_projection=fast)
        ccfg = CurvedFieldConfig(field=fcfg, light_model="SH",
                                 hidden_dim=16, geo_feat_dim=7)
        tr = CurvedTrainer(ds, state, ccfg, rcfg, tcfg,
                           key=jax.random.PRNGKey(0))
        tr.train(2)
        out = tr.render_frame(ds.poses[0], use_ema=False)
        img = np.asarray(out["image"])
        assert np.isfinite(img).all()
        imgs[fast] = img
    # same seed, same init -> the two projections should produce nearly
    # the same render on a smooth template
    diff = np.abs(imgs[True] - imgs[False])
    assert diff.mean() < 0.05


def test_anchor_table_matches_seed_frames():
    """Cached per-cell anchors == direct seed anchors up to the
    cell-center offset (both are tangent-plane approximations; the table
    samples the SAME function at the cell center)."""
    import jax.numpy as jnp

    from nerf_texture_tpu.geometry.mesh import make_icosphere
    from nerf_texture_tpu.geometry.projector import (
        MeshProjector, anchor_frames_from_table, build_anchor_table,
        seed_anchor_frames)

    mp = MeshProjector(make_icosphere(3, radius=0.5))
    H, bound = 32, 1.0
    tab = build_anchor_table(mp.arrays, H, bound, k=8, max_dist=0.4,
                             chunk=8192)
    assert tab.shape == (H, H, H, 16)

    rng = np.random.default_rng(0)
    d = rng.normal(size=(256, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    x = jnp.asarray(d * rng.uniform(0.42, 0.58, (256, 1)), jnp.float32)
    valid = jnp.ones((256,), bool)

    ft = anchor_frames_from_table(tab, x, valid, bound)
    fd = seed_anchor_frames(mp.arrays, x, valid, k=8, max_dist=0.4)

    assert np.asarray(ft["hit"]).mean() > 0.9
    both = np.asarray(ft["hit"] & fd["hit"])
    # cell diagonal at H=32 is ~0.11; anchors from the cell center agree
    # with anchors from the exact point to well under a cell
    dp = np.linalg.norm(np.asarray(ft["p0"] - fd["p0"]), axis=-1)[both]
    assert np.percentile(dp, 90) < 0.06, np.percentile(dp, 90)
    cos = np.sum(np.asarray(ft["normal"] * fd["normal"]), -1)[both]
    assert np.percentile(cos, 10) > 0.95, np.percentile(cos, 10)
