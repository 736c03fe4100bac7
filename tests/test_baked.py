"""Baked surface-texture rendering must match the live curved field.

The baked atlas (render/baked.py) replaces the per-sample hash-pyramid +
phi-grid gathers with one corner-packed texture row; with matching
charts (collapsed anchor table) the only differences are bilinear
interpolation at ~the finest hash resolution and the bf16 atlas."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow

from nerf_texture_tpu.data.synthetic import SyntheticSphereDataset
from nerf_texture_tpu.geometry.mesh import make_icosphere
from nerf_texture_tpu.geometry.projector import (MeshProjector,
                                                 anchor_frames_from_table)
from nerf_texture_tpu.models import mesh_field
from nerf_texture_tpu.models.curved_field import CurvedFieldConfig
from nerf_texture_tpu.models.mesh_field import MeshFieldConfig
from nerf_texture_tpu.render.renderer import RenderConfig
from nerf_texture_tpu.train.curved_trainer import (
    CurvedTrainConfig, CurvedTrainer, curved_field_apply,
    curved_field_apply_baked)

FCFG = MeshFieldConfig(num_levels=3, level_dim=2, base_resolution=16,
                       desired_resolution=32, log2_bricks=9,
                       h_threshold=0.12, clustering=False)
CCFG = CurvedFieldConfig(field=FCFG, light_model="SH", hidden_dim=16,
                         geo_feat_dim=7)
RCFG = RenderConfig(bound=1.0, cascades=1, grid_size=16, max_steps=48,
                    max_samples_train=24, max_samples_infer=32,
                    ray_chunk=1024, pool_mean_samples=16,
                    pool_mean_samples_infer=16, proxy_samples=0,
                    proxy_refined=12, infer_color_cap=4)
TCFG = CurvedTrainConfig(lr=5e-3, total_steps=200, num_rays=64,
                         grid_update_interval=8, grid_full_updates=4)


def make_trainer():
    ds = SyntheticSphereDataset(n_frames=4, H=32, W=32)
    mp = MeshProjector(make_icosphere(2, radius=0.5))
    tr = CurvedTrainer(ds, mesh_field.make_state(mp), CCFG, RCFG, TCFG,
                       key=jax.random.PRNGKey(0))
    return tr, ds


def test_baked_field_matches_live_field():
    tr, ds = make_trainer()
    tr.train(24)
    bake, ext = tr.bake_atlas()
    assert bake.atlas.dtype == jnp.bfloat16
    assert ext.shape == (RCFG.grid_size ** 3, 24)

    # sample points on/near the template surface
    rng = np.random.default_rng(3)
    dirs = rng.normal(size=(512, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    x = jnp.asarray((dirs * (0.5 + rng.uniform(-0.05, 0.05, (512, 1))))
                    .astype(np.float32))
    d = jnp.asarray(np.tile([[0.0, 0.0, 1.0]], (512, 1)).astype(np.float32))
    frames = anchor_frames_from_table(
        tr._anchor_table(), x, jnp.ones((512,), bool), CCFG.bound)

    static = (tr.ccfg, "none", "RGB", "Full")
    bundle = {"params": tr.state.params, "field_state": tr.field_state,
              "rt": tr.runtime, "bake": bake}
    s_live, c_live = curved_field_apply(bundle, x, d, static,
                                        frames=frames)
    s_bake, c_bake = curved_field_apply_baked(bundle, x, d, static,
                                              frames=frames)
    s_live, c_live = np.asarray(s_live), np.asarray(c_live)
    s_bake, c_bake = np.asarray(s_bake), np.asarray(c_bake)
    # baked tiles only exist where the occupancy grid is on: compare on
    # the samples both paths consider live
    m = (s_live > 0) & (s_bake > 0)
    assert m.mean() > 0.3, f"too few comparable samples: {m.mean()}"
    rel = np.abs(s_bake[m] - s_live[m]) / (np.abs(s_live[m]) + 1e-2)
    assert np.median(rel) < 0.15, f"sigma diverged: median rel {np.median(rel)}"
    cerr = np.abs(c_bake[m] - c_live[m]).max()
    assert cerr < 0.15, f"color diverged: {cerr}"


def test_baked_render_frame():
    tr, ds = make_trainer()
    tr.train(24)
    out_live = tr.render_frame(ds.poses[0], use_ema=False)
    out_bake = tr.render_frame(ds.poses[0], use_ema=False, baked=True)
    a = np.asarray(out_live["image"])
    b = np.asarray(out_bake["image"])
    assert b.shape == a.shape and np.isfinite(b).all()
    # frames should broadly agree (bilinear + tile-coverage differences)
    assert np.abs(a - b).mean() < 0.05, np.abs(a - b).mean()

    # cache: same params identity -> same atlas object
    assert tr.bake_atlas()[0] is tr.bake_atlas()[0]
    # param change (a train step) -> fresh bake
    old = tr.bake_atlas()[0]
    tr.train(1)
    assert tr.bake_atlas()[0] is not old


def test_deferred_baked_render_close_to_per_sample():
    """Deferred (per-ray) shading through the baked atlas: the shading
    nonlinearity over weight-averaged features must stay close to the
    per-sample render on an opaque surface (weights concentrate on 1-2
    survivors, so the averaged feature ~= the surface feature)."""
    import dataclasses

    tr, ds = make_trainer()
    tr.train(24)
    out_bake = tr.render_frame(ds.poses[0], use_ema=False, baked=True)
    tr.rcfg = dataclasses.replace(tr.rcfg, deferred=True)
    out_def = tr.render_frame(ds.poses[0], use_ema=False, baked=True)
    a = np.asarray(out_bake["image"])
    b = np.asarray(out_def["image"])
    assert b.shape == a.shape and np.isfinite(b).all()
    assert np.abs(a - b).mean() < 0.02, np.abs(a - b).mean()


def test_viewer_baked_toggle():
    """The viewer's baked toggle routes frames through the atlas when
    idle and falls back to the live field while training."""
    from nerf_texture_tpu.viewer.app import ViewerApp

    tr, ds = make_trainer()
    tr.train(24)
    app = ViewerApp(tr, W=32, H=32)
    assert app.toggle_baked() is True
    img = app.frame()
    assert img.shape == (32, 32, 3) and np.isfinite(img).all()
    # while training, frames use the live field (no per-step rebake)
    app.training = True
    app.train_ctrl.steps = 1
    img2 = app.frame()
    assert np.isfinite(img2).all()
    assert app.toggle_baked() is False
