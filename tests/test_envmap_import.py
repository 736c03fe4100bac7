"""Envmap import wiring (reference Trainer.load_envmap,
nerf/utils.py:1265-1292; EnvMap2SH + visibility products,
nerf/sh_light_model.py:647-670,730-766).

Fast tests exercise the fit + shading delta at the function level; the
slow test drives trainer.load_envmap -> render_frame end to end and
asserts the imported environment changes the rendered image.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_texture_tpu.models.lights import sh as sh_light


def _write_envmap(tmp_path, H=16, W=32):
    """A strongly directional envmap: bright band near the +y pole."""
    import imageio.v3 as iio

    img = np.zeros((H, W, 3), np.float32)
    img[: H // 4] = 1.0                     # top quarter bright
    path = str(tmp_path / "env.png")
    iio.imwrite(path, (img * 255).astype(np.uint8))
    return path


def test_envmap_to_sh_directional(tmp_path):
    path = _write_envmap(tmp_path)
    env = sh_light.image_to_envmap(path, force_white=True)
    shs = sh_light.envmap_to_sh(env, sh_order=3)
    assert shs.shape == (16, 3)
    assert shs[0, 0] > 0.0                       # positive DC
    # directional: the l=1 band must carry energy (top-lit envmap)
    assert np.abs(shs[1:4]).max() > 0.05 * shs[0, 0]


def test_imported_envmap_changes_specular(tmp_path):
    """sh_light.apply with env_import must differ from the learned env,
    for both diffuse and specular components."""
    cfg = sh_light.SHLightConfig(input_dim=7)
    params = sh_light.init(jax.random.PRNGKey(0), cfg)
    n = 64
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    geo = jax.random.normal(k1, (n, cfg.input_dim))
    nrm = jax.random.normal(k2, (n, 3))
    nrm = nrm / jnp.linalg.norm(nrm, axis=-1, keepdims=True)
    view = jnp.broadcast_to(jnp.asarray([0.0, 0.0, -1.0]), (n, 3))

    full0, spec0, dif0, _ = sh_light.apply(params, geo, nrm, view, cfg)

    path = _write_envmap(tmp_path)
    shs = sh_light.envmap_to_sh(
        sh_light.image_to_envmap(path, force_white=True), sh_order=3)
    full1, spec1, dif1, _ = sh_light.apply(
        params, geo, nrm, view, cfg,
        env_import=jnp.asarray(shs, jnp.float32))
    assert float(jnp.abs(full1 - full0).max()) > 1e-3
    assert float(jnp.abs(spec1 - spec0).max()) > 1e-4
    assert float(jnp.abs(dif1 - dif0).max()) > 1e-4

    # visibility-probe path: env products + probe assignment run
    env_vis, probes = sh_light.build_visibility_probes(shs[:9], res=4)
    assert env_vis.shape == (16, 9, 3) and probes.shape == (16, 3)
    full2, *_ = sh_light.apply(
        params, geo, nrm, view, cfg, normals_secondary=nrm,
        shade_visibility=True,
        env_import=jnp.asarray(shs, jnp.float32),
        env_import_vis=env_vis, probes=probes)
    assert np.isfinite(np.asarray(full2)).all()
    assert float(jnp.abs(full2 - full1).max()) > 1e-5


@pytest.mark.slow
def test_trainer_load_envmap_end_to_end(tmp_path):
    from nerf_texture_tpu.data.synthetic import SyntheticSphereDataset
    from nerf_texture_tpu.geometry.mesh import make_icosphere
    from nerf_texture_tpu.geometry.projector import MeshProjector
    from nerf_texture_tpu.models import mesh_field
    from nerf_texture_tpu.models.curved_field import CurvedFieldConfig
    from nerf_texture_tpu.models.mesh_field import MeshFieldConfig
    from nerf_texture_tpu.render.renderer import RenderConfig
    from nerf_texture_tpu.train.curved_trainer import (CurvedTrainConfig,
                                                       CurvedTrainer)

    fcfg = MeshFieldConfig(num_levels=3, level_dim=2, base_resolution=16,
                           desired_resolution=32, log2_bricks=9,
                           h_threshold=0.12, clustering=False)
    ccfg = CurvedFieldConfig(field=fcfg, light_model="SH", hidden_dim=16,
                             geo_feat_dim=7)
    rcfg = RenderConfig(bound=1.0, cascades=1, grid_size=16, max_steps=48,
                        max_samples_train=24, max_samples_infer=32,
                        ray_chunk=1024, pool_mean_samples=16,
                        pool_mean_samples_infer=16)
    tcfg = CurvedTrainConfig(lr=5e-3, total_steps=100, num_rays=64,
                             grid_update_interval=8, grid_full_updates=2)
    ds = SyntheticSphereDataset(n_frames=2, H=24, W=24)
    mp = MeshProjector(make_icosphere(2, radius=0.5))
    tr = CurvedTrainer(ds, mesh_field.make_state(mp), ccfg, rcfg, tcfg,
                       key=jax.random.PRNGKey(0))
    tr.train(9)

    img0 = np.asarray(tr.render_frame(ds.poses[0],
                                      use_ema=False)["image"])
    # missing file: warn + keep the learned env
    with pytest.warns(UserWarning):
        assert not tr.load_envmap(str(tmp_path / "nope.png"))
    assert tr.light_import is None

    assert tr.load_envmap(_write_envmap(tmp_path), with_visibility=True)
    assert "env_import" in tr.light_import
    img1 = np.asarray(tr.render_frame(ds.poses[0],
                                      use_ema=False)["image"])
    assert np.isfinite(img1).all()
    assert np.abs(img1 - img0).max() > 1e-3   # relit

    tr.clear_envmap()
    img2 = np.asarray(tr.render_frame(ds.poses[0],
                                      use_ema=False)["image"])
    np.testing.assert_allclose(img2, img0, atol=1e-5)
