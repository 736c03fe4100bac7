"""The full texture pipeline: train -> sample patches -> quilt ->
import_field -> render; plus mesh/point-cloud export."""

import numpy as np
import jax

from nerf_texture_tpu.data.synthetic import SyntheticSphereDataset
from nerf_texture_tpu.geometry.mesh import make_icosphere, load_obj
from nerf_texture_tpu.geometry.projector import MeshProjector
from nerf_texture_tpu.models import mesh_field
from nerf_texture_tpu.models.curved_field import CurvedFieldConfig
from nerf_texture_tpu.models.mesh_field import MeshFieldConfig
from nerf_texture_tpu.render.renderer import RenderConfig
from nerf_texture_tpu.synthesis.patches import PatchSampleConfig
from nerf_texture_tpu.synthesis.quilting import (QuiltingConfig,
                                                 QuiltingSynthesizer)
from nerf_texture_tpu.train import field_io
from nerf_texture_tpu.train.curved_trainer import (CurvedTrainConfig,
                                                   CurvedTrainer)

import pytest

pytestmark = pytest.mark.slow

FCFG = MeshFieldConfig(num_levels=3, level_dim=2, base_resolution=16,
                       desired_resolution=32, log2_bricks=9,
                       h_threshold=0.12, clustering=False)
CCFG = CurvedFieldConfig(field=FCFG, light_model="SH", hidden_dim=16,
                         geo_feat_dim=7)
RCFG = RenderConfig(bound=1.0, cascades=1, grid_size=16, max_steps=48,
                    max_samples_train=24, max_samples_infer=32,
                    ray_chunk=1024, pool_mean_samples=16,
                    pool_mean_samples_infer=16)
TCFG = CurvedTrainConfig(lr=5e-3, total_steps=100, num_rays=64,
                         grid_update_interval=8, grid_full_updates=2)


def make_trainer():
    ds = SyntheticSphereDataset(n_frames=3, H=24, W=24)
    mesh = make_icosphere(2, radius=0.5)
    mp = MeshProjector(mesh)
    state = mesh_field.make_state(mp)
    tr = CurvedTrainer(ds, state, CCFG, RCFG, TCFG,
                       key=jax.random.PRNGKey(0))
    return tr, mesh, ds


def test_full_texture_pipeline(tmp_path):
    tr, mesh, ds = make_trainer()
    tr.train(6)

    # 1. sample patches + save field npz
    scfg = PatchSampleConfig(patch_size=8, max_patch_num=6,
                             center_batch=3, pattern_rate=1 / 4)
    field_path = str(tmp_path / "field.npz")
    out = field_io.save_field(tr, field_path, mesh=mesh, scfg=scfg)
    assert out["patches"].shape[0] > 0

    # 2. quilt a texture from the sampled patches
    data = np.load(field_path, allow_pickle=True)
    patches = np.concatenate(
        [data["patches"], data["patch_phi_embed"],
         data["patch_local_tbn"].reshape(
             *data["patch_local_tbn"].shape[:3], 9)], -1)
    syn = QuiltingSynthesizer(
        patches, QuiltingConfig(output_size=(32, 32), seed=0),
        match_dim=data["patches"].shape[-1],
        sample_tbn=data["patch_sample_tbn"],
        picked_vertices=data["picked_vertices"],
        patch_length=float(data["grid_gap"]) * 8)
    syn.synthesize()
    tex = syn.export(grid_gap=float(data["grid_gap"]),
                     phi_embed_dim=data["patch_phi_embed"].shape[-1])
    tex_path = str(tmp_path / "texture.npz")
    np.savez(tex_path, **{k: v for k, v in tex.items() if v is not None})

    # 3. import the synthesized field + render (GUI 'load synthesis')
    field_io.load_field(tr, tex_path)
    assert tr.mode == "field"
    outimg = tr.render_frame(ds.poses[0], use_ema=False)
    assert np.isfinite(np.asarray(outimg["image"])).all()

    # 4. patch import mode renders too
    field_io.load_patch(tr, field_path, patch_id=0)
    assert tr.mode == "patch"
    outimg = tr.render_frame(ds.poses[0], use_ema=False)
    assert np.isfinite(np.asarray(outimg["image"])).all()


def test_mesh_and_pointcloud_export(tmp_path):
    tr, mesh, ds = make_trainer()
    tr.train(4)
    # mesh export from an analytic density (fast, deterministic)
    import jax.numpy as jnp

    def density(p):
        return jnp.where(jnp.linalg.norm(p, axis=-1) < 0.5, 50.0, 0.0)

    path = str(tmp_path / "mesh.obj")
    v, f = field_io.save_mesh(density, path, resolution=32, bound=1.0)
    m = load_obj(path)
    assert len(m.vertices) == len(v)
    np.testing.assert_allclose(
        np.linalg.norm(m.vertices, axis=-1).mean(), 0.5, atol=0.05)

    pcl = field_io.save_point_cloud(tr, str(tmp_path / "pcl.ply"),
                                    n_views=2)
    assert pcl.ndim == 2 and pcl.shape[1] == 3


def test_offline_renderers(tmp_path):
    tr, mesh, ds = make_trainer()
    tr.train(2)
    img = field_io.take_photo(tr, ds.poses[0],
                              path=str(tmp_path / "photo.png"))
    assert img.shape == (24, 24, 3)
    paths = field_io.render_round(tr, str(tmp_path / "round"), n_frames=2)
    assert len(paths) == 2
    import os

    assert all(os.path.exists(p) for p in paths)
