"""Patch sampling + quilting synthesis pipeline."""

import numpy as np
import jax

from nerf_texture_tpu.geometry.mesh import make_icosphere
from nerf_texture_tpu.geometry.projector import MeshProjector
from nerf_texture_tpu.models import mesh_field
from nerf_texture_tpu.models.mesh_field import MeshFieldConfig
from nerf_texture_tpu.synthesis.patches import (PatchSampleConfig,
                                                pca_first_component,
                                                poisson_disk_sample,
                                                sample_patches)
from nerf_texture_tpu.synthesis.quilting import (QuiltingConfig,
                                                 QuiltingSynthesizer,
                                                 block_reduce_mean,
                                                 min_error_boundary_cut)
import pytest


def test_block_reduce():
    x = np.arange(16, dtype=float).reshape(4, 4)[..., None]
    r = block_reduce_mean(x, (2, 2, 1))
    np.testing.assert_allclose(r[..., 0], [[2.5, 4.5], [10.5, 12.5]])


def test_min_error_boundary_cut_prefers_cheap_seam():
    H, W, C = 16, 8, 3
    rng = np.random.default_rng(0)
    b1 = rng.normal(size=(H, W, C))
    b2 = b1.copy()
    # the two strips agree exactly on column 4 -> seam should go there
    b2[:, :4] += 5.0
    b1[:, 5:] += 5.0
    b2[:, 4] = b1[:, 4]
    out, mask = min_error_boundary_cut(b1, b2, C)
    # left of the seam is b1, right is b2
    assert mask[:, :4].all() or (~mask[:, 5:]).all()
    assert np.isfinite(out).all()


def make_patch_library(n=24, texel=16, c=4, seed=0):
    """Smooth random-phase sinusoid patches (quiltable latents)."""
    rng = np.random.default_rng(seed)
    xs = np.linspace(0, 2 * np.pi, texel)
    xx, yy = np.meshgrid(xs, xs, indexing="ij")
    patches = np.zeros((n, texel, texel, c))
    for i in range(n):
        for ch in range(c):
            patches[i, ..., ch] = np.sin(xx + rng.uniform(0, 2 * np.pi)) \
                * np.cos(yy + rng.uniform(0, 2 * np.pi))
    return patches


def test_quilting_end_to_end():
    patches = make_patch_library()
    cfg = QuiltingConfig(output_size=(64, 64), seed=1)
    syn = QuiltingSynthesizer(
        patches, cfg, match_dim=4,
        sample_tbn=np.repeat(np.eye(3).reshape(1, 9), 24, 0),
        picked_vertices=np.random.default_rng(2).uniform(size=(24, 3)),
        patch_length=0.01)
    canvas, canvas_id = syn.synthesize()
    assert np.isfinite(canvas).all()
    assert (canvas_id >= 0).all()
    assert (np.abs(canvas) > 0).mean() > 0.5   # canvas mostly filled
    out = syn.export(grid_gap=0.001, phi_embed_dim=0, has_local_tbn=False)
    assert out["features"].shape == canvas[..., :4].shape
    assert out["sample_tbn_ids"].max() < len(out["sample_tbn"])


def test_quilting_mirror_augmentation():
    patches = make_patch_library(n=8)
    cfg = QuiltingConfig(output_size=(48, 48), mirror_hor=True,
                         mirror_vert=True, seed=3)
    syn = QuiltingSynthesizer(patches, cfg, match_dim=4)
    assert len(syn.patches) == 32          # x2 hor, x2 vert
    # mirrored tbn has flipped first axis
    t0 = syn.sample_tbn[0].reshape(3, 3)
    t8 = syn.sample_tbn[8].reshape(3, 3)
    np.testing.assert_allclose(t8[:, 0], -t0[:, 0])
    canvas, _ = syn.synthesize()
    assert np.isfinite(canvas).all()


def test_poisson_disk_and_pca():
    sph = make_icosphere(2, radius=0.7)
    pts = poisson_disk_sample(sph, 50)
    assert pts.shape == (50, 3)
    np.testing.assert_allclose(np.linalg.norm(pts, axis=-1), 0.7,
                               atol=0.05)
    # farthest-point thinning spreads points out
    from scipy.spatial import cKDTree
    d, _ = cKDTree(pts).query(pts, k=2)
    assert d[:, 1].min() > 0.05
    fc = pca_first_component(np.random.default_rng(0).normal(
        size=(100, 3)) * [5, 1, 1])
    assert abs(fc[0]) > 0.9


@pytest.mark.slow
def test_sample_patches_on_sphere():
    cfg = MeshFieldConfig(num_levels=3, level_dim=2, base_resolution=16,
                          desired_resolution=32, log2_bricks=9,
                          h_threshold=0.15)
    mesh = make_icosphere(2, radius=0.6)
    mp = MeshProjector(mesh)
    state = mesh_field.make_state(mp)
    params = mesh_field.init(jax.random.PRNGKey(0), cfg)
    scfg = PatchSampleConfig(patch_size=8, max_patch_num=6,
                             center_batch=4, pattern_rate=1 / 4)
    out = sample_patches(params["field"] if "field" in params else params,
                         state, cfg, mesh, scfg)
    n = out["patches"].shape[0]
    assert n > 0
    assert out["patches"].shape[1:] == (8, 8, cfg.encoder_f_out_dim)
    assert out["patch_phi_embed"].shape[-1] == \
        cfg.normal_cfg.phi_embed_dim
    assert out["patch_local_tbn"].shape[1:] == (8, 8, 9)
    assert np.isfinite(out["patches"]).all()
    # texels lie on the sphere surface
    r = np.linalg.norm(out["patch_coors"].reshape(-1, 3), axis=-1)
    np.testing.assert_allclose(r, 0.6, atol=0.05)


def test_poisson_disk_face_subset():
    """Region-picked sampling (reference picked_faces,
    tools/map.py:1000-1011): centers must come only from the subset."""
    sph = make_icosphere(2, radius=0.7)
    cent = sph.vertices[sph.faces].mean(1)
    subset = np.where(cent[:, 1] > 0.2)[0]           # a polar cap
    pts = poisson_disk_sample(sph, 40, face_subset=subset)
    assert pts.shape == (40, 3)
    assert (pts[:, 1] > 0.1).all()                   # all on the cap


def test_viewer_pick_region():
    """ViewerApp.pick_region selects front-facing faces inside the
    screen rect and stores trainer.picked_faces for save_field."""
    import types

    from nerf_texture_tpu.geometry.projector import MeshProjector
    from nerf_texture_tpu.viewer.app import ViewerApp

    sph = make_icosphere(2, radius=0.5)
    mp = MeshProjector(sph)
    fake = types.SimpleNamespace(
        field_state=types.SimpleNamespace(projector=mp.arrays),
        dataset=types.SimpleNamespace(radius=2.0),
        template_mesh=sph)
    app = ViewerApp(fake, W=64, H=64)
    n = app.pick_region(16, 16, 48, 48)              # center rect
    assert 0 < n < len(sph.faces) // 2               # a subset, front only
    picked = fake.picked_faces
    # picked faces face the camera (normal towards camera at -z side)
    tri = sph.vertices[sph.faces[picked]]
    fn = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    cam_pos = app.camera.pose[:3, 3]
    assert (np.sum(fn * (tri.mean(1) - cam_pos), -1) < 0).all()
    app.clear_picked_region()
    assert fake.picked_faces is None
