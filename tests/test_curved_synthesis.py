"""Curved-surface synthesis components + a tiny end-to-end run."""

import numpy as np

from nerf_texture_tpu.geometry.mesh import make_icosphere
from nerf_texture_tpu.geometry.projector import MeshProjector
from nerf_texture_tpu.geometry.shape_tools import (align_bbox,
                                                   chamfer_distance, icp,
                                                   laplacian_smooth,
                                                   normalize_mesh,
                                                   pca_plane, subdivide,
                                                   subdivide_to)
from nerf_texture_tpu.synthesis.curved import (CurvedSynthesisConfig,
                                               MatchingLib,
                                               SparseProxyDist,
                                               augment_patches,
                                               define_vector_field,
                                               extract_patch_on_surface,
                                               synthesis_on_uvmap, uv2vert)

import pytest

pytestmark = pytest.mark.slow


def test_shape_tools():
    sph = make_icosphere(1, radius=1.0)
    sm = laplacian_smooth(sph, iterations=3)
    # smoothing a sphere shrinks it slightly but keeps topology
    assert sm.faces.shape == sph.faces.shape
    assert np.linalg.norm(sm.vertices, axis=-1).mean() < 1.0
    sub = subdivide(sph)
    assert len(sub.faces) == 4 * len(sph.faces)
    big = subdivide_to(sph, 500)
    assert len(big.vertices) >= 500
    norm = normalize_mesh(make_icosphere(0, radius=5.0))
    assert np.abs(norm.vertices).max() <= 1.0

    n, c, T = pca_plane(np.random.default_rng(0).normal(
        size=(100, 3)) * [3, 2, 0.01])
    assert abs(n[2]) > 0.99

    # icp recovers a small rigid offset
    rng = np.random.default_rng(1)
    pts = rng.normal(size=(200, 3))
    shifted = pts + np.array([0.05, -0.03, 0.02])
    T, out = icp(shifted, pts, iterations=20, threshold=1.0)
    assert chamfer_distance(out, pts) < chamfer_distance(shifted, pts)

    a = make_icosphere(0, radius=3.0)
    b = make_icosphere(0, radius=1.0)
    al = align_bbox(a, b)
    assert abs(np.abs(al.vertices).max() - np.abs(b.vertices).max()) < 1e-6


def test_augment_and_matchlib():
    rng = np.random.default_rng(0)
    patches = rng.normal(size=(4, 20, 20, 3))
    aug = augment_patches(patches, crop_factor=2)
    assert aug.shape[0] == 4 * 4 * 4  # x4 mirrors, x4 crops
    lib = MatchingLib(aug.astype(np.float32), pyramid_height=2)
    target = aug[7]
    mask = np.ones((*target.shape[:2], 1), np.float32)
    pid = lib.match(target.astype(np.float32), mask)
    # exact copy must match itself (or an identical mirror)
    err = ((aug[pid] - target) ** 2).sum()
    assert err < 1e-6


def test_sparse_proxy_range_vote():
    rng = np.random.default_rng(2)
    dense = rng.uniform(size=(500, 3))
    proxy = SparseProxyDist(dense, preferred_patch_gap=0.3)
    proxy.set_range_vote(0.3)
    done = np.zeros(500, bool)
    done[:10] = True
    nxt = proxy.range_vote([0], done)
    assert 0 <= nxt < 500 and not done[nxt]
    picked = proxy.pick_vertices_to_set(dense[:5], grid_gap=0.05)
    assert (np.linalg.norm(dense[picked][:, None] - dense[:5][None],
                           axis=-1).min(-1) < 0.05).all()


def test_uv2vert_and_extraction():
    sph = make_icosphere(2, radius=0.6)
    mp = MeshProjector(sph)
    verts, ids, res = uv2vert(mp, resolution=64)
    assert len(verts) > 100
    np.testing.assert_allclose(np.linalg.norm(verts, axis=-1), 0.6,
                               atol=0.1)
    vectors = define_vector_field(mp.mesh)
    assert vectors.shape == (len(mp.mesh.vertices), 3)
    pv, uvs, mask, faces = extract_patch_on_surface(
        mp, verts[0], patch_size=12, vectors=vectors, grid_gap=0.01)
    assert pv.shape == (12, 12, 3)
    assert mask.dtype == bool
    assert faces.shape == (2 * 11 * 11, 3)


def test_curved_synthesis_end_to_end():
    sph = make_icosphere(2, radius=0.6)
    mp = MeshProjector(sph)
    verts, ids, res = uv2vert(mp, resolution=48)
    vectors = define_vector_field(mp.mesh)
    rng = np.random.default_rng(3)
    patches = rng.normal(size=(6, 12, 12, 4)).astype(np.float32)
    cfg = CurvedSynthesisConfig(grid_gap=0.05, resolution=48,
                                use_matchlib=False, max_iters=400)
    out = synthesis_on_uvmap(mp, verts, ids, res, patches, vectors,
                             original_grid_gap=0.01, cfg=cfg)
    assert out["features"].shape == (1, 4, 48, 48)
    assert np.isfinite(out["features"]).all()
    assert abs(out["sdf_factor"] - 5.0) < 1e-6
    # a reasonable share of texels got textures
    assert (np.abs(out["features"]).sum(1) > 0).mean() > 0.02
