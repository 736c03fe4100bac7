"""Geometry engine tests against brute-force oracles on analytic meshes."""

import numpy as np
import jax.numpy as jnp

from nerf_texture_tpu.geometry.mesh import (Mesh, calculate_tbn, load_obj,
                                            make_box, make_icosphere,
                                            make_plane, save_obj, uv_atlas)
from nerf_texture_tpu.geometry.spatial import (build_grid,
                                               build_triangle_grid, knn,
                                               nearest_face, raycast)
from nerf_texture_tpu.geometry.triangle import (moller_trumbore,
                                                point_triangle_closest)


def test_mesh_basics():
    sph = make_icosphere(2, radius=0.5)
    # vertex normals of a sphere point radially
    vn = sph.vertex_normals
    vdir = sph.vertices / np.linalg.norm(sph.vertices, axis=-1,
                                         keepdims=True)
    assert np.mean(np.sum(vn * vdir, -1)) > 0.99
    # areas sum to ~ sphere surface
    assert abs(sph.face_areas.sum() - 4 * np.pi * 0.25) < 0.2
    assert sph.mean_edge_length > 0


def test_obj_roundtrip(tmp_path):
    m = make_box()
    path = str(tmp_path / "box.obj")
    save_obj(path, m)
    m2 = load_obj(path)
    np.testing.assert_allclose(m2.vertices, m.vertices)
    np.testing.assert_array_equal(m2.faces, m.faces)


def test_moller_trumbore():
    v0 = jnp.asarray([[-1.0, -1.0, 0.0]])
    v1 = jnp.asarray([[1.0, -1.0, 0.0]])
    v2 = jnp.asarray([[0.0, 1.0, 0.0]])
    o = jnp.asarray([[0.0, 0.0, -2.0], [0.0, 0.0, -2.0],
                     [5.0, 5.0, -2.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, -1.0], [0.0, 0.0, 1.0]])
    t, hit = moller_trumbore(o, d, v0, v1, v2)
    assert bool(hit[0]) and abs(float(t[0]) - 2.0) < 1e-6
    assert not bool(hit[1])  # behind
    assert not bool(hit[2])  # outside


def test_point_triangle_closest():
    rng = np.random.default_rng(0)
    v0 = jnp.asarray([0.0, 0.0, 0.0])
    v1 = jnp.asarray([1.0, 0.0, 0.0])
    v2 = jnp.asarray([0.0, 1.0, 0.0])
    pts = jnp.asarray(rng.uniform(-1, 2, (256, 3)))
    d2, closest, bary = point_triangle_closest(pts, v0, v1, v2)
    # brute force over dense barycentric samples
    u = np.linspace(0, 1, 201)
    uu, vv = np.meshgrid(u, u, indexing="ij")
    keep = uu + vv <= 1.0
    grid_pts = np.stack([uu[keep], vv[keep], np.zeros(keep.sum())], -1)
    for i in range(0, 256, 16):
        p = np.asarray(pts[i])
        brute = np.min(np.sum((grid_pts - p) ** 2, -1))
        assert float(d2[i]) <= brute + 1e-4
        # barycentric reconstructs the closest point
        b = np.asarray(bary[i])
        rec = b[0] * np.zeros(3) + b[1] * np.array([1.0, 0, 0]) \
            + b[2] * np.array([0.0, 1, 0])
        np.testing.assert_allclose(rec, np.asarray(closest[i]), atol=1e-5)


def test_knn_matches_bruteforce_near_surface():
    """Exact k-NN for queries within ~a cell of the surface (the use
    case: projecting marched samples inside h_threshold); far queries get
    the per-cell fallback approximation."""
    sph = make_icosphere(2)
    verts = jnp.asarray(sph.vertices, jnp.float32)
    grid = build_grid(sph.vertices, res=8, max_per_cell=32)
    rng = np.random.default_rng(1)
    dirs = rng.normal(size=(64, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    q = (dirs * rng.uniform(0.92, 1.08, (64, 1))).astype(np.float32)
    dists, idx = knn(grid, verts, jnp.asarray(q), k=4)
    for i in range(64):
        brute = np.linalg.norm(sph.vertices - q[i], axis=-1)
        order = np.sort(brute)[:4]
        np.testing.assert_allclose(np.sort(np.asarray(dists[i])), order,
                                   atol=1e-4)
    # far query: nearest neighbor still sane via fallback candidates
    far = jnp.asarray([[3.0, 3.0, 3.0]], jnp.float32)
    dist_far, _ = knn(grid, verts, far, k=1)
    brute = np.linalg.norm(sph.vertices - np.asarray(far)[0], axis=-1)
    assert abs(float(dist_far[0, 0]) - brute.min()) < 0.3


def test_raycast_sphere():
    sph = make_icosphere(3, radius=0.8)
    verts = jnp.asarray(sph.vertices, jnp.float32)
    faces = jnp.asarray(sph.faces, jnp.int32)
    tgrid = build_triangle_grid(sph.vertices, sph.faces, res=12,
                                max_per_cell=64)
    n = 64
    rng = np.random.default_rng(2)
    o = np.tile([[0.0, 0.0, -3.0]], (n, 1)).astype(np.float32)
    d = rng.normal(size=(n, 3)) * [0.25, 0.25, 0.0] + [0, 0, 1]
    d = (d / np.linalg.norm(d, axis=-1, keepdims=True)).astype(np.float32)
    pos, normals, depth, fid = raycast(tgrid, verts, faces,
                                       jnp.asarray(o), jnp.asarray(d))
    depth = np.asarray(depth)
    for i in range(n):
        # analytic sphere intersection
        b = np.dot(o[i], d[i])
        c = np.dot(o[i], o[i]) - 0.8 ** 2
        disc = b * b - c
        if disc > 0.003:  # clear hit (not grazing)
            t_true = -b - np.sqrt(disc)
            assert abs(depth[i] - t_true) < 0.03, (i, depth[i], t_true)
            assert fid[i] >= 0
            nrm = np.asarray(normals[i])
            p = np.asarray(pos[i])
            assert np.dot(nrm, p / np.linalg.norm(p)) > 0.9
        elif disc < -0.003:
            assert depth[i] > 9.5
            assert fid[i] == -1


def test_nearest_face_signed_distance():
    sph = make_icosphere(3, radius=0.7)
    verts = jnp.asarray(sph.vertices, jnp.float32)
    faces = jnp.asarray(sph.faces, jnp.int32)
    tgrid = build_triangle_grid(sph.vertices, sph.faces, res=10,
                                max_per_cell=64)
    rng = np.random.default_rng(3)
    q = rng.uniform(-1, 1, (128, 3)).astype(np.float32)
    udf, fid, bary, closest = nearest_face(tgrid, verts, faces,
                                           jnp.asarray(q))
    udf = np.asarray(udf)
    for i in range(0, 128, 8):
        r = np.linalg.norm(q[i])
        # true unsigned distance to the icosphere surface ~ |r - 0.7|
        assert abs(udf[i] - abs(r - 0.7)) < 0.02
        b = np.asarray(bary[i])
        assert abs(b.sum() - 1.0) < 1e-4
        tri = sph.vertices[sph.faces[int(fid[i])]]
        rec = (b[:, None] * tri).sum(0)
        np.testing.assert_allclose(rec, np.asarray(closest[i]), atol=1e-5)


def test_uv_atlas_valid():
    sph = make_icosphere(2)
    atlased = uv_atlas(sph)
    assert atlased.uvs is not None
    assert atlased.uvs.min() >= -1e-6 and atlased.uvs.max() <= 1 + 1e-6
    # same surface area
    assert abs(atlased.face_areas.sum() - sph.face_areas.sum()) < 1e-6
    # charts should not overlap: rasterize uv triangles at low res and
    # check total coverage equals sum of uv triangle areas (approximately)
    uv = atlased.uvs[atlased.faces]           # [F, 3, 2]
    e1 = uv[:, 1] - uv[:, 0]
    e2 = uv[:, 2] - uv[:, 0]
    uv_area = 0.5 * np.abs(e1[:, 0] * e2[:, 1] - e1[:, 1] * e2[:, 0])
    assert uv_area.sum() < 1.0  # fits the unit square


def test_tbn_orthonormal():
    plane = make_plane(6)
    tbn = calculate_tbn(plane, plane.uvs)
    # N is z for the plane, T/B in-plane, right-handed orthonormal
    np.testing.assert_allclose(np.abs(tbn[:, 2, 2]), 1.0, atol=1e-6)
    dots = np.abs(np.sum(tbn[:, 0] * tbn[:, 1], -1))
    assert dots.max() < 1e-5
    norms = np.linalg.norm(tbn, axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)
