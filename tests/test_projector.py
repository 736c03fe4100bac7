import numpy as np
import jax
import jax.numpy as jnp

from nerf_texture_tpu.geometry.mesh import make_icosphere, make_plane
from nerf_texture_tpu.geometry.projector import (MeshProjector, diff_project,
                                                 knn_normal, project,
                                                 signed_distance, uvh,
                                                 weighted_project)


def sphere_projector(r=0.7):
    return MeshProjector(make_icosphere(3, radius=r))


def test_knn_normal_on_sphere():
    mp = sphere_projector()
    rng = np.random.default_rng(0)
    dirs = rng.normal(size=(32, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    q = jnp.asarray(dirs * 0.8, jnp.float32)  # slightly outside
    n, _, _, _ = knn_normal(mp.arrays, q, k=8)
    cos = np.sum(np.asarray(n) * dirs, axis=-1)
    assert cos.mean() > 0.98


def test_project_sdf_sign_and_surface():
    mp = sphere_projector(r=0.7)
    rng = np.random.default_rng(1)
    dirs = rng.normal(size=(48, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    radii = rng.uniform(0.55, 0.85, (48, 1))
    q = jnp.asarray(dirs * radii, jnp.float32)
    p_sur, sdf, h_mask, normal, tbn = project(mp.arrays, q,
                                              h_threshold=0.2)
    sdf = np.asarray(sdf)[:, 0]
    expected = (radii[:, 0] - 0.7)
    # outside points positive, inside negative, magnitude ~ |r - R|
    np.testing.assert_allclose(sdf, expected, atol=0.02)
    # surface point lies on the sphere
    p = np.asarray(p_sur)
    np.testing.assert_allclose(np.linalg.norm(p, axis=-1), 0.7, atol=0.02)
    assert np.asarray(h_mask).all()
    # tbn rows are unit
    np.testing.assert_allclose(np.linalg.norm(np.asarray(tbn), axis=-1),
                               1.0, atol=1e-4)


def test_weighted_project_sphere():
    mp = sphere_projector(r=0.7)
    rng = np.random.default_rng(2)
    dirs = rng.normal(size=(32, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    radii = rng.uniform(0.6, 0.8, (32, 1))
    q = jnp.asarray(dirs * radii, jnp.float32)
    sdf, p_sur, normal = weighted_project(mp.arrays, q, return_psur=True)
    np.testing.assert_allclose(np.asarray(sdf)[:, 0], radii[:, 0] - 0.7,
                               atol=0.03)


def test_signed_distance_matches_project():
    mp = sphere_projector(r=0.7)
    rng = np.random.default_rng(3)
    dirs = rng.normal(size=(32, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    radii = rng.uniform(0.55, 0.85, (32, 1))
    q = jnp.asarray(dirs * radii, jnp.float32)
    sdf, fid, bary, closest = signed_distance(mp.arrays, q)
    np.testing.assert_allclose(np.asarray(sdf), radii[:, 0] - 0.7,
                               atol=0.02)
    assert (np.asarray(fid) >= 0).all()


def test_uvh_plane():
    plane = make_plane(10, size=1.0)
    mp = MeshProjector(plane)
    q = jnp.asarray([[0.3, -0.2, 0.15], [-0.5, 0.4, -0.08]], jnp.float32)
    out, h_mask, normal, tbn = uvh(mp.arrays, q, h_threshold=0.5)
    out = np.asarray(out)
    # heights match z (sign may follow the estimated normal direction)
    np.testing.assert_allclose(np.abs(out[:, 2]), [0.15, 0.08], atol=0.02)
    # uv in [-1, 1] and monotone with x/y: uv distance between the two
    # queries should reflect their planar distance
    assert np.all(np.abs(out[:, :2]) <= 1.0 + 1e-5)
    assert np.asarray(h_mask).all()


def test_diff_project_vjp():
    xyz = jnp.asarray([[0.1, 0.2, 0.9]])
    p_sur = jnp.asarray([[0.1, 0.2, 0.0]])
    sdf = jnp.asarray([[0.9]])
    normal = jnp.asarray([[0.0, 0.0, 1.0]])

    def f(xyz, p_sur, sdf, normal):
        x2, p2, s2, n2 = diff_project(xyz, p_sur, sdf, normal)
        # loss pulls on p_sur and sdf
        return jnp.sum(p2 * jnp.asarray([1.0, 2.0, 3.0])) + 5.0 * s2[0, 0]

    g = jax.grad(f, argnums=0)(xyz, p_sur, sdf, normal)
    # tangential part of g_psur = (1, 2, 0); along normal: 5 * n = (0,0,5)
    np.testing.assert_allclose(np.asarray(g)[0], [1.0, 2.0, 5.0],
                               atol=1e-4)


def test_anchor_table_far_cells_have_safe_frames():
    """Cells beyond the prefilter distance must carry a SAFE identity
    frame, not zeros: a zero normal reaching normalize() has a NaN
    GRADIENT at exactly 0 (d|v|/dv = v/|v|), and one such sample poisons
    the shared MLP gradients of the whole batch (r5 bench NaN)."""
    import numpy as np

    from nerf_texture_tpu.geometry.mesh import make_icosphere
    from nerf_texture_tpu.geometry.projector import (MeshProjector,
                                                     build_anchor_table)

    mp = MeshProjector(make_icosphere(1, radius=0.2))
    tab = np.asarray(build_anchor_table(mp.arrays, 16, 1.0, k=4,
                                        max_dist=0.15)).reshape(-1, 16)
    far = tab[:, 15] < 0.5
    assert far.any() and (~far).any()
    # every row's normal is unit-ish and its TBN has full rank
    norms = np.linalg.norm(tab[:, 3:6], axis=-1)
    assert norms.min() > 0.5, norms.min()
    dets = np.abs(np.linalg.det(tab[:, 6:15].reshape(-1, 3, 3)))
    assert dets.min() > 1e-3, dets.min()
