"""Data-prep utilities, Floyd seams, sharded eval rendering."""

import numpy as np
import jax
import jax.numpy as jnp

from nerf_texture_tpu.data.prepare import (_qvec2rotmat,
                                           colmap_to_transforms,
                                           laplacian_variance)
from nerf_texture_tpu.synthesis.seams import floyd_cut
from nerf_texture_tpu.synthesis.quilting import min_error_boundary_cut


def test_laplacian_variance_orders_sharpness():
    rng = np.random.default_rng(0)
    sharp = (rng.uniform(0, 255, (64, 64, 3))).astype(np.uint8)
    import cv2

    blurry = cv2.GaussianBlur(sharp, (11, 11), 5)
    assert laplacian_variance(sharp) > laplacian_variance(blurry)


def test_colmap_to_transforms(tmp_path):
    text = tmp_path / "text"
    text.mkdir()
    (text / "cameras.txt").write_text(
        "# cams\n1 PINHOLE 640 480 500 500 320 240\n")
    q = np.array([1.0, 0, 0, 0])
    lines = ["# imgs\n"]
    for i in range(3):
        lines.append(f"{i+1} 1 0 0 0 0 0 {i * 0.1} 1 img_{i}.png\n")
        lines.append("\n")
    (text / "images.txt").write_text("".join(lines))
    out = colmap_to_transforms(str(text), str(tmp_path / "images"),
                               str(tmp_path / "transforms.json"))
    assert out["fl_x"] == 500 and out["w"] == 640
    assert len(out["frames"]) == 3
    m = np.asarray(out["frames"][0]["transform_matrix"])
    assert m.shape == (4, 4)
    # y/z columns flipped from colmap to nerf convention
    np.testing.assert_allclose(m[:3, 1], [0, -1, 0], atol=1e-9)
    R = _qvec2rotmat([1, 0, 0, 0])
    np.testing.assert_allclose(R, np.eye(3))


def test_floyd_cut_matches_dp_on_clear_seam():
    H, W, C = 20, 9, 3
    rng = np.random.default_rng(1)
    b1 = rng.normal(size=(H, W, C))
    b2 = b1 + 4.0                        # error 48 everywhere...
    col = 5
    b2[:, col] = b1[:, col]              # ...except a unique zero column
    out_f, trace_f = floyd_cut(b1, b2, C)
    out_d, mask_d = min_error_boundary_cut(b1, b2, C)
    np.testing.assert_array_equal(trace_f, col)
    assert np.isfinite(out_f).all()
    # both methods agree: left of the seam is b1
    np.testing.assert_allclose(out_f[:, :col], b1[:, :col])
    np.testing.assert_allclose(out_f[:, col + 1:], b2[:, col + 1:])


def test_render_image_sharded_matches_single():
    from nerf_texture_tpu.data.synthetic import SyntheticSphereDataset
    from nerf_texture_tpu.models import ngp
    from nerf_texture_tpu.models.ngp import NGPConfig
    from nerf_texture_tpu.parallel import make_mesh, shard_params
    from nerf_texture_tpu.parallel.eval import render_image_sharded
    from nerf_texture_tpu.parallel.sharding import replicated
    from nerf_texture_tpu.render.renderer import RenderConfig, render_image
    from nerf_texture_tpu.train.trainer import ngp_field_apply

    ds = SyntheticSphereDataset(n_frames=1, H=24, W=24)
    mcfg = NGPConfig(bound=1.0, num_levels=4, level_dim=2,
                     log2_bricks=10, desired_resolution=64,
                     hidden_dim=32, hidden_dim_color=32)
    # prepass_block=1: the sharded path computes its own per-ray
    # near/far, which matches the per-pixel (but not the block-level)
    # prepass exactly on this fully-occupied grid
    rcfg = RenderConfig(bound=1.0, cascades=1, grid_size=16,
                        max_steps=32, max_samples_infer=16,
                        ray_chunk=288, pool_mean_samples=8,
                        pool_mean_samples_infer=8, prepass_block=1)
    params = ngp.init(jax.random.PRNGKey(0), mcfg)
    occ = jnp.ones((16 ** 3,), jnp.uint8)

    single = render_image(ngp_field_apply, mcfg, params, occ,
                          ds.poses[0], ds.intrinsics, 24, 24, rcfg)

    mesh = make_mesh(data=4, model=1)
    params_s = shard_params(params, mesh)
    occ_s = jax.device_put(occ, replicated(mesh))
    sharded = render_image_sharded(ngp_field_apply, mcfg, params_s, occ_s,
                                   ds.poses[0], ds.intrinsics, 24, 24,
                                   rcfg, mesh)
    np.testing.assert_allclose(np.asarray(sharded["image"]),
                               np.asarray(single["image"]), atol=1e-4)
