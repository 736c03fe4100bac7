"""Whole-frame while_loop chunk path vs the host-side chunk loop.

`frame_one_program` renders every chunk inside ONE device program
(dynamic lax.while_loop over ceil(live / ray_chunk)); it must be
bit-identical to dispatching the same fused chunk program from a host
loop, including the last-chunk padding behavior.
"""

import dataclasses

import numpy as np
import jax.numpy as jnp

from nerf_texture_tpu.data.poses import orbit_pose
from nerf_texture_tpu.render.renderer import (RenderConfig,
                                              density_corner_table,
                                              render_image)

H_GRID = 32
R0 = 0.5


def _toy_field_apply(params, x, d, static):
    r = jnp.linalg.norm(x, axis=-1)
    sigma = 60.0 * jnp.exp(-((r - R0) / 0.06) ** 2)
    color = (x / jnp.maximum(r[..., None], 1e-6) + 1.0) / 2.0
    return sigma, color


def _baked_density():
    c = (jnp.arange(H_GRID) + 0.5) / H_GRID * 2.0 - 1.0
    xx, yy, zz = jnp.meshgrid(c, c, c, indexing="ij")
    pts = jnp.stack([xx, yy, zz], -1).reshape(-1, 3)
    sig, _ = _toy_field_apply(None, pts, None, None)
    return sig.reshape(1, -1)


def _toy_deferred_s1(params, x, static, frames=None):
    return _toy_field_apply(params, x, None, static)


def _toy_deferred_s2(params, fbar, d, static):
    return fbar


def test_deferred_shading_matches_per_sample_linear_field():
    """With a LINEAR stage 2 (identity on the composited color), deferred
    per-ray shading is algebraically identical to per-sample shading:
    wsum * (sum w c / wsum) == sum w c.  Validates the composite-then-
    shade plumbing exactly; nonlinear-shading deltas are covered by the
    curved baked test."""
    density = _baked_density()
    occ = (density[0] > 0.01).astype(jnp.uint8)
    pose = orbit_pose(np.pi / 2 + 0.3, 0.7, 2.0)
    W = H = 48
    intr = np.array([60.0, 60.0, W / 2, H / 2], np.float32)
    base = RenderConfig(bound=1.0, cascades=1, grid_size=H_GRID,
                        max_steps=128, max_samples_infer=64,
                        ray_chunk=512, pool_mean_samples=32,
                        pool_mean_samples_infer=16,
                        proxy_samples=0, proxy_refined=16,
                        infer_mode="proxy", prepass_block=2,
                        prepass_min_component=0)
    out = render_image(_toy_field_apply, None, {}, occ, pose, intr,
                       H, W, base, density=density)
    cfg = dataclasses.replace(base, deferred=True)
    out_d = render_image(_toy_field_apply, None, {}, occ, pose, intr,
                         H, W, cfg, density=density,
                         deferred_apply=(_toy_deferred_s1,
                                         _toy_deferred_s2))
    assert float(np.asarray(out_d["weights_sum"]).max()) > 0.5
    np.testing.assert_allclose(np.asarray(out_d["image"]),
                               np.asarray(out["image"]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_d["weights_sum"]),
                               np.asarray(out["weights_sum"]),
                               rtol=1e-4, atol=1e-6)


def test_frame_one_program_matches_chunk_loop():
    density = _baked_density()
    occ = (density[0] > 0.01).astype(jnp.uint8)
    pose = orbit_pose(np.pi / 2 + 0.3, 0.7, 2.0)
    W = H = 48
    intr = np.array([60.0, 60.0, W / 2, H / 2], np.float32)
    base = RenderConfig(bound=1.0, cascades=1, grid_size=H_GRID,
                        max_steps=128, max_samples_infer=64,
                        ray_chunk=512, pool_mean_samples=32,
                        pool_mean_samples_infer=16,
                        proxy_samples=0, proxy_refined=16,
                        infer_mode="proxy", prepass_block=2,
                        prepass_min_component=0)
    outs = {}
    for flag in (True, False):
        cfg = dataclasses.replace(base, frame_one_program=flag)
        outs[flag] = render_image(_toy_field_apply, None, {}, occ, pose,
                                  intr, H, W, cfg, density=density)
    a, b = outs[True], outs[False]
    assert float(np.asarray(a["weights_sum"]).max()) > 0.5  # content hit
    for k in ("image", "depth", "weights_sum"):
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]),
                                      err_msg=k)
