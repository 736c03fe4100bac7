"""Proxy (proposal-style) inference path vs the exact pool renderer.

With a converged density grid (here baked analytically from the same
field), proxy survivor selection must reproduce the exact render: final
weights are recomputed from true sigmas, so the only error source is a
missed sample, which a correct proxy does not produce.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from nerf_texture_tpu.ops.marching import near_far_from_aabb
from nerf_texture_tpu.render.renderer import (RenderConfig,
                                              density_corner_table,
                                              render_rays,
                                              render_rays_proxy)

import pytest

pytestmark = pytest.mark.slow

H_GRID = 64
R0 = 0.5


def sphere_field(x, d):
    """Analytic opaque shell: high sigma in a band around |x| = R0."""
    r = jnp.linalg.norm(x, axis=-1)
    sigma = 80.0 * jnp.exp(-((r - R0) / 0.04) ** 2)
    color = (x / jnp.maximum(r[..., None], 1e-6) + 1.0) / 2.0
    return sigma, color


def baked_density():
    """Cell-center density grid for sphere_field (cascade 0)."""
    c = (jnp.arange(H_GRID) + 0.5) / H_GRID * 2.0 - 1.0
    xx, yy, zz = jnp.meshgrid(c, c, c, indexing="ij")
    pts = jnp.stack([xx, yy, zz], -1).reshape(-1, 3)
    sig, _ = sphere_field(pts, None)
    return sig.reshape(1, -1)


def test_proxy_matches_pool_on_converged_grid():
    density = baked_density()
    occ = (density[0] > 0.01).astype(jnp.uint8)
    dens8 = density_corner_table(density[0], H_GRID)

    n = 256
    rng = np.random.default_rng(0)
    o = np.tile([[0.0, 0.0, -2.0]], (n, 1)).astype(np.float32)
    d = rng.normal(size=(n, 3)) * [0.25, 0.25, 0] + [0, 0, 1]
    d = (d / np.linalg.norm(d, axis=-1, keepdims=True)).astype(np.float32)
    o, d = jnp.asarray(o), jnp.asarray(d)

    cfg = RenderConfig(bound=1.0, cascades=1, grid_size=H_GRID,
                       max_steps=256, max_samples_infer=128,
                       pool_mean_samples=64, pool_mean_samples_infer=64,
                       proxy_samples=64, infer_color_cap=16)
    aabb = jnp.asarray([-1.0] * 3 + [1.0] * 3)
    nears, fars = near_far_from_aabb(o, d, aabb, cfg.min_near)

    exact = render_rays(sphere_field, occ, o, d, cfg,
                        max_samples=cfg.max_samples_infer)
    prox = render_rays_proxy(sphere_field, dens8, o, d, nears, fars, cfg)

    img_e = np.asarray(exact["image"])
    img_p = np.asarray(prox["image"])
    # both integrate the same analytic field; the sample grids differ, so
    # compare at integration tolerance
    err = np.abs(img_p - img_e).max(-1)
    assert np.quantile(err, 0.95) < 0.05, np.quantile(err, 0.95)
    np.testing.assert_allclose(np.asarray(prox["weights_sum"]),
                               np.asarray(exact["weights_sum"]),
                               atol=0.05)


def test_proxy_empty_span_is_background():
    density = baked_density()
    dens8 = density_corner_table(density[0], H_GRID)
    cfg = RenderConfig(bound=1.0, cascades=1, grid_size=H_GRID,
                       proxy_samples=16)
    o = jnp.asarray([[0.0, 0.0, -2.0]] * 4)
    d = jnp.asarray([[0.0, 0.0, 1.0]] * 4)
    nears = jnp.zeros((4,))
    fars = jnp.zeros((4,))          # no span -> background
    out = render_rays_proxy(sphere_field, dens8, o, d, nears, fars, cfg,
                            bg_color=0.25)
    np.testing.assert_allclose(np.asarray(out["image"]), 0.25, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out["weights_sum"]), 0.0,
                               atol=1e-7)


def test_proxy_survives_density_floor():
    """Top-k survivor selection with a hazy grid (EMA(max) keeps a low
    density floor in front of the surface mid-training).  A
    first-cap-above-eps rule fills the cap with haze and never shades
    the surface; top-k + skipped-mass attenuation must stay close to the
    exact pool renderer."""

    def hazy_field(x, d):
        sig, col = sphere_field(x, d)
        return sig + 0.3, col            # uniform haze floor

    c = (jnp.arange(H_GRID) + 0.5) / H_GRID * 2.0 - 1.0
    xx, yy, zz = jnp.meshgrid(c, c, c, indexing="ij")
    pts = jnp.stack([xx, yy, zz], -1).reshape(-1, 3)
    density = (hazy_field(pts, None)[0]).reshape(1, -1)
    occ = (density[0] > 0.01).astype(jnp.uint8)
    dens8 = density_corner_table(density[0], H_GRID)

    n = 128
    rng = np.random.default_rng(3)
    o = np.tile([[0.0, 0.0, -2.0]], (n, 1)).astype(np.float32)
    d = rng.normal(size=(n, 3)) * [0.2, 0.2, 0] + [0, 0, 1]
    d = (d / np.linalg.norm(d, axis=-1, keepdims=True)).astype(np.float32)
    o, d = jnp.asarray(o), jnp.asarray(d)

    cfg = RenderConfig(bound=1.0, cascades=1, grid_size=H_GRID,
                       max_steps=256, max_samples_infer=128,
                       pool_mean_samples=64, pool_mean_samples_infer=64,
                       proxy_samples=32, proxy_refined=24,
                       infer_color_cap=8)
    aabb = jnp.asarray([-1.0] * 3 + [1.0] * 3)
    nears, fars = near_far_from_aabb(o, d, aabb, cfg.min_near)

    exact = render_rays(hazy_field, occ, o, d, cfg,
                        max_samples=cfg.max_samples_infer)
    prox = render_rays_proxy(hazy_field, dens8, o, d, nears, fars, cfg)

    img_e = np.asarray(exact["image"])
    img_p = np.asarray(prox["image"])
    ws_e = np.asarray(exact["weights_sum"])
    ws_p = np.asarray(prox["weights_sum"])
    # the surface must be found: rays the exact renderer saturates get
    # most of their weight from the survivor pool too
    solid = ws_e > 0.9
    assert solid.any()
    assert ws_p[solid].min() > 0.6, ws_p[solid].min()
    # Heavy TRUE haze is approximated: unselected samples attenuate
    # exactly (skipped-mass term) but their own radiance goes to the
    # background, so parity is loose here and tight on converged grids
    # (test_proxy_matches_pool_on_converged_grid).  The pre-fix failure
    # mode this guards against scored ~6 dB (surface never shaded).
    mse = np.mean((img_p - img_e) ** 2)
    psnr = -10.0 * np.log10(mse)
    assert psnr > 18.0, psnr


def test_single_round_proxy():
    """proxy_samples=0 (no coarse sweep) still reproduces the exact
    render on a converged grid with tight spans."""
    density = baked_density()
    occ = (density[0] > 0.01).astype(jnp.uint8)
    dens8 = density_corner_table(density[0], H_GRID)
    n = 128
    rng = np.random.default_rng(5)
    o = np.tile([[0.0, 0.0, -2.0]], (n, 1)).astype(np.float32)
    d = rng.normal(size=(n, 3)) * [0.2, 0.2, 0] + [0, 0, 1]
    d = (d / np.linalg.norm(d, axis=-1, keepdims=True)).astype(np.float32)
    o, d = jnp.asarray(o), jnp.asarray(d)
    cfg = RenderConfig(bound=1.0, cascades=1, grid_size=H_GRID,
                       max_steps=256, max_samples_infer=128,
                       pool_mean_samples=64, pool_mean_samples_infer=64,
                       proxy_samples=0, proxy_refined=48,
                       infer_color_cap=16)
    aabb = jnp.asarray([-1.0] * 3 + [1.0] * 3)
    nears, fars = near_far_from_aabb(o, d, aabb, cfg.min_near)
    # tight spans: intersect with the sphere's AABB like the prepass
    aabb_t = jnp.asarray([-0.6] * 3 + [0.6] * 3)
    nt, ft = near_far_from_aabb(o, d, aabb_t, cfg.min_near)
    exact = render_rays(sphere_field, occ, o, d, cfg,
                        max_samples=cfg.max_samples_infer)
    prox = render_rays_proxy(sphere_field, dens8, o, d, nt, ft, cfg)
    err = np.abs(np.asarray(prox["image"])
                 - np.asarray(exact["image"])).max(-1)
    assert np.quantile(err, 0.95) < 0.06, np.quantile(err, 0.95)


def _toy_field_apply(params, x, d, static):
    del params, static
    return sphere_field(x, d)


def test_render_image_multicascade_with_density():
    """Regression: render_image(density=...) with cascades > 1 used to
    crash in the prepass (occupied_aabb got cascades=1 for a
    cascades*H^3 grid).  The density-threshold prepass replacement only
    applies at cascades == 1; with more cascades the raw occupancy must
    be used with the true cascade count."""
    from nerf_texture_tpu.render.renderer import RenderConfig, render_image

    H = 16
    cfg = RenderConfig(bound=2.0, cascades=2, grid_size=H, max_steps=32,
                      max_samples_infer=16, ray_chunk=256,
                      pool_mean_samples=8, pool_mean_samples_infer=8)
    occ = jnp.ones((2 * H ** 3,), jnp.uint8)
    c = (jnp.arange(H) + 0.5) / H * 2.0 - 1.0
    xx, yy, zz = jnp.meshgrid(c, c, c, indexing="ij")
    pts = jnp.stack([xx, yy, zz], -1).reshape(-1, 3)
    density = jnp.stack([sphere_field(pts, None)[0],
                         sphere_field(2.0 * pts, None)[0]])
    pose = jnp.asarray([[1.0, 0, 0, 0], [0, 1.0, 0, 0],
                        [0, 0, 1.0, -2.5], [0, 0, 0, 1.0]])
    intr = jnp.asarray([20.0, 20.0, 8.0, 8.0])
    out = render_image(_toy_field_apply, None, {}, occ, pose, intr,
                       16, 16, cfg, density=density)
    img = np.asarray(out["image"])
    assert img.shape == (16, 16, 3) and np.isfinite(img).all()
    # the shell is in view: some rays must accumulate weight
    assert float(np.asarray(out["weights_sum"]).max()) > 0.5


def test_prepass_tau_cull_drops_overlive_keeps_content():
    """The proxy-alpha carve (RenderConfig.prepass_tau_cull) culls rays
    whose span composites to ~nothing while keeping every ray that
    contributes visible alpha (round-4 VERDICT next #2: live_frac 0.39
    vs 0.17 true silhouette -- over-live rays pay full render cost)."""
    from nerf_texture_tpu.data.rays import get_rays
    from nerf_texture_tpu.render import renderer as R

    density = baked_density()
    dens8 = density_corner_table(density[0], H_GRID)
    # occupancy artificially inflated far beyond the shell: everything
    # with r < 0.95 counts as "occupied" for the hit test, the way a
    # stale EMA grid + dilation over-live a real scene
    c = (jnp.arange(H_GRID) + 0.5) / H_GRID * 2.0 - 1.0
    xx, yy, zz = jnp.meshgrid(c, c, c, indexing="ij")
    r = jnp.sqrt(xx ** 2 + yy ** 2 + zz ** 2).reshape(-1)
    occ_dil = (r < 0.95).astype(jnp.uint8)
    aabb = jnp.asarray([-0.96] * 3 + [0.96] * 3)

    Hpix = Wpix = 64
    B = 4
    Hb = Wb = Hpix // B
    nb = Hb * Wb
    pose = jnp.asarray([[1.0, 0, 0, 0], [0, 1.0, 0, 0],
                        [0, 0, 1.0, -2.0], [0, 0, 0, 1.0]])
    intr = np.asarray([40.0, 40.0, 32.0, 32.0], np.float32)
    rays_b = get_rays(pose, jnp.asarray(intr / B), Hb, Wb)
    blk = R._round_up(nb, 256)

    kw = dict(grid_size=H_GRID, block=blk, margin_steps=1.0,
              H=Hpix, W=Wpix, Hb=Hb, Wb=Wb, B=B, nb=nb)
    perm0, count0, t0, t1 = R._prepass_compact(
        rays_b["rays_o"], rays_b["rays_d"], occ_dil, aabb, 1.0, 0.05,
        **kw)
    perm1, count1, _, _ = R._prepass_compact(
        rays_b["rays_o"], rays_b["rays_d"], occ_dil, aabb, 1.0, 0.05,
        dens8=dens8, tau_cull=3e-3, tau_samples=32, **kw)
    count0, count1 = int(count0), int(count1)
    # at this toy 16x16-block scale the 3x3 divergence dilation adds a
    # proportionally thick ring, so the cull ratio is modest; the real
    # gain is measured at bench scale (800^2, 200x200 blocks) where the
    # ring is thin.  Here: a real reduction must still happen.
    assert count1 <= 0.8 * count0, (count0, count1)

    # ground truth: full-res render of every ray; any ray with visible
    # alpha must survive the carve
    rays = get_rays(pose, jnp.asarray(intr), Hpix, Wpix)
    occ = (density[0] > 0.01).astype(jnp.uint8)
    cfg = RenderConfig(bound=1.0, cascades=1, grid_size=H_GRID,
                       max_steps=256, max_samples_infer=128,
                       pool_mean_samples=64, pool_mean_samples_infer=64)
    exact = render_rays(sphere_field, occ, rays["rays_o"],
                        rays["rays_d"], cfg,
                        max_samples=cfg.max_samples_infer)
    wsum = np.asarray(exact["weights_sum"])
    live1 = np.zeros(Hpix * Wpix, bool)
    live1[np.asarray(perm1)[:count1]] = True
    visible = wsum > 0.004          # one 8-bit level
    missed = visible & ~live1
    assert missed.sum() == 0, (missed.sum(), wsum[missed].max()
                               if missed.any() else 0)
