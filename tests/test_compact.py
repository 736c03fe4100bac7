"""Compacted sample pool must reproduce the dense [N, K] render path."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from nerf_texture_tpu.models import ngp
from nerf_texture_tpu.render.compact import (composite_flat,
                                             flatten_samples, seg_broadcast,
                                             seg_sum)
from nerf_texture_tpu.render.renderer import RenderConfig, render_rays
from nerf_texture_tpu.ops.marching import MarchResult
import pytest


def test_seg_ops():
    offsets = jnp.asarray([0, 3, 3, 7, 9])
    x = jnp.arange(9.0)
    s = np.asarray(seg_sum(x, offsets))
    np.testing.assert_allclose(s, [0 + 1 + 2, 0, 3 + 4 + 5 + 6, 7 + 8])
    v = jnp.asarray([10.0, 20.0, 30.0, 40.0])
    rid = jnp.asarray([0, 0, 0, 2, 2, 2, 2, 3, 3])
    b = np.asarray(seg_broadcast(v, rid, offsets))
    np.testing.assert_allclose(b, [10, 10, 10, 30, 30, 30, 30, 40, 40])
    # custom vjp of seg_broadcast == segment sums
    g = jax.grad(lambda v: jnp.sum(
        seg_broadcast(v, rid, offsets) * x))(v)
    np.testing.assert_allclose(np.asarray(g), [3, 0, 18, 15])


def test_flatten_and_composite_match_dense():
    rng = np.random.default_rng(0)
    N, K = 16, 24
    counts = rng.integers(0, K, N).astype(np.int32)
    counts[3] = 0
    mask = np.zeros((N, K), bool)
    for n in range(N):
        mask[n, :counts[n]] = True
    dts = rng.uniform(0.01, 0.05, (N, K)) * mask
    ts = np.cumsum(dts, -1) * mask
    m = MarchResult(ts=jnp.asarray(ts, jnp.float32),
                    dts=jnp.asarray(dts, jnp.float32),
                    mask=jnp.asarray(mask),
                    counts=jnp.asarray(counts))
    budget = 512
    flat = flatten_samples(m, budget)
    assert int(flat.offsets[-1]) == counts.sum()

    sig_nk = rng.uniform(0, 30, (N, K)).astype(np.float32)
    rgb_nk = rng.uniform(0, 1, (N, K, 3)).astype(np.float32)
    # build flat sigmas/rgbs by gathering like the renderer does
    rid = np.asarray(flat.ray_id)
    valid = np.asarray(flat.valid)
    j = np.zeros(budget, np.int64)
    off = np.asarray(flat.offsets)
    for mm in range(budget):
        if valid[mm]:
            j[mm] = mm - off[rid[mm]]
    sig_flat = np.where(valid, sig_nk[np.clip(rid, 0, N - 1), j], 0.0)
    rgb_flat = np.where(valid[:, None],
                        rgb_nk[np.clip(rid, 0, N - 1), j], 0.0)

    from nerf_texture_tpu.ops import composite_rays
    dense = composite_rays(jnp.asarray(sig_nk), jnp.asarray(rgb_nk),
                           m.dts, m.ts, m.mask)
    flatc = composite_flat(jnp.asarray(sig_flat), jnp.asarray(rgb_flat),
                           flat, N)
    np.testing.assert_allclose(np.asarray(flatc.image),
                               np.asarray(dense.image), atol=1e-5)
    np.testing.assert_allclose(np.asarray(flatc.weights_sum),
                               np.asarray(dense.weights_sum), atol=1e-5)
    np.testing.assert_allclose(np.asarray(flatc.depth),
                               np.asarray(dense.depth), atol=1e-5)


def test_render_rays_pool_matches_dense():
    mcfg = ngp.NGPConfig(bound=1.0, num_levels=4, level_dim=2,
                         log2_hashmap_size=12, log2_bricks=10,
                         desired_resolution=64, hidden_dim=32,
                         hidden_dim_color=32)
    params = ngp.init(jax.random.PRNGKey(0), mcfg)
    H = 16
    occ = (jax.random.uniform(jax.random.PRNGKey(1), (H ** 3,))
           < 0.3).astype(jnp.uint8)
    n = 64
    rng = np.random.default_rng(2)
    o = np.tile([[0.0, 0.0, -2.0]], (n, 1)).astype(np.float32)
    d = rng.normal(size=(n, 3)) * np.array([0.2, 0.2, 0]) + [0, 0, 1]
    d = (d / np.linalg.norm(d, axis=-1, keepdims=True)).astype(np.float32)

    base = RenderConfig(bound=1.0, cascades=1, grid_size=H, max_steps=64,
                        max_samples_train=48)
    field = lambda x, dd: ngp.forward(params, x, dd, mcfg)
    out_pool = render_rays(
        field, occ, jnp.asarray(o), jnp.asarray(d),
        dataclasses.replace(base, pool_mean_samples=48), max_samples=48)
    out_dense = render_rays(
        field, occ, jnp.asarray(o), jnp.asarray(d),
        dataclasses.replace(base, pool_mean_samples=0), max_samples=48)
    np.testing.assert_allclose(np.asarray(out_pool["image"]),
                               np.asarray(out_dense["image"]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(out_pool["depth"]),
                               np.asarray(out_dense["depth"]), atol=1e-4)


@pytest.mark.slow
def test_pool_gradients_match_dense():
    """End-to-end parameter gradients agree between pool and dense paths."""
    mcfg = ngp.NGPConfig(bound=1.0, num_levels=3, level_dim=2,
                         log2_hashmap_size=10, log2_bricks=8,
                         desired_resolution=32, hidden_dim=16,
                         hidden_dim_color=16)
    params = ngp.init(jax.random.PRNGKey(3), mcfg)
    H = 8
    occ = jnp.ones((H ** 3,), jnp.uint8)
    n = 16
    o = jnp.tile(jnp.asarray([[0.0, 0.0, -2.0]]), (n, 1))
    ang = jnp.linspace(-0.2, 0.2, n)
    d = jnp.stack([jnp.sin(ang), jnp.zeros(n), jnp.cos(ang)], -1)
    gt = jnp.ones((n, 3)) * 0.5

    def loss(params, pool):
        cfg = RenderConfig(bound=1.0, cascades=1, grid_size=H,
                           max_steps=32, max_samples_train=32,
                           pool_mean_samples=pool)
        out = render_rays(lambda x, dd: ngp.forward(params, x, dd, mcfg),
                          occ, o, d, cfg, max_samples=32)
        return jnp.mean((out["image"] - gt) ** 2)

    g_pool = jax.grad(lambda p: loss(p, 32))(params)
    g_dense = jax.grad(lambda p: loss(p, 0))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_pool),
                    jax.tree_util.tree_leaves(g_dense)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=1e-3)


def test_two_phase_matches_single_phase():
    """sigma_fn two-phase path == single-phase when eps is tiny and the
    per-ray cap covers every sample."""
    mcfg = ngp.NGPConfig(bound=1.0, num_levels=4, level_dim=2,
                         log2_hashmap_size=12, log2_bricks=10,
                         desired_resolution=64, hidden_dim=32,
                         hidden_dim_color=32)
    params = ngp.init(jax.random.PRNGKey(0), mcfg)
    H = 16
    occ = (jax.random.uniform(jax.random.PRNGKey(1), (H ** 3,))
           < 0.3).astype(jnp.uint8)
    n = 64
    rng = np.random.default_rng(2)
    o = np.tile([[0.0, 0.0, -2.0]], (n, 1)).astype(np.float32)
    d = rng.normal(size=(n, 3)) * np.array([0.2, 0.2, 0]) + [0, 0, 1]
    d = (d / np.linalg.norm(d, axis=-1, keepdims=True)).astype(np.float32)

    cfg = RenderConfig(bound=1.0, cascades=1, grid_size=H, max_steps=64,
                       max_samples_train=48, pool_mean_samples=48,
                       infer_color_cap=48, infer_w_eps=0.0)
    field = lambda x, dd: ngp.forward(params, x, dd, mcfg)
    sigma_only = lambda x, dd: ngp.forward(params, x, dd, mcfg)[0]
    out1 = render_rays(field, occ, jnp.asarray(o), jnp.asarray(d), cfg,
                       max_samples=48)
    out2 = render_rays(field, occ, jnp.asarray(o), jnp.asarray(d), cfg,
                       max_samples=48, sigma_fn=sigma_only)
    np.testing.assert_allclose(np.asarray(out2["image"]),
                               np.asarray(out1["image"]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(out2["depth"]),
                               np.asarray(out1["depth"]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(out2["weights_sum"]),
                               np.asarray(out1["weights_sum"]), atol=1e-5)

    # realistic eps/cap on an OPAQUE (trained-like) field: rays saturate
    # within a few samples, so the termination criteria drop only weight
    # below the reference's T < 1e-4 kill threshold
    def field_opaque(x, dd):
        s, c = ngp.forward(params, x, dd, mcfg)
        return s * 100.0, c

    cfg2 = dataclasses.replace(cfg, infer_color_cap=8, infer_w_eps=1e-4)
    ref = render_rays(field_opaque, occ, jnp.asarray(o), jnp.asarray(d),
                      cfg2, max_samples=48)
    two = render_rays(field_opaque, occ, jnp.asarray(o), jnp.asarray(d),
                      cfg2, max_samples=48,
                      sigma_fn=lambda x, dd: field_opaque(x, dd)[0])
    np.testing.assert_allclose(np.asarray(two["image"]),
                               np.asarray(ref["image"]), atol=5e-3)
    np.testing.assert_allclose(np.asarray(two["weights_sum"]),
                               np.asarray(ref["weights_sum"]), atol=1e-5)


def test_survivor_pool_weight_ranked_keeps_surface_under_tight_cap():
    """A tight cap must keep the high-weight surface samples, not the
    leading low-grade haze (VERDICT r4 next #3: first-k-in-t-order pool
    caps lost ~10 dB to haze the density grid keeps in front of
    surfaces).  Built directly on a hand-made field: ~20 haze samples
    (tiny sigma) precede one opaque surface slab per ray."""
    n = 32
    o = np.tile([[0.0, 0.0, -2.0]], (n, 1)).astype(np.float32)
    d = np.tile([[0.0, 0.0, 1.0]], (n, 1)).astype(np.float32)
    H = 16
    occ = jnp.ones((H ** 3,), jnp.uint8)      # march everything

    def field(x, dd):
        z = x[..., 2]
        haze = 5e-2 * (z < 0.3).astype(jnp.float32)
        surf = 500.0 * ((z >= 0.3) & (z < 0.45)).astype(jnp.float32)
        sigma = haze + surf
        col = jnp.where((z >= 0.3)[..., None],
                        jnp.asarray([0.9, 0.2, 0.1]),
                        jnp.asarray([0.5, 0.5, 0.5]))
        col = jnp.broadcast_to(col, x.shape[:1] + (3,))
        return sigma, col

    cfg = RenderConfig(bound=1.0, cascades=1, grid_size=H, max_steps=64,
                       max_samples_train=48, pool_mean_samples=48,
                       infer_color_cap=48, infer_w_eps=1e-4)
    sig = lambda x, dd: field(x, dd)[0]
    ref = render_rays(field, occ, jnp.asarray(o), jnp.asarray(d), cfg,
                      max_samples=48)           # uncapped single phase
    tight = dataclasses.replace(cfg, infer_color_cap=3)
    out = render_rays(field, occ, jnp.asarray(o), jnp.asarray(d), tight,
                      max_samples=48, sigma_fn=sig)
    # cap 3 of ~24 samples: the 3 highest-weight samples carry the
    # surface; a first-3 rule would shade only gray haze (err ~0.4)
    err = float(np.abs(np.asarray(out["image"])
                       - np.asarray(ref["image"])).max())
    assert err < 0.05, f"tight weight-ranked cap diverged: {err}"
    surface_red = float(np.asarray(out["image"])[:, 0].mean())
    assert surface_red > 0.7, f"surface lost under tight cap: {surface_red}"
