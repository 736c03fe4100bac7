"""Pallas fused survivor selection == the XLA selection chain.

The kernel (ops/proxy_select.py) must be a drop-in for the
cumsum/top_k/argsort/take_along_axis chain in render_rays_proxy
(render/renderer.py).  On CPU the kernel runs in interpreter mode, which
checks the math; the Mosaic compile is exercised on the real chip by
scripts/bench_proxy_select.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_texture_tpu.ops.proxy_select import proxy_select
from nerf_texture_tpu.render.renderer import (RenderConfig,
                                              density_corner_table,
                                              render_rays_proxy)


def _xla_selection(ts, sig, t_lo, t_hi, cap, w_eps):
    """The reference XLA chain, lifted verbatim from render_rays_proxy."""
    K = ts.shape[1]
    span = jnp.maximum(t_hi - t_lo, 0.0)
    dts = span / K
    sdt = sig * dts[:, None]
    cs = jnp.cumsum(sdt, -1)
    trans = jnp.exp(-(cs - sdt))
    w_p = trans * (1.0 - jnp.exp(-sdt))
    w_p = jnp.where(span[:, None] > 0, w_p, 0.0)
    valid = (t_hi - t_lo)[:, None] > 0
    w_sel = jnp.where(valid, w_p, 0.0)
    kth = jax.lax.top_k(w_sel, min(cap, K))[0][:, -1]
    cand = valid & (w_p >= kth[:, None]) & (w_p > w_eps)
    rank = jnp.cumsum(cand.astype(jnp.int32), -1) - 1
    keep = cand & (rank < cap)
    skip_sdt = jnp.where(keep | ~valid, 0.0, sdt)
    skip_excl = jnp.cumsum(skip_sdt, -1) - skip_sdt
    cap_eff = min(cap, K)
    src = jnp.argsort(~keep, axis=-1, stable=True)[:, :cap_eff]
    packed = jnp.stack([ts, skip_excl, keep.astype(ts.dtype)], axis=1)
    sel = jnp.take_along_axis(packed, src[:, None, :], axis=-1)
    return sel[:, 0], sel[:, 1], sel[:, 2] > 0.5


@pytest.mark.parametrize("seed,N,K,cap", [(0, 64, 32, 8), (1, 33, 16, 4),
                                          (2, 128, 32, 8)])
def test_selection_matches_xla_chain(seed, N, K, cap):
    rng = np.random.default_rng(seed)
    t_lo = rng.uniform(0.5, 1.5, N).astype(np.float32)
    t_hi = t_lo + rng.uniform(0.0, 1.0, N).astype(np.float32)
    t_hi[: N // 4] = t_lo[: N // 4]          # degenerate spans
    sig = rng.gamma(0.5, 4.0, (N, K)).astype(np.float32)
    sig[N // 4: N // 2] = 0.0                 # empty rays (no survivors)
    sig[N // 2: N // 2 + 4] = 3.0             # exact ties
    frac = (np.arange(K, dtype=np.float32) + 0.5) / K
    span = np.maximum(t_hi - t_lo, 0.0)
    ts = t_lo[:, None] + span[:, None] * frac

    w_eps = 1e-4
    ts2_r, skip2_r, valid2_r = jax.jit(
        lambda *a: _xla_selection(*a, cap=cap, w_eps=w_eps))(
            ts, sig, t_lo, t_hi)
    ts2_p, skip2_p, valid2_p = proxy_select(
        jnp.asarray(ts), jnp.asarray(sig), jnp.asarray(t_lo),
        jnp.asarray(t_hi), cap=cap, w_eps=w_eps, block=32)

    v_r = np.asarray(valid2_r)
    v_p = np.asarray(valid2_p)
    np.testing.assert_array_equal(v_r, v_p)
    # padded (invalid) slots carry arbitrary values in the XLA chain and
    # zeros in the kernel -- compare valid slots only
    np.testing.assert_allclose(np.asarray(ts2_p)[v_r],
                               np.asarray(ts2_r)[v_r], rtol=1e-6,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(skip2_p)[v_r],
                               np.asarray(skip2_r)[v_r], rtol=1e-5,
                               atol=1e-6)


def test_render_rays_proxy_flag_parity():
    """Full render_rays_proxy: proxy_pallas=True == False on a random
    density grid + a nontrivial field."""
    rng = np.random.default_rng(3)
    G = 16
    density = rng.gamma(0.4, 2.0, (G ** 3,)).astype(np.float32)
    density[rng.random(G ** 3) < 0.6] = 0.0
    dens8 = density_corner_table(jnp.asarray(density), G)

    N = 97
    o = np.tile([[0.0, 0.0, -2.0]], (N, 1)).astype(np.float32)
    d = rng.normal(size=(N, 3)).astype(np.float32) * 0.2 \
        + np.array([0, 0, 1], np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    nears = np.full((N,), 1.0, np.float32)
    fars = np.full((N,), 3.0, np.float32)
    fars[:10] = nears[:10]                     # missed rays

    def field(x, dd):
        sigma = jnp.sum(jnp.abs(jnp.sin(3.0 * x)), -1)
        rgb = 0.5 + 0.5 * jnp.sin(jnp.concatenate([x, dd], -1))[:, :3]
        return sigma, rgb

    # base must pin BOTH flags off: proxy_pallas/infer_cdf default True,
    # so an unpinned base would run the same pallas-cdf path as cfgp and
    # the XLA-vs-Pallas parity this test documents would be vacuous
    base = RenderConfig(bound=1.0, cascades=1, grid_size=G,
                        proxy_samples=0, proxy_refined=32,
                        infer_color_cap=8, proxy_pallas=False,
                        infer_cdf=False)
    out_x = render_rays_proxy(field, dens8, jnp.asarray(o), jnp.asarray(d),
                              jnp.asarray(nears), jnp.asarray(fars), base)
    import dataclasses
    cfgp = dataclasses.replace(base, proxy_pallas=True)
    out_p = render_rays_proxy(field, dens8, jnp.asarray(o), jnp.asarray(d),
                              jnp.asarray(nears), jnp.asarray(fars), cfgp)
    for k in ("image", "depth", "weights_sum", "counts"):
        np.testing.assert_allclose(np.asarray(out_p[k]),
                                   np.asarray(out_x[k]), rtol=1e-5,
                                   atol=1e-5, err_msg=k)


def test_render_rays_proxy_bf16_table_close():
    """proxy_bf16: the bf16 corner table only perturbs survivor choice /
    skip attenuation; the composite is recomputed from exact f32 sigmas,
    so outputs stay close to the f32 table (loose tolerance -- a ray may
    swap a marginal survivor)."""
    rng = np.random.default_rng(5)
    G = 16
    density = rng.gamma(0.4, 2.0, (G ** 3,)).astype(np.float32)
    density[rng.random(G ** 3) < 0.6] = 0.0
    N = 97
    o = np.tile([[0.0, 0.0, -2.0]], (N, 1)).astype(np.float32)
    d = rng.normal(size=(N, 3)).astype(np.float32) * 0.2 \
        + np.array([0, 0, 1], np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    nears = np.full((N,), 1.0, np.float32)
    fars = np.full((N,), 3.0, np.float32)

    def field(x, dd):
        sigma = jnp.sum(jnp.abs(jnp.sin(3.0 * x)), -1)
        rgb = 0.5 + 0.5 * jnp.sin(jnp.concatenate([x, dd], -1))[:, :3]
        return sigma, rgb

    import dataclasses
    base = RenderConfig(bound=1.0, cascades=1, grid_size=G,
                        proxy_samples=0, proxy_refined=32,
                        infer_color_cap=8)
    outs = {}
    for bf16 in (False, True):
        cfg = dataclasses.replace(base, proxy_bf16=bf16)
        dens8 = density_corner_table(jnp.asarray(density), G, bf16=bf16)
        assert dens8.dtype == (jnp.bfloat16 if bf16 else jnp.float32)
        outs[bf16] = render_rays_proxy(
            field, dens8, jnp.asarray(o), jnp.asarray(d),
            jnp.asarray(nears), jnp.asarray(fars), cfg)
    img_a = np.asarray(outs[False]["image"])
    img_b = np.asarray(outs[True]["image"])
    assert np.mean(np.abs(img_a - img_b)) < 5e-3
    np.testing.assert_allclose(np.asarray(outs[True]["weights_sum"]),
                               np.asarray(outs[False]["weights_sum"]),
                               atol=0.05)


def _np_cdf_selection(sig, t_lo, t_hi, cap, w_eps):
    """Numpy oracle for proxy_select_cdf: per-ray stratified inverse CDF
    of the proxy weight distribution."""
    N, K = sig.shape
    span = np.maximum(t_hi - t_lo, 0.0)
    dts = span / K
    sdt = sig * dts[:, None]
    cs = np.cumsum(sdt, -1)
    trans = np.exp(-(cs - sdt))
    w = trans * (1.0 - np.exp(-sdt))
    w = np.where(span[:, None] > 0, w, 0.0)
    total = w.sum(-1)
    valid = (span > 0) & (total > w_eps)
    tot = np.maximum(total, 1e-12)
    cdf = np.cumsum(w, -1) / tot[:, None]
    ts2 = np.zeros((N, cap), np.float32)
    for c in range(cap):
        u = (c + 0.5) / cap
        b = np.minimum((cdf < u).sum(-1), K - 1)
        cdf_hi = cdf[np.arange(N), b]
        cdf_lo = cdf_hi - w[np.arange(N), b] / tot
        frac = np.clip((u - cdf_lo)
                       / np.maximum(cdf_hi - cdf_lo, 1e-12), 0.0, 1.0)
        ts2[:, c] = t_lo + (b + frac) * dts
    dt2 = np.diff(ts2, axis=-1)
    dt2 = np.concatenate(
        [dt2, np.maximum(t_hi - ts2[:, -1], 0.0)[:, None]], -1)
    dt2 = np.minimum(dt2, 2.0 * dts[:, None])
    return ts2, dt2.astype(np.float32), np.tile(valid[:, None], (1, cap))


@pytest.mark.parametrize("seed,N,K,cap", [(0, 64, 32, 8), (1, 33, 24, 5)])
def test_cdf_selection_matches_numpy_oracle(seed, N, K, cap):
    from nerf_texture_tpu.ops.proxy_select import proxy_select_cdf

    rng = np.random.default_rng(seed)
    t_lo = rng.uniform(0.5, 1.5, N).astype(np.float32)
    t_hi = t_lo + rng.uniform(0.0, 1.0, N).astype(np.float32)
    t_hi[: N // 4] = t_lo[: N // 4]          # degenerate spans
    sig = rng.gamma(0.5, 4.0, (N, K)).astype(np.float32)
    sig[N // 4: N // 2] = 0.0                 # empty rays
    frac = (np.arange(K, dtype=np.float32) + 0.5) / K
    span = np.maximum(t_hi - t_lo, 0.0)
    ts = t_lo[:, None] + span[:, None] * frac

    w_eps = 1e-4
    ts2, dt2, valid2 = proxy_select_cdf(
        jnp.asarray(ts), jnp.asarray(sig), jnp.asarray(t_lo),
        jnp.asarray(t_hi), cap=cap, w_eps=w_eps, block=32)
    ots, odt, oval = _np_cdf_selection(sig, t_lo, t_hi, cap, w_eps)
    np.testing.assert_array_equal(np.asarray(valid2), oval)
    np.testing.assert_allclose(np.asarray(ts2), ots, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dt2), odt, rtol=1e-5, atol=2e-5)
    # placement invariants on valid rays: t-sorted, inside the span,
    # segments never overlap past t_hi (<= because gap clamping may
    # shrink them)
    v = oval[:, 0]
    tv = np.asarray(ts2)[v]
    assert (np.diff(tv, axis=-1) >= -1e-6).all()
    assert (tv >= t_lo[v, None] - 1e-5).all()
    assert (tv <= t_hi[v, None] + 1e-5).all()
    assert (np.asarray(dt2)[v].sum(-1)
            <= t_hi[v] - tv[:, 0] + 1e-4).all()


def test_render_rays_proxy_cdf_close_to_topk():
    """infer_cdf at a SMALLER cap reproduces the top-k image on an
    opaque-surface field (the bench workload): quantile placement puts
    every slot inside the weight-bearing window."""
    import dataclasses

    rng = np.random.default_rng(7)
    G = 32
    c = (np.arange(G) + 0.5) / G * 2.0 - 1.0
    xx, yy, zz = np.meshgrid(c, c, c, indexing="ij")
    r = np.sqrt(xx ** 2 + yy ** 2 + zz ** 2)
    density = (80.0 * np.exp(-((r - 0.5) / 0.06) ** 2)
               ).astype(np.float32).reshape(-1)
    dens8 = density_corner_table(jnp.asarray(density), G)

    def field(x, dd):
        rr = jnp.linalg.norm(x, axis=-1)
        sigma = 80.0 * jnp.exp(-((rr - 0.5) / 0.06) ** 2)
        rgb = (x / jnp.maximum(rr[..., None], 1e-6) + 1.0) / 2.0
        return sigma, rgb

    N = 256
    o = np.tile([[0.0, 0.0, -2.0]], (N, 1)).astype(np.float32)
    d = rng.normal(size=(N, 3)).astype(np.float32) * 0.22 \
        + np.array([0, 0, 1], np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    nears = np.full((N,), 1.0, np.float32)
    fars = np.full((N,), 3.0, np.float32)

    # infer_cdf=False on the base: the flag defaults True, so an
    # unpinned base would be cdf-cap8 and this test would compare
    # cdf-vs-cdf instead of the top-k-vs-cdf claim in its name
    base = RenderConfig(bound=1.0, cascades=1, grid_size=G,
                        proxy_samples=0, proxy_refined=24,
                        infer_color_cap=8, proxy_pallas=True,
                        infer_cdf=False)
    cdf5 = dataclasses.replace(base, infer_cdf=True, infer_color_cap=5)
    args = (jnp.asarray(o), jnp.asarray(d), jnp.asarray(nears),
            jnp.asarray(fars))
    out_t = render_rays_proxy(field, dens8, *args, base)
    out_c = render_rays_proxy(field, dens8, *args, cdf5)
    err = np.abs(np.asarray(out_c["image"])
                 - np.asarray(out_t["image"])).max(-1)
    assert np.quantile(err, 0.95) < 0.05, np.quantile(err, 0.95)
    np.testing.assert_allclose(np.asarray(out_c["weights_sum"]),
                               np.asarray(out_t["weights_sum"]), atol=0.08)
