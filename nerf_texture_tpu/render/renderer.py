"""Rendering orchestration.

TPU-native re-design of the reference ``NeRFRenderer.run_cuda``
(nerf/renderer.py:338-499).  One code path serves training and inference:

  near/far slab test -> fixed-width occupancy march -> ONE fused
  field evaluation over [N, K] samples -> closed-form composite.

The reference's inference loop (alive-ray compaction with an ``.item()``
host sync per iteration, renderer.py:459-485) is replaced by a larger
static sample budget K: dead samples are masked, never branched on, so a
full frame renders as a fixed pipeline of identically-shaped jitted chunks.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..ops import (composite_rays, composite_with_background, march_rays,
                   near_far_from_aabb, sample_points)


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    bound: float = 1.0
    cascades: int = 1          # 1 + ceil(log2(bound)) in the reference
    grid_size: int = 128
    min_near: float = 0.2
    density_scale: float = 1.0
    density_thresh: float = 0.01
    dt_gamma: float = 0.0
    max_steps: int = 1024
    max_samples_train: int = 256
    max_samples_infer: int = 512
    ray_chunk: int = 8192      # inference chunking (static shape per chunk)
    # compacted sample pool (samples per ray averaged over the batch);
    # 0 disables pooling and evaluates the dense [N, K] grid
    pool_mean_samples: int = 64
    # inference budget: most rays terminate early / miss, so the pool can
    # be much tighter than at training (overflowing rays fall back to
    # background, like the reference's M-overflow, raymarching.cu:418)
    pool_mean_samples_infer: int = 24
    # inference march sequence length (0 = max_steps).  Step SIZE stays
    # tied to max_steps; with the prepass's tight per-ray [near, far]
    # a shorter sequence covers the occupied span at half the cost.
    # Spans longer than march_steps_infer * (2*sqrt(3)/max_steps) would
    # truncate, so only set this when the scene is a bounded object.
    march_steps_infer: int = 0
    # two-phase terminated inference: a sigma-only pass over the full
    # pool picks the samples whose compositing weight survives
    # `infer_w_eps`, and the full field (normals + light model) runs only
    # on those -- at most `infer_color_cap` per ray.  The sample-level
    # analogue of the reference's T < 1e-4 ray kill (raymarching.cu:1021).
    infer_color_cap: int = 8
    infer_w_eps: float = 1e-4
    # silhouette prepass resolution: one prepass ray per BxB pixel block
    # (grid dilation absorbs the sub-block ray divergence; margin_steps
    # widens each block's [t0, t1] for the same reason).  1 = per-pixel.
    prepass_block: int = 4
    # 1 step + the grid dilation absorbs block divergence; tighter spans
    # also IMPROVE quality (finer proxy sample spacing), measured +0.13dB
    prepass_margin_steps: float = 1.0
    # prepass-only occupancy threshold, as a fraction of mean_density
    # (the march keeps the reference's min(mean, density_thresh)): culls
    # the EMA(max) salt noise that would otherwise make every ray live.
    # The effective threshold is clamped to <= 4x the march threshold so
    # faint-but-real content cannot be prepass-culled to background;
    # scenes dominated by dim/translucent media should set this to 0.
    prepass_thresh_scale: float = 0.5
    # prepass-only salt filter: drop connected components of the (host,
    # cached) prepass occupancy smaller than this many cells before the
    # 3^3 dilation.  Unconverged far-field density spikes occupy ~1-2%
    # of cells at just-above-threshold density; after dilation they make
    # ~90% of rays "live" (measured: 570K live vs ~120K true hits on the
    # 800^2 bench sphere) and each dead-but-live ray pays the full
    # per-ray render cost.  Real content is a large connected shell;
    # salt clusters are 1-3 cells.  A culled ray composites to pure
    # background; the cells removed here sit at alpha ~3e-4/sample, so
    # the image change is below quantization.  0 disables.
    prepass_min_component: int = 8
    # the salt filter always keeps cells that could contribute VISIBLE
    # alpha on their own: sigma * cell_size >= this bound (0.01 ~ a
    # 1%-alpha single-cell crossing, ~2.5 levels of 8-bit quantization).
    # Thin-but-dense real structures survive the opening through this;
    # blobs too faint to ever show up do not keep rays alive.
    prepass_strong_alpha: float = 0.01
    # second carve pass: cull rays whose full prepass span composites
    # below this alpha under the PROXY density (the dilated-occupancy
    # hit test keeps the occupied SHELL's geometric silhouette, ~2.3x
    # the visible one on the bench sphere; those rays render to ~pure
    # background at full per-ray cost).  Conservative: EMA(max) density
    # overestimates alpha, and a 3x3 block-neighborhood max absorbs
    # sub-block divergence.  3e-3 is below one 8-bit level; 0 disables.
    # Only active in proxy mode (needs the dens8 corner table) with a
    # block prepass (prepass_block > 1).
    prepass_tau_cull: float = 3e-3
    prepass_tau_samples: int = 32
    # anchor frames at SAMPLE granularity instead of once per ray.
    # The per-ray tangent plane is anchored at the (march-jittered,
    # view-dependent) first sample, so the surface chart p_sur(x) it
    # induces moves between steps and between views by up to
    # curvature * shell_thickness ~ 1e-2 -- several texels at the
    # reference's fine feature resolutions (512-1024), which
    # decorrelates the learned features (round-4: 800^2 curved fit
    # plateaued at ~15 dB pool).  Per-sample anchors through the static
    # per-cell anchor table give a chart that is DETERMINISTIC in x
    # (consistent across steps and views; piecewise-planar per grid
    # cell) for one extra width-16 gather per sample.  Callers fall
    # back to per-ray when no anchor table exists (kNN per sample is
    # the expensive exact-ish path).
    anchor_per_sample: bool = True
    # render every chunk of a frame inside ONE device program (dynamic
    # lax.while_loop over ceil(live / ray_chunk)): removes the per-chunk
    # dispatch (milliseconds-class through the tunnel) and the
    # live-count host sync, so the frame is a fixed 4-dispatch pipeline
    # and consecutive frames overlap in the async queue.  False falls
    # back to the host-side chunk loop (one program per chunk).
    frame_one_program: bool = True
    # deferred (per-ray) shading on the proxy path: composite the
    # shading FEATURES with the sigma-derived weights and run the
    # normal/light/color networks once per ray instead of once per
    # survivor sample (SNeRG, arXiv:2103.14645).  Only takes effect for
    # fields that provide a (stage1, stage2) deferred_apply pair (the
    # baked curved path and the NGP); ignored otherwise.
    deferred: bool = False
    # inference sampling mode:
    #   'proxy': proposal-style -- K samples spread over the prepass
    #     [t0, t1] span, weighted by a TRILINEAR lookup of the density
    #     grid (ONE width-8 gather/sample; the width-1 occupancy gather
    #     costs 2x more per index than a width-8 row, measured), then the
    #     real field runs only on the surviving samples and the final
    #     weights are recomputed exactly from the true sigmas.
    #   'pool': occupancy march + compacted pool (+ optional two-phase).
    # 'proxy' needs cascades == 1 and the density grid passed to
    # render_image; it falls back to 'pool' otherwise.
    infer_mode: str = "proxy"
    proxy_samples: int = 32       # round-1 samples over the prepass span
    proxy_refined: int = 24       # round-2 samples over the active window
    # fuse the survivor-selection chain (cumsum/top_k/argsort/gather)
    # into one Pallas program (ops/proxy_select.py).  Only used in
    # single-round proxy mode (proxy_samples == 0).  With infer_cdf
    # False the Pallas and XLA paths compute the identical top-k
    # selection (tests/test_proxy_select.py proves math parity); the
    # inverse-CDF placement has NO XLA twin, so proxy_pallas=False
    # with infer_cdf=True silently falls back to the XLA top-k chain
    # (a different sampling algorithm -- flagged below).
    # Default ON: measured 635 -> 583 ms/frame at 262K-ray chunks and
    # 2.27 vs 2.06 fps at 64K chunks on the 800^2 bench (v5e, r3).
    proxy_pallas: bool = True
    # place the survivor samples by stratified inverse-CDF of the proxy
    # weights instead of top-k of the K-grid.  SINGLE-ROUND MODE ONLY
    # (proxy_samples == 0, proxy_pallas on): the two-round path has its
    # own refined placement and ignores this flag (ops/proxy_select.py
    # proxy_select_cdf; the reference's sample_pdf importance pass,
    # nerf/renderer.py:241-260, as one fused kernel).  Quantiles always
    # land inside the weight-bearing interval, so the same quality
    # needs a smaller infer_color_cap -- and the field eval (the
    # dominant frame cost) scales with cap.  Requires proxy_pallas and
    # single-round mode (proxy_samples == 0).  Default ON: measured on
    # the 800^2 bench state (v5e, r3) cdf BEATS top-k at every cap --
    # cap4 182 ms / 23.98 dB, cap5 204 ms / 24.21, cap6 247 ms / 24.33
    # vs top-k cap8 271 ms / 23.85 (scripts/_ab_cdf_tpu.py).
    infer_cdf: bool = True
    # store the proxy corner table in bf16: halves the table (64 -> 32 MB
    # at 128^3) and the random-gather traffic of the N*K proxy lookups.
    # Measured LOSER on the whole frame (290 vs 285 ms at 32K chunks,
    # v5e r3, scripts/_prof_bench_frame.py: the width-8 corner gather is
    # index-count-bound, not row-width-bound) -- kept off; the flag
    # remains for import modes whose tables exceed VMEM-friendly sizes.
    proxy_bf16: bool = False

    @staticmethod
    def for_bound(bound: float, **kw) -> "RenderConfig":
        import math
        cascades = 1 + math.ceil(math.log2(max(bound, 1.0)))
        return RenderConfig(bound=bound, cascades=cascades, **kw)


def render_rays(field_fn, occ, rays_o, rays_d, cfg: RenderConfig, *,
                max_samples: int, key=None, perturb: bool = False,
                bg_color=1.0, aabb=None, pool_mean: int | None = None,
                anchor_fn=None, nears=None, fars=None,
                march_steps: int | None = None, sigma_fn=None,
                color_fn=None):
    """Render a batch of rays.

    Args:
      field_fn: (xyzs [M, 3], dirs [M, 3]) -> (sigmas [M], rgbs [M, 3])
        plus optionally a dict of extra per-sample attributes to composite
        (3-channel entries containing 'normal' are alpha-composited like the
        reference, renderer.py:428-433).
      occ: [cascades * grid_size**3] uint8 occupancy.
      rays_o, rays_d: [N, 3].
      bg_color: scalar, [3], or [N, 3].
      anchor_fn: optional (rays_o, rays_d, x_seed, seed_valid) -> pytree
        of per-RAY arrays (leading dim N); x_seed is each ray's first
        marched sample (seed_valid marks rays that have one).  When
        given, the per-ray tree is gathered to sample granularity and
        field_fn is called as field_fn(xyzs, dirs, frames) -- the
        per-ray projection fast path (geometry once per ray instead of
        once per sample).

    Returns:
      dict(image [N, 3], depth [N], weights_sum [N], counts [N], ...extras)
    """
    if aabb is None:
        aabb = jnp.asarray([-cfg.bound] * 3 + [cfg.bound] * 3)
    if nears is None or fars is None:
        nears, fars = near_far_from_aabb(rays_o, rays_d, aabb,
                                         cfg.min_near)
    m = march_rays(rays_o, rays_d, occ, nears, fars, bound=cfg.bound,
                   cascades=cfg.cascades, grid_size=cfg.grid_size,
                   max_steps=march_steps or cfg.max_steps,
                   max_samples=max_samples, dt_gamma=cfg.dt_gamma,
                   perturb=perturb, key=key, dt_steps=cfg.max_steps)
    N, K = m.ts.shape
    denom = jnp.where(fars > nears, fars - nears, 1.0)
    per_sample_anchor = anchor_fn is not None and cfg.anchor_per_sample
    if anchor_fn is not None and not per_sample_anchor:
        x_seed = jnp.clip(rays_o + m.ts[:, :1] * rays_d,
                          -cfg.bound, cfg.bound)
        frames = anchor_fn(rays_o, rays_d, x_seed, m.counts > 0)
    else:
        frames = None

    if pool_mean is None:
        pool_mean = cfg.pool_mean_samples
    if pool_mean:
        from .compact import (composite_flat, flat_points, flat_weights,
                              flatten_samples, seg_sum, survivor_pool)

        budget = _round_up(N * pool_mean, 1024)
        flat = flatten_samples(m, budget)
        xyzs, dirs = flat_points(rays_o, rays_d, flat, cfg.bound)
        if per_sample_anchor:
            frames_flat = anchor_fn(rays_o, rays_d, xyzs, flat.valid)
        elif frames is not None:
            rid = jnp.clip(flat.ray_id, 0, N - 1)
            frames_flat = jax.tree.map(lambda a: a[rid], frames)
        else:
            frames_flat = None

        if sigma_fn is not None:
            # two-phase terminated rendering: cheap sigma pass over the
            # whole pool -> weights -> full shading only on the surviving
            # (weight > eps, T > eps) samples, capped per ray.  sigma_fn
            # may return (sigma, aux); with color_fn given, aux rows are
            # gathered to the survivor pool and shading reuses them
            # instead of re-running the geometry/encoding chain.
            out1 = (sigma_fn(xyzs, dirs, frames_flat)
                    if frames_flat is not None else sigma_fn(xyzs, dirs))
            aux = None
            if isinstance(out1, tuple):
                sig, aux = out1
            else:
                sig = out1
            sig = sig.reshape(-1) * cfg.density_scale
            w, trans = flat_weights(sig, flat)
            surv = survivor_pool(flat, w, N, cap=cfg.infer_color_cap,
                                 w_eps=cfg.infer_w_eps, trans=trans)
            x2 = xyzs[surv.idx]
            d2 = dirs[surv.idx]
            if per_sample_anchor:
                frames2 = jax.tree.map(lambda a: a[surv.idx], frames_flat)
            elif frames is not None:
                frames2 = jax.tree.map(
                    lambda a: a[jnp.clip(surv.ray_id, 0, N - 1)], frames)
            else:
                frames2 = None
            if color_fn is not None and aux is not None:
                aux2 = jax.tree.map(lambda a: a[surv.idx], aux)
                rgb2 = (color_fn(x2, d2, aux2, frames2)
                        if frames2 is not None
                        else color_fn(x2, d2, aux2))
            elif frames2 is not None:
                out = field_fn(x2, d2, frames2)
                rgb2 = out[1] if isinstance(out, tuple) else out
            else:
                out = field_fn(x2, d2)
                rgb2 = out[1] if isinstance(out, tuple) else out
            rgb2 = rgb2.reshape(-1, 3)
            w2 = jnp.where(surv.valid, w[surv.idx], 0.0)
            image = seg_sum(w2[:, None] * rgb2, surv.offsets)
            wsum = seg_sum(w, flat.offsets)
            dep = seg_sum(w * flat.ts, flat.offsets)
            image = image + (1.0 - wsum)[..., None] * jnp.asarray(bg_color)
            depth = jnp.clip(dep - nears, 0.0, None) / denom
            return {"image": image, "depth": depth, "weights_sum": wsum,
                    "counts": m.counts}

        if frames_flat is not None:
            out = field_fn(xyzs, dirs, frames_flat)
        else:
            out = field_fn(xyzs, dirs)
        extras = {}
        if isinstance(out, tuple) and len(out) == 3:
            sigmas, rgbs, extras = out
        else:
            sigmas, rgbs = out
        sigmas = sigmas.reshape(-1) * cfg.density_scale
        res = composite_flat(sigmas, rgbs.reshape(-1, 3), flat, N)
        image = res.image + (1.0 - res.weights_sum)[..., None] \
            * jnp.asarray(bg_color)
        depth = jnp.clip(res.depth - nears, 0.0, None) / denom
        results = {"image": image, "depth": depth,
                   "weights_sum": res.weights_sum, "counts": m.counts}
        for name, val in extras.items():
            if val is not None and val.shape[-1] == 3 and "normal" in name:
                comp = composite_flat(jax.lax.stop_gradient(sigmas),
                                      val.reshape(-1, 3), flat, N)
                results[name] = comp.image
            else:
                results[name] = val
        return results

    xyzs, dirs = sample_points(rays_o, rays_d, m, cfg.bound)
    if per_sample_anchor:
        frames_d = anchor_fn(rays_o, rays_d, xyzs.reshape(N * K, 3),
                             m.mask.reshape(-1))
        out = field_fn(xyzs.reshape(N * K, 3), dirs.reshape(N * K, 3),
                       frames_d)
    elif frames is not None:
        out = field_fn(xyzs.reshape(N * K, 3), dirs.reshape(N * K, 3),
                       jax.tree.map(lambda a: jnp.repeat(a, K, axis=0),
                                    frames))
    else:
        out = field_fn(xyzs.reshape(N * K, 3), dirs.reshape(N * K, 3))
    extras = {}
    if isinstance(out, tuple) and len(out) == 3:
        sigmas, rgbs, extras = out
    else:
        sigmas, rgbs = out
    sigmas = sigmas.reshape(N, K) * cfg.density_scale
    rgbs = rgbs.reshape(N, K, 3)

    res = composite_rays(sigmas, rgbs, m.dts, m.ts, m.mask)
    image = composite_with_background(res, jnp.asarray(bg_color))
    # depth normalized like renderer.py:425
    depth = jnp.clip(res.depth - nears, 0.0, None) / denom

    results = {"image": image, "depth": depth,
               "weights_sum": res.weights_sum, "counts": m.counts}
    for name, val in extras.items():
        if val is not None and val.shape[-1] == 3 and "normal" in name:
            comp = composite_rays(jax.lax.stop_gradient(sigmas),
                                  val.reshape(N, K, 3), m.dts, m.ts, m.mask)
            results[name] = comp.image
        else:
            results[name] = val
    return results


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# proposal-style proxy rendering (inference fast path)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("grid_size", "bf16"))
def density_corner_table(density, grid_size: int, bf16: bool = False):
    """[H^3] cell-center densities -> [H^3, 8] table whose row r holds the
    2x2x2 neighborhood of cell r (clamped at the +1 borders), so one
    width-8 gather + trilinear weights evaluate the proxy density.
    Negative (untrained, -1) cells clamp to 0.

    Jitted: eager, the 8 shifted copies compiled ~18 one-off programs
    (slice+pad pairs) -- each a remote-compiler round trip on warmup.
    Accepts [H^3] or the full [cascades, H^3] grid (cascade 0 is used);
    slicing inside the program keeps the caller free of eager ops."""
    H = grid_size
    if density.ndim == 2:
        density = density[0]
    d = jnp.clip(density.reshape(H, H, H), 0.0, None)
    rows = []
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                s = d[dx:, dy:, dz:]
                s = jnp.pad(s, ((0, dx), (0, dy), (0, dz)), mode="edge")
                rows.append(s.reshape(-1))
    out = jnp.stack(rows, axis=-1)                     # [H^3, 8]
    return out.astype(jnp.bfloat16) if bf16 else out


def _proxy_sigma(dens8, rays_o, rays_d, ts, grid_size: int, bound: float):
    """Trilinear proxy density at o + t d for a [N, K] t-grid (SoA)."""
    H = grid_size
    inv2b = 1.0 / (2.0 * bound)

    def axis(ax):
        p = rays_o[:, ax:ax + 1] + ts * rays_d[:, ax:ax + 1]
        g = (p * inv2b + 0.5) * H - 0.5
        b = jnp.clip(jnp.floor(g), 0.0, H - 2.0)
        return b.astype(jnp.int32), g - b

    bx, fx = axis(0)
    by, fy = axis(1)
    bz, fz = axis(2)
    base = (bx * H + by) * H + bz                      # [N, K]
    rows = jnp.take(dens8, base.reshape(-1), axis=0)   # [N*K, 8]
    rows = rows.astype(jnp.float32)   # bf16 table: cast after the gather
    wx = jnp.stack([1.0 - fx, fx], -1).reshape(-1, 2)
    wy = jnp.stack([1.0 - fy, fy], -1).reshape(-1, 2)
    wz = jnp.stack([1.0 - fz, fz], -1).reshape(-1, 2)
    w = (wx[:, :, None, None] * wy[:, None, :, None]
         * wz[:, None, None, :]).reshape(-1, 8)
    return jnp.sum(rows * w, -1).reshape(ts.shape)     # [N, K]


def render_rays_proxy(field_fn, dens8, rays_o, rays_d, nears, fars,
                      cfg: RenderConfig, *, bg_color=1.0, anchor_fn=None,
                      deferred_fns=None):
    """Proposal-style inference: proxy-density importance selection over a
    per-ray span grid, exact compositing over the survivor pool.

    The reference reaches the same goal (few network evals per ray) with
    an alive-ray loop + per-step compaction and a host sync per iteration
    (nerf/renderer.py:459-485); here survivor selection is one fixed-shape
    pass and the network never sees a dead sample.

    nears/fars must be the (conservative) prepass span; rays without a
    span composite to pure background."""
    N = rays_o.shape[0]
    cap = cfg.infer_color_cap

    def proxy_pass(t_lo, t_hi, K):
        """K proxy samples over [t_lo, t_hi]: (ts, dts, w, trans)."""
        span = jnp.maximum(t_hi - t_lo, 0.0)
        dts = span / K                                 # [N]
        frac = (jnp.arange(K, dtype=rays_o.dtype) + 0.5) / K
        ts = t_lo[:, None] + span[:, None] * frac      # [N, K]
        sig_p = _proxy_sigma(dens8, rays_o, rays_d, ts, cfg.grid_size,
                             cfg.bound)                # [N, K] (scaled)
        sdt = sig_p * dts[:, None]
        cs = jnp.cumsum(sdt, -1)
        trans = jnp.exp(-(cs - sdt))
        w = trans * (1.0 - jnp.exp(-sdt))
        w = jnp.where(span[:, None] > 0, w, 0.0)
        return ts, dts, w, trans, sdt

    # round 1: coarse sweep of the whole prepass span; round 2 re-runs
    # the (cheap) proxy over just the weight-bearing window, so the
    # final sample spacing resolves a sharp surface even when the
    # prepass span is long (a solid object's full chord).
    # proxy_samples=0 skips round 1 (single-round mode: the prepass
    # spans are already tight once the grid has carved).
    K1 = cfg.proxy_samples
    if K1 == 0:
        t_lo, t_hi = nears, fars
        any_act = fars > nears
    else:
        ts1, dts1, w1, tr1, _ = proxy_pass(nears, fars, K1)
        act = w1 > jnp.maximum(cfg.infer_w_eps, 1e-4)
        any_act = jnp.any(act, -1)
        first = jnp.argmax(act, -1)
        last = K1 - 1 - jnp.argmax(act[:, ::-1], -1)
        step1 = 2.0 * dts1       # 2-step margin: grazing rays' weight
        t_lo = jnp.where(any_act,  # tails extend past the active samples
                         jnp.take_along_axis(ts1, first[:, None],
                                             -1)[:, 0] - step1, nears)
        t_hi = jnp.where(any_act,
                         jnp.take_along_axis(ts1, last[:, None],
                                             -1)[:, 0] + step1, nears)
        t_lo = jnp.maximum(t_lo, nears)
        t_hi = jnp.minimum(t_hi, fars)

    K = cfg.proxy_refined
    if cfg.proxy_pallas and K1 == 0:
        # fused survivor selection: ONE Pallas program replaces the
        # cumsum/top_k/argsort/take_along_axis chain below (each a
        # ~10 ms-class op at frame scale).  Identical semantics --
        # see ops/proxy_select.py and tests/test_proxy_select.py.
        from ..ops.proxy_select import proxy_select, proxy_select_cdf

        span = jnp.maximum(t_hi - t_lo, 0.0)
        dts = span / K
        frac = (jnp.arange(K, dtype=rays_o.dtype) + 0.5) / K
        ts = t_lo[:, None] + span[:, None] * frac
        sig_p = _proxy_sigma(dens8, rays_o, rays_d, ts, cfg.grid_size,
                             cfg.bound)
        cap_eff = min(cap, K)
        if cfg.infer_cdf:
            ts2, dt2, valid2 = proxy_select_cdf(
                ts, sig_p, t_lo, t_hi, cap=cap_eff,
                w_eps=float(cfg.infer_w_eps))
            return _proxy_tail(field_fn, rays_o, rays_d, nears, fars,
                               t_lo, dts, ts2, jnp.zeros_like(ts2),
                               valid2, cap_eff, cfg, bg_color=bg_color,
                               anchor_fn=anchor_fn, any_act=any_act,
                               dt2=dt2, deferred_fns=deferred_fns)
        ts2, skip2, valid2 = proxy_select(
            ts, sig_p, t_lo, t_hi, cap=cap_eff,
            w_eps=float(cfg.infer_w_eps))
        return _proxy_tail(field_fn, rays_o, rays_d, nears, fars, t_lo,
                           dts, ts2, skip2, valid2, cap_eff, cfg,
                           bg_color=bg_color, anchor_fn=anchor_fn,
                           any_act=any_act, deferred_fns=deferred_fns)
    if cfg.infer_cdf and K1 == 0:
        # single-round mode without the Pallas kernel cannot honor the
        # flag -- a silently different sampling algorithm would run
        # (ADVICE r4).  In two-round mode (proxy_samples > 0) infer_cdf
        # is documented as not applicable (the refined second round has
        # its own placement), so no warning there: the DEFAULT config
        # would otherwise warn on every trace.
        import warnings
        warnings.warn(
            "infer_cdf=True requires proxy_pallas; falling back to the "
            "XLA top-k survivor chain (different sampling algorithm).",
            stacklevel=2)
    ts, dts, w_p, trans_p, sdt_p = proxy_pass(t_lo, t_hi, K)
    valid = (t_hi - t_lo)[:, None] > 0
    # Survivor selection: the per-ray TOP-`cap` samples by proxy weight
    # (t order preserved).  A rank-by-arrival cap would fill up on the
    # low-grade haze the density grid's EMA(max) keeps in front of the
    # surface and never reach it; top-k is robust to that floor.
    w_sel = jnp.where(valid, w_p, 0.0)
    kth = jax.lax.top_k(w_sel, min(cap, K))[0][:, -1]  # [N]
    cand = valid & (w_p >= kth[:, None]) & (w_p > cfg.infer_w_eps)
    rank = jnp.cumsum(cand.astype(jnp.int32), -1) - 1  # tie overflow only
    keep = cand & (rank < cap)                         # [N, K]
    # proxy optical depth of the samples NOT selected: re-injected into
    # the exact composite as extra attenuation so dropping low-weight
    # haze does not brighten what lies behind it (its own radiance goes
    # to the background term via 1 - weights_sum)
    skip_sdt = jnp.where(keep | ~valid, 0.0, sdt_p)
    skip_excl = jnp.cumsum(skip_sdt, -1) - skip_sdt    # [N, K] exclusive

    # Survivor slots as a dense [N, cap] grid (per-ray row-local argsort
    # over K; slots keep t order, invalid slots pad the row's tail).
    # Compared to a global [N*K] argsort + segmented composite this
    # removes the big sort, all offset/segment machinery, and every
    # per-sample gather -- ray quantities broadcast along the cap axis.
    cap_eff = min(cap, K)
    src = jnp.argsort(~keep, axis=-1, stable=True)[:, :cap_eff]  # [N, cap]
    # one gather for (ts, skip, keep) instead of three (each
    # take_along_axis costs ~20 ms at this scale)
    packed = jnp.stack([ts, skip_excl, keep.astype(ts.dtype)], axis=1)
    sel = jnp.take_along_axis(packed, src[:, None, :], axis=-1)
    ts2, skip2 = sel[:, 0], sel[:, 1]                  # [N, cap]
    valid2 = sel[:, 2] > 0.5
    return _proxy_tail(field_fn, rays_o, rays_d, nears, fars, t_lo, dts,
                       ts2, skip2, valid2, cap_eff, cfg,
                       bg_color=bg_color, anchor_fn=anchor_fn,
                       any_act=any_act, deferred_fns=deferred_fns)


def _proxy_tail(field_fn, rays_o, rays_d, nears, fars, t_lo, dts, ts2,
                skip2, valid2, cap_eff: int, cfg: RenderConfig, *,
                bg_color, anchor_fn, any_act, dt2=None,
                deferred_fns=None):
    """Exact field eval + composite over the [N, cap] survivor slots
    (shared by the XLA and Pallas survivor-selection paths)."""
    N = rays_o.shape[0]
    x2 = jnp.clip(rays_o[:, None, :] + ts2[..., None] * rays_d[:, None, :],
                  -cfg.bound, cfg.bound)               # [N, cap, 3]
    d2 = jnp.broadcast_to(rays_d[:, None, :], x2.shape)

    if deferred_fns is not None:
        # deferred (per-RAY) shading, the SNeRG move: stage 1 yields
        # sigma + a flat shading-feature row per sample; the composite
        # weights average the FEATURES, and stage 2 shades once per ray
        # (view dir is constant along a ray, so only the feature
        # nonlinearity differs from per-sample shading -- measured
        # PSNR-neutral at cap 5 on the bench scene).
        s1, s2 = deferred_fns
        if anchor_fn is not None and cfg.anchor_per_sample:
            frames2 = anchor_fn(rays_o, rays_d, x2.reshape(-1, 3),
                                (valid2 & any_act[:, None]).reshape(-1))
        else:
            frames2 = None
        sigma_f, feat = s1(x2.reshape(-1, 3), frames2)
        sigma2 = sigma_f.reshape(N, cap_eff) * cfg.density_scale
        seg2 = dts[:, None] if dt2 is None else dt2
        sdt2 = jnp.where(valid2, sigma2 * seg2, 0.0)
        cs2 = jnp.cumsum(sdt2, axis=-1)
        trans2 = jnp.exp(-(cs2 - sdt2 + jnp.where(valid2, skip2, 0.0)))
        w2 = jnp.where(valid2, trans2 * (1.0 - jnp.exp(-sdt2)), 0.0)
        wsum = jnp.sum(w2, axis=-1)
        fbar = jnp.sum(w2[..., None] * feat.reshape(N, cap_eff, -1),
                       axis=1) / jnp.maximum(wsum, 1e-6)[:, None]
        rgb_ray = s2(fbar, rays_d)
        image = wsum[:, None] * rgb_ray \
            + (1.0 - wsum)[:, None] * jnp.asarray(bg_color)
        dep = jnp.sum(w2 * ts2, axis=-1)
        denom = jnp.where(fars > nears, fars - nears, 1.0)
        depth = jnp.clip(dep - nears, 0.0, None) / denom
        return {"image": image, "depth": depth, "weights_sum": wsum,
                "counts": jnp.sum(valid2.astype(jnp.int32), -1)}

    if anchor_fn is not None and cfg.anchor_per_sample:
        # per-sample anchors (see RenderConfig.anchor_per_sample): the
        # same deterministic chart as training
        frames2 = anchor_fn(rays_o, rays_d, x2.reshape(-1, 3),
                            (valid2 & any_act[:, None]).reshape(-1))
        out = field_fn(x2.reshape(-1, 3), d2.reshape(-1, 3), frames2)
    elif anchor_fn is not None:
        # seed the per-ray anchor at the FIRST SURVIVOR sample, exactly
        # like training / the pool path seed at the first marched
        # (occupied-cell) sample.  Seeding at the window start
        # (t_lo + dts/2, i.e. the dilated prepass ENTRY, 1-3 grid cells
        # before the surface) picks a different anchor-table cell than
        # training did, whose slightly rotated tangent frame shifts
        # p_sur by several fine-feature cells and decorrelates the
        # learned features (measured -6 dB on the curved flagship:
        # scripts/_dbg_render_ab.py round 4, proxy 16.1 vs pool 22.8,
        # invariant to cap/selection/k -- the seed was the bug).
        t_seed = jnp.where(valid2[:, 0], ts2[:, 0], t_lo + 0.5 * dts)
        x_seed = jnp.clip(rays_o + t_seed[:, None] * rays_d,
                          -cfg.bound, cfg.bound)
        frames = anchor_fn(rays_o, rays_d, x_seed, any_act)
        frames2 = jax.tree.map(
            lambda a: jnp.broadcast_to(
                a[:, None], (N, cap_eff) + a.shape[1:]).reshape(
                    (N * cap_eff,) + a.shape[1:]), frames)
        out = field_fn(x2.reshape(-1, 3), d2.reshape(-1, 3), frames2)
    else:
        out = field_fn(x2.reshape(-1, 3), d2.reshape(-1, 3))
    if isinstance(out, tuple):
        sigma2, rgb2 = out[0], out[1]
    else:
        raise ValueError("proxy mode needs field_fn -> (sigma, rgb)")
    sigma2 = sigma2.reshape(N, cap_eff) * cfg.density_scale
    rgb2 = rgb2.reshape(N, cap_eff, 3)

    # exact front-to-back composite over the slots; `skip2` adds the
    # proxy optical depth of the dropped in-between samples so the
    # transmittance seen by each survivor matches the full integral
    seg2 = dts[:, None] if dt2 is None else dt2
    sdt2 = jnp.where(valid2, sigma2 * seg2, 0.0)
    cs2 = jnp.cumsum(sdt2, axis=-1)
    trans2 = jnp.exp(-(cs2 - sdt2 + jnp.where(valid2, skip2, 0.0)))
    w2 = jnp.where(valid2, trans2 * (1.0 - jnp.exp(-sdt2)), 0.0)

    image = jnp.sum(w2[..., None] * rgb2, axis=1)      # [N, 3]
    wsum = jnp.sum(w2, axis=-1)
    dep = jnp.sum(w2 * ts2, axis=-1)
    image = image + (1.0 - wsum)[..., None] * jnp.asarray(bg_color)
    denom = jnp.where(fars > nears, fars - nears, 1.0)
    depth = jnp.clip(dep - nears, 0.0, None) / denom
    return {"image": image, "depth": depth, "weights_sum": wsum,
            "counts": jnp.sum(valid2.astype(jnp.int32), -1)}


def occupied_aabb(occ, grid_size: int, cascades: int, bound: float,
                  margin: float = 0.0):
    """Tight world AABB of the occupied cells (host-side).

    The occupancy grid is usually a thin shell inside [-bound, bound]^3;
    marching/evaluating against the tight box instead of the full cube
    lets render_image drop whole background chunks and shortens every
    surviving ray's [near, far] span.  Returns None when nothing is
    occupied yet."""
    import numpy as np

    g = np.asarray(occ).reshape(cascades, grid_size, grid_size, grid_size)
    lo = np.full(3, np.inf)
    hi = np.full(3, -np.inf)
    for lvl in range(cascades):
        idx = np.argwhere(g[lvl])
        if idx.size == 0:
            continue
        mb = min(2.0 ** lvl, bound)
        lo = np.minimum(lo, (idx.min(0) / grid_size * 2.0 - 1.0) * mb)
        hi = np.maximum(hi, ((idx.max(0) + 1) / grid_size * 2.0 - 1.0) * mb)
    if not np.isfinite(lo).all():
        return None
    # occupancy cannot exist outside [-bound, bound]; clamping keeps the
    # culled render's [near, far] identical to the un-culled paths when
    # the grid is fully occupied
    return np.concatenate([np.clip(lo - margin, -bound, bound),
                           np.clip(hi + margin, -bound, bound)]
                          ).astype(np.float32)


@jax.jit
def _aabb_hits(rays_o, rays_d, aabb):
    nears, fars = near_far_from_aabb(rays_o, rays_d, aabb, 0.0)
    return fars > nears


@partial(jax.jit, static_argnames=("grid_size", "n_steps", "block",
                                   "margin_steps"))
def _occ_ray_hits(rays_o, rays_d, occ_dil, aabb, bound: float,
                  min_near: float, grid_size: int, n_steps: int = 64,
                  block: int = 131072, margin_steps: float = 0.0):
    """Coarse whole-frame ray-vs-occupancy prepass.

    Samples n_steps points along each ray's [near, far] span inside the
    occupied AABB and tests them against a DILATED occupancy grid (the
    3^3 dilation guarantees a thin shell cannot fall between samples).
    One launch for the whole frame; lax.map blocks bound the [*, S, 3]
    intermediate.  rays must be padded to a multiple of `block`.

    Returns (hit [n] bool, t0 [n], t1 [n]): conservative entry/exit of
    the occupied span along each live ray (0 on misses).
    """
    H = grid_size

    def body(args):
        o, d = args
        nears, fars = near_far_from_aabb(o, d, aabb, min_near)
        live = fars > nears
        step = (fars - nears) / n_steps                    # [B]
        frac = (jnp.arange(n_steps, dtype=o.dtype) + 0.5) / n_steps
        t = nears[:, None] + (fars - nears)[:, None] * frac[None]
        # SoA per-axis coordinate math (docs/PERF.md "layout trap")
        inv2b = H / (2.0 * bound)
        cl = lambda ax: jnp.clip(
            ((o[:, ax:ax + 1] + t * d[:, ax:ax + 1] + bound)
             * inv2b).astype(jnp.int32), 0, H - 1)
        flat = (cl(0) * H + cl(1)) * H + cl(2)
        occ_s = occ_dil[flat] > 0                          # [B, S]
        hit = live & jnp.any(occ_s, axis=-1)
        first = jnp.argmax(occ_s, axis=-1).astype(o.dtype)
        last = (n_steps - 1
                - jnp.argmax(occ_s[:, ::-1], axis=-1).astype(o.dtype))
        t0 = jnp.where(hit, jnp.maximum(
            nears + (first - margin_steps) * step, nears), 0.0)
        t1 = jnp.where(hit, nears + (last + 1.0 + margin_steps) * step,
                       0.0)
        return hit, t0, t1

    n = rays_o.shape[0]
    ro = rays_o.reshape(n // block, block, 3)
    rd = rays_d.reshape(n // block, block, 3)
    hit, t0, t1 = jax.lax.map(body, (ro, rd))
    return hit.reshape(n), t0.reshape(n), t1.reshape(n)


def _prepass_salt_filter(occ_np, grid_size: int, min_cells: int,
                         strong_np=None):
    """Remove salt noise from the binary PREPASS occupancy (host-side;
    runs once per occupancy refresh, cached by `_occ_prepass_arrays`).

    Unconverged far-field density spikes come in two shapes (measured on
    the 800^2 bench sphere state): isolated blobs, and faint ARMS
    connected to the real content through single-cell bridges -- together
    they made 76% of the frame "live" vs the sphere's 17% true
    silhouette.  The filter is a morphological opening with limited
    geodesic reconstruction:

      core = erode(occ) components >= min_cells     (breaks the bridges)
      keep = reconstruct(core within occ, 3 rounds) (re-attaches the
             shell margin the erosion shaved)       | strong

    `strong_np` (cells whose density is far above the march threshold,
    i.e. unambiguously real content) is always kept, so thin-but-dense
    structures survive even where the opening would erase them.  At
    grid_size < 64 the erosion would eat legitimately-thin shells, so
    only the component filter runs."""
    import numpy as np

    try:
        from scipy import ndimage
    except Exception:                        # noqa: BLE001
        return occ_np
    S = np.ones((3, 3, 3), np.uint8)
    g = occ_np.reshape(grid_size, grid_size, grid_size) > 0
    if grid_size >= 64:
        core = ndimage.binary_erosion(g, S)
    else:
        core = g
    labels, n = ndimage.label(core, structure=S)
    if n > 1:
        sizes = np.bincount(labels.reshape(-1))
        sizes[0] = 0
        core = (sizes >= min_cells)[labels] & core
    keep = core
    for _ in range(3):
        keep = ndimage.binary_dilation(keep, S) & g
    if strong_np is not None:
        keep |= strong_np.reshape(g.shape) & g
    return keep.astype(np.uint8).reshape(occ_np.shape)


def _dilate_occ(occ_np, grid_size: int, cascades: int):
    """Host-side 3^3 max-pool of cascade 0 (numpy, ~ms at 128^3)."""
    import numpy as np

    g = occ_np.reshape(cascades, grid_size, grid_size, grid_size)[0]
    d = g.copy()
    for ax in range(3):
        d = np.maximum(d, np.roll(d, 1, axis=ax))
        d = np.maximum(d, np.roll(d, -1, axis=ax))
    return d.reshape(-1)


# Per-occupancy prepass cache: the grid only changes on a refresh, while
# render_image runs per frame -- without this every frame would fetch the
# grid to host, re-dilate it, and re-upload (multi-MB tunnel round trips).
_PREPASS_CACHE: dict = {}


def _occ_prepass_arrays(occ, cfg: RenderConfig, density=None,
                        mean_density=None):
    """(aabb [6] np or None, dilated occ on device or None), cached by
    occupancy-array identity.

    When the density grid is available, the PREPASS occupancy uses a
    stronger threshold ``max(march_thresh, prepass_thresh_scale * mean)``:
    the EMA(max)-biased grid keeps a few percent of empty cells at
    densities just above the march threshold (salt noise), and after
    dilation those make every ray "live" and stretch the [t0, t1] spans
    to noise-to-noise.  Real content sits orders of magnitude above the
    mean; the march itself still uses the raw grid (reference parity)."""
    import numpy as np

    # cache key: both source-array identities plus every cfg field the
    # cached (aabb, occ_dil) depends on -- id(occ) alone would silently
    # reuse a prepass built for a different cfg or without the density
    # threshold grid
    key = (id(occ), id(density), cfg.cascades, cfg.grid_size, cfg.bound,
           cfg.density_thresh, cfg.prepass_thresh_scale,
           cfg.prepass_min_component, cfg.prepass_strong_alpha)
    ent = _PREPASS_CACHE.get(key)
    if ent is not None and ent[0] is occ and ent[1] is density:
        return ent[2], ent[3]
    occ_np = np.asarray(occ)
    if density is not None and cfg.cascades == 1:
        # fetch then slice in numpy: density[0] on device is a one-off
        # slice+squeeze program (cascades == 1, so the bytes are the same)
        dens0_np = np.asarray(density)[0]
        mean = (float(mean_density) if mean_density is not None
                else float(np.mean(np.clip(dens0_np, 0.0, None))))
        march_thresh = min(mean, cfg.density_thresh)
        # clamp: prepass_thresh_scale * mean can exceed the march
        # threshold by orders of magnitude on scenes whose mean density
        # is dominated by a bright surface; capping at 4x march_thresh
        # bounds how much faint-but-real content (between march_thresh
        # and the prepass threshold) the prepass may cull to background
        pre_thresh = min(max(march_thresh,
                             cfg.prepass_thresh_scale * mean),
                         4.0 * march_thresh)
        occ_np = (dens0_np > pre_thresh).astype(np.uint8)
        cell = 2.0 * cfg.bound / cfg.grid_size
        strong_np = dens0_np > max(cfg.prepass_strong_alpha / cell,
                                   pre_thresh)
    else:
        strong_np = None
    if cfg.prepass_min_component > 1 and cfg.cascades == 1:
        occ_np = _prepass_salt_filter(occ_np, cfg.grid_size,
                                      cfg.prepass_min_component,
                                      strong_np=strong_np)
    aabb_np = occupied_aabb(occ_np, cfg.grid_size, cfg.cascades, cfg.bound,
                            margin=2.0 * cfg.bound / cfg.grid_size)
    occ_dil = (jnp.asarray(_dilate_occ(occ_np, cfg.grid_size, 1))
               if aabb_np is not None and cfg.cascades == 1 else None)
    if len(_PREPASS_CACHE) >= 8:
        _PREPASS_CACHE.clear()
    _PREPASS_CACHE[key] = (occ, density, aabb_np, occ_dil)
    return aabb_np, occ_dil


@partial(jax.jit, static_argnames=("field_apply", "field_static", "cfg",
                                   "anchor_apply", "sigma_apply",
                                   "color_apply", "deferred_apply"))
def _render_chunk(field_apply, field_static, params, occ, rays_o, rays_d,
                  bg_color, cfg: RenderConfig, anchor_apply=None,
                  aabb=None, nears=None, fars=None, sigma_apply=None,
                  color_apply=None, dens8=None, deferred_apply=None):
    """One fixed-shape inference chunk; compiled once per (model, config)."""
    if anchor_apply is not None:
        fn = lambda x, d, f: field_apply(params, x, d, field_static, f)
        anchor = lambda o, d, xs, sv: anchor_apply(params, o, d, xs, sv,
                                                   field_static)
        sfn = (None if sigma_apply is None else
               lambda x, d, f: sigma_apply(params, x, d, field_static, f))
        cfn = (None if color_apply is None else
               lambda x, d, a, f: color_apply(params, x, d, a,
                                              field_static, f))
    else:
        fn = lambda x, d: field_apply(params, x, d, field_static)
        anchor = None
        sfn = (None if sigma_apply is None else
               lambda x, d: sigma_apply(params, x, d, field_static))
        cfn = (None if color_apply is None else
               lambda x, d, a: color_apply(params, x, d, a, field_static))
    dfn = None
    if deferred_apply is not None:
        dfn = (lambda x, f: deferred_apply[0](params, x, field_static, f),
               lambda fb, d: deferred_apply[1](params, fb, d,
                                               field_static))
    if dens8 is not None and nears is not None and fars is not None:
        out = render_rays_proxy(fn, dens8, rays_o, rays_d, nears, fars,
                                cfg, bg_color=bg_color, anchor_fn=anchor,
                                deferred_fns=dfn)
        return out["image"], out["depth"], out["weights_sum"]
    out = render_rays(
        fn, occ, rays_o, rays_d, cfg, max_samples=cfg.max_samples_infer,
        bg_color=bg_color, anchor_fn=anchor, aabb=aabb,
        nears=nears, fars=fars,
        march_steps=cfg.march_steps_infer or None, sigma_fn=sfn,
        color_fn=cfn,
        pool_mean=(cfg.pool_mean_samples_infer
                   if cfg.pool_mean_samples else 0))
    return out["image"], out["depth"], out["weights_sum"]


_DENS8_CACHE: dict = {}


def _dens8_cached(density, cfg: RenderConfig):
    """Proxy corner table for cascade 0, cached per density-array identity
    (the density grid only changes on an occupancy refresh)."""
    if density is None or cfg.cascades != 1 or cfg.infer_mode != "proxy":
        return None
    key = (id(density), cfg.proxy_bf16)
    ent = _DENS8_CACHE.get(key)
    if ent is not None and ent[0] is density:
        return ent[1]
    dens8 = density_corner_table(density, cfg.grid_size,
                                 bf16=cfg.proxy_bf16)
    if len(_DENS8_CACHE) >= 4:
        _DENS8_CACHE.clear()
    _DENS8_CACHE[key] = (density, dens8)
    return dens8


@jax.jit
def _chunk_take(rays_o, rays_d, idx):
    return jnp.take(rays_o, idx, axis=0), jnp.take(rays_d, idx, axis=0)


@jax.jit
def _chunk_take1(a, idx):
    return jnp.take(a, idx, axis=0)


@jax.jit
def _chunk_take2(a, b, idx):
    return jnp.take(a, idx, axis=0), jnp.take(b, idx, axis=0)


@jax.jit
def _chunk_scatter(image, depth, wsum, idx, img, dep, w):
    """Scatter one chunk's results into the frame (fixed [chunk] shapes;
    padded rows duplicate a live ray and rewrite identical values)."""
    return (image.at[idx].set(img), depth.at[idx].set(dep),
            wsum.at[idx].set(w))


def _max3x3(x):
    """3x3 neighborhood max of a 2D map (edge-padded, no wraparound)."""
    for ax in (0, 1):
        lo = jnp.concatenate([x[:1], x[:-1]] if ax == 0
                             else [x[:, :1], x[:, :-1]], axis=ax)
        hi = jnp.concatenate([x[1:], x[-1:]] if ax == 0
                             else [x[:, 1:], x[:, -1:]], axis=ax)
        x = jnp.maximum(x, jnp.maximum(lo, hi))
    return x


@partial(jax.jit, static_argnames=("grid_size", "block", "margin_steps",
                                   "H", "W", "Hb", "Wb", "B", "nb",
                                   "tau_cull", "tau_samples"))
def _prepass_compact(ro_b, rd_b, occ_dil, aabb, bound, min_near, *,
                     grid_size: int, block: int, margin_steps: float,
                     H: int, W: int, Hb: int, Wb: int, B: int, nb: int,
                     dens8=None, tau_cull: float = 0.0,
                     tau_samples: int = 32):
    """Prepass + live compaction in ONE device program (one dispatch).

    Takes the UNPADDED [nb, 3] block rays; padding to the lax.map block
    multiple happens inside the program (eager, the two concatenate +
    broadcast pairs were 4 extra one-off compiles and 4 per-frame
    dispatches).

    With `dens8` + `tau_cull` > 0, a second carve pass drops rays whose
    whole [t0, t1] span composites below tau_cull alpha under the PROXY
    density (round-3 finding: the dilated-occupancy hit test keeps the
    geometric silhouette of the occupied SHELL, ~2.3x the visible
    silhouette on the bench sphere, and every over-live ray pays the
    full per-ray render cost).  Safe by construction: the EMA(max)
    density grid OVERestimates sigma, so proxy alpha >= true alpha, and
    the 3x3 block-neighborhood max absorbs sub-block ray divergence the
    same way the grid dilation does for the hit test."""
    npad = _round_up(nb, block)
    if npad > nb:
        ro_b = jnp.concatenate(
            [ro_b, jnp.broadcast_to(ro_b[:1], (npad - nb, 3))])
        rd_b = jnp.concatenate(
            [rd_b, jnp.broadcast_to(rd_b[:1], (npad - nb, 3))])
    hit, t0, t1 = _occ_ray_hits(ro_b, rd_b, occ_dil, aabb, bound,
                                min_near, grid_size, block=block,
                                margin_steps=margin_steps)
    if dens8 is not None and tau_cull > 0.0 and B > 1:
        K = tau_samples
        # the tau sweep is the prepass's dominant cost (K x nb width-8
        # proxy gathers); only HIT blocks need it, so sweep the first
        # TAUB blocks of the hit-first ordering and treat any live
        # block beyond the cap conservatively (kept, full-span window).
        # On a trained bench scene ~29% of blocks hit, so 4096 of 10K
        # covers everything; early training (everything live) just
        # degrades to no cull for the uncovered tail.
        TAUB = min(4096, nb)
        bidx = jnp.argsort(~hit[:nb], stable=True)[:TAUB] \
            .astype(jnp.int32)
        ro_c = jnp.take(ro_b, bidx, axis=0)
        rd_c = jnp.take(rd_b, bidx, axis=0)
        t0_c = jnp.take(t0, bidx)
        t1_c = jnp.take(t1, bidx)
        span = jnp.maximum(t1_c - t0_c, 0.0)
        dt = span / K
        frac = (jnp.arange(K, dtype=ro_b.dtype) + 0.5) / K
        ts = t0_c[:, None] + span[:, None] * frac
        sig = _proxy_sigma(dens8, ro_c, rd_c, ts, grid_size, bound)
        sdt = sig * dt[:, None]
        alpha_c = 1.0 - jnp.exp(-jnp.sum(sdt, -1))
        covered = jnp.zeros((nb,), bool).at[bidx].set(True)
        alpha = jnp.zeros((nb,), ro_b.dtype).at[bidx].set(alpha_c)
        alpha = jnp.where(covered, alpha, 1.0)     # uncovered live: keep
        amap = jnp.where(hit[:nb], alpha, 0.0).reshape(Hb, Wb)
        keep = (_max3x3(amap) > tau_cull).reshape(-1)
        hit = hit.at[:nb].set(hit[:nb] & keep)
        # window refinement: the same K proxy samples bound the
        # alpha-bearing interval of each block ray, so the per-ray
        # refined sweep downstream resolves the surface over a span
        # ~the shell thickness instead of the whole dilated-occupancy
        # chord (fewer/finer samples at equal quality).  Conservative
        # like the cull: EMA(max) proxy density over-estimates alpha
        # (optical depth below 1e-4/sample contributes < 1e-4 weight),
        # windows widen by a 2-sample margin, each block adopts the
        # 3x3-neighborhood union to absorb sub-block ray divergence,
        # and uncovered/inactive blocks contribute their FULL span.
        act = sdt > 1e-4
        any_act_c = jnp.any(act, -1)
        first = jnp.argmax(act, -1)
        last = K - 1 - jnp.argmax(act[:, ::-1], -1)
        t_lo_c = jnp.take_along_axis(ts, first[:, None], -1)[:, 0] \
            - 2.0 * dt
        t_hi_c = jnp.take_along_axis(ts, last[:, None], -1)[:, 0] \
            + 2.0 * dt
        t_lo_c = jnp.where(any_act_c, t_lo_c, t0_c)
        t_hi_c = jnp.where(any_act_c, t_hi_c, t1_c)
        t_lo = t0[:nb].at[bidx].set(t_lo_c)        # uncovered: own t0/t1
        t_hi = t1[:nb].at[bidx].set(t_hi_c)
        big = jnp.asarray(3.4e38, ro_b.dtype)
        # blocks with no alpha anywhere in the sweep would contribute a
        # degenerate window; exclude them from the union unless they
        # are uncovered (conservative full span)
        active = jnp.zeros((nb,), bool).at[bidx].set(any_act_c)
        ok = hit[:nb] & (active | ~covered)
        lo_map = jnp.where(ok, t_lo, big).reshape(Hb, Wb)
        hi_map = jnp.where(ok, t_hi, -big).reshape(Hb, Wb)
        lo3 = -_max3x3(-lo_map)
        hi3 = _max3x3(hi_map)
        has_nb = (hi3 > -big).reshape(-1)  # any active ray in 3x3 patch
        t0_r = jnp.where(has_nb, jnp.maximum(t0[:nb], lo3.reshape(-1)),
                         t0[:nb])
        t1_r = jnp.where(has_nb, jnp.minimum(t1[:nb], hi3.reshape(-1)),
                         t1[:nb])
        t0 = t0.at[:nb].set(t0_r)
        t1 = t1.at[:nb].set(jnp.maximum(t1_r, t0_r))
    perm, count = _live_permutation(hit, H=H, W=W, Hb=Hb, Wb=Wb, B=B,
                                    nb=nb)
    return perm, count, t0, t1


def _tau_samples(cfg: RenderConfig, aabb_np) -> int:
    """Tau-carve sample count scaled to the occupied AABB's diagonal.

    A FIXED count undersamples long spans: a thin occupied shell can
    fall between samples on every ray of a block neighborhood and a
    true hit gets culled (ADVICE r4).  Scaling so the worst-case sample
    spacing stays <= 1.5 cells guarantees any >= 1-cell structure
    contributes (the trilinear tent of one cell spans 2 cells).
    Quantized to 32s so occupancy-refresh AABB jitter doesn't recompile
    the prepass."""
    import math as _math

    import numpy as _np

    diag = float(_np.linalg.norm(aabb_np[3:] - aabb_np[:3]))
    diag_cells = diag * cfg.grid_size / (2.0 * cfg.bound)
    return int(min(160, max(cfg.prepass_tau_samples,
                            32 * _math.ceil(diag_cells / 1.5 / 32))))


@partial(jax.jit, static_argnames=("H", "W"))
def _frame_out(image, depth, wsum, *, H: int, W: int):
    """Final frame reshapes in ONE program (eager: 2 one-off compiles and
    3 per-frame dispatches)."""
    return {"image": image.reshape(H, W, 3), "depth": depth.reshape(H, W),
            "weights_sum": wsum.reshape(H, W)}


@partial(jax.jit, static_argnames=("n",))
def _frame_buffer_packed(bg, *, n: int):
    """[n, 5] packed frame accumulator (rgb | depth | wsum).

    One buffer means ONE scatter per chunk instead of three (each
    ~0.4 ms at frame scale) and a smaller while_loop carry; the rgb
    lanes double as the background source for the per-chunk bg gather
    (rays are written at most once, so pre-write reads see the
    background)."""
    bg = jnp.asarray(bg, jnp.float32)
    if bg.size == 3 * n:
        image = bg.reshape(n, 3)
    elif bg.size == 3:
        image = jnp.broadcast_to(bg.reshape(3), (n, 3))
    else:
        image = jnp.full((n, 3), bg.reshape(()))
    return jnp.concatenate([image, jnp.zeros((n, 2))], axis=-1)


@partial(jax.jit, static_argnames=("H", "W"))
def _frame_out_packed(frame, *, H: int, W: int):
    return {"image": frame[:, :3].reshape(H, W, 3),
            "depth": frame[:, 3].reshape(H, W),
            "weights_sum": frame[:, 4].reshape(H, W)}


@partial(jax.jit, static_argnames=("n",))
def _frame_buffers(bg, *, n: int):
    """(image, depth, wsum) frame accumulators in ONE program.

    `bg` is a scalar, an [3] color, or a full [n, 3] background image
    (learned bg sphere); the shape is static under jit so each case is
    its own (tiny) executable.  Eager, this was 3-4 one-off compiles and
    as many per-frame dispatches."""
    bg = jnp.asarray(bg, jnp.float32)
    if bg.size == 3 * n:
        image = bg.reshape(n, 3)
    elif bg.size == 3:
        image = jnp.broadcast_to(bg.reshape(3), (n, 3))
    else:
        image = jnp.full((n, 3), bg.reshape(()))
    return image, jnp.zeros((n,)), jnp.zeros((n,))


@partial(jax.jit, static_argnames=("H", "W", "Hb", "Wb", "B", "nb"))
def _live_permutation(hit_b, *, H: int, W: int, Hb: int, Wb: int,
                      B: int, nb: int):
    """Device-side live-ray compaction: expand block hits to pixels and
    order live pixel indices first (matching the old host np.nonzero's
    contract: perm[:count] enumerates exactly the live pixels).
    Replaces a full-bitmap d2h + host nonzero + per-chunk h2d with one
    device program and ONE scalar fetch (the live count) -- each tunnel
    round-trip is milliseconds-class.

    Fast path (block-aligned frames, H % B == W % B == 0): sort the
    [nb] BLOCK hits and expand each block to its B*B pixel ids
    arithmetically -- the [n]-pixel argsort (a multi-pass O(n log n)
    device sort at 640K rows for an 800^2 frame) collapses to a [10K]
    block sort plus ~4 elementwise ops.  Chunk order becomes
    block-grouped instead of row-major; no consumer depends on the
    order (results scatter by absolute pixel id)."""
    hits_blk = hit_b[:nb]
    if B > 1 and H % B == 0 and W % B == 0:
        bperm = jnp.argsort(~hits_blk, stable=True).astype(jnp.int32)
        bi = bperm // Wb
        bj = bperm % Wb
        d = jnp.arange(B, dtype=jnp.int32)
        pix = ((bi[:, None, None] * B + d[None, :, None]) * W
               + bj[:, None, None] * B + d[None, None, :])   # [nb, B, B]
        count = jnp.sum(hits_blk.astype(jnp.int32)) * (B * B)
        return pix.reshape(-1), count
    hits_blk = hits_blk.reshape(Hb, Wb)
    if B > 1:
        hits = jnp.repeat(jnp.repeat(hits_blk, B, 0), B, 1)[:H, :W]
    else:
        hits = hits_blk
    hits = hits.reshape(-1)
    perm = jnp.argsort(~hits, stable=True).astype(jnp.int32)
    return perm, jnp.sum(hits.astype(jnp.int32))


def _chunk_rays(pose3, intr, idx_c, row0, W: int):
    """Chunk rays computed IN PLACE from (pose, intrinsics) + pixel ids.

    Same math as data.rays._full_frame_rays restricted to the chunk's
    pixels (bitwise-identical per ray: identical elementwise chain and a
    [chunk, 3] @ [3, 3] f32 matmul).  Replaces the whole-frame ray-gen
    program (~10 ms at 800^2 through the tunnel) and two [n]-row
    gathers per chunk with ~10 [chunk]-sized ops.  `row0` offsets the
    pixel row for band-sharded rendering (parallel/eval.py)."""
    fx, fy, cx, cy = intr[0], intr[1], intr[2], intr[3]
    i = (idx_c % W).astype(jnp.float32) + 0.5
    j = (idx_c // W + row0).astype(jnp.float32) + 0.5
    dirs = jnp.stack([(i - cx) / fx, (j - cy) / fy,
                      jnp.ones_like(i)], axis=-1)
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    rd = dirs @ pose3[:, :3].T
    ro = jnp.broadcast_to(pose3[:, 3], rd.shape)
    return ro, rd


def _chunk_body(field_apply, field_static, params, occ, pose3, intr,
                row0, frame, perm, count, start, t0_d, t1_d, dens8,
                aabb, cfg: RenderConfig, *,
                anchor_apply, sigma_apply, color_apply, B: int, W: int,
                Wb: int, chunk: int, deferred_apply=None):
    """Gather-render-scatter for one chunk (traced `start`; shared by the
    per-chunk jit and the whole-frame while_loop).  `frame` is the
    packed [n, 5] accumulator; its rgb lanes still hold the background
    for every unwritten ray, so the chunk's bg gather reads it."""
    pos = start + jnp.arange(chunk, dtype=jnp.int32)
    pos = jnp.minimum(pos, jnp.maximum(count - 1, 0))
    idx_c = jnp.take(perm, pos)
    ro, rd = _chunk_rays(pose3, intr, idx_c, row0, W)
    bg_c = jnp.take(frame, idx_c, axis=0)[:, :3]
    if B > 1:
        idx_b = (idx_c // (W * B)) * Wb + (idx_c % W) // B
    else:
        idx_b = idx_c
    nears = jnp.take(t0_d, idx_b)
    fars = jnp.take(t1_d, idx_b)
    img, dep, w = _render_chunk(
        field_apply, field_static, params, occ, ro, rd, bg_c, cfg,
        anchor_apply=anchor_apply, aabb=aabb, nears=nears, fars=fars,
        sigma_apply=sigma_apply, color_apply=color_apply, dens8=dens8,
        deferred_apply=deferred_apply)
    packed = jnp.concatenate([img, dep[:, None], w[:, None]], axis=-1)
    return frame.at[idx_c].set(packed)


@partial(jax.jit, static_argnames=("field_apply", "field_static", "cfg",
                                   "anchor_apply", "sigma_apply",
                                   "color_apply", "deferred_apply", "B",
                                   "W", "Wb", "chunk"))
def _render_frame_chunks(field_apply, field_static, params, occ,
                         pose3, intr, row0, frame, perm, count,
                         t0_d, t1_d, dens8, aabb,
                         cfg: RenderConfig, *, anchor_apply=None,
                         sigma_apply=None, color_apply=None,
                         deferred_apply=None, B: int,
                         W: int, Wb: int, chunk: int):
    """EVERY chunk of the frame in ONE device program: a dynamic
    `lax.while_loop` over ceil(count / chunk) iterations of the fused
    gather-render-scatter body.

    Replaces the host-side chunk loop (one tunnel dispatch per chunk,
    each milliseconds-class) AND the live-count scalar fetch -- the
    frame becomes a fixed four-dispatch pipeline (ray gen, prepass,
    this, reshape) with no host sync at all, so consecutive frames
    pipeline through the async dispatch queue."""

    def cond(carry):
        c, _ = carry
        return c * chunk < count

    def body(carry):
        c, frame = carry
        frame = _chunk_body(
            field_apply, field_static, params, occ, pose3, intr, row0,
            frame, perm, count, c * chunk, t0_d, t1_d, dens8, aabb,
            cfg, anchor_apply=anchor_apply,
            sigma_apply=sigma_apply, color_apply=color_apply,
            deferred_apply=deferred_apply, B=B, W=W,
            Wb=Wb, chunk=chunk)
        return c + 1, frame

    _, frame = jax.lax.while_loop(cond, body, (jnp.int32(0), frame))
    return frame


@partial(jax.jit, static_argnames=("field_apply", "field_static", "cfg",
                                   "anchor_apply", "sigma_apply",
                                   "color_apply", "deferred_apply", "B",
                                   "W", "Wb", "chunk"))
def _render_chunk_fused(field_apply, field_static, params, occ,
                        pose3, intr, row0, frame, perm, count, start,
                        t0_d, t1_d, dens8, aabb,
                        cfg: RenderConfig, *, anchor_apply=None,
                        sigma_apply=None, color_apply=None,
                        deferred_apply=None, B: int,
                        W: int, Wb: int, chunk: int):
    """Gather-render-scatter for one chunk in ONE device program.

    The unfused loop issued 4 separate programs per chunk (takes,
    render, scatter), each a tunnel dispatch; here the chunk's ray
    compute, span gather, field render, and frame scatter fuse.  `start`
    is traced, so every chunk of every pose reuses one executable."""
    return _chunk_body(
        field_apply, field_static, params, occ, pose3, intr, row0,
        frame, perm, count, start, t0_d, t1_d, dens8, aabb,
        cfg, anchor_apply=anchor_apply,
        sigma_apply=sigma_apply, color_apply=color_apply,
        deferred_apply=deferred_apply, B=B, W=W,
        Wb=Wb, chunk=chunk)


def render_image(field_apply, field_static, params, occ, pose, intrinsics,
                 H: int, W: int, cfg: RenderConfig, *, bg_color=1.0,
                 anchor_apply=None, sigma_apply=None, color_apply=None,
                 density=None, crop_aabb=None, deferred_apply=None):
    """Render a full frame in fixed-size ray chunks (all identical shapes,
    so XLA compiles ONE program reused for every chunk).  Host-side loop,
    device-side everything else.

    Args:
      field_apply: module-level function (params, xyzs, dirs, field_static)
        -> (sigmas, rgbs).  Must be hashable (it is a static jit arg).
      field_static: hashable model config passed through to field_apply.
    """
    import numpy as np

    from ..data.rays import get_rays

    pose3 = jnp.asarray(pose, jnp.float32)[:3]
    intr = jnp.asarray(intrinsics, jnp.float32)
    # full-frame rays are only materialized on the fallback paths; the
    # fused chunk programs compute their own rays from (pose,
    # intrinsics) + pixel ids (_chunk_rays)
    rays = None
    n = H * W
    chunk = min(cfg.ray_chunk, n)

    # live-ray compaction: rays that miss the occupied region composite
    # to pure background, so only the surviving rays are packed into
    # dense chunks and rendered -- the TPU analogue of the reference's
    # alive-ray compaction loop (renderer.py:459-485), but at frame
    # granularity with identically-shaped programs and no per-step host
    # sync.  Only the [n] hit bitmap crosses to the host; results are
    # scattered back on device.
    aabb_np, occ_dil = _occ_prepass_arrays(occ, cfg, density=density)
    if crop_aabb is not None and aabb_np is not None:
        # user inference crop (reference gui.py:677-692 aabb_infer):
        # intersect with the occupancy AABB; ray spans clamp to the box
        crop = np.asarray(crop_aabb, np.float32)
        aabb_np = np.concatenate([np.maximum(aabb_np[:3], crop[:3]),
                                  np.minimum(aabb_np[3:], crop[3:])])
        if (aabb_np[3:] <= aabb_np[:3]).any():
            aabb_np = None           # empty crop: pure background
    dens8 = _dens8_cached(density, cfg)

    if aabb_np is not None:
        aabb = jnp.asarray(aabb_np)
        if occ_dil is not None:
            # silhouette-accurate cull against the dilated occupancy --
            # an AABB alone keeps ~2-3x more rays than actually hit.
            # The prepass runs at one ray per BxB pixel block (~B^2 x
            # cheaper); the grid dilation + t-margin absorb the
            # sub-block ray divergence.
            B = max(1, cfg.prepass_block)
            Hb, Wb = -(-H // B), -(-W // B)
            nb = Hb * Wb
            # host-side intrinsics scaling (a device divide would be a
            # one-off compile + per-frame dispatch for 4 floats)
            intr_b = np.asarray(intrinsics, np.float32) / B
            rays_b = get_rays(jnp.asarray(pose), jnp.asarray(intr_b),
                              Hb, Wb)
            blk = min(131072, _round_up(nb, 8192))
            # fused frame path: prepass + device-side compaction in one
            # program, one program per chunk; the only host sync is the
            # live-count scalar
            perm, count_d, t0_d, t1_d = _prepass_compact(
                rays_b["rays_o"], rays_b["rays_d"], occ_dil, aabb,
                cfg.bound, cfg.min_near,
                grid_size=cfg.grid_size, block=blk,
                margin_steps=(cfg.prepass_margin_steps if B > 1 else 0.0),
                H=H, W=W, Hb=Hb, Wb=Wb, B=B, nb=nb,
                dens8=dens8, tau_cull=cfg.prepass_tau_cull,
                tau_samples=_tau_samples(cfg, aabb_np))
            row0 = jnp.int32(0)
            frame = _frame_buffer_packed(bg_color, n=n)
            if cfg.frame_one_program:
                frame = _render_frame_chunks(
                    field_apply, field_static, params, occ,
                    pose3, intr, row0, frame, perm,
                    count_d, t0_d, t1_d, dens8, aabb,
                    cfg, anchor_apply=anchor_apply,
                    sigma_apply=sigma_apply, color_apply=color_apply,
                    deferred_apply=deferred_apply,
                    B=B, W=W, Wb=Wb, chunk=chunk)
                return _frame_out_packed(frame, H=H, W=W)
            count = int(count_d)
            n_chunks = -(-count // chunk) if count else 0
            for c in range(n_chunks):
                frame = _render_chunk_fused(
                    field_apply, field_static, params, occ,
                    pose3, intr, row0, frame, perm,
                    count_d, jnp.int32(c * chunk), t0_d, t1_d, dens8,
                    aabb, cfg,
                    anchor_apply=anchor_apply, sigma_apply=sigma_apply,
                    color_apply=color_apply,
                    deferred_apply=deferred_apply, B=B, W=W, Wb=Wb,
                    chunk=chunk)
            return _frame_out_packed(frame, H=H, W=W)
        else:
            rays = get_rays(jnp.asarray(pose), jnp.asarray(intrinsics),
                            H, W)
            hits = np.asarray(_aabb_hits(rays["rays_o"], rays["rays_d"],
                                         aabb))
            t0_d = t1_d = None
            B = 1
            Wb = W
        bg_image, depth, wsum = _frame_buffers(bg_color, n=n)
        image = bg_image
        live = np.nonzero(hits)[0]
        if live.size:
            # EVERY device op below uses fixed [chunk] shapes: the live
            # count varies per pose, and any op shaped by it (a take of
            # [n_pad], the result concatenate) would recompile on every
            # novel view (~10 s each through the remote compiler).  The
            # per-chunk programs compile once and are reused for all
            # poses; only the Python chunk count varies.
            n_pad = _round_up(live.size, chunk)
            live_pad = np.concatenate(
                [live, np.full(n_pad - live.size, live[-1])])
            if t0_d is not None and B > 1:
                blk_of_pix = ((live_pad // W // B) * Wb
                              + (live_pad % W) // B)
            else:
                blk_of_pix = live_pad
            for start in range(0, n_pad, chunk):
                idx_c = jnp.asarray(live_pad[start:start + chunk])
                ro_c, rd_c = _chunk_take(rays["rays_o"], rays["rays_d"],
                                         idx_c)
                # bg_image is materialized [n, 3] in every case, so the
                # per-chunk bg is always one fused gather (one program
                # variant instead of per-bg-shape _render_chunk variants)
                bg_c = _chunk_take1(bg_image, idx_c)
                if t0_d is not None:
                    idx_b = jnp.asarray(blk_of_pix[start:start + chunk])
                    nears_c, fars_c = _chunk_take2(t0_d, t1_d, idx_b)
                else:
                    nears_c = fars_c = None
                img, dep, w = _render_chunk(
                    field_apply, field_static, params, occ, ro_c, rd_c,
                    bg_c, cfg, anchor_apply=anchor_apply, aabb=aabb,
                    nears=nears_c, fars=fars_c,
                    sigma_apply=sigma_apply, color_apply=color_apply,
                    dens8=(dens8 if t0_d is not None else None),
                    deferred_apply=deferred_apply)
                image, depth, wsum = _chunk_scatter(
                    image, depth, wsum, idx_c, img, dep, w)
        return _frame_out(image, depth, wsum, H=H, W=W)
    bg_image, depth, wsum = _frame_buffers(bg_color, n=n)
    return _frame_out(bg_image, depth, wsum, H=H, W=W)
