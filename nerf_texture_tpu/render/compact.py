"""Compacted sample pool: evaluate the field only where rays have samples.

The dense [N, K] layout of ``renderer.py`` evaluates the field at every
slot, valid or not; with empty-space skipping typical occupancy is
10-40%, so 60-90% of field evals (the dominant cost -- hash gathers) are
wasted.  This module provides the TPU-native analogue of the reference's
``mean_count``-sized compacted point buffer
(raymarching/raymarching.py:198-203, raymarching.cu:407-419), built
without atomics:

  counts [N] -> exclusive offsets (cumsum) -> flat slot m maps back to
  (ray, sample) by a binary search over offsets -> every flat buffer is a
  GATHER from the [N, K] march result.

Compositing over the flat pool uses segmented exclusive cumsums expressed
as (cumsum + boundary gathers), and the one segment-broadcast whose
autodiff transpose would be a scatter is given a custom VJP that computes
the segment-sum with another cumsum + gather -- the differentiable path
is scatter-free end to end (parameter gradients aside).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.marching import MarchResult


class FlatSamples(NamedTuple):
    ray_id: jax.Array    # [M] int32 owning ray (N for padding slots)
    ts: jax.Array        # [M]
    dts: jax.Array       # [M]
    valid: jax.Array     # [M] bool
    offsets: jax.Array   # [N + 1] int32 segment boundaries (clipped to M)


def flatten_samples(m: MarchResult, budget: int) -> FlatSamples:
    """Compact the valid samples of a MarchResult into a [budget] pool.

    Each ray is capped at its fair share ``budget // N`` of the pool by
    STRIDED DECIMATION: a ray with more valid samples than its cap keeps
    ``cap`` samples spread uniformly over its whole [near, far] span,
    with dt scaled by the stride so optical depth is preserved.  The
    pool can never overflow, and every ray covers its full span even
    when the occupancy grid is still dense.

    (The reference instead packs rays front-to-back into an M-sized
    buffer and marks overflow rays dead, raymarching.cu:418-419 -- with
    a FIXED budget that starves every tail ray of the batch whenever
    the grid is dense, which both cripples early training -- the far
    field never receives gradient, so empty-space density never
    collapses and the grid never prunes -- and renders chunk tails as
    background.)"""
    N, K = m.ts.shape
    cap = max(1, budget // N)
    counts = jnp.minimum(m.counts, cap)              # kept per ray
    # stride >= 1: how many original samples each kept sample represents
    stride = m.counts.astype(m.ts.dtype) / jnp.maximum(counts, 1)
    offsets = jnp.concatenate(
        [jnp.zeros((1,), counts.dtype), jnp.cumsum(counts)])
    offsets = jnp.minimum(offsets, budget)           # [N + 1]
    slot = jnp.arange(budget, dtype=jnp.int32)
    # owning ray: last n with offsets[n] <= m.  Computed by scattering a
    # +1 marker at every segment start and prefix-summing -- a small [N]
    # scatter + one cumsum, ~15x faster on TPU than binary-searching all
    # `budget` slots against the offsets.
    starts = jnp.zeros((budget + 1,), jnp.int32).at[offsets[:-1]].add(
        1, mode="drop")
    ray_id = jnp.cumsum(starts[:budget]) - 1
    valid = slot < offsets[-1]
    ray_safe = jnp.clip(ray_id, 0, N - 1)
    j = slot - offsets[ray_safe]                     # kept-sample index
    src = jnp.floor(j.astype(m.ts.dtype)
                    * stride[ray_safe]).astype(jnp.int32)
    src = jnp.clip(src, 0, K - 1)
    ts = jnp.where(valid, m.ts[ray_safe, src], 0.0)
    dts = jnp.where(valid, m.dts[ray_safe, src] * stride[ray_safe], 0.0)
    return FlatSamples(ray_id=jnp.where(valid, ray_safe, N), ts=ts,
                       dts=dts, valid=valid, offsets=offsets)


def flat_points(rays_o, rays_d, flat: FlatSamples, bound: float):
    """[M, 3] positions and directions for the pool."""
    N = rays_o.shape[0]
    rid = jnp.clip(flat.ray_id, 0, N - 1)
    o = rays_o[rid]
    d = rays_d[rid]
    pos = jnp.clip(o + flat.ts[:, None] * d, -bound, bound)
    return pos, d


# ---------------------------------------------------------------------------
# segment ops (scatter-free, including their backwards)
# ---------------------------------------------------------------------------

def seg_sum(x, offsets):
    """Sum x [M, ...] over segments given by offsets [N+1] -> [N, ...].

    cumsum + boundary gathers; backward is (small) scatter of 2N rows."""
    cs = jnp.cumsum(x, axis=0)
    cs = jnp.concatenate([jnp.zeros_like(cs[:1]), cs], axis=0)
    return cs[offsets[1:]] - cs[offsets[:-1]]


@jax.custom_vjp
def seg_broadcast(values, ray_id, offsets):
    """values [N, ...] -> [M, ...] by ray_id; padding slots get zero.

    The custom VJP computes the transpose (a segment-sum) with
    cumsum + gather instead of the [M]-sized scatter autodiff would emit.
    """
    N = values.shape[0]
    safe = jnp.clip(ray_id, 0, N - 1)
    out = values[safe]
    mask = (ray_id < N)
    if out.ndim > 1:
        mask = mask.reshape(mask.shape + (1,) * (out.ndim - 1))
    return jnp.where(mask, out, 0.0)


def _seg_broadcast_fwd(values, ray_id, offsets):
    return seg_broadcast(values, ray_id, offsets), (ray_id, offsets,
                                                    values.shape[0])


def _seg_broadcast_bwd(res, g):
    ray_id, offsets, N = res
    mask = (ray_id < N)
    if g.ndim > 1:
        mask = mask.reshape(mask.shape + (1,) * (g.ndim - 1))
    g = jnp.where(mask, g, 0.0)
    return seg_sum(g, offsets), None, None


seg_broadcast.defvjp(_seg_broadcast_fwd, _seg_broadcast_bwd)


# ---------------------------------------------------------------------------
# compositing over the flat pool
# ---------------------------------------------------------------------------

class SurvivorPool(NamedTuple):
    """Second-level compaction: the pool slots whose compositing weight
    survives the termination threshold (the TPU analogue of the
    reference's T < 1e-4 ray kill, raymarching.cu:1021-1113, applied at
    sample granularity in one pass instead of an alive-ray loop)."""

    idx: jax.Array      # [M2] source slot in the parent pool
    ray_id: jax.Array   # [M2] owning ray (N for padding)
    valid: jax.Array    # [M2]
    offsets: jax.Array  # [N + 1] segment boundaries


def survivor_pool(flat: FlatSamples, w, n_rays: int, cap: int,
                  w_eps: float, trans=None, t_eps: float = 1e-4,
                  rank_by_weight: bool = True) -> SurvivorPool:
    """Compact the samples with weight > w_eps (and transmittance >
    t_eps, the reference's ray-kill threshold, raymarching.cu:1095),
    capped at `cap` per ray.

    With ``rank_by_weight`` (default), a ray over its cap keeps its
    `cap` HIGHEST-weight samples (t order preserved among the kept) --
    the same rule as the proxy renderer's top-k selection.  A
    first-`cap`-in-t-order rule instead fills the slots with the
    low-grade leading haze the density grid's EMA(max) keeps in front
    of surfaces and never shades the surface itself (measured 15.9 dB
    at cap 5 vs 26+ weight-ranked on the r4 curved bench state; the
    reference never hits this because its alive-ray loop terminates
    rays instead of capping samples, nerf/renderer.py:459-485).

    The output pool has a fixed size n_rays * cap, which the per-ray
    cap can never overflow.  The total weight dropped per ray is
    bounded by t_eps + (samples/ray) * w_eps + any cap truncation."""
    N = n_rays
    M2 = N * cap
    M = flat.ts.shape[0]
    surv = flat.valid & (w > w_eps)
    if trans is not None:
        surv = surv & (trans > t_eps)
    if rank_by_weight and M // N > cap:
        # per-ray cap-th-largest weight via a dense [N, Kp] view of the
        # pool (flatten_samples caps every segment at Kp = M // N, so the
        # dense view is exact).  One gather + top_k; no sort of the pool.
        Kp = M // N
        col = jnp.arange(Kp, dtype=jnp.int32)
        dense_idx = flat.offsets[:-1, None] + col[None]      # [N, Kp]
        lens = (flat.offsets[1:] - flat.offsets[:-1])[:, None]
        dense_w = jnp.where(
            (col[None] < lens)
            & jnp.take(surv, jnp.minimum(dense_idx, M - 1)),
            jnp.take(w, jnp.minimum(dense_idx, M - 1)), 0.0)
        kth = jax.lax.top_k(dense_w, cap)[0][:, -1]          # [N]
        kth_flat = seg_broadcast(kth, flat.ray_id, flat.offsets)
        surv = surv & (w >= kth_flat)
    si = surv.astype(jnp.int32)
    # rank of each survivor within its ray (0-based, front-to-back;
    # with rank_by_weight this only truncates weight TIES at the cap)
    cs = jnp.cumsum(si)
    excl = cs - si
    cs_pad = jnp.concatenate([jnp.zeros((1,), cs.dtype), cs])
    seg_start = cs_pad[flat.offsets[:-1]]                # [N]
    safe = jnp.clip(flat.ray_id, 0, N - 1)
    rank = excl - jnp.where(flat.ray_id < N, seg_start[safe], 0)
    keep = surv & (rank < cap)
    counts2 = seg_sum(keep.astype(jnp.int32), flat.offsets)  # [N]
    offsets2 = jnp.concatenate(
        [jnp.zeros((1,), counts2.dtype), jnp.cumsum(counts2)])
    offsets2 = jnp.minimum(offsets2, M2)
    # stable front-compaction of kept slots (pool is ray-ordered, so the
    # result stays segment-contiguous)
    idx = jnp.argsort(~keep, stable=True)[:M2]
    valid2 = (jnp.arange(M2, dtype=offsets2.dtype) < offsets2[-1])
    ray2 = jnp.where(valid2, flat.ray_id[idx], N)
    return SurvivorPool(idx=idx, ray_id=ray2, valid=valid2,
                        offsets=offsets2)


class FlatComposite(NamedTuple):
    image: jax.Array        # [N, C]
    depth: jax.Array        # [N]
    weights_sum: jax.Array  # [N]
    weights: jax.Array      # [M]


def flat_weights(sigmas, flat: FlatSamples):
    """Per-sample (weight T * alpha, transmittance T) over the pool."""
    sdt = jnp.where(flat.valid, sigmas * flat.dts, 0.0)
    cs = jnp.cumsum(sdt)
    excl = cs - sdt                                   # exclusive cumsum
    # subtract each segment's starting cumsum
    cs_pad = jnp.concatenate([jnp.zeros((1,), cs.dtype), cs])
    seg_start = cs_pad[flat.offsets[:-1]]             # [N]
    start_flat = seg_broadcast(seg_start, flat.ray_id, flat.offsets)
    trans = jnp.exp(-(excl - start_flat))
    alpha = 1.0 - jnp.exp(-sdt)
    return jnp.where(flat.valid, trans * alpha, 0.0), trans


def composite_flat(sigmas, values, flat: FlatSamples,
                   n_rays: int) -> FlatComposite:
    """Front-to-back compositing over the compacted pool.

    Same math as ops/composite.py (T via exclusive cumsum of sigma*dt),
    segmented per ray.  sigmas [M], values [M, C].
    """
    w, _ = flat_weights(sigmas, flat)

    image = seg_sum(w[:, None] * values, flat.offsets)
    depth = seg_sum(w * flat.ts, flat.offsets)
    wsum = seg_sum(w, flat.offsets)
    return FlatComposite(image=image, depth=depth, weights_sum=wsum,
                         weights=w)
