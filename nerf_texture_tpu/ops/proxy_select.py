"""Fused survivor selection for the proxy renderer (Pallas TPU kernel).

`render_rays_proxy` (render/renderer.py) turns [N, K] proxy densities into
a dense [N, cap] survivor grid through a chain of XLA ops -- cumsum,
top_k, argsort, a stacked take_along_axis -- and on TPU the sort-backed
ops each carry ~10 ms-class cost at frame scale (they don't map to the
VPU the way elementwise work does).  The math, however, is pure per-ray
vector arithmetic over K=32 lanes: no gathers, no data-dependent shapes.

This kernel runs the whole selection in ONE Pallas program:

  sdt/cumsum/transmittance/weights -> k-th-largest weight threshold
  (iterative max, `cap` rounds) -> t-ordered rank -> skip optical depth
  -> masked-sum compaction to the [N, cap] slots.

Everything lowers to supported Mosaic primitives (reduce_max, select,
roll, iota, exp): cumulative sums are Hillis-Steele over `pltpu.roll`
with an iota mask, and slot compaction replaces argsort+gather with
`cap` masked reductions (out[:, c] = sum(where(rank==c & keep, v, 0))).

Semantics match the XLA chain exactly (same tie handling: the threshold
is the cap-th largest weight with duplicates removed one per round, then
candidates are rank-capped in t order).  Reference analogue: the
survivor selection inside the alive-ray loop, nerf/renderer.py:459-485.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cumsum_lanes(x, K: int):
    """Inclusive cumulative sum along the last (lane) axis via
    Hillis-Steele: log2(K) rounds of roll + iota-masked add."""
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, len(x.shape) - 1)
    s = 1
    while s < K:
        shifted = pltpu.roll(x, s, len(x.shape) - 1)
        x = x + jnp.where(lane >= s, shifted, 0.0)
        s *= 2
    return x


def _select_kernel(ts_ref, sig_ref, tlo_ref, thi_ref, out_ref, *,
                   K: int, cap: int, w_eps: float):
    ts = ts_ref[:]                                     # [B, K]
    sig = sig_ref[:]
    t_lo = tlo_ref[:]                                  # [B, 1]
    t_hi = thi_ref[:]
    span = jnp.maximum(t_hi - t_lo, 0.0)               # [B, 1]
    dts = span / K
    sdt = sig * dts                                    # [B, K]
    cs = _cumsum_lanes(sdt, K)
    trans = jnp.exp(-(cs - sdt))
    w = trans * (1.0 - jnp.exp(-sdt))
    w = jnp.where(span > 0.0, w, 0.0)                  # == w_sel (valid
    # rows only differ where span <= 0, where w is zeroed anyway)

    # k-th largest weight: `cap` rounds of (max, mask one occurrence).
    # Matches jax.lax.top_k(w, cap)[0][:, -1] including duplicate ties.
    w_cur = w
    kth = jnp.zeros_like(t_lo)
    for _ in range(cap):
        kth = jnp.max(w_cur, axis=-1, keepdims=True)   # [B, 1]
        eq = (w_cur == kth).astype(jnp.float32)
        first = (eq > 0.0) & (_cumsum_lanes(eq, K) == 1.0)
        w_cur = jnp.where(first, -1.0, w_cur)

    valid = span > 0.0                                 # [B, 1]
    cand = valid & (w >= kth) & (w > w_eps)            # [B, K]
    candf = cand.astype(jnp.float32)
    rank = _cumsum_lanes(candf, K) - candf             # exclusive: 0-based
    keep = cand & (rank < cap)

    skip_sdt = jnp.where(keep | ~jnp.broadcast_to(valid, sdt.shape),
                         0.0, sdt)
    skip_excl = _cumsum_lanes(skip_sdt, K) - skip_sdt  # [B, K] exclusive

    # compact kept samples (t order) into cap slots by masked sums
    for c in range(cap):
        slot = keep & (rank == c)                      # [B, K] one-hot
        ts2 = jnp.sum(jnp.where(slot, ts, 0.0), axis=-1, keepdims=True)
        sk2 = jnp.sum(jnp.where(slot, skip_excl, 0.0), axis=-1,
                      keepdims=True)
        v2 = jnp.max(slot.astype(jnp.float32), axis=-1, keepdims=True)
        out_ref[:, c:c + 1] = ts2
        out_ref[:, cap + c:cap + c + 1] = sk2
        out_ref[:, 2 * cap + c:2 * cap + c + 1] = v2


def _select_cdf_kernel(tlo_ref, thi_ref, sig_ref, out_ref, *,
                       K: int, cap: int, w_eps: float,
                       dt_clamp: float = 2.0):
    """Inverse-CDF placement: `cap` stratified quantiles of the proxy
    weight distribution instead of the top-`cap` grid samples.

    The reference's non-CUDA renderer does the same thing with
    sample_pdf over coarse weights (nerf/renderer.py:187-322); here the
    CDF inversion is per-ray lane math (masked reductions per quantile),
    so it fuses into the same one-pass kernel shape as _select_kernel.
    Placement by quantile concentrates ALL slots inside the weight-
    bearing interval, so the same image quality needs fewer field evals
    per ray than top-k selection of a fixed K-grid (the k-th grid sample
    may sit half a bin off the surface; a quantile never does)."""
    t_lo = tlo_ref[:]                                  # [B, 1]
    t_hi = thi_ref[:]
    sig = sig_ref[:]                                   # [B, K]
    span = jnp.maximum(t_hi - t_lo, 0.0)
    dts = span / K
    sdt = sig * dts
    cs = _cumsum_lanes(sdt, K)
    trans = jnp.exp(-(cs - sdt))
    w = trans * (1.0 - jnp.exp(-sdt))
    w = jnp.where(span > 0.0, w, 0.0)                  # [B, K]

    total = jnp.sum(w, axis=-1, keepdims=True)         # [B, 1]
    valid = (span > 0.0) & (total > w_eps)
    tot = jnp.maximum(total, 1e-12)
    cdf = _cumsum_lanes(w, K) / tot                    # [B, K] in [0, 1]
    lane = jax.lax.broadcasted_iota(jnp.int32, cdf.shape, cdf.ndim - 1)

    t_prev = None
    for c in range(cap):
        u = (c + 0.5) / cap
        below = (cdf < u).astype(jnp.float32)
        b = jnp.minimum(jnp.sum(below, axis=-1, keepdims=True),
                        float(K - 1))                  # [B, 1] bin index
        onehot = lane == b.astype(jnp.int32)
        cdf_hi = jnp.sum(jnp.where(onehot, cdf, 0.0), -1, keepdims=True)
        w_bin = jnp.sum(jnp.where(onehot, w, 0.0), -1, keepdims=True)
        cdf_lo = cdf_hi - w_bin / tot
        frac = jnp.clip((u - cdf_lo)
                        / jnp.maximum(cdf_hi - cdf_lo, 1e-12), 0.0, 1.0)
        t_c = t_lo + (b + frac) * dts                  # [B, 1]
        out_ref[:, c:c + 1] = t_c
        if t_prev is not None:
            # segment length, clamped to ~the proxy bin width: when two
            # quantiles straddle an empty gap (a shell crossed twice),
            # the raw diff would integrate the front sample's sigma
            # across the whole gap and over-darken what lies behind
            out_ref[:, cap + c - 1:cap + c] = jnp.minimum(
                t_c - t_prev, dt_clamp * dts)
        t_prev = t_c
    # last slot integrates to the span end (quantiles never reach t_hi;
    # without this tail the surface sample under-integrates and rims
    # brighten toward background)
    out_ref[:, 2 * cap - 1:2 * cap] = jnp.minimum(
        jnp.maximum(t_hi - t_prev, 0.0), dt_clamp * dts)
    out_ref[:, 2 * cap:2 * cap + 1] = valid.astype(jnp.float32)


@partial(jax.jit, static_argnames=("cap", "w_eps", "block", "interpret"))
def proxy_select_cdf(ts, sig, t_lo, t_hi, *, cap: int, w_eps: float,
                     block: int = 1024, interpret: bool | None = None):
    """Stratified inverse-CDF sample placement over the proxy weights.

    Same call shape as proxy_select (ts is unused: the quantile t's are
    reconstructed from t_lo/dts directly) but returns (ts2, dt2, valid2):
    `cap` strictly t-ordered samples per ray with their integration
    segment lengths, valid as whole rays (total proxy weight > w_eps).
    """
    N, K = ts.shape
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    npad = ((N + block - 1) // block) * block
    if npad != N:
        pad = npad - N
        sig = jnp.pad(sig, ((0, pad), (0, 0)))
        t_lo = jnp.pad(t_lo, (0, pad))
        t_hi = jnp.pad(t_hi, (0, pad))    # span 0 -> all-invalid rows

    out = pl.pallas_call(
        partial(_select_cdf_kernel, K=K, cap=cap, w_eps=float(w_eps)),
        out_shape=jax.ShapeDtypeStruct((npad, 2 * cap + 1), sig.dtype),
        grid=(npad // block,),
        in_specs=[
            pl.BlockSpec((block, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, K), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, 2 * cap + 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(t_lo[:, None], t_hi[:, None], sig)
    out = out[:N]
    valid2 = jnp.broadcast_to(out[:, 2 * cap:] > 0.5, (N, cap))
    return out[:, :cap], out[:, cap:2 * cap], valid2


@partial(jax.jit, static_argnames=("cap", "w_eps", "block", "interpret"))
def proxy_select(ts, sig, t_lo, t_hi, *, cap: int, w_eps: float,
                 block: int = 1024, interpret: bool | None = None):
    """Survivor selection: [N, K] proxy densities -> [N, cap] slots.

    Returns (ts2, skip2, valid2): selected sample t's (t order), the
    exclusive proxy optical depth of the dropped samples before each
    survivor, and the slot validity mask.  Exact drop-in for the
    top_k/argsort/take_along_axis chain in render_rays_proxy.
    """
    N, K = ts.shape
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    npad = ((N + block - 1) // block) * block
    if npad != N:
        pad = npad - N
        ts = jnp.pad(ts, ((0, pad), (0, 0)))
        sig = jnp.pad(sig, ((0, pad), (0, 0)))
        t_lo = jnp.pad(t_lo, (0, pad))
        t_hi = jnp.pad(t_hi, (0, pad))    # span 0 -> all-invalid rows

    out = pl.pallas_call(
        partial(_select_kernel, K=K, cap=cap, w_eps=float(w_eps)),
        out_shape=jax.ShapeDtypeStruct((npad, 3 * cap), ts.dtype),
        grid=(npad // block,),
        in_specs=[
            pl.BlockSpec((block, K), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, K), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, 3 * cap), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(ts, sig, t_lo[:, None], t_hi[:, None])
    out = out[:N]
    return out[:, :cap], out[:, cap:2 * cap], out[:, 2 * cap:] > 0.5
