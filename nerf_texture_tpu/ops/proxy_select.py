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
