"""Occupancy-grid-accelerated ray marching, TPU-native.

Re-design of the reference's CUDA ray marcher
(``raymarching/src/raymarching.cu``: ``kernel_near_far_from_aabb`` :94,
``kernel_march_rays_train`` :314-483, ``kernel_march_rays`` :900) around a
key observation: the reference advances ``t`` by
``clamp(t * dt_gamma, dt_min, dt_max)`` on *every* step whether the current
voxel is occupied or skipped -- occupancy only decides whether a sample is
*emitted*.  So marching decomposes into three fixed-shape, fully-vectorized
phases with no atomics, no compaction races, and no host syncs:

  A. generate the deterministic t-sequence per ray  ([N, S]);
  B. one batched occupancy gather + validity mask   ([N, S] bool);
  C. compact the <=S candidates into K sample slots per ray with a
     per-row binary search over the mask cumsum (gather, not scatter).

Training uses K ~ the reference's ``mean_count``; inference uses a larger K
instead of the reference's alive-ray compaction loop (which required a
device->host ``n_alive`` read every iteration, nerf/renderer.py:469).
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

SQRT3 = math.sqrt(3.0)


def near_far_from_aabb(rays_o, rays_d, aabb, min_near: float = 0.2):
    """Ray/AABB slab test.

    Port of ``kernel_near_far_from_aabb`` (raymarching.cu:94-147).

    Args:
      rays_o, rays_d: [..., 3].
      aabb: [6] (xmin, ymin, zmin, xmax, ymax, zmax).

    Returns:
      (nears, fars) [...] with ``nears >= min_near``; on a miss
      ``nears == fars == 0`` so downstream masks are empty.
    """
    inv_d = 1.0 / jnp.where(jnp.abs(rays_d) > 1e-15, rays_d,
                            jnp.where(rays_d >= 0, 1e-15, -1e-15))
    t0 = (aabb[:3] - rays_o) * inv_d
    t1 = (aabb[3:] - rays_o) * inv_d
    tmin = jnp.minimum(t0, t1)
    tmax = jnp.maximum(t0, t1)
    near = jnp.max(tmin, axis=-1)
    far = jnp.min(tmax, axis=-1)
    hit = near <= far
    near = jnp.maximum(near, min_near)
    hit = hit & (near <= far)
    near = jnp.where(hit, near, 0.0)
    far = jnp.where(hit, far, 0.0)
    return near, far


def polar_from_ray(rays_o, rays_d, radius: float):
    """Intersect rays with a background sphere, return normalized (theta,
    phi) coords in [-1, 1].  Port of ``kernel_polar_from_ray``
    (raymarching.cu:165-200); assumes y-up.
    """
    a = jnp.sum(rays_d * rays_d, axis=-1)
    b = jnp.sum(rays_o * rays_d, axis=-1)
    c = jnp.sum(rays_o * rays_o, axis=-1) - radius * radius
    t = (-b + jnp.sqrt(jnp.maximum(b * b - a * c, 0.0))) / a
    p = rays_o + t[..., None] * rays_d
    x, y, z = p[..., 0], p[..., 1], p[..., 2]
    theta = jnp.arctan2(jnp.sqrt(x * x + z * z), y)
    phi = jnp.arctan2(z, x)
    return jnp.stack([2.0 * theta / jnp.pi - 1.0, phi / jnp.pi], axis=-1)


# ---------------------------------------------------------------------------
# march
# ---------------------------------------------------------------------------


class MarchResult(NamedTuple):
    ts: jax.Array     # [N, K] sample distances (0 where invalid)
    dts: jax.Array    # [N, K] integration step sizes
    mask: jax.Array   # [N, K] bool sample validity
    counts: jax.Array  # [N] int32 number of valid samples per ray


def _t_sequence(t0, far, *, dt_gamma: float, dt_min: float, dt_max: float,
                num_steps: int):
    """ts[n, i], dts[n, i] for the deterministic advance
    t += clamp(t * dt_gamma, dt_min, dt_max).  Closed-form when
    dt_gamma == 0, a cheap elementwise scan otherwise."""
    if dt_gamma == 0.0:
        steps = jnp.arange(num_steps, dtype=t0.dtype)
        ts = t0[:, None] + steps[None, :] * dt_min
        dts = jnp.full_like(ts, dt_min)
        return ts, dts

    def body(t, _):
        dt = jnp.clip(t * dt_gamma, dt_min, dt_max)
        return t + dt, (t, dt)

    _, (ts, dts) = jax.lax.scan(body, t0, None, length=num_steps)
    return ts.T, dts.T  # [N, S]


@partial(jax.jit, static_argnames=("bound", "cascades", "grid_size",
                                   "max_steps", "max_samples", "dt_gamma",
                                   "perturb", "dt_steps"))
def march_rays(rays_o, rays_d, occ, nears, fars, *, bound: float,
               cascades: int, grid_size: int, max_steps: int = 1024,
               max_samples: int = 256, dt_gamma: float = 0.0,
               perturb: bool = False, key=None,
               dt_steps: int | None = None) -> MarchResult:
    """March rays through the occupancy grid into fixed-width sample buffers.

    Args:
      rays_o, rays_d: [N, 3].
      occ: [cascades * grid_size**3] uint8 occupancy (C-order cells).
      nears, fars: [N] from `near_far_from_aabb`.
      max_steps: length of the candidate t-sequence (the reference's
        ``max_steps``).
      max_samples: K, the fixed per-ray sample budget after occupancy
        culling (replaces the reference's dynamic ``M`` point buffer).
      key: PRNG key, required when perturb=True.

    Returns:
      MarchResult with [N, max_samples] buffers.
    """
    N = rays_o.shape[0]
    H = grid_size
    # dt_steps decouples the step SIZE from the sequence LENGTH: when the
    # caller supplies tight per-ray [near, far] spans (e.g. from the
    # render prepass) a shorter sequence at the same density covers the
    # whole occupied span at half the march cost
    dt_min = 2.0 * SQRT3 / (dt_steps or max_steps)
    dt_max = 2.0 * SQRT3 * (2 ** (cascades - 1)) / H

    t0 = nears
    if perturb:
        u = jax.random.uniform(key, (N,), dtype=rays_o.dtype)
        t0 = t0 + dt_min * u

    ts, dts = _t_sequence(t0, fars, dt_gamma=dt_gamma, dt_min=dt_min,
                          dt_max=dt_max, num_steps=max_steps)  # [N, S]

    # Phase B: batched occupancy lookup.  All coordinate math is SoA
    # ([N, S] per axis): a [N, S, 3] intermediate would be lane-padded
    # 3 -> 128 by the TPU tile layout (docs/PERF.md "layout trap").
    px = jnp.clip(rays_o[:, 0:1] + ts * rays_d[:, 0:1], -bound, bound)
    py = jnp.clip(rays_o[:, 1:2] + ts * rays_d[:, 1:2], -bound, bound)
    pz = jnp.clip(rays_o[:, 2:3] + ts * rays_d[:, 2:3], -bound, bound)
    if cascades == 1:
        inv2b = H / (2.0 * bound)
        cx = jnp.clip(((px + bound) * inv2b).astype(jnp.int32), 0, H - 1)
        cy = jnp.clip(((py + bound) * inv2b).astype(jnp.int32), 0, H - 1)
        cz = jnp.clip(((pz + bound) * inv2b).astype(jnp.int32), 0, H - 1)
        flat = (cx * H + cy) * H + cz
    else:
        mx = jnp.maximum(jnp.abs(px),
                         jnp.maximum(jnp.abs(py), jnp.abs(pz)))
        _, e_pos = jnp.frexp(mx)
        _, e_dt = jnp.frexp(dts * (H * 0.5))
        level = jnp.minimum(jnp.maximum(jnp.maximum(e_pos, e_dt), 0),
                            cascades - 1)               # [N, S]
        mip_bound = jnp.minimum(jnp.exp2(level.astype(px.dtype)), bound)
        half_h = 0.5 * H
        inv_mb = half_h / mip_bound
        cx = jnp.clip((px * inv_mb + half_h).astype(jnp.int32), 0, H - 1)
        cy = jnp.clip((py * inv_mb + half_h).astype(jnp.int32), 0, H - 1)
        cz = jnp.clip((pz * inv_mb + half_h).astype(jnp.int32), 0, H - 1)
        flat = level * (H * H * H) + (cx * H + cy) * H + cz
    occupied = jnp.take(occ, flat.reshape(-1)).reshape(N, max_steps) > 0
    keep = occupied & (ts < fars[:, None])             # [N, S]

    # Phase C: per-row stream compaction.  A stable argsort moving kept
    # samples to the front preserves their order (sort key 0 for kept, 1
    # for dropped; ties keep original index order) -- measured ~8x faster
    # on TPU than a vmapped binary search over the mask cumsum.
    total = jnp.sum(keep.astype(jnp.int32), axis=-1)    # [N]
    counts = jnp.minimum(total, max_samples)
    k_eff = min(max_samples, max_steps)   # cannot keep more than S
    src = jnp.argsort(~keep, axis=-1, stable=True)[:, :k_eff]
    valid = (jnp.arange(max_samples, dtype=jnp.int32)[None, :]
             < counts[:, None])                         # [N, K]
    if dt_gamma == 0.0:
        # constant step: ts is affine in the step index (perturb only
        # shifts t0), so the compacted buffers come straight from `src`
        # -- no take_along_axis gathers
        ts_c = t0[:, None] + src.astype(ts.dtype) * dt_min
        dts_c = jnp.full_like(ts_c, dt_min)
    else:
        ts_c = jnp.take_along_axis(ts, src, axis=-1)
        dts_c = jnp.take_along_axis(dts, src, axis=-1)
    if k_eff < max_samples:
        pad = ((0, 0), (0, max_samples - k_eff))
        ts_c = jnp.pad(ts_c, pad)
        dts_c = jnp.pad(dts_c, pad)
    return MarchResult(ts=ts_c * valid, dts=dts_c * valid, mask=valid,
                       counts=counts)


def sample_points(rays_o, rays_d, result: MarchResult, bound: float):
    """[N, K, 3] sample positions (clamped to the AABB like the reference's
    march kernel, raymarching.cu:364-366) and [N, K, 3] directions."""
    pos = rays_o[:, None, :] + result.ts[..., None] * rays_d[:, None, :]
    pos = jnp.clip(pos, -bound, bound)
    dirs = jnp.broadcast_to(rays_d[:, None, :], pos.shape)
    return pos, dirs
