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

    @staticmethod
    def for_bound(bound: float, **kw) -> "RenderConfig":
        import math
        cascades = 1 + math.ceil(math.log2(max(bound, 1.0)))
        return RenderConfig(bound=bound, cascades=cascades, **kw)


def render_rays(field_fn, occ, rays_o, rays_d, cfg: RenderConfig, *,
                max_samples: int, key=None, perturb: bool = False,
                bg_color=1.0, aabb=None, pool_mean: int | None = None):
    """Render a batch of rays.

    Args:
      field_fn: (xyzs [M, 3], dirs [M, 3]) -> (sigmas [M], rgbs [M, 3])
        plus optionally a dict of extra per-sample attributes to composite
        (3-channel entries containing 'normal' are alpha-composited like the
        reference, renderer.py:428-433).
      occ: [cascades * grid_size**3] uint8 occupancy.
      rays_o, rays_d: [N, 3].
      bg_color: scalar, [3], or [N, 3].

    Returns:
      dict(image [N, 3], depth [N], weights_sum [N], counts [N], ...extras)
    """
    if aabb is None:
        aabb = jnp.asarray([-cfg.bound] * 3 + [cfg.bound] * 3)
    nears, fars = near_far_from_aabb(rays_o, rays_d, aabb, cfg.min_near)
    m = march_rays(rays_o, rays_d, occ, nears, fars, bound=cfg.bound,
                   cascades=cfg.cascades, grid_size=cfg.grid_size,
                   max_steps=cfg.max_steps, max_samples=max_samples,
                   dt_gamma=cfg.dt_gamma, perturb=perturb, key=key)
    N, K = m.ts.shape
    denom = jnp.where(fars > nears, fars - nears, 1.0)

    if pool_mean is None:
        pool_mean = cfg.pool_mean_samples
    if pool_mean:
        from .compact import composite_flat, flat_points, flatten_samples

        budget = _round_up(N * pool_mean, 1024)
        flat = flatten_samples(m, budget)
        xyzs, dirs = flat_points(rays_o, rays_d, flat, cfg.bound)
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


@partial(jax.jit, static_argnames=("field_apply", "field_static", "cfg"))
def _render_chunk(field_apply, field_static, params, occ, rays_o, rays_d,
                  bg_color, cfg: RenderConfig):
    """One fixed-shape inference chunk; compiled once per (model, config)."""
    out = render_rays(
        lambda x, d: field_apply(params, x, d, field_static), occ,
        rays_o, rays_d, cfg, max_samples=cfg.max_samples_infer,
        bg_color=bg_color,
        pool_mean=(cfg.pool_mean_samples_infer
                   if cfg.pool_mean_samples else 0))
    return out["image"], out["depth"], out["weights_sum"]


def render_image(field_apply, field_static, params, occ, pose, intrinsics,
                 H: int, W: int, cfg: RenderConfig, *, bg_color=1.0):
    """Render a full frame in fixed-size ray chunks (all identical shapes,
    so XLA compiles ONE program reused for every chunk).  Host-side loop,
    device-side everything else.

    Args:
      field_apply: module-level function (params, xyzs, dirs, field_static)
        -> (sigmas, rgbs).  Must be hashable (it is a static jit arg).
      field_static: hashable model config passed through to field_apply.
    """
    from ..data.rays import get_rays

    rays = get_rays(jnp.asarray(pose), jnp.asarray(intrinsics), H, W)
    n = H * W
    chunk = min(cfg.ray_chunk, n)
    bg = jnp.asarray(bg_color)
    images, depths, ws = [], [], []
    for start in range(0, n, chunk):
        stop = min(start + chunk, n)
        pad = chunk - (stop - start)
        sl = slice(start - pad, stop)  # overlap-pad the last chunk
        img, dep, wsum = _render_chunk(
            field_apply, field_static, params, occ,
            rays["rays_o"][sl], rays["rays_d"][sl], bg, cfg)
        images.append(img[pad:])
        depths.append(dep[pad:])
        ws.append(wsum[pad:])
    image = jnp.concatenate(images).reshape(H, W, 3)
    depth = jnp.concatenate(depths).reshape(H, W)
    wsum = jnp.concatenate(ws).reshape(H, W)
    return {"image": image, "depth": depth, "weights_sum": wsum}
