"""Multi-chip full-frame rendering: rays sharded over the mesh.

The TPU-native replacement for the reference's eval all_gather
(nerf/utils.py:1415-1430): each render chunk's rays are placed with a
'data'-axis sharding and the jitted chunk program runs SPMD -- march,
field eval and compositing all shard trivially per-ray, XLA gathers the
image tiles back, no hand-written collectives.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..render.renderer import RenderConfig, _render_chunk
from .sharding import data_sharded, replicated


def render_image_sharded(field_apply, field_static, params, occ, pose,
                         intrinsics, H: int, W: int, cfg: RenderConfig,
                         mesh, *, bg_color=1.0):
    """render_image with ray chunks sharded across `mesh`'s data axis.

    params/occ must already be placed on the mesh (replicated or
    TP-sharded via parallel.shard_params)."""
    from ..data.rays import get_rays

    rays = get_rays(jnp.asarray(pose), jnp.asarray(intrinsics), H, W)
    n = H * W
    n_shards = mesh.shape["data"]
    chunk = min(cfg.ray_chunk, n)
    chunk -= chunk % max(n_shards, 1) or 0
    chunk = max(chunk, n_shards)
    spec = data_sharded(mesh)
    rep = replicated(mesh)
    bg = jax.device_put(jnp.asarray(bg_color), rep)
    images, depths, ws = [], [], []
    for start in range(0, n, chunk):
        stop = min(start + chunk, n)
        pad = chunk - (stop - start)
        sl = slice(start - pad, stop)
        ro = jax.device_put(rays["rays_o"][sl], spec)
        rd = jax.device_put(rays["rays_d"][sl], spec)
        img, dep, wsum = _render_chunk(field_apply, field_static, params,
                                       occ, ro, rd, bg, cfg)
        images.append(img[pad:])
        depths.append(dep[pad:])
        ws.append(wsum[pad:])
    return {
        "image": jnp.concatenate(images).reshape(H, W, 3),
        "depth": jnp.concatenate(depths).reshape(H, W),
        "weights_sum": jnp.concatenate(ws).reshape(H, W),
    }
