"""Device-side ray generation.

Port of reference ``get_rays`` (nerf/utils.py:167-238): pixel-center rays in
the ngp camera convention (camera looks along +z of the c2w rotation),
with optional random pixel subsampling and error-map importance sampling.
Everything runs under jit on device -- the collate step ships only a pose
and a frame index.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def pixel_dirs(intrinsics, H: int, W: int, dtype=jnp.float32):
    """[H*W, 3] unnormalized camera-space directions at pixel centers."""
    fx, fy, cx, cy = (intrinsics[0], intrinsics[1], intrinsics[2],
                      intrinsics[3])
    j, i = jnp.meshgrid(jnp.arange(H, dtype=dtype),
                        jnp.arange(W, dtype=dtype), indexing="ij")
    i = i.reshape(-1) + 0.5
    j = j.reshape(-1) + 0.5
    xs = (i - cx) / fx
    ys = (j - cy) / fy
    return jnp.stack([xs, ys, jnp.ones_like(xs)], axis=-1)


@partial(jax.jit, static_argnames=("H", "W"))
def _full_frame_rays(pose, intrinsics, H: int, W: int):
    """Whole-frame rays as ONE compiled program (eager dispatch of the
    ~15 constituent ops costs ~40 ms of host time per frame)."""
    dirs = pixel_dirs(intrinsics, H, W)
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    rays_d = dirs @ pose[:3, :3].T
    rays_o = jnp.broadcast_to(pose[:3, 3], rays_d.shape)
    return rays_o, rays_d


def get_rays(pose, intrinsics, H: int, W: int, inds=None):
    """Rays for one camera.

    Args:
      pose: [4, 4] cam2world (ngp convention).
      intrinsics: [4] (fx, fy, cx, cy).
      inds: optional [N] flat pixel indices to select.

    Returns:
      dict(rays_o [N, 3], rays_d [N, 3] (unit), inds [N]).
    """
    if inds is None:
        # fixed dtypes: a float64/weak-typed pose would compile a second
        # identical program
        rays_o, rays_d = _full_frame_rays(
            jnp.asarray(pose, jnp.float32),
            jnp.asarray(intrinsics, jnp.float32), H, W)
        # host arange: no full-frame caller indexes with it, and the eager
        # device iota was a one-off compile + a dispatch per resolution
        return {"rays_o": rays_o, "rays_d": rays_d,
                "inds": np.arange(H * W)}
    dirs = pixel_dirs(intrinsics, H, W)[inds]
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    rays_d = dirs @ pose[:3, :3].T
    rays_o = jnp.broadcast_to(pose[:3, 3], rays_d.shape)
    return {"rays_o": rays_o, "rays_d": rays_d, "inds": inds}


def sample_ray_indices(key, H: int, W: int, n: int, error_map=None,
                       coarse: int = 128):
    """Random (or error-map-weighted) pixel indices.

    With an error map: importance-sample ``n`` cells of the coarse
    ``128 x 128`` map without replacement (Gumbel top-k, replacing the
    reference's ``torch.multinomial``, nerf/utils.py:192-208), then jitter
    within each cell.

    Returns (inds [n], inds_coarse [n] or None).
    """
    if error_map is None:
        inds = jax.random.randint(key, (n,), 0, H * W)
        return inds, None
    k1, k2, k3 = jax.random.split(key, 3)
    logits = jnp.log(jnp.clip(error_map, 1e-12, None))
    gumbel = -jnp.log(-jnp.log(
        jax.random.uniform(k1, logits.shape, minval=1e-9, maxval=1.0)))
    _, inds_coarse = jax.lax.top_k(logits + gumbel, n)
    inds_x = inds_coarse // coarse
    inds_y = inds_coarse % coarse
    sx, sy = H / coarse, W / coarse
    jx = jax.random.uniform(k2, (n,)) * sx
    jy = jax.random.uniform(k3, (n,)) * sy
    px = jnp.clip((inds_x * sx + jx).astype(jnp.int32), 0, H - 1)
    py = jnp.clip((inds_y * sy + jy).astype(jnp.int32), 0, W - 1)
    return px * W + py, inds_coarse
