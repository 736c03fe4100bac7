"""Hierarchical importance-sampling renderer (the non-occupancy path).

Rebuild of the reference ``NeRFRenderer.run`` (nerf/renderer.py:187-322):
uniform linspace samples between near/far, inverse-CDF importance
resampling from the coarse weights (``sample_pdf``, renderer.py:16-50),
merge-sort of the two sample sets, and cumprod compositing.  Used when no
occupancy grid exists yet (or for reference-quality offline renders).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import near_far_from_aabb
from ..ops.composite import composite_rays


def sample_pdf(bins, weights, n_samples: int, key=None):
    """Inverse-CDF sampling (renderer.py:16-50).

    bins: [N, T] sorted sample positions; weights: [N, T-1].
    Deterministic midpoints when key is None (det=True), stratified
    uniforms otherwise.
    """
    weights = weights + 1e-5
    pdf = weights / jnp.sum(weights, -1, keepdims=True)
    cdf = jnp.cumsum(pdf, -1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], -1)
    if key is None:
        u = jnp.linspace(0.5 / n_samples, 1.0 - 0.5 / n_samples,
                         n_samples)
        u = jnp.broadcast_to(u, (*cdf.shape[:-1], n_samples))
    else:
        u = jax.random.uniform(key, (*cdf.shape[:-1], n_samples))

    inds = jax.vmap(lambda c, q: jnp.searchsorted(c, q, side="right"))(
        cdf, u)
    below = jnp.maximum(inds - 1, 0)
    above = jnp.minimum(inds, cdf.shape[-1] - 1)
    cdf_b = jnp.take_along_axis(cdf, below, -1)
    cdf_a = jnp.take_along_axis(cdf, above, -1)
    bins_b = jnp.take_along_axis(bins, jnp.minimum(below,
                                                   bins.shape[-1] - 1), -1)
    bins_a = jnp.take_along_axis(bins, jnp.minimum(above,
                                                   bins.shape[-1] - 1), -1)
    denom = jnp.where(cdf_a - cdf_b < 1e-5, 1.0, cdf_a - cdf_b)
    t = (u - cdf_b) / denom
    return bins_b + t * (bins_a - bins_b)


def render_rays_importance(density_fn, field_fn, rays_o, rays_d, *,
                           num_steps: int = 128,
                           upsample_steps: int = 128, bound: float = 1.0,
                           min_near: float = 0.2,
                           density_scale: float = 1.0,
                           perturb: bool = False, key=None, bg_color=1.0):
    """Two-pass hierarchical rendering.

    density_fn: x [M, 3] -> sigma [M] (coarse pass);
    field_fn: (x, d) -> (sigma, rgb) (fine pass).
    """
    N = rays_o.shape[0]
    aabb = jnp.asarray([-bound] * 3 + [bound] * 3)
    nears, fars = near_far_from_aabb(rays_o, rays_d, aabb, min_near)
    nears = nears[:, None]
    fars = fars[:, None]

    z = jnp.linspace(0.0, 1.0, num_steps)
    z_vals = nears + (fars - nears) * z[None, :]
    sample_dist = (fars - nears) / num_steps
    if perturb and key is not None:
        k1, key = jax.random.split(key)
        z_vals = z_vals + (jax.random.uniform(k1, z_vals.shape) - 0.5) \
            * sample_dist

    def pts(zv):
        p = rays_o[:, None, :] + rays_d[:, None, :] * zv[..., None]
        return jnp.clip(p, -bound, bound)

    sigmas = density_fn(pts(z_vals).reshape(-1, 3)).reshape(N, num_steps)

    if upsample_steps > 0:
        deltas = jnp.diff(z_vals, axis=-1)
        deltas = jnp.concatenate(
            [deltas, jnp.broadcast_to(sample_dist, deltas[..., :1].shape)],
            -1)
        alphas = 1.0 - jnp.exp(-deltas * density_scale * sigmas)
        shifted = jnp.concatenate(
            [jnp.ones_like(alphas[..., :1]), 1.0 - alphas + 1e-15], -1)
        weights = alphas * jnp.cumprod(shifted, -1)[..., :-1]
        z_mid = z_vals[..., :-1] + 0.5 * deltas[..., :-1]
        new_z = sample_pdf(z_mid, weights[:, 1:-1], upsample_steps,
                           key=key if perturb else None)
        new_z = jax.lax.stop_gradient(new_z)
        z_vals = jnp.sort(jnp.concatenate([z_vals, new_z], -1), -1)

    T = z_vals.shape[-1]
    xyzs = pts(z_vals)
    dirs = jnp.broadcast_to(rays_d[:, None, :], xyzs.shape)
    sigmas, rgbs = field_fn(xyzs.reshape(-1, 3), dirs.reshape(-1, 3))
    sigmas = sigmas.reshape(N, T) * density_scale
    rgbs = rgbs.reshape(N, T, 3)
    deltas = jnp.diff(z_vals, axis=-1)
    deltas = jnp.concatenate(
        [deltas, jnp.broadcast_to(sample_dist, deltas[..., :1].shape)], -1)

    res = composite_rays(sigmas, rgbs, deltas, z_vals,
                         jnp.ones_like(sigmas, bool))
    image = res.image + (1.0 - res.weights_sum)[..., None] \
        * jnp.asarray(bg_color)
    denom = jnp.where(fars[:, 0] > nears[:, 0], fars[:, 0] - nears[:, 0],
                      1.0)
    ori = jnp.clip((res.depth - nears[:, 0]) / denom, 0.0, 1.0)
    return {"image": image, "depth": ori,
            "weights_sum": res.weights_sum,
            "mask": res.weights_sum > 0.95}
