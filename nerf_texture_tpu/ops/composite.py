"""Volume-rendering compositor over fixed-width sample buffers.

Replaces the reference's per-ray sequential compositing kernels
(``raymarching/src/raymarching.cu``: ``kernel_composite_rays_train_forward``
:700-777, its hand-written backward :802-890, and the inference
``kernel_composite_rays`` :1021) with an exact closed-form reformulation:

  T_i = prod_{j<i} (1 - alpha_j) = exp(-sum_{j<i} sigma_j * dt_j)

so transmittance is an *exclusive cumulative sum* -- a single vectorized
XLA op over the sample axis, differentiable by autodiff with gradients
mathematically identical to the reference's analytic backward (no custom
VJP needed, and double-backward for normal supervision is free).

Masked samples contribute sigma * dt = 0 and so are exact no-ops, which
subsumes both the training compaction and the inference alive-ray
termination (T < 1e-4 rays simply stop accumulating weight).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class CompositeResult(NamedTuple):
    image: jax.Array        # [N, C] accumulated color (no background yet)
    depth: jax.Array        # [N] expected depth (weighted t from t0)
    weights_sum: jax.Array  # [N] opacity
    weights: jax.Array      # [N, K] per-sample weights


def composite_rays(sigmas, values, dts, ts, mask) -> CompositeResult:
    """Front-to-back alpha compositing.

    Args:
      sigmas: [N, K] densities (already scaled by density_scale).
      values: [N, K, C] per-sample colors / attributes to accumulate.
      dts: [N, K] integration step sizes.
      ts: [N, K] sample distances (for depth).
      mask: [N, K] bool validity.

    Returns:
      CompositeResult.  ``depth`` is sum(w * t): the caller normalizes with
      (depth - near) / (far - near) as the reference does
      (nerf/renderer.py:425).
    """
    sdt = jnp.where(mask, sigmas * dts, 0.0)
    alpha = 1.0 - jnp.exp(-sdt)                       # [N, K]
    # exclusive cumsum -> transmittance *before* each sample
    accum = jnp.cumsum(sdt, axis=-1)
    trans = jnp.exp(-(accum - sdt))                   # T_i
    weights = alpha * trans                           # [N, K]
    image = jnp.einsum("nk,nkc->nc", weights, values)
    depth = jnp.sum(weights * ts, axis=-1)
    weights_sum = jnp.sum(weights, axis=-1)
    return CompositeResult(image=image, depth=depth,
                           weights_sum=weights_sum, weights=weights)


def composite_with_background(res: CompositeResult, bg_color):
    """image + (1 - weights_sum) * bg (nerf/renderer.py:424)."""
    return res.image + (1.0 - res.weights_sum)[..., None] * bg_color
