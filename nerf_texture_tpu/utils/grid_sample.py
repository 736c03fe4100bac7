"""2D grid sampling (torch.nn.functional.grid_sample equivalent).

Used by the import paths of the mesh feature field
(tools/map.py:663,673,697: bilinear / nearest sampling of the synthesized
feature canvas at uv coords in [-1, 1], align_corners=True, zero padding).
"""

from __future__ import annotations

import jax.numpy as jnp


def grid_sample_2d(image, coords, *, mode: str = "bilinear",
                   padding_zero: bool = True):
    """Sample image [H, W, C] at coords [..., 2] in [-1, 1].

    coords[..., 0] indexes W (x), coords[..., 1] indexes H (y), matching
    torch's grid_sample convention with align_corners=True.
    """
    H, W = image.shape[:2]
    x = (coords[..., 0] + 1.0) * 0.5 * (W - 1)
    y = (coords[..., 1] + 1.0) * 0.5 * (H - 1)

    in_bounds = ((coords[..., 0] >= -1.0) & (coords[..., 0] <= 1.0)
                 & (coords[..., 1] >= -1.0) & (coords[..., 1] <= 1.0))

    if mode == "nearest":
        xi = jnp.clip(jnp.round(x).astype(jnp.int32), 0, W - 1)
        yi = jnp.clip(jnp.round(y).astype(jnp.int32), 0, H - 1)
        out = image[yi, xi]
    elif mode == "bilinear":
        x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, W - 1)
        y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, H - 1)
        x1 = jnp.clip(x0 + 1, 0, W - 1)
        y1 = jnp.clip(y0 + 1, 0, H - 1)
        fx = jnp.clip(x - x0, 0.0, 1.0)[..., None]
        fy = jnp.clip(y - y0, 0.0, 1.0)[..., None]
        out = ((1 - fx) * (1 - fy) * image[y0, x0]
               + fx * (1 - fy) * image[y0, x1]
               + (1 - fx) * fy * image[y1, x0]
               + fx * fy * image[y1, x1])
    else:
        raise ValueError(mode)

    if padding_zero:
        out = jnp.where(in_bounds[..., None], out, 0.0)
    return out
