"""Morton (Z-order) codes for 3D grid coordinates.

API-parity port of the reference's ``raymarching/src/raymarching.cu``
``__morton3D`` / ``__morton3D_invert`` (:58-82, :216-262), as vectorized
uint32 bit arithmetic.  The TPU build stores its density grids in plain
C-order (locality tricks for CUDA caches buy nothing for XLA gathers), but
the codes are still exposed for tooling and tests.
"""

import jax.numpy as jnp


def _expand_bits(v):
    v = (v * jnp.uint32(0x00010001)) & jnp.uint32(0xFF0000FF)
    v = (v * jnp.uint32(0x00000101)) & jnp.uint32(0x0F00F00F)
    v = (v * jnp.uint32(0x00000011)) & jnp.uint32(0xC30C30C3)
    v = (v * jnp.uint32(0x00000005)) & jnp.uint32(0x49249249)
    return v


def morton3d(coords):
    """Interleave bits of [..., 3] int coords (each < 1024) -> [...] codes."""
    c = coords.astype(jnp.uint32)
    xx = _expand_bits(c[..., 0])
    yy = _expand_bits(c[..., 1])
    zz = _expand_bits(c[..., 2])
    return (xx | (yy << 1) | (zz << 2)).astype(jnp.int32)


def _compact_bits(x):
    x = x & jnp.uint32(0x49249249)
    x = (x | (x >> 2)) & jnp.uint32(0xC30C30C3)
    x = (x | (x >> 4)) & jnp.uint32(0x0F00F00F)
    x = (x | (x >> 8)) & jnp.uint32(0xFF0000FF)
    x = (x | (x >> 16)) & jnp.uint32(0x0000FFFF)
    return x


def morton3d_invert(codes):
    """Invert morton3d: [...] codes -> [..., 3] int coords."""
    ind = codes.astype(jnp.uint32)
    x = _compact_bits(ind >> 0)
    y = _compact_bits(ind >> 1)
    z = _compact_bits(ind >> 2)
    return jnp.stack([x, y, z], axis=-1).astype(jnp.int32)
