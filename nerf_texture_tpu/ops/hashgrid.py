"""Multiresolution hash-grid encoding (Instant-NGP style), TPU-native.

Replaces the reference's CUDA extension (``gridencoder/src/gridencoder.cu``:
``fast_hash`` :36, ``get_grid_index`` :55, ``kernel_grid`` :76,
``kernel_grid_backward`` :228) with pure XLA:

* forward  = per-level corner-index computation + a batched gather + a
  weighted reduction.  XLA fuses the weighting into the gather epilogue.
* backward = the transpose of the gather, i.e. a deterministic scatter-add --
  a free correctness upgrade over the reference's nondeterministic
  ``atomicAdd`` race (SURVEY.md 5.2).
* input gradients (for -grad(sigma) normals) come from plain autodiff of the
  trilinear weights -- ``floor`` has zero tangent so ``frac = pos - floor``
  differentiates exactly like the reference's analytic ``dy_dx`` path, and
  double-backward (grad-of-grad through the encoder) works out of the box.

All level metadata (resolutions, strides, hash-vs-dense decisions, table
offsets) is static Python, so the whole encoder traces to a fixed XLA
program with no dynamic shapes.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# Primes used by the Instant-NGP spatial hash (prime[0] = 1 keeps the first
# axis coherent in memory; see gridencoder/src/gridencoder.cu:36-51).
_HASH_PRIMES = (1, 2654435761, 805459861, 3674653429, 2097192037, 1434869437,
                2165219737)


@dataclasses.dataclass(frozen=True)
class HashGridSpec:
    """Static configuration of a multiresolution hash grid.

    Mirrors the constructor logic of the reference ``GridEncoder``
    (gridencoder/grid.py:94-131): per-level resolution
    ``ceil(base * scale**level)``, per-level table size
    ``min(2**log2_hashmap_size, (res [+1])**D)`` rounded up to a multiple
    of 8, concatenated into one parameter table.
    """

    input_dim: int = 3
    num_levels: int = 16
    level_dim: int = 2
    base_resolution: int = 16
    log2_hashmap_size: int = 19
    per_level_scale: float = 2.0
    desired_resolution: int | None = None
    gridtype: str = "hash"  # "hash" | "tiled"
    align_corners: bool = False

    def __post_init__(self):
        if self.desired_resolution is not None:
            scale = math.exp2(
                math.log2(self.desired_resolution / self.base_resolution)
                / max(self.num_levels - 1, 1))
            object.__setattr__(self, "per_level_scale", scale)

    # ---- static per-level metadata ------------------------------------

    @property
    def log2_scale(self) -> float:
        return math.log2(self.per_level_scale)

    def level_params(self, level: int) -> int:
        res = int(math.ceil(
            self.base_resolution * self.per_level_scale ** level))
        side = res if self.align_corners else res + 1
        n = min(2 ** self.log2_hashmap_size, side ** self.input_dim)
        return int(math.ceil(n / 8) * 8)

    @property
    def offsets(self) -> tuple[int, ...]:
        offs = [0]
        for lvl in range(self.num_levels):
            offs.append(offs[-1] + self.level_params(lvl))
        return tuple(offs)

    @property
    def table_size(self) -> int:
        return self.offsets[-1]

    @property
    def output_dim(self) -> int:
        return self.num_levels * self.level_dim

    def level_scale(self, level: int) -> float:
        # exp2f(level * S) * H - 1 (gridencoder/src/gridencoder.cu:126)
        return math.exp2(level * self.log2_scale) * self.base_resolution - 1.0

    def level_resolution(self, level: int) -> int:
        return int(math.ceil(self.level_scale(level))) + 1

    def init(self, key, std: float = 1e-4, dtype=jnp.float32):
        """Initialise the parameter table ~ U(-std, std) (grid.py:133-134)."""
        return jax.random.uniform(
            key, (self.table_size, self.level_dim), dtype=dtype,
            minval=-std, maxval=std)


def _level_corner_indices(spec: HashGridSpec, level: int, pos_grid):
    """Table row index for each of the 2**D corner positions of one level.

    pos_grid: int32 [..., 2**D, D] integer corner coordinates.
    Returns int32 [..., 2**D] row indices into the *global* table.
    """
    D = spec.input_dim
    hashmap_size = spec.level_params(level)
    res = spec.level_resolution(level)
    side = res if spec.align_corners else res + 1

    # Dense (tiled) indexing while the stride still fits in the table; the
    # loop bound is static because side/hashmap_size are static.
    # (gridencoder/src/gridencoder.cu:55-72)
    stride = 1
    index = jnp.zeros(pos_grid.shape[:-1], dtype=jnp.uint32)
    use_dims = 0
    for d in range(D):
        if stride > hashmap_size:
            break
        index = index + pos_grid[..., d].astype(jnp.uint32) * np.uint32(stride)
        stride *= side
        use_dims += 1

    if spec.gridtype == "hash" and stride > hashmap_size:
        h = jnp.zeros(pos_grid.shape[:-1], dtype=jnp.uint32)
        for d in range(D):
            h = h ^ (pos_grid[..., d].astype(jnp.uint32)
                     * np.uint32(_HASH_PRIMES[d]))
        index = h

    index = index % np.uint32(hashmap_size)
    return index.astype(jnp.int32) + np.int32(spec.offsets[level])


def _corner_offsets(D: int) -> np.ndarray:
    """[2**D, D] binary corner offsets."""
    idx = np.arange(2 ** D, dtype=np.int32)
    return np.stack([(idx >> d) & 1 for d in range(D)], axis=-1)


@partial(jax.jit, static_argnames=("spec", "compute_dtype"))
def hash_encode(inputs, embeddings, spec: HashGridSpec,
                compute_dtype=jnp.float32):
    """Encode points with a multiresolution hash grid.

    Args:
      inputs: [..., D] coordinates in [0, 1] (out-of-range points encode to
        zeros, matching gridencoder.cu:98-123).
      embeddings: [table_size, C] parameter table.
      spec: static grid configuration.
      compute_dtype: dtype of the interpolation arithmetic / output.

    Returns:
      [..., L * C] features, level-major within the last axis (level 0's C
      channels first), matching the reference's ``[B, L*C]`` layout
      (gridencoder/grid.py:52).
    """
    D = spec.input_dim
    prefix = inputs.shape[:-1]
    x = inputs.reshape(-1, D)
    B = x.shape[0]

    oob = jnp.any((x < 0.0) | (x > 1.0), axis=-1, keepdims=True)
    corners = jnp.asarray(_corner_offsets(D))  # [2**D, D]

    # Per-level gather + immediate weighted reduction: peak live memory is
    # one level's [B, 2**D, C] gather (freed after its reduction) instead
    # of a stacked [B, L, 2**D, C] tensor -- at 10^6 samples x 16 levels
    # that is the difference between ~0.2 GB and ~3 GB of residuals.
    outs = []
    for level in range(spec.num_levels):
        scale = spec.level_scale(level)
        shift = 0.0 if spec.align_corners else 0.5
        pos = x * scale + shift                       # [B, D]
        pos_floor = jnp.floor(pos)
        frac = (pos - pos_floor).astype(compute_dtype)
        pos_grid = pos_floor.astype(jnp.int32)

        # [B, 2**D, D] integer corner coordinates
        corner_pos = pos_grid[:, None, :] + corners[None, :, :]
        idx = _level_corner_indices(spec, level, corner_pos)  # [B, 2**D]

        # trilinear weights: prod over dims of (1-f) or f
        w = jnp.where(corners[None].astype(bool), frac[:, None, :],
                      1.0 - frac[:, None, :])
        w = jnp.prod(w, axis=-1)                      # [B, 2**D]

        vals = jnp.take(embeddings, idx.reshape(-1), axis=0)
        vals = vals.reshape(B, 2 ** D, spec.level_dim).astype(compute_dtype)
        outs.append(jnp.einsum("bk,bkc->bc", w, vals))

    out = jnp.concatenate(outs, axis=-1)              # [B, L*C] level-major
    out = jnp.where(oob, jnp.zeros_like(out), out)
    return out.reshape(*prefix, spec.output_dim)


def hash_encode_bound(inputs, embeddings, spec: HashGridSpec,
                      bound: float = 1.0, compute_dtype=jnp.float32):
    """Encode points given in [-bound, bound] (GridEncoder.forward,
    gridencoder/grid.py:139-155)."""
    return hash_encode((inputs + bound) / (2.0 * bound), embeddings, spec,
                       compute_dtype=compute_dtype)
