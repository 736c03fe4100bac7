"""Packed (bricked) multiresolution hash encoding -- the fast TPU path.

Why this exists: XLA-on-TPU gathers cost ~4 ns *per index* and scatters
~43 ns *per update* regardless of row width (measured on v5e; rows are
padded to 128 lanes so narrow gathers also waste 64x bandwidth).  The
classic Instant-NGP layout (one table row per corner,
``ops/hashgrid.py``) therefore issues 2**D * L gathers per sample --
~100M per train step -- and its scatter-add backward is ~10x worse.

The packed layout cuts the index count by 2**D:

* parameters are stored per *brick* of 2**D cells; one table row holds the
  brick's full corner lattice, 3**D corner points x C channels
  (27C floats in 3D, 9C in 2D);
* any trilinear stencil (2**D corners) of any cell inside a brick is
  contained in that brick's 3**D lattice, so encoding needs exactly ONE
  row gather per sample per level;
* corner selection inside the row is branch-free vector math: the 1D
  weight of lattice offset o in {0,1,2} for a point with local cell l in
  {0,1} and fraction f is  (o==l)(1-f) + (o==l+1)f;  the 3**D weights are
  the outer product, and the feature is one small einsum;
* the backward for the table is a custom VJP: sort the per-sample brick
  ids, aggregate duplicate rows with a cumsum + boundary gather (no
  scatter), and scatter-add only the <= min(B, table_rows) unique rows.

Hash collisions happen at brick granularity (2**D cells share a fate);
compensate with a larger brick count (log2_bricks) -- total parameters are
what the HBM pays for, and index count is what the step time pays for.

Reference semantics being replaced: gridencoder/src/gridencoder.cu
(kernel_grid :76, kernel_grid_backward :228).  The pure-XLA
``ops/hashgrid.py`` remains as the arbitrarily-differentiable reference
path (used where grad-of-grad through the encoder is required).
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .hashgrid import _HASH_PRIMES


@dataclasses.dataclass(frozen=True)
class PackedGridSpec:
    """Static configuration of a packed (bricked) multires hash grid."""

    input_dim: int = 3
    num_levels: int = 8
    level_dim: int = 4
    base_resolution: int = 16
    log2_bricks: int = 16          # max bricks per hash level
    per_level_scale: float = 2.0
    desired_resolution: int | None = None
    align_corners: bool = True

    def __post_init__(self):
        if self.desired_resolution is not None:
            scale = math.exp2(
                math.log2(self.desired_resolution / self.base_resolution)
                / max(self.num_levels - 1, 1))
            object.__setattr__(self, "per_level_scale", scale)

    @property
    def log2_scale(self) -> float:
        return math.log2(self.per_level_scale)

    @property
    def lattice(self) -> int:
        return 3 ** self.input_dim

    @property
    def row_width(self) -> int:
        return self.lattice * self.level_dim

    @property
    def storage_width(self) -> int:
        """Row width padded to the 128-lane tile.

        A [rows, 54] f32 table wastes 58% of each (8, 128) tile in
        row-major layout, so XLA flips it column-major -- which turns
        the backward scatter-add row-strided (382 ms vs ~50 ms for
        2.1M x 54 updates; 68% of a curved train step).  Padding rows
        to full tiles keeps the table row-major: contiguous scatter
        rows at the cost of extra HBM (2.4x for C=2, 1.2x for C=4)."""
        return int(math.ceil(self.row_width / 128) * 128)

    def level_scale(self, level: int) -> float:
        return (math.exp2(level * self.log2_scale)
                * self.base_resolution - 1.0)

    def level_resolution(self, level: int) -> int:
        return int(math.ceil(self.level_scale(level))) + 1

    def level_brick_side(self, level: int) -> int:
        """Bricks per axis if stored dense."""
        # cells are floor(pos) in [0, res-1]; bricks cover cell>>1
        return (self.level_resolution(level) + 1) // 2 + 1

    def level_bricks(self, level: int) -> int:
        side = self.level_brick_side(level)
        n = min(2 ** self.log2_bricks, side ** self.input_dim)
        return int(math.ceil(n / 8) * 8)

    def level_is_dense(self, level: int) -> bool:
        side = self.level_brick_side(level)
        return side ** self.input_dim <= 2 ** self.log2_bricks

    @property
    def offsets(self) -> tuple[int, ...]:
        offs = [0]
        for lvl in range(self.num_levels):
            offs.append(offs[-1] + self.level_bricks(lvl))
        return tuple(offs)

    @property
    def table_rows(self) -> int:
        return self.offsets[-1]

    @property
    def output_dim(self) -> int:
        return self.num_levels * self.level_dim

    def init(self, key, std: float = 1e-4, dtype=jnp.float32):
        return jax.random.uniform(
            key, (self.table_rows, self.storage_width), dtype=dtype,
            minval=-std, maxval=std)

    @property
    def dual_storage_width(self) -> int:
        """Lanes for a table that co-stores a SECOND channel group per
        brick (e.g. feature mean + log-variance): group 0 in lanes
        [0, row_width), group 1 in [row_width, 2*row_width).  For C=2 the
        dual row (108 lanes) still fits the single 128-lane tile, so the
        second group rides entirely in lanes the gather already fetched
        as padding."""
        return int(math.ceil(2 * self.row_width / 128) * 128)

    def init_dual(self, key, std_a: float = 1e-4, std_b: float = 1e-5,
                  mean_b: float = 0.0, dtype=jnp.float32):
        """Init a dual table: group A (features) at std_a, group B
        (e.g. log-variance) at mean_b +/- std_b, padding lanes likewise
        (padding is never read by the encode)."""
        ka, kb = jax.random.split(key)
        rw, sw = self.row_width, self.dual_storage_width
        a = jax.random.uniform(ka, (self.table_rows, rw), dtype=dtype,
                               minval=-std_a, maxval=std_a)
        b = mean_b + jax.random.uniform(kb, (self.table_rows, sw - rw),
                                        dtype=dtype, minval=-std_b,
                                        maxval=std_b)
        return jnp.concatenate([a, b], axis=-1)


# ---------------------------------------------------------------------------
# row lookup with aggregated-scatter backward
# ---------------------------------------------------------------------------

@partial(jax.custom_vjp, nondiff_argnums=(2,))
def _rows_lookup(table, idx, n_rows: int):
    """take(table, idx, axis=0) whose backward sorts + aggregates duplicate
    rows before one bounded scatter-add (see `_rows_scatter`)."""
    return jnp.take(table, idx, axis=0)


def _rows_lookup_fwd(table, idx, n_rows):
    return jnp.take(table, idx, axis=0), idx


def _rows_lookup_bwd(n_rows, idx, g):
    return _rows_scatter(g, idx, n_rows), None


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def _rows_scatter(g, idx, n_rows: int):
    """Transpose of `_rows_lookup`: sum rows of g [B, W] into a [n_rows, W]
    table by idx, as ONE explicit 'drop'-mode scatter-add.

    Measured on v5e: a single batched scatter across all levels costs
    ~23 ns/row vs ~76 ns/row for per-level scatters (each scatter op
    carries ~10-15 ms fixed overhead), and a sort+aggregate scheme is
    slower still (sort/cumsum/searchsorted each pay per-element walls).

    The two functions are each other's custom VJPs, so differentiation of
    any order stays on these paths (needed for -grad(sigma) normals).
    """
    return jnp.zeros((n_rows, g.shape[1]), g.dtype).at[idx].add(
        g, mode="drop")


def _rows_scatter_fwd(g, idx, n_rows):
    return _rows_scatter(g, idx, n_rows), idx


def _rows_scatter_bwd(n_rows, idx, gt):
    return _rows_lookup(gt, idx, n_rows), None


_rows_lookup.defvjp(_rows_lookup_fwd, _rows_lookup_bwd)
_rows_scatter.defvjp(_rows_scatter_fwd, _rows_scatter_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def _rows_lookup_amp(table, idx, n_rows: int):
    """Mixed-precision row lookup: the gather reads a bf16 copy of the
    f32 table while the backward scatter-accumulates f32 cotangents into
    the f32 table.

    The gather is row-width-bound (measured v5e, 2.1M indices x 400K
    rows: 8.7 ms bf16 vs 24 ms f32 at 128 lanes) but the scatter is
    update-bound and bf16 does NOT help it (37 vs 32 ms) -- so this pair
    halves the read side only and keeps full-precision accumulation.
    Matches the reference's AMP treatment of the same tables (fp16
    autocast compute over fp32 master weights, gridencoder/grid.py:38-39
    + torch.cuda.amp)."""
    return jnp.take(table.astype(jnp.bfloat16), idx, axis=0)


def _rows_lookup_amp_fwd(table, idx, n_rows):
    return _rows_lookup_amp(table, idx, n_rows), idx


def _rows_lookup_amp_bwd(n_rows, idx, g):
    return _rows_scatter(g.astype(jnp.float32), idx, n_rows), None


_rows_lookup_amp.defvjp(_rows_lookup_amp_fwd, _rows_lookup_amp_bwd)


# ---------------------------------------------------------------------------
# encoding
# ---------------------------------------------------------------------------

def _brick_ids(spec: PackedGridSpec, level: int, brick):
    """Global table row for [B, D] integer brick coords of one level."""
    D = spec.input_dim
    n = spec.level_bricks(level)
    if spec.level_is_dense(level):
        side = spec.level_brick_side(level)
        idx = jnp.zeros(brick.shape[:-1], jnp.uint32)
        stride = 1
        for d in range(D):
            idx = idx + brick[..., d].astype(jnp.uint32) \
                * np.uint32(stride)
            stride *= side
    else:
        idx = jnp.zeros(brick.shape[:-1], jnp.uint32)
        for d in range(D):
            idx = idx ^ (brick[..., d].astype(jnp.uint32)
                         * np.uint32(_HASH_PRIMES[d]))
    idx = idx % np.uint32(n)
    return idx.astype(jnp.int32) + np.int32(spec.offsets[level])


_LATTICE_CACHE: dict[int, np.ndarray] = {}


def _lattice_offsets(D: int) -> np.ndarray:
    """[3**D, D] offsets in {0,1,2}**D, last dim fastest (C-order)."""
    if D not in _LATTICE_CACHE:
        grids = np.meshgrid(*([np.arange(3)] * D), indexing="ij")
        _LATTICE_CACHE[D] = np.stack([g.ravel() for g in grids], -1)
    return _LATTICE_CACHE[D]


def _indices_weights(spec: PackedGridSpec, x, compute_dtype):
    """Shared per-level brick index + lattice weight math.

    Returns (idx [L*B] int32 global rows, w [L, B, 3**D], oob [B, 1])."""
    D = spec.input_dim
    L = spec.num_levels
    lat = jnp.asarray(_lattice_offsets(D))           # [3**D, D]
    oob = jnp.any((x < 0.0) | (x > 1.0), axis=-1, keepdims=True)
    all_idx, all_w = [], []
    for level in range(L):
        scale = spec.level_scale(level)
        shift = 0.0 if spec.align_corners else 0.5
        pos = x * scale + shift
        pos_floor = jnp.floor(pos)
        frac = (pos - pos_floor).astype(compute_dtype)   # [B, D]
        cell = pos_floor.astype(jnp.int32)
        brick = cell >> 1                                # [B, D]
        local = (cell & 1).astype(compute_dtype)         # 0. or 1.
        all_idx.append(_brick_ids(spec, level, brick))   # [B]
        # per-dim weight of lattice offset o: (o==l)(1-f) + (o==l+1)f
        o = lat.astype(compute_dtype)                    # [3**D, D]
        l = local[:, None, :]                            # [B, 1, D]
        f = frac[:, None, :]
        wd = (jnp.where(o[None] == l, 1.0 - f, 0.0)
              + jnp.where(o[None] == l + 1.0, f, 0.0))   # [B, 3**D, D]
        all_w.append(jnp.prod(wd, axis=-1))              # [B, 3**D]
    return jnp.concatenate(all_idx), jnp.stack(all_w), oob


@partial(jax.jit, static_argnames=("spec", "compute_dtype", "fast",
                                   "amp"))
def packed_encode_dual(inputs, table, spec: PackedGridSpec,
                       compute_dtype=jnp.float32, fast: bool = True,
                       amp: bool = False):
    """Encode through a DUAL table (see init_dual): returns
    (group_a [..., L*C], group_b [..., L*C]) from ONE gather whose
    backward is ONE scatter.

    The second channel group (e.g. the probabilistic model's
    log-variance, tools/map.py:565-566,629-632) lives in lanes
    [row_width, 2*row_width) of the same brick rows; at C=2 those lanes
    are the tile padding the gather fetches anyway, so the second
    encoding is bandwidth-free and index-free."""
    D = spec.input_dim
    C = spec.level_dim
    L = spec.num_levels
    prefix = inputs.shape[:-1]
    x = inputs.reshape(-1, D)
    B = x.shape[0]
    idx, w, oob = _indices_weights(spec, x, compute_dtype)
    if amp and table.dtype == jnp.float32:
        rows = (_rows_lookup_amp(table, idx, spec.table_rows) if fast
                else jnp.take(table.astype(jnp.bfloat16), idx, axis=0))
    elif fast:
        rows = _rows_lookup(table, idx, spec.table_rows)
    else:
        rows = jnp.take(table, idx, axis=0)
    rows = rows[..., :2 * spec.row_width]
    rows = rows.reshape(L * B, 2, spec.lattice, C)
    if rows.dtype == jnp.bfloat16:
        out = jnp.einsum("bk,bgkc->bgc",
                         w.reshape(L * B, spec.lattice)
                         .astype(jnp.bfloat16), rows,
                         preferred_element_type=jnp.float32)
    else:
        out = jnp.einsum("bk,bgkc->bgc",
                         w.reshape(L * B, spec.lattice),
                         rows.astype(compute_dtype))
    out = out.reshape(L, B, 2, C).transpose(2, 1, 0, 3)
    out = out.reshape(2, B, spec.output_dim)             # level-major
    out = jnp.where(oob[None], jnp.zeros_like(out), out)
    shape = (*prefix, spec.output_dim)
    return out[0].reshape(shape), out[1].reshape(shape)


def packed_encode_bound_dual(inputs, table, spec: PackedGridSpec,
                             bound: float = 1.0,
                             compute_dtype=jnp.float32,
                             fast: bool = True, amp: bool = False):
    """Dual-group encode for points given in [-bound, bound]."""
    return packed_encode_dual((inputs + bound) / (2.0 * bound), table,
                              spec, compute_dtype=compute_dtype,
                              fast=fast, amp=amp)


@partial(jax.jit, static_argnames=("spec", "compute_dtype", "fast",
                                   "amp"))
def packed_encode(inputs, table, spec: PackedGridSpec,
                  compute_dtype=jnp.float32, fast: bool = True,
                  amp: bool = False):
    """Encode [..., D] points in [0, 1] -> [..., L * C] features.

    fast=True routes table lookups through the `_rows_lookup` /
    `_rows_scatter` custom-VJP pair (arbitrary-order differentiation stays
    on the fast paths); fast=False uses plain jnp.take + XLA's scatter
    transpose (reference semantics for tests).

    amp=True gathers rows in bf16 and runs the interpolation einsum on
    the MXU in bf16 with f32 accumulate, while table gradients still
    scatter-accumulate in f32 (`_rows_lookup_amp`) -- the TPU analogue
    of the reference's fp16 autocast over these tables.  Positions,
    fracs, and the f32 output are unaffected.
    """
    D = spec.input_dim
    C = spec.level_dim
    L = spec.num_levels
    prefix = inputs.shape[:-1]
    x = inputs.reshape(-1, D)
    B = x.shape[0]
    lat = jnp.asarray(_lattice_offsets(D))      # [3**D, D]

    oob = jnp.any((x < 0.0) | (x > 1.0), axis=-1, keepdims=True)

    # Per-level index + weight computation is cheap vector math; the HBM
    # work is batched into ONE gather across all levels (scatter/gather
    # ops carry ~10 ms fixed overhead each on TPU, so one big op beats L
    # small ones), whose backward is ONE batched scatter.
    all_idx, all_w = [], []
    for level in range(L):
        scale = spec.level_scale(level)
        shift = 0.0 if spec.align_corners else 0.5
        pos = x * scale + shift
        pos_floor = jnp.floor(pos)
        frac = (pos - pos_floor).astype(compute_dtype)   # [B, D]
        cell = pos_floor.astype(jnp.int32)
        brick = cell >> 1                                # [B, D]
        local = (cell & 1).astype(compute_dtype)         # 0. or 1.
        all_idx.append(_brick_ids(spec, level, brick))   # [B]

        # per-dim weight of lattice offset o: (o==l)(1-f) + (o==l+1)f
        o = lat.astype(compute_dtype)                    # [3**D, D]
        l = local[:, None, :]                            # [B, 1, D]
        f = frac[:, None, :]
        wd = (jnp.where(o[None] == l, 1.0 - f, 0.0)
              + jnp.where(o[None] == l + 1.0, f, 0.0))   # [B, 3**D, D]
        all_w.append(jnp.prod(wd, axis=-1))              # [B, 3**D]

    idx = jnp.concatenate(all_idx)                       # [L*B]
    w = jnp.stack(all_w)                                 # [L, B, 3**D]
    if amp and table.dtype == jnp.float32:
        rows = (_rows_lookup_amp(table, idx, spec.table_rows) if fast
                else jnp.take(table.astype(jnp.bfloat16), idx, axis=0))
    elif fast:
        rows = _rows_lookup(table, idx, spec.table_rows)
    else:
        rows = jnp.take(table, idx, axis=0)              # [L*B, 3**D * C]
    rows = rows[..., :spec.row_width]
    rows = rows.reshape(L * B, spec.lattice, C)
    if rows.dtype == jnp.bfloat16:
        out = jnp.einsum("bk,bkc->bc",
                         w.reshape(L * B, spec.lattice)
                         .astype(jnp.bfloat16), rows,
                         preferred_element_type=jnp.float32)
    else:
        out = jnp.einsum("bk,bkc->bc", w.reshape(L * B, spec.lattice),
                         rows.astype(compute_dtype))
    out = out.reshape(L, B, C).transpose(1, 0, 2)
    out = out.reshape(B, spec.output_dim)                # level-major
    out = jnp.where(oob, jnp.zeros_like(out), out)
    return out.reshape(*prefix, spec.output_dim)


@partial(jax.jit, static_argnames=("spec", "compute_dtype", "fast"))
def packed_encode_pair(inputs, table_a, table_b, spec: PackedGridSpec,
                       compute_dtype=jnp.float32, fast: bool = True):
    """Encode through TWO same-spec tables with ONE gather (and one
    scatter in the backward).

    The index/weight math is shared and the tables are stacked row-wise,
    so the second encoding costs only extra gather indices instead of a
    second gather + scatter pair.  NOTE: measured SLOWER than two
    separate encodes on v5e at curved-trainer scale (the per-step
    row-stack concat and its backward split outweigh the saved fixed
    costs) -- see MeshFieldConfig.pair_prob_encode, default off."""
    D = spec.input_dim
    C = spec.level_dim
    L = spec.num_levels
    prefix = inputs.shape[:-1]
    x = inputs.reshape(-1, D)
    B = x.shape[0]
    lat = jnp.asarray(_lattice_offsets(D))

    oob = jnp.any((x < 0.0) | (x > 1.0), axis=-1, keepdims=True)
    all_idx, all_w = [], []
    for level in range(L):
        scale = spec.level_scale(level)
        shift = 0.0 if spec.align_corners else 0.5
        pos = x * scale + shift
        pos_floor = jnp.floor(pos)
        frac = (pos - pos_floor).astype(compute_dtype)
        cell = pos_floor.astype(jnp.int32)
        brick = cell >> 1
        local = (cell & 1).astype(compute_dtype)
        all_idx.append(_brick_ids(spec, level, brick))
        o = lat.astype(compute_dtype)
        l = local[:, None, :]
        f = frac[:, None, :]
        wd = (jnp.where(o[None] == l, 1.0 - f, 0.0)
              + jnp.where(o[None] == l + 1.0, f, 0.0))
        all_w.append(jnp.prod(wd, axis=-1))

    R = spec.table_rows
    idx = jnp.concatenate(all_idx)                       # [L*B]
    idx2 = jnp.concatenate([idx, idx + R])               # [2*L*B]
    w = jnp.stack(all_w)                                 # [L, B, 3**D]
    tab = jnp.concatenate([table_a, table_b], axis=0)    # [2R, W]
    if fast:
        rows = _rows_lookup(tab, idx2, 2 * R)
    else:
        rows = jnp.take(tab, idx2, axis=0)
    rows = rows[..., :spec.row_width]
    rows = rows.reshape(2, L, B, spec.lattice, C).astype(compute_dtype)
    out = jnp.einsum("lbk,tlbkc->tblc", w, rows)
    out = out.reshape(2, B, spec.output_dim)
    out = jnp.where(oob[None], jnp.zeros_like(out), out)
    shape = (*prefix, spec.output_dim)
    return out[0].reshape(shape), out[1].reshape(shape)


def packed_encode_bound(inputs, table, spec: PackedGridSpec,
                        bound: float = 1.0, compute_dtype=jnp.float32,
                        fast: bool = True, amp: bool = False):
    """Encode points given in [-bound, bound]."""
    return packed_encode((inputs + bound) / (2.0 * bound), table, spec,
                         compute_dtype=compute_dtype, fast=fast, amp=amp)


def packed_encode_bound_pair(inputs, table_a, table_b,
                             spec: PackedGridSpec, bound: float = 1.0,
                             compute_dtype=jnp.float32,
                             fast: bool = True):
    """Two-table encode for points given in [-bound, bound]."""
    return packed_encode_pair((inputs + bound) / (2.0 * bound), table_a,
                              table_b, spec, compute_dtype=compute_dtype,
                              fast=fast)
