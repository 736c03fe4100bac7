"""Baked surface-texture rendering -- the round-5 curved fast path.

Why: the curved frame is gather-ISSUE-bound, not bandwidth-bound.  Each
sample pays ~8 hash-row indices (feature pyramid) + 1 phi row + 1 anchor
row at ~13 ns/index, and the cost is *per index*, independent of row
width (<= 128 lanes) and of access pattern -- coherence buys nothing,
only FEWER indices do (measured: scripts/_r5_gather_locality.py, v5e).

But the surface embedding x_embed and the phi embedding are functions of
the surface point alone, and the render-time chart p_sur(x) is piecewise
planar per anchor cell (RenderConfig.anchor_per_sample) -- so the whole
encode can be precomputed ("baked") into small per-chart 2D texture
tiles once per trained state.  Render-time encoding then collapses to
ONE corner-packed atlas row per sample: 2x2 bilinear corners x
(16 feature + 8 phi) channels = 96 bf16 lanes in a 128-lane row.
This is literally texture-mapped rendering of the learned texture --
the TPU-native reading of "NeRF-Texture".

Chart/tile bookkeeping rides the column-collapsed anchor table
(geometry.projector.build_anchor_table collapse_columns=True): all cells
of a normal column share one chart, so the number of distinct tiles is
the number of SURFACE cells (~20K at 128^3 on the bench scene), not the
shell volume (~180K).

Exactness: with matching charts the baked lookup reproduces
x_embed(p_sur(x)) up to bilinear interpolation at texel size
2r/(T-1) ~= the hash pyramid's finest resolution (T=16 -> ~1/1100 of
the [-1, 1] span at 128^3), and is trained-chart-consistent by
construction.  Cells without a tile (outside the baked set) render as
empty space via the h_mask gate.

Replaces (at inference): gridencoder kernel_grid
(/root/reference/gridencoder/src/gridencoder.cu:76) + the phi grid of
Factorized_Normal_Net (/root/reference/tools/map.py:235) with a texture
fetch; the reference has no analogous bake for live rendering (its
closest machinery is the unhash UV-atlas bake, tools/map.py:875-910).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
class BakedAtlas:
    """Device arrays + STATIC metadata of a baked feature atlas.

    Registered as a custom pytree: the arrays are children (traced under
    jit), the layout metadata is aux data (stays Python ints/floats, so
    `bake.T`-style uses inside jitted code remain static)."""

    def __init__(self, tile_of_cell, atlas, anchors, T: int,
                 extent: float, n_channels: int, grid_size: int,
                 bound: float):
        self.tile_of_cell = tile_of_cell  # [H^3] int32, -1 = no tile
        self.atlas = atlas        # [n_rows, 128] bf16 corner-packed
        self.anchors = anchors    # [n_tiles_pad, 12]: p0[3] t[3] b[3] n[3]
        self.T = T
        self.extent = extent
        self.n_channels = n_channels
        self.grid_size = grid_size
        self.bound = bound

    def tree_flatten(self):
        return ((self.tile_of_cell, self.atlas, self.anchors),
                (self.T, self.extent, self.n_channels, self.grid_size,
                 self.bound))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)


def _orthonormal_frame(p0, normal, tangent):
    """(t_hat, b_hat) spanning the plane perpendicular to `normal`.

    The vertex TBN's tangent row is not exactly orthogonal to the
    kNN-weighted anchor normal; bake and lookup must agree on the SAME
    in-plane axes, so both call this."""
    n = normal / (np.linalg.norm(normal, axis=-1, keepdims=True) + 1e-9
                  if isinstance(normal, np.ndarray) else
                  jnp.linalg.norm(normal, axis=-1, keepdims=True) + 1e-9)
    xp = np if isinstance(normal, np.ndarray) else jnp
    t = tangent - xp.sum(tangent * n, -1, keepdims=True) * n
    tn = xp.linalg.norm(t, axis=-1, keepdims=True)
    # degenerate tangent (|| normal): fall back to any perpendicular
    alt = xp.stack([n[..., 1] - n[..., 2], n[..., 2] - n[..., 0],
                    n[..., 0] - n[..., 1]], -1)
    t = xp.where(tn > 1e-6, t / (tn + 1e-12),
                 alt / (xp.linalg.norm(alt, axis=-1, keepdims=True)
                        + 1e-12))
    b = xp.cross(n, t)
    return t, b


def plan_bake(anchor_tab, occ, grid_size: int, bound: float, *,
              T: int = 16, tile_bucket: int = 2048):
    """Host-side bake plan from the (collapsed) anchor table + occupancy.

    Returns (tile_of_cell [H^3] int32 numpy, tile_anchor_rows
    [n_tiles, 16] numpy, n_tiles).  Tiles are allocated for the surface
    cells referenced by occupied-or-neighboring cells that pass the
    anchor hit gate."""
    H = grid_size
    tab = np.asarray(anchor_tab).reshape(-1, 16)
    occ_np = np.asarray(occ).reshape(-1)
    if occ_np.size != H ** 3:                      # cascades > 1: casc 0
        occ_np = occ_np[:H ** 3]
    g = (occ_np > 0).reshape(H, H, H)
    for ax in range(3):                            # 1-cell dilation: the
        g = g | np.roll(g, 1, ax) | np.roll(g, -1, ax)  # proxy trilinear
    sel = g.reshape(-1) & (tab[:, 15] > 0.5)
    # surface cell of each selected cell = the cell containing its p0
    cell = np.clip(((tab[:, 0:3] + bound) * (H / (2.0 * bound)))
                   .astype(np.int64), 0, H - 1)
    surf = (cell[:, 0] * H + cell[:, 1]) * H + cell[:, 2]
    uniq, inv = np.unique(surf[sel], return_inverse=True)
    tile_of_cell = np.full(H ** 3, -1, np.int32)
    tile_of_cell[np.where(sel)[0]] = inv.astype(np.int32)
    # chart of tile t = anchor row of its surface cell
    rows = tab[uniq]
    return tile_of_cell, rows, len(uniq)


def bake_atlas(encode_fn, anchor_tab, occ, grid_size: int, bound: float,
               *, T: int = 16, n_channels: int, chunk_tiles: int = 1024,
               tile_bucket: int = 1024, max_bytes: float = 8e9,
               encode_args=(), extent_scale: float = 1.0):
    """Build a BakedAtlas by evaluating `encode_fn` on every texel.

    encode_fn: ([P, 3] world points, *encode_args) -> [P, n_channels]
    f32 (the feature + phi embedding chain).  Pass the parameter arrays
    through `encode_args`, NOT as closure captures: the update program
    is jitted, and closure-captured tables become HLO literals -- a
    200 MB constant blob that the remote compiler rejects (HTTP 413).

    The whole bake runs ON DEVICE: texel positions, encoding, corner
    packing and the atlas writes happen inside one jitted update program
    per tile chunk (donated atlas, dynamic_update_slice) -- only the
    small per-chunk anchor rows cross the host link.  A host-side bake
    measured 98 s through the tunnel (2 GB atlas upload + per-chunk
    round trips); this one is bounded by the ~#texels encode itself.

    The atlas row layout is corner-packed (dens8-style): row r of tile k
    at texel (i, j) holds the 2x2 block (i..i+1, j..j+1, clamped at the
    tile edge) x n_channels, so a bilinear read is ONE gather."""
    tile_of_cell, rows, n_tiles = plan_bake(anchor_tab, occ, grid_size,
                                            bound, T=T)
    if n_tiles == 0:
        raise ValueError("bake: no tiles (empty occupancy or no anchors)")
    # Tile coverage: +- half the cell diagonal of tangent offset around
    # the chart origin.  With collapsed columns, a sample from a
    # LATERALLY-offset cell of the same chart can exceed this and clamps
    # to the tile border -- measured harmless on the bench scene (baked
    # PSNR +0.3 dB OVER the live field; border samples are rare and the
    # bilinear tap denoises), but `extent_scale` widens coverage (at
    # proportionally coarser texels) if a scene shows border artifacts.
    cell = 2.0 * bound / grid_size
    r = extent_scale * cell * np.sqrt(3.0) / 2.0
    extent = 2.0 * r * T / (T - 1)
    bucket = max(tile_bucket, chunk_tiles)
    n_pad = -(-n_tiles // bucket) * bucket
    bytes_est = n_pad * T * T * 256
    if bytes_est > max_bytes:
        raise ValueError(f"bake atlas too large: {bytes_est/1e9:.1f} GB "
                         f"({n_tiles} tiles x {T}x{T}); raise max_bytes "
                         "or lower T")
    p0 = rows[:, 0:3]
    t_hat, b_hat = _orthonormal_frame(p0, rows[:, 3:6], rows[:, 6:9])
    rows9 = np.concatenate([p0, t_hat, b_hat], axis=-1).astype(np.float32)
    rows9 = np.pad(rows9, ((0, n_pad - n_tiles), (0, 0)), mode="edge")
    C = n_channels
    frac = ((np.arange(T, dtype=np.float32) + 0.5) / T - 0.5) * extent

    def update(atlas, rows_chunk, start, *eargs):
        p0c = rows_chunk[:, 0:3]
        tc = rows_chunk[:, 3:6]
        bc = rows_chunk[:, 6:9]
        f = jnp.asarray(frac)
        pts = (p0c[:, None, None, :]
               + f[None, :, None, None] * tc[:, None, None, :]
               + f[None, None, :, None] * bc[:, None, None, :])
        vals = encode_fn(pts.reshape(-1, 3), *eargs).reshape(
            chunk_tiles, T, T, C)
        # corner-pack: (i, j) row <- (i, j), (i, j+1), (i+1, j), (i+1,j+1)
        jp = jnp.concatenate([vals[:, :, 1:], vals[:, :, -1:]], axis=2)
        ip = jnp.concatenate([vals[:, 1:], vals[:, -1:]], axis=1)
        ijp = jnp.concatenate([ip[:, :, 1:], ip[:, :, -1:]], axis=2)
        packed = jnp.concatenate([vals, jp, ip, ijp], axis=-1)
        packed = packed.reshape(chunk_tiles * T * T, 4 * C)
        packed = jnp.pad(packed, ((0, 0), (0, 128 - 4 * C))).astype(
            jnp.bfloat16)
        return jax.lax.dynamic_update_slice(atlas, packed,
                                            (start * T * T, 0))

    update_jit = jax.jit(update, donate_argnums=0)
    atlas = jnp.zeros((n_pad * T * T, 128), jnp.bfloat16)
    for start in range(0, n_pad, chunk_tiles):
        atlas = update_jit(atlas,
                           jnp.asarray(rows9[start:start + chunk_tiles]),
                           jnp.asarray(start, jnp.int32), *encode_args)
    anchors = np.zeros((n_pad, 12), np.float32)
    anchors[:n_tiles] = np.concatenate([p0, t_hat, b_hat, rows[:, 3:6]],
                                       axis=-1)
    return BakedAtlas(
        tile_of_cell=jnp.asarray(tile_of_cell),
        atlas=atlas,
        anchors=jnp.asarray(anchors),
        T=T, extent=float(extent), n_channels=C,
        grid_size=grid_size, bound=bound)


@jax.jit
def extend_anchor_table(anchor_tab, tile_of_cell, anchors):
    """Anchor table + bake plan -> [H^3, 24] rows with tile addressing.

    Folds the tile id and the tile's in-plane axes into the row the
    anchor gather already fetches, so the baked render pays ONE row
    gather per sample for chart + tile lookup (instead of anchor row +
    tile id + tile axes = three).  Columns: 0:16 anchor row (p0, normal,
    tbn, hit); 16 tile id (float, -1 = none); 17:20 t_hat; 20:23 b_hat;
    23 pad."""
    tab = anchor_tab.reshape(-1, 16)
    k = tile_of_cell
    ar = jnp.take(anchors, jnp.maximum(k, 0), axis=0)
    return jnp.concatenate(
        [tab, k[:, None].astype(jnp.float32), ar[:, 3:6], ar[:, 6:9],
         jnp.zeros_like(tab[:, :1])], axis=1)


def anchor_frames_ext(bake: BakedAtlas, table_ext, x_seed, seed_valid):
    """Per-sample frames + tile addressing via ONE width-24 gather."""
    H, b = bake.grid_size, bake.bound
    cell = jnp.clip(((x_seed + b) * (H / (2.0 * b))).astype(jnp.int32),
                    0, H - 1)
    flat = (cell[..., 0] * H + cell[..., 1]) * H + cell[..., 2]
    rows = jnp.take(table_ext, flat, axis=0)
    return {"p0": rows[:, 0:3], "normal": rows[:, 3:6],
            "tbn": rows[:, 6:15].reshape(-1, 3, 3),
            "hit": seed_valid & (rows[:, 15] > 0.5),
            "tile": rows[:, 16].astype(jnp.int32),
            "t_hat": rows[:, 17:20], "b_hat": rows[:, 20:23]}


def lookup(bake: BakedAtlas, frames, x):
    """Bilinear atlas read at the chart coordinates of x.

    frames: the per-sample anchor dict (p0/normal/tbn/hit) ALREADY
    gathered -- the same rows the field path uses, so the chart agrees
    with training.  When frames carries tile addressing ('tile'/'t_hat'/
    'b_hat' from `anchor_frames_ext`), no further gather is needed;
    otherwise the tile id and axes are fetched here (two extra gathers).
    Returns (values [N, C] f32, ok [N] bool)."""
    H, T, C = bake.grid_size, bake.T, bake.n_channels
    b = bake.bound
    if "tile" in frames:
        k = frames["tile"]
        ok = k >= 0
        ks = jnp.maximum(k, 0)
        p0 = frames["p0"]
        t_hat, b_hat = frames["t_hat"], frames["b_hat"]
    else:
        cell = jnp.clip(((x + b) * (H / (2.0 * b))).astype(jnp.int32),
                        0, H - 1)
        flat = (cell[..., 0] * H + cell[..., 1]) * H + cell[..., 2]
        k = jnp.take(bake.tile_of_cell, flat)              # [N]
        ok = k >= 0
        ks = jnp.maximum(k, 0)
        # the tile's OWN axes (per tile, not per sample: identical for
        # all samples of a chart, and exactly what the bake used)
        arow = jnp.take(bake.anchors, ks, axis=0)          # [N, 12]
        p0, t_hat, b_hat = arow[:, 0:3], arow[:, 3:6], arow[:, 6:9]
    delta = x - p0
    # t_hat/b_hat are perpendicular to the chart normal, so the height
    # component of delta drops out automatically
    u = jnp.sum(delta * t_hat, -1) / bake.extent + 0.5
    v = jnp.sum(delta * b_hat, -1) / bake.extent + 0.5
    xt = jnp.clip(u * T - 0.5, 0.0, T - 1.0)
    yt = jnp.clip(v * T - 0.5, 0.0, T - 1.0)
    i0 = jnp.minimum(xt.astype(jnp.int32), T - 2)
    j0 = jnp.minimum(yt.astype(jnp.int32), T - 2)
    fu = (xt - i0)[:, None]
    fv = (yt - j0)[:, None]
    row = (ks * T + i0) * T + j0
    rows = jnp.take(bake.atlas, row, axis=0).astype(jnp.float32)
    c00 = rows[:, 0:C]
    c01 = rows[:, C:2 * C]
    c10 = rows[:, 2 * C:3 * C]
    c11 = rows[:, 3 * C:4 * C]
    val = ((1 - fu) * ((1 - fv) * c00 + fv * c01)
           + fu * ((1 - fv) * c10 + fv * c11))
    return jnp.where(ok[:, None], val, 0.0), ok
