"""Occupancy / density grid state for empty-space skipping.

TPU-native re-design of the reference's density-grid machinery
(``nerf/renderer.py:110-124`` state, ``update_extra_state`` :566-662,
``mark_untrained_grid`` :501-564, and ``raymarching/src/raymarching.cu``
``kernel_packbits`` :270-291):

* state is a pure pytree (`OccupancyGrid`) carried through the train step --
  `mean_density` is a device scalar, never a host float, so grid updates run
  fully under `jit` with zero host round-trips;
* the grid is stored in plain C-order ``[cascade, H, H, H]`` (flattened)
  instead of Morton order -- XLA gathers don't benefit from Z-order
  locality;
* the "bitfield" is a uint8 0/1 array: at 128^3 x cascades it is ~2 MB/cas
  in HBM, and an unpacked gather is one op.  `packbits` is still provided
  for API/test parity with the CUDA kernel.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class OccupancyGrid(NamedTuple):
    """Density-grid state (a pytree; all fields are device arrays)."""

    density: jax.Array       # [cascade, H**3] float32; -1 marks untrained
    occ: jax.Array           # [cascade * H**3] uint8 0/1 occupancy
    mean_density: jax.Array  # [] float32
    iter_density: jax.Array  # [] int32

    @property
    def cascades(self) -> int:
        return self.density.shape[0]


def create(grid_size: int = 128, cascades: int = 1) -> OccupancyGrid:
    return OccupancyGrid(
        density=jnp.zeros((cascades, grid_size ** 3), jnp.float32),
        occ=jnp.zeros((cascades * grid_size ** 3,), jnp.uint8),
        mean_density=jnp.zeros((), jnp.float32),
        iter_density=jnp.zeros((), jnp.int32),
    )


def grid_coords(grid_size: int) -> jnp.ndarray:
    """[H**3, 3] int32 integer cell coords in C-order (x-major).

    Built in-graph from iota (NOT a host constant: a 128^3 x 3 numpy array
    would be embedded verbatim in the compiled executable, bloating it by
    tens of MB and stalling program upload)."""
    H = grid_size
    idx = jnp.arange(H ** 3, dtype=jnp.int32)
    return jnp.stack([idx // (H * H), (idx // H) % H, idx % H], axis=-1)


def cell_index(coords, grid_size: int):
    """C-order flat index of [..., 3] integer cell coords."""
    return ((coords[..., 0] * grid_size + coords[..., 1]) * grid_size
            + coords[..., 2])


def update(state: OccupancyGrid, density_fn, key, *, grid_size: int,
           cascades: int, bound: float, density_thresh: float = 0.01,
           density_scale: float = 1.0, decay: float = 0.95,
           full: bool = True, chunk: int = 131072) -> OccupancyGrid:
    """EMA-refresh the density grid and recompute the occupancy mask.

    Matches reference ``update_extra_state`` (nerf/renderer.py:566-662):
    query density at a jittered point per cell, EMA ``max(old * decay, new)``
    where both are valid, threshold at ``min(mean_density, density_thresh)``.

    ``full=False`` is the partial update: H**3/4 uniform cells plus H**3/4
    cells drawn from the currently-occupied distribution (the reference's
    ``torch.nonzero`` + randint resample, renderer.py:611-637, re-expressed
    as a categorical draw so it stays fixed-shape under jit).

    Args:
      density_fn: callable [N, 3] -> [N] raw sigma (before density_scale).
    """
    H = grid_size
    coords_all = grid_coords(H)                       # [H^3, 3]
    tmp = -jnp.ones_like(state.density)

    if full:
        n_cas = cascades
        for cas in range(n_cas):
            k1, key = jax.random.split(key)
            cas_bound = min(2 ** cas, bound)
            half = cas_bound / H
            xyz = 2.0 * (coords_all.astype(jnp.float32) + 0.5) / H - 1.0
            # renderer.py uses coords/(H-1)*2-1 then scales by (bound-half);
            # we use the cell-center convention which covers the same cubes.
            xyz = xyz * (cas_bound - half) / (1.0 - 1.0 / H)
            noise = jax.random.uniform(k1, xyz.shape, minval=-half,
                                       maxval=half)
            pts = xyz + noise
            sig = _chunked_density(density_fn, pts, chunk) * density_scale
            tmp = tmp.at[cas].set(sig)
    else:
        n = (H ** 3) // 4
        for cas in range(cascades):
            k1, k2, k3, key = jax.random.split(key, 4)
            # uniform cells
            idx_u = jax.random.randint(k1, (n,), 0, H ** 3)
            # occupied cells: uniform WITHOUT replacement via random-key
            # argsort (occupied cells sort first, each with a random key).
            # jax.random.categorical over H^3 logits would stream
            # n * H^3 ~ 10^12 gumbel+argmax lanes (~26 s/update measured);
            # this is one [H^3] sort (~10 ms).
            u = jax.random.uniform(k2, (H ** 3,))
            idx_o = jnp.argsort(
                jnp.where(state.density[cas] > 0, u, 2.0 + u))[:n]
            idx = jnp.concatenate([idx_u, idx_o])
            coords = coords_all[idx]
            cas_bound = min(2 ** cas, bound)
            half = cas_bound / H
            xyz = 2.0 * (coords.astype(jnp.float32) + 0.5) / H - 1.0
            xyz = xyz * (cas_bound - half) / (1.0 - 1.0 / H)
            noise = jax.random.uniform(k3, xyz.shape, minval=-half,
                                       maxval=half)
            sig = _chunked_density(density_fn, xyz + noise,
                                   chunk) * density_scale
            tmp = tmp.at[cas, idx].set(sig)

    return _finalize_update(state, tmp, decay, density_thresh)


def _chunked_density(density_fn, pts, chunk: int):
    if not chunk or pts.shape[0] <= chunk:
        return density_fn(pts).reshape(-1)
    n = pts.shape[0]
    pad = (-n) % chunk
    pts_p = jnp.pad(pts, ((0, pad), (0, 0)))
    pts_c = pts_p.reshape(-1, chunk, 3)
    sig = jax.lax.map(lambda p: density_fn(p).reshape(-1), pts_c)
    return sig.reshape(-1)[:n]


def chunk_points(start, key, *, grid_size: int, cas: int, bound: float,
                 chunk: int):
    """Jittered cell-center sample points for cells [start, start+chunk)
    of cascade `cas` (the per-chunk piece of the full update)."""
    H = grid_size
    idx = start + jnp.arange(chunk, dtype=jnp.int32)
    idx = jnp.minimum(idx, H ** 3 - 1)
    coords = jnp.stack([idx // (H * H), (idx // H) % H, idx % H],
                       axis=-1)
    cas_bound = min(2 ** cas, bound)
    half = cas_bound / H
    xyz = 2.0 * (coords.astype(jnp.float32) + 0.5) / H - 1.0
    xyz = xyz * (cas_bound - half) / (1.0 - 1.0 / H)
    noise = jax.random.uniform(key, xyz.shape, minval=-half, maxval=half)
    return xyz + noise


def cell_points(cell_ids, key, *, grid_size: int, cas: int, bound: float):
    """Jittered cell-center points for explicit cell ids [chunk]."""
    H = grid_size
    coords = jnp.stack([cell_ids // (H * H), (cell_ids // H) % H,
                        cell_ids % H], axis=-1)
    cas_bound = min(2 ** cas, bound)
    half = cas_bound / H
    xyz = 2.0 * (coords.astype(jnp.float32) + 0.5) / H - 1.0
    xyz = xyz * (cas_bound - half) / (1.0 - 1.0 / H)
    noise = jax.random.uniform(key, xyz.shape, minval=-half, maxval=half)
    return xyz + noise


def update_host_sparse(state: OccupancyGrid, chunk_sigma_fn, key,
                       cell_ids: np.ndarray, *, grid_size: int,
                       cascades: int, density_thresh: float = 0.01,
                       decay: float = 0.95,
                       chunk: int = 65536) -> OccupancyGrid:
    """Full refresh restricted to a precomputed near-surface cell set
    (MeshProjector.near_cell_indices); every other cell's density is
    identically 0 (shell mask), so `tmp` starts at 0 there and the EMA
    still sees a full valid update.
    """
    H = grid_size
    tmp = np.zeros((cascades, H ** 3), np.float32)
    n = len(cell_ids)
    for cas in range(cascades):
        for start in range(0, n, chunk):
            ids = cell_ids[start:start + chunk]
            pad = chunk - len(ids)
            if pad:
                ids = np.concatenate([ids, np.zeros(pad, ids.dtype)])
            key, k = jax.random.split(key)
            sig = np.asarray(chunk_sigma_fn(jnp.asarray(ids), k, cas))
            tmp[cas, cell_ids[start:start + chunk]] = \
                sig[:chunk - pad if pad else chunk]
    return _finalize_update(state, jnp.asarray(tmp), decay,
                            density_thresh)


def update_host(state: OccupancyGrid, chunk_sigma_fn, key, *,
                grid_size: int, cascades: int,
                density_thresh: float = 0.01, decay: float = 0.95,
                chunk: int = 131072) -> OccupancyGrid:
    """Full grid refresh with a HOST-side chunk loop.

    Heavy density functions (the curved field's projection + encode chain)
    inside a device-side `lax.map` can hang/crash the TPU runtime and blow
    compile time; this variant dispatches one jitted chunk program per
    slice from the host (the update runs every 16 steps, so ~16 dispatch
    overheads are negligible) and finishes with a jitted EMA/threshold.

    Args:
      chunk_sigma_fn: (start, key, cas) -> [chunk] scaled sigmas.  Must be
        a pre-jitted module-level function (so it compiles once, not per
        update).
    """
    H = grid_size
    tmp = np.zeros((cascades, H ** 3), np.float32)
    for cas in range(cascades):
        for start in range(0, H ** 3, chunk):
            key, k = jax.random.split(key)
            sig = np.asarray(chunk_sigma_fn(jnp.asarray(start), k, cas))
            end = min(start + chunk, H ** 3)
            tmp[cas, start:end] = sig[:end - start]
    return _finalize_update(state, jnp.asarray(tmp), decay,
                            density_thresh)


@jax.jit
def _finalize_update(state: OccupancyGrid, tmp, decay, density_thresh):
    """EMA merge, reference parity (nerf/renderer.py:645-648): cells both
    trained (density >= 0) and re-sampled this update (tmp >= 0) take
    ``max(density * decay, tmp)``; every other cell keeps its value.
    Full updates resample everything, so all trained cells decay there
    (which is how empty space carves out); partial/sparse updates leave
    un-resampled content untouched instead of silently decaying it below
    the occupancy threshold.  Untrained cells stay at -1."""
    valid = (state.density >= 0) & (tmp >= 0)
    density = jnp.where(valid,
                        jnp.maximum(state.density * decay, tmp),
                        state.density)
    mean_density = jnp.mean(jnp.clip(density, 0.0, None))
    thresh = jnp.minimum(mean_density, density_thresh)
    occ = (density.reshape(-1) > thresh).astype(jnp.uint8)
    return OccupancyGrid(density=density, occ=occ,
                         mean_density=mean_density,
                         iter_density=state.iter_density + 1)


@partial(jax.jit, static_argnames=("grid_size", "cascades", "bound"))
def mark_untrained(state: OccupancyGrid, poses, intrinsics, *,
                   grid_size: int, cascades: int,
                   bound: float) -> OccupancyGrid:
    """Mark grid cells seen by no training camera as density -1.

    Vectorized port of reference ``mark_untrained_grid``
    (nerf/renderer.py:501-564): a cell survives if it lies in front of some
    camera and inside its viewing frustum (with a half-cell-size margin).

    Args:
      poses: [B, 4, 4] cam2world.
      intrinsics: [4] (fx, fy, cx, cy).
    """
    H = grid_size
    fx, fy, cx, cy = (intrinsics[0], intrinsics[1], intrinsics[2],
                      intrinsics[3])
    coords = grid_coords(H).astype(jnp.float32)       # [H^3, 3]
    world = 2.0 * coords / (H - 1) - 1.0              # [-1, 1]

    density = state.density
    rot = poses[:, :3, :3]                            # [B, 3, 3]
    trans = poses[:, :3, 3]                           # [B, 3]
    for cas in range(cascades):
        cas_bound = min(2 ** cas, bound)
        half = cas_bound / H
        pts = world * (cas_bound - half)              # [H^3, 3]
        # world -> cam: (p - t) @ R  (c2w rotation applied transposed)
        cam = jnp.einsum("nc,bcd->bnd", pts, rot) - jnp.einsum(
            "bc,bcd->bd", trans, rot)[:, None, :]     # [B, H^3, 3]
        in_z = cam[..., 2] > 0
        in_x = jnp.abs(cam[..., 0]) < cx / fx * cam[..., 2] + half * 2
        in_y = jnp.abs(cam[..., 1]) < cy / fy * cam[..., 2] + half * 2
        seen = jnp.any(in_z & in_x & in_y, axis=0)    # [H^3]
        density = density.at[cas].set(
            jnp.where(seen, density[cas], -1.0))
    return state._replace(density=density)


def packbits(grid, density_thresh):
    """Pack a float grid into a uint8 bitfield, 8 cells per byte.

    Parity op for ``kernel_packbits`` (raymarching/src/raymarching.cu:
    270-291): bit i of byte n is ``grid[8n + i] > thresh``.
    """
    g = grid.reshape(-1, 8)
    bits = (g > density_thresh).astype(jnp.uint32)
    weights = jnp.asarray([1, 2, 4, 8, 16, 32, 64, 128], jnp.uint32)
    packed = jnp.sum(bits * weights, axis=-1)
    return packed.astype(jnp.uint8)
