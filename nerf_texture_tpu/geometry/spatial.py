"""Grid-hash spatial index: the TPU geometry engine.

One uniform-voxel index replaces three CUDA libraries of the reference
(SURVEY.md 2.1): FRNN fixed-radius k-NN (``tools/map.py:396,456``), the
4-wide triangle BVH ray caster (``external/RayTracer/src/bvh.cu``), and
cubvh's ``signed_distance`` nearest-face query (``tools/map_bvh.py:113``).

Design: built once per mesh on host (numpy), shipped to device as padded
fixed-shape tables; every query is a batched gather + vector math:

* k-NN      -- gather the 27-cell neighborhood's padded vertex lists plus a
               per-cell precomputed fallback (nearest vertices to the cell
               center, so far-away queries still get sane candidates), then
               top-k by distance.  Bounded candidate sets, no tree, no sort
               of the whole cloud.
* ray cast  -- 3D-DDA voxel walk as a lax.while_loop vectorized over rays:
               each iteration tests the current cell's padded triangle list
               with Moller-Trumbore for all rays in lockstep.  Rays near the
               surface (the hot case: projection along the normal) finish in
               1-3 iterations.
* nearest face (signed distance + barycentric) -- same candidate scheme
               with point-triangle distance; sign from the reference's
               normal-direction test rather than ray-stab parity.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.misc import dput


class GridIndex(NamedTuple):
    """Device tables of a voxel index over items (vertices or triangles)."""

    cell_items: jax.Array    # [R**3, M] int32 item ids, -1 padded
    fallback: jax.Array      # [R**3, F] int32 nearest item ids to center
    origin: jax.Array        # [3] float32 grid origin
    cell_size: jax.Array     # [] float32
    res: int                 # static resolution (python int)


def _cell_of(points, origin, cell_size, res: int):
    c = jnp.floor((points - origin) / cell_size).astype(jnp.int32)
    return jnp.clip(c, 0, res - 1)


def _flat(c, res: int):
    return (c[..., 0] * res + c[..., 1]) * res + c[..., 2]


def build_grid(points_per_item: np.ndarray, res: int,
               max_per_cell: int, n_fallback: int = 8,
               aabb_pad: float = 1e-3) -> GridIndex:
    """Host-side build.

    Args:
      points_per_item: [N, 3] representative point per item (vertex
        positions, or triangle AABB handled by `build_triangle_grid`).
    """
    from .. import native

    pts = np.asarray(points_per_item, np.float64)
    lo = pts.min(0) - aabb_pad
    hi = pts.max(0) + aabb_pad
    cell_size = float((hi - lo).max() / res)

    cell_items = native.build_vertex_grid(pts, res, lo, cell_size,
                                          max_per_cell)
    if cell_items is None:   # numpy fallback
        coords = np.clip(((pts - lo) / cell_size).astype(np.int64), 0,
                         res - 1)
        flat = (coords[:, 0] * res + coords[:, 1]) * res + coords[:, 2]
        cell_items = -np.ones((res ** 3, max_per_cell), np.int32)
        fill = np.zeros(res ** 3, np.int64)
        for i in np.argsort(flat, kind="stable"):
            c = flat[i]
            if fill[c] < max_per_cell:
                cell_items[c, fill[c]] = i
                fill[c] += 1

    fallback = _build_fallback(pts, lo, cell_size, res, n_fallback)
    return GridIndex(cell_items=dput(cell_items, np.int32),
                     fallback=dput(fallback, np.int32),
                     origin=dput(lo, np.float32),
                     cell_size=dput(cell_size, np.float32),
                     res=res)


def _build_fallback(pts, lo, cell_size, res, n_fallback):
    from scipy.spatial import cKDTree

    tree = cKDTree(pts)
    r = np.arange(res)
    xx, yy, zz = np.meshgrid(r, r, r, indexing="ij")
    centers = (np.stack([xx, yy, zz], -1).reshape(-1, 3) + 0.5) * cell_size \
        + lo
    k = min(n_fallback, len(pts))
    _, idx = tree.query(centers, k=k)
    idx = np.asarray(idx, np.int32).reshape(res ** 3, k)
    if k < n_fallback:
        idx = np.pad(idx, ((0, 0), (0, n_fallback - k)), mode="edge")
    return idx


def build_triangle_grid(vertices: np.ndarray, faces: np.ndarray, res: int,
                        max_per_cell: int, n_fallback: int = 8
                        ) -> GridIndex:
    """Bin triangles into every cell their AABB overlaps (conservative)."""
    from .. import native

    tris = np.asarray(vertices, np.float64)[np.asarray(faces)]
    lo = tris.reshape(-1, 3).min(0) - 1e-3
    hi = tris.reshape(-1, 3).max(0) + 1e-3
    cell_size = float((hi - lo).max() / res)

    cell_items = native.build_triangle_grid(
        np.asarray(vertices), np.asarray(faces), res, lo, cell_size,
        max_per_cell)
    if cell_items is None:   # numpy fallback
        tmin = np.clip(((tris.min(1) - lo) / cell_size).astype(np.int64),
                       0, res - 1)
        tmax = np.clip(((tris.max(1) - lo) / cell_size).astype(np.int64),
                       0, res - 1)
        cell_lists: dict[int, list[int]] = {}
        for fi in range(len(tris)):
            for x in range(tmin[fi, 0], tmax[fi, 0] + 1):
                for y in range(tmin[fi, 1], tmax[fi, 1] + 1):
                    for z in range(tmin[fi, 2], tmax[fi, 2] + 1):
                        cell_lists.setdefault((x * res + y) * res + z,
                                              []).append(fi)
        cell_items = -np.ones((res ** 3, max_per_cell), np.int32)
        for c, items in cell_lists.items():
            m = min(len(items), max_per_cell)
            cell_items[c, :m] = items[:m]

    centroids = tris.mean(1)
    fallback = _build_fallback(centroids, lo, cell_size, res, n_fallback)
    return GridIndex(cell_items=dput(cell_items, np.int32),
                     fallback=dput(fallback, np.int32),
                     origin=dput(lo, np.float32),
                     cell_size=dput(cell_size, np.float32),
                     res=res)


_NEIGH = np.stack(np.meshgrid([-1, 0, 1], [-1, 0, 1], [-1, 0, 1],
                              indexing="ij"), -1).reshape(27, 3)
# center + 6 face neighbors: 3.5x fewer candidate gathers; results are
# approximate near cell corners (fine for normal estimation, where the
# fallback list still guarantees sane candidates)
_NEIGH7 = np.asarray([[0, 0, 0], [1, 0, 0], [-1, 0, 0], [0, 1, 0],
                      [0, -1, 0], [0, 0, 1], [0, 0, -1]])


def gather_candidates(grid: GridIndex, points, stencil: str = "full"):
    """[Q, S*M + F] candidate item ids (-1 padded) around each point.

    stencil: 'full' = 27-cell neighborhood (exact within a cell radius);
    'faces' = 7-cell (cheaper, approximate)."""
    c = _cell_of(points, grid.origin, grid.cell_size, grid.res)  # [Q, 3]
    neigh_off = _NEIGH if stencil == "full" else _NEIGH7
    nb = jnp.clip(c[:, None, :] + jnp.asarray(neigh_off)[None], 0,
                  grid.res - 1)
    flat = _flat(nb, grid.res)                                    # [Q, S]
    neigh = grid.cell_items[flat].reshape(points.shape[0], -1)
    fb = grid.fallback[_flat(c, grid.res)]
    return jnp.concatenate([neigh, fb], axis=-1)


def _gather_coords(coords_1d: tuple, idx):
    """Gather per-axis coordinate arrays (SoA).

    TPU layouts pad the minor dimension to 128 lanes, so a single
    [Q, C, 3] gather materializes 42x its logical size; three [Q, C]
    gathers from per-axis [N] arrays avoid that entirely."""
    return tuple(c[idx] for c in coords_1d)


def _split3(arr):
    return arr[:, 0], arr[:, 1], arr[:, 2]


@partial(jax.jit, static_argnames=("k", "stencil"))
def knn(grid: GridIndex, vertices, points, k: int = 8,
        stencil: str = "full"):
    """k nearest vertices for each query point.

    Returns (dists [Q, k], idx [Q, k]).  Padded candidates get distance
    1e9 (the fallback list guarantees >= F real candidates); duplicate
    ids are removed by a sort + neighbor-equality mask.
    """
    cand = gather_candidates(grid, points, stencil)     # [Q, C]
    safe = jnp.maximum(cand, 0)
    vx, vy, vz = _gather_coords(_split3(vertices), safe)
    px, py, pz = (points[:, 0:1], points[:, 1:2], points[:, 2:3])
    d2 = (vx - px) ** 2 + (vy - py) ** 2 + (vz - pz) ** 2

    # sort by id so duplicates are adjacent, mask all but the first
    s_keys, s_d2 = jax.lax.sort_key_val(cand, d2, dimension=-1)
    dup = jnp.concatenate(
        [jnp.zeros_like(s_keys[:, :1], bool),
         s_keys[:, 1:] == s_keys[:, :-1]], axis=-1)
    s_d2 = jnp.where(dup | (s_keys < 0), 1e9, s_d2)
    neg, top_idx = jax.lax.top_k(-s_d2, k)
    idx = jnp.take_along_axis(s_keys, top_idx, axis=-1)
    return jnp.sqrt(jnp.maximum(-neg, 0.0)), jnp.maximum(idx, 0)


@partial(jax.jit, static_argnames=("max_steps",))
def raycast(grid: GridIndex, vertices, faces, rays_o, rays_d, *,
            max_steps: int = 64, miss_depth: float = 10.0):
    """First-hit ray casting via a vectorized 3D-DDA voxel walk.

    Semantics match the reference RayTracer facade
    (external/RayTracer/RayTracer/raytracer.py + src/raytracer.cu:17-55):
    returns (positions, face_normals, depth, face_idx) with depth ==
    ``miss_depth`` (10.0) and face_idx == -1 on miss; callers test
    ``depth > 9.5``.
    """
    Q = rays_o.shape[0]
    d = rays_d / (jnp.linalg.norm(rays_d, axis=-1, keepdims=True) + 1e-12)
    res = grid.res
    cs = grid.cell_size

    # clamp origins into the grid AABB: entry point via slab test
    lo = grid.origin
    hi = grid.origin + cs * res
    safe_d = jnp.where(jnp.abs(d) > 1e-12, d,
                       jnp.where(d >= 0, 1e-12, -1e-12))
    t0 = (lo - rays_o) / safe_d
    t1 = (hi - rays_o) / safe_d
    tmin = jnp.max(jnp.minimum(t0, t1), axis=-1)
    tmax = jnp.min(jnp.maximum(t0, t1), axis=-1)
    t_enter = jnp.maximum(tmin, 0.0)
    inside = tmax >= t_enter

    start = rays_o + (t_enter[:, None] + 1e-6 * cs) * d
    cell = _cell_of(start, grid.origin, cs, res)

    step = jnp.where(d >= 0, 1, -1).astype(jnp.int32)
    inv_d = 1.0 / safe_d
    # param distance to the next cell boundary along each axis
    next_bound = grid.origin + (cell + (step > 0)).astype(
        jnp.float32) * cs
    t_next = (next_bound - rays_o) * inv_d
    t_delta = jnp.abs(cs * inv_d)

    # per-axis triangle coordinate arrays (SoA): a [Q, M, 3, 3] gather
    # would be padded 113x by the (8, 128) tile; nine [Q, M] gathers are
    # layout-exact
    tri_soa = _triangle_soa(vertices, faces)
    o_soa = _split3(rays_o)
    d_soa = _split3(d)

    def body(state):
        cell, t_next, best_t, best_f, active, it = state
        flat = _flat(cell, res)
        cand = grid.cell_items[flat]          # [Q, M]
        t, hit = _mt_soa(o_soa, d_soa, tri_soa, jnp.maximum(cand, 0))
        t = jnp.where((cand >= 0) & hit, t, jnp.inf)
        tmin_c = jnp.min(t, axis=-1)
        fmin = jnp.take_along_axis(cand, jnp.argmin(t, axis=-1)[:, None],
                                   axis=-1)[:, 0]
        # accept hit only if inside the current cell's t range (otherwise
        # a nearer triangle in a later cell could be missed)
        cell_t_exit = jnp.min(t_next, axis=-1)
        ok = active & (tmin_c <= cell_t_exit + 1e-5) & jnp.isfinite(tmin_c)
        upd = ok & (tmin_c < best_t)
        best_t = jnp.where(upd, tmin_c, best_t)
        best_f = jnp.where(upd, fmin, best_f)
        active = active & ~ok

        # DDA advance
        axis = jnp.argmin(t_next, axis=-1)
        one_hot = jax.nn.one_hot(axis, 3, dtype=jnp.int32)
        cell = cell + one_hot * step
        t_next = t_next + one_hot.astype(t_next.dtype) * t_delta
        oob = (jnp.any((cell < 0) | (cell >= res), axis=-1))
        active = active & ~oob
        return cell, t_next, best_t, best_f, active, it + 1

    def cond(state):
        *_, active, it = state
        return jnp.any(active) & (it < max_steps)

    init = (cell, t_next, jnp.full((Q,), jnp.inf), -jnp.ones(
        (Q,), jnp.int32), inside, jnp.zeros((), jnp.int32))
    _, _, best_t, best_f, _, _ = jax.lax.while_loop(cond, body, init)

    hit = jnp.isfinite(best_t)
    depth = jnp.where(hit, best_t, miss_depth)
    pos = rays_o + depth[:, None] * d
    fn = _face_normals(vertices, faces)
    normals = jnp.where(hit[:, None], fn[jnp.maximum(best_f, 0)], 0.0)
    face_idx = jnp.where(hit, best_f, -1)
    return pos, normals, depth, face_idx


def _triangle_soa(vertices, faces):
    """Nine [F] coordinate arrays (ax..cz) of the face triangles."""
    va = vertices[faces[:, 0]]
    vb = vertices[faces[:, 1]]
    vc = vertices[faces[:, 2]]
    return (_split3(va) + _split3(vb) + _split3(vc))


def _mt_soa(o_soa, d_soa, tri_soa, idx, eps: float = 1e-9):
    """Moller-Trumbore on SoA coordinates.

    o_soa/d_soa: per-axis [Q] ray components; tri_soa: nine [F] arrays;
    idx: [Q, M] face ids.  Returns (t [Q, M], hit [Q, M])."""
    ox, oy, oz = (c[:, None] for c in o_soa)
    dx, dy, dz = (c[:, None] for c in d_soa)
    ax, ay, az, bx, by, bz, cx, cy, cz = (c[idx] for c in tri_soa)
    e1x, e1y, e1z = bx - ax, by - ay, bz - az
    e2x, e2y, e2z = cx - ax, cy - ay, cz - az
    # pvec = d x e2
    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = e1x * px + e1y * py + e1z * pz
    inv_det = jnp.where(jnp.abs(det) > eps, 1.0 / det, 0.0)
    tx, ty, tz = ox - ax, oy - ay, oz - az
    u = (tx * px + ty * py + tz * pz) * inv_det
    # qvec = tvec x e1
    qx = ty * e1z - tz * e1y
    qy = tz * e1x - tx * e1z
    qz = tx * e1y - ty * e1x
    v = (dx * qx + dy * qy + dz * qz) * inv_det
    t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
    # t >= -1e-5: points exactly on the surface (projection of on-mesh
    # queries) must still register their t ~= 0 hit
    hit = ((jnp.abs(det) > eps) & (u >= -eps) & (v >= -eps)
           & (u + v <= 1.0 + eps) & (t >= -1e-5))
    return jnp.where(hit, jnp.maximum(t, 0.0), jnp.inf), hit


def _face_normals(vertices, faces):
    tri = vertices[faces]
    n = jnp.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    return n / (jnp.linalg.norm(n, axis=-1, keepdims=True) + 1e-12)


@jax.jit
def nearest_face(grid: GridIndex, vertices, faces, points):
    """Nearest triangle to each point among grid candidates.

    Replaces cubvh ``signed_distance(..., return_uvw=True)``
    (tools/map_bvh.py:113): returns (udf, face_idx, barycentric, closest).
    The *sign* is applied by the caller from a normal test (the reference's
    'raystab' parity is replaced by the kNN-normal direction test).
    """
    cand = gather_candidates(grid, points)          # [Q, C]
    tri_soa = _triangle_soa(vertices, faces)
    d2, cx, cy, cz, bu, bv, bw = _ptc_soa(_split3(points), tri_soa,
                                          jnp.maximum(cand, 0))
    d2 = jnp.where(cand >= 0, d2, jnp.inf)
    j = jnp.argmin(d2, axis=-1)[:, None]
    take = lambda a: jnp.take_along_axis(a, j, axis=-1)[:, 0]
    fid = take(cand)
    bary = jnp.stack([take(bu), take(bv), take(bw)], -1)
    closest = jnp.stack([take(cx), take(cy), take(cz)], -1)
    return jnp.sqrt(take(d2)), fid, bary, closest


def _ptc_soa(p_soa, tri_soa, idx):
    """Closest point on triangles, SoA form (region-partition algorithm;
    see triangle.point_triangle_closest for the AoS reference version)."""
    px, py, pz = (c[:, None] for c in p_soa)
    ax, ay, az, bx, by, bz, cx, cy, cz = (c[idx] for c in tri_soa)
    abx, aby, abz = bx - ax, by - ay, bz - az
    acx, acy, acz = cx - ax, cy - ay, cz - az
    apx, apy, apz = px - ax, py - ay, pz - az
    d1 = abx * apx + aby * apy + abz * apz
    d2_ = acx * apx + acy * apy + acz * apz
    bpx, bpy, bpz = px - bx, py - by, pz - bz
    d3 = abx * bpx + aby * bpy + abz * bpz
    d4 = acx * bpx + acy * bpy + acz * bpz
    cpx, cpy, cpz = px - cx, py - cy, pz - cz
    d5 = abx * cpx + aby * cpy + abz * cpz
    d6 = acx * cpx + acy * cpy + acz * cpz

    va = d3 * d6 - d5 * d4
    vb = d5 * d2_ - d1 * d6
    vc = d1 * d4 - d3 * d2_
    denom = va + vb + vc
    v_face = vb / jnp.where(jnp.abs(denom) > 1e-20, denom, 1.0)
    w_face = vc / jnp.where(jnp.abs(denom) > 1e-20, denom, 1.0)

    t_ab = jnp.clip(d1 / jnp.where(jnp.abs(d1 - d3) > 1e-20, d1 - d3,
                                   1.0), 0.0, 1.0)
    t_ac = jnp.clip(d2_ / jnp.where(jnp.abs(d2_ - d6) > 1e-20, d2_ - d6,
                                    1.0), 0.0, 1.0)
    bc_den = (d4 - d3) + (d5 - d6)
    t_bc = jnp.clip((d4 - d3) / jnp.where(jnp.abs(bc_den) > 1e-20,
                                          bc_den, 1.0), 0.0, 1.0)

    in_a = (d1 <= 0) & (d2_ <= 0)
    in_b = (d3 >= 0) & (d4 <= d3)
    in_c = (d6 >= 0) & (d5 <= d6)
    rest = (~in_a) & (~in_b) & (~in_c)
    on_ab = rest & (vc <= 0) & (d1 >= 0) & (d3 <= 0)
    on_ac = rest & (vb <= 0) & (d2_ >= 0) & (d6 <= 0)
    on_bc = rest & (va <= 0) & (d4 - d3 >= 0) & (d5 - d6 >= 0)

    u = jnp.where(in_a, 1.0,
        jnp.where(in_b, 0.0,
        jnp.where(in_c, 0.0,
        jnp.where(on_ab, 1.0 - t_ab,
        jnp.where(on_ac, 1.0 - t_ac,
        jnp.where(on_bc, 0.0, 1.0 - v_face - w_face))))))
    v = jnp.where(in_a, 0.0,
        jnp.where(in_b, 1.0,
        jnp.where(in_c, 0.0,
        jnp.where(on_ab, t_ab,
        jnp.where(on_ac, 0.0,
        jnp.where(on_bc, 1.0 - t_bc, v_face))))))
    w = 1.0 - u - v
    qx = u * ax + v * bx + w * cx
    qy = u * ay + v * by + w * cy
    qz = u * az + v * bz + w * cz
    dist_sq = (px - qx) ** 2 + (py - qy) ** 2 + (pz - qz) ** 2
    return dist_sq, qx, qy, qz, u, v, w
