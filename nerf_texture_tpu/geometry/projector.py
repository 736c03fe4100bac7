"""MeshProjector: project query points onto the base mesh.

TPU rebuild of the reference ``MeshProjector`` (tools/map.py:340-543) and
``BvhMeshProjector`` (tools/map_bvh.py:42-147) on the grid-hash geometry
engine (``spatial.py``).  Host-side construction (UV atlas, TBN frames,
grids); every query is a pure jax function over a `ProjectorArrays`
pytree, so the whole projection chain lives inside the training jit.

The projection VJP (reference ``project_layer``/``diff_project_layer``,
tools/map.py:141-186) routes gradients of the surface point back to the
query point decomposed tangentially, and gradients of the signed height
along the normal -- implemented as `diff_project` below.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.misc import dput
from .mesh import Mesh, calculate_tbn, uv_atlas
from .spatial import (GridIndex, build_grid, build_triangle_grid, knn,
                      nearest_face, raycast)

DEPTH_THRESHOLD = 9.5  # miss marker (tools/map.py:406)


class ProjectorArrays(NamedTuple):
    """Device-resident mesh + spatial index state (a pytree)."""

    vertices: jax.Array        # [V, 3]
    vertex_normals: jax.Array  # [V, 3]
    faces: jax.Array           # [F, 3]
    face_tbn: jax.Array        # [F, 3, 3] rows (T, B, N)
    uvs: jax.Array             # [V, 2] in [-1, 1]
    vgrid: GridIndex
    tgrid: GridIndex
    vertex_tbn: jax.Array | None = None  # [V, 3, 3] (an incident face's)


class MeshProjector:
    """Host facade: builds device state once, exposes jax query methods.

    Args:
      mesh: host Mesh; a UV atlas is computed when absent
        (tools/map.py:354-361).
    """

    def __init__(self, mesh: Mesh, *, grid_res: int | None = None,
                 max_per_cell: int = 16, tri_max_per_cell: int = 24,
                 store_uv: bool = True):
        if store_uv and mesh.uvs is None:
            mesh = uv_atlas(mesh)
        self.mesh = mesh
        self.mean_edge_length = mesh.mean_edge_length
        self.gaussian_factor = -1.0 / (self.mean_edge_length ** 2 + 1e-20)

        if store_uv:
            uvs = mesh.uvs
            uvs = (uvs - uvs.min()) / (uvs.max() - uvs.min() + 1e-20) \
                * 2.0 - 1.0                     # [-1, 1] (map.py:361)
            tbn = calculate_tbn(mesh, uvs)
        else:
            uvs = np.zeros((len(mesh.vertices), 2))
            tbn = np.repeat(np.eye(3)[None], len(mesh.faces), axis=0)

        if grid_res is None:
            grid_res = int(np.clip(round(len(mesh.vertices) ** (1 / 3) * 2),
                                   8, 64))
        self.recommended_sdf_factor = self._sdf_factor(mesh, uvs)
        # per-vertex TBN = TBN of the lowest-indexed incident face (used
        # by the kNN-seeded anchor frames, which have no face hit)
        faces_np = np.asarray(mesh.faces)
        vf = np.full(len(mesh.vertices), len(faces_np), np.int64)
        fid = np.arange(len(faces_np))
        for c in range(3):
            np.minimum.at(vf, faces_np[:, c], fid)
        vertex_tbn = tbn[np.clip(vf, 0, len(faces_np) - 1)]
        self.arrays = ProjectorArrays(
            vertices=dput(mesh.vertices, np.float32),
            vertex_normals=dput(mesh.vertex_normals, np.float32),
            faces=dput(mesh.faces, np.int32),
            face_tbn=dput(tbn, np.float32),
            uvs=dput(uvs, np.float32),
            vgrid=build_grid(mesh.vertices, grid_res, max_per_cell),
            tgrid=build_triangle_grid(mesh.vertices, mesh.faces, grid_res,
                                      tri_max_per_cell),
            vertex_tbn=dput(vertex_tbn, np.float32),
        )

    def near_cell_indices(self, grid_size: int, bound: float,
                          margin: float) -> np.ndarray:
        """Flat ids of density-grid cells within `margin` of the surface
        (host cKDTree; cached).  The curved field is a thin shell, so the
        grid update only needs to evaluate these cells -- everything else
        is exactly zero density (h_mask)."""
        key = (grid_size, bound, round(margin, 6))
        if not hasattr(self, "_near_cells"):
            self._near_cells = {}
        if key not in self._near_cells:
            from scipy.spatial import cKDTree

            H = grid_size
            centers = (np.arange(H) + 0.5) / H * 2.0 - 1.0
            half = bound / H
            centers = centers * (bound - half) / (1.0 - 1.0 / H)
            xx, yy, zz = np.meshgrid(centers, centers, centers,
                                     indexing="ij")
            pts = np.stack([xx.ravel(), yy.ravel(), zz.ravel()], -1)
            d, _ = cKDTree(self.mesh.vertices).query(pts)
            cell_diag = 2 * bound / H * np.sqrt(3)
            ids = np.where(d < margin + cell_diag)[0].astype(np.int32)
            self._near_cells[key] = ids
        return self._near_cells[key]

    def _sdf_factor(self, mesh, uvs):
        # mean 3D edge length / mean UV edge length (map.py:381-388)
        e = mesh.edges_unique
        uv_len = np.linalg.norm(uvs[e[:, 0]] - uvs[e[:, 1]], axis=-1)
        return self.mean_edge_length / max(uv_len.mean(), 1e-9)


def pointcloud_arrays(points: np.ndarray, normals: np.ndarray, *,
                      grid_res: int | None = None,
                      max_per_cell: int = 32) -> ProjectorArrays:
    """ProjectorArrays for a bare point cloud (k-NN queries only).

    Used by the patch-import path (tools/map.py:929-937: a MeshProjector
    over scattered patch points with no faces, normals = patch normal,
    no ray tracer).  Faces/tbn/uvs/tgrid are single-element dummies.
    """
    if grid_res is None:
        grid_res = int(np.clip(round(len(points) ** (1 / 3) * 2), 8, 64))
    dummy_tri = build_triangle_grid(points[:3] if len(points) >= 3
                                    else np.zeros((3, 3)),
                                    np.asarray([[0, 1, 2]]), 2, 4)
    return ProjectorArrays(
        vertices=dput(points, np.float32),
        vertex_normals=dput(normals, np.float32),
        faces=dput(np.zeros((1, 3)), np.int32),
        face_tbn=dput(np.eye(3)[None], np.float32),
        uvs=dput(np.zeros((len(points), 2)), np.float32),
        vgrid=build_grid(points, grid_res, max_per_cell),
        tgrid=dummy_tri,
        vertex_tbn=dput(np.broadcast_to(np.eye(3), (len(points), 3, 3)),
                        np.float32),
    )


# ---------------------------------------------------------------------------
# queries (pure jax)
# ---------------------------------------------------------------------------

def knn_normal(p: ProjectorArrays, xyz, *, k: int = 8,
               gaussian_factor: float = -1.0, use_dir_vec: bool = True,
               dir_vec_wdist: float = 0.05, weighting: str = "Shepard",
               nn_consis_check: bool = False,
               direct_above_check: bool = False,
               direct_above_threshold: float = 1e-1,
               stencil: str = "faces"):
    """Weighted-kNN normal estimate.  Port of tools/map.py:454-501.

    Uses the cheap 7-cell stencil by default (normal estimation tolerates
    approximate neighbor sets; pass stencil='full' for exact k-NN).

    Returns (normal [Q,3], dir_vec_ori [Q,K,3], indices [Q,K], dis [Q,K']).
    """
    dis, idx = knn(p.vgrid, p.vertices, xyz, k=k, stencil=stencil)
    normals = p.vertex_normals[idx]                    # [Q, K, 3]
    dir_vec_ori = xyz[:, None, :] - p.vertices[idx]
    dir_vec = dir_vec_ori / (jnp.linalg.norm(
        dir_vec_ori, axis=-1, keepdims=True) + 1e-5)

    if nn_consis_check:
        # >= 0 (not > 0): a query exactly on a vertex has a zero first
        # direction vector, which must not invalidate every neighbor
        cos = jnp.sum(dir_vec * dir_vec[:, :1, :], axis=-1)
        dis = jnp.where(cos >= 0, dis, 1e5)

    if direct_above_check:
        # invalidate queries not roughly above any neighbor
        # (tools/map.py:467-471)
        p2n = 2.0 * jnp.min(jnp.linalg.norm(
            jnp.cross(normals, dir_vec), axis=-1), axis=-1)
        above = (p2n < direct_above_threshold)[:, None]
        dis = jnp.where(above, dis, 1e5)
        dir_vec_ori = jnp.where(above[..., None], dir_vec_ori, 1e5)

    if use_dir_vec:
        # append the inverse-distance-weighted mean direction as an extra
        # "virtual neighbor normal" (map.py:473-482)
        w_invd = 1.0 / (dis + 1e-7)
        mean_dir = jnp.sum(w_invd[..., None] * dir_vec, axis=1,
                           keepdims=True)
        normal_test = jnp.mean(normals, axis=1, keepdims=True)
        flip = jnp.sum(mean_dir * normal_test, axis=-1,
                       keepdims=True) < 0
        mean_dir = jnp.where(flip, -mean_dir, mean_dir)
        mean_dir = mean_dir / (jnp.linalg.norm(
            mean_dir, axis=-1, keepdims=True) + 1e-5)
        normals = jnp.concatenate([normals, mean_dir], axis=1)
        wd = max(dir_vec_wdist, 1e-5)
        dis = jnp.concatenate([dis, jnp.full_like(dis[:, :1], wd)],
                              axis=1)

    if weighting == "Gaussian":
        weights = jnp.exp(dis * gaussian_factor)
    elif weighting == "Shepard":
        weights = 1.0 / (dis + 1e-7)
    elif weighting == "DualD":
        dk = jnp.max(dis, axis=-1, keepdims=True)
        d1 = jnp.min(dis, axis=-1, keepdims=True)
        weights = (dk - dis) / (dk - d1 + 1e-5) * (dk + d1) / (dk + dis)
    else:
        raise ValueError(f"unknown weighting {weighting}")

    # degenerate all-zero weights (every neighbor vetoed) -> uniform
    wsum = jnp.sum(weights, axis=-1, keepdims=True)
    weights = jnp.where(wsum > 1e-12, weights / (wsum + 1e-12),
                        1.0 / weights.shape[-1])
    normals = normals / (jnp.linalg.norm(normals, axis=-1,
                                         keepdims=True) + 1e-5)
    normal = jnp.sum(normals * weights[..., None], axis=-2)
    normal = normal / (jnp.linalg.norm(normal, axis=-1,
                                       keepdims=True) + 1e-5)
    return normal, dir_vec_ori, idx, dis


def project(p: ProjectorArrays, xyz, *, k: int = 8,
            h_threshold: float | None = None,
            requires_grad_xyz: bool = False, cast_steps: int = 12):
    """Project to the surface along the estimated normal.

    Port of MeshProjector.project (tools/map.py:414-433): cast the
    +-normal rays, keep the nearer hit; sdf < 0 on the inner side.

    cast_steps caps the DDA voxel walk: projection rays start within
    ~h_threshold of the surface, so a short walk finds every real hit and
    far-off rays report the miss depth (10.0) quickly instead of
    traversing the whole grid.

    Returns (p_sur [Q,3], sdf [Q,1], h_mask [Q], normal [Q,3],
    tbn [Q,3,3]).
    """
    xyz_in = xyz
    xyz = jax.lax.stop_gradient(xyz)
    normal, _, _, _ = knn_normal(p, xyz, k=k)
    p1, _, d1, f1 = raycast(p.tgrid, p.vertices, p.faces, xyz, normal,
                            max_steps=cast_steps)
    p2, _, d2, f2 = raycast(p.tgrid, p.vertices, p.faces, xyz, -normal,
                            max_steps=cast_steps)
    cond = d1 < d2
    p_sur = jnp.where(cond[:, None], p1, p2)
    sdf = jnp.where(cond, -d1, d2)[:, None]
    face_idx = jnp.where(cond, f1, f2)
    tbn = p.face_tbn[jnp.maximum(face_idx, 0)]

    ht = math.inf if h_threshold is None else h_threshold
    h_mask = jnp.abs(sdf[:, 0]) < min(DEPTH_THRESHOLD, ht)
    if requires_grad_xyz:
        _, p_sur, sdf, normal = diff_project(xyz_in, p_sur, sdf, normal)
    return p_sur, sdf, h_mask, normal, tbn


def ray_anchor_frames(p: ProjectorArrays, rays_o, rays_d, *, k: int = 8,
                      cast_steps: int = 64):
    """Per-RAY surface frames: cast each ray against the template once and
    return the local frame at the hit.

    This powers the per-ray projection fast path: all samples of a ray lie
    within the thin shell around the hit, so the surface is locally
    approximated by its tangent plane there -- per-sample projection
    (kNN + 2 ray casts each, tools/map.py:414-433) collapses to ONE cast
    per ray plus closed-form plane math.  Exact per-sample projection
    remains available (MeshFieldConfig.per_ray_projection = False).

    Returns dict(p0 [N,3], normal [N,3], tbn [N,3,3], hit [N] bool).
    """
    pos, _, depth, fid = raycast(p.tgrid, p.vertices, p.faces, rays_o,
                                 rays_d, max_steps=cast_steps)
    hit = depth < DEPTH_THRESHOLD
    # smooth normal at the hit point from the kNN estimate
    normal, _, _, _ = knn_normal(p, pos, k=k)
    tbn = p.face_tbn[jnp.maximum(fid, 0)]
    return {"p0": pos, "normal": normal, "tbn": tbn, "hit": hit}


def seed_anchor_frames(p: ProjectorArrays, x_seed, seed_valid, *,
                       k: int = 8, max_dist: float = math.inf):
    """Per-ray anchor frames WITHOUT ray casting: the anchor is the
    weighted kNN projection of each ray's first marched sample.

    ~7x cheaper on TPU than the DDA cast of `ray_anchor_frames` (one
    7-stencil kNN vs a 64-step voxel walk with per-step triangle tests)
    and available wherever the occupancy march already produced a
    near-surface seed point.  Same weighted-projection math as
    `weighted_project` (tools/map.py:435-452).

    Args:
      x_seed: [N, 3] first valid sample of each ray (any near-surface
        point works).
      seed_valid: [N] bool, rays that produced a seed.
      max_dist: extra gate on the nearest-vertex distance.

    Returns dict(p0 [N,3], normal [N,3], tbn [N,3,3], hit [N] bool).
    """
    x_seed = jax.lax.stop_gradient(x_seed)
    normal, dir_vec, idx, dis = knn_normal(p, x_seed, k=k)
    sdfs = jnp.sum(dir_vec * normal[:, None, :], axis=-1)      # [Q, K]
    perp = dir_vec - sdfs[..., None] * normal[:, None, :]
    dist2d = jnp.linalg.norm(perp, axis=-1)
    dk = jnp.max(dist2d, axis=-1, keepdims=True)
    d1 = jnp.min(dist2d, axis=-1, keepdims=True)
    w = (dk - dist2d) / (dk - d1 + 1e-5) * (dk + d1) / (dk + dist2d)
    w = w / (jnp.sum(w, axis=-1, keepdims=True) + 1e-5)
    h = jnp.sum(sdfs * w, axis=-1, keepdims=True)
    p0 = x_seed - h * normal
    tbn = (p.vertex_tbn[idx[:, 0]] if p.vertex_tbn is not None
           else jnp.broadcast_to(jnp.eye(3), (*idx.shape[:1], 3, 3)))
    hit = seed_valid & (jnp.min(dis[:, :k], axis=-1) < max_dist)
    return {"p0": p0, "normal": normal, "tbn": tbn, "hit": hit}


# ---------------------------------------------------------------------------
# cached per-cell anchor frames (inference fast path)
# ---------------------------------------------------------------------------

def build_anchor_table(p: ProjectorArrays, grid_size: int, bound: float,
                       *, k: int = 8, max_dist: float,
                       chunk: int = 131072, collapse_columns: bool = True):
    """[H, H, H, 16] anchor frames at every grid-cell center.

    Anchor frames depend ONLY on the template mesh, not on the trained
    field, so they are computed once per template and reused by every
    frame: render-time anchoring becomes one width-16 gather per ray
    instead of a kNN + plane fit (~1.8 us/ray measured on v5e, dominant
    in curved full-frame renders).  Row layout: p0[3] normal[3]
    tbn[9 row-major] hit[1]; cells farther than `max_dist` from the
    mesh get hit=0 (their samples fail the h_mask gate anyway).

    collapse_columns: every cell adopts the anchor row of its SURFACE
    cell (the cell containing its own anchor's p0).  Cells stacked
    along a normal column then share ONE tangent chart: the chart
    p_sur(x) becomes consistent through the whole shell thickness
    instead of switching at every cell crossing (fewer chart
    discontinuities along a marching ray), and the number of DISTINCT
    charts drops from the shell volume (~180K cells at 128^3 on the
    bench sphere) to the surface cells (~20K) -- which is what makes a
    baked per-chart feature atlas affordable (render/baked.py).  Each
    cell keeps its own hit gate."""
    H = grid_size
    centers = ((np.stack(np.meshgrid(*([np.arange(H)] * 3),
                                     indexing="ij"), -1)
                .reshape(-1, 3) + 0.5) / H * 2.0 - 1.0) * bound
    n = centers.shape[0]
    # cells skipped by the prefilter get a SAFE identity frame (their
    # own center, z normal, identity TBN, hit=0) -- NOT zeros: a
    # zero normal reaches normalize() whose norm has a NaN gradient at
    # exactly 0 (d|v|/dv = v/|v|), and one NaN sample poisons the
    # shared MLP gradients for the whole batch (r5 bench NaN).
    rows = np.zeros((n, 16), np.float32)
    rows[:, 0:3] = centers
    rows[:, 5] = 1.0                                   # normal = +z
    rows[:, 6] = rows[:, 10] = rows[:, 14] = 1.0       # tbn = I

    # host prefilter: the hit gate IS a nearest-vertex-distance test
    # (seed_anchor_frames: min kNN distance < max_dist), so a cKDTree
    # pass selects exactly the cells that can pass it -- the device kNN
    # chain then runs on the shell only (~2-40x fewer cells depending
    # on scene shape; the full-grid build cost minutes on a degraded
    # tunnel, round 5)
    try:
        from scipy.spatial import cKDTree
        d, _ = cKDTree(np.asarray(p.vertices)).query(centers)
        near = np.where(d < max_dist)[0]
    except Exception:               # noqa: BLE001 -- scipy optional
        near = np.arange(n)

    @jax.jit
    def body(pts):
        f = seed_anchor_frames(p, pts, jnp.ones(pts.shape[:1], bool),
                               k=k, max_dist=max_dist)
        return jnp.concatenate(
            [f["p0"], f["normal"], f["tbn"].reshape(-1, 9),
             f["hit"][:, None].astype(jnp.float32)], axis=-1)

    sel = centers[near].astype(np.float32)
    for start in range(0, len(near), chunk):
        end = min(start + chunk, len(near))
        blk = sel[start:end]
        if end - start < chunk:   # numpy pad: no one-off device program
            blk = np.pad(blk, ((0, chunk - (end - start)), (0, 0)))
        rows[near[start:end]] = \
            np.asarray(body(jnp.asarray(blk)))[:end - start]
    if collapse_columns:
        # cell of each anchor's p0 (host-side; one indexed copy)
        cell = np.clip(((rows[:, 0:3] + bound) * (H / (2.0 * bound)))
                       .astype(np.int64), 0, H - 1)
        surf = (cell[:, 0] * H + cell[:, 1]) * H + cell[:, 2]
        hit = rows[:, 15:16].copy()
        rows = rows[surf]
        # a cell is usable only if BOTH itself and its surface cell pass
        # the distance gate
        rows[:, 15:16] = np.minimum(rows[:, 15:16], hit)
    return jnp.asarray(rows.reshape(H, H, H, 16))


def anchor_frames_from_table(table, x_seed, seed_valid, bound: float):
    """Per-ray frames via ONE gather from `build_anchor_table`'s output."""
    H = table.shape[0]
    inv2b = H / (2.0 * bound)
    cell = jnp.clip(((x_seed + bound) * inv2b).astype(jnp.int32),
                    0, H - 1)                              # [N, 3]
    flat = (cell[..., 0] * H + cell[..., 1]) * H + cell[..., 2]
    rows = jnp.take(table.reshape(-1, 16), flat, axis=0)   # [N, 16]
    return {"p0": rows[:, 0:3], "normal": rows[:, 3:6],
            "tbn": rows[:, 6:15].reshape(-1, 3, 3),
            "hit": seed_valid & (rows[:, 15] > 0.5)}


def weighted_project(p: ProjectorArrays, xyz, *, k: int = 8,
                     weighting: str = "DualD", sdf_scale: float = 1.0,
                     sdf_offset: float = 0.0, return_psur: bool = False,
                     gaussian_factor: float = -1.0,
                     direct_above_check: bool = False,
                     direct_above_threshold: float = 1e-1):
    """kNN-weighted signed distance without ray casting.

    Port of tools/map.py:435-452."""
    normal, dir_vec, idx, dis = knn_normal(
        p, xyz, k=k, use_dir_vec=False, gaussian_factor=gaussian_factor,
        direct_above_check=direct_above_check,
        direct_above_threshold=direct_above_threshold)
    sdfs = jnp.sum(dir_vec * normal[:, None, :], axis=-1)      # [Q, K]
    perp = dir_vec - sdfs[..., None] * normal[:, None, :]
    dist2d = jnp.linalg.norm(perp, axis=-1)                    # [Q, K]
    if weighting == "Gaussian":
        weights = jnp.exp(dist2d * gaussian_factor)
    elif weighting == "Shepard":
        weights = 1.0 / (dist2d + 1e-5)
    elif weighting == "DualD":
        dk = jnp.max(dist2d, axis=-1, keepdims=True)
        d1 = jnp.min(dist2d, axis=-1, keepdims=True)
        weights = (dk - dist2d) / (dk - d1 + 1e-5) * (dk + d1) \
            / (dk + dist2d)
    else:
        raise ValueError(weighting)
    weights = weights / (jnp.sum(weights, axis=-1, keepdims=True) + 1e-5)
    sdf = jnp.sum(sdfs * weights, axis=-1, keepdims=True) \
        / max(1e-5, sdf_scale) - sdf_offset
    if return_psur:
        p_sur = xyz - sdf * normal
        return sdf, p_sur, normal
    return sdf, idx, weights, normal, dis


def barycentric_mapping(p: ProjectorArrays, xyz, normal, *,
                        h_threshold: float | None = None,
                        sdf_scale: float = 1.0, sdf_offset: float = 0.0,
                        requires_grad_xyz: bool = False,
                        cast_steps: int = 12):
    """Ray-cast projection returning face vertex ids + barycentrics.

    Port of tools/map.py:503-528."""
    from .triangle import points_to_barycentric

    xyz_in = xyz
    xyz = jax.lax.stop_gradient(xyz)
    p1, _, d1, f1 = raycast(p.tgrid, p.vertices, p.faces, xyz, normal,
                            max_steps=cast_steps)
    p2, _, d2, f2 = raycast(p.tgrid, p.vertices, p.faces, xyz, -normal,
                            max_steps=cast_steps)
    cond = d1 < d2
    sdf = (jnp.where(cond, -d1, d2)[:, None]
           / max(1e-5, sdf_scale) - sdf_offset)
    p_sur = jnp.where(cond[:, None], p1, p2)
    face_idx = jnp.where(cond, f1, f2)

    if requires_grad_xyz:
        normal_est, _, _, _ = knn_normal(p, xyz, k=8)
        _, p_sur, sdf, _ = diff_project(xyz_in, p_sur, sdf, normal_est)

    ht = math.inf if h_threshold is None else h_threshold
    h_mask = jnp.abs(sdf[:, 0]) < min(DEPTH_THRESHOLD, ht)
    h_mask = h_mask & (face_idx >= 0)
    face_safe = jnp.maximum(face_idx, 0)
    vertex_idx = p.faces[face_safe]                     # [Q, 3]
    triangles = p.vertices[vertex_idx]                  # [Q, 3, 3]
    bary = points_to_barycentric(triangles, p_sur)
    return vertex_idx, bary, sdf, h_mask, face_idx


def query_tbn(p: ProjectorArrays, xyz, *, k: int = 8,
              h_threshold: float | None = None, sdf_scale: float = 1.0,
              sdf_offset: float = 0.0):
    """Per-point local TBN frame via barycentric face lookup
    (tools/map.py:530-534).  Returns (tbn [Q,3,3], h_mask [Q])."""
    normal, _, _, _ = knn_normal(p, xyz, k=k, use_dir_vec=False,
                                 weighting="DualD", nn_consis_check=True)
    _, _, _, h_mask, face_idx = barycentric_mapping(
        p, xyz, normal, h_threshold=h_threshold, sdf_scale=sdf_scale,
        sdf_offset=sdf_offset)
    return p.face_tbn[jnp.maximum(face_idx, 0)], h_mask


def uvh(p: ProjectorArrays, xyz, *, k: int = 8,
        h_threshold: float | None = None, sdf_scale: float = 1.0,
        sdf_offset: float = 0.0, requires_grad_xyz: bool = False,
        normal=None):
    """(u, v, signed height) lookup.  Port of tools/map.py:536-543."""
    if normal is None:
        normal, _, _, _ = knn_normal(p, xyz, k=k, use_dir_vec=False,
                                     weighting="DualD",
                                     nn_consis_check=True)
    vertex_idx, bary, sdf, h_mask, face_idx = barycentric_mapping(
        p, xyz, normal, h_threshold=h_threshold, sdf_scale=sdf_scale,
        sdf_offset=sdf_offset, requires_grad_xyz=requires_grad_xyz)
    uv = jnp.sum(p.uvs[vertex_idx] * bary[..., None], axis=-2)
    out = jnp.concatenate([uv, sdf], axis=-1)
    tbn = p.face_tbn[jnp.maximum(face_idx, 0)]
    return out, h_mask, normal, tbn


def signed_distance(p: ProjectorArrays, xyz, *, k: int = 8):
    """cubvh-style nearest-surface query (tools/map_bvh.py:98-147):
    returns (sdf [Q], face_idx [Q], bary [Q,3], p_sur [Q,3]).  Sign from
    the kNN normal direction test (replaces 'raystab' parity voting)."""
    udf, fid, bary, closest = nearest_face(p.tgrid, p.vertices, p.faces,
                                           xyz)
    normal, _, _, _ = knn_normal(p, xyz, k=k, use_dir_vec=False,
                                 weighting="DualD")
    outside = jnp.sum((xyz - closest) * normal, axis=-1) >= 0
    sdf = jnp.where(outside, udf, -udf)
    return sdf, fid, bary, closest


# ---------------------------------------------------------------------------
# projection VJP
# ---------------------------------------------------------------------------

@jax.custom_vjp
def diff_project(xyz, p_sur, sdf, normal):
    """Identity forward; backward routes g_psur's tangential component and
    g_sdf along the normal into g_xyz (diff_project_layer,
    tools/map.py:171-186)."""
    return xyz, p_sur, sdf, normal


def _diff_project_fwd(xyz, p_sur, sdf, normal):
    return (xyz, p_sur, sdf, normal), normal


def _diff_project_bwd(normal, g):
    g_xyz, g_psur, g_sdf, g_normal = g
    n = normal / (jnp.linalg.norm(normal, axis=-1, keepdims=True) + 1e-5)
    tangential = g_psur - n * jnp.sum(n * g_psur, axis=-1, keepdims=True)
    along = g_sdf * n
    return g_xyz + tangential + along, g_psur, g_sdf, g_normal


diff_project.defvjp(_diff_project_fwd, _diff_project_bwd)
