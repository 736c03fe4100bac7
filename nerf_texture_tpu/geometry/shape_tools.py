"""Mesh-processing pipeline (shape_tools rebuild).

Rebuild of the reference ``tools/shape_tools.py``: convex decomposition +
manifold union wrappers (external binaries, optional), laplacian
smoothing, isotropic remeshing, chamfer+laplacian template registration,
ICP / bbox alignment, PCA plane fitting.  The reference shells out to
CoACD/Manifold/pymesh/pytorch3d/open3d; here the geometric cores are
re-implemented in numpy/jax with graceful degradation when the optional
binaries are absent (these are host-side preprocessing, not the TPU hot
path -- SURVEY.md 2.1 note).
"""

from __future__ import annotations

import os
import shutil
import subprocess

import numpy as np

from .mesh import Mesh, load_obj, save_obj


# ---------------------------------------------------------------------------
# external-binary wrappers (optional; degrade to passthrough)
# ---------------------------------------------------------------------------

def coacd(mesh_path: str, threshold: float = 0.05,
          binary: str = "coacd") -> str:
    """Convex decomposition via the CoACD binary (shape_tools.py:145-156).
    Returns the decomposed path, or the input path when unavailable."""
    out_path = mesh_path.rsplit(".", 1)[0] + f"_coacd.obj"
    if shutil.which(binary) is None:
        print(f"[shape_tools] {binary} not found; skipping decomposition")
        return mesh_path
    subprocess.run([binary, "-i", mesh_path, "-o", out_path, "-t",
                    str(threshold)], check=False)
    return out_path if os.path.exists(out_path) else mesh_path


def manifold_union(mesh_path: str, sv_dir: str,
                   binary: str = "manifold") -> str:
    """Watertight manifold union via the Manifold binary
    (texture_synthesis_on_curved_surface.py:91-101 / shape_tools.py:262).
    Falls back to the input when the binary is missing."""
    name = os.path.basename(mesh_path).rsplit(".", 1)[0]
    out_path = os.path.join(sv_dir, name + "_mf.obj")
    if shutil.which(binary) is None:
        print(f"[shape_tools] {binary} not found; skipping manifold union")
        return mesh_path
    subprocess.run([binary, mesh_path, out_path], check=False)
    return out_path if os.path.exists(out_path) else mesh_path


# ---------------------------------------------------------------------------
# native implementations
# ---------------------------------------------------------------------------

def _vertex_adjacency(mesh: Mesh):
    nbr: list[set] = [set() for _ in range(len(mesh.vertices))]
    for a, b in mesh.edges_unique:
        nbr[a].add(b)
        nbr[b].add(a)
    return nbr


def keep_largest_component(mesh: Mesh) -> Mesh:
    """Drop every face component except the largest (by face count).

    Marching-cubes meshes from a briefly-trained density field carry
    floating junk blobs (salt); the reference cleans its template through
    CoACD + Manifold union (main.py:110-141), which has the same effect.
    Used when those binaries are unavailable."""
    import scipy.sparse as sp
    from scipy.sparse.csgraph import connected_components

    f = mesh.faces
    n = len(mesh.vertices)
    e = np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]])
    adj = sp.coo_matrix((np.ones(len(e)), (e[:, 0], e[:, 1])),
                        shape=(n, n))
    _, labels = connected_components(adj, directed=False)
    counts = np.bincount(labels[f[:, 0]])
    keep_label = int(np.argmax(counts))
    fkeep = f[labels[f[:, 0]] == keep_label]
    used = np.unique(fkeep)
    remap = np.zeros(n, np.int64)
    remap[used] = np.arange(len(used))
    return Mesh(mesh.vertices[used].copy(), remap[fkeep],
                None if mesh.uvs is None else mesh.uvs[used].copy())


def laplacian_smooth(mesh: Mesh, iterations: int = 8,
                     lamb: float = 0.5) -> Mesh:
    """Uniform laplacian smoothing (trimesh.filter_laplacian stand-in,
    shape_tools.py:505-513)."""
    nbr = _vertex_adjacency(mesh)
    max_deg = max((len(s) for s in nbr), default=1)
    idx = np.zeros((len(nbr), max_deg), np.int64)
    deg = np.zeros(len(nbr), np.int64)
    for i, s in enumerate(nbr):
        lst = sorted(s)
        idx[i, :len(lst)] = lst
        idx[i, len(lst):] = i
        deg[i] = max(len(lst), 1)
    v = mesh.vertices.copy()
    for _ in range(iterations):
        # padded slots point at the vertex itself; subtract them out
        mean = (v[idx].sum(1) - v * (max_deg - deg)[:, None]) \
            / deg[:, None]
        v = v + lamb * (mean - v)
    return Mesh(v, mesh.faces.copy(),
                None if mesh.uvs is None else mesh.uvs.copy())


def subdivide(mesh: Mesh) -> Mesh:
    """Loop-topology 1->4 subdivision with midpoint vertices
    (trimesh.remesh.subdivide stand-in, tools/map.py:800-808)."""
    verts = list(mesh.vertices)
    mid: dict[tuple, int] = {}

    def midpoint(a, b):
        key = (min(a, b), max(a, b))
        if key not in mid:
            mid[key] = len(verts)
            verts.append((mesh.vertices[a] + mesh.vertices[b]) / 2)
        return mid[key]

    faces = []
    for f in mesh.faces:
        a, b, c = int(f[0]), int(f[1]), int(f[2])
        ab, bc, ca = midpoint(a, b), midpoint(b, c), midpoint(c, a)
        faces += [[a, ab, ca], [b, bc, ab], [c, ca, bc], [ab, bc, ca]]
    return Mesh(np.asarray(verts), np.asarray(faces, np.int64))


def subdivide_to(mesh: Mesh, min_vertices: int) -> Mesh:
    out = mesh
    while len(out.vertices) < min_vertices:
        out = subdivide(out)
    return out


def remesh_isotropic(mesh: Mesh, target_edge: float | None = None,
                     iterations: int = 3) -> Mesh:
    """Poor-man's isotropic remesh (pymesh.remesh stand-in,
    shape_tools.py:30-68): subdivide long edges + tangential laplacian
    relaxation.  Collapse-free, so topology is preserved."""
    out = mesh
    if target_edge is None:
        target_edge = out.mean_edge_length
    for _ in range(iterations):
        if out.mean_edge_length > 1.4 * target_edge:
            out = subdivide(out)
        out = laplacian_smooth(out, iterations=2, lamb=0.3)
    return out


def align_bbox(src: Mesh, trg: Mesh) -> Mesh:
    """Scale/translate src so its bbox matches trg's
    (Align, shape_tools.py:479-503)."""
    sc = (src.vertices.max(0) + src.vertices.min(0)) / 2
    ss = np.abs(src.vertices - sc).max()
    tc = (trg.vertices.max(0) + trg.vertices.min(0)) / 2
    ts = np.abs(trg.vertices - tc).max()
    v = (src.vertices - sc) / ss * ts + tc
    return Mesh(v, src.faces.copy())


def icp(src_pts: np.ndarray, trg_pts: np.ndarray, iterations: int = 30,
        threshold: float = 0.02):
    """Point-to-point ICP (open3d stand-in, shape_tools.py:515-545).
    Returns (T [4,4], transformed src)."""
    from scipy.spatial import cKDTree

    src = src_pts.copy()
    T_total = np.eye(4)
    tree = cKDTree(trg_pts)
    for _ in range(iterations):
        d, idx = tree.query(src)
        keep = d < max(threshold, np.median(d) * 2)
        if keep.sum() < 3:
            break
        a = src[keep]
        b = trg_pts[idx[keep]]
        ca, cb = a.mean(0), b.mean(0)
        H = (a - ca).T @ (b - cb)
        U, _, Vt = np.linalg.svd(H)
        R = Vt.T @ U.T
        if np.linalg.det(R) < 0:
            Vt[-1] *= -1
            R = Vt.T @ U.T
        t = cb - R @ ca
        src = src @ R.T + t
        T_step = np.eye(4)
        T_step[:3, :3] = R
        T_step[:3, 3] = t
        T_total = T_step @ T_total
    return T_total, src


def chamfer_distance(a: np.ndarray, b: np.ndarray) -> float:
    from scipy.spatial import cKDTree

    d_ab, _ = cKDTree(b).query(a)
    d_ba, _ = cKDTree(a).query(b)
    return float((d_ab ** 2).mean() + (d_ba ** 2).mean())


def register_template(src: Mesh, trg_points: np.ndarray, *,
                      iterations: int = 300, lr: float = 0.05,
                      w_chamfer: float = 1.0, w_edge: float = 1.0,
                      w_laplacian: float = 0.5, n_samples: int = 2000,
                      seed: int = 0) -> Mesh:
    """Chamfer + edge + laplacian template deformation
    (Register, shape_tools.py:273-399), as a jitted jax/optax loop on the
    vertex offsets instead of pytorch3d."""
    import jax
    import jax.numpy as jnp
    import optax

    rng = np.random.default_rng(seed)
    v0 = jnp.asarray(src.vertices, jnp.float32)
    faces = jnp.asarray(src.faces, jnp.int32)
    edges = jnp.asarray(src.edges_unique, jnp.int32)
    n_t = min(n_samples, len(trg_points))
    trg = jnp.asarray(trg_points[rng.choice(len(trg_points), n_t,
                                            replace=False)], jnp.float32)

    def sample_surface_j(verts, key):
        tris = verts[faces]
        e1 = tris[:, 1] - tris[:, 0]
        e2 = tris[:, 2] - tris[:, 0]
        areas = 0.5 * jnp.linalg.norm(jnp.cross(e1, e2), axis=-1)
        k1, k2, k3 = jax.random.split(key, 3)
        fid = jax.random.categorical(
            k1, jnp.log(areas + 1e-12), shape=(n_samples,))
        u = jax.random.uniform(k2, (n_samples, 1))
        v = jax.random.uniform(k3, (n_samples, 1))
        flip = (u + v) > 1
        u = jnp.where(flip, 1 - u, u)
        v = jnp.where(flip, 1 - v, v)
        t = tris[fid]
        return t[:, 0] * (1 - u - v) + t[:, 1] * u + t[:, 2] * v

    def chamfer_j(a, b):
        d = jnp.sum((a[:, None] - b[None]) ** 2, -1)
        return jnp.mean(jnp.min(d, 1)) + jnp.mean(jnp.min(d, 0))

    nbr = _vertex_adjacency(src)
    max_deg = max(len(s) for s in nbr)
    nidx = np.zeros((len(nbr), max_deg), np.int64)
    nmask = np.zeros((len(nbr), max_deg), np.float32)
    for i, s in enumerate(nbr):
        lst = sorted(s)
        nidx[i, :len(lst)] = lst
        nmask[i, :len(lst)] = 1.0
    nidx = jnp.asarray(nidx)
    nmask = jnp.asarray(nmask)
    e0 = jnp.linalg.norm(v0[edges[:, 0]] - v0[edges[:, 1]], axis=-1)

    def loss_fn(offset, key):
        v = v0 + offset
        pts = sample_surface_j(v, key)
        l_ch = chamfer_j(pts, trg)
        el = jnp.linalg.norm(v[edges[:, 0]] - v[edges[:, 1]], axis=-1)
        l_edge = jnp.mean((el - e0) ** 2)
        mean_n = jnp.sum(v[nidx] * nmask[..., None], 1) \
            / jnp.maximum(jnp.sum(nmask, 1, keepdims=True), 1.0)
        l_lap = jnp.mean(jnp.sum((v - mean_n) ** 2, -1))
        return (w_chamfer * l_ch + w_edge * l_edge
                + w_laplacian * l_lap)

    opt = optax.adam(lr)

    @jax.jit
    def step(offset, opt_state, key):
        loss, g = jax.value_and_grad(loss_fn)(offset, key)
        upd, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(offset, upd), opt_state, loss

    offset = jnp.zeros_like(v0)
    opt_state = opt.init(offset)
    key = jax.random.PRNGKey(seed)
    for _ in range(iterations):
        key, k = jax.random.split(key)
        offset, opt_state, _ = step(offset, opt_state, k)
    return Mesh(np.asarray(v0 + offset), src.faces.copy())


def pca_plane(points: np.ndarray):
    """Fit a plane: returns (normal, center, transform-to-plane [4,4])
    (pca_plane, shape_tools.py:71-...)."""
    center = points.mean(0)
    _, _, vt = np.linalg.svd(points - center, full_matrices=False)
    normal = vt[2]
    T = np.eye(4)
    T[:3, :3] = vt
    T[:3, 3] = -vt @ center
    return normal, center, T


def normalize_mesh(mesh: Mesh, scale: float = 1.5) -> Mesh:
    """Center + scale into the unit-ish box
    (texture_synthesis_on_curved_surface.py:634-635)."""
    v = mesh.vertices - mesh.vertices.mean(0)
    v = v / (scale * np.abs(v).max() + 1e-12)
    return Mesh(v, mesh.faces.copy(),
                None if mesh.uvs is None else mesh.uvs.copy())


def arap_deform(mesh: Mesh, handle_ids: np.ndarray,
                handle_positions: np.ndarray, *,
                iterations: int = 10) -> Mesh:
    """As-rigid-as-possible surface deformation (Sorkine & Alexa 2007).

    Rebuild of the reference ``ARAP_deform`` (tools/shape_tools.py:402),
    which delegates to an external ARAP solver; here a self-contained
    uniform-weight local-global solver: per-vertex rotations from the
    SVD of the edge covariance, then one sparse Laplacian solve with the
    handles as hard constraints (scipy factorized once, reused across
    iterations).
    """
    import scipy.sparse as sp
    from scipy.sparse.linalg import factorized

    V = np.asarray(mesh.vertices, np.float64)
    F = np.asarray(mesh.faces, np.int64)
    n = len(V)
    handle_ids = np.asarray(handle_ids, np.int64)
    handle_positions = np.asarray(handle_positions, np.float64)

    e = np.concatenate([F[:, [0, 1]], F[:, [1, 2]], F[:, [2, 0]]])
    e = np.unique(np.sort(e, axis=1), axis=0)
    ei = np.concatenate([e[:, 0], e[:, 1]])          # directed edges
    ej = np.concatenate([e[:, 1], e[:, 0]])
    A = sp.coo_matrix((np.ones(len(ei)), (ei, ej)), shape=(n, n)).tocsr()
    deg = np.asarray(A.sum(1)).ravel()
    L = (sp.diags(deg) - A).tocsr()
    free = np.setdiff1d(np.arange(n), handle_ids)
    solve = factorized(L[free][:, free].tocsc())
    L_fh = L[free][:, handle_ids]

    E0 = V[ei] - V[ej]                               # rest edges [E, 3]
    P = V.copy()
    P[handle_ids] = handle_positions
    for _ in range(iterations):
        # local step: R_i from SVD of S_i = sum_j e0_ij e1_ij^T
        E1 = P[ei] - P[ej]
        S = np.zeros((n, 3, 3))
        np.add.at(S, ei, E0[:, :, None] * E1[:, None, :])
        U, _, Vt = np.linalg.svd(S)
        R = np.transpose(Vt, (0, 2, 1)) @ np.transpose(U, (0, 2, 1))
        det = np.linalg.det(R)
        Vt_fix = Vt.copy()
        Vt_fix[:, 2, :] *= np.sign(det)[:, None]
        R = np.transpose(Vt_fix, (0, 2, 1)) @ np.transpose(U, (0, 2, 1))
        # global step: L p' = b, b_i = sum_j 0.5 (R_i + R_j) (v_i - v_j)
        Rm = 0.5 * (R[ei] + R[ej])
        contrib = np.einsum("eab,eb->ea", Rm, E0)
        b = np.zeros((n, 3))
        np.add.at(b, ei, contrib)
        rhs = b[free] - L_fh @ P[handle_ids]
        P[free] = np.column_stack([solve(rhs[:, c]) for c in range(3)])
    return Mesh(P, F.copy(),
                None if mesh.uvs is None else mesh.uvs.copy())
