"""Curved-surface texture synthesis (the TPAMI extension).

Rebuild of the reference ``texture_synthesis_on_curved_surface.py``:
rasterize the target mesh's UV atlas into per-texel 3D vertices
(``uv2vert`` :59-88), define a projected-constant surface direction field
(:283-288), then repeatedly: pick the next seed by sparse-proxy range
voting (:188-248, 400-416), extract a patch by local-frame ray casting
with erode/dilate mask cleanup (:302-363), sample the synthesized context
from the UV texture, match a source patch with a PCA/pyramid matcher
(:133-185), blend borders with an eroded mask stack (:436-459), and
assign texels via patch-mesh barycentrics (:481-490).  Output schema
matches ``curved_mesh.npz`` (:570).

Host-driven loop (inherently sequential); the ray casting / projection /
barycentric steps run on device through the geometry engine.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp
from scipy import ndimage
from scipy.spatial import cKDTree

from ..geometry import projector as proj
from ..geometry.mesh import Mesh
from ..geometry.projector import MeshProjector
from ..utils.grid_sample import grid_sample_2d


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

def pca_color_transform(data: np.ndarray, out_dim: int = 3):
    """Fit a PCA color mapping for latent visualization (get_transform,
    texture_synthesis_on_curved_surface.py:113-130)."""
    x = data.reshape(-1, data.shape[-1])
    mean = x.mean(0)
    _, _, vt = np.linalg.svd(x - mean, full_matrices=False)
    comp = vt[:out_dim]
    p = (x - mean) @ comp.T
    lo, hi = p.min(0), p.max(0)

    def f(a):
        q = (a.reshape(-1, a.shape[-1]) - mean) @ comp.T
        q = np.clip((q - lo) / (hi - lo + 1e-12), 0, 1)
        return q.reshape(*a.shape[:-1], out_dim)

    return f


def augment_patches(patches: np.ndarray, *, mirror_hor=True,
                    mirror_vert=True, crop_shift=True,
                    crop_factor: int = 2) -> np.ndarray:
    """Mirror + crop-shift augmentation
    (texture_synthesis_on_curved_surface.py:598-617)."""
    out = patches
    if mirror_hor:
        out = np.concatenate([out, out[:, ::-1]], 0)
    if mirror_vert:
        out = np.concatenate([out, out[:, :, ::-1]], 0)
    if crop_shift:
        crop_out = out.shape[1] // 5
        crop_len = out.shape[1] - crop_out
        stride = max(crop_out // crop_factor, 1)
        offs = np.arange(crop_factor) * stride
        crops = [out[:, :crop_len, :crop_len]]
        for i in range(crop_factor):
            for j in range(crop_factor):
                if i == 0 and j == 0:
                    continue
                crops.append(out[:, offs[i]:crop_len + offs[i],
                                 offs[j]:crop_len + offs[j]])
        out = np.concatenate(crops, 0)
    return out


def define_vector_field(mesh: Mesh,
                        default=np.array([0.0, 1.0, 0.0])) -> np.ndarray:
    """Constant direction projected into each vertex's tangent plane
    (:283-288)."""
    n = mesh.vertex_normals
    v = default[None] - (n * default[None]).sum(-1, keepdims=True) * n
    return v


def resize_bilinear(img: np.ndarray, h: int, w: int) -> np.ndarray:
    """skimage.transform.resize stand-in via jax bilinear sampling."""
    ys = np.linspace(-1, 1, h)
    xs = np.linspace(-1, 1, w)
    gy, gx = np.meshgrid(ys, xs, indexing="ij")
    coords = np.stack([gx, gy], -1)
    out = grid_sample_2d(jnp.asarray(img, jnp.float32),
                         jnp.asarray(coords, jnp.float32),
                         padding_zero=False)
    return np.asarray(out)


class MatchingLib:
    """Coarse-to-fine patch matcher (MatchingLib, :133-185)."""

    def __init__(self, patches: np.ndarray, *, channel_pca_dim=None,
                 pyramid_height: int = 2, pyramid_num_factor: int = 10,
                 pyramid_size_factor: int = 8, quantize: bool = False):
        self.channel_pca_dim = channel_pca_dim
        if channel_pca_dim is not None:
            self.compress = pca_color_transform(patches, channel_pca_dim)
            patches = self.compress(patches)
        else:
            self.compress = None
        self.levels = [patches]
        sizes = [patches.shape[1]]
        nums = [patches.shape[0]]
        for _ in range(pyramid_height - 1):
            psize = max(4, sizes[0] // pyramid_size_factor)
            nums.append(max(1, nums[-1] // pyramid_num_factor))
            small = np.stack([resize_bilinear(p, psize, psize)
                              for p in self.levels[0]])
            self.levels = [small] + self.levels
            sizes = [psize] + sizes
        self.sizes = sizes
        self.keep_nums = nums[1:] + [1]

    def match(self, condition: np.ndarray, mask: np.ndarray) -> int:
        if self.compress is not None:
            condition = self.compress(condition)
        conds = [condition]
        masks = [mask]
        for i in range(1, len(self.levels)):
            s = self.sizes[-i - 1]
            conds = [resize_bilinear(conds[0], s, s)] + conds
            masks = [(resize_bilinear(masks[0].astype(np.float32), s, s)
                      > 0)] + masks
        indices = np.arange(len(self.levels[0]))
        for i, (lvl, cond, msk) in enumerate(zip(self.levels, conds,
                                                 masks)):
            err = (((cond[None] - lvl[indices]) * msk[None]) ** 2
                   ).reshape(len(indices), -1).sum(-1)
            k = min(self.keep_nums[i], len(indices))
            pick = np.argpartition(err, k - 1)[:k]
            indices = indices[pick]
        return int(indices[0])


class SparseProxyDist:
    """Coarse geodesic-ish proxy over a sparse vertex subset with range
    voting for the next synthesis seed (:188-248)."""

    def __init__(self, dense_verts: np.ndarray,
                 sparse_verts: np.ndarray | None = None,
                 preferred_patch_gap: float | None = None):
        self.dense = dense_verts
        if sparse_verts is None:
            vox = (preferred_patch_gap / 10 if preferred_patch_gap
                   else 0.05 * (dense_verts.max() - dense_verts.min()))
            sparse_verts = _voxel_downsample(dense_verts, vox)
        self.sparse = sparse_verts
        tree = cKDTree(sparse_verts)
        _, self.d2s = tree.query(dense_verts)
        self.dist = np.linalg.norm(
            sparse_verts[:, None] - sparse_verts[None], axis=-1)
        nn, _ = tree.query(sparse_verts, k=min(2, len(sparse_verts)))
        self.sparse_avg = (nn[:, 1].mean() * 1.2 if nn.ndim > 1
                           else 1e-3)

    def set_range_vote(self, gap: float):
        """Convert the distance matrix into range votes: +1 in the ring
        (0.8..1) x gap, -1 inside (:389-391)."""
        d = self.dist
        self.dist = (np.logical_and(d < gap, d > 0.8 * gap).astype(float)
                     - (d <= 0.8 * gap).astype(float))

    def range_vote(self, history_idx, done_mask) -> int:
        hist_sparse = np.unique(self.d2s[history_idx])
        todo = np.where(~done_mask)[0]
        votes = self.dist[self.d2s[todo][:, None],
                          hist_sparse[None, :]].sum(1)
        return int(todo[np.argmax(votes)])

    def pick_vertices_to_set(self, tree_verts: np.ndarray,
                             grid_gap: float) -> np.ndarray:
        tree = cKDTree(tree_verts)
        d_sp, _ = tree.query(self.sparse)
        ok_sparse = np.where(d_sp < self.sparse_avg * 2)[0]
        cand = np.where(np.isin(self.d2s, ok_sparse))[0]
        if len(cand) == 0:
            return cand
        d, _ = tree.query(self.dense[cand])
        return cand[d < grid_gap]


def _voxel_downsample(points: np.ndarray, voxel: float) -> np.ndarray:
    key = np.floor(points / max(voxel, 1e-9)).astype(np.int64)
    _, idx = np.unique(key, axis=0, return_index=True)
    return points[np.sort(idx)]


# ---------------------------------------------------------------------------
# UV rasterization
# ---------------------------------------------------------------------------

def uv2vert(mesh_proj: MeshProjector, resolution: int = 512,
            batch: int = 65536):
    """Map UV texels to 3D surface points via a flattened uv-plane mesh
    (uv2vert, :59-88).  Returns (verts [K,3], vert_ids [K], resolution)."""
    m = mesh_proj.mesh
    uvs = np.asarray(mesh_proj.arrays.uvs)           # [-1, 1]
    plane = Mesh(np.concatenate(
        [uvs, np.zeros((len(uvs), 1))], -1), m.faces)
    plane_proj = MeshProjector(plane, store_uv=False)

    us, vs = np.meshgrid(np.linspace(-1, 1, resolution),
                         np.linspace(-1, 1, resolution), indexing="xy")
    texels = np.stack([us, vs, np.zeros_like(us)],
                      -1).reshape(-1, 3).astype(np.float32)
    verts = np.zeros((len(texels), 3), np.float32)
    hit = np.zeros(len(texels), bool)
    tgt_verts = mesh_proj.arrays.vertices
    for s in range(0, len(texels), batch):
        q = jnp.asarray(texels[s:s + batch])
        sdf, fid, bary, _ = proj.signed_distance(plane_proj.arrays, q)
        tri = tgt_verts[plane_proj.arrays.faces[jnp.maximum(fid, 0)]]
        v3d = jnp.sum(tri * bary[..., None], axis=-2)
        verts[s:s + batch] = np.asarray(v3d)
        hit[s:s + batch] = np.abs(np.asarray(sdf)) < 1e-2
    ids = np.arange(resolution * resolution)
    return verts[hit], ids[hit], resolution


# ---------------------------------------------------------------------------
# patch extraction on the target surface
# ---------------------------------------------------------------------------

def extract_patch_on_surface(mesh_proj: MeshProjector, vert: np.ndarray,
                             patch_size: int, vectors: np.ndarray,
                             grid_gap: float,
                             shooting_distance: float = 0.05):
    """Cast a patch grid onto the surface in the seed's local frame
    (:302-363).  Returns (verts [P,P,3], uvs [P,P,2], mask [P,P],
    faces)."""
    arr = mesh_proj.arrays
    cal = np.linspace(-patch_size * grid_gap / 2,
                      patch_size * grid_gap / 2, patch_size)
    gx, gy = np.meshgrid(cal, cal, indexing="ij")
    local = np.stack([gx.ravel(), gy.ravel(),
                      np.zeros(patch_size ** 2)], -1)

    # seed frame from the nearest vertex normal + direction field
    tree = cKDTree(mesh_proj.mesh.vertices)
    _, vid = tree.query(vert)
    z_axis = mesh_proj.mesh.vertex_normals[vid]
    y_axis = np.cross(z_axis, vectors[vid])
    if np.abs(y_axis).sum() < 1e-12:
        y_axis = np.cross(z_axis, np.array([1.0, 1.0, 1.01])
                          + vectors[vid])
    y_axis /= np.linalg.norm(y_axis)
    x_axis = np.cross(y_axis, z_axis)
    R = np.stack([x_axis, y_axis, z_axis], -1)
    origins = local @ R.T + vert + shooting_distance * z_axis
    dirs = np.broadcast_to(-z_axis[None], origins.shape)

    pos, _, depth, fid = proj.raycast(
        arr.tgrid, arr.vertices, arr.faces,
        jnp.asarray(origins, jnp.float32),
        jnp.asarray(np.ascontiguousarray(dirs), jnp.float32))
    depth = np.asarray(depth).reshape(patch_size, patch_size)
    fid_np = np.asarray(fid).reshape(patch_size, patch_size)
    mask = depth < 9.5
    # normal-angle check
    fnorm = np.asarray(mesh_proj.mesh.face_normals)[
        fid_np.clip(0).reshape(-1)].reshape(patch_size, patch_size, 3)
    mask &= (fnorm * z_axis).sum(-1) > np.cos(np.pi / 4)
    # depth check
    mask &= np.abs(depth - shooting_distance) < 0.05
    # morphology cleanup (open + close)
    mask = ndimage.binary_erosion(mask, iterations=2)
    mask = ndimage.binary_dilation(mask, iterations=4)
    mask = ndimage.binary_erosion(mask, iterations=2)

    uvh_out, _, _, _ = proj.uvh(arr, pos)
    uvs = np.asarray(uvh_out[:, :2]).reshape(patch_size, patch_size, 2)
    verts3d = np.asarray(pos).reshape(patch_size, patch_size, 3)

    vid_grid = np.arange(patch_size ** 2).reshape(patch_size, patch_size)
    faces = []
    for i in range(patch_size - 1):
        for j in range(patch_size - 1):
            faces.append([vid_grid[i, j], vid_grid[i + 1, j],
                          vid_grid[i, j + 1]])
            faces.append([vid_grid[i + 1, j], vid_grid[i + 1, j + 1],
                          vid_grid[i, j + 1]])
    return verts3d, uvs, mask, np.asarray(faces, np.int64)


# ---------------------------------------------------------------------------
# the synthesis loop
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class CurvedSynthesisConfig:
    grid_gap: float = 5e-4
    resolution: int = 512
    use_matchlib: bool = True
    max_iters: int = 10000
    seed: int = 0


def synthesis_on_uvmap(mesh_proj: MeshProjector, verts: np.ndarray,
                       vert_ids: np.ndarray, resolution: int,
                       patches: np.ndarray, vectors: np.ndarray,
                       original_grid_gap: float,
                       cfg: CurvedSynthesisConfig,
                       progress: bool = False) -> dict:
    """Main loop (synthesis_on_uvmap, :366-570).  Returns the
    curved_mesh.npz payload."""
    C = patches.shape[-1]
    ps = patches.shape[1]
    textures = np.zeros((resolution, resolution, C), np.float32)
    syn_mask_img = np.zeros((resolution, resolution, 1), np.float32)
    done = np.zeros(len(verts), bool)

    gap = cfg.grid_gap
    preferred = ps * gap * 0.9
    proxy = SparseProxyDist(verts, mesh_proj.mesh.vertices, preferred)
    proxy.set_range_vote(preferred)
    matcher = MatchingLib(patches) if cfg.use_matchlib else None

    history = [0]
    last = -1
    iters = 0
    smooth_range = max(ps // 20, 1)
    while not done.all() and iters < cfg.max_iters:
        iters += 1
        seed_id = proxy.range_vote(history, done)
        dead_loop = seed_id == last
        last = seed_id
        history.append(seed_id)

        p_verts, p_uvs, p_mask, p_faces = extract_patch_on_surface(
            mesh_proj, verts[seed_id], ps, vectors, gap)
        uv_j = jnp.asarray(p_uvs.reshape(-1, 2))
        occupied = (np.asarray(grid_sample_2d(
            jnp.asarray(syn_mask_img), uv_j)).reshape(ps, ps) > 0.9) \
            & p_mask
        context = np.asarray(grid_sample_2d(
            jnp.asarray(textures), uv_j)).reshape(ps, ps, C)

        # border blending mask: mean of progressively eroded occupancy
        blend_stack = [occupied.astype(np.float32)]
        for _ in range(smooth_range):
            blend_stack.append(ndimage.binary_erosion(
                blend_stack[-1] > 0).astype(np.float32))
        blend = np.stack(blend_stack).mean(0)[..., None]
        match_mask = occupied[..., None] - blend

        if matcher is not None:
            pid = matcher.match(context, match_mask)
        else:
            err = (((patches - context[None]) ** 2)
                   * match_mask[None]).reshape(len(patches), -1).sum(-1)
            pid = int(np.argmin(err))
        picked = patches[pid] * (1 - blend) + context * blend

        # vertices to set: inside the (eroded) un-occupied patch region
        er_occ = ndimage.binary_erosion(occupied)
        inner = (~er_occ & p_mask)[2:-2, 2:-2]
        tree_verts = p_verts[2:-2, 2:-2].reshape(-1, 3)[inner.ravel()]
        if len(tree_verts) == 0:
            tree_verts = verts[seed_id:seed_id + 1]
        to_set = proxy.pick_vertices_to_set(tree_verts, gap)
        to_set = np.union1d(to_set, [seed_id])

        # barycentric texel assignment on the patch grid
        pv_flat = p_verts.reshape(-1, 3)
        tree = cKDTree(pv_flat)
        d, nearest = tree.query(verts[to_set])
        thr = np.inf if dead_loop else max(1e-3, 2 * gap)
        ok = d < thr
        to_set = to_set[ok]
        if len(to_set):
            vals = _interp_on_grid(p_verts, picked, verts[to_set])
            rows = vert_ids[to_set] // resolution
            cols = vert_ids[to_set] % resolution
            textures[rows, cols] = vals
            syn_mask_img[rows, cols] = 1.0
            done[to_set] = True
        done[seed_id] = True
        if progress and iters % 10 == 0:
            print(f"curved synthesis {done.mean() * 100:.1f}% "
                  f"({(~done).sum()} left)")

    return {
        "features": np.moveaxis(textures[None], -1, 1),  # [1, C, H, W]
        "mesh_vertices": mesh_proj.mesh.vertices,
        "mesh_faces": mesh_proj.mesh.faces,
        "uv": np.asarray(mesh_proj.arrays.uvs),
        "phi_embed": None,
        "local_tbn": None,
        "sdf_factor": gap / original_grid_gap,
        "original_grid_gap": original_grid_gap,
    }


def _interp_on_grid(p_verts: np.ndarray, values: np.ndarray,
                    query: np.ndarray) -> np.ndarray:
    """Barycentric interpolation of patch values at 3D query points via
    nearest patch-texel neighborhoods (stand-in for the reference's
    trimesh closest_point on the patch mesh, :481-487)."""
    ps = p_verts.shape[0]
    flat_v = p_verts.reshape(-1, 3)
    flat_f = values.reshape(-1, values.shape[-1])
    tree = cKDTree(flat_v)
    d, idx = tree.query(query, k=min(3, len(flat_v)))
    if d.ndim == 1:
        return flat_f[idx]
    w = 1.0 / (d + 1e-9)
    w /= w.sum(-1, keepdims=True)
    return (flat_f[idx] * w[..., None]).sum(-2)
