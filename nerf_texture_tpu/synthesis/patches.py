"""Patch sampling: extract implicit texture patches from the surface field.

Rebuild of the reference ``MeshFeatureField.sample_patches``
(tools/map.py:951-1128): poisson-disk-style sample <= max_patch_num
centers on the (picked-faces or whole) mesh, build a PCA-aligned local
frame per center, cast a patch_size^2 ray grid along -z onto the mesh,
reject patches far from the scan point cloud or with missed rays, then
project + hash-encode every texel.

TPU re-design: instead of the reference's per-center python loop with one
CUDA cast per patch, centers are processed in device *batches* -- all
patch_size^2 x batch rays cast and encoded in one jitted call.
"""

from __future__ import annotations

import dataclasses
import os

import numpy as np
import jax
import jax.numpy as jnp
from scipy.spatial import cKDTree

from ..geometry import projector as proj
from ..geometry.mesh import Mesh
from ..geometry.projector import MeshProjector
from ..models import mesh_field, normal_net
from ..models.mesh_field import MeshFieldConfig
from ..ops.hashgrid_packed import packed_encode_bound


@dataclasses.dataclass
class PatchSampleConfig:
    patch_size: int = 128
    max_patch_num: int = 2000
    pattern_rate: float = 1 / 50
    center_batch: int = 16       # centers cast+encoded per device call
    scan_dist_factor: float = 3.0
    record_rays: bool = False
    seed: int = 0
    # candidate centers drawn per requested patch: rejection (below-y /
    # scan-distance / ray-miss) discards a fraction of centers, so at
    # small max_patch_num the output count would otherwise be far below
    # the request.  The loop stops as soon as max_patch_num survive, so
    # oversampling costs nothing when rejection is rare.
    center_oversample: float = 2.0


def poisson_disk_sample(mesh: Mesh, n: int, seed: int = 0,
                        face_subset: np.ndarray | None = None
                        ) -> np.ndarray:
    """Approximate poisson-disk surface sampling: dense area-weighted
    sampling followed by farthest-point thinning (replaces open3d's
    sample_points_poisson_disk, tools/map.py:1004).

    ``face_subset`` restricts sampling to the given face ids -- the
    reference samples on the GUI's picked faces when any are selected
    (tools/map.py:1000-1011 picked_faces)."""
    rng = np.random.default_rng(seed)
    dense = sample_surface(mesh, max(4 * n, 2000), rng,
                           face_subset=face_subset)
    # farthest point: greedy
    chosen = [int(rng.integers(len(dense)))]
    d2 = ((dense - dense[chosen[0]]) ** 2).sum(-1)
    for _ in range(min(n, len(dense)) - 1):
        idx = int(np.argmax(d2))
        chosen.append(idx)
        d2 = np.minimum(d2, ((dense - dense[idx]) ** 2).sum(-1))
    return dense[chosen]


def sample_surface(mesh: Mesh, n: int, rng,
                   face_subset: np.ndarray | None = None) -> np.ndarray:
    areas = mesh.face_areas
    if face_subset is not None and len(face_subset):
        mask = np.zeros(len(areas), bool)
        mask[np.asarray(face_subset, np.int64)] = True
        areas = np.where(mask, areas, 0.0)
    probs = areas / areas.sum()
    fids = rng.choice(len(areas), size=n, p=probs)
    tris = mesh.vertices[mesh.faces[fids]]
    u = rng.uniform(size=(n, 1))
    v = rng.uniform(size=(n, 1))
    flip = (u + v) > 1
    u = np.where(flip, 1 - u, u)
    v = np.where(flip, 1 - v, v)
    return (tris[:, 0] * (1 - u - v) + tris[:, 1] * u + tris[:, 2] * v)


def pca_first_component(points: np.ndarray) -> np.ndarray:
    centered = points - points.mean(0)
    _, _, vt = np.linalg.svd(centered, full_matrices=False)
    return vt[0]


def sample_patches(field_params, state, cfg: MeshFieldConfig,
                   mesh: Mesh, scfg: PatchSampleConfig, *,
                   scan_pcl: np.ndarray | None = None,
                   mesh_for_sample: Mesh | None = None,
                   direction_points: np.ndarray | None = None,
                   face_subset: np.ndarray | None = None):
    """Returns the reference's field-export dict
    (nerf/network_curvedfield.py:548-550 schema).

    ``face_subset``: optional face ids of the sampling mesh to restrict
    patch centers to (the GUI region pick, tools/map.py:1000-1011)."""
    mfs = mesh_for_sample if mesh_for_sample is not None else mesh
    grid_gap = mfs.mean_edge_length * scfg.pattern_rate
    ps = scfg.patch_size
    patch_len = ps * grid_gap

    scan_tree = cKDTree(scan_pcl) if scan_pcl is not None else None
    first = pca_first_component(
        direction_points if direction_points is not None
        else mesh.vertices)

    n_cand = max(scfg.max_patch_num,
                 int(np.ceil(scfg.max_patch_num * scfg.center_oversample)))
    centers = poisson_disk_sample(mfs, n_cand, scfg.seed,
                                  face_subset=face_subset)
    tree = cKDTree(mfs.vertices)
    _, vidx = tree.query(centers)
    # center normal from nearest face-averaged vertex normal
    v_normals = mfs.vertex_normals[vidx]

    # patch-local texel offsets, z = 1 appended for the affine transform
    cal = np.linspace(-patch_len / 2, patch_len / 2, ps)
    gx, gy = np.meshgrid(cal, cal, indexing="ij")
    texels = np.stack([gx.ravel(), gy.ravel(), np.zeros(ps * ps)], -1)

    ncfg = cfg.normal_cfg

    @jax.jit
    def encode_batch(origins, dirs):
        """origins/dirs: [B*ps*ps, 3] -> per-texel outputs."""
        p_hit, _, depth, _ = proj.raycast(
            state.projector.tgrid, state.projector.vertices,
            state.projector.faces, origins, dirs)
        p_sur, sdf, _, normal, local_tbn = proj.project(
            state.projector, p_hit, k=cfg.k, h_threshold=cfg.h_threshold)
        feat = packed_encode_bound(p_sur, field_params["encoder"],
                                   cfg.feature_spec, bound=cfg.bound)
        phi = (normal_net.phi_embedding(field_params["normal"], p_sur,
                                        ncfg)
               if cfg.pred_normal else jnp.zeros((p_sur.shape[0], 1)))
        return p_hit, depth, feat, phi, local_tbn

    if os.environ.get("NERF_TPU_DEBUG_PATCHES"):
        # one-shot geometry dump so rejection bugs can be replayed
        # offline without retraining (read by scripts/_dbg_patches.py)
        import pickle
        dump = os.path.join(".bench", "patch_debug.pkl")
        os.makedirs(".bench", exist_ok=True)
        with open(dump, "wb") as fh:
            pickle.dump({
                "centers": centers, "v_normals": v_normals,
                "grid_gap": grid_gap, "patch_len": patch_len,
                "first": first, "h_threshold": cfg.h_threshold,
                "proj_vertices": np.asarray(state.projector.vertices),
                "proj_faces": np.asarray(state.projector.faces),
                "mfs_vertices": mfs.vertices, "mfs_faces": mfs.faces,
            }, fh)
        print(f"[patches] geometry dumped to {dump}", flush=True)

    out_patches, out_coors, out_norms = [], [], []
    out_stbn, out_ltbn, out_phi, out_centers, out_rays = [], [], [], [], []

    B = scfg.center_batch
    for start in range(0, len(centers), B):
        batch_c = centers[start:start + B]
        batch_n = v_normals[start:start + B]
        # below-y=0 rejection without scan (tools/map.py:1025-1027)
        if scan_pcl is None:
            keep = batch_c[:, 1] >= 0
        else:
            keep = np.ones(len(batch_c), bool)

        # local frames aligned with the PCA first component
        origins = np.zeros((len(batch_c), ps * ps, 3), np.float32)
        tbns = np.zeros((len(batch_c), 9), np.float32)
        for i, (c, z_axis) in enumerate(zip(batch_c, batch_n)):
            y_axis = np.cross(z_axis, first)
            if np.abs(y_axis).sum() < 1e-12:
                y_axis = np.cross(z_axis, np.array([1.0, 1.0, 1.01])
                                  * first)
            y_axis /= np.linalg.norm(y_axis)
            x_axis = np.cross(y_axis, z_axis)
            R = np.stack([x_axis, y_axis, z_axis], -1)
            origins[i] = texels @ R.T + c
            tbns[i] = R.T.reshape(9)

        scan_dmax = np.zeros(len(batch_c), np.float32)
        if scan_tree is not None:
            bound = min(1e-1, scfg.scan_dist_factor * cfg.h_threshold)
            for i in range(len(batch_c)):
                d, _ = scan_tree.query(origins[i])
                scan_dmax[i] = d.max()
                if d.max() > bound:
                    keep[i] = False

        n_before_rays = int(keep.sum())
        if not keep.any():
            continue
        ray_o = origins + 0.1 * batch_n[:, None, :]
        ray_d = np.broadcast_to(-batch_n[:, None, :], ray_o.shape)
        p_hit, depth, feat, phi, ltbn = encode_batch(
            jnp.asarray(ray_o.reshape(-1, 3), jnp.float32),
            jnp.asarray(np.ascontiguousarray(ray_d).reshape(-1, 3),
                        jnp.float32))
        depth = np.asarray(depth).reshape(len(batch_c), ps * ps)
        keep &= (depth.max(-1) < 9.5)   # all rays must hit
        if os.environ.get("NERF_TPU_DEBUG_PATCHES"):
            miss = (depth >= 9.5).mean(-1)
            print(f"[patches] batch {start}: scan-keep {n_before_rays}/"
                  f"{len(batch_c)} "
                  f"(dmax {np.round(scan_dmax, 4).tolist()} vs "
                  f"{min(1e-1, scfg.scan_dist_factor * cfg.h_threshold):.4f})"
                  f" ray-keep {int(keep.sum())} "
                  f"miss-frac {np.round(miss, 2).tolist()} "
                  f"depth-med {np.round(np.median(depth, -1), 3).tolist()}",
                  flush=True)
        if not keep.any():
            continue

        feat = np.asarray(feat).reshape(len(batch_c), ps, ps, -1)
        phi = np.asarray(phi).reshape(len(batch_c), ps, ps, -1)
        ltbn = np.asarray(ltbn).reshape(len(batch_c), ps, ps, 9)
        p_hit = np.asarray(p_hit).reshape(len(batch_c), ps, ps, 3)
        for i in np.where(keep)[0]:
            out_patches.append(feat[i])
            out_phi.append(phi[i])
            out_ltbn.append(ltbn[i])
            out_coors.append(p_hit[i])
            out_norms.append(batch_n[i])
            out_stbn.append(tbns[i])
            out_centers.append(batch_c[i])
            if scfg.record_rays:
                out_rays.append(np.concatenate(
                    [ray_o[i], ray_d[i]], -1).reshape(ps, ps, 6))
        if len(out_patches) >= scfg.max_patch_num:
            break

    n = min(len(out_patches), scfg.max_patch_num)
    return {
        "patches": np.stack(out_patches[:n]) if n else np.zeros(
            (0, ps, ps, cfg.encoder_f_out_dim)),
        "grid_gap": grid_gap,
        "patch_coors": np.stack(out_coors[:n]) if n else None,
        "patch_norms": np.stack(out_norms[:n]) if n else None,
        "patch_sample_tbn": np.stack(out_stbn[:n]) if n else None,
        "patch_local_tbn": np.stack(out_ltbn[:n]) if n else None,
        "picked_vertices": np.stack(out_centers[:n]) if n else None,
        "patch_phi_embed": np.stack(out_phi[:n]) if n else None,
        "patch_rays": (np.stack(out_rays[:n])
                       if scfg.record_rays and n else None),
        "mesh_vertices": mesh.vertices,
        "mesh_faces": mesh.faces,
    }
