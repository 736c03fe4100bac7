"""Field/patch/shape/unhash save-load plumbing + offline renderers.

Rebuild of the reference Trainer's IO layer (nerf/utils.py:1093-1292):
``save_field`` (sampled patch npz), ``load_field`` (texture.npz ->
import_field), ``load_patch``, ``load_shape`` (new template mesh),
``load_unhash`` (curved_mesh.npz -> 2048^2 UV re-bake), plus
``save_mesh`` (isosurface -> obj), ``save_point_cloud`` and the offline
renderers ``take_photo`` / ``render_train`` / ``render_round``
(nerf/utils.py:734-936).
"""

from __future__ import annotations

import os

import numpy as np
import jax.numpy as jnp

from ..data.poses import orbit_pose
from ..geometry.mesh import Mesh, save_obj, save_ply_points
from ..geometry.projector import MeshProjector, pointcloud_arrays
from ..geometry.shape_tools import normalize_mesh
from ..models import mesh_field
from ..synthesis.patches import PatchSampleConfig, sample_patches


# ---------------------------------------------------------------------------
# export / import
# ---------------------------------------------------------------------------

def save_field(trainer, path: str, *, scan_pcl=None, mesh: Mesh = None,
               scfg: PatchSampleConfig | None = None, face_subset=None):
    """Sample patches from the trained field and write the field npz
    (Trainer.save_field, nerf/utils.py:1172-1199).

    ``face_subset`` (or ``trainer.picked_faces`` when unset) restricts
    patch centers to a user-picked mesh region, like the reference GUI's
    face picking (tools/map.py:1000-1011)."""
    scfg = scfg or PatchSampleConfig()
    if face_subset is None:
        face_subset = getattr(trainer, "picked_faces", None)
    out = sample_patches(trainer.state.params["field"],
                         trainer.field_state, trainer.ccfg.field, mesh,
                         scfg, scan_pcl=scan_pcl, face_subset=face_subset)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, **{k: v for k, v in out.items() if v is not None})
    return out


def load_field(trainer, path: str):
    """texture.npz -> import_field (Trainer.load_field,
    nerf/utils.py:1201-1214; import_field, network_curvedfield.py:
    457-475)."""
    data = np.load(path, allow_pickle=True)
    features = data["features"]
    H, W = features.shape[:2]
    grid_gap = float(data["grid_gap"])
    imported = mesh_field.import_field_data(
        features=features,
        sample_tbn=data["sample_tbn"],
        sample_tbn_ids=data["sample_tbn_ids"],
        local_tbn=data["local_tbn"].reshape(H, W, 9),
        phi_embed=data["phi_embed"],
        bounds=[0.5 * grid_gap * H, 0.5 * grid_gap * W])
    trainer.field_state = trainer.field_state._replace(imported=imported)
    trainer.mode = "field"
    trainer.initialize_states()


def load_patch(trainer, field_npz_path: str, patch_id: int = 0):
    """Import one sampled patch as a scattered point field
    (Trainer.load_patch; import_patch, network_curvedfield.py:477-492)."""
    data = np.load(field_npz_path, allow_pickle=True)
    pid = patch_id % data["patches"].shape[0]
    coors = data["patch_coors"][pid].reshape(-1, 3)
    norm = data["patch_norms"][pid]
    imported = mesh_field.import_patch_data(
        features=data["patches"][pid].reshape(-1,
                                              data["patches"].shape[-1]),
        local_tbn=data["patch_local_tbn"][pid].reshape(-1, 9),
        phi_embed=data["patch_phi_embed"][pid].reshape(
            -1, data["patch_phi_embed"].shape[-1]))
    pc = pointcloud_arrays(coors, np.tile(norm[None], (len(coors), 1)))
    trainer.field_state = trainer.field_state._replace(
        imported=imported, projector_imported=pc)
    trainer.mode = "patch"
    trainer.initialize_states()


def load_shape(trainer, mesh: Mesh):
    """Synthesize onto a new target mesh (Trainer.load_shape;
    import_shape, network_curvedfield.py:494-501): normalize, build a
    projector with a UV atlas, and set the recommended sdf factor."""
    m = normalize_mesh(mesh, scale=1.2)
    mp = MeshProjector(m)
    rt = mesh_field.FieldRuntime.default()
    if mp.recommended_sdf_factor is not None:
        bounds = np.asarray(trainer.field_state.imported.bounds)
        rt = rt._replace(sdf_scale_factor=jnp.asarray(
            mp.recommended_sdf_factor / max(float(bounds[0]), 1e-9)))
    trainer.field_state = trainer.field_state._replace(
        projector_imported=mp.arrays)
    trainer.runtime = rt
    trainer.mode = "shape"
    trainer.initialize_states()
    return mp


def load_unhash(trainer, curved_npz_path: str, res: int = 1024):
    """curved_mesh.npz -> re-bake vertex features into a UV canvas and
    render as an imported shape (Trainer.load_unhash, nerf/utils.py:1233;
    import_unhash, tools/map.py:875-910)."""
    data = np.load(curved_npz_path, allow_pickle=True)
    mesh = Mesh(data["mesh_vertices"], data["mesh_faces"],
                data["uv"] if "uv" in data else None)
    mp = MeshProjector(mesh)
    features = data["features"]
    if features.ndim == 4:                  # [1, C, H, W] canvas layout
        canvas = np.moveaxis(features[0], 0, -1)
    else:                                   # per-vertex features
        canvas = _bake_vertex_features(mp, features, res)
    imported = trainer.field_state.imported._replace(
        features_2d=jnp.asarray(canvas, jnp.float32))
    trainer.field_state = trainer.field_state._replace(
        imported=imported, projector_imported=mp.arrays)
    trainer.runtime = mesh_field.FieldRuntime.default()._replace(
        sdf_scale_factor=jnp.asarray(float(data["sdf_factor"])))
    trainer.mode = "shape"
    trainer.initialize_states()
    return mp


def unhash(trainer, *, min_vertices: int = 100000):
    """Bake the trained hash field into per-vertex features on a
    subdivided template and switch to 'unhash' rendering
    (MeshFeatureField.unhash, tools/map.py:842-860)."""
    import jax

    from ..geometry.shape_tools import subdivide_to
    from ..models.mesh_field import import_unhash_data
    from ..models import normal_net
    from ..ops.hashgrid_packed import packed_encode_bound

    fine = subdivide_to(trainer.field_state_mesh
                        if hasattr(trainer, "field_state_mesh")
                        else _mesh_from_arrays(trainer.field_state
                                               .projector),
                        min_vertices)
    mp = MeshProjector(fine)
    fcfg = trainer.ccfg.field
    fparams = trainer.state.params["field"]
    verts = jnp.asarray(fine.vertices, jnp.float32)
    feats = []
    phis = []
    chunk = 65536
    encode = jax.jit(lambda v: packed_encode_bound(
        v, fparams["encoder"], fcfg.feature_spec, bound=fcfg.bound))
    phi_fn = jax.jit(lambda v: normal_net.phi_embedding(
        fparams["normal"], v, fcfg.normal_cfg))         if fcfg.pred_normal else None
    for s0 in range(0, len(fine.vertices), chunk):
        v = verts[s0:s0 + chunk]
        pad = chunk - v.shape[0]
        if pad:
            v = jnp.pad(v, ((0, pad), (0, 0)))
        feats.append(np.asarray(encode(v))[:chunk - pad or chunk])
        if phi_fn is not None:
            phis.append(np.asarray(phi_fn(v))[:chunk - pad or chunk])
    features = np.concatenate(feats)[:len(fine.vertices)]
    phi = (np.concatenate(phis)[:len(fine.vertices)]
           if phis else None)
    trainer.field_state = trainer.field_state._replace(
        imported=import_unhash_data(features, phi),
        projector_imported=mp.arrays)
    trainer.mode = "unhash"
    trainer.initialize_states()
    return mp


def _mesh_from_arrays(arrays):
    return Mesh(np.asarray(arrays.vertices, np.float64),
                np.asarray(arrays.faces, np.int64))


def _bake_vertex_features(mp: MeshProjector, vert_features: np.ndarray,
                          res: int, batch: int = 65536) -> np.ndarray:
    """Bake per-vertex features into the UV atlas (import_unhash,
    tools/map.py:875-910): uv texel -> 3D -> barycentric vertex blend."""
    from ..geometry import projector as proj

    uvs = np.asarray(mp.arrays.uvs)
    plane = Mesh(np.concatenate([uvs, np.zeros((len(uvs), 1))], -1),
                 mp.mesh.faces)
    plane_proj = MeshProjector(plane, store_uv=False)
    us, vs = np.meshgrid(np.linspace(-1, 1, res),
                         np.linspace(-1, 1, res), indexing="xy")
    texels = np.stack([us, vs, np.zeros_like(us)], -1).reshape(-1, 3)
    canvas = np.zeros((res * res, vert_features.shape[-1]), np.float32)
    vf = jnp.asarray(vert_features, jnp.float32)
    for s in range(0, len(texels), batch):
        q = jnp.asarray(texels[s:s + batch], jnp.float32)
        sdf, fid, bary, _ = proj.signed_distance(plane_proj.arrays, q)
        vids = plane_proj.arrays.faces[jnp.maximum(fid, 0)]
        vals = jnp.sum(vf[vids] * bary[..., None], axis=-2)
        vals = vals * (jnp.abs(sdf)[:, None] < 0.1)
        canvas[s:s + batch] = np.asarray(vals)
    return canvas.reshape(res, res, -1)


# ---------------------------------------------------------------------------
# mesh / point cloud export
# ---------------------------------------------------------------------------

def save_mesh(density_fn, path: str, *, resolution: int = 256,
              bound: float = 1.0, threshold: float = 10.0):
    """Marching-cubes-equivalent mesh export (Trainer.save_mesh,
    nerf/utils.py:713-732)."""
    from ..ops.isosurface import extract_mesh

    v, f = extract_mesh(density_fn, resolution=resolution, bound=bound,
                        threshold=threshold)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    save_obj(path, Mesh(v, f))
    return v, f


def save_point_cloud(trainer, path: str, *, n_views: int = 12,
                     min_weight: float = 0.95, max_points: int = 200000,
                     seed: int = 0):
    """Scan point cloud by depth backprojection from farthest-pose views
    (Trainer.save_point_cloud, nerf/utils.py:1093-1149)."""
    poses = np.asarray(trainer.poses)
    # farthest-pose subset
    centers = poses[:, :3, 3]
    chosen = [0]
    d2 = ((centers - centers[0]) ** 2).sum(-1)
    for _ in range(min(n_views, len(poses)) - 1):
        idx = int(np.argmax(d2))
        chosen.append(idx)
        d2 = np.minimum(d2, ((centers - centers[idx]) ** 2).sum(-1))

    intr = np.asarray(trainer.intrinsics)
    pts = []
    from ..data.rays import get_rays

    for idx in chosen:
        out = trainer.render_frame(trainer.poses[idx], use_ema=False)
        depth = np.asarray(out["depth"])
        wsum = np.asarray(out["weights_sum"])
        rays = get_rays(trainer.poses[idx], trainer.intrinsics,
                        trainer.H, trainer.W)
        o = np.asarray(rays["rays_o"]).reshape(trainer.H, trainer.W, 3)
        d = np.asarray(rays["rays_d"]).reshape(trainer.H, trainer.W, 3)
        # depth is normalized (t - near) / (far - near); recover t
        from ..ops import near_far_from_aabb

        nears, fars = near_far_from_aabb(
            jnp.asarray(o.reshape(-1, 3)), jnp.asarray(d.reshape(-1, 3)),
            jnp.asarray([-trainer.rcfg.bound] * 3
                        + [trainer.rcfg.bound] * 3), trainer.rcfg.min_near)
        t = (np.asarray(nears) + depth.reshape(-1)
             * (np.asarray(fars) - np.asarray(nears)))
        mask = (wsum.reshape(-1) > min_weight) & (t > 0)
        pts.append((o.reshape(-1, 3) + t[:, None] * d.reshape(-1, 3))
                   [mask])
    pcl = np.concatenate(pts, 0)
    if len(pcl) > max_points:
        rng = np.random.default_rng(seed)
        pcl = pcl[rng.choice(len(pcl), max_points, replace=False)]
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    save_ply_points(path, pcl)
    return pcl


# ---------------------------------------------------------------------------
# offline renderers (Trainer.take_photo / render_train / render_round,
# nerf/utils.py:734-936)
# ---------------------------------------------------------------------------

def take_photo(trainer, pose, *, H=None, W=None, path: str | None = None,
               bg_color=1.0):
    out = trainer.render_frame(pose, H=H, W=W, bg_color=bg_color)
    img = np.clip(np.asarray(out["image"]), 0, 1)
    if path:
        import imageio.v3 as iio

        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        iio.imwrite(path, (img * 255).astype(np.uint8))
    return img


def render_train(trainer, out_dir: str, *, indices=None):
    """Render every (or selected) training view to disk."""
    indices = indices if indices is not None else range(
        len(np.asarray(trainer.poses)))
    paths = []
    for i in indices:
        p = os.path.join(out_dir, f"train_{i:04d}.png")
        take_photo(trainer, trainer.poses[i], path=p)
        paths.append(p)
    return paths


def render_round(trainer, out_dir: str, *, n_frames: int = 30,
                 radius: float | None = None, theta: float = np.pi / 2.2):
    """Orbit render (Trainer.render_round, nerf/utils.py:~900)."""
    radius = radius if radius is not None else float(
        np.linalg.norm(np.asarray(trainer.poses)[:, :3, 3],
                       axis=-1).mean())
    paths = []
    for k in range(n_frames):
        pose = orbit_pose(theta, 2 * np.pi * k / n_frames, radius)
        p = os.path.join(out_dir, f"round_{k:04d}.png")
        take_photo(trainer, pose, path=p)
        paths.append(p)
    return paths
