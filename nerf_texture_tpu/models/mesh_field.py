"""MeshFeatureField: the core NeRF-Texture surface field.

Rebuild of the reference ``MeshFeatureField`` (tools/map.py:546-1156):
maps a 3D point to (surface-feature embedding || height embedding,
coarse normal, fine normal, shell mask).

Training mode projects the point to the base mesh and hash-encodes the
surface point (with optional VAE-style probabilistic noise); import modes
swap the feature source for a synthesized flat canvas (``field``),
scattered patch points (``patch``), a new target mesh (``shape``) or a
baked vertex field (``unhash``) -- tools/map.py:620-737.

Everything is functional: parameters are a pytree, geometry/imported data
live in a `MeshFieldState` pytree, and the import *mode* is a static
argument selecting the traced code path.
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import projector as proj
from ..geometry.projector import MeshProjector, ProjectorArrays
from ..ops import freq_encode, freq_encode_dim
from ..ops.hashgrid_packed import (PackedGridSpec, packed_encode_bound,
                                   packed_encode_bound_dual)
from ..utils.grid_sample import grid_sample_2d
from . import clustering as clus
from . import normal_net


@dataclasses.dataclass(frozen=True)
class MeshFieldConfig:
    num_levels: int = 8
    level_dim: int = 2
    base_resolution: int = 512
    desired_resolution: int = 1024
    log2_bricks: int = 16
    # inference-only (no_noise paths): gather hash-table rows through a
    # bf16 cast -- the gather is HBM-bound, so this nearly halves the
    # encode cost at unchanged PSNR (see docs/PERF.md).
    infer_table_bf16: bool = True
    # training: bf16 row gathers + bf16 MXU interpolation with f32
    # scatter-accumulated table gradients (ops/hashgrid_packed
    # `_rows_lookup_amp`) -- the reference trains the same tables under
    # fp16 autocast (gridencoder/grid.py:38-39); measured 2.75x on the
    # dominant gather at equal PSNR (docs/PERF.md round 2)
    train_table_bf16: bool = True
    h_threshold: float = 0.1
    k: int = 8
    k_for_uv: int = 5
    bound: float = 1.0
    clustering: bool = True
    prob_model: bool = True
    # mean init of the log-variance lanes.  The reference inits its
    # encoder_var table at ~0 (std 1e-5, tools/map.py:566), i.e. unit-std
    # noise on ~1e-4-scale features; over its 40k-iter runs the variance
    # decays, but at bench budgets (<=3k steps) the noise swamps the fit
    # (measured: 15.6 dB vs 26.6 with noise off, scripts/
    # _dbg_quality_cpu.py round 4).  Starting the lanes at a negative
    # mean keeps the same reparameterized-noise mechanism (gradients can
    # still raise the variance where reuse wants it) with conditioning
    # that doesn't destroy short runs.
    logvar_init: float = -8.0
    pred_normal: bool = True
    lip: bool = True
    pattern_rate: float = 1 / 50
    z_multires: int = 12
    bound_output_normal: bool = False
    n_clusters: int = 4
    # project once per RAY (tangent-plane shell approximation) instead of
    # once per sample -- ~pool_mean_samples x less geometry work.  False
    # recovers the reference-exact per-sample projection.
    per_ray_projection: bool = True
    # feature storage: 'hash' (default) or 'vertex' -- features on the
    # vertices of a subdivided copy of the template, interpolated
    # barycentrically and frequency-encoded (the reference's hash=False
    # branch, tools/map.py:569-587,634-637)
    encoder_type: str = "hash"
    feature_dim: int = 16          # vertex-feature width
    vertex_multires: int = 8       # freq bands over tanh(features)
    # vertex count of the feature mesh (set from make_feature_projector's
    # mesh before building params; static)
    n_feature_vertices: int = 0
    # progressive coarse-to-fine schedule (tools/map.py:569-575): the
    # feature mesh starts at ~base_vnum vertices and grows geometrically
    # to target_vnum over level_num levels, features resampled
    # barycentrically at each step (grow_feature_mesh).  level_num=1
    # disables the schedule (single static mesh).
    level_num: int = 1
    base_vnum: int = 4096
    target_vnum: int = 128 ** 2

    @property
    def feature_spec(self) -> PackedGridSpec:
        # hash grid over 3D surface points: 8 levels x 2ch, 512 -> 1024
        # (tools/map.py:563)
        return PackedGridSpec(
            input_dim=3, num_levels=self.num_levels,
            level_dim=self.level_dim,
            base_resolution=self.base_resolution,
            desired_resolution=self.desired_resolution,
            log2_bricks=self.log2_bricks, align_corners=True)

    @property
    def encoder_f_out_dim(self) -> int:
        if self.encoder_type == "vertex":
            return freq_encode_dim(self.feature_dim, self.vertex_multires)
        return self.num_levels * self.level_dim

    @property
    def encoder_z_out_dim(self) -> int:
        return freq_encode_dim(1, self.z_multires)   # 1 + 2 * 12 = 25

    @property
    def embed_dim(self) -> int:
        return self.encoder_f_out_dim + self.encoder_z_out_dim

    @property
    def normal_cfg(self) -> normal_net.NormalNetConfig:
        return normal_net.NormalNetConfig(
            x_dim=self.encoder_f_out_dim, z_dim=self.encoder_z_out_dim,
            lip=self.lip, bound_output=self.bound_output_normal,
            bound=self.bound)


class FieldRuntime(NamedTuple):
    """Interactive scalars (GUI sliders) carried as traced values so
    changing them never recompiles (tools/map.py:615-618)."""

    sdf_scale_factor: jax.Array
    sdf_offset: jax.Array
    uv_utilize_rate: jax.Array
    # fine/coarse normal blend (reference fc_weight slider,
    # nerf/gui.py:628, network_curvedfield.py:300)
    fc_weight: jax.Array = None

    @staticmethod
    def default():
        # numpy constants (device_put, no per-shape constant programs)
        one = np.ones((), np.float32)
        return FieldRuntime(sdf_scale_factor=jnp.asarray(one),
                            sdf_offset=jnp.asarray(np.zeros((), np.float32)),
                            uv_utilize_rate=jnp.asarray(one),
                            fc_weight=jnp.asarray(one))


class ImportedData(NamedTuple):
    """Device arrays for the import modes (unused entries are size-1)."""

    features_2d: jax.Array       # [H, W, C] synthesized canvas
    phi_embed_2d: jax.Array      # [H, W, P]
    local_tbn_2d: jax.Array      # [H, W, 9]
    sample_tbn_ids_2d: jax.Array  # [H, W] int32
    sample_tbn_inv: jax.Array    # [S, 3, 3]
    bounds: jax.Array            # [2]
    features_v: jax.Array        # [V, C] patch/unhash per-point features
    phi_embed_v: jax.Array       # [V, P]
    local_tbn_v: jax.Array       # [V, 3, 3]

    @staticmethod
    def empty():
        # numpy constants: jnp.eye alone compiles iota+equal+convert
        # one-off programs on a cold start
        def z(shape, dtype=np.float32):
            return jnp.asarray(np.zeros(shape, dtype))

        eye = jnp.asarray(np.eye(3, dtype=np.float32)[None])
        return ImportedData(z((1, 1, 1)), z((1, 1, 1)), z((1, 1, 9)),
                            z((1, 1), np.int32), eye,
                            jnp.asarray(np.ones((2,), np.float32)),
                            z((1, 1)), z((1, 1)), eye)


class MeshFieldState(NamedTuple):
    projector: ProjectorArrays            # base/template mesh
    projector_imported: ProjectorArrays   # imported mesh (or base copy)
    imported: ImportedData
    # subdivided feature mesh for encoder_type='vertex'
    # (tools/map.py:573-578); None for the hash encoder
    projector_fea: ProjectorArrays | None = None


def make_state(mesh_projector: MeshProjector,
               imported_projector: MeshProjector | None = None,
               imported: ImportedData | None = None,
               fea_projector: MeshProjector | None = None
               ) -> MeshFieldState:
    return MeshFieldState(
        projector=mesh_projector.arrays,
        projector_imported=(imported_projector.arrays
                            if imported_projector is not None
                            else mesh_projector.arrays),
        imported=imported if imported is not None else ImportedData.empty(),
        projector_fea=(fea_projector.arrays
                       if fea_projector is not None else None))


def make_feature_projector(mesh, min_vertices: int = 128 ** 2
                           ) -> MeshProjector:
    """Subdivide the template until >= min_vertices and index it -- the
    vertex-feature mesh of the reference's hash=False branch
    (subdivide_mesh, tools/map.py:800-808; target_vnum 128**2 :574)."""
    from ..geometry.shape_tools import subdivide_to

    return MeshProjector(subdivide_to(mesh, min_vertices), store_uv=False)


def levels_vnum(cfg: MeshFieldConfig) -> tuple[int, ...]:
    """Geometric vertex-count schedule base_vnum -> target_vnum over
    level_num levels (tools/map.py:575)."""
    if cfg.level_num <= 1:
        return (cfg.target_vnum,)
    ts = np.linspace(0.0, np.log2(cfg.target_vnum / cfg.base_vnum),
                     cfg.level_num)
    return tuple(int(round(cfg.base_vnum * 2.0 ** t)) for t in ts)


def grow_feature_mesh(params, ema_params, state: MeshFieldState,
                      cfg: MeshFieldConfig, target_vnum: int,
                      *, chunk: int = 65536):
    """Advance the vertex-feature mesh to >= target_vnum vertices.

    The new level subdivides the CURRENT feature mesh (midpoint 1->4),
    so the reference's barycentric feature resample at the new vertices
    (tools/map.py:810-841 projects each new vertex and interpolates the
    old mesh) reduces to exact edge-midpoint feature averaging -- same
    values, no ray casts.  Returns (features, ema_features, new_state,
    n_vertices); the caller swaps them into params and bumps
    cfg.n_feature_vertices (a static shape -> one recompile per level).
    """
    from ..geometry.mesh import Mesh
    from ..geometry.shape_tools import subdivide_to

    old_fea = state.projector_fea
    old_mesh = Mesh(np.asarray(old_fea.vertices),
                    np.asarray(old_fea.faces))
    fea_mesh = subdivide_to(old_mesh, target_vnum)
    new_proj = MeshProjector(fea_mesh, store_uv=False)
    V = int(fea_mesh.vertices.shape[0])
    V_old = int(old_mesh.vertices.shape[0])

    # midpoint subdivision (shape_tools.subdivide) keeps the old
    # vertices as a prefix and appends edge midpoints, so the
    # barycentric resample of the reference (tools/map.py:829-838)
    # reduces to exact edge-midpoint averaging -- no ray cast needed.
    # Walk the subdivision levels reproducing each level's edge order.
    def lift(feats):
        out = np.asarray(feats)
        mesh = old_mesh
        while out.shape[0] < V:
            mid: dict[tuple[int, int], int] = {}
            rows = [out]
            for f in np.asarray(mesh.faces):
                a, b, c = int(f[0]), int(f[1]), int(f[2])
                for u, v_ in ((a, b), (b, c), (c, a)):
                    key = (min(u, v_), max(u, v_))
                    if key not in mid:
                        mid[key] = out.shape[0] + len(mid)
                        rows.append(0.5 * (out[u] + out[v_]))
            out = np.vstack(rows) if len(rows) > 1 else out
            mesh = subdivide_to(mesh, out.shape[0])
        return jnp.asarray(out)

    features = lift(params["features_v"])
    ema_features = lift(ema_params["features_v"])
    new_state = state._replace(projector_fea=new_proj.arrays)
    return features, ema_features, new_state, V


def init(key, cfg: MeshFieldConfig) -> dict[str, Any]:
    k_enc, k_var, k_norm, k_clus = jax.random.split(key, 4)
    if cfg.encoder_type == "vertex":
        if cfg.n_feature_vertices <= 0:
            raise ValueError("encoder_type='vertex' needs "
                             "n_feature_vertices (the feature-mesh vertex "
                             "count) set in MeshFieldConfig")
        # uniform(-1, 1) like the reference level-0 init (tools/map.py:827)
        params: dict[str, Any] = {"features_v": jax.random.uniform(
            k_enc, (cfg.n_feature_vertices, cfg.feature_dim),
            minval=-1.0, maxval=1.0)}
        if cfg.clustering:
            # ClusteringLayer(n_clusters=16, hidden=feature_dim)
            # (tools/map.py:586)
            params["clusters"] = clus.init_cluster_centers(
                k_clus, 1, 16, cfg.feature_dim)
    else:
        if cfg.prob_model:
            # DUAL table: feature mean + log-variance co-stored per brick
            # row (reference's separate encoder_var hash grid,
            # tools/map.py:565-566, merged into the lanes the feature
            # gather already fetches -- the variance encode and its
            # backward scatter cost nothing extra)
            params = {"encoder": cfg.feature_spec.init_dual(
                k_enc, std_a=1e-4, std_b=1e-5, mean_b=cfg.logvar_init)}
        else:
            params = {"encoder": cfg.feature_spec.init(k_enc)}
        if cfg.clustering:
            params["clusters"] = clus.init_cluster_centers(
                k_clus, cfg.num_levels, cfg.n_clusters, cfg.level_dim)
    if cfg.pred_normal:
        params["normal"] = normal_net.init(k_norm, cfg.normal_cfg)
    return params


class FieldOutput(NamedTuple):
    embed: jax.Array          # [N, F + Z]
    normal_coarse: jax.Array  # [N, 3]
    normal_fine: jax.Array    # [N, 3] (coarse copy when pred_normal off)
    h_mask: jax.Array         # [N] bool
    phi_embed: jax.Array | None = None
    theta: jax.Array | None = None
    phi: jax.Array | None = None


def apply(params, state: MeshFieldState, x, cfg: MeshFieldConfig,
          rt: FieldRuntime | None = None, *, mode: str = "none",
          key=None, no_noise: bool = False,
          requires_grad_xyz: bool = False,
          return_phi_embed: bool = False,
          return_rot_angles: bool = False,
          fast_encode: bool = True,
          need_normals: bool = True, frames=None) -> FieldOutput:
    """Evaluate the field at x [N, 3] (in [-bound, bound]).

    mode: 'none' | 'field' | 'patch' | 'shape' | 'unhash' (static; the
    reference's ``imported_type``, tools/map.py:620-718).

    frames: optional per-sample anchor frames (dict p0/normal/tbn/hit,
    already gathered to sample granularity) enabling the per-ray
    projection fast path in mode 'none'.
    """
    if rt is None:
        rt = FieldRuntime.default()
    ncfg = cfg.normal_cfg
    imp = state.imported
    phi_embed = None
    theta = phi_angle = None
    local_tbn = sample_tbn_inv = new_tbn = None
    normal_fine_local = None

    if mode == "none":
        if frames is not None:
            # per-ray projection fast path: the surface near this ray is
            # approximated by the tangent plane of its anchor frame
            # (geometry.projector.ray_anchor_frames).  h and p_sur are
            # closed-form and differentiable in x, with gradients that
            # decompose exactly like the reference projection VJP
            # (tools/map.py:171-186): d h/dx = n, d p_sur/dx tangential.
            n = jax.lax.stop_gradient(frames["normal"])
            p0 = jax.lax.stop_gradient(frames["p0"])
            h = jnp.sum((x - p0) * n, axis=-1, keepdims=True)
            p_sur = x - h * n
            sdf = h
            h_mask = (jnp.abs(h[..., 0]) < cfg.h_threshold) \
                & frames["hit"]
            normal_coarse = n
            local_tbn = frames["tbn"]
        else:
            p_sur, sdf, h_mask, normal_coarse, local_tbn = proj.project(
                state.projector, x, k=cfg.k, h_threshold=cfg.h_threshold,
                requires_grad_xyz=requires_grad_xyz)
        if cfg.encoder_type == "vertex":
            if frames is not None:
                raise ValueError("per_ray_projection is incompatible with "
                                 "encoder_type='vertex' (barycentric "
                                 "feature lookup is per sample)")
            # barycentric vertex-feature interpolation on the subdivided
            # feature mesh, tanh + frequency encode (tools/map.py:634-637).
            # stop_gradient on the cast direction: x-gradients arrive via
            # diff_project inside, not through the DDA while_loop
            vertex_idx, bary, sdf, h_mask, _ = proj.barycentric_mapping(
                state.projector_fea, x,
                jax.lax.stop_gradient(normal_coarse),
                h_threshold=cfg.h_threshold,
                requires_grad_xyz=requires_grad_xyz)
            feats = jnp.sum(params["features_v"][vertex_idx]
                            * bary[..., None], axis=-2)
            x_embed = freq_encode(jnp.tanh(feats), cfg.vertex_multires)
        amp = (cfg.infer_table_bf16 if no_noise
               else cfg.train_table_bf16)
        if cfg.encoder_type == "vertex":
            pass  # x_embed already set from the vertex branch above
        elif cfg.prob_model and not no_noise:
            # feature mean + log-variance from ONE gather of the dual
            # table (reference: two hash grids + reparameterized noise,
            # tools/map.py:564-566,629-632)
            x_embed, log_var = packed_encode_bound_dual(
                p_sur, params["encoder"], cfg.feature_spec,
                bound=cfg.bound, fast=fast_encode, amp=amp)
            noise = jax.random.normal(key, log_var.shape)
            # clamp the exponent: untied log-var lanes can drift high in
            # fp32 long before the loss pulls them back, and exp overflow
            # NaNs the whole frame (seen as -254 dB pool renders on TPU,
            # round 4); +2 is far above any useful noise scale
            x_embed = x_embed + noise * jnp.exp(
                jnp.clip(log_var, -20.0, 2.0))
        else:
            x_embed = packed_encode_bound(p_sur, params["encoder"],
                                          cfg.feature_spec, bound=cfg.bound,
                                          fast=fast_encode, amp=amp)
        z_embed = freq_encode(sdf, cfg.z_multires)
        if cfg.pred_normal and need_normals:
            phi_embed = normal_net.phi_embedding(params["normal"], p_sur,
                                                 ncfg, amp=amp)
            if return_rot_angles:
                theta, phi_angle = normal_net.apply(
                    params["normal"], z_embed, x_embed, ncfg,
                    phi_embed=phi_embed, return_rot_angles=True)
            normal_fine_local = normal_net.apply(
                params["normal"], z_embed, x_embed, ncfg,
                phi_embed=phi_embed)

    elif mode == "field":
        # synthesized flat canvas on the xy plane (tools/map.py:648-675)
        p_sur = jnp.stack([x[..., 0] / imp.bounds[0],
                           x[..., 1] / imp.bounds[1]], axis=-1)
        sdf = x[..., 2:3] - rt.sdf_offset
        h_mask = (jnp.abs(sdf[..., 0]) < cfg.h_threshold) \
            & jnp.all(jnp.abs(p_sur) <= 1.0, axis=-1)
        x_embed = grid_sample_2d(imp.features_2d, p_sur)
        if cfg.encoder_type == "vertex":
            x_embed = freq_encode(jnp.tanh(x_embed), cfg.vertex_multires)
        z_embed = freq_encode(sdf, cfg.z_multires)
        normal_coarse = jnp.zeros_like(x).at[..., 2].set(1.0)
        if cfg.pred_normal:
            tid = grid_sample_2d(imp.sample_tbn_ids_2d[..., None].astype(
                jnp.float32), p_sur, mode="nearest")[..., 0].astype(
                jnp.int32)
            sample_tbn_inv = imp.sample_tbn_inv[tid]
            local_tbn = grid_sample_2d(imp.local_tbn_2d, p_sur,
                                       mode="nearest").reshape(-1, 3, 3)
            phi_embed = grid_sample_2d(imp.phi_embed_2d, p_sur)
            normal_fine_local = normal_net.apply(
                params["normal"], z_embed, x_embed, ncfg,
                phi_embed=phi_embed)

    elif mode == "patch":
        # scattered patch points, kNN-weighted (tools/map.py:676-692)
        sdf, idx, weights, normal_coarse, dis = proj.weighted_project(
            state.projector_imported, x, k=8, direct_above_check=True,
            direct_above_threshold=1.0)
        x_embed = jnp.sum(weights[..., None] * imp.features_v[idx],
                          axis=-2)
        if cfg.encoder_type == "vertex":
            x_embed = freq_encode(jnp.tanh(x_embed), cfg.vertex_multires)
        z_embed = freq_encode(sdf, cfg.z_multires)
        h_mask = (jnp.abs(sdf[..., 0]) < cfg.h_threshold) \
            & (jnp.min(dis, axis=-1) < cfg.h_threshold)
        if cfg.pred_normal:
            phi_embed = jnp.sum(weights[..., None] * imp.phi_embed_v[idx],
                                axis=-2)
            local_tbn = jnp.sum(
                weights[..., None, None] * imp.local_tbn_v[idx], axis=-3)
            normal_fine_local = normal_net.apply(
                params["normal"], z_embed, x_embed, ncfg,
                phi_embed=phi_embed)

    elif mode == "shape":
        # new target mesh; features from the flat canvas at uvh
        # (tools/map.py:693-707)
        uvh_out, h_mask, normal_coarse, new_tbn = proj.uvh(
            state.projector_imported, x, k=cfg.k_for_uv,
            h_threshold=cfg.h_threshold,
            sdf_scale=1.0, sdf_offset=0.0,
            requires_grad_xyz=requires_grad_xyz)
        # runtime sdf scaling (sdf_scale_factor / uv_utilize_rate)
        sdf = (uvh_out[..., 2:3] / jnp.maximum(
            rt.sdf_scale_factor / rt.uv_utilize_rate, 1e-5)
            - rt.sdf_offset)
        p_sur = uvh_out[..., :2] * rt.uv_utilize_rate
        x_embed = grid_sample_2d(imp.features_2d, p_sur)
        if cfg.encoder_type == "vertex":
            x_embed = freq_encode(jnp.tanh(x_embed), cfg.vertex_multires)
        z_embed = freq_encode(sdf, cfg.z_multires)
        if cfg.pred_normal:
            tid = grid_sample_2d(imp.sample_tbn_ids_2d[..., None].astype(
                jnp.float32), p_sur, mode="nearest")[..., 0].astype(
                jnp.int32)
            sample_tbn_inv = imp.sample_tbn_inv[tid]
            local_tbn = grid_sample_2d(imp.local_tbn_2d, p_sur,
                                       mode="nearest").reshape(-1, 3, 3)
            phi_embed = grid_sample_2d(imp.phi_embed_2d, p_sur)
            normal_fine_local = normal_net.apply(
                params["normal"], z_embed, x_embed, ncfg,
                phi_embed=phi_embed)

    elif mode == "unhash":
        # baked vertex features on a (possibly new) mesh
        # (tools/map.py:708-718)
        normal_coarse, _, _, _ = proj.knn_normal(state.projector, x,
                                                 k=cfg.k)
        vertex_idx, bary, sdf, h_mask, _ = proj.barycentric_mapping(
            state.projector_imported, x, normal_coarse,
            h_threshold=cfg.h_threshold,
            requires_grad_xyz=requires_grad_xyz)
        sdf = sdf / jnp.maximum(rt.sdf_scale_factor, 1e-5) - rt.sdf_offset
        x_embed = jnp.sum(imp.features_v[vertex_idx] * bary[..., None],
                          axis=-2)
        if cfg.encoder_type == "vertex":
            x_embed = freq_encode(jnp.tanh(x_embed), cfg.vertex_multires)
        z_embed = freq_encode(sdf, cfg.z_multires)
        if cfg.pred_normal:
            phi_embed = jnp.sum(
                imp.phi_embed_v[vertex_idx] * bary[..., None], axis=-2)
            normal_fine_local = normal_net.apply(
                params["normal"], z_embed, x_embed, ncfg,
                phi_embed=phi_embed)
    else:
        raise ValueError(f"unknown import mode {mode}")

    embed = jnp.concatenate([x_embed, z_embed], axis=-1)
    normal_coarse = normal_coarse / (jnp.linalg.norm(
        normal_coarse, axis=-1, keepdims=True) + 1e-5)

    # TBN reorientation chain: local -> sample^-1 -> new
    # (tools/map.py:722-730)
    normal_fine = normal_fine_local
    if cfg.pred_normal and normal_fine is not None:
        if local_tbn is not None:
            normal_fine = jnp.einsum("nba,nb->na", local_tbn, normal_fine)
        if sample_tbn_inv is not None:
            normal_fine = jnp.einsum("nba,nb->na", sample_tbn_inv,
                                     normal_fine)
        if new_tbn is not None:
            normal_fine = jnp.einsum("nba,nb->na", new_tbn, normal_fine)
        normal_fine = normal_fine / (jnp.linalg.norm(
            normal_fine, axis=-1, keepdims=True) + 1e-5)
    else:
        normal_fine = normal_coarse

    return FieldOutput(embed=embed, normal_coarse=normal_coarse,
                       normal_fine=normal_fine, h_mask=h_mask,
                       phi_embed=phi_embed if return_phi_embed else None,
                       theta=theta, phi=phi_angle)


# ---------------------------------------------------------------------------
# regularizers (tools/map.py:747-773)
# ---------------------------------------------------------------------------

def clustering_loss(params, cfg: MeshFieldConfig, key=None):
    if not cfg.clustering:
        return 0.0
    if cfg.encoder_type == "vertex":
        # ClusteringLayer over the raw vertex features (tools/map.py:752)
        return clus.clustering_loss_level(params["features_v"],
                                          params["clusters"][0])
    spec = cfg.feature_spec
    slices = [(spec.offsets[i], spec.offsets[i + 1])
              for i in range(cfg.num_levels)]
    # packed rows hold 27 lattice entries of level_dim channels each
    # (possibly lane-padded to spec.storage_width)
    return clus.clustering_loss(params["encoder"], slices,
                                params["clusters"], key=key,
                                level_dim=cfg.level_dim,
                                row_width=spec.row_width)


def kl_loss(params, cfg: MeshFieldConfig, normal: bool = False):
    """VAE prior on the probabilistic features (tools/map.py:757-767)."""
    if not cfg.prob_model or cfg.encoder_type == "vertex":
        return 0.0
    # dual table: lanes [0, rw) hold the feature means, [rw, 2rw) the
    # log-variances; anything beyond 2rw is tile padding (never read by
    # the encode, must not contribute KL)
    rw = cfg.feature_spec.row_width
    f_var = params["encoder"][:, rw:2 * rw]
    if normal:
        f_mu = params["encoder"][:, :rw]
        return 0.5 * jnp.sum(jnp.exp(f_var) + f_mu ** 2 - 1.0 - f_var)
    return 0.5 * jnp.sum(jnp.exp(f_var) - 1.0 - f_var)


def regular_loss(params, cfg: MeshFieldConfig, key=None):
    # 1e-8 * clustering (glossy-surface setting, tools/map.py:769-773)
    return 1e-8 * clustering_loss(params, cfg, key)


# ---------------------------------------------------------------------------
# import constructors (host-side; build ImportedData from npz dicts)
# ---------------------------------------------------------------------------

def import_field_data(features, sample_tbn, sample_tbn_ids, local_tbn,
                      phi_embed, bounds) -> ImportedData:
    """Flat synthesized canvas (tools/map.py:912-927).

    features/phi_embed/local_tbn: [H, W, C] numpy; sample_tbn [S, 9];
    sample_tbn_ids [H, W]; bounds [2] world half-extents of the canvas.
    """
    base = ImportedData.empty()
    inv = np.linalg.inv(np.asarray(sample_tbn).reshape(-1, 3, 3))
    return base._replace(
        features_2d=jnp.asarray(features, jnp.float32),
        phi_embed_2d=jnp.asarray(phi_embed, jnp.float32),
        local_tbn_2d=jnp.asarray(
            np.asarray(local_tbn).reshape(*local_tbn.shape[:2], 9),
            jnp.float32),
        sample_tbn_ids_2d=jnp.asarray(sample_tbn_ids, jnp.int32),
        sample_tbn_inv=jnp.asarray(inv, jnp.float32),
        bounds=jnp.asarray(bounds, jnp.float32))


def import_patch_data(features, local_tbn, phi_embed) -> ImportedData:
    """Scattered patch points (tools/map.py:929-937)."""
    base = ImportedData.empty()
    return base._replace(
        features_v=jnp.asarray(features, jnp.float32),
        phi_embed_v=jnp.asarray(phi_embed, jnp.float32),
        local_tbn_v=jnp.asarray(
            np.asarray(local_tbn).reshape(-1, 3, 3), jnp.float32))


def import_unhash_data(features, phi_embed=None) -> ImportedData:
    base = ImportedData.empty()
    return base._replace(
        features_v=jnp.asarray(features, jnp.float32),
        phi_embed_v=jnp.asarray(
            phi_embed if phi_embed is not None
            else np.zeros((len(features), 1)), jnp.float32))
