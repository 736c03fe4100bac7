"""Trainer for the NeRF-Texture curved-field model.

Rebuild of the reference ``Trainer`` specialization used by ``main.py``
(nerf/utils.py:379-1603): rgb + regularizer + cosine normal loss +
per-frame gamma prior (:634-667), teacher distillation from the coarse
NGP (:572-598, prob 0.75, sigma-remap MSE), per-pixel random background,
error-map EMA updates (:622-632), trainable camera deltas
(collate_trainable_camera, nerf/provider.py:375-410), and density-grid
refresh cadence.

One jitted step; the host loop only picks frames.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.rays import get_rays, sample_ray_indices
from ..geometry import projector as proj
from ..models import curved_field, ngp
from ..models.curved_field import CurvedFieldConfig
from ..models import mesh_field, normal_net
from ..models.mesh_field import FieldRuntime, MeshFieldState
from ..ops import occupancy as occ_mod
from ..ops.hashgrid_packed import packed_encode_bound
from ..render.renderer import RenderConfig, render_image, render_rays
from ..utils.metrics import psnr
from ..utils.transforms import axis_angle_to_matrix
from .trainer import TrainConfig, make_optimizer


@dataclasses.dataclass(frozen=True)
class CurvedTrainConfig(TrainConfig):
    lr: float = 1e-2
    total_steps: int = 40000
    normal_cosine_threshold: float = math.cos(math.pi / 8)
    normal_coarse_weight: float = 1e-4
    distillation: bool = False
    distillation_prob: float = 0.75
    optimize_camera: bool = False
    # None = the reference's schedule (1e4 before step 2000, 1e2 after,
    # network_curvedfield.py:219-228); a float overrides it
    camera_reg_weight: float | None = None
    optimize_gamma: bool = False
    error_map: bool = False
    # steps fused into one scanned device program (see train());
    # removes host-side per-step work.  1 disables fusion.
    scan_steps: int = 8
    # progressive vertex-feature levels: advance one level every
    # iters_per_level steps (the reference's num_iterations_per_stage,
    # nerf/utils.py:1014-1015).  0 disables the schedule.
    iters_per_level: int = 0


class CurvedTrainState(NamedTuple):
    params: Any                 # model params (+ optional camera/gamma)
    opt_state: Any
    ema_params: Any
    occ: occ_mod.OccupancyGrid
    step: jax.Array
    error_map: jax.Array        # [B, 128*128]


@partial(jax.jit, static_argnames=("ccfg", "rcfg", "tcfg", "n_frames"))
def init_state(key, ccfg: CurvedFieldConfig, rcfg: RenderConfig,
               tcfg: CurvedTrainConfig, n_frames: int) -> CurvedTrainState:
    """Whole initial state as ONE compiled program (eager init dispatched
    ~30 one-off param/optimizer/grid constructors on a cold start)."""
    params = curved_field.init(key, ccfg)
    if tcfg.optimize_camera:
        params["camera"] = {
            "dRs": jnp.zeros((n_frames, 3)),
            "dts": jnp.zeros((n_frames, 3)),
            "dfs": jnp.zeros((n_frames, 2)),
        }
    if tcfg.optimize_gamma:
        params["gammas"] = 2.4 * jnp.ones((n_frames,))
    occ = occ_mod.create(rcfg.grid_size, rcfg.cascades)
    return CurvedTrainState(
        params=params, opt_state=make_optimizer(tcfg).init(params),
        ema_params=params, occ=occ, step=jnp.zeros((), jnp.int32),
        error_map=jnp.ones((n_frames, 128 * 128)))


def _safe_norm(x):
    # eps inside the sqrt: the deltas start at exactly zero and the grad
    # of ||x|| at 0 is NaN
    return jnp.sqrt(jnp.sum(x * x, axis=-1) + 1e-12)


def _use_frames(ccfg: CurvedFieldConfig, mode: str) -> bool:
    """Per-ray projection applies only to the hash encoder in mode
    'none' (the vertex encoder needs per-sample barycentric lookups)."""
    return (ccfg.field.per_ray_projection and mode == "none"
            and ccfg.field.encoder_type == "hash")


def _ray_frames(field_state: MeshFieldState, x_seed, seed_valid,
                ccfg: CurvedFieldConfig):
    """Per-ray anchor frames from each ray's first marched sample
    (mode 'none'); kNN-only, no ray cast."""
    return proj.seed_anchor_frames(
        field_state.projector, x_seed, seed_valid, k=ccfg.field.k,
        max_dist=4.0 * ccfg.field.h_threshold)


def camera_regularization(cam):
    """dfs/dRs norms + 1e-4 dts (nerf/renderer.py:131-133)."""
    return (jnp.mean(_safe_norm(cam["dfs"]))
            + jnp.mean(_safe_norm(cam["dRs"]))
            + 1e-4 * jnp.mean(_safe_norm(cam["dts"])))


def _apply_camera_deltas(pose, intrinsics, cam, frame_idx):
    """Perturb one pose/intrinsics with the trainable deltas
    (provider.py:379-396)."""
    dR = axis_angle_to_matrix(cam["dRs"][frame_idx])
    R = dR @ pose[:3, :3]
    t = pose[:3, 3] + cam["dts"][frame_idx]
    new_pose = jnp.eye(4).at[:3, :3].set(R).at[:3, 3].set(t)
    K = intrinsics.at[:2].add(cam["dfs"][frame_idx])
    return new_pose, K


def _curved_train_step_body(state: CurvedTrainState,
                            field_state: MeshFieldState,
                            poses, images, intrinsics, frame_idx, key, *,
                            ccfg: CurvedFieldConfig, rcfg: RenderConfig,
                            tcfg: CurvedTrainConfig, H: int, W: int,
                            mode: str = "none", rt=None, mesh=None,
                            anchor_tab=None):
    """One train step.  With `mesh` (a ('data', 'model') jax Mesh) the
    sampled ray batch is constrained to the mesh's data axis and GSPMD
    shards the whole step (march, projection, field, composite) per-ray,
    inserting the gradient all-reduce -- the flagship-model analogue of
    the reference's DDP wrap (nerf/utils.py:439-441, SURVEY.md 2.3).

    With `anchor_tab` (build_anchor_table output) and
    rcfg.anchor_per_sample, anchoring runs at SAMPLE granularity through
    the static table -- the chart p_sur(x) is deterministic in x, so
    fine-resolution features see the same surface coordinates every
    step and every view (see RenderConfig.anchor_per_sample)."""
    pose = poses[frame_idx]
    image = images[frame_idx]
    k_pix, k_perturb, k_bg, k_noise, k_reg = jax.random.split(key, 5)

    emap = state.error_map[frame_idx] if tcfg.error_map else None
    inds, inds_coarse = sample_ray_indices(k_pix, H, W, tcfg.num_rays,
                                           error_map=emap)
    if mesh is not None:
        from ..parallel.sharding import data_sharded
        inds = jax.lax.with_sharding_constraint(inds, data_sharded(mesh))

    def build_rays(params):
        if tcfg.optimize_camera:
            p, K = _apply_camera_deltas(pose, intrinsics,
                                        params["camera"], frame_idx)
        else:
            p, K = pose, intrinsics
        return get_rays(p, K, H, W, inds)

    pixels = image.reshape(H * W, -1)[inds].astype(jnp.float32) / 255.0
    bg = jax.random.uniform(k_bg, (tcfg.num_rays, 3))  # per-pixel random
    if pixels.shape[-1] == 4:
        gt_rgb = pixels[:, :3] * pixels[:, 3:] + bg * (1 - pixels[:, 3:])
    else:
        gt_rgb = pixels[:, :3]

    use_frames = _use_frames(ccfg, mode)

    def loss_fn(params):
        rays = build_rays(params)
        g = params["gammas"][frame_idx] if tcfg.optimize_gamma else None

        rcfg_eff = rcfg
        if use_frames:
            if anchor_tab is not None and rcfg.anchor_per_sample:
                # per-SAMPLE anchors through the static table: one
                # width-16 gather per sample, deterministic chart
                anchor = lambda o, d, xs, sv: proj.anchor_frames_from_table(
                    anchor_tab, xs, sv, ccfg.bound)
            else:
                # per-ray fallback: one kNN anchor per RAY at its first
                # marched sample; all its samples share the tangent
                # plane (seed_anchor_frames stop-gradients the seed)
                anchor = lambda o, d, xs, sv: _ray_frames(
                    field_state, xs, sv, ccfg)
                rcfg_eff = dataclasses.replace(rcfg,
                                               anchor_per_sample=False)

            def field(x, d, f):
                return curved_field.forward(
                    params, field_state, x, d, ccfg, rt, mode=mode,
                    key=k_noise, training=True, gamma=g, frames=f)
        else:
            anchor = None

            def field(x, d):
                return curved_field.forward(
                    params, field_state, x, d, ccfg, rt, mode=mode,
                    key=k_noise, training=True, gamma=g)

        out = render_rays(field, state.occ.occ, rays["rays_o"],
                          rays["rays_d"], rcfg_eff,
                          max_samples=rcfg.max_samples_train,
                          key=k_perturb, perturb=True, bg_color=bg,
                          anchor_fn=anchor)
        rgb_loss_per_ray = jnp.mean((out["image"] - gt_rgb) ** 2, axis=-1)
        loss = jnp.mean(rgb_loss_per_ray)

        # composited-normal cosine loss (nerf/utils.py:646-665).
        # normalization keeps eps INSIDE the sqrt: grad of ||x|| at the
        # all-zero normals of empty rays would be NaN otherwise
        if "normal" in out and "normal_grad" in out:
            n_est = out["normal"]
            n_grad = jax.lax.stop_gradient(out["normal_grad"])
            finite = (jnp.all(jnp.isfinite(n_grad), axis=-1)
                      & (jnp.sum(n_grad * n_grad, -1) > 1e-8))
            n_est_n = n_est * jax.lax.rsqrt(
                jnp.sum(n_est * n_est, -1, keepdims=True) + 1e-10)
            n_grad_n = n_grad * jax.lax.rsqrt(
                jnp.sum(n_grad * n_grad, -1, keepdims=True) + 1e-10)
            cos = jnp.sum(n_grad_n * n_est_n, axis=-1)
            thr = (tcfg.normal_cosine_threshold
                   if not ccfg.no_visibility else 1.0)
            err = -jnp.minimum(cos, thr)
            loss = loss + jnp.sum(jnp.where(finite, err, 0.0)) \
                / jnp.maximum(jnp.sum(finite), 1)

        # regularizers (network_curvedfield.py:219-228)
        cam_loss = (camera_regularization(params["camera"])
                    if tcfg.optimize_camera else None)
        loss = loss + curved_field.regular_loss(
            params, ccfg, state.step, optimize_camera_loss=cam_loss,
            key=k_reg, camera_reg_weight=tcfg.camera_reg_weight)
        if tcfg.optimize_gamma:
            loss = loss + 5.0 * (params["gammas"][frame_idx] - 2.4) ** 2
        return loss, rgb_loss_per_ray

    (loss, per_ray), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params)
    optimizer = make_optimizer(tcfg)
    updates, opt_state = optimizer.update(grads, state.opt_state,
                                          state.params)
    params = optax.apply_updates(state.params, updates)
    ema = jax.tree.map(
        lambda e, p: e * tcfg.ema_decay + p * (1.0 - tcfg.ema_decay),
        state.ema_params, params)

    error_map = state.error_map
    if tcfg.error_map and inds_coarse is not None:
        old = error_map[frame_idx, inds_coarse]
        error_map = error_map.at[frame_idx, inds_coarse].set(
            0.1 * old + 0.9 * jax.lax.stop_gradient(per_ray))

    return CurvedTrainState(params=params, opt_state=opt_state,
                            ema_params=ema, occ=state.occ,
                            step=state.step + 1,
                            error_map=error_map), {"loss": loss}


curved_train_step = partial(
    jax.jit, static_argnames=("ccfg", "rcfg", "tcfg", "H", "W",
                              "mode", "mesh"))(_curved_train_step_body)


@partial(jax.jit, static_argnames=("ccfg", "rcfg", "tcfg", "H", "W",
                                   "mode", "mesh"))
def curved_train_scan(state: CurvedTrainState, field_state: MeshFieldState,
                      poses, images, intrinsics, frame_idxs, keys, *,
                      ccfg: CurvedFieldConfig, rcfg: RenderConfig,
                      tcfg: CurvedTrainConfig, H: int, W: int,
                      mode: str = "none", rt=None, mesh=None,
                      anchor_tab=None):
    """K train steps fused into ONE device program (lax.scan over the
    step axis): removes all host-side per-step work (frame pick, key
    split, dispatch) from the training loop.  Measured neutral on the
    tunneled v5e backend (the per-step floor is device-side, not
    dispatch) but strictly less host traffic; disable with
    tcfg.scan_steps = 1.

    frame_idxs/keys: [K] frame indices and ONE PRNG key (split into the
    per-step keys inside the program -- the eager split + stack was 4
    host dispatches per scan launch)."""

    def body(st, xs):
        fi, k = xs
        st, m = _curved_train_step_body(
            st, field_state, poses, images, intrinsics, fi, k,
            ccfg=ccfg, rcfg=rcfg, tcfg=tcfg, H=H, W=W, mode=mode, rt=rt,
            mesh=mesh, anchor_tab=anchor_tab)
        return st, m["loss"]

    ks = jax.random.split(keys, frame_idxs.shape[0])
    state, losses = jax.lax.scan(body, state, (frame_idxs, ks))
    return state, {"loss": losses[-1], "loss_mean": jnp.mean(losses)}


@partial(jax.jit, static_argnames=("ccfg", "rcfg", "tcfg", "ncfg", "mode"))
def distill_step(state: CurvedTrainState, field_state: MeshFieldState,
                 teacher_params, poses, images, intrinsics, frame_idx,
                 key, *, ccfg: CurvedFieldConfig, ncfg: ngp.NGPConfig,
                 rcfg: RenderConfig, tcfg: CurvedTrainConfig,
                 mode: str = "none"):
    """Distillation step: match the coarse NGP teacher's (remapped) sigma
    and color at marched sample points (nerf/utils.py:590-598)."""
    from ..ops import march_rays, near_far_from_aabb, sample_points
    from ..render.compact import flat_points, flatten_samples

    H, W = images.shape[1], images.shape[2]
    k_pix, k_perturb, k_noise = jax.random.split(key, 3)
    inds, _ = sample_ray_indices(k_pix, H, W, tcfg.num_rays)
    rays = get_rays(poses[frame_idx], intrinsics, H, W, inds)
    aabb = jnp.asarray([-rcfg.bound] * 3 + [rcfg.bound] * 3)
    nears, fars = near_far_from_aabb(rays["rays_o"], rays["rays_d"], aabb,
                                     rcfg.min_near)
    m = march_rays(rays["rays_o"], rays["rays_d"], state.occ.occ, nears,
                   fars, bound=rcfg.bound, cascades=rcfg.cascades,
                   grid_size=rcfg.grid_size, max_steps=rcfg.max_steps,
                   max_samples=rcfg.max_samples_train, dt_gamma=rcfg.dt_gamma,
                   perturb=True, key=k_perturb)
    flat = flatten_samples(m, tcfg.num_rays * 32)
    xyzs, dirs = flat_points(rays["rays_o"], rays["rays_d"], flat,
                             rcfg.bound)
    sig_t, rgb_t = ngp.forward(teacher_params, xyzs, dirs, ncfg)
    sig_t, rgb_t = (jax.lax.stop_gradient(sig_t),
                    jax.lax.stop_gradient(rgb_t))
    if _use_frames(ccfg, mode):
        x_seed = jnp.clip(rays["rays_o"] + m.ts[:, :1] * rays["rays_d"],
                          -rcfg.bound, rcfg.bound)
        rframes = _ray_frames(field_state, x_seed, m.counts > 0, ccfg)
        rid = jnp.clip(flat.ray_id, 0, tcfg.num_rays - 1)
        frames = jax.tree.map(lambda a: a[rid], rframes)
    else:
        frames = None

    def loss_fn(params):
        sigma, color, _ = curved_field.forward(
            params, field_state, xyzs, dirs, ccfg, mode=mode, key=k_noise,
            training=True, frames=frames)
        remap = 1.0 - jnp.exp(-sigma)      # lambda = 1 (utils.py:595-596)
        remap_t = 1.0 - jnp.exp(-sig_t)
        valid = flat.valid
        n = jnp.maximum(jnp.sum(valid), 1)
        return (jnp.sum(jnp.where(valid[:, None], (color - rgb_t) ** 2,
                                  0.0)) / (3 * n)
                + jnp.sum(jnp.where(valid, (remap - remap_t) ** 2, 0.0))
                / n)

    loss, grads = jax.value_and_grad(loss_fn)(state.params)
    optimizer = make_optimizer(tcfg)
    updates, opt_state = optimizer.update(grads, state.opt_state,
                                          state.params)
    params = optax.apply_updates(state.params, updates)
    ema = jax.tree.map(
        lambda e, p: e * tcfg.ema_decay + p * (1.0 - tcfg.ema_decay),
        state.ema_params, params)
    return state._replace(params=params, opt_state=opt_state,
                          ema_params=ema,
                          step=state.step + 1), {"loss": loss}


@partial(jax.jit, static_argnames=("ccfg", "rcfg", "mode", "cas"))
def _curved_cell_sigma(params, field_state, rt, cell_ids, key, *,
                       ccfg: CurvedFieldConfig, rcfg: RenderConfig,
                       mode: str, cas: int):
    pts = occ_mod.cell_points(cell_ids, key, grid_size=rcfg.grid_size,
                              cas=cas, bound=rcfg.bound)
    sigma, _ = curved_field.density(params, field_state, pts, ccfg, rt,
                                    mode=mode)
    return sigma * rcfg.density_scale


@partial(jax.jit, static_argnames=("ccfg", "rcfg", "mode", "cas"))
def _curved_cell_sigma_anchored(params, field_state, rt, anchor_tab,
                                cell_ids, key, *,
                                ccfg: CurvedFieldConfig, rcfg: RenderConfig,
                                mode: str, cas: int):
    """Grid-refresh density through the cached per-cell anchor table:
    ONE width-16 gather replaces the per-point projection chain (kNN +
    plane fit), the dominant cost of the sparse refresh (~20 s at 395K
    cells measured round 1, vs the same tangent-plane approximation the
    per-ray render path already uses)."""
    pts = occ_mod.cell_points(cell_ids, key, grid_size=rcfg.grid_size,
                              cas=cas, bound=rcfg.bound)
    frames = proj.anchor_frames_from_table(
        anchor_tab, pts, jnp.ones(pts.shape[:1], bool), ccfg.bound)
    sigma, _ = curved_field.density(params, field_state, pts, ccfg, rt,
                                    mode=mode, frames=frames)
    return sigma * rcfg.density_scale


def curved_grid_step(state: CurvedTrainState, field_state: MeshFieldState,
                     key, *, ccfg: CurvedFieldConfig, rcfg: RenderConfig,
                     full: bool = True, mode: str = "none", rt=None,
                     near_cells: np.ndarray | None = None,
                     anchor_tab=None) -> CurvedTrainState:
    """Density-grid refresh via host-chunked sparse dispatch.

    The curved field is a thin shell (|h| < h_threshold) around its
    template, so only the precomputed near-surface cells (`near_cells`,
    from MeshProjector.near_cell_indices / trainer cache) are evaluated --
    typically 5-15% of the grid.  The per-point projection chain is too
    heavy for a device-side lax.map (it hung the TPU runtime), hence the
    host loop over jitted chunk programs (occupancy.update_host_sparse).

    With `anchor_tab` (build_anchor_table output; mode 'none' + hash
    encoder only) each refresh point anchors through the cached per-cell
    frame instead of running the projection chain.
    """
    if near_cells is None:
        arr = (field_state.projector_imported
               if mode in ("shape", "unhash", "patch")
               else field_state.projector)
        near_cells = compute_near_cells(
            np.asarray(arr.vertices), rcfg.grid_size, rcfg.bound,
            ccfg.field.h_threshold)

    if anchor_tab is not None and mode == "none" \
            and ccfg.field.encoder_type == "hash":
        def chunk_fn(ids, k, cas):
            return _curved_cell_sigma_anchored(
                state.params, field_state, rt, anchor_tab, ids, k,
                ccfg=ccfg, rcfg=rcfg, mode=mode, cas=cas)
        # cheap per-point chain: fewer, bigger dispatches win (331 ms vs
        # 499 ms at 398K cells measured on v5e)
        chunk = 262144
    else:
        def chunk_fn(ids, k, cas):
            return _curved_cell_sigma(state.params, field_state, rt, ids,
                                      k, ccfg=ccfg, rcfg=rcfg, mode=mode,
                                      cas=cas)
        chunk = 65536

    occ = occ_mod.update_host_sparse(
        state.occ, chunk_fn, key, near_cells,
        grid_size=rcfg.grid_size, cascades=rcfg.cascades,
        density_thresh=rcfg.density_thresh, chunk=chunk)
    return state._replace(occ=occ)


def compute_near_cells(vertices: np.ndarray, grid_size: int, bound: float,
                       h_threshold: float) -> np.ndarray:
    """Host cKDTree pass marking grid cells within the shell margin."""
    from scipy.spatial import cKDTree

    H = grid_size
    centers = (np.arange(H) + 0.5) / H * 2.0 - 1.0
    half = bound / H
    centers = centers * (bound - half) / (1.0 - 1.0 / H)
    xx, yy, zz = np.meshgrid(centers, centers, centers, indexing="ij")
    pts = np.stack([xx.ravel(), yy.ravel(), zz.ravel()], -1)
    d, _ = cKDTree(vertices).query(pts)
    cell_diag = 2 * bound / H * np.sqrt(3)
    return np.where(d < 2 * h_threshold + cell_diag)[0].astype(np.int32)


def curved_field_apply(bundle, x, d, static, frames=None):
    """Module-level field fn for jitted full-frame rendering.

    bundle = {'params', 'field_state', 'rt'} (traced pytrees); static =
    (ccfg, mode, visual_mode, light_visual_mode) (hashable)."""
    ccfg, mode, visual_mode, light_visual_mode = static
    sigma, color, _ = curved_field.forward(
        bundle["params"], bundle["field_state"], x, d, ccfg,
        bundle["rt"], mode=mode, training=False, visual_mode=visual_mode,
        light_visual_mode=light_visual_mode, frames=frames,
        light_import=bundle.get("light_import"),
        euler_rot=bundle.get("euler_rot"))
    return sigma, color


def curved_anchor_apply(bundle, rays_o, rays_d, x_seed, seed_valid,
                        static):
    """Module-level anchor fn paired with curved_field_apply (same
    signature convention so render_image can pass it as a static arg).

    With bundle['anchor_tab'] set (a build_anchor_table output), the
    per-ray kNN + plane fit collapses to one width-16 gather."""
    ccfg = static[0]
    tab = bundle.get("anchor_tab")
    if tab is not None:
        from ..geometry.projector import anchor_frames_from_table

        return anchor_frames_from_table(tab, x_seed, seed_valid,
                                        ccfg.bound)
    return _ray_frames(bundle["field_state"], x_seed, seed_valid, ccfg)


def curved_field_apply_baked(bundle, x, d, static, frames=None):
    """Field fn rendering through a baked feature atlas (render/baked.py):
    ONE corner-packed texture row replaces the hash-pyramid + phi-grid
    gathers per sample.  Inference, mode 'none', RGB only."""
    ccfg, _, _, light_visual_mode = static
    return curved_field.forward_baked(
        bundle["params"], bundle["bake"], x, d, ccfg, bundle["rt"],
        frames, light_visual_mode=light_visual_mode,
        light_import=bundle.get("light_import"),
        euler_rot=bundle.get("euler_rot"))


def curved_field_apply_baked_s1(bundle, x, static, frames=None):
    """Deferred baked stage 1 (per sample): sigma + flat shading feature
    row (curved_field.forward_baked_s1)."""
    ccfg = static[0]
    return curved_field.forward_baked_s1(bundle["params"], bundle["bake"],
                                         x, ccfg, frames)


def curved_field_apply_baked_s2(bundle, fbar, d, static):
    """Deferred baked stage 2 (per ray): shade the composited feature
    row (curved_field.forward_baked_s2)."""
    ccfg, _, _, light_visual_mode = static
    return curved_field.forward_baked_s2(
        bundle["params"], fbar, d, ccfg, bundle["rt"],
        light_visual_mode=light_visual_mode,
        light_import=bundle.get("light_import"),
        euler_rot=bundle.get("euler_rot"))


def curved_anchor_apply_baked(bundle, rays_o, rays_d, x_seed, seed_valid,
                              static):
    """Anchor fn for baked rendering: one width-24 gather yields the
    chart frame AND the tile addressing (render/baked.py ext table)."""
    from ..render import baked as baked_mod
    return baked_mod.anchor_frames_ext(bundle["bake"],
                                       bundle["anchor_ext"], x_seed,
                                       seed_valid)


@partial(jax.jit, static_argnames=("fcfg",))
def _bake_encode_chunk(enc, nparams, pts, fcfg):
    """One bake chunk: feature pyramid + phi embedding at world points."""
    x_embed = packed_encode_bound(pts, enc, fcfg.feature_spec,
                                  bound=fcfg.bound, amp=False)
    if not fcfg.pred_normal:
        return x_embed
    phi = normal_net.phi_embedding(nparams, pts, fcfg.normal_cfg,
                                   amp=False)
    return jnp.concatenate([x_embed, phi], axis=-1)


def curved_sigma_apply(bundle, x, d, static, frames=None):
    """Sigma pass for two-phase terminated rendering: skips the normal
    net and the light model entirely (mesh_field need_normals=False) and
    caches (embed, geo) so shading reuses them on the survivor pool."""
    ccfg, mode = static[0], static[1]
    return curved_field.sigma_with_aux(
        bundle["params"], bundle["field_state"], x, d, ccfg, bundle["rt"],
        mode=mode, frames=frames)


def curved_color_apply(bundle, x, d, aux, static, frames=None):
    """Shading over the survivor pool from cached aux (per-ray-frames
    fast path; every visual mode except Grad)."""
    ccfg, _, visual_mode, light_visual_mode = static
    return curved_field.color_from_aux(
        bundle["params"], bundle["field_state"], x, d, aux, ccfg,
        bundle["rt"], frames, visual_mode=visual_mode,
        light_visual_mode=light_visual_mode,
        light_import=bundle.get("light_import"),
        euler_rot=bundle.get("euler_rot"))


class CurvedTrainer:
    """Host orchestration for NeRF-Texture training (main.py parity)."""

    def __init__(self, dataset, field_state: MeshFieldState,
                 ccfg: CurvedFieldConfig, rcfg: RenderConfig,
                 tcfg: CurvedTrainConfig, key=None, teacher=None,
                 workspace: str | None = None):
        self.dataset = dataset
        self.workspace = workspace
        self.logger = None
        if workspace is not None:
            from ..utils.misc import MetricsLogger
            self.logger = MetricsLogger(workspace, "curved")
        self.field_state = field_state
        self.ccfg, self.rcfg, self.tcfg = ccfg, rcfg, tcfg
        key = key if key is not None else jax.random.PRNGKey(0)
        k_init, self.key = jax.random.split(key)
        self.state = init_state(k_init, ccfg, rcfg, tcfg,
                                dataset.num_frames)
        self.poses = jnp.asarray(dataset.poses)
        self.images = jnp.asarray(dataset.images)
        self.intrinsics = jnp.asarray(dataset.intrinsics)
        self.H, self.W = dataset.H, dataset.W
        self.mode = "none"
        self._near_cells = None     # cached per (mode, mesh)
        self.runtime = FieldRuntime.default()
        self.visual_mode = "RGB"
        self.light_visual_mode = "Full"
        self._rng = np.random.default_rng(0)
        self.teacher = teacher  # (ngp_params, ngp_cfg) or None
        self.fea_level = 0      # current progressive vertex level
        # per-cell anchor cache: frames depend only on the template mesh
        self.anchor_cache = True
        # collapse anchor columns to their surface cell (one chart per
        # surface patch through the whole shell; see build_anchor_table)
        self.anchor_collapse = True
        self._anchor_tab = None
        # imported environment light (load_envmap); device-array dict
        # threaded into the render bundle (None = learned environment)
        self.light_import = None
        # light-rotation vector (viewer euler sliders, nerf/gui.py:
        # 560-584).  None = off; once set it stays a traced [3, 3] in
        # the render bundle so slider ticks never recompile.
        self.euler = None
        # host-side template Mesh (set by main.py): region picking and
        # patch export index into ITS face order, not the projector's
        # padded/reordered device arrays
        self.template_mesh = None
        self.picked_faces = None    # viewer pick_region face subset

    def _anchor_table(self):
        """Per-cell anchor frames, built once per template mesh."""
        p = self.field_state.projector
        if (self._anchor_tab is None or self._anchor_tab[0] is not p
                or self._anchor_tab[1] != self.anchor_collapse):
            from ..geometry.projector import build_anchor_table

            fcfg = self.ccfg.field
            cell = 2.0 * self.rcfg.bound / self.rcfg.grid_size
            # same hit gate as _ray_frames, widened by the cell-center
            # offset (the table is sampled at cell centers, rays seed
            # anywhere inside the cell)
            self._anchor_tab = (p, self.anchor_collapse,
                                build_anchor_table(
                p, self.rcfg.grid_size, self.rcfg.bound, k=fcfg.k,
                max_dist=4.0 * fcfg.h_threshold + 2.0 * cell,
                collapse_columns=self.anchor_collapse))
        return self._anchor_tab[2]

    def bake_atlas(self, *, use_ema: bool = False, T: int = 16,
                   max_bytes: float = 8e9):
        """Build (or fetch, cached by param/occupancy identity) the baked
        feature atlas for texture-mapped rendering (render/baked.py).

        One-time cost per trained state (~seconds: #tiles x T^2 texels
        through the encode chain); every subsequent frame replaces the
        per-sample hash-pyramid + phi gathers with one atlas row."""
        from ..render import baked as baked_mod

        fcfg = self.ccfg.field
        if fcfg.encoder_type != "hash" or self.mode != "none":
            raise ValueError("bake_atlas: hash encoder + mode 'none' only")
        if not self.anchor_collapse:
            raise ValueError("bake_atlas needs anchor_collapse=True "
                             "(one chart per surface cell)")
        params = self.state.ema_params if use_ema else self.state.params
        enc = params["field"]["encoder"]
        nrm = params["field"].get("normal")
        occ = self.state.occ.occ
        tab = self._anchor_table()
        key = (id(enc), id(occ), T)
        cache = getattr(self, "_bake_cache", None)
        if cache is None:
            cache = self._bake_cache = {}
        ent = cache.get(key)
        if ent is not None and ent[0] is enc and ent[1] is occ:
            return ent[2], ent[3]
        C = fcfg.encoder_f_out_dim + (
            fcfg.normal_cfg.phi_embed_dim if fcfg.pred_normal else 0)
        if 4 * C > 128:
            raise ValueError(f"bake row would need {4 * C} lanes > 128")
        chunk_tiles = max(1, 262144 // (T * T))
        # params ride as encode_args (NOT closure captures: jit would
        # inline the tables as HLO literals, see bake_atlas docstring)
        encode_fn = lambda pts, e, nm: _bake_encode_chunk(e, nm, pts,
                                                          fcfg)
        atlas = baked_mod.bake_atlas(
            encode_fn, tab, occ, self.rcfg.grid_size, self.rcfg.bound,
            T=T, n_channels=C, chunk_tiles=chunk_tiles,
            max_bytes=max_bytes, encode_args=(enc, nrm))
        ext = baked_mod.extend_anchor_table(tab, atlas.tile_of_cell,
                                            atlas.anchors)
        if len(cache) >= 2:
            cache.clear()
        cache[key] = (enc, occ, atlas, ext)
        return atlas, ext

    def _refresh_anchor_tab(self):
        """Anchor table for the grid refresh (mode 'none' + hash encoder
        + per-ray projection enabled; None routes the exact chain)."""
        if self.anchor_cache and _use_frames(self.ccfg, self.mode):
            return self._anchor_table()
        return None

    def _get_near_cells(self):
        if self._near_cells is None:
            if self.mode == "field":
                # flat canvas on the xy plane: cells near z = 0
                H = self.rcfg.grid_size
                z = (np.arange(H) + 0.5) / H * 2.0 - 1.0
                z = z * self.rcfg.bound
                margin = (2 * self.ccfg.field.h_threshold
                          + 4 * self.rcfg.bound / H)
                zi = np.where(np.abs(z) < margin)[0]
                ids = (np.arange(H * H)[:, None] * H
                       + zi[None, :]).ravel()
                self._near_cells = ids.astype(np.int32)
            else:
                arr = (self.field_state.projector_imported
                       if self.mode in ("shape", "unhash", "patch")
                       else self.field_state.projector)
                self._near_cells = compute_near_cells(
                    np.asarray(arr.vertices), self.rcfg.grid_size,
                    self.rcfg.bound, self.ccfg.field.h_threshold)
        return self._near_cells

    def _maybe_refresh(self, step: int):
        if step % self.tcfg.grid_update_interval == 0:
            self.key, k = jax.random.split(self.key)
            full = (step // self.tcfg.grid_update_interval
                    < self.tcfg.grid_full_updates)
            self.state = curved_grid_step(
                self.state, self.field_state, k, ccfg=self.ccfg,
                rcfg=self.rcfg, full=full, mode=self.mode,
                rt=self.runtime, near_cells=self._get_near_cells(),
                anchor_tab=self._refresh_anchor_tab())

    def update_field_level(self, target_level: int | None = None) -> bool:
        """Advance the progressive vertex-feature mesh one level
        (reference update_gridfield -> MeshFeatureField.update,
        nerf/network_curvedfield.py:555, tools/map.py:810-841).

        Resamples features (and their EMA) barycentrically onto the
        subdivided mesh, rebuilds the feature projector, bumps the static
        n_feature_vertices (one recompile), and re-inits the optimizer
        slot for the resized leaf while keeping every other leaf's
        momentum.  Returns True when a level was applied."""
        import dataclasses

        fcfg = self.ccfg.field
        if fcfg.encoder_type != "vertex" or fcfg.level_num <= 1:
            return False
        if self.fea_level >= fcfg.level_num - 1:
            return False
        if target_level is not None and self.fea_level >= target_level:
            return False
        self.fea_level += 1
        vnum = mesh_field.levels_vnum(fcfg)[self.fea_level]
        st = self.state
        features, ema_features, self.field_state, V = \
            mesh_field.grow_feature_mesh(st.params["field"],
                                         st.ema_params["field"],
                                         self.field_state, fcfg, vnum)
        params = dict(st.params, field=dict(st.params["field"],
                                            features_v=features))
        ema = dict(st.ema_params, field=dict(st.ema_params["field"],
                                             features_v=ema_features))
        self.ccfg = dataclasses.replace(
            self.ccfg,
            field=dataclasses.replace(fcfg, n_feature_vertices=V))
        # fresh slots for the resized leaf; keep momentum elsewhere
        fresh = make_optimizer(self.tcfg).init(params)
        opt_state = jax.tree_util.tree_map(
            lambda n, o: o if (hasattr(o, "shape")
                               and getattr(n, "shape", None) == o.shape
                               and getattr(n, "dtype", None) == o.dtype)
            else n, fresh, st.opt_state)
        self.state = st._replace(params=params, ema_params=ema,
                                 opt_state=opt_state)
        self._near_cells = None
        return True

    def _maybe_update_level(self, step: int):
        if (self.tcfg.iters_per_level > 0
                and step % self.tcfg.iters_per_level == 0):
            self.update_field_level(step // self.tcfg.iters_per_level)

    def train(self, steps: int, log_every: int = 0):
        """Run `steps` train steps with the production grid-refresh
        cadence.  Runs of `tcfg.scan_steps` steps with no refresh
        boundary, log point, or distillation coin-flip in between are
        fused into one scanned device program (curved_train_scan)."""
        metrics = {}
        step0 = int(self.state.step)
        interval = self.tcfg.grid_update_interval
        scan_k = self.tcfg.scan_steps
        distill = self.tcfg.distillation and self.teacher is not None
        i = 0

        def log_point(j):
            return log_every and (j + 1) % log_every == 0

        while i < steps:
            step = step0 + i
            self._maybe_update_level(step)
            self._maybe_refresh(step)
            to_refresh = interval - (step % interval)
            run = min(steps - i, to_refresh)
            if self.tcfg.iters_per_level > 0:
                # don't scan across a progressive-level boundary
                run = min(run, self.tcfg.iters_per_level
                          - (step % self.tcfg.iters_per_level))
            can_scan = (not distill and scan_k > 1 and run >= scan_k
                        and not any(log_point(j)
                                    for j in range(i, i + scan_k - 1)))
            if can_scan:
                frames = jnp.asarray(self._rng.integers(
                    0, self.dataset.num_frames, size=scan_k))
                self.key, k_scan = jax.random.split(self.key)
                self.state, metrics = curved_train_scan(
                    self.state, self.field_state, self.poses, self.images,
                    self.intrinsics, frames, k_scan,
                    ccfg=self.ccfg, rcfg=self.rcfg, tcfg=self.tcfg,
                    H=self.H, W=self.W, mode=self.mode, rt=self.runtime,
                    anchor_tab=self._refresh_anchor_tab())
                i += scan_k
            else:
                frame = self._rng.integers(0, self.dataset.num_frames)
                self.key, k = jax.random.split(self.key)
                if distill and self._rng.random() \
                        < self.tcfg.distillation_prob:
                    t_params, t_cfg = self.teacher
                    self.state, metrics = distill_step(
                        self.state, self.field_state, t_params, self.poses,
                        self.images, self.intrinsics, jnp.asarray(frame),
                        k, ccfg=self.ccfg, ncfg=t_cfg, rcfg=self.rcfg,
                        tcfg=self.tcfg, mode=self.mode)
                else:
                    self.state, metrics = curved_train_step(
                        self.state, self.field_state, self.poses,
                        self.images, self.intrinsics, jnp.asarray(frame),
                        k, ccfg=self.ccfg, rcfg=self.rcfg, tcfg=self.tcfg,
                        H=self.H, W=self.W, mode=self.mode,
                        rt=self.runtime,
                        anchor_tab=self._refresh_anchor_tab())
                i += 1
            if log_point(i - 1):
                print(f"step {step0 + i}: "
                      f"loss={float(metrics['loss']):.5f}")
                if self.logger is not None:
                    self.logger.log(step0 + i,
                                    **{k: float(v)
                                       for k, v in metrics.items()})
        return {k: float(v) for k, v in metrics.items()}

    def load_envmap(self, path: str, *, with_visibility: bool = True,
                    probe_res: int = 8) -> bool:
        """Import an environment map image and relight with it
        (reference Trainer.load_envmap, nerf/utils.py:1265-1292).

        SH: solid-angle SH projection (EnvMap2SH,
        sh_light_model.py:730-766) + optional per-probe visibility
        products (:647-670).  SG: SG-lobe fit (EnvMap2SG,
        sg_light_model.py:559-596).  Envmap: area-resampled probe grid.
        Returns False (with a warning) when the file is missing."""
        import os
        import warnings

        if not os.path.exists(path):
            warnings.warn(f"envmap {path} not found; keeping the "
                          "learned environment")
            return False
        from ..models.lights import sh as sh_light

        if self.ccfg.light_model == "SH":
            cfg = self.ccfg.sh_cfg
            env = sh_light.image_to_envmap(path,
                                           force_white=cfg.white_light)
            shs = sh_light.envmap_to_sh(env, sh_order=cfg.sh_order)
            li = {"env_import": jnp.asarray(shs, jnp.float32)}
            if with_visibility and not self.ccfg.no_visibility:
                env_vis, probes = sh_light.build_visibility_probes(
                    shs[:9], res=probe_res)
                li["env_import_vis"] = env_vis
                li["probes"] = probes
        elif self.ccfg.light_model == "SG":
            from ..models.lights import sg as sg_light
            env = sh_light.image_to_envmap(path, force_white=False)
            li = {"lgt_sgs_import": sg_light.envmap_to_sg(
                env, num_sgs=self.ccfg.sg_cfg.num_sgs)}
        else:
            from ..models.lights.envmap import EnvmapLightConfig  # noqa
            cfg = self.ccfg.env_cfg
            env = sh_light.image_to_envmap(path,
                                           force_white=cfg.white_light)
            res = cfg.env_res
            H0, W0 = env.shape[:2]
            iy = (np.arange(res) + 0.5) / res * H0
            ix = (np.arange(res) + 0.5) / res * W0
            env_r = env[iy.astype(int)][:, ix.astype(int)]
            if cfg.white_light:
                env_r = env_r.mean(-1, keepdims=True)
            li = {"env_import": jnp.asarray(env_r, jnp.float32)}
        self.light_import = li
        return True

    def clear_envmap(self):
        """Back to the learned environment light."""
        self.light_import = None

    def initialize_states(self, n: int = 50):
        """Refresh the density grid after an import
        (network_curvedfield.py:543-546)."""
        self._near_cells = None
        for _ in range(n):
            self.key, k = jax.random.split(self.key)
            self.state = curved_grid_step(
                self.state, self.field_state, k, ccfg=self.ccfg,
                rcfg=self.rcfg, full=True, mode=self.mode,
                rt=self.runtime, near_cells=self._get_near_cells(),
                anchor_tab=self._refresh_anchor_tab())

    def render_frame(self, pose, *, use_ema: bool = True, bg_color=1.0,
                     H=None, W=None, parity: bool = False,
                     baked: bool = False):
        """Render one frame.

        parity=True forces the reference-exact SAMPLING path regardless
        of the configured fast paths: infer_mode='pool' (occupancy march
        + compacted pool, the reference's run_cuda analogue) -- the
        protocol docs/PARITY.md specifies for cross-framework PSNR
        comparison.  The PROJECTION mode deliberately stays whatever the
        model was trained with: rendering an anchor-trained model with
        exact per-sample projection MISmatches the features it learned
        (measured -4 dB, scripts/_dbg_render_ab.py round 4 pool vs
        pool_noanchor); for a reference-identical measurement train with
        per_ray_projection=False as docs/PARITY.md step 4 specifies."""
        import dataclasses
        params = self.state.ema_params if use_ema else self.state.params
        static = (self.ccfg, self.mode, self.visual_mode,
                  self.light_visual_mode)
        bundle = {"params": params, "field_state": self.field_state,
                  "rt": self.runtime}
        if self.light_import is not None:
            bundle["light_import"] = self.light_import
        if self.euler is not None:
            from ..utils.transforms import axis_angle_to_matrix
            bundle["euler_rot"] = axis_angle_to_matrix(
                jnp.asarray(np.asarray(self.euler, np.float32)))
        rcfg = self.rcfg
        use_frames = _use_frames(self.ccfg, self.mode)
        if parity:
            # the survivor SHADING cap is our approximation, not the
            # reference's (which shades every surviving sample); it is
            # first-k-by-arrival in pool mode, so a tight proxy-tuned
            # cap (e.g. 5) fills the slots with leading near-threshold
            # haze and never shades the surface (measured: pool 24.96
            # at cap 8+ vs 15.87 when the proxy's cap 5 leaked in).
            # Parity must not be bound by it.
            rcfg = dataclasses.replace(
                rcfg, infer_mode="pool",
                infer_color_cap=max(rcfg.infer_color_cap, 16))
        if use_frames and self.anchor_cache:
            bundle["anchor_tab"] = self._anchor_table()
        elif rcfg.anchor_per_sample:
            # no table -> the kNN anchor fallback; per-sample kNN would
            # be the expensive exact-ish chain, so drop to per-ray
            rcfg = dataclasses.replace(rcfg, anchor_per_sample=False)
        anchor = curved_anchor_apply if use_frames else None
        if baked and not parity:
            ok = (use_frames and self.anchor_cache and self.anchor_collapse
                  and self.mode == "none" and self.visual_mode == "RGB"
                  and self.ccfg.field.encoder_type == "hash")
            if not ok:
                import warnings
                warnings.warn("baked rendering needs mode 'none' + RGB + "
                              "hash encoder + collapsed anchor table; "
                              "falling back to the live field",
                              stacklevel=2)
            else:
                bundle["bake"], bundle["anchor_ext"] = \
                    self.bake_atlas(use_ema=use_ema)
                deferred = ((curved_field_apply_baked_s1,
                             curved_field_apply_baked_s2)
                            if rcfg.deferred else None)
                return render_image(
                    curved_field_apply_baked, static, bundle,
                    self.state.occ.occ, pose, self.intrinsics,
                    H or self.H, W or self.W, rcfg, bg_color=bg_color,
                    anchor_apply=curved_anchor_apply_baked,
                    density=self.state.occ.density,
                    crop_aabb=getattr(self, "crop_aabb", None),
                    deferred_apply=deferred)
        # aux-cached shading on the per-ray-frames path for every visual
        # mode except Grad (needs the -grad(sigma) chain); import modes
        # still two-phase via the field-on-survivors fallback inside
        # render_rays (sigma pass + full field on survivors only)
        color = (curved_color_apply
                 if use_frames and self.visual_mode != "Grad" else None)
        return render_image(curved_field_apply, static, bundle,
                            self.state.occ.occ, pose, self.intrinsics,
                            H or self.H, W or self.W, rcfg,
                            bg_color=bg_color, anchor_apply=anchor,
                            sigma_apply=curved_sigma_apply,
                            color_apply=color,
                            density=self.state.occ.density,
                            crop_aabb=getattr(self, "crop_aabb", None))

    def eval_psnr(self, frame_indices=None, *, use_ema: bool = True,
                  parity: bool = False):
        if frame_indices is None:
            frame_indices = [0]
        vals = []
        for idx in frame_indices:
            # host-side pose fetch (device indexing = one-off slice program)
            out = self.render_frame(np.asarray(self.dataset.poses[idx]),
                                    use_ema=use_ema, parity=parity)
            # host-side gt (avoids a d2h fetch of the device train copy)
            gt = np.asarray(self.dataset.images[idx]).astype(
                np.float32) / 255.0
            if gt.shape[-1] == 4:
                gt = gt[..., :3] * gt[..., 3:] + (1.0 - gt[..., 3:])
            vals.append(psnr(out["image"], gt))
        return float(np.mean(vals))

    def save_checkpoint(self, path: str):
        import os

        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        ckptr.save(os.path.abspath(path), self.state, force=True)
        ckptr.wait_until_finished()

    def load_checkpoint(self, path: str, strict: bool = True):
        import os

        import orbax.checkpoint as ocp

        if not strict:
            from .trainer import tolerant_load
            tolerant_load(self, path)
            return
        ckptr = ocp.StandardCheckpointer()
        self.state = ckptr.restore(os.path.abspath(path), self.state)

    def checkpoint_best(self, metric: float,
                        workspace: str | None = None,
                        mode: str = "max") -> bool:
        """Save ``checkpoints/best`` (EMA-swapped) when metric improves
        (nerf/utils.py:1523-1539)."""
        from .trainer import save_best
        ws = workspace or self.workspace
        if ws is None:
            raise ValueError("no workspace configured")
        return save_best(self, metric, ws, mode=mode)

    def load_best(self, workspace: str | None = None) -> bool:
        from .trainer import best_checkpoint
        ws = workspace or self.workspace
        path = best_checkpoint(ws) if ws else None
        if path is None:
            return False
        self.load_checkpoint(path)
        return True

    def checkpoint(self, workspace: str | None = None, max_keep: int = 2):
        """Rotating checkpoint save (nerf/utils.py:1460-1474)."""
        from .trainer import save_rotating
        ws = workspace or self.workspace
        if ws is None:
            raise ValueError("no workspace configured")
        return save_rotating(self, ws, max_keep=max_keep)

    def load_latest(self, workspace: str | None = None) -> bool:
        from .trainer import latest_checkpoint
        ws = workspace or self.workspace
        path = latest_checkpoint(ws) if ws else None
        if path is None:
            return False
        self.load_checkpoint(path)
        return True

    def resume(self, ckpt: str = "latest",
               workspace: str | None = None) -> str:
        """scratch / latest / latest_model / best / <path> -- the
        reference's --ckpt resume modes (nerf/utils.py:499-517)."""
        from .trainer import resume
        return resume(self, ckpt, workspace=workspace)


def load_ngp_teacher(workspace: str, mcfg: ngp.NGPConfig | None = None):
    """Auto-load the coarse NGP checkpoint as the distillation teacher.

    The reference constructs the frozen tcnn teacher and loads the coarse
    checkpoint from the workspace whenever distillation is requested,
    warning and continuing without it when the file is missing
    (nerf/utils.py:535-567,582-591).  Returns ``(params, NGPConfig)`` for
    ``CurvedTrainer(teacher=...)`` or ``None`` when no usable checkpoint
    exists.
    """
    import os
    import warnings

    path = os.path.join(workspace, "checkpoints", "ngp")
    if not os.path.isdir(path):
        warnings.warn(f"no coarse NGP checkpoint at {path}; "
                      "distillation disabled (run main_nerf.py first)")
        return None
    try:
        import orbax.checkpoint as ocp

        raw = ocp.StandardCheckpointer().restore(os.path.abspath(path))
    except Exception as e:                        # noqa: BLE001
        warnings.warn(f"teacher restore failed ({e!r}); "
                      "distillation disabled")
        return None
    params = raw.get("params") if isinstance(raw, dict) else None
    if not params:
        warnings.warn(f"checkpoint at {path} has no 'params' tree; "
                      "distillation disabled")
        return None
    params = jax.tree.map(jnp.asarray, params)
    return params, (mcfg if mcfg is not None else ngp.NGPConfig())
