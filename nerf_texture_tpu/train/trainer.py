"""Training loop for the Instant-NGP stage.

Rebuild of the reference ``Trainer`` (nerf/utils.py:379-1603) around a
single jitted train step:

  frame gather -> pixel sampling -> ray gen -> occupancy march ->
  fused field eval -> composite -> loss -> adam -> EMA

all on device; the host loop only picks frame indices and triggers the
(also jitted) density-grid refresh every ``grid_update_interval`` steps
(the reference's ``update_extra_state`` cadence, nerf/utils.py:1006-1008).

AMP GradScaler machinery is unnecessary: matmuls run in bf16 on the MXU
with f32 params/accumulation, which needs no loss scaling.

All jitted entry points are module-level pure functions whose static
arguments are frozen (hashable) config dataclasses, so every Trainer
instance with the same configuration shares one compiled executable.
"""

from __future__ import annotations

import dataclasses
import os
from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.rays import get_rays, sample_ray_indices
from ..models import ngp
from ..ops import occupancy as occ_mod
from ..render.renderer import RenderConfig, render_image, render_rays
from ..utils.metrics import psnr


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    lr: float = 1e-2
    lr_final_ratio: float = 0.1   # LambdaLR 0.1 ** (t / T) (main.py:188)
    total_steps: int = 40000
    num_rays: int = 4096
    adam_b1: float = 0.9
    adam_b2: float = 0.99
    adam_eps: float = 1e-15
    ema_decay: float = 0.95
    grid_update_interval: int = 16
    # Full grid refreshes before switching to partial mode.  The
    # reference goes partial after 16 updates to save GPU time
    # (renderer.py:600-611: N/4 uniform + N/4 occupied cells); on TPU a
    # partial update costs nearly as much as a full one (H^3/2 evals
    # plus an [H^3] argsort vs H^3 evals in one fused program), and with
    # the reference-parity EMA (only RESAMPLED cells decay,
    # renderer.py:645-648) partial mode decays unsampled init haze ~4x
    # slower -- on short schedules the EMA stays above the occupancy
    # threshold long after the field itself has carved, wasting the
    # march's sample budget and defeating the silhouette prepass.  Full
    # refreshes every update are the TPU-first default; set 16 for
    # reference-identical behavior.
    grid_full_updates: int = 2 ** 30
    # density-grid EMA decay (reference renderer.py:607 uses 0.95; lower
    # values prune empty space in fewer updates: a never-reinforced cell
    # needs log(thresh)/log(decay) refreshes to fall below threshold)
    grid_decay: float = 0.95
    random_bg: bool = True
    error_map: bool = False


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    ema_params: Any
    occ: occ_mod.OccupancyGrid
    step: jax.Array


def _infer_table_dtype(mcfg: ngp.NGPConfig):
    import jax.numpy as jnp

    return jnp.bfloat16 if (mcfg.encoder == "packed"
                            and mcfg.infer_table_bf16) else None


def ngp_field_apply(params, x, d, mcfg: ngp.NGPConfig):
    """Module-level field fn (hashable static arg for jitted rendering)."""
    return ngp.forward(params, x, d, mcfg,
                       table_dtype=_infer_table_dtype(mcfg))


def ngp_sigma_apply(params, x, d, mcfg: ngp.NGPConfig):
    """Two-phase sigma pass: caches geo_feat as aux so the color pass
    needs no second hash encode."""
    sigma, geo_feat = ngp.density(params, x, mcfg,
                                  table_dtype=_infer_table_dtype(mcfg))
    return sigma, geo_feat


def ngp_color_apply(params, x, d, geo_feat, mcfg: ngp.NGPConfig):
    return ngp.color(params, d, geo_feat, mcfg)


def ngp_deferred_s1(params, x, mcfg: ngp.NGPConfig, frames=None):
    """Deferred stage 1 (per sample): sigma + geo_feat as the flat
    shading feature (frames unused -- NGP has no chart)."""
    return ngp.density(params, x, mcfg,
                       table_dtype=_infer_table_dtype(mcfg))


def ngp_deferred_s2(params, fbar, d, mcfg: ngp.NGPConfig):
    """Deferred stage 2 (per ray): the color MLP on the composited
    geo_feat (SNeRG-style; view dir is constant per ray)."""
    return ngp.color(params, d, fbar, mcfg)


def make_optimizer(tcfg: TrainConfig) -> optax.GradientTransformation:
    schedule = lambda step: tcfg.lr * (
        tcfg.lr_final_ratio
        ** (jnp.minimum(step, tcfg.total_steps) / tcfg.total_steps))
    return optax.adam(schedule, b1=tcfg.adam_b1, b2=tcfg.adam_b2,
                      eps=tcfg.adam_eps)


@partial(jax.jit, static_argnames=("mcfg", "rcfg", "tcfg", "H", "W"))
def train_step(state: TrainState, poses, images, intrinsics, frame_idx,
               key, *, mcfg: ngp.NGPConfig, rcfg: RenderConfig,
               tcfg: TrainConfig, H: int, W: int):
    """One fully-on-device training iteration (reference
    ``Trainer.train_step``, nerf/utils.py:572-667)."""
    pose = poses[frame_idx]
    image = images[frame_idx]
    k_pix, k_perturb, k_bg = jax.random.split(key, 3)

    inds, _ = sample_ray_indices(k_pix, H, W, tcfg.num_rays)
    rays = get_rays(pose, intrinsics, H, W, inds)
    pixels = image.reshape(H * W, -1)[inds].astype(jnp.float32) / 255.0

    if pixels.shape[-1] == 4:
        bg = (jax.random.uniform(k_bg, (3,)) if tcfg.random_bg
              else jnp.ones((3,)))
        gt_rgb = (pixels[:, :3] * pixels[:, 3:]
                  + bg * (1.0 - pixels[:, 3:]))
    else:
        bg = jnp.ones((3,))
        gt_rgb = pixels[:, :3]

    # remat the field eval: the backward pass recomputes hash-encode + MLPs
    # instead of saving ~GBs of per-corner gather residuals (HBM is the
    # bottleneck; the recompute is a few cheap matmuls).
    field = jax.checkpoint(
        lambda params, x, d: ngp.forward(params, x, d, mcfg))

    def loss_fn(params):
        if mcfg.bg_radius > 0:
            # learned background sphere overrides the bg color, and its
            # net trains through the (1 - w_sum) * bg composite term
            # (reference nerf/renderer.py:353-356, network.py:145-160)
            from ..ops import polar_from_ray
            polar = polar_from_ray(rays["rays_o"], rays["rays_d"],
                                   mcfg.bg_radius)
            bg_c = ngp.background(params, polar, rays["rays_d"], mcfg)
        else:
            bg_c = bg
        out = render_rays(
            lambda x, d: field(params, x, d), state.occ.occ,
            rays["rays_o"], rays["rays_d"], rcfg,
            max_samples=rcfg.max_samples_train, key=k_perturb,
            perturb=True, bg_color=bg_c)
        loss = jnp.mean((out["image"] - gt_rgb) ** 2)
        return loss, out

    (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params)
    optimizer = make_optimizer(tcfg)
    updates, opt_state = optimizer.update(grads, state.opt_state,
                                          state.params)
    params = optax.apply_updates(state.params, updates)
    ema = jax.tree.map(
        lambda e, p: e * tcfg.ema_decay + p * (1.0 - tcfg.ema_decay),
        state.ema_params, params)
    new_state = TrainState(params=params, opt_state=opt_state,
                           ema_params=ema, occ=state.occ,
                           step=state.step + 1)
    metrics = {"loss": loss,
               "mean_samples": jnp.mean(out["counts"].astype(jnp.float32))}
    return new_state, metrics


@partial(jax.jit, static_argnames=("mcfg", "H", "W"))
def ngp_background_image(params, pose, intrinsics, *, H: int, W: int,
                         mcfg: ngp.NGPConfig):
    """[H*W, 3] learned background-sphere colors for a full frame
    (reference nerf/renderer.py:298-301: polar_from_ray -> bg net).
    Miss rays composite to these via render_image's bg_image path."""
    from ..ops import polar_from_ray

    rays = get_rays(pose, intrinsics, H, W)
    polar = polar_from_ray(rays["rays_o"], rays["rays_d"], mcfg.bg_radius)
    return ngp.background(params, polar, rays["rays_d"], mcfg)


@partial(jax.jit, static_argnames=("mcfg", "rcfg", "full"))
def grid_step(state: TrainState, key, *, mcfg: ngp.NGPConfig,
              rcfg: RenderConfig, full: bool,
              decay: float = 0.95) -> TrainState:
    """Density-grid EMA refresh (reference ``update_extra_state``)."""

    def density_fn(pts):
        sigma, _ = ngp.density(state.params, pts, mcfg)
        return sigma

    occ = occ_mod.update(
        state.occ, density_fn, key, grid_size=rcfg.grid_size,
        cascades=rcfg.cascades, bound=rcfg.bound,
        density_thresh=rcfg.density_thresh,
        density_scale=rcfg.density_scale, full=full, decay=decay)
    return state._replace(occ=occ)


@partial(jax.jit, static_argnames=("mcfg", "rcfg", "tcfg"))
def _init_train_state(key, *, mcfg: ngp.NGPConfig, rcfg: RenderConfig,
                      tcfg: TrainConfig) -> TrainState:
    """Whole initial state (params + optimizer + occupancy) as ONE
    program: eager init compiled ~25 one-off programs (per-layer normals,
    optimizer zeros, grid zeros), each a remote-compile + dispatch on a
    cold start."""
    params = ngp.init(key, mcfg)
    return TrainState(
        params=params, opt_state=make_optimizer(tcfg).init(params),
        ema_params=params,
        occ=occ_mod.create(rcfg.grid_size, rcfg.cascades),
        step=jnp.zeros((), jnp.int32))


class Trainer:
    """Orchestrates NGP training on one scene.

    Args:
      dataset: object with poses [B,4,4], images [B,H,W,C] uint8,
        intrinsics [4], H, W (see data/provider.py, data/synthetic.py).
    """

    def __init__(self, dataset, model_cfg: ngp.NGPConfig,
                 render_cfg: RenderConfig, train_cfg: TrainConfig,
                 key=None, workspace: str | None = None):
        self.dataset = dataset
        self.workspace = workspace
        self.logger = None
        if workspace is not None:
            from ..utils.misc import MetricsLogger
            self.logger = MetricsLogger(workspace, "ngp")
        self.mcfg = model_cfg
        self.rcfg = render_cfg
        self.tcfg = train_cfg
        key = key if key is not None else jax.random.PRNGKey(0)
        k_init, self.key = jax.random.split(key)

        self.state = _init_train_state(k_init, mcfg=model_cfg,
                                       rcfg=render_cfg, tcfg=train_cfg)

        # device-resident scene
        self.poses = jnp.asarray(dataset.poses)
        self.images = jnp.asarray(dataset.images)  # uint8
        self.intrinsics = jnp.asarray(dataset.intrinsics)
        self.H, self.W = dataset.H, dataset.W
        self._rng = np.random.default_rng(0)
        self._marked = False

    # ------------------------------------------------------------------

    def mark_untrained(self):
        self.state = self.state._replace(occ=occ_mod.mark_untrained(
            self.state.occ, self.poses, self.intrinsics,
            grid_size=self.rcfg.grid_size, cascades=self.rcfg.cascades,
            bound=self.rcfg.bound))
        self._marked = True

    def train(self, steps: int, log_every: int = 0):
        """Run `steps` training iterations; returns last metrics."""
        if not self._marked:
            self.mark_untrained()
        metrics = {}
        step0 = int(self.state.step)
        for i in range(steps):
            step = step0 + i
            if step % self.tcfg.grid_update_interval == 0:
                self.key, k = jax.random.split(self.key)
                full = (step // self.tcfg.grid_update_interval
                        < self.tcfg.grid_full_updates)
                self.state = grid_step(self.state, k, mcfg=self.mcfg,
                                       rcfg=self.rcfg, full=full,
                                       decay=self.tcfg.grid_decay)
            frame = self._rng.integers(0, self.dataset.num_frames)
            self.key, k = jax.random.split(self.key)
            self.state, metrics = train_step(
                self.state, self.poses, self.images, self.intrinsics,
                jnp.asarray(frame), k, mcfg=self.mcfg, rcfg=self.rcfg,
                tcfg=self.tcfg, H=self.H, W=self.W)
            if log_every and (i + 1) % log_every == 0:
                print(f"step {step + 1}: loss={float(metrics['loss']):.5f} "
                      f"samples/ray={float(metrics['mean_samples']):.1f}")
                if self.logger is not None:
                    self.logger.log(step + 1, **{k: float(v)
                                                 for k, v in metrics.items()})
        return {k: float(v) for k, v in metrics.items()}

    def render_frame(self, pose, *, use_ema: bool = True, bg_color=1.0,
                     H=None, W=None):
        params = self.state.ema_params if use_ema else self.state.params
        H, W = H or self.H, W or self.W
        if self.mcfg.bg_radius > 0:
            bg_color = ngp_background_image(
                params, jnp.asarray(pose), self.intrinsics, H=H, W=W,
                mcfg=self.mcfg)
        deferred = ((ngp_deferred_s1, ngp_deferred_s2)
                    if self.rcfg.deferred else None)
        return render_image(ngp_field_apply, self.mcfg, params,
                            self.state.occ.occ, pose, self.intrinsics,
                            H, W, self.rcfg,
                            bg_color=bg_color,
                            sigma_apply=ngp_sigma_apply,
                            color_apply=ngp_color_apply,
                            density=self.state.occ.density,
                            crop_aabb=getattr(self, "crop_aabb", None),
                            deferred_apply=deferred)

    def eval_psnr(self, frame_indices=None, *, use_ema: bool = True):
        """PSNR against ground-truth frames (white background)."""
        if frame_indices is None:
            frame_indices = [0]
        vals = []
        for idx in frame_indices:
            # host-side pose fetch: indexing the device copy would compile
            # + dispatch a dynamic_slice/squeeze pair per eval
            out = self.render_frame(np.asarray(self.dataset.poses[idx]),
                                    use_ema=use_ema)
            # gt from the host-side dataset copy (the device copy exists
            # for train_step; a d2h fetch here costs ~0.5 MB per eval)
            gt = np.asarray(self.dataset.images[idx]).astype(
                np.float32) / 255.0
            if gt.shape[-1] == 4:
                gt = gt[..., :3] * gt[..., 3:] + (1.0 - gt[..., 3:])
            vals.append(psnr(out["image"], gt))
        return float(np.mean(vals))

    # ------------------------------------------------------------------
    # checkpointing (orbax)
    # ------------------------------------------------------------------

    def save_checkpoint(self, path: str):
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        ckptr.save(os.path.abspath(path), self.state, force=True)
        ckptr.wait_until_finished()

    def load_checkpoint(self, path: str, strict: bool = True):
        if not strict:
            tolerant_load(self, path)
            self._marked = True
            return
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        self.state = ckptr.restore(os.path.abspath(path), self.state)
        self._marked = True

    def checkpoint_best(self, metric: float,
                        workspace: str | None = None,
                        mode: str = "max") -> bool:
        """Save ``checkpoints/best`` (EMA-swapped) when metric improves
        (nerf/utils.py:1523-1539)."""
        ws = workspace or self.workspace
        if ws is None:
            raise ValueError("no workspace configured")
        return save_best(self, metric, ws, mode=mode)

    def load_best(self, workspace: str | None = None) -> bool:
        ws = workspace or self.workspace
        path = best_checkpoint(ws) if ws else None
        if path is None:
            return False
        self.load_checkpoint(path)
        return True

    def checkpoint(self, workspace: str | None = None, max_keep: int = 2):
        """Rotating checkpoint save (the reference keeps the newest
        ``max_keep`` epochs, nerf/utils.py:1460-1474)."""
        ws = workspace or self.workspace
        if ws is None:
            raise ValueError("no workspace configured")
        return save_rotating(self, ws, max_keep=max_keep)

    def load_latest(self, workspace: str | None = None) -> bool:
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
        return resume(self, ckpt, workspace=workspace)


def resume(trainer, ckpt: str = "latest",
           workspace: str | None = None) -> str:
    """Reference resume modes (nerf/utils.py:499-517):

      'scratch'      -- train from scratch (no load)
      'latest'       -- newest rotating checkpoint, full state
      'latest_model' -- newest rotating checkpoint, MODEL WEIGHTS only
                        (optimizer/EMA/step/occupancy start fresh)
      'best'         -- the best-by-metric checkpoint (falls back to
                        latest, like the reference when no best exists)
      <path>         -- explicit checkpoint directory, full state

    Works on any trainer exposing ``state``/``load_checkpoint``/
    ``workspace``.  Returns a description of what was loaded."""
    ws = workspace or getattr(trainer, "workspace", None)
    if ckpt == "scratch":
        return "scratch (no checkpoint loaded)"
    if ckpt in ("latest", "latest_model"):
        path = latest_checkpoint(ws) if ws else None
        if path is None:
            return "scratch (no latest checkpoint found)"
        if ckpt == "latest_model":
            import orbax.checkpoint as ocp

            raw = ocp.StandardCheckpointer().restore(os.path.abspath(path))
            params = raw.get("params") if isinstance(raw, dict) else None
            if params is None:
                return f"scratch (no params in {path})"
            merged, missing, unexpected = tolerant_merge(
                trainer.state.params, params)
            trainer.state = trainer.state._replace(params=merged)
            if missing or unexpected:
                print(f"[resume latest_model] missing={missing} "
                      f"unexpected={unexpected}")
            return f"model weights from {path}"
        trainer.load_checkpoint(path)
        return f"full state from {path}"
    if ckpt == "best":
        path = best_checkpoint(ws) if ws else None
        if path is None:
            return resume(trainer, "latest", workspace=ws) + \
                " (no best checkpoint, fell back to latest)"
        trainer.load_checkpoint(path)
        return f"best checkpoint from {path}"
    trainer.load_checkpoint(ckpt)
    return f"full state from {ckpt}"


def save_rotating(trainer, workspace: str, *, max_keep: int = 2,
                  prefix: str = "ckpt") -> str:
    """Write ``{workspace}/checkpoints/{prefix}_{step:08d}`` and prune all
    but the newest ``max_keep`` (nerf/utils.py:1460-1474)."""
    import shutil

    root = os.path.join(workspace, "checkpoints")
    os.makedirs(root, exist_ok=True)
    step = int(trainer.state.step)
    path = os.path.join(root, f"{prefix}_{step:08d}")
    trainer.save_checkpoint(path)
    kept = sorted(d for d in os.listdir(root) if d.startswith(prefix + "_"))
    for stale in kept[:-max_keep]:
        shutil.rmtree(os.path.join(root, stale), ignore_errors=True)
    return path


def latest_checkpoint(workspace: str, prefix: str = "ckpt") -> str | None:
    root = os.path.join(workspace, "checkpoints")
    if not os.path.isdir(root):
        return None
    kept = sorted(d for d in os.listdir(root) if d.startswith(prefix + "_"))
    return os.path.join(root, kept[-1]) if kept else None


# ---------------------------------------------------------------------------
# best-by-metric checkpointing + tolerant restore
# (reference nerf/utils.py:1523-1539, 1560-1565)
# ---------------------------------------------------------------------------


def save_best(trainer, metric: float, workspace: str, *,
              mode: str = "max") -> bool:
    """Save ``{workspace}/checkpoints/best`` when ``metric`` improves.

    The reference's "best" checkpoint stores EMA-swapped weights
    (ema.store(); ema.copy_to(); save; ema.restore() --
    nerf/utils.py:1523-1539): here the saved state carries
    ``params = ema_params``, so a restore serves the smoothed weights
    either way.  ``best.json`` records the metric for cross-process
    resume.  Returns True when an improved checkpoint was written."""
    import json as _json

    root = os.path.join(workspace, "checkpoints")
    os.makedirs(root, exist_ok=True)
    meta_path = os.path.join(root, "best.json")
    prev = None
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            prev = _json.load(f).get("metric")
    improved = (prev is None
                or (metric > prev if mode == "max" else metric < prev))
    if not improved:
        return False
    state = trainer.state
    swapped = state._replace(params=state.ema_params)
    saved, trainer.state = trainer.state, swapped
    try:
        trainer.save_checkpoint(os.path.join(root, "best"))
    finally:
        trainer.state = saved
    with open(meta_path, "w") as f:
        _json.dump({"metric": float(metric), "step": int(state.step),
                    "mode": mode}, f)
    return True


def best_checkpoint(workspace: str) -> str | None:
    path = os.path.join(workspace, "checkpoints", "best")
    return path if os.path.isdir(path) else None


def tolerant_merge(target, loaded, path: str = ""):
    """Merge a raw restored pytree (nested dicts/lists from orbax's
    target-free restore) into ``target``, keeping target values wherever
    ``loaded`` lacks a key or the leaf shape/dtype mismatches.

    Returns (merged, missing, unexpected) where missing/unexpected are
    key-path lists -- the reference's non-strict ``load_state_dict``
    report (nerf/utils.py:1560-1565)."""
    missing: list[str] = []
    unexpected: list[str] = []

    def rec(tgt, src, p):
        if hasattr(tgt, "_fields"):            # NamedTuple node
            if not isinstance(src, dict):
                missing.append(p or "<root>")
                return tgt
            vals = {}
            for name in tgt._fields:
                cp = f"{p}.{name}" if p else name
                if name in src:
                    vals[name] = rec(getattr(tgt, name), src[name], cp)
                else:
                    missing.append(cp)
                    vals[name] = getattr(tgt, name)
            unexpected.extend(f"{p}.{k}" if p else k
                              for k in src if k not in tgt._fields)
            return type(tgt)(**vals)
        if isinstance(tgt, dict):
            if not isinstance(src, dict):
                missing.append(p or "<root>")
                return tgt
            out = {}
            for k, v in tgt.items():
                cp = f"{p}.{k}" if p else str(k)
                # orbax serialises non-str dict keys to str
                sk = k if k in src else str(k)
                if sk in src:
                    out[k] = rec(v, src[sk], cp)
                else:
                    missing.append(cp)
                    out[k] = v
            tks = {str(k) for k in tgt}
            unexpected.extend(f"{p}.{k}" if p else str(k)
                              for k in src if str(k) not in tks)
            return out
        if isinstance(tgt, (list, tuple)):
            if not isinstance(src, (list, tuple, dict)):
                missing.append(p or "<root>")
                return tgt
            if isinstance(src, dict):           # orbax tuple-as-dict
                src = [src.get(str(i)) for i in range(len(tgt))]
            out = []
            for i, v in enumerate(tgt):
                cp = f"{p}[{i}]"
                if i < len(src) and src[i] is not None:
                    out.append(rec(v, src[i], cp))
                else:
                    missing.append(cp)
                    out.append(v)
            for i in range(len(tgt), len(src)):
                unexpected.append(f"{p}[{i}]")
            return type(tgt)(out) if isinstance(tgt, list) else tuple(out)
        # leaf
        if src is None:
            missing.append(p)
            return tgt
        arr = jnp.asarray(src)
        t_arr = jnp.asarray(tgt) if tgt is not None else None
        if t_arr is not None and (arr.shape != t_arr.shape
                                  or arr.dtype != t_arr.dtype):
            missing.append(f"{p} (shape/dtype mismatch: ckpt "
                           f"{arr.shape}/{arr.dtype} vs "
                           f"{t_arr.shape}/{t_arr.dtype})")
            return tgt
        return arr

    merged = rec(target, loaded, path)
    return merged, missing, unexpected


def tolerant_load(trainer, path: str) -> tuple[list[str], list[str]]:
    """Non-strict checkpoint load: missing keys keep their current
    values, unexpected keys are dropped; both are logged and returned."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    raw = ckptr.restore(os.path.abspath(path))
    merged, missing, unexpected = tolerant_merge(trainer.state, raw)
    trainer.state = merged
    if missing:
        print(f"[load_checkpoint] missing keys kept at current values: "
              f"{missing}")
    if unexpected:
        print(f"[load_checkpoint] unexpected keys ignored: {unexpected}")
    return missing, unexpected
