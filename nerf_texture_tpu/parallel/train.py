"""Multi-chip training step: data-parallel rays, optional tensor-parallel
MLPs, replicated hash tables.

Pure GSPMD: the step body is the same math as the single-chip path
(`train/trainer.py`); parallelism comes only from in/out shardings plus a
sharding constraint on the ray batch.  XLA inserts the gradient
all-reduce over ICI -- no hand-written collectives (SURVEY.md 2.3).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import optax

from ..models import ngp
from ..render.renderer import RenderConfig, render_rays
from ..train.trainer import TrainConfig, TrainState, make_optimizer
from .sharding import data_sharded, make_mesh, param_shardings, replicated


@partial(jax.jit, static_argnames=("mcfg", "rcfg", "tcfg", "mesh"))
def dp_train_step(state: TrainState, rays_o, rays_d, gt_rgb, bg, key, *,
                  mcfg: ngp.NGPConfig, rcfg: RenderConfig,
                  tcfg: TrainConfig, mesh):
    """One sharded training step over a prepared ray batch.

    rays_o/rays_d/gt_rgb: [N, 3] sharded over the mesh 'data' axis.
    """
    spec = data_sharded(mesh)
    rays_o = jax.lax.with_sharding_constraint(rays_o, spec)
    rays_d = jax.lax.with_sharding_constraint(rays_d, spec)
    gt_rgb = jax.lax.with_sharding_constraint(gt_rgb, spec)

    field = jax.checkpoint(
        lambda params, x, d: ngp.forward(params, x, d, mcfg))

    def loss_fn(params):
        out = render_rays(
            lambda x, d: field(params, x, d), state.occ.occ,
            rays_o, rays_d, rcfg, max_samples=rcfg.max_samples_train,
            key=key, perturb=True, bg_color=bg)
        return jnp.mean((out["image"] - gt_rgb) ** 2)

    loss, grads = jax.value_and_grad(loss_fn)(state.params)
    optimizer = make_optimizer(tcfg)
    updates, opt_state = optimizer.update(grads, state.opt_state,
                                          state.params)
    params = optax.apply_updates(state.params, updates)
    ema = jax.tree.map(
        lambda e, p: e * tcfg.ema_decay + p * (1.0 - tcfg.ema_decay),
        state.ema_params, params)
    return TrainState(params=params, opt_state=opt_state, ema_params=ema,
                      occ=state.occ, step=state.step + 1), loss


def shard_state(state: TrainState, mesh) -> TrainState:
    """Place a TrainState on the mesh: params/opt/ema per `param_shardings`
    (TP-aware), occupancy grid + step replicated."""
    pshard = param_shardings(state.params, mesh)
    rep = jax.tree.map(lambda _: replicated(mesh), state.occ)
    return TrainState(
        params=jax.device_put(state.params, pshard),
        opt_state=jax.device_put(
            state.opt_state,
            _opt_shardings(state.opt_state, state.params, pshard, mesh)),
        ema_params=jax.device_put(state.ema_params, pshard),
        occ=jax.device_put(state.occ, rep),
        step=jax.device_put(state.step, replicated(mesh)),
    )


def shard_curved_state(state, field_state, mesh):
    """Place a CurvedTrainState + MeshFieldState on the mesh for the
    data-parallel flagship train step (`curved_trainer.
    _curved_train_step_body(mesh=...)`): params/opt/ema follow
    param_shardings (hash tables replicated, MLPs TP-sharded when the
    model axis > 1), geometry/occupancy/error map replicated."""
    pshard = param_shardings(state.params, mesh)
    rep_tree = lambda t: jax.device_put(
        t, jax.tree.map(lambda _: replicated(mesh), t))
    return state._replace(
        params=jax.device_put(state.params, pshard),
        opt_state=jax.device_put(
            state.opt_state,
            _opt_shardings(state.opt_state, state.params, pshard, mesh)),
        ema_params=jax.device_put(state.ema_params, pshard),
        occ=rep_tree(state.occ),
        step=jax.device_put(state.step, replicated(mesh)),
        error_map=jax.device_put(state.error_map, replicated(mesh)),
    ), rep_tree(field_state)


def _opt_shardings(opt_state, params, pshard, mesh):
    """Adam moments shard like their parameters; scalars replicate."""
    flat_params, _ = jax.tree_util.tree_flatten(params)
    flat_shard, _ = jax.tree_util.tree_flatten(pshard)
    shard_by_shape = {}
    for p, s in zip(flat_params, flat_shard):
        shard_by_shape.setdefault((p.shape, p.dtype), s)

    def pick(leaf):
        return shard_by_shape.get((getattr(leaf, "shape", ()),
                                   getattr(leaf, "dtype", None)),
                                  replicated(mesh))

    return jax.tree.map(pick, opt_state)
