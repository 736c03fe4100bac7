"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from nerf_texture_tpu.data.rays import get_rays
from nerf_texture_tpu.data.synthetic import SyntheticSphereDataset
from nerf_texture_tpu.models import ngp
from nerf_texture_tpu.parallel import (dp_train_step, make_mesh,
                                       shard_state, data_sharded)
from nerf_texture_tpu.render.renderer import RenderConfig
from nerf_texture_tpu.train.trainer import (TrainConfig, TrainState,
                                            make_optimizer)
from nerf_texture_tpu.ops import occupancy as occ_mod

import pytest

pytestmark = pytest.mark.slow

MCFG = ngp.NGPConfig(bound=1.0, num_levels=4, level_dim=2,
                     base_resolution=16, log2_hashmap_size=12,
                     desired_resolution=64, hidden_dim=32,
                     hidden_dim_color=32)
RCFG = RenderConfig(bound=1.0, cascades=1, grid_size=16, max_steps=32,
                    max_samples_train=16)
TCFG = TrainConfig(lr=1e-2, total_steps=100, num_rays=128)


def make_state(key):
    params = ngp.init(key, MCFG)
    return TrainState(params=params,
                      opt_state=make_optimizer(TCFG).init(params),
                      ema_params=params,
                      occ=occ_mod.create(RCFG.grid_size, RCFG.cascades),
                      step=jnp.zeros((), jnp.int32))


def make_batch(n=128):
    ds = SyntheticSphereDataset(n_frames=2, H=16, W=16)
    rays = get_rays(jnp.asarray(ds.poses[0]), jnp.asarray(ds.intrinsics),
                    16, 16)
    gt = jnp.asarray(ds.images[0]).reshape(256, 4).astype(jnp.float32) / 255
    gt_rgb = gt[:, :3] * gt[:, 3:] + (1 - gt[:, 3:])
    return (rays["rays_o"][:n], rays["rays_d"][:n], gt_rgb[:n])


def run_steps(mesh, n_steps=3):
    state = make_state(jax.random.PRNGKey(0))
    state = shard_state(state, mesh)
    # seed the occupancy grid so rays actually march
    state = state._replace(occ=state.occ._replace(
        occ=jnp.ones_like(state.occ.occ)))
    rays_o, rays_d, gt = make_batch()
    spec = data_sharded(mesh)
    rays_o = jax.device_put(rays_o, spec)
    rays_d = jax.device_put(rays_d, spec)
    gt = jax.device_put(gt, spec)
    losses = []
    for i in range(n_steps):
        state, loss = dp_train_step(
            state, rays_o, rays_d, gt, jnp.ones((3,)),
            jax.random.PRNGKey(100 + i), mcfg=MCFG, rcfg=RCFG, tcfg=TCFG,
            mesh=mesh)
        losses.append(float(loss))
    return state, losses


def test_eight_device_mesh_available():
    assert len(jax.devices()) == 8


def test_dp_matches_single_device():
    mesh8 = make_mesh(data=8, model=1)
    mesh1 = make_mesh(data=1, model=1, devices=jax.devices()[:1])
    s8, l8 = run_steps(mesh8)
    s1, l1 = run_steps(mesh1)
    np.testing.assert_allclose(l8, l1, rtol=1e-4)
    leaves8 = jax.tree_util.tree_leaves(s8.params)
    leaves1 = jax.tree_util.tree_leaves(s1.params)
    for a, b in zip(leaves8, leaves1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_dp_plus_tp_runs_and_matches():
    mesh = make_mesh(data=4, model=2)
    s, losses = run_steps(mesh)
    _, l1 = run_steps(make_mesh(data=1, model=1,
                                devices=jax.devices()[:1]))
    np.testing.assert_allclose(losses, l1, rtol=1e-3)
    assert all(np.isfinite(losses))


def test_loss_decreases_under_dp():
    mesh = make_mesh(data=8, model=1)
    _, losses = run_steps(mesh, n_steps=20)
    assert losses[-1] < losses[0]


# ---------------------------------------------------------------------------
# flagship (curved-field) DP
# ---------------------------------------------------------------------------

def _curved_setup():
    from nerf_texture_tpu.geometry.mesh import make_icosphere
    from nerf_texture_tpu.geometry.projector import MeshProjector
    from nerf_texture_tpu.models import mesh_field
    from nerf_texture_tpu.models.curved_field import CurvedFieldConfig
    from nerf_texture_tpu.models.mesh_field import MeshFieldConfig
    from nerf_texture_tpu.train.curved_trainer import (CurvedTrainConfig,
                                                       init_state)

    fcfg = MeshFieldConfig(num_levels=3, level_dim=2, base_resolution=16,
                           desired_resolution=32, log2_bricks=9,
                           h_threshold=0.12, clustering=False)
    ccfg = CurvedFieldConfig(field=fcfg, light_model="SH", hidden_dim=16,
                             geo_feat_dim=7)
    rcfg = RenderConfig(bound=1.0, cascades=1, grid_size=16, max_steps=32,
                        max_samples_train=16, pool_mean_samples=8)
    tcfg = CurvedTrainConfig(lr=5e-3, total_steps=100, num_rays=64)
    mp = MeshProjector(make_icosphere(1, radius=0.5))
    fstate = mesh_field.make_state(mp)
    tstate = init_state(jax.random.PRNGKey(0), ccfg, rcfg, tcfg, 2)
    tstate = tstate._replace(occ=tstate.occ._replace(
        occ=jnp.ones_like(tstate.occ.occ)))
    return ccfg, rcfg, tcfg, fstate, tstate


def _run_curved(mesh, n_steps=3):
    from nerf_texture_tpu.parallel import shard_curved_state
    from nerf_texture_tpu.train.curved_trainer import curved_train_step

    ccfg, rcfg, tcfg, fstate, tstate = _curved_setup()
    ds = SyntheticSphereDataset(n_frames=2, H=16, W=16)
    tstate, fstate = shard_curved_state(tstate, fstate, mesh)
    from nerf_texture_tpu.parallel import replicated
    poses = jax.device_put(jnp.asarray(ds.poses), replicated(mesh))
    images = jax.device_put(jnp.asarray(ds.images), replicated(mesh))
    intr = jnp.asarray(ds.intrinsics)
    losses = []
    for i in range(n_steps):
        tstate, m = curved_train_step(
            tstate, fstate, poses, images, intr, jnp.asarray(i % 2),
            jax.random.PRNGKey(50 + i), ccfg=ccfg, rcfg=rcfg, tcfg=tcfg,
            H=16, W=16, mode="none", mesh=mesh)
        losses.append(float(m["loss"]))
    return tstate, losses


def test_curved_dp_matches_single_device():
    """Flagship-model DP step == single-device step (same keys/frames):
    SURVEY 2.3 applied to the actual NeRF-Texture workload."""
    s8, l8 = _run_curved(make_mesh(data=8, model=1))
    s1, l1 = _run_curved(make_mesh(data=1, model=1,
                                   devices=jax.devices()[:1]))
    np.testing.assert_allclose(l8, l1, rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(s8.params),
                    jax.tree_util.tree_leaves(s1.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5)


def test_curved_dp_loss_decreases():
    # mean-of-window comparison: the total loss includes the cosine
    # normal term (negative, batch-noisy), so single-step endpoints
    # flap at tiny step counts
    _, losses = _run_curved(make_mesh(data=8, model=1), n_steps=24)
    assert all(np.isfinite(losses))
    assert np.mean(losses[-4:]) < np.mean(losses[:4])


def test_param_spec_families_and_warning():
    """Known families replicate silently; MLP stacks shard; unknown big
    2-D leaves warn instead of silently replicating (r1 weak #7)."""
    import warnings

    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from nerf_texture_tpu.parallel import sharding as sh

    mesh = sh.make_mesh(data=4, model=2)
    params = {
        "grid": jnp.zeros((1024, 54)),
        "field": {"encoder": jnp.zeros((2048, 16))},
        "sigma_net": [{"w": jnp.zeros((64, 64))},
                      {"w": jnp.zeros((64, 64))}],
        "mystery": jnp.zeros((256, 256)),
    }
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        sh._warned_paths.clear()
        shardings = sh.param_shardings(params, mesh)
    assert shardings["grid"].spec == P()
    assert shardings["field"]["encoder"].spec == P()
    assert shardings["sigma_net"][0]["w"].spec == P(None, "model")
    assert shardings["sigma_net"][1]["w"].spec == P("model", None)
    assert shardings["mystery"].spec == P()
    msgs = [str(w.message) for w in rec]
    assert any("mystery" in m for m in msgs), msgs
    assert not any("encoder" in m for m in msgs)


def test_curved_sharded_eval_matches_single():
    """Flagship curved-field sharded full-frame eval == single-device
    render (SURVEY 2.3: sharded eval for the model Trainer holds, the
    reference's eval all_gather analogue nerf/utils.py:1420-1430)."""
    from nerf_texture_tpu.data.synthetic import SyntheticSphereDataset
    from nerf_texture_tpu.geometry.mesh import make_icosphere
    from nerf_texture_tpu.geometry.projector import MeshProjector
    from nerf_texture_tpu.models import mesh_field
    from nerf_texture_tpu.models.curved_field import CurvedFieldConfig
    from nerf_texture_tpu.models.mesh_field import MeshFieldConfig
    from nerf_texture_tpu.parallel import make_mesh
    from nerf_texture_tpu.parallel.eval import render_image_sharded
    from nerf_texture_tpu.parallel.sharding import replicated
    from nerf_texture_tpu.render.renderer import render_image
    from nerf_texture_tpu.train.curved_trainer import (CurvedTrainConfig,
                                                       CurvedTrainer,
                                                       curved_field_apply)

    ds = SyntheticSphereDataset(n_frames=2, H=24, W=24)
    fcfg = MeshFieldConfig(num_levels=3, level_dim=2, base_resolution=16,
                           desired_resolution=32, log2_bricks=9,
                           h_threshold=0.15, clustering=False,
                           per_ray_projection=False)
    ccfg = CurvedFieldConfig(field=fcfg, light_model="SH",
                             hidden_dim=16, geo_feat_dim=7)
    rcfg = RenderConfig(bound=1.0, cascades=1, grid_size=16, max_steps=32,
                        max_samples_infer=16, ray_chunk=288,
                        pool_mean_samples=8, pool_mean_samples_infer=8,
                        prepass_block=1)
    tcfg = CurvedTrainConfig(lr=5e-3, total_steps=20, num_rays=64,
                             grid_update_interval=8)
    mp = MeshProjector(make_icosphere(2, radius=0.5))
    tr = CurvedTrainer(ds, mesh_field.make_state(mp), ccfg, rcfg, tcfg,
                       key=jax.random.PRNGKey(0))
    tr.train(8)

    static = (tr.ccfg, tr.mode, "RGB", "Full")
    bundle = {"params": tr.state.params, "field_state": tr.field_state,
              "rt": tr.runtime}
    occ = jnp.ones((16 ** 3,), jnp.uint8)     # fully occupied: exact A/B
    single = render_image(curved_field_apply, static, bundle, occ,
                          ds.poses[0], ds.intrinsics, 24, 24, rcfg)

    mesh = make_mesh(data=4, model=1)
    rep = replicated(mesh)
    bundle_s = jax.device_put(bundle, rep)
    occ_s = jax.device_put(occ, rep)
    sharded = render_image_sharded(curved_field_apply, static, bundle_s,
                                   occ_s, ds.poses[0], ds.intrinsics,
                                   24, 24, rcfg, mesh)
    np.testing.assert_allclose(np.asarray(sharded["image"]),
                               np.asarray(single["image"]), atol=1e-4)


def test_curved_dp_plus_tp_matches():
    """Flagship DP+TP (4x2 mesh): losses match the single-device run --
    the MLP column/row sharding + psum pairs are numerically inert."""
    _, l_tp = _run_curved(make_mesh(data=4, model=2))
    _, l1 = _run_curved(make_mesh(data=1, model=1,
                                  devices=jax.devices()[:1]))
    np.testing.assert_allclose(l_tp, l1, rtol=1e-3)
    assert all(np.isfinite(l_tp))


def test_multihost_plumbing_single_process():
    """initialize_multihost is a safe no-op without a coordinator, and
    make_global_mesh builds the DCN-major ('data','model') mesh over the
    virtual 8-device backend (SURVEY.md section 5.8)."""
    import os

    from nerf_texture_tpu.parallel import (initialize_multihost,
                                           make_global_mesh)

    for var in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES",
                "JAX_PROCESS_ID"):
        assert var not in os.environ  # test env is single-process
    assert initialize_multihost() is False  # no-op, does not raise

    mesh = make_global_mesh(model=2)
    assert mesh.shape == {"data": 4, "model": 2}
    # model axis must stay intra-process
    for row in mesh.devices:
        assert len({d.process_index for d in row}) == 1
    with pytest.raises(ValueError):
        make_global_mesh(model=3)  # does not divide 8 per-process


def test_sharded_band_render_matches_single():
    """The OPTIMIZED multi-chip frame path (prepass + proxy survivor
    selection + one while_loop program per scanline band, VERDICT r4
    next #4) must reproduce the single-device optimized frame.

    tau carve off: its 3x3 block-neighborhood max is band-local in the
    sharded path (edge-clamped at band boundaries), which could cull
    differently within one block row at the seam."""
    import dataclasses

    from nerf_texture_tpu.data.synthetic import SyntheticSphereDataset
    from nerf_texture_tpu.models import ngp
    from nerf_texture_tpu.models.ngp import NGPConfig
    from nerf_texture_tpu.parallel import make_mesh
    from nerf_texture_tpu.parallel.eval import render_image_sharded
    from nerf_texture_tpu.parallel.sharding import replicated
    from nerf_texture_tpu.render.renderer import (RenderConfig,
                                                  render_image)
    from nerf_texture_tpu.train.trainer import (TrainConfig, Trainer,
                                                ngp_field_apply)

    ds = SyntheticSphereDataset(n_frames=2, H=48, W=48)
    mcfg = NGPConfig(bound=1.0, num_levels=4, level_dim=2,
                     log2_bricks=10, desired_resolution=64,
                     hidden_dim=32, hidden_dim_color=32)
    rcfg = RenderConfig(bound=1.0, cascades=1, grid_size=16,
                        max_steps=32, max_samples_train=24,
                        max_samples_infer=16, ray_chunk=512,
                        pool_mean_samples=16, pool_mean_samples_infer=8,
                        proxy_samples=0, proxy_refined=8,
                        infer_color_cap=4, prepass_block=4,
                        prepass_tau_cull=0.0)
    tcfg = TrainConfig(lr=1e-2, total_steps=60, num_rays=256,
                       grid_update_interval=8)
    tr = Trainer(ds, mcfg, rcfg, tcfg, key=jax.random.PRNGKey(3))
    tr.train(40)          # realistic carved occupancy + density grid
    params, occ = tr.state.params, tr.state.occ.occ
    density = tr.state.occ.density

    single = render_image(ngp_field_apply, mcfg, params, occ,
                          ds.poses[0], ds.intrinsics, 48, 48, rcfg,
                          density=density)

    mesh = make_mesh(data=4, model=1)
    rep = replicated(mesh)
    params_s = jax.device_put(params, rep)
    occ_s = jax.device_put(occ, rep)
    dens_s = jax.device_put(density, rep)
    sharded = render_image_sharded(ngp_field_apply, mcfg, params_s,
                                   occ_s, ds.poses[0], ds.intrinsics,
                                   48, 48, rcfg, mesh, density=dens_s)
    np.testing.assert_allclose(np.asarray(sharded["image"]),
                               np.asarray(single["image"]), atol=2e-4)
    np.testing.assert_allclose(np.asarray(sharded["weights_sum"]),
                               np.asarray(single["weights_sum"]),
                               atol=2e-4)


def test_curved_sharded_band_render_matches_single():
    """The optimized band path also serves the curved flagship (anchor
    table + proxy selection per band)."""
    import dataclasses

    from nerf_texture_tpu.data.synthetic import SyntheticSphereDataset
    from nerf_texture_tpu.geometry.mesh import make_icosphere
    from nerf_texture_tpu.geometry.projector import MeshProjector
    from nerf_texture_tpu.models import mesh_field
    from nerf_texture_tpu.models.curved_field import CurvedFieldConfig
    from nerf_texture_tpu.models.mesh_field import MeshFieldConfig
    from nerf_texture_tpu.parallel import make_mesh
    from nerf_texture_tpu.parallel.eval import render_image_sharded
    from nerf_texture_tpu.parallel.sharding import replicated
    from nerf_texture_tpu.render.renderer import render_image
    from nerf_texture_tpu.train.curved_trainer import (
        CurvedTrainConfig, CurvedTrainer, curved_anchor_apply,
        curved_field_apply)

    ds = SyntheticSphereDataset(n_frames=2, H=48, W=48)
    fcfg = MeshFieldConfig(num_levels=3, level_dim=2, base_resolution=16,
                           desired_resolution=32, log2_bricks=9,
                           h_threshold=0.15, clustering=False)
    ccfg = CurvedFieldConfig(field=fcfg, light_model="SH",
                             hidden_dim=16, geo_feat_dim=7)
    rcfg = RenderConfig(bound=1.0, cascades=1, grid_size=16, max_steps=32,
                        max_samples_train=24, max_samples_infer=16,
                        ray_chunk=512, pool_mean_samples=16,
                        pool_mean_samples_infer=8, proxy_samples=0,
                        proxy_refined=8, infer_color_cap=4,
                        prepass_block=4, prepass_tau_cull=0.0)
    tcfg = CurvedTrainConfig(lr=5e-3, total_steps=60, num_rays=128,
                             grid_update_interval=8, grid_full_updates=2)
    mp = MeshProjector(make_icosphere(2, radius=0.5))
    tr = CurvedTrainer(ds, mesh_field.make_state(mp), ccfg, rcfg, tcfg,
                       key=jax.random.PRNGKey(0))
    tr.train(24)

    static = (tr.ccfg, tr.mode, "RGB", "Full")
    bundle = {"params": tr.state.params, "field_state": tr.field_state,
              "rt": tr.runtime, "anchor_tab": tr._anchor_table()}
    occ = tr.state.occ.occ
    density = tr.state.occ.density
    single = render_image(curved_field_apply, static, bundle, occ,
                          ds.poses[0], ds.intrinsics, 48, 48, rcfg,
                          anchor_apply=curved_anchor_apply,
                          density=density)

    mesh = make_mesh(data=4, model=1)
    rep = replicated(mesh)
    bundle_s = jax.device_put(bundle, rep)
    sharded = render_image_sharded(curved_field_apply, static, bundle_s,
                                   jax.device_put(occ, rep),
                                   ds.poses[0], ds.intrinsics, 48, 48,
                                   rcfg, mesh,
                                   anchor_apply=curved_anchor_apply,
                                   density=jax.device_put(density, rep))
    np.testing.assert_allclose(np.asarray(sharded["image"]),
                               np.asarray(single["image"]), atol=2e-4)
