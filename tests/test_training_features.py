"""Prove the defaults-off training features earn their keep (VERDICT r4
next #8): error-map sampling, camera optimization, and distillation must
each demonstrably do their job, not merely run.

Reference behaviors being certified: error-map EMA importance sampling
(/root/reference/nerf/utils.py:622-632, 192-208), trainable camera
deltas (/root/reference/nerf/provider.py:375-410), teacher distillation
(/root/reference/nerf/utils.py:572-598)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = [pytest.mark.slow, pytest.mark.nightly]

from nerf_texture_tpu.data.synthetic import SyntheticSphereDataset
from nerf_texture_tpu.geometry.mesh import make_icosphere
from nerf_texture_tpu.geometry.projector import MeshProjector
from nerf_texture_tpu.models import mesh_field
from nerf_texture_tpu.models.curved_field import CurvedFieldConfig
from nerf_texture_tpu.models.mesh_field import MeshFieldConfig
from nerf_texture_tpu.render.renderer import RenderConfig
from nerf_texture_tpu.train.curved_trainer import (CurvedTrainConfig,
                                                   CurvedTrainer)

FCFG = MeshFieldConfig(num_levels=3, level_dim=2, base_resolution=16,
                       desired_resolution=64, log2_bricks=10,
                       h_threshold=0.12, clustering=False,
                       prob_model=False)
CCFG = CurvedFieldConfig(field=FCFG, light_model="None", hidden_dim=16,
                         geo_feat_dim=7, dir_degree=2)
RCFG = RenderConfig(bound=1.0, cascades=1, grid_size=16, max_steps=48,
                    max_samples_train=24, max_samples_infer=32,
                    ray_chunk=1024, pool_mean_samples=16,
                    pool_mean_samples_infer=16)


def _trainer(tcfg, n_frames=3, H=48, seed=0, teacher=None):
    ds = SyntheticSphereDataset(n_frames=n_frames, H=H, W=H)
    mp = MeshProjector(make_icosphere(2, radius=0.5))
    tr = CurvedTrainer(ds, mesh_field.make_state(mp), CCFG, RCFG, tcfg,
                       key=jax.random.PRNGKey(seed), teacher=teacher)
    return tr, ds


def test_error_map_sampling_improves_psnr_per_step():
    """At equal steps, error-map importance sampling must not lose to
    uniform sampling, and must concentrate rays on the high-error
    region (the sphere covers ~20% of the frame, so uniform sampling
    wastes most rays on the already-fit white background)."""
    base = CurvedTrainConfig(lr=5e-3, total_steps=400, num_rays=128,
                             grid_update_interval=8, grid_full_updates=2,
                             scan_steps=1)
    import dataclasses
    scores = {}
    for name, em in (("uniform", False), ("error_map", True)):
        tcfg = dataclasses.replace(base, error_map=em)
        tr, ds = _trainer(tcfg)
        tr.train(240)
        scores[name] = tr.eval_psnr([0], use_ema=False)
    # the error map itself must have learned structure: higher error
    # mass where the object is (center) than the corners
    em = np.asarray(tr.state.error_map)[0].reshape(128, 128)
    center = em[32:96, 32:96].mean()
    corners = np.concatenate([em[:16, :16].ravel(), em[:16, -16:].ravel(),
                              em[-16:, :16].ravel(),
                              em[-16:, -16:].ravel()]).mean()
    assert center > corners, (center, corners)
    assert scores["error_map"] > scores["uniform"] - 0.3, scores


def test_camera_optimization_recovers_perturbed_pose():
    """Deliberately perturb one training pose; with optimize_camera the
    learned per-frame rotation delta must counteract it (the reference's
    trainable dRs/dts closure, nerf/provider.py:375-410)."""
    from nerf_texture_tpu.utils.transforms import axis_angle_to_matrix

    import dataclasses

    # STAGED experiment -- pose recovery is only identifiable once the
    # field is pinned by the other frames (joint from-scratch camera+
    # field optimization at toy scale lets the field absorb the pose
    # error instead; measured: deltas drift noise-like on all frames).
    # Stage 1: fit the field on TRUE poses without camera opt.
    t1 = CurvedTrainConfig(lr=5e-3, total_steps=1600, num_rays=256,
                           grid_update_interval=8, grid_full_updates=2,
                           scan_steps=1)
    tr1, ds = _trainer(t1, n_frames=4, H=64)
    tr1.train(500)

    # Stage 2: same scene, camera deltas ON (reg weight 0: the
    # reference's 1e2+ clamp outweighs toy-scale photometric gradients),
    # frame 1's stored pose rotated by a known angle while its image
    # stays at the true pose -- only the delta can re-fit it.
    t2 = dataclasses.replace(t1, optimize_camera=True,
                             camera_reg_weight=0.0)
    tr2, _ = _trainer(t2, n_frames=4, H=64)
    merged = {**tr2.state.params, **tr1.state.params}
    tr2.state = tr2.state._replace(
        params=merged,
        ema_params={**tr2.state.ema_params, **tr1.state.ema_params},
        occ=tr1.state.occ)
    aa = np.asarray([0.0, 0.05, 0.0], np.float32)        # ~2.9 degrees
    R_pert = np.asarray(axis_angle_to_matrix(jnp.asarray(aa)))
    poses = np.asarray(tr2.dataset.poses).copy()
    poses[1][:3, :3] = R_pert @ poses[1][:3, :3]
    tr2.dataset.poses = poses
    tr2.poses = jnp.asarray(poses)
    tr2.train(500)
    dR = np.asarray(tr2.state.params["camera"]["dRs"])
    # effective rotation is dR @ R_stored = dR @ R_pert @ R_true
    # (_apply_camera_deltas): recovery drives dR toward R_pert^-1
    R_learn = np.asarray(axis_angle_to_matrix(jnp.asarray(dR[1])))
    resid = R_learn @ R_pert
    ang_before = np.degrees(np.arccos(np.clip(
        (np.trace(R_pert) - 1) / 2, -1, 1)))
    ang_after = np.degrees(np.arccos(np.clip(
        (np.trace(resid) - 1) / 2, -1, 1)))
    assert ang_after < ang_before * 0.7, (ang_before, ang_after)


def test_distillation_transfers_teacher_density_early():
    """Distillation's job is injecting the coarse NGP teacher's density
    field into the curved model early (reference distill branch,
    nerf/utils.py:572-598: sigma-remap MSE against the frozen teacher,
    prob 0.75).  Proof: after a short schedule, the distilled model's
    remapped sigma agrees with the teacher's far better than the plain
    model's does on probe points around the shell."""
    import dataclasses

    from nerf_texture_tpu.models import curved_field, ngp
    from nerf_texture_tpu.models.ngp import NGPConfig
    from nerf_texture_tpu.train.trainer import TrainConfig, Trainer

    ds = SyntheticSphereDataset(n_frames=3, H=48, W=48)
    nmcfg = NGPConfig(bound=1.0, num_levels=4, level_dim=2,
                      log2_bricks=10, desired_resolution=64,
                      hidden_dim=32, hidden_dim_color=32)
    ntr = Trainer(ds, nmcfg, RCFG,
                  TrainConfig(lr=1e-2, total_steps=400, num_rays=256,
                              grid_update_interval=8),
                  key=jax.random.PRNGKey(7))
    ntr.train(300)                                   # converged teacher
    teacher = (ntr.state.params, nmcfg)

    # probe points around the template shell
    rng = np.random.default_rng(5)
    dirs = rng.normal(size=(1024, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    probes = jnp.asarray(
        (dirs * (0.5 + rng.uniform(-0.08, 0.08, (1024, 1))))
        .astype(np.float32))
    d0 = jnp.zeros_like(probes).at[:, 2].set(1.0)
    # the distill loss matches 1 - exp(-sigma), lambda = 1
    # (nerf/utils.py:595-596): measure agreement in the SAME remap
    remap1 = lambda s: 1.0 - np.exp(-np.asarray(s, np.float64))
    sig_t = remap1(ngp.forward(teacher[0], probes, d0, nmcfg)[0])

    base = CurvedTrainConfig(lr=5e-3, total_steps=400, num_rays=128,
                             grid_update_interval=8, grid_full_updates=2,
                             scan_steps=1, distillation=True,
                             distillation_prob=1.0)   # pure mechanism
    tr, _ = _trainer(base, teacher=teacher)

    def probe_remap():
        sig_c, _ = curved_field.density(tr.state.params, tr.field_state,
                                        probes, tr.ccfg, tr.runtime)
        return remap1(sig_c)

    err0 = float(np.mean((probe_remap() - sig_t) ** 2))   # fresh init
    tr.train(300)
    rc = probe_remap()
    err1 = float(np.mean((rc - sig_t) ** 2))
    # the teacher's alpha field transferred: error drops (measured
    # 0.24 -> ~0.15; trunc_exp sigma climbs slowly under the saturating
    # lambda=1 target, so full convergence takes ~1k steps) ...
    assert np.isfinite(err1)
    assert err1 < err0 * 0.75, (err0, err1)
    # ... and, decisively, the teacher's GEOMETRY is in the student:
    # high alpha where the teacher is solid, low where it is empty
    sel_in = sig_t > 0.5
    sel_out = sig_t < 0.1
    assert sel_in.sum() > 50 and sel_out.sum() > 50
    r_in = float(rc[sel_in].mean())
    r_out = float(rc[sel_out].mean())
    assert r_in > r_out + 0.25, (r_in, r_out)
