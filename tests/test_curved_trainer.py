"""End-to-end smoke test: curved-field model trains on the sphere scene."""

import numpy as np
import jax

from nerf_texture_tpu.data.synthetic import SyntheticSphereDataset
from nerf_texture_tpu.geometry.mesh import make_icosphere
from nerf_texture_tpu.geometry.projector import MeshProjector
from nerf_texture_tpu.models import mesh_field
from nerf_texture_tpu.models.curved_field import CurvedFieldConfig
from nerf_texture_tpu.models.mesh_field import MeshFieldConfig
from nerf_texture_tpu.render.renderer import RenderConfig
from nerf_texture_tpu.train.curved_trainer import (CurvedTrainConfig,
                                                   CurvedTrainer)

import pytest

pytestmark = pytest.mark.slow

FCFG = MeshFieldConfig(num_levels=3, level_dim=2, base_resolution=16,
                       desired_resolution=32, log2_bricks=9,
                       h_threshold=0.12, clustering=False)
CCFG = CurvedFieldConfig(field=FCFG, light_model="SH", hidden_dim=16,
                         geo_feat_dim=7)
RCFG = RenderConfig(bound=1.0, cascades=1, grid_size=16, max_steps=48,
                    max_samples_train=24, max_samples_infer=32,
                    ray_chunk=1024, pool_mean_samples=16,
                    pool_mean_samples_infer=16)
TCFG = CurvedTrainConfig(lr=5e-3, total_steps=200, num_rays=64,
                         grid_update_interval=8, grid_full_updates=4)


def test_curved_trainer_smoke():
    ds = SyntheticSphereDataset(n_frames=4, H=32, W=32)
    mp = MeshProjector(make_icosphere(2, radius=0.5))
    state = mesh_field.make_state(mp)
    tr = CurvedTrainer(ds, state, CCFG, RCFG, TCFG,
                       key=jax.random.PRNGKey(0))
    m = tr.train(12)
    assert np.isfinite(m["loss"])
    m2 = tr.train(12)
    assert np.isfinite(m2["loss"])
    out = tr.render_frame(ds.poses[0], use_ema=False)
    img = np.asarray(out["image"])
    assert img.shape == (32, 32, 3)
    assert np.isfinite(img).all()
    # visual modes render
    tr.visual_mode = "Nc"
    out2 = tr.render_frame(ds.poses[0], use_ema=False)
    assert np.isfinite(np.asarray(out2["image"])).all()


def test_curved_trainer_gamma_and_camera():
    ds = SyntheticSphereDataset(n_frames=3, H=24, W=24)
    mp = MeshProjector(make_icosphere(1, radius=0.5))
    state = mesh_field.make_state(mp)
    tcfg = CurvedTrainConfig(lr=5e-3, total_steps=100, num_rays=32,
                             grid_update_interval=8, grid_full_updates=2,
                             optimize_camera=True, optimize_gamma=True,
                             error_map=True)
    tr = CurvedTrainer(ds, state, CCFG, RCFG, tcfg,
                       key=jax.random.PRNGKey(1))
    m = tr.train(6)
    assert np.isfinite(m["loss"])
    # camera deltas got gradients (moved off exactly zero)
    cam = tr.state.params["camera"]
    total = sum(float(abs(np.asarray(v)).sum()) for v in cam.values())
    assert total > 0
    # error map was updated away from all-ones
    em = np.asarray(tr.state.error_map)
    assert (em != 1.0).any()


def test_color_from_aux_matches_forward():
    """Two-phase aux shading == full forward colors (frames fast path)."""
    import jax.numpy as jnp

    from nerf_texture_tpu.models import curved_field
    from nerf_texture_tpu.geometry import projector as proj

    mp = MeshProjector(make_icosphere(2, radius=0.5))
    state = mesh_field.make_state(mp)
    params = curved_field.init(jax.random.PRNGKey(0), CCFG)

    rng = np.random.default_rng(1)
    n = 128
    # points near the sphere shell
    dirs = rng.normal(size=(n, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    x = jnp.asarray((dirs * rng.uniform(0.45, 0.55, (n, 1))),
                    jnp.float32)
    d = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    frames = proj.seed_anchor_frames(state.projector, x,
                                     jnp.ones((n,), bool))
    sigma_f, color_f, _ = curved_field.forward(
        params, state, x, d, CCFG, training=False, visual_mode="RGB",
        frames=frames)
    sigma_a, aux = curved_field.sigma_with_aux(params, state, x, d, CCFG,
                                               frames=frames)
    color_a = curved_field.color_from_aux(params, state, x, d, aux, CCFG,
                                          None, frames)
    np.testing.assert_allclose(np.asarray(sigma_a), np.asarray(sigma_f),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(color_a), np.asarray(color_f),
                               atol=1e-5)


def test_pred_normal_off_config():
    """pred_normal=False configs must init/forward/regularize (the lip
    regularizer used to assume the normal net always exists)."""
    import dataclasses

    import jax.numpy as jnp

    from nerf_texture_tpu.models import curved_field
    from nerf_texture_tpu.models.mesh_field import MeshFieldConfig

    ccfg = dataclasses.replace(CCFG, field=MeshFieldConfig(
        num_levels=2, level_dim=2, base_resolution=16,
        desired_resolution=32, log2_bricks=8, pred_normal=False))
    mp = MeshProjector(make_icosphere(1, radius=0.5))
    state = mesh_field.make_state(mp)
    params = curved_field.init(jax.random.PRNGKey(0), ccfg)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(8, 3)) * 0.3,
                    jnp.float32)
    d = jnp.asarray([[0.0, 0.0, 1.0]] * 8)
    sigma, color, _ = curved_field.forward(params, state, x, d, ccfg)
    assert sigma.shape == (8,)
    loss = curved_field.regular_loss(params, ccfg, jnp.asarray(0))
    assert np.isfinite(float(loss))


def test_anchored_grid_refresh_matches_exact():
    """The anchor-table grid refresh (one gather per cell) must mark the
    same occupancy as the exact projection-chain refresh on the sphere
    template, modulo tangent-plane error at the shell fringe."""
    import jax.numpy as jnp

    from nerf_texture_tpu.geometry.projector import build_anchor_table
    from nerf_texture_tpu.models import curved_field
    from nerf_texture_tpu.train.curved_trainer import (compute_near_cells,
                                                       curved_grid_step,
                                                       init_state)

    mp = MeshProjector(make_icosphere(2, radius=0.5))
    state = mesh_field.make_state(mp)
    tst = init_state(jax.random.PRNGKey(0), CCFG, RCFG, TCFG, 1)
    near = compute_near_cells(np.asarray(mp.arrays.vertices),
                              RCFG.grid_size, RCFG.bound,
                              FCFG.h_threshold)
    cell = 2.0 * RCFG.bound / RCFG.grid_size
    tab = build_anchor_table(mp.arrays, RCFG.grid_size, RCFG.bound,
                             k=FCFG.k,
                             max_dist=4.0 * FCFG.h_threshold + 2.0 * cell)
    key = jax.random.PRNGKey(7)
    exact = curved_grid_step(tst, state, key, ccfg=CCFG, rcfg=RCFG,
                             near_cells=near)
    fast = curved_grid_step(tst, state, key, ccfg=CCFG, rcfg=RCFG,
                            near_cells=near, anchor_tab=tab)
    occ_e = np.asarray(exact.occ.occ).astype(bool)
    occ_f = np.asarray(fast.occ.occ).astype(bool)
    # identical on >=95% of cells; every exact-occupied cell's 3^3
    # neighborhood contains a fast-occupied cell (no silhouette holes)
    agree = (occ_e == occ_f).mean()
    assert agree > 0.95, agree
    H = RCFG.grid_size
    ge = occ_e.reshape(H, H, H)
    gf = occ_f.reshape(H, H, H)
    dil = gf.copy()
    for ax in range(3):
        dil |= np.roll(dil, 1, axis=ax) | np.roll(dil, -1, axis=ax)
    assert (dil | ~ge).all()


def test_scan_matches_sequential_steps():
    """curved_train_scan(K) == K sequential per-step calls with the same
    frames/keys (bitwise, modulo float assoc)."""
    import jax.numpy as jnp

    from nerf_texture_tpu.train.curved_trainer import (
        _curved_train_step_body, curved_train_scan, init_state)

    ds = SyntheticSphereDataset(n_frames=3, H=24, W=24)
    mp = MeshProjector(make_icosphere(1, radius=0.5))
    state = mesh_field.make_state(mp)
    tst = init_state(jax.random.PRNGKey(0), CCFG, RCFG, TCFG, 3)
    tst = tst._replace(occ=tst.occ._replace(
        occ=jnp.ones_like(tst.occ.occ)))
    poses = jnp.asarray(ds.poses)
    images = jnp.asarray(ds.images)
    intr = jnp.asarray(ds.intrinsics)
    frames = jnp.asarray([0, 2])
    # the scan takes ONE key and splits per-step inside the program;
    # the sequential reference must split the same way
    k_scan = jax.random.PRNGKey(5)
    keys = jax.random.split(k_scan, 2)

    kw = dict(ccfg=CCFG, rcfg=RCFG, tcfg=TCFG, H=24, W=24, mode="none")
    st_seq = tst
    for i in range(2):
        st_seq, m_seq = _curved_train_step_body(
            st_seq, state, poses, images, intr, frames[i], keys[i], **kw)
    st_scan, m_scan = curved_train_scan(tst, state, poses, images, intr,
                                        frames, k_scan, **kw)
    np.testing.assert_allclose(float(m_scan["loss"]),
                               float(m_seq["loss"]), rtol=1e-4)
    a = jax.tree.leaves(st_seq.params)
    b = jax.tree.leaves(st_scan.params)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   atol=2e-5)


def test_visual_modes_and_euler():
    """UV/Tan/Btan produce images distinct from the 'normal' display,
    and euler light rotation changes the shaded RGB image without
    recompiling on slider ticks (VERDICT r3 #3;
    nerf/network_curvedfield.py:304-308,356-394)."""
    import logging

    ds = SyntheticSphereDataset(n_frames=2, H=24, W=24)
    mp = MeshProjector(make_icosphere(2, radius=0.5))
    state = mesh_field.make_state(mp)
    tr = CurvedTrainer(ds, state, CCFG, RCFG, TCFG,
                       key=jax.random.PRNGKey(2))
    tr.train(16)   # past grid refreshes so the sphere shell is occupied
    pose = ds.poses[0]

    imgs = {}
    for mode in ["normal", "UV", "Tan", "Btan"]:
        tr.visual_mode = mode
        img = np.asarray(tr.render_frame(pose, use_ema=False)["image"])
        assert np.isfinite(img).all(), mode
        imgs[mode] = img
    # the sphere must actually be in frame (not all background)
    assert np.abs(imgs["normal"] - 1.0).max() > 0.05
    for mode in ["UV", "Tan", "Btan"]:
        diff = np.abs(imgs[mode] - imgs["normal"]).max()
        assert diff > 0.05, (mode, diff)
    # Tan and Btan are different rows of the frame
    assert np.abs(imgs["Tan"] - imgs["Btan"]).max() > 0.05

    # euler rotation changes the shaded image -- the SH environment
    # inits DC-only (isotropic), so make it directional first
    import jax.numpy as jnp
    params = dict(tr.state.params)
    light = dict(params["light"])
    env = light["env_shs"]
    light["env_shs"] = env.at[1:4].set(
        jnp.asarray([[1.5], [0.8], [-1.0]], env.dtype))
    params["light"] = light
    tr.state = tr.state._replace(params=params)
    tr.visual_mode = "RGB"
    base = np.asarray(tr.render_frame(pose, use_ema=False)["image"])
    tr.euler = np.array([0.0, 0.0, 1.2], np.float32)
    rot = np.asarray(tr.render_frame(pose, use_ema=False)["image"])
    assert np.abs(base - rot).max() > 1e-3
    # ... euler=0 through the same (rotated) path reproduces base ...
    tr.euler = np.zeros(3, np.float32)
    rot0 = np.asarray(tr.render_frame(pose, use_ema=False)["image"])
    np.testing.assert_allclose(rot0, base, atol=1e-4)

    # ... and slider ticks stay traced: no new programs compile
    class _Counter(logging.Handler):
        def __init__(self):
            super().__init__()
            self.names = []

        def emit(self, rec):
            msg = rec.getMessage()
            if msg.startswith("Compiling "):
                self.names.append(msg.split()[1])

    counter = _Counter()
    loggers = [logging.getLogger("jax._src.interpreters.pxla"),
               logging.getLogger("jax._src.dispatch")]
    old = [lg.level for lg in loggers]
    try:
        jax.config.update("jax_log_compiles", True)
        for lg in loggers:
            lg.setLevel(logging.WARNING)
            lg.addHandler(counter)
        tr.euler = np.array([0.3, -0.2, 0.7], np.float32)
        jax.block_until_ready(
            tr.render_frame(pose, use_ema=False)["image"])
    finally:
        jax.config.update("jax_log_compiles", False)
        for lg, lv in zip(loggers, old):
            lg.removeHandler(counter)
            lg.setLevel(lv)
    assert not counter.names, counter.names


def test_two_phase_color_matches_one_pass():
    """color_from_aux (aux-cached survivor shading) must render the
    same image as the one-pass full forward, for RGB and the non-RGB
    visual modes it now covers (VERDICT r3 next #4)."""
    import dataclasses

    from nerf_texture_tpu.render.renderer import render_image
    from nerf_texture_tpu.train.curved_trainer import (
        _use_frames, curved_anchor_apply, curved_color_apply,
        curved_field_apply, curved_sigma_apply)

    ds = SyntheticSphereDataset(n_frames=2, H=24, W=24)
    mp = MeshProjector(make_icosphere(2, radius=0.5))
    tr = CurvedTrainer(ds, mesh_field.make_state(mp), CCFG, RCFG, TCFG,
                       key=jax.random.PRNGKey(3))
    tr.train(16)
    pose = np.asarray(ds.poses[0])

    def render(visual_mode, two_phase, rcfg):
        tr.visual_mode = visual_mode
        static = (tr.ccfg, tr.mode, visual_mode, tr.light_visual_mode)
        bundle = {"params": tr.state.params,
                  "field_state": tr.field_state, "rt": tr.runtime}
        assert _use_frames(tr.ccfg, tr.mode)
        if tr.anchor_cache:
            bundle["anchor_tab"] = tr._anchor_table()
        return render_image(
            curved_field_apply, static, bundle, tr.state.occ.occ, pose,
            tr.intrinsics, tr.H, tr.W, rcfg, bg_color=1.0,
            anchor_apply=curved_anchor_apply,
            sigma_apply=curved_sigma_apply,
            color_apply=curved_color_apply if two_phase else None,
            density=tr.state.occ.density)

    for infer_mode in ("pool", "proxy"):
        rcfg = dataclasses.replace(tr.rcfg, infer_mode=infer_mode)
        for vm in ("RGB", "normal", "Nf", "Nc", "UV"):
            a = np.asarray(render(vm, True, rcfg)["image"])
            b = np.asarray(render(vm, False, rcfg)["image"])
            assert np.isfinite(a).all() and np.isfinite(b).all(), vm
            # identical samples, identical math -> tight tolerance;
            # UV's one-pass replaces the sigma mask too, so compare
            # loosely there (visual-only divergence, documented)
            tol = 0.12 if vm == "UV" else 2e-3
            assert np.abs(a - b).max() < tol, (infer_mode, vm,
                                               np.abs(a - b).max())
