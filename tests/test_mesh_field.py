"""MeshFeatureField + curved-field model + light models."""

import numpy as np
import jax
import pytest
import jax.numpy as jnp

from nerf_texture_tpu.geometry.mesh import make_icosphere, make_plane
from nerf_texture_tpu.geometry.projector import (MeshProjector,
                                                 pointcloud_arrays)
from nerf_texture_tpu.models import curved_field, mesh_field
from nerf_texture_tpu.models.mesh_field import (FieldRuntime,
                                                MeshFieldConfig)
from nerf_texture_tpu.models.lights import sh as sh_light
from nerf_texture_tpu.models.lights import sg as sg_light
from nerf_texture_tpu.models.lights import envmap as envmap_light

CFG = MeshFieldConfig(num_levels=4, level_dim=2, base_resolution=32,
                      desired_resolution=64, log2_bricks=10,
                      h_threshold=0.15)


def make_field_state():
    mp = MeshProjector(make_icosphere(2, radius=0.6))
    return mesh_field.make_state(mp)


def sphere_points(n=64, lo=0.55, hi=0.72, seed=0):
    rng = np.random.default_rng(seed)
    dirs = rng.normal(size=(n, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    return jnp.asarray(dirs * rng.uniform(lo, hi, (n, 1)), jnp.float32)


def test_field_none_mode_shapes_and_mask():
    state = make_field_state()
    params = mesh_field.init(jax.random.PRNGKey(0), CFG)
    x = sphere_points()
    out = mesh_field.apply(params, state, x, CFG,
                           key=jax.random.PRNGKey(1))
    assert out.embed.shape == (64, CFG.embed_dim)
    assert out.normal_coarse.shape == (64, 3)
    assert out.normal_fine.shape == (64, 3)
    assert np.asarray(out.h_mask).all()  # all points within the shell
    # far points masked out
    far = jnp.asarray([[0.0, 0.0, 0.95]])
    out_far = mesh_field.apply(params, state, far, CFG,
                               key=jax.random.PRNGKey(1))
    assert not bool(out_far.h_mask[0])
    # normals are unit
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out.normal_fine), axis=-1), 1.0,
        atol=1e-3)


def test_field_regularizers():
    params = mesh_field.init(jax.random.PRNGKey(0), CFG)
    kl = mesh_field.kl_loss(params, CFG)
    assert float(kl) >= 0.0
    cl = mesh_field.clustering_loss(params, CFG)
    assert np.isfinite(float(cl))


def test_field_mode_flat_canvas():
    state = make_field_state()
    H = W = 16
    rng = np.random.default_rng(2)
    imported = mesh_field.import_field_data(
        features=rng.normal(size=(H, W, CFG.encoder_f_out_dim)),
        sample_tbn=np.eye(3).reshape(1, 9),
        sample_tbn_ids=np.zeros((H, W), np.int32),
        local_tbn=np.tile(np.eye(3).reshape(1, 1, 9), (H, W, 1)),
        phi_embed=rng.normal(size=(H, W, 8)),
        bounds=[0.5, 0.5])
    state = state._replace(imported=imported)
    params = mesh_field.init(jax.random.PRNGKey(0), CFG)
    x = jnp.asarray([[0.1, 0.2, 0.02], [0.0, 0.0, 0.5],
                     [0.9, 0.0, 0.0]], jnp.float32)
    out = mesh_field.apply(params, state, x, CFG, mode="field",
                           no_noise=True)
    mask = np.asarray(out.h_mask)
    assert mask[0]          # inside canvas + shell
    assert not mask[1]      # |h| > threshold
    assert not mask[2]      # outside canvas bounds
    # flat mode coarse normal is +z
    np.testing.assert_allclose(np.asarray(out.normal_coarse[0]),
                               [0, 0, 1], atol=1e-4)


def test_patch_mode():
    state = make_field_state()
    plane = make_plane(12, size=0.5)
    pts = plane.vertices
    normals = np.tile([[0.0, 0.0, 1.0]], (len(pts), 1))
    rng = np.random.default_rng(3)
    imported = mesh_field.import_patch_data(
        features=rng.normal(size=(len(pts), CFG.encoder_f_out_dim)),
        local_tbn=np.tile(np.eye(3).reshape(1, 9), (len(pts), 1)),
        phi_embed=rng.normal(size=(len(pts), 8)))
    pc = pointcloud_arrays(pts, normals)
    state = state._replace(projector_imported=pc, imported=imported)
    params = mesh_field.init(jax.random.PRNGKey(0), CFG)
    # first query directly above a sample point (the direct_above_check
    # rejects points whose nearest samples are mostly sideways)
    vx = float(pts[76][0])
    vy = float(pts[76][1])
    x = jnp.asarray([[vx, vy, 0.03], [0.0, 0.0, 2.0]], jnp.float32)
    out = mesh_field.apply(params, state, x, CFG, mode="patch",
                           no_noise=True)
    mask = np.asarray(out.h_mask)
    assert mask[0] and not mask[1]


@pytest.mark.slow
def test_curved_field_forward_and_normal_supervision():
    cfg = curved_field.CurvedFieldConfig(field=CFG, light_model="SH")
    state = make_field_state()
    params = curved_field.init(jax.random.PRNGKey(0), cfg)
    x = sphere_points(32)
    d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (32, 1))
    sigma, color, extras = curved_field.forward(
        params, state, x, d, cfg, key=jax.random.PRNGKey(1),
        training=True)
    assert sigma.shape == (32,)
    assert color.shape == (32, 3)
    assert "normal" in extras and "normal_grad" in extras
    assert np.isfinite(np.asarray(extras["normal_grad"])).all()
    assert (np.asarray(color) >= 0).all()

    # gradient of a simple loss flows to all param groups
    def loss(p):
        s, c, e = curved_field.forward(p, state, x, d, cfg,
                                       key=jax.random.PRNGKey(1),
                                       training=True)
        return (jnp.mean((c - 0.5) ** 2) + jnp.mean(s)
                + jnp.mean((e["normal"] - e["normal_grad"]) ** 2))

    g = jax.grad(loss)(params)
    for name in ["sigma_net", "light", "field"]:
        leafsum = sum(float(jnp.sum(jnp.abs(l)))
                      for l in jax.tree_util.tree_leaves(g[name]))
        assert leafsum > 0, name


def test_curved_field_static_color_net():
    cfg = curved_field.CurvedFieldConfig(field=CFG, light_model="None")
    state = make_field_state()
    params = curved_field.init(jax.random.PRNGKey(0), cfg)
    x = sphere_points(16)
    d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (16, 1))
    sigma, color, extras = curved_field.forward(
        params, state, x, d, cfg, key=jax.random.PRNGKey(2),
        training=True)
    assert (np.asarray(color) <= 1).all() and (np.asarray(color) >= 0).all()


def light_inputs(n=32, seed=0):
    rng = np.random.default_rng(seed)
    geo = jnp.asarray(rng.normal(size=(n, 15)), jnp.float32)
    nrm = rng.normal(size=(n, 3))
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    view = rng.normal(size=(n, 3))
    view /= np.linalg.norm(view, axis=-1, keepdims=True)
    return geo, jnp.asarray(nrm, jnp.float32), jnp.asarray(view,
                                                           jnp.float32)


def test_sh_light_model():
    cfg = sh_light.SHLightConfig()
    params = sh_light.init(jax.random.PRNGKey(0), cfg)
    geo, nrm, view = light_inputs()
    full, spec, dif, alb = sh_light.apply(params, geo, nrm, view, cfg)
    for t in (full, spec, dif, alb):
        assert t.shape == (32, 3)
        assert np.isfinite(np.asarray(t)).all()
    assert (np.asarray(full) >= 0).all()
    # ambient-only init light: diffuse should be > 0
    assert float(jnp.mean(dif)) > 0


def test_sg_light_model():
    cfg = sg_light.SGLightConfig(num_lgt_sgs=4)
    params = sg_light.init(jax.random.PRNGKey(0), cfg)
    geo, nrm, view = light_inputs(seed=1)
    full, spec, dif, alb = sg_light.apply(params, geo, nrm, -view, cfg)
    for t in (full, spec, dif, alb):
        assert t.shape == (32, 3)
        assert np.isfinite(np.asarray(t)).all()
    assert (np.asarray(full) >= 0).all()


def test_envmap_light_model():
    cfg = envmap_light.EnvmapLightConfig(env_res=8)
    params = envmap_light.init(jax.random.PRNGKey(0), cfg)
    geo, nrm, view = light_inputs(seed=2)
    full, spec, dif, alb = envmap_light.apply(params, geo, nrm, view, cfg,
                                              normal_coarse=nrm)
    for t in (full, spec, dif, alb):
        assert t.shape == (32, 3)
        assert np.isfinite(np.asarray(t)).all()


def test_sh_envmap_roundtrip():
    """envmap -> SH projection reproduces a smooth envmap."""
    H, W = 32, 64
    theta = (np.arange(H) + 0.5) / H * np.pi
    phi = (np.arange(W) + 0.5) / W * 2 * np.pi
    tt, pp = np.meshgrid(theta, phi, indexing="ij")
    # smooth (low-frequency) test light: ambient + y-gradient
    envmap = np.stack([1.0 + 0.5 * np.cos(tt)] * 3, -1)
    shs = sh_light.envmap_to_sh(envmap, sh_order=2)
    dirs = np.stack([np.sin(tt) * np.cos(pp), np.cos(tt),
                     np.sin(tt) * np.sin(pp)], -1).reshape(-1, 3)
    recon = np.asarray(sh_light.sh_eval_color(
        jnp.asarray(shs)[None], jnp.asarray(dirs, jnp.float32), 3))
    np.testing.assert_allclose(recon[:, 0],
                               envmap.reshape(-1, 3)[:, 0], atol=0.05)


def test_sg_envmap_energy():
    cfg = sg_light.SGLightConfig(num_lgt_sgs=8)
    params = sg_light.init(jax.random.PRNGKey(3), cfg)
    env, dirs = sg_light.sg_to_envmap(params["lgt_sgs"], H=16, W=32)
    assert env.shape == (16, 32, 3)
    assert float(jnp.min(env)) >= 0
    assert float(jnp.max(env)) > 0


@pytest.mark.slow
def test_vertex_feature_encoder():
    """encoder_type='vertex': features on a subdivided mesh, barycentric
    interpolation + tanh + frequency encode (tools/map.py:569-587,634-637
    equivalent)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from nerf_texture_tpu.geometry.mesh import make_icosphere
    from nerf_texture_tpu.geometry.projector import MeshProjector
    from nerf_texture_tpu.models import mesh_field
    from nerf_texture_tpu.models.mesh_field import MeshFieldConfig

    base = make_icosphere(1, radius=0.5)
    mp = MeshProjector(base)
    fea = mesh_field.make_feature_projector(base.copy() if hasattr(base, "copy")
                                            else base, min_vertices=500)
    nv = int(fea.arrays.vertices.shape[0])
    assert nv >= 500
    cfg = MeshFieldConfig(encoder_type="vertex", feature_dim=8,
                          vertex_multires=4, n_feature_vertices=nv,
                          h_threshold=0.12, clustering=True,
                          per_ray_projection=False)
    assert cfg.encoder_f_out_dim == 8 * (1 + 2 * 4)
    params = mesh_field.init(jax.random.PRNGKey(0), cfg)
    assert params["features_v"].shape == (nv, 8)
    state = mesh_field.make_state(mp, fea_projector=fea)

    q = jnp.asarray([[0.0, 0.0, 0.52], [0.5, 0.0, 0.0],
                     [0.0, 0.9, 0.0]], jnp.float32)
    out = mesh_field.apply(params, state, q, cfg, mode="none",
                           no_noise=True)
    assert out.embed.shape == (3, cfg.embed_dim)
    assert np.isfinite(np.asarray(out.embed)).all()
    hm = np.asarray(out.h_mask)
    assert hm[0] and hm[1] and not hm[2]   # far point outside the shell

    # gradients flow to the vertex features
    def loss(p):
        o = mesh_field.apply(p, state, q, cfg, mode="none", no_noise=True)
        return jnp.sum(o.embed ** 2)

    g = jax.grad(loss)(params)
    assert float(jnp.abs(g["features_v"]).sum()) > 0
    # regularizers defined for the vertex path
    cl = mesh_field.clustering_loss(params, cfg)
    assert np.isfinite(float(cl))
    assert float(mesh_field.kl_loss(params, cfg)) == 0.0


@pytest.mark.slow
def test_vertex_encoder_e2e_train():
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

    base = make_icosphere(1, radius=0.5)
    mp = MeshProjector(base)
    fea = mesh_field.make_feature_projector(base, min_vertices=400)
    fcfg = MeshFieldConfig(encoder_type="vertex", feature_dim=4,
                           vertex_multires=3,
                           n_feature_vertices=int(
                               fea.arrays.vertices.shape[0]),
                           h_threshold=0.12, clustering=False,
                           pred_normal=True)
    ccfg = CurvedFieldConfig(field=fcfg, light_model="SH", hidden_dim=16,
                             geo_feat_dim=7)
    rcfg = RenderConfig(bound=1.0, cascades=1, grid_size=16, max_steps=48,
                        max_samples_train=24, max_samples_infer=24,
                        ray_chunk=576, pool_mean_samples=12,
                        pool_mean_samples_infer=12)
    tcfg = CurvedTrainConfig(lr=5e-3, total_steps=50, num_rays=64,
                             grid_update_interval=16, grid_full_updates=1)
    ds = SyntheticSphereDataset(n_frames=2, H=24, W=24)
    tr = CurvedTrainer(ds, mesh_field.make_state(mp, fea_projector=fea),
                       ccfg, rcfg, tcfg, key=jax.random.PRNGKey(0))
    m = tr.train(3)
    assert np.isfinite(m["loss"])
    out = tr.render_frame(ds.poses[0], use_ema=False)
    assert np.isfinite(np.asarray(out["image"])).all()


def test_progressive_vertex_levels():
    """grow_feature_mesh: the subdivided level reproduces the coarse
    field at old-level vertices (barycentric resample is exact on the
    surface), and the level schedule is geometric (tools/map.py:575,
    810-841)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from nerf_texture_tpu.geometry.mesh import make_icosphere
    from nerf_texture_tpu.geometry.projector import MeshProjector
    from nerf_texture_tpu.models import mesh_field
    from nerf_texture_tpu.models.mesh_field import MeshFieldConfig

    base = make_icosphere(1, radius=0.5)
    mp = MeshProjector(base)
    cfg0 = MeshFieldConfig(encoder_type="vertex", feature_dim=8,
                           vertex_multires=4, h_threshold=0.12,
                           clustering=False, per_ray_projection=False,
                           level_num=3, base_vnum=160, target_vnum=700)
    vnums = mesh_field.levels_vnum(cfg0)
    assert len(vnums) == 3 and vnums[0] == 160 and vnums[-1] == 700
    assert vnums[0] < vnums[1] < vnums[2]

    fea0 = mesh_field.make_feature_projector(base, min_vertices=vnums[0])
    nv0 = int(fea0.arrays.vertices.shape[0])
    cfg = dataclasses.replace(cfg0, n_feature_vertices=nv0)
    params = mesh_field.init(jax.random.PRNGKey(0), cfg)
    state = mesh_field.make_state(mp, fea_projector=fea0)

    q = jnp.asarray(np.asarray(fea0.arrays.vertices)[:64] * 1.02,
                    jnp.float32)
    out0 = mesh_field.apply(params, state, q, cfg, mode="none",
                            no_noise=True, need_normals=False)

    feats, ema_feats, state1, V1 = mesh_field.grow_feature_mesh(
        params, params, state, cfg, vnums[1])
    assert V1 > nv0
    params1 = dict(params, features_v=feats)
    cfg1 = dataclasses.replace(cfg, n_feature_vertices=V1)
    out1 = mesh_field.apply(params1, state1, q, cfg1, mode="none",
                            no_noise=True, need_normals=False)
    # subdivision keeps the old fea vertices as a prefix: their features
    # carry over exactly (barycentric weight 1 on themselves)
    v_old = np.asarray(fea0.arrays.vertices)
    v_new = np.asarray(state1.projector_fea.vertices)
    np.testing.assert_allclose(v_new[:nv0], v_old, atol=1e-6)
    np.testing.assert_allclose(np.asarray(feats[:nv0]),
                               np.asarray(params["features_v"]),
                               atol=1e-6)
    # and the field itself is preserved for the bulk of query points
    # (freq bands amplify tiny edge-adjacent barycentric shifts, so
    # bound the 90th percentile rather than the max)
    err = np.abs(np.asarray(out1.embed) - np.asarray(out0.embed))
    assert np.quantile(err, 0.9) < 0.05
    assert err.mean() < 0.03


@pytest.mark.slow
def test_trainer_level_advance():
    """CurvedTrainer.update_field_level advances the schedule, resizes
    params/opt-state, and training continues (loss finite + decreasing)
    across the boundary (nerf/utils.py:1014-1015)."""
    import dataclasses

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

    ds = SyntheticSphereDataset(n_frames=4, H=24, W=24)
    base = make_icosphere(2, radius=0.5)
    mp = MeshProjector(base)
    fcfg = MeshFieldConfig(encoder_type="vertex", feature_dim=4,
                           vertex_multires=2, h_threshold=0.15,
                           clustering=False, per_ray_projection=False,
                           pred_normal=False, prob_model=False,
                           level_num=2, base_vnum=160, target_vnum=700)
    fea0 = mesh_field.make_feature_projector(
        base, min_vertices=mesh_field.levels_vnum(fcfg)[0])
    nv0 = int(fea0.arrays.vertices.shape[0])
    fcfg = dataclasses.replace(fcfg, n_feature_vertices=nv0)
    ccfg = CurvedFieldConfig(field=fcfg, light_model="None")
    rcfg = RenderConfig(bound=1.0, cascades=1, grid_size=16, max_steps=48,
                        max_samples_train=24, max_samples_infer=32,
                        ray_chunk=576, infer_mode="pool")
    tcfg = CurvedTrainConfig(lr=5e-3, total_steps=40, num_rays=128,
                             grid_update_interval=8, scan_steps=4,
                             iters_per_level=12)
    tr = CurvedTrainer(ds, mesh_field.make_state(mp, fea_projector=fea0),
                       ccfg, rcfg, tcfg, key=jax.random.PRNGKey(0))
    tr.initialize_states(1)
    m0 = tr.train(10)
    assert tr.fea_level == 0
    m1 = tr.train(20)          # crosses step 12 -> level 1
    assert tr.fea_level == 1
    assert tr.ccfg.field.n_feature_vertices > nv0
    assert tr.state.params["field"]["features_v"].shape[0] \
        == tr.ccfg.field.n_feature_vertices
    assert np.isfinite(m1["loss"])
    # momentum survives for non-resized leaves; training still improves
    m2 = tr.train(10)
    assert np.isfinite(m2["loss"])


def test_fc_weight_blends_normals():
    """FieldRuntime.fc_weight blends fine/coarse shading normals
    (reference gui.py:628, network_curvedfield.py:300): at 0 the
    rendered color matches a coarse-normal-only shade."""
    cfg = curved_field.CurvedFieldConfig(field=CFG, light_model="SH")
    state = make_field_state()
    params = curved_field.init(jax.random.PRNGKey(0), cfg)
    # kick the (zero-init-rotation) normal net so fine != coarse, and
    # the (ambient-only-init) light so shading depends on the normal
    params["field"]["normal"] = jax.tree_util.tree_map(
        lambda l: l + 0.5 * jax.random.normal(jax.random.PRNGKey(9),
                                              l.shape),
        params["field"]["normal"])
    params["light"] = jax.tree_util.tree_map(
        lambda l: l + 0.5 * jax.random.normal(jax.random.PRNGKey(10),
                                              l.shape), params["light"])
    x = sphere_points(16)
    d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (16, 1))
    rt1 = mesh_field.FieldRuntime.default()
    rt0 = rt1._replace(fc_weight=jnp.zeros(()))
    _, c1, _ = curved_field.forward(params, state, x, d, cfg, rt=rt1,
                                    key=jax.random.PRNGKey(1))
    _, c0, _ = curved_field.forward(params, state, x, d, cfg, rt=rt0,
                                    key=jax.random.PRNGKey(1))
    # blend changes the shading (fine net is freshly init'd => differs)
    assert np.abs(np.asarray(c1) - np.asarray(c0)).max() > 1e-5
    # halfway blend lies between-ish: it must differ from both ends
    rth = rt1._replace(fc_weight=jnp.asarray(0.5))
    _, ch, _ = curved_field.forward(params, state, x, d, cfg, rt=rth,
                                    key=jax.random.PRNGKey(1))
    assert np.abs(np.asarray(ch) - np.asarray(c0)).max() > 1e-6
    assert np.abs(np.asarray(ch) - np.asarray(c1)).max() > 1e-6
