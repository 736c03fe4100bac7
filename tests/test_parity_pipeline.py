"""Full-pipeline parity run on the textured bumpy shell.

The reference's readme steps 1-7 (coarse NGP -> mesh -> NeRF-Texture
training -> patch export -> quilting -> re-import -> render), driven
end-to-end on the procedural SyntheticShellDataset with PSNR gates at
each stage.  The written star_flower/durian protocol lives in
docs/PARITY.md; this test is its executable stand-in until captured
data is available.

Two tiers: the FAST profile (~3 min, smaller frames/steps/grids, same
7 stages and gates) runs in the default suite so the flagship pipeline
is always exercised; the FULL profile keeps the original budget and
stays in the slow set.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nerf_texture_tpu.data.poses import orbit_pose
from nerf_texture_tpu.data.synthetic import (SyntheticShellDataset,
                                             render_gt_shell)
from nerf_texture_tpu.models import ngp as ngp_mod
from nerf_texture_tpu.models.ngp import NGPConfig
from nerf_texture_tpu.render.renderer import RenderConfig
from nerf_texture_tpu.train.trainer import TrainConfig, Trainer
from nerf_texture_tpu.utils.metrics import psnr

# knobs per tier: (H, frames, ngp_steps, curved_steps, mesh_res,
# ngp_gate_db, curved_gate_db)
# FAST gates are collapse sentinels sized for the tiny budget (measured
# ngp ~17.5 dB, curved ~11.2 dB on this profile); the FULL tier keeps
# the real quality gates and runs in the slow set.
FAST = dict(H=28, frames=6, ngp_steps=200, curved_steps=120, mesh_res=40,
            ngp_gate=15.0, curved_gate=10.0, desired_res=96,
            hashmap=13, bricks=10, mc_threshold=5.0)
FULL = dict(H=40, frames=10, ngp_steps=600, curved_steps=500, mesh_res=64,
            ngp_gate=17.0, curved_gate=15.0, desired_res=256,
            hashmap=15, bricks=12, mc_threshold=10.0)
# mc_threshold: the reference extracts at density 10 (nerf/utils.py:713);
# a 200-step FAST field is still diffuse there -- the shell fragments
# and the largest component is a 212-face blob (0 surviving patches,
# scripts/_dbg_mc_threshold.py sweep: thr 10 -> 212f, thr 5 -> 7412f
# coherent shell), so the fast tier extracts at 5.


def _gt(pose, intr, ds, H, W):
    img = render_gt_shell(pose, intr, H, W, ds.base, ds.bump_amp)
    rgb = img[..., :3].astype(np.float32) / 255.0
    a = img[..., 3:].astype(np.float32) / 255.0
    return rgb * a + (1.0 - a)      # white background


@pytest.mark.slow
def test_shell_parity_pipeline_fast(tmp_path):
    """Scaled-down tier of the full pipeline (all 7 stages).

    Moved to the slow set in round 4: it is compile-dominated
    (~250 s on one host core, 58% of the whole fast suite) and the
    pipeline is also exercised end-to-end by tests/test_cli_smoke.py;
    the fast suite keeps the unit + mid-level integration layers
    (VERDICT r3 next #7: fast suite < 4 min)."""
    _run_pipeline(tmp_path, FAST)


@pytest.mark.slow
@pytest.mark.nightly
def test_shell_parity_pipeline(tmp_path):
    _run_pipeline(tmp_path, FULL)


def _run_pipeline(tmp_path, P):
    import time

    _t = [time.perf_counter()]

    def _mark(stage):
        now = time.perf_counter()
        print(f"[parity-t] {stage}: {now - _t[0]:.1f}s", flush=True)
        _t[0] = now

    H = W = P["H"]
    ds = SyntheticShellDataset(n_frames=P["frames"], H=H, W=W)
    holdout_pose = orbit_pose(np.pi / 2 + 0.25, 1.234, ds.radius)
    gt_holdout = _gt(holdout_pose, ds.intrinsics, ds, H, W)

    # ---- stage 1: coarse NGP (readme step 1 / main_nerf.py) ----
    mcfg = NGPConfig(bound=1.0, num_levels=6, level_dim=2,
                     base_resolution=16,
                     desired_resolution=P["desired_res"],
                     log2_hashmap_size=P["hashmap"], hidden_dim=64,
                     hidden_dim_color=64)
    rcfg = RenderConfig(bound=1.0, cascades=1, grid_size=32, max_steps=96,
                        max_samples_train=48, max_samples_infer=64,
                        ray_chunk=1600, infer_mode="pool")
    tcfg = TrainConfig(lr=1e-2, total_steps=P["ngp_steps"], num_rays=512,
                       grid_update_interval=16, grid_decay=0.85)
    ngp_tr = Trainer(ds, mcfg, rcfg, tcfg, key=jax.random.PRNGKey(3))
    ngp_tr.train(P["ngp_steps"])
    out = ngp_tr.render_frame(holdout_pose, use_ema=False)
    ngp_psnr = psnr(out["image"], gt_holdout)
    _mark("ngp-train+render")
    assert ngp_psnr > P["ngp_gate"], \
        f"coarse NGP novel-view PSNR {ngp_psnr}"

    # ---- stage 2: mesh from the NGP density (readme step 2) ----
    from nerf_texture_tpu.geometry import shape_tools
    from nerf_texture_tpu.train import field_io

    params = ngp_tr.state.params

    def density(p):
        return ngp_mod.density(params, p, mcfg)[0]

    mesh_path = str(tmp_path / "ngp_mesh.obj")
    v, f = field_io.save_mesh(density, mesh_path,
                              resolution=P["mesh_res"], bound=1.0,
                              threshold=P["mc_threshold"])
    assert len(v) > 200
    radii = np.linalg.norm(v, axis=-1)
    # the extracted surface sits on the bumpy shell
    assert abs(float(np.median(radii)) - ds.base) < 0.1
    _mark("mesh")

    # ---- stage 3: template mesh (smooth + remesh, main.py:110-141) ----
    from nerf_texture_tpu.geometry.mesh import Mesh
    from nerf_texture_tpu.geometry.projector import MeshProjector

    # the reference's CoACD+manifold template stage also sheds floating
    # junk blobs; without it patch centers land on salt debris
    mesh_raw = shape_tools.keep_largest_component(
        Mesh(np.asarray(v, np.float32), np.asarray(f)))
    mesh = shape_tools.laplacian_smooth(mesh_raw, iterations=6)
    mp = MeshProjector(mesh)

    # h_threshold: 2 x 70th percentile |sdf| of scan points
    # (main.py:143-154); scan = NGP surface samples (cleaned component
    # -- raw MC output includes salt debris far from the template)
    from nerf_texture_tpu.geometry import projector as proj
    vr = mesh_raw.vertices
    pts = jnp.asarray(vr[np.random.default_rng(0).choice(
        len(vr), size=min(2000, len(vr)), replace=False)], jnp.float32)
    sdf = proj.signed_distance(mp.arrays, pts)[0]
    h_threshold = float(2.0 * jnp.quantile(jnp.abs(sdf), 0.7))
    h_threshold = max(h_threshold, 2.5 * ds.bump_amp)
    assert h_threshold < 0.35
    _mark("template+h")

    # ---- stage 4: curved-field NeRF-Texture training (step 3-4) ----
    from nerf_texture_tpu.models import mesh_field
    from nerf_texture_tpu.models.curved_field import CurvedFieldConfig
    from nerf_texture_tpu.models.mesh_field import MeshFieldConfig
    from nerf_texture_tpu.train.curved_trainer import (CurvedTrainConfig,
                                                       CurvedTrainer)

    fcfg = MeshFieldConfig(num_levels=4, level_dim=2, base_resolution=32,
                           desired_resolution=P["desired_res"],
                           log2_bricks=P["bricks"],
                           h_threshold=h_threshold, clustering=False)
    ccfg = CurvedFieldConfig(field=fcfg, light_model="SH",
                             hidden_dim=32, geo_feat_dim=15)
    crcfg = dataclasses.replace(rcfg, ray_chunk=1600)
    ctcfg = CurvedTrainConfig(lr=1e-2, total_steps=P["curved_steps"],
                              num_rays=512, grid_update_interval=16,
                              grid_full_updates=2)
    ctr = CurvedTrainer(ds, mesh_field.make_state(mp), ccfg, crcfg,
                        ctcfg, key=jax.random.PRNGKey(4))
    ctr.initialize_states(1)
    ctr.train(P["curved_steps"])
    out = ctr.render_frame(holdout_pose, use_ema=False)
    curved_psnr = psnr(out["image"], gt_holdout)
    _mark("curved-train+render")
    assert curved_psnr > P["curved_gate"], \
        f"curved novel-view PSNR {curved_psnr}"

    # ---- stage 5: patch export + quilting (steps 5-6) ----
    from nerf_texture_tpu.synthesis.patches import PatchSampleConfig
    from nerf_texture_tpu.synthesis.quilting import (QuiltingConfig,
                                                     QuiltingSynthesizer)

    scfg = PatchSampleConfig(patch_size=8, max_patch_num=8,
                             center_batch=4, pattern_rate=1 / 6)
    field_path = str(tmp_path / "field.npz")
    exported = field_io.save_field(ctr, field_path, mesh=mesh, scfg=scfg)
    assert exported["patches"].shape[0] >= 4
    # exported patches carry signal, not constants
    assert float(np.std(exported["patches"])) > 1e-3
    _mark("patch-export")

    data = np.load(field_path, allow_pickle=True)
    patches = np.concatenate(
        [data["patches"], data["patch_phi_embed"],
         data["patch_local_tbn"].reshape(
             *data["patch_local_tbn"].shape[:3], 9)], -1)
    syn = QuiltingSynthesizer(
        patches, QuiltingConfig(output_size=(32, 32), seed=0),
        match_dim=data["patches"].shape[-1],
        sample_tbn=data["patch_sample_tbn"],
        picked_vertices=data["picked_vertices"],
        patch_length=float(data["grid_gap"]) * 8)
    syn.synthesize()
    tex = syn.export(grid_gap=float(data["grid_gap"]),
                     phi_embed_dim=data["patch_phi_embed"].shape[-1])
    tex_path = str(tmp_path / "texture.npz")
    np.savez(tex_path, **{k: x for k, x in tex.items() if x is not None})

    # ---- stage 6: re-import + render (step 7 / GUI load synthesis) ----
    field_io.load_field(ctr, tex_path)
    assert ctr.mode == "field"
    outimg = ctr.render_frame(ds.poses[0], use_ema=False)
    img = np.asarray(outimg["image"])
    assert np.isfinite(img).all()
    # the synthesized canvas renders textured content (not background
    # and not a constant): gate on in-silhouette variance.  The canvas
    # densities are whatever sigma_net learned for the shell, so the
    # occupancy threshold is the only hard floor -- gate at ws > 0.1.
    ws = np.asarray(outimg["weights_sum"]).reshape(-1)
    acc = ws > 0.1
    assert acc.any(), f"imported canvas invisible (ws max {ws.max()})"
    assert img.reshape(-1, 3)[acc].std() > 0.005

    field_io.load_patch(ctr, field_path, patch_id=0)
    outimg = ctr.render_frame(ds.poses[0], use_ema=False)
    assert np.isfinite(np.asarray(outimg["image"])).all()
    _mark("quilt+reimport")

    print(f"[parity] ngp={ngp_psnr:.2f} dB curved={curved_psnr:.2f} dB "
          f"h={h_threshold:.3f}")
