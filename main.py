"""NeRF-Texture training entry point (reference main.py).

Pipeline (readme.md steps; SURVEY.md 3.2):
  1. coarse NGP mesh (from main_nerf.py --save_mesh) -> template mesh
     (optional CoACD/manifold, laplacian smooth, remesh)
  2. h_threshold from the scan point cloud (2 x 70th-percentile |sdf|)
  3. curved-field NeRF-Texture training with the chosen light model
  4. GUI / headless training; patch export + synthesis via
     `nerf_texture_tpu.synthesis` and texture_synthesis_* scripts.

Usage:
  python main.py star_flower                      # preset scene
  python main.py synthetic_sphere --iters 2000    # procedural smoke run
"""

import argparse
import os

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("scene", help="preset name or scene dir")
    p.add_argument("--workspace", default=None)
    p.add_argument("--iters", type=int, default=None)
    p.add_argument("--num_rays", type=int, default=None)
    p.add_argument("--light_model", default=None,
                   choices=["SH", "SG", "Envmap", "None"])
    p.add_argument("--encoder", default=None, choices=["hash", "vertex"],
                   help="feature storage (reference --hash flag)")
    p.add_argument("--iters_per_level", type=int, default=None,
                   help="progressive vertex-level cadence (0 = off)")
    p.add_argument("--distillation", action="store_true",
                   help="mix in sigma/color distillation steps from the "
                   "coarse NGP checkpoint in the workspace (reference "
                   "nerf/utils.py:535-567)")
    p.add_argument("--gui", action="store_true")
    p.add_argument("--port", type=int, default=7860)
    p.add_argument("--ckpt", default="latest")
    p.add_argument("--eval_interval", type=int, default=2000)
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args()


def build_template_mesh(cfg, workspace):
    """Base-mesh pipeline (main.py:110-141): latest ngp mesh -> optional
    CoACD + manifold -> smooth -> remesh -> template."""
    from nerf_texture_tpu.geometry import shape_tools
    from nerf_texture_tpu.geometry.mesh import (load_obj, make_icosphere,
                                                save_obj)

    template_path = os.path.join(workspace, "meshes",
                                 "surface_coacd_remesh.obj")
    if os.path.exists(template_path):
        return load_obj(template_path)

    ngp_mesh_path = os.path.join(workspace, "meshes", "ngp_mesh.obj")
    if not os.path.exists(ngp_mesh_path):
        if cfg.name == "synthetic_sphere":
            mesh = make_icosphere(3, radius=0.5)
            os.makedirs(os.path.dirname(template_path), exist_ok=True)
            save_obj(template_path, mesh)
            return mesh
        raise FileNotFoundError(
            f"{ngp_mesh_path} missing - run main_nerf.py --save_mesh "
            "first (reference readme step 1)")

    mesh = load_obj(ngp_mesh_path)
    decomposed = shape_tools.coacd(ngp_mesh_path,
                                   threshold=cfg.coacd_threshold)
    if decomposed != ngp_mesh_path:
        mesh = load_obj(shape_tools.manifold_union(
            decomposed, os.path.dirname(template_path)))
    else:
        # no CoACD/manifold binaries: at least shed the floating junk
        # blobs their union stage would have removed
        mesh = shape_tools.keep_largest_component(mesh)
    mesh = shape_tools.laplacian_smooth(mesh, iterations=8)
    mesh = shape_tools.remesh_isotropic(mesh)
    os.makedirs(os.path.dirname(template_path), exist_ok=True)
    save_obj(template_path, mesh)
    return mesh


def compute_h_threshold(workspace, template_projector, default=0.1):
    """2 x 70th-percentile |sdf(scan_pcl, template)| (main.py:143-154)."""
    import jax.numpy as jnp

    from nerf_texture_tpu.geometry import projector as proj
    from nerf_texture_tpu.geometry.mesh import load_ply_points

    pcl_path = os.path.join(workspace, "meshes", "pcl.ply")
    if not os.path.exists(pcl_path):
        return default
    pts = load_ply_points(pcl_path)
    if len(pts) > 20000:
        pts = pts[np.random.default_rng(0).choice(len(pts), 20000,
                                                  replace=False)]
    sdf, _, _, _ = proj.signed_distance(
        template_projector.arrays, jnp.asarray(pts, jnp.float32))
    return float(2.0 * np.percentile(np.abs(np.asarray(sdf)), 70))


def main():
    args = parse_args()
    import dataclasses

    import jax

    from nerf_texture_tpu.config import get_preset
    from nerf_texture_tpu.parallel import initialize_multihost

    # pod launch (JAX_COORDINATOR_ADDRESS etc. set): no-op on one host
    initialize_multihost()

    overrides = {}
    if args.iters is not None:
        overrides["iters"] = args.iters
    if args.num_rays is not None:
        overrides["num_rays"] = args.num_rays
    if args.light_model is not None:
        overrides["light_model"] = args.light_model
    if args.encoder is not None:
        overrides["encoder_type"] = args.encoder
    if args.iters_per_level is not None:
        overrides["iters_per_level"] = args.iters_per_level
    cfg = get_preset(args.scene, **overrides)
    workspace = args.workspace or cfg.workspace
    os.makedirs(workspace, exist_ok=True)
    # the container sitecustomize may force a platform before argv is
    # read; NERF_TPU_PLATFORM=cpu overrides it (tests / CPU debugging)
    if os.environ.get("NERF_TPU_PLATFORM"):
        jax.config.update("jax_platforms",
                          os.environ["NERF_TPU_PLATFORM"])
    if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        # honor an externally-shared cache (tests point subprocesses at
        # the machine-scoped repo cache so CLI stages don't cold-compile)
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
    else:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(workspace, ".jax_cache"))

    from nerf_texture_tpu.data.provider import NeRFDataset
    from nerf_texture_tpu.data.synthetic import SyntheticSphereDataset
    from nerf_texture_tpu.geometry.projector import MeshProjector
    from nerf_texture_tpu.models import mesh_field
    from nerf_texture_tpu.train.curved_trainer import CurvedTrainer

    if cfg.name == "synthetic_sphere":
        dataset = SyntheticSphereDataset(n_frames=24, H=400, W=400)
    else:
        dataset = NeRFDataset(cfg.path, mode=cfg.mode, split="train",
                              downscale=cfg.downscale, scale=cfg.scale)

    template = build_template_mesh(cfg, workspace)
    projector = MeshProjector(template)
    h_thr = compute_h_threshold(workspace, projector,
                                default=cfg.h_threshold)
    print(f"template: {len(template.vertices)} verts, "
          f"h_threshold={h_thr:.4f}")
    cfg = dataclasses.replace(cfg, h_threshold=h_thr)

    if cfg.encoder_type == "vertex":
        # vertex-feature encoder: build the level-0 feature mesh and fix
        # the static vertex count (progressive levels grow it via
        # CurvedTrainer.update_field_level)
        vnum0 = mesh_field.levels_vnum(cfg.field)[0]
        fea = mesh_field.make_feature_projector(template,
                                                min_vertices=vnum0)
        nv0 = int(fea.arrays.vertices.shape[0])
        fcfg = dataclasses.replace(cfg.field, n_feature_vertices=nv0)
        ccfg = dataclasses.replace(cfg.curved, field=fcfg)
        field_state = mesh_field.make_state(projector, fea_projector=fea)
    else:
        ccfg = cfg.curved
        field_state = mesh_field.make_state(projector)
    # teacher auto-load: with --distillation the coarse NGP checkpoint in
    # the workspace becomes the frozen teacher (the reference loads it
    # automatically and continues without when absent,
    # nerf/utils.py:535-567,582-591)
    curved_tcfg = cfg.curved_train
    teacher = None
    if args.distillation:
        from nerf_texture_tpu.models.ngp import NGPConfig
        from nerf_texture_tpu.train.curved_trainer import load_ngp_teacher

        curved_tcfg = dataclasses.replace(curved_tcfg, distillation=True)
        teacher = load_ngp_teacher(workspace,
                                   NGPConfig(bound=cfg.render.bound))
    trainer = CurvedTrainer(dataset, field_state, ccfg, cfg.render,
                            curved_tcfg, teacher=teacher,
                            key=jax.random.PRNGKey(args.seed),
                            workspace=workspace)
    trainer.template_mesh = template    # viewer region picking / export

    ckpt_dir = os.path.join(workspace, "checkpoints", cfg.field_name)
    if args.ckpt == "latest" and os.path.exists(ckpt_dir):
        print("loading checkpoint", ckpt_dir)
        trainer.load_checkpoint(ckpt_dir)

    if args.gui:
        from nerf_texture_tpu.viewer import ViewerApp, serve

        app = ViewerApp(trainer, W=dataset.W, H=dataset.H)
        app.training = True
        serve(app, port=args.port)
        return

    done = int(trainer.state.step)
    while done < cfg.iters:
        n = min(args.eval_interval, cfg.iters - done)
        m = trainer.train(n, log_every=500)
        done += n
        psnr = trainer.eval_psnr([0])
        print(f"[{done}/{cfg.iters}] loss={m['loss']:.5f} "
              f"PSNR={psnr:.2f}")
        if trainer.logger is not None:
            trainer.logger.log(done, psnr=psnr)
        trainer.save_checkpoint(ckpt_dir)


if __name__ == "__main__":
    main()
