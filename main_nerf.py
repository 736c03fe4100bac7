"""Coarse Instant-NGP training entry point (reference main_nerf.py).

Usage:
  python main_nerf.py data/star_flower --workspace logs/star_flower
  python main_nerf.py synthetic_sphere --iters 2000       # procedural
  python main_nerf.py ... --gui                           # web viewer
"""

import argparse
import os


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("path", help="scene dir with transforms.json, or the "
                   "name of a procedural scene (synthetic_sphere)")
    p.add_argument("--workspace", default="./logs/nerf")
    p.add_argument("--iters", type=int, default=12000)
    p.add_argument("--num_rays", type=int, default=4096)
    p.add_argument("--lr", type=float, default=1e-2)
    p.add_argument("--bound", type=float, default=1.0)
    p.add_argument("--scale", type=float, default=0.33)
    p.add_argument("--downscale", type=int, default=1)
    p.add_argument("--mode", default="colmap",
                   choices=["colmap", "blender"])
    p.add_argument("--dt_gamma", type=float, default=0.0)
    p.add_argument("--gui", action="store_true")
    p.add_argument("--port", type=int, default=7860)
    p.add_argument("--save_mesh", action="store_true")
    p.add_argument("--mesh_resolution", type=int, default=256)
    p.add_argument("--ckpt", default="latest")
    p.add_argument("--eval_interval", type=int, default=2000)
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args()


def main():
    args = parse_args()
    import jax

    from nerf_texture_tpu.parallel import initialize_multihost

    # pod launch (JAX_COORDINATOR_ADDRESS etc. set): no-op on one host
    initialize_multihost()
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
                          os.path.join(args.workspace, ".jax_cache"))
    import jax.numpy as jnp

    from nerf_texture_tpu.data.provider import NeRFDataset
    from nerf_texture_tpu.data.synthetic import SyntheticSphereDataset
    from nerf_texture_tpu.models.ngp import NGPConfig
    from nerf_texture_tpu.render.renderer import RenderConfig
    from nerf_texture_tpu.train.trainer import TrainConfig, Trainer

    if args.path == "synthetic_sphere":
        dataset = SyntheticSphereDataset(n_frames=24, H=400, W=400)
    else:
        dataset = NeRFDataset(args.path, mode=args.mode,
                              split="train" if args.mode == "colmap"
                              else "all", downscale=args.downscale,
                              scale=args.scale)

    mcfg = NGPConfig(bound=args.bound)
    rcfg = RenderConfig.for_bound(args.bound, dt_gamma=args.dt_gamma,
                                  max_steps=384)
    tcfg = TrainConfig(lr=args.lr, total_steps=args.iters,
                       num_rays=args.num_rays)
    trainer = Trainer(dataset, mcfg, rcfg, tcfg,
                      key=jax.random.PRNGKey(args.seed),
                      workspace=args.workspace)

    ckpt_dir = os.path.join(args.workspace, "checkpoints", "ngp")
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
    while done < args.iters:
        n = min(args.eval_interval, args.iters - done)
        m = trainer.train(n, log_every=500)
        done += n
        psnr = trainer.eval_psnr([0])
        print(f"[{done}/{args.iters}] loss={m['loss']:.5f} "
              f"PSNR={psnr:.2f}")
        if trainer.logger is not None:
            trainer.logger.log(done, psnr=psnr)
        trainer.save_checkpoint(ckpt_dir)

    if args.save_mesh:
        from nerf_texture_tpu.models import ngp as ngp_mod
        from nerf_texture_tpu.train.field_io import save_mesh

        def density_fn(pts):
            s, _ = ngp_mod.density(trainer.state.params, pts, mcfg)
            return s

        mesh_path = os.path.join(args.workspace, "meshes", "ngp_mesh.obj")
        save_mesh(density_fn, mesh_path,
                  resolution=args.mesh_resolution, bound=args.bound)
        print("mesh saved to", mesh_path)


if __name__ == "__main__":
    main()
