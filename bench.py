"""Benchmark: novel-view render throughput of the flagship NGP model.

North star (BASELINE.json): 800x800 novel-view render of a trained scene at
>= 10 fps on one TPU v5e chip.  The scene here is the procedural synthetic
sphere (the repo ships no captured scenes); the model is trained briefly so
the occupancy grid and density field are realistic, then steady-state
frame time is measured.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}
"""

import json
import time

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from nerf_texture_tpu.data.synthetic import SyntheticSphereDataset
    from nerf_texture_tpu.models.ngp import NGPConfig
    from nerf_texture_tpu.render.renderer import RenderConfig
    from nerf_texture_tpu.train.trainer import TrainConfig, Trainer

    def sync(x):
        return jax.block_until_ready(np.asarray(x))

    H = W = 800
    ds = SyntheticSphereDataset(n_frames=8, H=H, W=W)
    mcfg = NGPConfig(bound=1.0, num_levels=8, level_dim=4,
                     log2_bricks=16, desired_resolution=2048)
    rcfg = RenderConfig(bound=1.0, cascades=1, grid_size=128,
                        max_steps=384, max_samples_train=192,
                        max_samples_infer=96, ray_chunk=40000,
                        pool_mean_samples=64, pool_mean_samples_infer=24)
    tcfg = TrainConfig(lr=1e-2, total_steps=2000, num_rays=4096)
    trainer = Trainer(ds, mcfg, rcfg, tcfg, key=jax.random.PRNGKey(7))

    # warmup + short training: realistic weights + occupancy grid
    t0 = time.perf_counter()
    trainer.train(50)
    sync(trainer.state.params["grid"][:1])
    t_warm = time.perf_counter() - t0

    n_train = 300
    t0 = time.perf_counter()
    trainer.train(n_train)
    sync(trainer.state.params["grid"][:1])
    iters_per_sec = n_train / (time.perf_counter() - t0)

    psnr = trainer.eval_psnr([0], use_ema=False)

    # render throughput (novel poses, steady state)
    from nerf_texture_tpu.data.poses import orbit_pose
    poses = [orbit_pose(np.pi / 2 + 0.2, 0.3 + 0.1 * i, ds.radius)
             for i in range(4)]
    out = trainer.render_frame(poses[0], use_ema=False)   # warmup/compile
    sync(out["image"][:1, :1])
    t0 = time.perf_counter()
    for p in poses[1:]:
        out = trainer.render_frame(p, use_ema=False)
    sync(out["image"][:1, :1])
    dt = (time.perf_counter() - t0) / (len(poses) - 1)
    fps = 1.0 / dt
    rays_per_sec = H * W / dt

    print(json.dumps({
        "metric": "800x800 novel-view render (synthetic sphere, 1 chip)",
        "value": round(fps, 3),
        "unit": "frames/sec",
        "vs_baseline": round(fps / 10.0, 3),
        "extra": {
            "rays_per_sec": round(rays_per_sec),
            "train_iters_per_sec": round(iters_per_sec, 2),
            "train_psnr_350_steps": round(psnr, 2),
            "warmup_s": round(t_warm, 1),
        },
    }))


if __name__ == "__main__":
    main()
