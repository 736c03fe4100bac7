"""Per-stage render timings on the real chip (iteration harness).

Usage: python scripts/bench_stages.py [ngp|curved] [H]

Trains briefly (NGP) or not at all (curved) so the occupancy grid is a
realistic shell, then times: march, anchors, sigma pass, full field,
whole chunk, whole frame.  Prints a JSON dict.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..'))
import time

import numpy as np


def sync(x):
    import jax

    return jax.block_until_ready(np.asarray(x))


def timeit(fn, n=3):
    fn()  # compile
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    sync(out[0] if isinstance(out, tuple) else out)
    return (time.perf_counter() - t0) / n


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    which = sys.argv[1] if len(sys.argv) > 1 else "ngp"
    H = W = int(sys.argv[2]) if len(sys.argv) > 2 else 800

    from nerf_texture_tpu.data.synthetic import SyntheticSphereDataset
    from nerf_texture_tpu.render.renderer import RenderConfig

    out = {}
    if which == "ngp":
        from nerf_texture_tpu.models.ngp import NGPConfig
        from nerf_texture_tpu.train.trainer import TrainConfig, Trainer

        ds = SyntheticSphereDataset(n_frames=4, H=H, W=W)
        mcfg = NGPConfig(bound=1.0, num_levels=8, level_dim=4,
                         log2_bricks=16, desired_resolution=2048)
        rcfg = RenderConfig(bound=1.0, cascades=1, grid_size=128,
                            max_steps=384, max_samples_train=192,
                            max_samples_infer=96, ray_chunk=40000,
                            pool_mean_samples=64,
                            pool_mean_samples_infer=24)
        tcfg = TrainConfig(lr=1e-2, total_steps=2000, num_rays=4096)
        tr = Trainer(ds, mcfg, rcfg, tcfg, key=jax.random.PRNGKey(7))
        tr.train(400)
        sync(tr.state.params["grid"][:1])
        out["train_step_ms"] = round(timeit(
            lambda: tr.train(1) or tr.state.params["grid"], 5) * 1e3, 1)
        t = timeit(lambda: tr.render_frame(ds.poses[1],
                                           use_ema=False)["image"], 3)
        out["frame_ms"] = round(t * 1e3, 1)
        out["fps"] = round(1.0 / t, 2)
    else:
        from nerf_texture_tpu.geometry.mesh import make_icosphere
        from nerf_texture_tpu.geometry.projector import MeshProjector
        from nerf_texture_tpu.models import mesh_field
        from nerf_texture_tpu.models.curved_field import CurvedFieldConfig
        from nerf_texture_tpu.models.mesh_field import MeshFieldConfig
        from nerf_texture_tpu.train.curved_trainer import (
            CurvedTrainConfig, CurvedTrainer)

        ds = SyntheticSphereDataset(n_frames=4, H=H, W=W)
        mp = MeshProjector(make_icosphere(4, radius=0.5))
        rcfg = RenderConfig(bound=1.0, cascades=1, grid_size=128,
                            max_steps=512, max_samples_train=128,
                            max_samples_infer=96, ray_chunk=16384,
                            pool_mean_samples=64,
                            pool_mean_samples_infer=24,
                            march_steps_infer=256)
        tcfg = CurvedTrainConfig(lr=1e-2, total_steps=4000, num_rays=4096,
                                 grid_update_interval=10 ** 9,
                                 grid_full_updates=0)
        ccfg = CurvedFieldConfig(field=MeshFieldConfig(), light_model="SH")
        tr = CurvedTrainer(ds, mesh_field.make_state(mp), ccfg, rcfg, tcfg,
                           key=jax.random.PRNGKey(7))
        tr.initialize_states(1)
        out["train_step_ms"] = round(timeit(
            lambda: tr.train(1) or tr.state.params["sigma_net"], 3)
            * 1e3, 1)
        t = timeit(lambda: tr.render_frame(ds.poses[1],
                                           use_ema=False)["image"], 3)
        out["frame_ms"] = round(t * 1e3, 1)
        out["fps"] = round(1.0 / t, 2)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
