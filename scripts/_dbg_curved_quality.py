"""Bench-scale flagship quality + render-knob sweep on the real chip.

Round-4 history: BENCH_r03 curved_novel_psnr was 13.54 dB.  Root causes
found and fixed (docs/PERF.md round 4): prob-noise init conditioning
(training) and the proxy anchor seed (render).  The small-scale A/B
(scripts/_dbg_render_ab.py) also showed the survivor cap is the
remaining quality/speed knob at 64^3 proxy resolution; this measures
the bench configuration (800^2, 128^3 grid) across caps, with per-arm
frame times, to pick the bench default.

Emits one JSON line per measurement; PNGs under /tmp/dbg_quality.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import dataclasses
import json
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from nerf_texture_tpu.data.poses import orbit_pose
from nerf_texture_tpu.data.synthetic import (SyntheticSphereDataset,
                                             render_gt_sphere)
from nerf_texture_tpu.geometry.mesh import make_icosphere
from nerf_texture_tpu.geometry.projector import MeshProjector
from nerf_texture_tpu.models import mesh_field
from nerf_texture_tpu.models.curved_field import CurvedFieldConfig
from nerf_texture_tpu.models.mesh_field import MeshFieldConfig
from nerf_texture_tpu.render.renderer import RenderConfig
from nerf_texture_tpu.train.curved_trainer import (CurvedTrainConfig,
                                                   CurvedTrainer)
from nerf_texture_tpu.utils.metrics import psnr as psnr_fn

H = W = 800
OUTDIR = "/tmp/dbg_quality"
os.makedirs(OUTDIR, exist_ok=True)


def emit(**kw):
    print(json.dumps(kw), flush=True)


def gt_white(pose, intr, r):
    gt = render_gt_sphere(pose, intr, H, W, r)
    rgb = gt[..., :3].astype(np.float32) / 255.0
    a = gt[..., 3:].astype(np.float32) / 255.0
    return rgb * a + (1.0 - a)


def save_png(img, name):
    try:
        import imageio.v3 as iio
        iio.imwrite(os.path.join(OUTDIR, name),
                    (np.clip(np.asarray(img), 0, 1) * 255).astype(np.uint8))
    except Exception as e:  # noqa: BLE001
        emit(warn=f"png save failed: {e!r}")


def timed_frame(tr, pose):
    out = tr.render_frame(pose, use_ema=False)
    img = np.asarray(out["image"])          # sync
    t0 = time.perf_counter()
    out = tr.render_frame(pose, use_ema=False)
    img = np.asarray(out["image"])
    return img, time.perf_counter() - t0


def main():
    t_start = time.perf_counter()

    def mark(stage):
        emit(stage=stage, t=round(time.perf_counter() - t_start, 1))

    ds = SyntheticSphereDataset(n_frames=4, H=H, W=W)
    mark("dataset")
    mp = MeshProjector(make_icosphere(4, radius=0.5))
    mark("projector")
    rcfg = RenderConfig(bound=1.0, cascades=1, grid_size=128, max_steps=512,
                        max_samples_train=128, max_samples_infer=96,
                        ray_chunk=16384, pool_mean_samples=64,
                        pool_mean_samples_infer=24, march_steps_infer=256,
                        proxy_samples=0, proxy_refined=32)
    tcfg = CurvedTrainConfig(lr=1e-2, total_steps=4000, num_rays=4096,
                             grid_update_interval=16, grid_full_updates=0)
    ccfg = CurvedFieldConfig(field=MeshFieldConfig(), light_model="SH")
    tr = CurvedTrainer(ds, mesh_field.make_state(mp), ccfg, rcfg, tcfg,
                       key=jax.random.PRNGKey(7))
    mark("trainer")
    tr.initialize_states(1)
    mark("init_states")
    tr.train(1)
    mark("first_step_compiled")
    npose = orbit_pose(np.pi / 2 + 0.2, 0.3, ds.radius)
    gtn = gt_white(npose, ds.intrinsics, ds.sphere_radius)
    gt0 = gt_white(np.asarray(ds.poses[0]), ds.intrinsics, ds.sphere_radius)
    save_png(gtn, "r4_novel_gt.png")

    done = 1
    for target in (700, 1500):
        t0 = time.perf_counter()
        tr.train(target - done)
        done = target
        t_train = time.perf_counter() - t0

        arms = {
            "proxy_cap5": dataclasses.replace(rcfg, infer_color_cap=5),
            "proxy_cap8": rcfg,
            "proxy_cap12": dataclasses.replace(rcfg, infer_color_cap=12),
            "proxy_cap16": dataclasses.replace(rcfg, infer_color_cap=16),
            "pool": dataclasses.replace(rcfg, infer_mode="pool"),
        }
        rec = {"steps": target, "train_s": round(t_train, 1)}
        for name, cfg_a in arms.items():
            tr.rcfg = cfg_a
            img, dt = timed_frame(tr, npose)
            rec[name] = round(float(psnr_fn(img, gtn)), 2)
            rec[name + "_s"] = round(dt, 3)
            save_png(img, f"r4_s{target}_{name}.png")
        tr.rcfg = rcfg
        out_t = tr.render_frame(np.asarray(ds.poses[0]), use_ema=False)
        rec["train_view_proxy"] = round(float(psnr_fn(out_t["image"],
                                                      gt0)), 2)
        emit(**rec)


if __name__ == "__main__":
    main()
