"""Diagnose BENCH_r03 curved_novel_psnr = 13.54 dB (VERDICT r3 #1).

Separates four suspects on the real chip:
  (a) data starvation  -- the bench trains the curved model on 4
      all-equatorial frames while the NGP it is compared against gets 8
      frames with elevation diversity;
  (b) under-training   -- 700 steps vs the reference's 40k
      (readme.md:241 recommends 10-20 min);
  (c) render-path loss -- proxy survivor selection vs the exact pool
      march at eval time;
  (d) approximation stack -- per-ray tangent-plane projection + anchor
      table vs the exact per-sample projection chain.

Emits one JSON line per measurement to stdout.
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


def run_phase(n_frames: int, steps_list, tag: str):
    ds = SyntheticSphereDataset(n_frames=n_frames, H=H, W=W)
    mp = MeshProjector(make_icosphere(4, radius=0.5))
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
    tr.initialize_states(1)
    npose = orbit_pose(np.pi / 2 + 0.2, 0.3, ds.radius)
    gtn = gt_white(npose, ds.intrinsics, ds.sphere_radius)
    gt0 = gt_white(np.asarray(ds.poses[0]), ds.intrinsics, ds.sphere_radius)

    done = 0
    for target in steps_list:
        t0 = time.perf_counter()
        tr.train(target - done)
        done = target
        t_train = time.perf_counter() - t0

        # proxy path (bench default)
        out_p = tr.render_frame(npose, use_ema=False)
        psnr_proxy = float(psnr_fn(out_p["image"], gtn))
        out_t = tr.render_frame(np.asarray(ds.poses[0]), use_ema=False)
        psnr_train = float(psnr_fn(out_t["image"], gt0))

        # pool path (reference-exact march)
        rcfg_pool = dataclasses.replace(tr.rcfg, infer_mode="pool")
        old = tr.rcfg
        tr.rcfg = rcfg_pool
        out_pool = tr.render_frame(npose, use_ema=False)
        psnr_pool = float(psnr_fn(out_pool["image"], gtn))
        tr.rcfg = old

        emit(tag=tag, frames=n_frames, steps=target,
             novel_proxy=round(psnr_proxy, 2),
             novel_pool=round(psnr_pool, 2),
             train_view_proxy=round(psnr_train, 2),
             train_s=round(t_train, 1))
        save_png(out_p["image"], f"{tag}_s{target}_novel_proxy.png")
        save_png(out_pool["image"], f"{tag}_s{target}_novel_pool.png")
        if target == steps_list[0]:
            save_png(gtn, f"{tag}_novel_gt.png")
            save_png(out_t["image"], f"{tag}_s{target}_train_proxy.png")

    # (d) approximation stack at the final state:
    # exact per-sample projection (per_ray_projection=False) through pool
    ccfg_exact = dataclasses.replace(
        ccfg, field=dataclasses.replace(ccfg.field,
                                        per_ray_projection=False))
    old_c, old_r = tr.ccfg, tr.rcfg
    tr.ccfg = ccfg_exact
    tr.rcfg = dataclasses.replace(old_r, infer_mode="pool")
    out_e = tr.render_frame(npose, use_ema=False)
    psnr_exact = float(psnr_fn(out_e["image"], gtn))
    tr.ccfg, tr.rcfg = old_c, old_r
    emit(tag=tag, frames=n_frames, steps=done,
         novel_pool_exact_projection=round(psnr_exact, 2))
    save_png(out_e["image"], f"{tag}_s{done}_novel_pool_exact.png")

    # anchor table off (per-ray kNN+plane-fit at render time)
    tr.anchor_cache = False
    out_a = tr.render_frame(npose, use_ema=False)
    psnr_noanchor = float(psnr_fn(out_a["image"], gtn))
    tr.anchor_cache = True
    emit(tag=tag, frames=n_frames, steps=done,
         novel_proxy_no_anchor_table=round(psnr_noanchor, 2))
    return tr


if __name__ == "__main__":
    t0 = time.perf_counter()
    run_phase(4, [700, 1500, 3000], "bench4f")
    emit(phase="bench4f done", total_s=round(time.perf_counter() - t0, 1))
    run_phase(8, [700, 1500, 3000], "fair8f")
    emit(phase="all done", total_s=round(time.perf_counter() - t0, 1))
