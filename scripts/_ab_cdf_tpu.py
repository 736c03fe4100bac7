"""On-chip whole-frame A/B of inverse-CDF survivor placement vs top-k.

The CPU-exact A/B (scripts/_ab_cdf.py) showed cdf cap4-6 beats topk cap8
on PSNR; the field eval scales with cap, so this measures the frame-time
side on the v5e at the exact bench config.  Reuses the trained state from
scripts/_prof_bench_frame.py.  Run: timeout 1700 python scripts/_ab_cdf_tpu.py
"""
import dataclasses
import gc
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from _prof_bench_frame import H, W, ds, make_trainer, rcfg0
from nerf_texture_tpu.data.poses import orbit_pose
from nerf_texture_tpu.data.synthetic import render_gt_sphere
from nerf_texture_tpu.utils.metrics import psnr as psnr_fn


def time_it(fn, n=5):
    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    pose = orbit_pose(np.pi / 2 + 0.2, 0.4, ds.radius)
    gt = render_gt_sphere(pose, ds.intrinsics, H, W, ds.sphere_radius)
    gt_rgb = gt[..., :3].astype(np.float32) / 255.0
    gt_a = gt[..., 3:].astype(np.float32) / 255.0
    gt_white = gt_rgb * gt_a + (1.0 - gt_a)

    base = dict(ray_chunk=16384, proxy_refined=24)
    for name, kw in [
            # infer_cdf=False explicitly: the top-k baseline must not
            # inherit the (now default-True) cdf flag, or this arm would
            # measure cdf-at-cap-8 under a 'topk' label
            ("topk cap8 (bench)", dict(**base, infer_cdf=False)),
            ("cdf cap4         ", dict(**base, infer_cdf=True,
                                       infer_color_cap=4)),
            ("cdf cap5         ", dict(**base, infer_cdf=True,
                                       infer_color_cap=5)),
            ("cdf cap6         ", dict(**base, infer_cdf=True,
                                       infer_color_cap=6)),
            ("cdf cap6 ref32   ", dict(ray_chunk=16384, proxy_refined=32,
                                       infer_cdf=True, infer_color_cap=6)),
    ]:
        rcfg = dataclasses.replace(rcfg0, **kw)
        tr = make_trainer(rcfg)
        dt = time_it(lambda: tr.render_frame(pose, use_ema=False)["image"])
        out = tr.render_frame(pose, use_ema=False)
        ws = float(jnp.sum(out["weights_sum"]))
        p = psnr_fn(out["image"], gt_white)
        print(f"  {name}: {dt*1e3:.0f} ms ({1/dt:.2f} fps) wsum={ws:.0f} "
              f"psnr={p:.2f}", flush=True)
        del tr, out
        gc.collect()


if __name__ == "__main__":
    main()
