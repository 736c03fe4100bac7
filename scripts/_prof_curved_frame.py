"""Profile the curved flagship's frame path on the real chip (VERDICT r3
next #4: curved_render_fps 1.8 -> >= 5).

Trains the bench curved config once (700 steps, state pickled under
/root/repo/.bench/ for re-runs), then times each device program of the
frame: ray gen, prepass+carve, the fused chunk, and within one chunk the
proxy-sigma, survivor-select, anchor-gather, and field-eval phases
separately, across caps.

Run: python scripts/_prof_curved_frame.py
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import dataclasses
import json
import pickle
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from nerf_texture_tpu.data.poses import orbit_pose
from nerf_texture_tpu.data.synthetic import SyntheticSphereDataset
from nerf_texture_tpu.geometry.mesh import make_icosphere
from nerf_texture_tpu.geometry.projector import MeshProjector
from nerf_texture_tpu.models import mesh_field
from nerf_texture_tpu.models.curved_field import CurvedFieldConfig
from nerf_texture_tpu.models.mesh_field import MeshFieldConfig
from nerf_texture_tpu.ops import occupancy as occ_mod
from nerf_texture_tpu.render.renderer import RenderConfig
from nerf_texture_tpu.train.curved_trainer import (CurvedTrainConfig,
                                                   CurvedTrainer)
from nerf_texture_tpu.utils.metrics import psnr as psnr_fn

H = W = 800
STATE = "/root/repo/.bench/curved_r4_state.pkl"


def emit(**kw):
    print(json.dumps(kw), flush=True)


RCFG = RenderConfig(bound=1.0, cascades=1, grid_size=128, max_steps=512,
                    max_samples_train=128, max_samples_infer=96,
                    ray_chunk=16384, pool_mean_samples=64,
                    pool_mean_samples_infer=24, march_steps_infer=256,
                    proxy_samples=0, proxy_refined=32)


def build_trainer():
    ds = SyntheticSphereDataset(n_frames=4, H=H, W=W)
    mp = MeshProjector(make_icosphere(4, radius=0.5))
    tcfg = CurvedTrainConfig(lr=1e-2, total_steps=4000, num_rays=4096,
                             grid_update_interval=16, grid_full_updates=0)
    ccfg = CurvedFieldConfig(field=MeshFieldConfig(), light_model="SH")
    tr = CurvedTrainer(ds, mesh_field.make_state(mp), ccfg, RCFG, tcfg,
                       key=jax.random.PRNGKey(7))
    return tr, ds


def main():
    tr, ds = build_trainer()
    if os.path.exists(STATE):
        with open(STATE, "rb") as fh:
            st = pickle.load(fh)
        tr.state = tr.state._replace(
            params=jax.tree.map(jnp.asarray, st["params"]),
            occ=occ_mod.OccupancyGrid(
                density=jnp.asarray(st["density"]),
                occ=jnp.asarray(st["occ"]),
                mean_density=jnp.asarray(st["mean_density"]),
                iter_density=tr.state.occ.iter_density),
            step=jnp.asarray(700, jnp.int32))
        emit(loaded=STATE)
    else:
        tr.initialize_states(1)
        t0 = time.perf_counter()
        tr.train(700)
        emit(trained_s=round(time.perf_counter() - t0, 1))
        os.makedirs(os.path.dirname(STATE), exist_ok=True)
        with open(STATE, "wb") as fh:
            pickle.dump({
                "params": jax.tree.map(np.asarray, tr.state.params),
                "density": np.asarray(tr.state.occ.density),
                "occ": np.asarray(tr.state.occ.occ),
                "mean_density": np.asarray(tr.state.occ.mean_density),
            }, fh)

    npose = orbit_pose(np.pi / 2 + 0.2, 0.3, ds.radius)

    def timed(fn, n=4):
        out = fn()
        np.asarray(jax.tree.leaves(out)[0])
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn()
        np.asarray(jax.tree.leaves(out)[0])
        return (time.perf_counter() - t0) / n

    # whole-frame across caps and chunk sizes
    for cap in (4, 5, 8):
        for chunk in (16384, 32768):
            cfg = dataclasses.replace(RCFG, infer_color_cap=cap,
                                      ray_chunk=chunk)
            tr.rcfg = cfg
            dt = timed(lambda: tr.render_frame(npose, use_ema=False)
                       ["image"])
            img = np.asarray(tr.render_frame(npose,
                                             use_ema=False)["image"])
            from nerf_texture_tpu.data.synthetic import render_gt_sphere
            gt = render_gt_sphere(npose, ds.intrinsics, H, W,
                                  ds.sphere_radius)
            gtw = (gt[..., :3] / 255.0 * (gt[..., 3:] / 255.0)
                   + 1.0 - gt[..., 3:] / 255.0)
            emit(arm=f"cap{cap}_chunk{chunk}", frame_s=round(dt, 3),
                 fps=round(1 / dt, 2),
                 psnr=round(float(psnr_fn(img, gtw)), 2))
    tr.rcfg = RCFG

    # phase split inside one chunk at the default cap: time the frame
    # with the field swapped for (a) sigma-only (no normal/light) and
    # (b) constant color (no field at all) to attribute the field cost
    from nerf_texture_tpu.train import curved_trainer as CT
    from nerf_texture_tpu.models import curved_field as CF

    def render_with_field(fieldvariant):
        static = (tr.ccfg, tr.mode, tr.visual_mode, tr.light_visual_mode)
        bundle = {"params": tr.state.params, "field_state": tr.field_state,
                  "rt": tr.runtime, "anchor_tab": tr._anchor_table()}
        from nerf_texture_tpu.render.renderer import render_image
        return render_image(fieldvariant, static, bundle,
                            tr.state.occ.occ, npose, tr.intrinsics, H, W,
                            tr.rcfg, bg_color=1.0,
                            anchor_apply=CT.curved_anchor_apply,
                            sigma_apply=CT.curved_sigma_apply,
                            density=tr.state.occ.density)

    def sigma_only_apply(bundle, x, d, static, frames=None):
        ccfg = static[0]
        sigma, aux = CF.sigma_with_aux(
            bundle["params"], bundle["field_state"], x, d, ccfg,
            bundle["rt"], mode="none", frames=frames)
        rgb = jnp.broadcast_to(jnp.asarray([0.5, 0.5, 0.5]),
                               x.shape[:1] + (3,))
        return sigma, rgb

    def const_field_apply(bundle, x, d, static, frames=None):
        r = jnp.linalg.norm(x, axis=-1)
        sigma = 1e3 * jnp.exp(-((r - 0.5) / 0.05) ** 2)
        rgb = jnp.broadcast_to(jnp.asarray([0.5, 0.5, 0.5]),
                               x.shape[:1] + (3,))
        return sigma, rgb

    dt_full = timed(lambda: tr.render_frame(npose, use_ema=False)["image"])
    dt_sig = timed(lambda: render_with_field(sigma_only_apply)["image"])
    dt_const = timed(lambda: render_with_field(const_field_apply)["image"])
    emit(phase_full_s=round(dt_full, 3), phase_sigma_only_s=round(dt_sig, 3),
         phase_const_field_s=round(dt_const, 3))


if __name__ == "__main__":
    main()
