"""Round-5 prepass analysis on the saved r4 curved bench state.

Measures (a) the prepass's internal stage costs, (b) live-ray counts
after each carve stage vs the TRUE silhouette, (c) candidate knob arms
(tau, block size, walk steps), and (d) the bake-cell count for the
baked-texture mode (occupied & anchorable & within-shell cells).

Run: python scripts/_r5_prepass.py
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
from nerf_texture_tpu.data.rays import get_rays
from nerf_texture_tpu.ops import occupancy as occ_mod
from nerf_texture_tpu.render import renderer as R
from _prof_curved_frame import RCFG, STATE, build_trainer, H, W


def emit(**kw):
    print(json.dumps(kw), flush=True)


def timed(fn, n=6):
    out = fn()
    jax.block_until_ready(out)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    return (time.perf_counter() - t0) / n


tr, ds = build_trainer()
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
npose = orbit_pose(np.pi / 2 + 0.2, 0.3, ds.radius)
occ = tr.state.occ.occ
density = tr.state.occ.density
rcfg = dataclasses.replace(RCFG, proxy_refined=24, infer_color_cap=5)

# ---- true silhouette: render once, count weights_sum > 1e-3 ----
tr.rcfg = rcfg
out = tr.render_frame(npose, use_ema=False)
wsum = np.asarray(out["weights_sum"])
true_live = int((wsum > 1e-3).sum())
emit(stage="true_silhouette", live=true_live,
     frac=round(true_live / (H * W), 3))

# ---- prepass arrays ----
aabb_np, occ_dil = R._occ_prepass_arrays(occ, rcfg, density=density)
dens8 = R._dens8_cached(density, rcfg)
aabb = jnp.asarray(aabb_np)
intr = tr.intrinsics

for B in (4, 8):
    Hb, Wb = -(-H // B), -(-W // B)
    nb = Hb * Wb
    intr_b = np.asarray(intr, np.float32) / B
    rays_b = get_rays(jnp.asarray(npose), jnp.asarray(intr_b), Hb, Wb)
    blk = min(131072, R._round_up(nb, 8192))

    # full prepass across tau arms
    for tau in (0.0, 3e-3, 0.01, 0.03, 0.1):
        pp = lambda: R._prepass_compact(
            rays_b["rays_o"], rays_b["rays_d"], occ_dil, aabb, rcfg.bound,
            rcfg.min_near, grid_size=rcfg.grid_size, block=blk,
            margin_steps=rcfg.prepass_margin_steps, H=H, W=W, Hb=Hb,
            Wb=Wb, B=B, nb=nb, dens8=dens8, tau_cull=tau,
            tau_samples=rcfg.prepass_tau_samples)
        t = timed(lambda: pp()[0])
        perm, count_d, t0_d, t1_d = pp()
        emit(stage="prepass", B=B, tau=tau, ms=round(t * 1e3, 1),
             live=int(count_d),
             frac=round(int(count_d) / (H * W), 3))

    # stage split: occupancy walk alone vs walk+tau
    walk = lambda: R._occ_ray_hits(
        jnp.pad(rays_b["rays_o"], ((0, blk * ((nb + blk - 1) // blk) - nb),
                                   (0, 0)), mode="edge"),
        jnp.pad(rays_b["rays_d"], ((0, blk * ((nb + blk - 1) // blk) - nb),
                                   (0, 0)), mode="edge"),
        occ_dil, aabb, rcfg.bound, rcfg.min_near, rcfg.grid_size,
        block=blk, margin_steps=rcfg.prepass_margin_steps)
    t_walk = timed(lambda: walk()[0])
    emit(stage="occ_walk_only", B=B, ms=round(t_walk * 1e3, 1))

# ---- frame time at the tau arms (B=4) ----
for tau in (3e-3, 0.01, 0.03):
    tr.rcfg = dataclasses.replace(rcfg, prepass_tau_cull=tau)
    dt = timed(lambda: tr.render_frame(npose, use_ema=False)["image"], n=4)
    img = np.asarray(tr.render_frame(npose, use_ema=False)["image"])
    from nerf_texture_tpu.data.synthetic import render_gt_sphere
    from nerf_texture_tpu.utils.metrics import psnr as psnr_fn
    gt = render_gt_sphere(npose, ds.intrinsics, H, W, ds.sphere_radius)
    gtw = (gt[..., :3] / 255.0 * (gt[..., 3:] / 255.0)
           + 1.0 - gt[..., 3:] / 255.0)
    emit(stage="frame", tau=tau, ms=round(dt * 1e3), fps=round(1 / dt, 2),
         psnr=round(float(psnr_fn(img, gtw)), 2))

# ---- bake-cell census for the baked-texture mode ----
anchor_tab = np.asarray(tr._anchor_table()).reshape(-1, 16)
Hg = rcfg.grid_size
dens_np = np.asarray(density).reshape(-1)
occ_np = np.asarray(occ).reshape(-1)
hit = anchor_tab[:, 15] > 0.5
# |h| at cell center: distance from center to its anchor plane
centers = ((np.stack(np.meshgrid(*([np.arange(Hg)] * 3), indexing="ij"),
                     -1).reshape(-1, 3) + 0.5) / Hg * 2.0 - 1.0)
h = np.abs(np.sum((centers - anchor_tab[:, 0:3])
                  * anchor_tab[:, 3:6], axis=-1))
cell = 2.0 / Hg
shell = h < (0.1 + cell * np.sqrt(3.0))
occ_b = occ_np > 0
# 1-dilated occupancy
od = occ_b.reshape(Hg, Hg, Hg)
for ax in range(3):
    od = od | np.roll(od, 1, axis=ax) | np.roll(od, -1, axis=ax)
od = od.reshape(-1)
emit(stage="bake_census", occupied=int(occ_b.sum()),
     occupied_dil=int(od.sum()), hit=int(hit.sum()),
     shell=int(shell.sum()),
     occ_and_shell=int((occ_b & shell & hit).sum()),
     occdil_and_shell=int((od & shell & hit).sum()))
