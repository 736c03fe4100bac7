"""Round-5: phase breakdown of ONE baked curved chunk (16K rays, TPU).

Times each stage of the baked proxy chunk pipeline separately (own jit,
warm, synced) on the saved bench state.  Fusion makes the phase sum
exceed the fused chunk time -- use for RATIOS, not absolutes.

Run: python scripts/_r5_chunk_phases.py
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import dataclasses
import json
import pickle
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from nerf_texture_tpu.data.poses import orbit_pose
from nerf_texture_tpu.data.rays import get_rays
from nerf_texture_tpu.ops import occupancy as occ_mod
from nerf_texture_tpu.ops.proxy_select import proxy_select_cdf
from nerf_texture_tpu.render import renderer as R
from nerf_texture_tpu.render import baked as baked_mod
from nerf_texture_tpu.models import curved_field, normal_net
from nerf_texture_tpu.ops import freq_encode
from _prof_curved_frame import RCFG, build_trainer, H, W

STATE = "/root/repo/.bench/curved_r5_state.pkl"
CHUNK = 16384
CAP = 5
K = 24


def emit(**kw):
    print(json.dumps(kw), flush=True)


def timed(fn, *args, n=10):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


tr, ds = build_trainer()
tr.anchor_collapse = True
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
tr.rcfg = dataclasses.replace(RCFG, infer_color_cap=CAP, proxy_refined=K,
                              prepass_block=8, prepass_tau_cull=0.1)
cfg = tr.rcfg

bake, ext = tr.bake_atlas()
jax.block_until_ready(bake.atlas)
pose = orbit_pose(np.pi / 2 + 0.2, 0.3, ds.radius)
intr = np.asarray(ds.intrinsics, np.float32)

# --- prepass (new block-perm path) ---
occ = tr.state.occ.occ
density = tr.state.occ.density
aabb_np, occ_dil = R._occ_prepass_arrays(occ, cfg, density=density)
dens8 = R._dens8_cached(density, cfg)
aabb = jnp.asarray(aabb_np)
B = cfg.prepass_block
Hb, Wb = -(-H // B), -(-W // B)
nb = Hb * Wb
intr_b = intr / B
rays_b = get_rays(jnp.asarray(pose), jnp.asarray(intr_b), Hb, Wb)
blk = min(131072, R._round_up(nb, 8192))
tauK = R._tau_samples(cfg, aabb_np)
pp = lambda: R._prepass_compact(
    rays_b["rays_o"], rays_b["rays_d"], occ_dil, aabb, cfg.bound,
    cfg.min_near, grid_size=cfg.grid_size, block=blk,
    margin_steps=cfg.prepass_margin_steps, H=H, W=W, Hb=Hb, Wb=Wb, B=B,
    nb=nb, dens8=dens8, tau_cull=cfg.prepass_tau_cull, tau_samples=tauK)
emit(phase="prepass_compact", ms=round(timed(lambda: pp()[0]), 2),
     tau_samples=tauK)
perm, count_d, t0_d, t1_d = pp()
emit(live=int(count_d), live_frac=round(int(count_d) / (H * W), 3))

# prepass WITHOUT the tau carve (isolates the tau sweep cost)
pp0 = lambda: R._prepass_compact(
    rays_b["rays_o"], rays_b["rays_d"], occ_dil, aabb, cfg.bound,
    cfg.min_near, grid_size=cfg.grid_size, block=blk,
    margin_steps=cfg.prepass_margin_steps, H=H, W=W, Hb=Hb, Wb=Wb, B=B,
    nb=nb)
emit(phase="prepass_no_tau", ms=round(timed(lambda: pp0()[0]), 2))

# --- chunk inputs (first chunk, all live) ---
pose3 = jnp.asarray(pose, jnp.float32)[:3]
intrj = jnp.asarray(intr)
idx_c = jnp.asarray(np.asarray(perm)[:CHUNK])
idx_b = (idx_c // (W * B)) * Wb + (idx_c % W) // B
nears = jnp.take(t0_d, idx_b)
fars = jnp.take(t1_d, idx_b)

rays_fn = jax.jit(lambda i: R._chunk_rays(pose3, intrj, i, jnp.int32(0), W))
ro, rd = jax.block_until_ready(rays_fn(idx_c))

params = tr.state.params
ccfg = tr.ccfg
fcfg = ccfg.field
F = fcfg.encoder_f_out_dim

# Cumulative fused prefixes of the chunk pipeline: stage N's jit runs
# stages 1..N.  Successive diffs give each stage's marginal cost with
# the per-dispatch floor cancelled (a standalone trivial program costs
# ~2.5 ms through the tunnel).


def _sweep(ro, rd, nears, fars):
    span = jnp.maximum(fars - nears, 0.0)
    frac = (jnp.arange(K, dtype=ro.dtype) + 0.5) / K
    ts = nears[:, None] + span[:, None] * frac
    return R._proxy_sigma(dens8, ro, rd, ts, cfg.grid_size, cfg.bound), ts


def _select(ro, rd, nears, fars):
    sig_p, ts = _sweep(ro, rd, nears, fars)
    ts2, dt2, valid2 = proxy_select_cdf(ts, sig_p, nears, fars, cap=CAP,
                                        w_eps=float(cfg.infer_w_eps))
    x2 = jnp.clip(ro[:, None, :] + ts2[..., None] * rd[:, None, :],
                  -cfg.bound, cfg.bound).reshape(-1, 3)
    return ts2, dt2, valid2, x2


def _anchor(bake, ext, ro, rd, nears, fars):
    ts2, dt2, valid2, x2 = _select(ro, rd, nears, fars)
    frames = baked_mod.anchor_frames_ext(bake, ext, x2, valid2.reshape(-1))
    return frames, ts2, dt2, valid2, x2


def _atlas(bake, ext, ro, rd, nears, fars):
    frames, ts2, dt2, valid2, x2 = _anchor(bake, ext, ro, rd, nears, fars)
    vals, tile_ok = baked_mod.lookup(bake, frames, x2)
    return vals, tile_ok, frames, ts2, dt2, valid2, x2


def _sigma(params, bake, ext, ro, rd, nears, fars):
    vals, tile_ok, frames, ts2, dt2, valid2, x2 = _atlas(
        bake, ext, ro, rd, nears, fars)
    nc = frames["normal"] / (jnp.linalg.norm(frames["normal"], axis=-1,
                                             keepdims=True) + 1e-5)
    h = jnp.sum((x2 - frames["p0"]) * nc, axis=-1, keepdims=True)
    z = freq_encode(h, fcfg.z_multires)
    sig, geo = curved_field._sigma_from_embed(
        params, jnp.concatenate([vals[:, :F], z], axis=-1))
    h_mask = (jnp.abs(h[..., 0]) < fcfg.h_threshold) \
        & frames["hit"] & tile_ok
    sig = jnp.where(h_mask, sig, 0.0)
    return sig, geo, z, h_mask, vals, frames, ts2, dt2, valid2, x2, nc


def _shade(params, bake, ext, ro, rd, nears, fars):
    (sig, geo, z, h_mask, vals, frames, ts2, dt2, valid2, x2,
     nc) = _sigma(params, bake, ext, ro, rd, nears, fars)
    d2 = jnp.broadcast_to(rd[:, None, :], (CHUNK, CAP, 3)).reshape(-1, 3)
    color = curved_field._baked_shade(
        params, vals[:, :F], vals[:, F:], z, geo, frames["tbn"], nc, d2,
        ccfg, tr.runtime)
    return sig, color, ts2, dt2, valid2


def _full(params, bake, ext, ro, rd, nears, fars, idx_c):
    sig, color, ts2, dt2, valid2 = _shade(params, bake, ext, ro, rd,
                                          nears, fars)
    sigma2 = sig.reshape(CHUNK, CAP)
    rgb2 = color.reshape(CHUNK, CAP, 3)
    sdt2 = jnp.where(valid2, sigma2 * dt2, 0.0)
    cs2 = jnp.cumsum(sdt2, axis=-1)
    trans2 = jnp.exp(-(cs2 - sdt2))
    w2 = jnp.where(valid2, trans2 * (1.0 - jnp.exp(-sdt2)), 0.0)
    img = jnp.sum(w2[..., None] * rgb2, axis=1)
    buf = jnp.zeros((H * W, 3))
    return buf.at[idx_c].set(img)


stages = [
    ("cum1_sweep", jax.jit(lambda ro, rd, ne, fa: _sweep(ro, rd, ne,
                                                         fa)[0]),
     (ro, rd, nears, fars)),
    ("cum2_select", jax.jit(lambda ro, rd, ne, fa: _select(ro, rd, ne,
                                                           fa)[0]),
     (ro, rd, nears, fars)),
    ("cum3_anchor", jax.jit(lambda b, e, ro, rd, ne, fa: _anchor(
        b, e, ro, rd, ne, fa)[0]["p0"]),
     (bake, ext, ro, rd, nears, fars)),
    ("cum4_atlas", jax.jit(lambda b, e, ro, rd, ne, fa: _atlas(
        b, e, ro, rd, ne, fa)[0]),
     (bake, ext, ro, rd, nears, fars)),
    ("cum5_sigma", jax.jit(lambda p, b, e, ro, rd, ne, fa: _sigma(
        p, b, e, ro, rd, ne, fa)[0]),
     (params, bake, ext, ro, rd, nears, fars)),
    ("cum6_shade", jax.jit(lambda p, b, e, ro, rd, ne, fa: _shade(
        p, b, e, ro, rd, ne, fa)[1]),
     (params, bake, ext, ro, rd, nears, fars)),
    ("cum7_full", jax.jit(_full),
     (params, bake, ext, ro, rd, nears, fars, idx_c)),
]
prev = 0.0
for name, fn, args in stages:
    ms = timed(fn, *args)
    emit(phase=name, ms=round(ms, 2), marginal=round(ms - prev, 2))
    prev = ms

# --- reference: the fused chunk + whole frame ---
from nerf_texture_tpu.train.curved_trainer import (
    curved_field_apply_baked, curved_anchor_apply_baked)

bundle = {"params": params, "field_state": tr.field_state,
          "rt": tr.runtime, "bake": bake, "anchor_ext": ext}
static = (ccfg, "none", "RGB", "Full")
frame0 = R._frame_buffer_packed(1.0, n=H * W)
chunk_fn = lambda: R._render_chunk_fused(
    curved_field_apply_baked, static, bundle, occ, pose3, intrj,
    jnp.int32(0), frame0, perm, count_d, jnp.int32(0), t0_d, t1_d,
    dens8, aabb, cfg,
    anchor_apply=curved_anchor_apply_baked, B=B, W=W, Wb=Wb,
    chunk=CHUNK)
emit(phase="fused_chunk", ms=round(timed(chunk_fn), 2),
     n_chunks=-(-int(count_d) // CHUNK))

t_frame = timed(lambda: tr.render_frame(pose, use_ema=False,
                                        baked=True)["image"], n=5)
emit(phase="whole_frame", ms=round(t_frame, 2),
     fps=round(1e3 / t_frame, 2))
