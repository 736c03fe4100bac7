"""Phase profile of the EXACT bench.py frame path on the real chip.

Trains 700 steps with the bench config once (cached to /tmp), then times
each device program of render_image separately plus whole-frame A/Bs:
proxy_pallas, proxy_bf16, ray_chunk.  Run: timeout 1700 python
scripts/_prof_bench_frame.py
"""
import dataclasses
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from nerf_texture_tpu.data.poses import orbit_pose
from nerf_texture_tpu.data.rays import get_rays
from nerf_texture_tpu.data.synthetic import SyntheticSphereDataset
from nerf_texture_tpu.models.ngp import NGPConfig
from nerf_texture_tpu.ops.occupancy import OccupancyGrid
from nerf_texture_tpu.render import renderer as R
from nerf_texture_tpu.train.trainer import TrainConfig, Trainer

STATE = "/root/repo/.bench/ngp_bench_state.pkl"
H = W = 800
ds = SyntheticSphereDataset(n_frames=8, H=H, W=W)
mcfg = NGPConfig(bound=1.0, num_levels=8, level_dim=4, log2_bricks=16,
                 desired_resolution=2048)
rcfg0 = R.RenderConfig(bound=1.0, cascades=1, grid_size=128, max_steps=384,
                       max_samples_train=192, max_samples_infer=96,
                       ray_chunk=16384, pool_mean_samples=64,
                       pool_mean_samples_infer=24, proxy_samples=0,
                       proxy_refined=24)
tcfg = TrainConfig(lr=1e-2, total_steps=2000, num_rays=4096,
                   grid_decay=0.85)


def make_trainer(rcfg):
    tr = Trainer(ds, mcfg, rcfg, tcfg, key=jax.random.PRNGKey(7))
    if os.path.exists(STATE):
        with open(STATE, "rb") as fh:
            st = pickle.load(fh)
        tr.state = tr.state._replace(
            params=jax.tree.map(jnp.asarray, st["params"]),
            occ=OccupancyGrid(density=jnp.asarray(st["density"]),
                              occ=jnp.asarray(st["occ"]),
                              mean_density=jnp.asarray(st["mean_density"]),
                              iter_density=tr.state.occ.iter_density))
        tr._marked = True
    else:
        os.makedirs(os.path.dirname(STATE), exist_ok=True)
        print("training 700 steps...", flush=True)
        tr.train(700)
        st = {"params": jax.tree.map(np.asarray, tr.state.params),
              "density": np.asarray(tr.state.occ.density),
              "occ": np.asarray(tr.state.occ.occ),
              "mean_density": np.asarray(tr.state.occ.mean_density)}
        with open(STATE, "wb") as fh:
            pickle.dump(st, fh)
        print("saved; occ frac", st["occ"].mean(), flush=True)
    return tr


def time_it(fn, n=5):
    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    tr = make_trainer(rcfg0)
    pose = orbit_pose(np.pi / 2 + 0.2, 0.4, ds.radius)
    global gt_white, psnr_fn
    from nerf_texture_tpu.data.synthetic import render_gt_sphere
    from nerf_texture_tpu.utils.metrics import psnr as psnr_fn
    gt = render_gt_sphere(pose, ds.intrinsics, H, W, ds.sphere_radius)
    gt_rgb = gt[..., :3].astype(np.float32) / 255.0
    gt_a = gt[..., 3:].astype(np.float32) / 255.0
    gt_white = gt_rgb * gt_a + (1.0 - gt_a)
    out0 = tr.render_frame(pose, use_ema=False)
    print(f"baseline psnr={psnr_fn(out0['image'], gt_white):.2f} "
          f"wsum={float(jnp.sum(out0['weights_sum'])):.0f}", flush=True)

    # whole frame (bench path)
    dt = time_it(lambda: tr.render_frame(pose, use_ema=False)["image"])
    print(f"frame total: {dt*1e3:.0f} ms ({1/dt:.2f} fps)", flush=True)

    # phases
    cfg = rcfg0
    occ = tr.state.occ.occ
    density = tr.state.occ.density
    aabb_np, occ_dil = R._occ_prepass_arrays(occ, cfg, density=density)
    dens8 = R._dens8_cached(density, cfg)
    aabb = jnp.asarray(aabb_np)
    rays = get_rays(jnp.asarray(pose), jnp.asarray(ds.intrinsics), H, W)
    dt = time_it(lambda: get_rays(jnp.asarray(pose),
                                  jnp.asarray(ds.intrinsics), H, W)["rays_o"])
    print(f"  ray gen: {dt*1e3:.1f} ms", flush=True)

    B = max(1, cfg.prepass_block)
    Hb, Wb = -(-H // B), -(-W // B)
    nb = Hb * Wb
    intr_b = np.asarray(ds.intrinsics, np.float32) / B
    rays_b = get_rays(jnp.asarray(pose), jnp.asarray(intr_b), Hb, Wb)
    blk = min(131072, R._round_up(nb, 8192))
    pp = lambda: R._prepass_compact(
        rays_b["rays_o"], rays_b["rays_d"], occ_dil, aabb, cfg.bound,
        cfg.min_near, grid_size=cfg.grid_size, block=blk,
        margin_steps=cfg.prepass_margin_steps, H=H, W=W, Hb=Hb, Wb=Wb,
        B=B, nb=nb)
    dt = time_it(lambda: pp()[0])
    print(f"  prepass+compact: {dt*1e3:.1f} ms", flush=True)
    perm, count_d, t0_d, t1_d = pp()
    count = int(count_d)
    print(f"  live count: {count} ({count/(H*W)*100:.0f}%)", flush=True)

    from nerf_texture_tpu.train.trainer import ngp_field_apply
    frame0 = R._frame_buffer_packed(1.0, n=H * W)
    chunk = min(cfg.ray_chunk, H * W)

    def one_chunk(c=0):
        return R._render_chunk_fused(
            ngp_field_apply, mcfg, tr.state.params, occ,
            jnp.asarray(pose, jnp.float32)[:3],
            jnp.asarray(ds.intrinsics, jnp.float32), jnp.int32(0),
            frame0, perm, count_d,
            jnp.int32(c * chunk), t0_d, t1_d, dens8, aabb,
            cfg, B=B, W=W, Wb=Wb, chunk=chunk)

    n_chunks = -(-count // chunk)
    dt = time_it(one_chunk)
    print(f"  fused chunk ({chunk} rays): {dt*1e3:.1f} ms x {n_chunks} "
          f"chunks", flush=True)

    # chunk-internal phases (jitted separately; sum > fused total because
    # fusion saves intermediate traffic -- useful for RATIOS only)
    pos = jnp.arange(chunk, dtype=jnp.int32)
    idx_c = jnp.take(perm, jnp.minimum(pos, count - 1))
    ro = jnp.take(rays["rays_o"], idx_c, axis=0)
    rd = jnp.take(rays["rays_d"], idx_c, axis=0)
    idx_b = (idx_c // (W * cfg.prepass_block)) * Wb \
        + (idx_c % W) // cfg.prepass_block
    nears = jnp.take(t0_d, idx_b)
    fars = jnp.take(t1_d, idx_b)
    K = cfg.proxy_refined

    @jax.jit
    def proxy_only(ro, rd, nears, fars):
        span = jnp.maximum(fars - nears, 0.0)
        frac = (jnp.arange(K, dtype=ro.dtype) + 0.5) / K
        ts = nears[:, None] + span[:, None] * frac
        return R._proxy_sigma(dens8, ro, rd, ts, cfg.grid_size, cfg.bound)

    dt = time_it(lambda: proxy_only(ro, rd, nears, fars))
    print(f"    proxy sigma ({chunk}x{K}): {dt*1e3:.1f} ms", flush=True)

    from nerf_texture_tpu.ops.proxy_select import proxy_select

    sig_p = proxy_only(ro, rd, nears, fars)
    span = jnp.maximum(fars - nears, 0.0)
    frac = (jnp.arange(K, dtype=np.float32) + 0.5) / K
    ts = nears[:, None] + span[:, None] * frac

    @jax.jit
    def select_only(ts, sig_p, nears, fars):
        return proxy_select(ts, sig_p, nears, fars,
                            cap=cfg.infer_color_cap,
                            w_eps=float(cfg.infer_w_eps))

    dt = time_it(lambda: select_only(ts, sig_p, nears, fars))
    print(f"    pallas select: {dt*1e3:.1f} ms", flush=True)

    ts2, skip2, valid2 = select_only(ts, sig_p, nears, fars)
    cap = min(cfg.infer_color_cap, K)

    @jax.jit
    def field_only(ro, rd, ts2):
        x2 = jnp.clip(ro[:, None, :] + ts2[..., None] * rd[:, None, :],
                      -cfg.bound, cfg.bound)
        d2 = jnp.broadcast_to(rd[:, None, :], x2.shape)
        return ngp_field_apply(tr.state.params, x2.reshape(-1, 3),
                               d2.reshape(-1, 3), mcfg)

    dt = time_it(lambda: field_only(ro, rd, ts2)[0])
    print(f"    field eval ({chunk}x{cap}): {dt*1e3:.1f} ms", flush=True)

    # config A/Bs (whole frame)
    import gc

    del tr     # each A/B builds a full trainer; two at once OOM the chip
    gc.collect()
    for name, kw in [("32K + ref24", dict(ray_chunk=32768,
                                          proxy_refined=24)),
                     ("16K + ref24", dict(ray_chunk=16384,
                                          proxy_refined=24)),
                     ("chunk 16K  ", dict(ray_chunk=16384)),
                     ("8K + ref24 ", dict(ray_chunk=8192,
                                          proxy_refined=24)),
                     ("32K+r24+b16", dict(ray_chunk=32768,
                                          proxy_refined=24,
                                          proxy_bf16=True))]:
        rcfg = dataclasses.replace(rcfg0, **kw)
        t2 = make_trainer(rcfg)
        dt = time_it(lambda: t2.render_frame(pose, use_ema=False)["image"])
        out = t2.render_frame(pose, use_ema=False)
        ws = float(jnp.sum(out["weights_sum"]))
        p = psnr_fn(out["image"], gt_white)
        print(f"  {name}: {dt*1e3:.0f} ms ({1/dt:.2f} fps) wsum={ws:.0f} "
              f"psnr={p:.2f}", flush=True)
        del t2, out
        gc.collect()


if __name__ == "__main__":
    main()
