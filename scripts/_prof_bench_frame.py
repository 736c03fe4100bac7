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
                       ray_chunk=262144, pool_mean_samples=64,
                       pool_mean_samples_infer=24, proxy_samples=0,
                       proxy_refined=32)
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
    bg_image, depth0, wsum0 = R._frame_buffers(1.0, n=H * W)
    chunk = min(cfg.ray_chunk, H * W)

    def one_chunk(c=0):
        return R._render_chunk_fused(
            ngp_field_apply, mcfg, tr.state.params, occ,
            rays["rays_o"], rays["rays_d"], bg_image, perm, count_d,
            jnp.int32(c * chunk), t0_d, t1_d, dens8, aabb,
            bg_image, depth0, wsum0, cfg, B=B, W=W, Wb=Wb, chunk=chunk)[0]

    n_chunks = -(-count // chunk)
    dt = time_it(one_chunk)
    print(f"  fused chunk ({chunk} rays): {dt*1e3:.1f} ms x {n_chunks} "
          f"chunks", flush=True)

    # config A/Bs (whole frame)
    for name, kw in [("pallas-sel", dict(proxy_pallas=True)),
                     ("bf16-table", dict(proxy_bf16=True)),
                     ("pallas+b16", dict(proxy_pallas=True,
                                         proxy_bf16=True)),
                     ("chunk 128K", dict(ray_chunk=131072)),
                     ("chunk 64K ", dict(ray_chunk=65536)),
                     ("refined 24", dict(proxy_refined=24)),
                     ("block 8   ", dict(prepass_block=8))]:
        rcfg = dataclasses.replace(rcfg0, **kw)
        t2 = make_trainer(rcfg)
        dt = time_it(lambda: t2.render_frame(pose, use_ema=False)["image"])
        out = t2.render_frame(pose, use_ema=False)
        ws = float(jnp.sum(out["weights_sum"]))
        print(f"  {name}: {dt*1e3:.0f} ms ({1/dt:.2f} fps) wsum={ws:.0f}",
              flush=True)


if __name__ == "__main__":
    main()
