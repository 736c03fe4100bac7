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
import os
import time

import numpy as np


def _tpu_alive(timeout_s: int = 120) -> bool:
    """Probe the axon TPU backend in a bounded subprocess.

    The tunnel can wedge (jax.devices() then hangs indefinitely in every
    fresh process), which would turn the bench into a silent hang and no
    JSON line at all.  Probing in a throwaway child bounds the damage."""
    import subprocess
    import sys

    if "cpu" in os.environ.get("JAX_PLATFORMS", "").lower():
        return False
    code = ("import jax, jax.numpy as jnp; d = jax.devices(); "
            "jnp.zeros(()).block_until_ready(); print(d[0].platform)")
    try:
        r = subprocess.run([sys.executable, "-c", code], timeout=timeout_s,
                           capture_output=True, text=True)
    except subprocess.TimeoutExpired:
        return False
    return r.returncode == 0 and "tpu" in (r.stdout or "").lower()


def main():
    on_tpu = _tpu_alive()
    if not on_tpu:
        # Honest degraded mode: the real chip is unreachable (wedged
        # tunnel).  Report a clearly-marked small CPU measurement rather
        # than hanging forever and shipping no bench at all.
        os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    if not on_tpu:
        # The env var alone is NOT enough: the container's sitecustomize
        # registers the axon plugin and pins jax_platforms at import time,
        # so the wedged-tunnel init still runs (and blocks ~25 min before
        # erroring).  The config update is what actually forces CPU.
        jax.config.update("jax_platforms", "cpu")

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from nerf_texture_tpu.data.synthetic import SyntheticSphereDataset
    from nerf_texture_tpu.models.ngp import NGPConfig
    from nerf_texture_tpu.render.renderer import RenderConfig
    from nerf_texture_tpu.train.trainer import TrainConfig, Trainer

    def sync(x):
        return jax.block_until_ready(np.asarray(x))

    # Degraded (CPU-fallback) mode shrinks every knob: its numbers are
    # explicitly non-comparable, so the only goal is to exercise the same
    # code path and finish in minutes on the single host core.
    H = W = 800 if on_tpu else 160
    ds = SyntheticSphereDataset(n_frames=8, H=H, W=W)
    mcfg = (NGPConfig(bound=1.0, num_levels=8, level_dim=4,
                      log2_bricks=16, desired_resolution=2048)
            if on_tpu else
            NGPConfig(bound=1.0, num_levels=6, level_dim=2,
                      log2_bricks=13, desired_resolution=512))
    # ray_chunk 16384 + proxy_refined 24: measured fastest at equal-or-
    # better PSNR once the whole frame runs as one while_loop program
    # (v5e, r3, scripts/_prof_bench_frame: 273 ms vs 580 at 262K chunks;
    # 8K regresses -- loop iterations outgrow the padding win).
    # infer_cdf + cap 4: stratified inverse-CDF survivor placement needs
    # half the field evals of top-k cap 8 at BETTER quality -- 182 ms /
    # 23.98 dB vs 271 ms / 23.85 (v5e, scripts/_ab_cdf_tpu.py).
    # prepass_block 8 + tau_cull 0.1: the r5-measured prepass setting
    # (halves the prepass at identical PSNR on this scene; the
    # novel_view_psnr line + regression warning gate it every round)
    rcfg = (RenderConfig(bound=1.0, cascades=1, grid_size=128,
                         max_steps=384, max_samples_train=192,
                         max_samples_infer=96, ray_chunk=16384,
                         pool_mean_samples=64, pool_mean_samples_infer=24,
                         proxy_samples=0, proxy_refined=24,
                         infer_color_cap=4, prepass_block=8,
                         prepass_tau_cull=0.1)
            if on_tpu else
            RenderConfig(bound=1.0, cascades=1, grid_size=64,
                         max_steps=192, max_samples_train=96,
                         max_samples_infer=48, ray_chunk=16384,
                         pool_mean_samples=32, pool_mean_samples_infer=16,
                         proxy_samples=0, proxy_refined=16,
                         infer_color_cap=4))
    # grid_decay 0.85: carves stale empty cells within the short bench
    # schedule (reference's 0.95 assumes 40k-iter training runs)
    tcfg = TrainConfig(lr=1e-2, total_steps=2000,
                       num_rays=4096 if on_tpu else 1024,
                       grid_decay=0.85)
    trainer = Trainer(ds, mcfg, rcfg, tcfg, key=jax.random.PRNGKey(7))

    # warmup + short training: realistic weights + occupancy grid.
    # cache_files_* counts entries in the persistent compilation cache:
    # a warm rerun should add ~zero files and show a much smaller
    # warmup_s (VERDICT r3 weak #8 -- cache effectiveness must be
    # visible in the bench record, not assumed).
    cache_dir = "/root/repo/.jax_cache"
    n_cache_before = (len(os.listdir(cache_dir))
                      if os.path.isdir(cache_dir) else 0)
    t0 = time.perf_counter()
    trainer.train(50)
    sync(trainer.state.params["grid"][:1])
    t_warm = time.perf_counter() - t0

    # long enough that the density grid converges to a tight shell --
    # the fps number below reflects a deployed (trained) scene
    n_train = 650 if on_tpu else 60
    t0 = time.perf_counter()
    trainer.train(n_train)
    sync(trainer.state.params["grid"][:1])
    iters_per_sec = n_train / (time.perf_counter() - t0)

    psnr = trainer.eval_psnr([0], use_ema=False)

    # render throughput (novel poses, steady state)
    from nerf_texture_tpu.data.poses import orbit_pose
    poses = [orbit_pose(np.pi / 2 + 0.2, 0.3 + 0.1 * i, ds.radius)
             for i in range(4)]

    # true held-out eval: a pose NOT in the training set, PSNR against
    # the analytic ground truth (VERDICT r1 weak #5: train-pose eval
    # overstates quality)
    from nerf_texture_tpu.data.synthetic import render_gt_sphere
    from nerf_texture_tpu.utils.metrics import psnr as psnr_fn
    gt = render_gt_sphere(poses[0], ds.intrinsics, H, W,
                          ds.sphere_radius)
    gt_rgb = gt[..., :3].astype(np.float32) / 255.0
    gt_a = gt[..., 3:].astype(np.float32) / 255.0
    gt_white = gt_rgb * gt_a + (1.0 - gt_a)
    out0 = trainer.render_frame(poses[0], use_ema=False)
    novel_psnr = float(psnr_fn(out0["image"], gt_white))
    out = trainer.render_frame(poses[0], use_ema=False)   # warmup/compile
    sync(out["image"][:1, :1])
    t0 = time.perf_counter()
    for p in poses[1:]:
        out = trainer.render_frame(p, use_ema=False)
    sync(out["image"][:1, :1])
    dt = (time.perf_counter() - t0) / (len(poses) - 1)
    fps = 1.0 / dt
    rays_per_sec = H * W / dt

    # Per-frame stage budget (VERDICT r2 #1: a regression must never
    # ship blind again) -- times the actual device programs of the frame
    # path: ray gen, prepass+compaction, one fused chunk.
    budget = {}
    try:
        budget = _frame_budget(trainer, poses[0], H, W, rcfg, mcfg)
    except Exception as e:      # noqa: BLE001 - bench must still report
        budget = {"error": str(e)[:200]}

    # MFU estimate for the render path (VERDICT r1 #3): useful MLP +
    # encode-interp FLOPs per frame / v5e peak.  live ~= rays that hit
    # (weights_sum > 0 underestimates the prepass-live set slightly)
    live = float((np.asarray(out["weights_sum"]) > 0).mean()) * H * W
    F = mcfg.num_levels * mcfg.level_dim
    h, hc, g = mcfg.hidden_dim, mcfg.hidden_dim_color, mcfg.geo_feat_dim
    sh_dim = (mcfg.sh_degree) ** 2
    mlp_flops = 2 * (F * h + h * (1 + g)) \
        + 2 * ((sh_dim + g) * hc + hc * 3)
    interp_flops = mcfg.num_levels * 27 * mcfg.level_dim * 2
    cap = rcfg.infer_color_cap
    flops_frame = live * cap * (mlp_flops + interp_flops) \
        + live * rcfg.proxy_refined * 16          # proxy lerp
    PEAK = 394e12 / 2.0    # v5e bf16 ~197 TFLOP/s
    mfu = flops_frame * fps / PEAK

    # flagship curved (NeRF-Texture) model: train-step time + render fps
    curved = {}
    try:
        curved = _bench_curved(H, W, cycles=(3 if on_tpu else 1),
                               small=not on_tpu)
    except Exception as e:      # noqa: BLE001 - bench must still report
        curved = {"error": str(e)[:200]}
    if not on_tpu:
        curved["backend"] = (f"cpu-fallback at {H}x{W} -- TPU tunnel "
                             "unreachable at bench time; numbers are NOT "
                             "comparable to the TPU baseline")

    # PSNR non-regression vs the previous round's recorded bench
    # (VERDICT r2 weak #3: the r1->r2 1.3 dB drop shipped ungated).
    # Degraded CPU-fallback numbers are NOT comparable to the recorded
    # TPU baselines -- comparing them would always "warn"
    warn = _psnr_regression_warning(psnr, curved) if on_tpu else None

    backend = "1 chip" if on_tpu else "CPU FALLBACK, tunnel down"
    # Headline = the CURVED (NeRF-Texture) model: the north-star scene
    # (star_flower-class, BASELINE.json) is a NeRF-Texture scene, so the
    # flagship's frame rate is the honest headline (VERDICT r4 next #2).
    # The NGP number stays in extra as its own tracked line item.
    headline_fps = curved.get("curved_render_fps", fps)
    print(json.dumps({
        "metric": (f"{H}x{W} novel-view render, curved NeRF-Texture "
                   f"flagship (synthetic sphere, {backend})"),
        "value": round(headline_fps, 3),
        "unit": "frames/sec",
        "vs_baseline": round(headline_fps / 10.0, 3),
        "extra": {
            "ngp_render_fps": round(fps, 3),
            "rays_per_sec": round(rays_per_sec),
            "train_iters_per_sec": round(iters_per_sec, 2),
            "train_psnr_700_steps": round(psnr, 2),
            "novel_view_psnr": round(novel_psnr, 2),
            "render_mfu": round(mfu, 5),
            "warmup_s": round(t_warm, 1),
            "cache_files_before": n_cache_before,
            "cache_files_added": ((len(os.listdir(cache_dir))
                                   if os.path.isdir(cache_dir) else 0)
                                  - n_cache_before),
            "frame_budget": budget,
            **curved,
            **({"psnr_regression_warn": warn} if warn else {}),
        },
    }))


def _frame_budget(trainer, pose, H, W, rcfg, mcfg):
    """Stage timings of the exact frame path (device programs timed
    individually; one fused chunk stands in for all of them)."""
    import jax
    import jax.numpy as jnp

    from nerf_texture_tpu.data.rays import get_rays
    from nerf_texture_tpu.render import renderer as R
    from nerf_texture_tpu.train.trainer import ngp_field_apply

    def time_it(fn, n=3):
        jax.block_until_ready(fn())
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn()
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / n * 1000.0

    occ = trainer.state.occ.occ
    density = trainer.state.occ.density
    aabb_np, occ_dil = R._occ_prepass_arrays(occ, rcfg, density=density)
    if aabb_np is None or occ_dil is None:
        return {"note": "no occupied aabb / dilated grid -- aabb path"}
    dens8 = R._dens8_cached(density, rcfg)
    aabb = jnp.asarray(aabb_np)
    intr = trainer.dataset.intrinsics
    # full-frame ray gen no longer exists on the frame path (chunks
    # compute rays from pose+intrinsics in place); keep the line item
    # at 0 so round-over-round budgets stay comparable
    t_raygen = 0.0
    B = max(1, rcfg.prepass_block)
    Hb, Wb = -(-H // B), -(-W // B)
    nb = Hb * Wb
    intr_b = np.asarray(intr, np.float32) / B
    rays_b = get_rays(jnp.asarray(pose), jnp.asarray(intr_b), Hb, Wb)
    blk = min(131072, R._round_up(nb, 8192))
    pp = lambda: R._prepass_compact(
        rays_b["rays_o"], rays_b["rays_d"], occ_dil, aabb, rcfg.bound,
        rcfg.min_near, grid_size=rcfg.grid_size, block=blk,
        margin_steps=rcfg.prepass_margin_steps, H=H, W=W, Hb=Hb, Wb=Wb,
        B=B, nb=nb, dens8=dens8, tau_cull=rcfg.prepass_tau_cull,
        tau_samples=R._tau_samples(rcfg, aabb_np))
    t_prepass = time_it(lambda: pp()[0])
    perm, count_d, t0_d, t1_d = pp()
    count = int(count_d)
    chunk = min(rcfg.ray_chunk, H * W)
    frame0 = R._frame_buffer_packed(1.0, n=H * W)
    chunk_fn = lambda: R._render_chunk_fused(
        ngp_field_apply, mcfg, trainer.state.params, occ,
        jnp.asarray(pose, jnp.float32)[:3], jnp.asarray(intr, jnp.float32),
        jnp.int32(0), frame0, perm, count_d,
        jnp.int32(0), t0_d, t1_d, dens8, aabb,
        rcfg, B=B, W=W, Wb=Wb, chunk=chunk)
    t_chunk = time_it(chunk_fn)
    return {"ray_gen_ms": round(t_raygen, 1),
            "prepass_ms": round(t_prepass, 1),
            "live_rays": count,
            "live_frac": round(count / (H * W), 3),
            "chunk_rays": chunk,
            "chunk_ms": round(t_chunk, 1),
            "n_chunks": -(-count // chunk) if count else 0}


def _psnr_regression_warning(train_psnr, curved):
    """Compare against the newest BENCH_r*.json in the repo; return a
    warning string on a > 0.3 dB drop (None otherwise)."""
    import glob

    files = sorted(glob.glob(os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_r*.json")))
    if not files:
        return None
    try:
        with open(files[-1]) as fh:
            prev = json.load(fh).get("parsed", {}).get("extra", {})
    except Exception:       # noqa: BLE001
        return None
    warns = []
    for key, cur in [("train_psnr_700_steps", train_psnr),
                     ("curved_novel_psnr",
                      curved.get("curved_novel_psnr"))]:
        old = prev.get(key)
        if old is not None and cur is not None and cur < old - 0.3:
            warns.append(f"{key} {old} -> {round(cur, 2)}")
    return "; ".join(warns) or None


def _bench_curved(H, W, cycles: int = 3, small: bool = False):
    """Curved (NeRF-Texture) model numbers on the same synthetic scene."""
    import jax
    import jax.numpy as jnp

    jnp_sum = jax.jit(jnp.sum)

    from nerf_texture_tpu.data.synthetic import SyntheticSphereDataset
    from nerf_texture_tpu.geometry.mesh import make_icosphere
    from nerf_texture_tpu.geometry.projector import MeshProjector
    from nerf_texture_tpu.models import mesh_field
    from nerf_texture_tpu.models.curved_field import CurvedFieldConfig
    from nerf_texture_tpu.models.mesh_field import MeshFieldConfig
    from nerf_texture_tpu.render.renderer import RenderConfig
    from nerf_texture_tpu.train.curved_trainer import (CurvedTrainConfig,
                                                       CurvedTrainer)

    # 8 frames like the NGP phase (VERDICT r3 #1 flagged the 4-frame
    # curved set as data starvation vs the NGP's 8)
    ds = SyntheticSphereDataset(n_frames=8 if not small else 4, H=H, W=W)
    mp = MeshProjector(make_icosphere(3 if small else 4, radius=0.5))
    # proxy_refined 24 + cap 5: measured round 4 on the trained bench
    # state (scripts/_prof_curved_knobs.py): 24 beats 32 on BOTH axes
    # (26.16 dB / 3.41 fps vs 25.58 / 3.34 at cap5); cap 8 costs 0.12 s
    # for +0.8 dB -- 5 is the balance point
    rcfg = (RenderConfig(bound=1.0, cascades=1, grid_size=128, max_steps=512,
                         max_samples_train=128, max_samples_infer=96,
                         ray_chunk=16384, pool_mean_samples=64,
                         pool_mean_samples_infer=24, march_steps_infer=256,
                         proxy_samples=0, proxy_refined=24,
                         infer_color_cap=5)
            if not small else
            RenderConfig(bound=1.0, cascades=1, grid_size=64, max_steps=192,
                         max_samples_train=64, max_samples_infer=48,
                         ray_chunk=8192, pool_mean_samples=32,
                         pool_mean_samples_infer=16, march_steps_infer=96,
                         proxy_samples=0, proxy_refined=16))
    # PRODUCTION cadence: occupancy-grid refresh every 16 steps (the
    # reference GUI trains 16 steps per 500 ms frame, nerf/gui.py:110-115)
    # -- the refresh cost is part of the effective it/s, not excluded
    tcfg = CurvedTrainConfig(lr=1e-2, total_steps=4000,
                             num_rays=1024 if small else 4096,
                             grid_update_interval=16,
                             grid_full_updates=0)
    ccfg = CurvedFieldConfig(field=MeshFieldConfig(), light_model="SH")
    tr = CurvedTrainer(ds, mesh_field.make_state(mp), ccfg, rcfg, tcfg,
                       key=jax.random.PRNGKey(7))
    tr.initialize_states(1)
    tr.train(17)                                   # compile step + refresh
    n = 16 * cycles                                # full refresh cycles
    t0 = time.perf_counter()
    tr.train(n)
    dt = time.perf_counter() - t0
    step_ms = dt / n * 1000.0
    eff_its = n / dt

    # flagship quality at production size (VERDICT r2 missing #1 /
    # next #2: the curved model shipped quality-unmeasured): continue
    # to 700 steps, novel-view PSNR against the analytic ground truth
    curved_psnr = None
    if not small:
        from nerf_texture_tpu.data.poses import orbit_pose
        from nerf_texture_tpu.data.synthetic import render_gt_sphere
        from nerf_texture_tpu.utils.metrics import psnr as psnr_fn
        tr.train(700 - 17 - n)
        npose = orbit_pose(np.pi / 2 + 0.2, 0.3, ds.radius)
        gt = render_gt_sphere(npose, ds.intrinsics, H, W,
                              ds.sphere_radius)
        gt_rgb = gt[..., :3].astype(np.float32) / 255.0
        gt_a = gt[..., 3:].astype(np.float32) / 255.0
        gt_white = gt_rgb * gt_a + (1.0 - gt_a)
        outn = tr.render_frame(npose, use_ema=False)
        curved_psnr = round(float(psnr_fn(outn["image"], gt_white)), 2)
        # pool-path PSNR on the same frame: the reference-parity
        # renderer (docs/PARITY.md), reported every round so proxy-path
        # approximation drift is visible (VERDICT r3 next #5)
        outp = tr.render_frame(npose, use_ema=False, parity=True)
        curved_psnr_pool = round(float(psnr_fn(outp["image"],
                                               gt_white)), 2)
        # production-scale parity GATE (VERDICT r4 next #5): the
        # documented docs/PARITY.md protocol -- EMA weights, white
        # background, held-out frame, pool (reference-parity) sampling
        # at full 800^2 -- with an absolute floor, so the +-0.3 dB
        # cross-framework criterion has a standing measured proxy every
        # round.  Floor 24 dB: ~2 dB below the r4/r5 measured level,
        # far above any broken-pipeline render (<=16 dB).
        outg = tr.render_frame(npose, use_ema=True, parity=True)
        parity_gate_psnr = round(float(psnr_fn(outg["image"],
                                               gt_white)), 2)

    # render fps at the TRAINED state (the grid has carved), averaged
    # over several frames, matching how the NGP frame rate is measured
    # sync on a DEVICE-side scalar: one full-image d2h through the
    # tunnel is ~190 ms (41 MB/s) and amortizing it over few frames
    # deflated the fps line by ~60 ms/frame (round 5b)
    import jax as _jx

    out = tr.render_frame(ds.poses[0], use_ema=False)   # compile/warm
    float(jnp_sum(out["image"]))
    n_fr = 6
    t0 = time.perf_counter()
    for i in range(n_fr):
        out = tr.render_frame(ds.poses[1 + i % 3], use_ema=False)
    float(jnp_sum(out["image"]))
    dt_live = (time.perf_counter() - t0) / n_fr

    res = {"curved_train_step_ms": round(step_ms),
           "curved_effective_it_per_s": round(eff_its, 2),
           "curved_render_fps_live": round(1.0 / dt_live, 3),
           **({"curved_novel_psnr_live": curved_psnr,
               "curved_novel_psnr_pool": curved_psnr_pool,
               "parity_gate_psnr_ema": parity_gate_psnr,
               "parity_gate_pass": bool(parity_gate_psnr >= 24.0)}
              if curved_psnr is not None else {})}

    # BAKED texture-mapped fast path (round 5, render/baked.py): bake
    # the surface features once per trained state, then every frame
    # pays ONE corner-packed atlas row per sample instead of the 8-row
    # hash pyramid + phi grid.  This is the deployed inference path, so
    # its fps/PSNR are the headline curved numbers; the live-field
    # numbers above stay as tracked line items.  prepass_tau_cull 0.1
    # is the opaque-object carve setting (PSNR-validated identical to
    # 3e-3 on this scene; the psnr gate below would catch a cull bug).
    try:
        import dataclasses as _dc

        import jax as _jax
        # proxy_refined 16 rides the prepass WINDOW refinement (round
        # 5b, renderer._prepass_compact): spans shrink to ~the shell
        # thickness, so 16 samples resolve what 24 did over the full
        # chord.  Measured (scripts/_r5_baked_eval.py K-sweep): cap5
        # K16 26.11 dB vs K24 26.31 at ~7% less frame time; the cap6
        # K20 quality point (26.59, BEATS the r4 26.35 line) is
        # reported alongside so the fps headline never hides quality.
        tr.rcfg = _dc.replace(tr.rcfg, prepass_block=8,
                              prepass_tau_cull=0.1, proxy_refined=16)
        t0 = time.perf_counter()
        bake, _ = tr.bake_atlas()
        _jax.block_until_ready(bake.atlas)
        bake_s = time.perf_counter() - t0
        out = tr.render_frame(ds.poses[0], use_ema=False, baked=True)
        float(jnp_sum(out["image"]))                     # warm/compile
        t0 = time.perf_counter()
        for i in range(n_fr):
            out = tr.render_frame(ds.poses[1 + i % 3], use_ema=False,
                                  baked=True)
        float(jnp_sum(out["image"]))
        dt_baked = (time.perf_counter() - t0) / n_fr
        res["curved_render_fps"] = round(1.0 / dt_baked, 3)
        res["curved_bake_s"] = round(bake_s, 1)
        if not small:
            outb = tr.render_frame(npose, use_ema=False, baked=True)
            res["curved_novel_psnr"] = round(
                float(psnr_fn(np.asarray(outb["image"]), gt_white)), 2)
            tr.rcfg = _dc.replace(tr.rcfg, infer_color_cap=6,
                                  proxy_refined=20)
            outq = tr.render_frame(npose, use_ema=False, baked=True)
            res["curved_novel_psnr_cap6"] = round(
                float(psnr_fn(np.asarray(outq["image"]), gt_white)), 2)
    except Exception as e:      # noqa: BLE001 -- bench must still report
        res["curved_bake_error"] = str(e)[:200]
        res["curved_render_fps"] = res["curved_render_fps_live"]
        if curved_psnr is not None:
            res["curved_novel_psnr"] = curved_psnr
    return res


if __name__ == "__main__":
    main()
