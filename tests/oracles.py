"""Pure-numpy oracles re-implementing the reference CUDA kernel semantics.

These are independent ports of the *math* documented in SURVEY.md (hash-grid
interpolation, ray march, compositing) used to validate the TPU ops.
"""

import math

import numpy as np

_PRIMES = (1, 2654435761, 805459861, 3674653429, 2097192037, 1434869437,
           2165219737)


def hashgrid_oracle(inputs, embeddings, spec):
    """Reference semantics of gridencoder kernel_grid (gridencoder.cu:76)."""
    B, D = inputs.shape
    C = spec.level_dim
    out = np.zeros((B, spec.num_levels * C), np.float64)
    emb = np.asarray(embeddings, np.float64)
    for b in range(B):
        x = inputs[b]
        if np.any(x < 0) or np.any(x > 1):
            continue
        for lvl in range(spec.num_levels):
            scale = math.exp2(lvl * spec.log2_scale) * spec.base_resolution - 1.0
            res = int(math.ceil(scale)) + 1
            hmap = spec.level_params(lvl)
            shift = 0.0 if spec.align_corners else 0.5
            pos = x * scale + shift
            pg = np.floor(pos).astype(np.int64)
            f = pos - pg
            acc = np.zeros(C, np.float64)
            for corner in range(2 ** D):
                w = 1.0
                pl = np.zeros(D, np.int64)
                for d in range(D):
                    if (corner >> d) & 1:
                        w *= f[d]
                        pl[d] = pg[d] + 1
                    else:
                        w *= 1.0 - f[d]
                        pl[d] = pg[d]
                # get_grid_index
                side = res if spec.align_corners else res + 1
                stride = 1
                index = 0
                for d in range(D):
                    if stride > hmap:
                        break
                    index += int(pl[d]) * stride
                    stride *= side
                if spec.gridtype == "hash" and stride > hmap:
                    h = 0
                    for d in range(D):
                        h ^= (int(pl[d]) * _PRIMES[d]) & 0xFFFFFFFF
                        h &= 0xFFFFFFFF
                    index = h
                row = (index % hmap) + spec.offsets[lvl]
                acc += w * emb[row]
            out[b, lvl * C:(lvl + 1) * C] = acc
    return out


def march_oracle(ray_o, ray_d, occ, near, far, *, bound, cascades, grid_size,
                 max_steps, dt_gamma, t0=None):
    """Sequential port of kernel_march_rays_train (raymarching.cu:314-483).

    Returns (ts, dts) lists of emitted samples for one ray.
    """
    H = grid_size
    dt_min = 2 * math.sqrt(3) / max_steps
    dt_max = 2 * math.sqrt(3) * (2 ** (cascades - 1)) / H
    t = near if t0 is None else t0
    ts, dts = [], []
    steps = 0
    while t < far and steps < max_steps:
        x = np.clip(ray_o + t * ray_d, -bound, bound)
        dt = float(np.clip(t * dt_gamma, dt_min, dt_max))
        mx = np.max(np.abs(x))
        e_pos = math.frexp(mx)[1]
        e_dt = math.frexp(dt * H * 0.5)[1]
        level = min(max(max(e_pos, e_dt), 0), cascades - 1)
        mip_bound = min(2.0 ** level, bound)
        cell = np.clip((0.5 * (x / mip_bound + 1) * H).astype(np.int64), 0,
                       H - 1)
        flat = level * H ** 3 + (cell[0] * H + cell[1]) * H + cell[2]
        if occ[flat]:
            ts.append(t)
            dts.append(dt)
        t += dt
        steps += 1
    return np.array(ts), np.array(dts)


def composite_oracle(sigmas, rgbs, dts, ts, mask):
    """Sequential port of kernel_composite_rays_train_forward
    (raymarching.cu:700-777) with per-sample t's instead of accumulated
    deltas for depth."""
    N, K = sigmas.shape
    image = np.zeros((N, rgbs.shape[-1]))
    depth = np.zeros(N)
    wsum = np.zeros(N)
    for n in range(N):
        T = 1.0
        for k in range(K):
            if not mask[n, k]:
                continue
            alpha = 1.0 - math.exp(-sigmas[n, k] * dts[n, k])
            w = alpha * T
            image[n] += w * rgbs[n, k]
            depth[n] += w * ts[n, k]
            wsum[n] += w
            T *= 1.0 - alpha
    return image, depth, wsum


def composite_backward_oracle(grad_image, grad_wsum, sigmas, rgbs, dts, ts,
                              mask):
    """Analytic backward port of kernel_composite_rays_train_backward
    (raymarching.cu:802-890): gradients w.r.t. sigmas and rgbs."""
    N, K = sigmas.shape
    image, _, wsum = composite_oracle(sigmas, rgbs, dts, ts, mask)
    g_sig = np.zeros_like(sigmas)
    g_rgb = np.zeros_like(rgbs)
    for n in range(N):
        T = 1.0
        acc = np.zeros(rgbs.shape[-1])
        ws = 0.0
        for k in range(K):
            if not mask[n, k]:
                continue
            alpha = 1.0 - math.exp(-sigmas[n, k] * dts[n, k])
            w = alpha * T
            acc += w * rgbs[n, k]
            ws += w
            T *= 1.0 - alpha
            g_rgb[n, k] = grad_image[n] * w
            g_sig[n, k] = dts[n, k] * (
                np.dot(grad_image[n], T * rgbs[n, k] - (image[n] - acc))
                + grad_wsum[n] * (T - (wsum[n] - ws)))
    return g_sig, g_rgb
