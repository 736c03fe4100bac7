"""Spherical-Gaussian environment lighting + Cook-Torrance BRDF.

Rebuild of the reference ``SG_EnvmapMaterialNet`` / ``render_with_sg``
(nerf/sg_light_model.py:145-487), i.e. the PhySG shading model: the
environment is a mixture of M spherical Gaussians, the specular NDF is an
SG warped into the reflection frame with Fresnel/geometric factors, SG
products use the lambda trick, and the clamped-cosine hemisphere integral
uses the standard closed-form approximation.

All math is batched jnp over [..., M, K] lobe/material grids.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ...utils.mlp import apply_mlp, init_mlp

TINY = 1e-8


@dataclasses.dataclass(frozen=True)
class SGLightConfig:
    input_dim: int = 15
    num_lgt_sgs: int = 8
    num_brdf_sgs: int = 1
    white_light: bool = True
    white_specular: bool = True
    hidden: int = 64
    num_layers: int = 3


def fibonacci_sphere(n: int) -> np.ndarray:
    """n roughly-uniform unit directions (golden-angle spiral)."""
    i = np.arange(n, dtype=np.float64) + 0.5
    phi = math.pi * (3.0 - math.sqrt(5.0)) * i
    y = 1.0 - 2.0 * i / n
    r = np.sqrt(np.maximum(1.0 - y * y, 0.0))
    return np.stack([np.cos(phi) * r, y, np.sin(phi) * r],
                    -1).astype(np.float32)


def sg_energy(lobes, lambdas, mus):
    """Total energy of SG lobes: mu * 2 pi / lambda * (1 - exp(-2 lambda))
    (compute_energy, sg_light_model.py:~30)."""
    return mus * 2.0 * math.pi / lambdas \
        * (1.0 - jnp.exp(-2.0 * lambdas))


def init(key, cfg: SGLightConfig) -> dict[str, Any]:
    k1, k2, k3 = jax.random.split(key, 3)
    mu_dim = 1 if cfg.white_light else 3
    lambdas = 20.0 + jnp.abs(
        jax.random.normal(k1, (cfg.num_lgt_sgs, 1)) * 100.0)
    mus = jnp.abs(jax.random.normal(k1, (cfg.num_lgt_sgs, mu_dim)))
    energy = sg_energy(None, lambdas, mus)
    mus = mus / jnp.sum(energy, axis=0, keepdims=True) * 2.0 * math.pi
    lobes = jnp.asarray(fibonacci_sphere(cfg.num_lgt_sgs))
    params = {
        "lgt_sgs": jnp.concatenate([lobes, lambdas, mus], axis=-1),
        "specular_reflectance": jnp.abs(jax.random.normal(
            k2, (cfg.num_brdf_sgs, 1 if cfg.white_specular else 3))),
        "roughness": jnp.asarray(np.random.default_rng(0).uniform(
            4e-2, 5e-2, (cfg.num_brdf_sgs, 1)).astype(np.float32)),
        "albedo_net": init_mlp(
            k3, [cfg.input_dim] + [cfg.hidden] * (cfg.num_layers - 1)
            + [3], bias=True),
    }
    if cfg.num_brdf_sgs > 1:
        k4 = jax.random.split(k3)[0]
        params["blend_net"] = init_mlp(
            k4, [cfg.input_dim] + [cfg.hidden] * (cfg.num_layers - 1)
            + [cfg.num_brdf_sgs], bias=True)
    return params


def hemisphere_int(lam, cos_beta):
    """Closed-form hemispherical integral of an SG against the horizon
    (sg_light_model.py:93-119, numerically-stable form)."""
    lam = lam + TINY
    inv = 1.0 / lam
    t = jnp.sqrt(lam) * (1.6988 + 10.8438 * inv) / (
        1.0 + 6.2201 * inv + 10.2415 * inv * inv)
    inv_a = jnp.exp(-t)
    inv_b = jnp.exp(-t * jnp.clip(cos_beta, 0.0, None))
    s1 = (1.0 - inv_a * inv_b) / (1.0 - inv_a + inv_b - inv_a * inv_b)
    b = jnp.exp(t * jnp.clip(cos_beta, None, 0.0))
    s2 = (b - inv_a) / ((1.0 - inv_a) * (b + 1.0))
    s = jnp.where(cos_beta >= 0, s1, s2)
    A_b = 2.0 * math.pi / lam * (jnp.exp(-lam) - jnp.exp(-2.0 * lam))
    A_u = 2.0 * math.pi / lam * (1.0 - jnp.exp(-lam))
    return A_b * (1.0 - s) + A_u * s


def lambda_trick(lobe1, lam1, mu1, lobe2, lam2, mu2):
    """Product of two SGs as an SG (assumes lam1 << lam2;
    sg_light_model.py:123-140)."""
    ratio = lam1 / lam2
    dot = jnp.sum(lobe1 * lobe2, axis=-1, keepdims=True)
    tmp = jnp.sqrt(ratio * ratio + 1.0 + 2.0 * ratio * dot)
    tmp = jnp.minimum(tmp, ratio + 1.0)
    lam3 = lam2 * tmp
    diff = lam2 * (tmp - ratio - 1.0)
    lobes = (ratio / tmp) * lobe1 + (1.0 / tmp) * lobe2
    mus = mu1 * mu2 * jnp.exp(diff)
    return lobes, lam3, mus


_COS_MU, _COS_LAM, _COS_ALPHA = 32.7080, 0.0315, 31.7003


def render_with_sg(lgt_sgs, specular_reflectance, roughness,
                   diffuse_albedo, normal, viewdirs,
                   blending_weights=None):
    """PhySG shading (render_with_sg, sg_light_model.py:145-286).

    lgt_sgs [M, 7]; specular_reflectance [K, 3]; roughness [K, 1];
    diffuse_albedo / normal / viewdirs [..., 3].
    """
    M = lgt_sgs.shape[0]
    K = specular_reflectance.shape[0]
    dots = normal.shape[:-1]

    n = jnp.broadcast_to(normal[..., None, None, :], (*dots, M, K, 3))
    v = jnp.broadcast_to(viewdirs[..., None, None, :], (*dots, M, K, 3))
    sgs = jnp.broadcast_to(lgt_sgs[..., :, None, :], (*dots, M, K, 7))
    lobes = sgs[..., :3] / (jnp.linalg.norm(sgs[..., :3], axis=-1,
                                            keepdims=True) + TINY)
    lams = jnp.abs(sgs[..., 3:4])
    mus = jnp.abs(sgs[..., 4:7])

    # specular: SG NDF warped to the reflection frame
    inv_r4 = 1.0 / (roughness ** 4)                       # [K, 1]
    brdf_lam = jnp.broadcast_to(2.0 * inv_r4, (*dots, M, K, 1))
    brdf_mu = jnp.broadcast_to(inv_r4 / math.pi, (*dots, M, K, 1))
    brdf_mu = jnp.broadcast_to(brdf_mu, (*dots, M, K, 3))

    v_dot_lobe = jnp.clip(jnp.sum(n * v, axis=-1, keepdims=True), 0.0,
                          None)
    warp_lobe = 2.0 * v_dot_lobe * n - v
    warp_lobe = warp_lobe / (jnp.linalg.norm(warp_lobe, axis=-1,
                                             keepdims=True) + TINY)
    warp_lam = brdf_lam / (4.0 * v_dot_lobe + TINY)

    half = warp_lobe + v
    half = half / (jnp.linalg.norm(half, axis=-1, keepdims=True) + TINY)
    v_dot_h = jnp.clip(jnp.sum(v * half, axis=-1, keepdims=True), 0.0,
                       None)
    F0 = jnp.broadcast_to(specular_reflectance, (*dots, M, K, 3))
    F = F0 + (1.0 - F0) * jnp.power(
        2.0, -(5.55473 * v_dot_h + 6.8316) * v_dot_h)

    dot1 = jnp.clip(jnp.sum(warp_lobe * n, axis=-1, keepdims=True), 0.0,
                    None)
    dot2 = jnp.clip(jnp.sum(v * n, axis=-1, keepdims=True), 0.0, None)
    k_g = (roughness + 1.0) ** 2 / 8.0
    G = (dot1 / (dot1 * (1 - k_g) + k_g + TINY)) \
        * (dot2 / (dot2 * (1 - k_g) + k_g + TINY))
    warp_mu = brdf_mu * F * G / (4.0 * dot1 * dot2 + TINY)

    f_lobe, f_lam, f_mu = lambda_trick(lobes, lams, mus, warp_lobe,
                                       warp_lam, warp_mu)
    p_lobe, p_lam, p_mu = lambda_trick(n, _COS_LAM, _COS_MU, f_lobe,
                                       f_lam, f_mu)
    d1 = jnp.sum(p_lobe * n, axis=-1, keepdims=True)
    d2 = jnp.sum(f_lobe * n, axis=-1, keepdims=True)
    spec = p_mu * hemisphere_int(p_lam, d1) \
        - f_mu * _COS_ALPHA * hemisphere_int(f_lam, d2)
    if blending_weights is None:
        spec = jnp.sum(spec, axis=(-2, -3))
    else:
        spec = jnp.sum(jnp.sum(spec, axis=-3)
                       * blending_weights[..., None], axis=-2)
    spec = jnp.clip(spec, 0.0, None)

    # diffuse: albedo/pi SG integral against the cosine lobe
    dif_mu = mus[..., :1, :] \
        * (diffuse_albedo / math.pi)[..., None, None, :]
    dl, dlam, dmu = lambda_trick(n[..., :1, :], _COS_LAM, _COS_MU,
                                 lobes[..., :1, :], lams[..., :1, :],
                                 dif_mu)
    dd1 = jnp.sum(dl * n[..., :1, :], axis=-1, keepdims=True)
    dd2 = jnp.sum(lobes[..., :1, :] * n[..., :1, :], axis=-1,
                  keepdims=True)
    diffuse = dmu * hemisphere_int(dlam, dd1) \
        - dif_mu * _COS_ALPHA * hemisphere_int(lams[..., :1, :], dd2)
    diffuse = jnp.clip(jnp.sum(diffuse, axis=(-2, -3)), 0.0, None)

    rgb = spec + diffuse
    return rgb, spec, diffuse, diffuse_albedo


def apply(params, geo_feat, normals, view_dirs, cfg: SGLightConfig,
          *, lgt_sgs_import=None, **_):
    """Shade; note the SG model uses -d as view dirs at the call site
    (nerf/network_curvedfield.py:333)."""
    lgt = params["lgt_sgs"] if lgt_sgs_import is None else lgt_sgs_import
    if lgt.shape[-1] == 5:  # white light -> replicate mu
        lgt = jnp.concatenate([lgt, lgt[..., -1:], lgt[..., -1:]], -1)
    albedo = jax.nn.sigmoid(apply_mlp(params["albedo_net"], geo_feat))
    spec_ref = jax.nn.sigmoid(params["specular_reflectance"])
    if spec_ref.shape[-1] == 1:
        spec_ref = jnp.broadcast_to(spec_ref, (spec_ref.shape[0], 3))
    rough = jax.nn.sigmoid(params["roughness"])
    blend = None
    if "blend_net" in params:
        blend = jax.nn.softmax(apply_mlp(params["blend_net"], geo_feat),
                               axis=-1)
    return render_with_sg(lgt, spec_ref, rough, albedo, normals,
                          view_dirs, blending_weights=blend)


def envmap_to_sg(envmap, num_sgs: int = 32, iterations: int = 500,
                 lr: float = 1e-2, key=None):
    """Fit SG lobes to an equirect envmap [H, W, 3] by adam on the
    rasterization loss (EnvMap2SG, sg_light_model.py:559-596)."""
    import optax

    key = key if key is not None else jax.random.PRNGKey(0)
    H, W = envmap.shape[:2]
    theta = jnp.linspace(0, math.pi, H)
    phi = jnp.linspace(-math.pi, math.pi, W)
    tt, pp = jnp.meshgrid(theta, phi, indexing="ij")
    dirs = jnp.stack([jnp.sin(tt) * jnp.cos(pp), jnp.cos(tt),
                      jnp.sin(tt) * jnp.sin(pp)], -1).reshape(-1, 3)
    target = jnp.asarray(envmap, jnp.float32).reshape(-1, 3)

    lobes = jnp.asarray(fibonacci_sphere(num_sgs))
    lams = 20.0 + jnp.abs(jax.random.normal(key, (num_sgs, 1)) * 20.0)
    mus = jnp.full((num_sgs, 3), float(jnp.mean(target)) / num_sgs)
    params = jnp.concatenate([lobes, lams, mus], -1)

    def render(p):
        lb = p[:, :3] / (jnp.linalg.norm(p[:, :3], axis=-1,
                                         keepdims=True) + TINY)
        lm = jnp.abs(p[:, 3:4])
        mu = jnp.abs(p[:, 4:7])
        dots = dirs @ lb.T                              # [N, M]
        return jnp.exp(lm[:, 0][None] * (dots - 1.0)) @ mu

    def loss(p):
        return jnp.mean((render(p) - target) ** 2)

    opt = optax.adam(lr)
    state = opt.init(params)

    @jax.jit
    def step(p, s):
        l, g = jax.value_and_grad(loss)(p)
        u, s = opt.update(g, s)
        return optax.apply_updates(p, u), s, l

    for _ in range(iterations):
        params, state, l = step(params, state)
    return params


def sg_to_envmap(lgt_sgs, H: int = 128, W: int = 256):
    """Rasterize the SG mixture to an equirect envmap (SG2Envmap,
    sg_light_model.py:~55-77)."""
    theta = jnp.linspace(0, math.pi, H)
    phi = jnp.linspace(-math.pi, math.pi, W)
    tt, pp = jnp.meshgrid(theta, phi, indexing="ij")
    dirs = jnp.stack([jnp.sin(tt) * jnp.cos(pp), jnp.cos(tt),
                      jnp.sin(tt) * jnp.sin(pp)], -1)      # [H, W, 3]
    if lgt_sgs.shape[-1] == 5:
        lgt_sgs = jnp.concatenate([lgt_sgs, lgt_sgs[..., -1:],
                                   lgt_sgs[..., -1:]], -1)
    lobes = lgt_sgs[:, :3] / (jnp.linalg.norm(lgt_sgs[:, :3], axis=-1,
                                              keepdims=True) + TINY)
    lams = jnp.abs(lgt_sgs[:, 3:4])
    mus = jnp.abs(lgt_sgs[:, 4:7])
    dots = jnp.einsum("hwc,mc->hwm", dirs, lobes)
    rgb = jnp.einsum("hwm,mc->hwc",
                     jnp.exp(lams[:, 0] * (dots - 1.0)), mus)
    return rgb, dirs
