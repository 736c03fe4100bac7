"""Spherical-harmonics environment lighting + BRDF head (default model).

Rebuild of the reference ``SH_EnvmapMaterialNet`` (nerf/sh_light_model.py:
509-616) and its helpers: learnable order-3 SH envmap, BRDF MLP (albedo 3,
specular 1, glossiness 1), Ramamoorthi cosine-lobe irradiance (:498-506),
glossiness-attenuated specular evaluated at the reflection direction
(:588-600), per-probe visibility via SH products fitted against a rotated
cosine visibility lobe (:647-670), envmap import (:730-766 EnvMap2SH) and
``color ** (1/gamma)`` tone mapping (:612-615).

All SH math routes through ``ops.sh_encode`` (one self-consistent real-SH
convention for fitting and evaluation).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ...ops import sh_encode
from ...utils.mlp import apply_mlp, init_mlp

# Ramamoorthi & Hanrahan 2001 cosine-lobe coefficients / pi for the first
# three SH bands (sh_light_model.py:502)
_COSINE_LOBE = np.array([3.14, 2.09, 2.09, 2.09,
                         0.79, 0.79, 0.79, 0.79, 0.79], np.float32) / math.pi

# zonal coefficients of the clamped-cosine visibility lobe
# (sh_light_model.py:661): entries at (l, m=0) only
_VIS_ZONAL = np.array([0.8754318, 1.023545, 0.449686], np.float32)


@dataclasses.dataclass(frozen=True)
class SHLightConfig:
    input_dim: int = 15
    sh_order: int = 3           # (order+1)**2 coefficients
    white_light: bool = True
    use_specular: bool = True
    min_glossiness: float = 1.0
    gamma: float = 2.4
    hidden: int = 64
    num_layers: int = 3

    @property
    def n_coeffs(self) -> int:
        return (self.sh_order + 1) ** 2


def init(key, cfg: SHLightConfig) -> dict[str, Any]:
    color_dim = 1 if cfg.white_light else 3
    env = jnp.zeros((cfg.n_coeffs, color_dim)).at[0].set(3.0)
    dims = ([cfg.input_dim] + [cfg.hidden] * (cfg.num_layers - 1) + [5])
    return {"env_shs": env, "brdf_net": init_mlp(key, dims, bias=True)}


def safe_pow(x, p):
    return jnp.power(jnp.clip(x, 1e-6, None), p)


def sh_eval_color(coeffs, dirs, degree: int):
    """Evaluate an SH expansion with per-channel coeffs at unit dirs.

    coeffs: [..., n, C] (n >= degree**2); dirs [..., 3] -> [..., C].
    """
    basis = sh_encode(dirs, degree)                        # [..., d**2]
    return jnp.einsum("...n,...nc->...c", basis,
                      coeffs[..., :degree * degree, :])


def irradiance(coeffs9, normal):
    """Diffuse irradiance via the cosine-lobe product
    (render_irrandiance_sh_sum, sh_light_model.py:498-506)."""
    c = coeffs9[..., :9, :] * jnp.asarray(_COSINE_LOBE)[..., :, None]
    return sh_eval_color(c, normal, 3)


def zonal_rotate(zonal, normal):
    """Rotate a zonal (m=0) lobe to point along `normal`.

    coeff_lm = z_l * sqrt(4 pi / (2l+1)) * Y_lm(normal); exact for zonal
    functions (replaces the reference's generic SH rotation machinery,
    sh_light_model.py:109-287, for this use)."""
    basis = sh_encode(normal, 3)                           # [..., 9]
    scale = np.concatenate([
        np.full(2 * l + 1, math.sqrt(4 * math.pi / (2 * l + 1)) * zonal[l])
        for l in range(3)]).astype(np.float32)
    return basis[..., :9] * jnp.asarray(scale)


def fit_product_shs(coeffs_a9, coeffs_b9, key=None, n_dirs: int = 4096):
    """SH coefficients of the product of two order-2 expansions, by
    least squares over sampled directions (replaces the reference's
    gradient-descent ``fit_product_of_SHs``, sh_light_model.py:~647)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    d = jax.random.normal(key, (n_dirs, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    basis = sh_encode(d, 3)                                # [n, 9]
    va = basis @ coeffs_a9                                 # [n, C]
    vb = basis @ coeffs_b9
    target = va * vb
    sol, *_ = jnp.linalg.lstsq(basis, target)
    return sol                                             # [9, C]


def apply(params, geo_feat, normals_primary, view_dirs,
          cfg: SHLightConfig, *, normals_secondary=None,
          shade_visibility: bool = False, gamma=None,
          env_import=None, env_import_vis=None, probes=None):
    """Shade points.  Returns (full, specular, diffuse, albedo), each
    [..., 3] (sh_light_model.py:553-616).

    env_import / (env_import_vis, probes): optional imported environment
    (plain or with per-probe visibility products).
    """
    if env_import is not None:
        if shade_visibility and env_import_vis is not None \
                and probes is not None:
            pid = jnp.argmax(
                jnp.sum(normals_secondary[:, None, :] * probes[None], -1),
                axis=-1)
            env = env_import_vis[pid]                      # [N, 9+, C]
        else:
            env = jnp.broadcast_to(
                env_import[None],
                (geo_feat.shape[0], *env_import.shape))
    else:
        env = jnp.broadcast_to(params["env_shs"][None],
                               (geo_feat.shape[0],
                                *params["env_shs"].shape))
    if env.shape[-1] == 1:
        env = jnp.broadcast_to(env, (*env.shape[:-1], 3))

    brdf = apply_mlp(params["brdf_net"], geo_feat)
    albedo = jax.nn.sigmoid(brdf[..., :3])
    spec_w = jax.nn.sigmoid(brdf[..., 3:4])
    gloss = jax.nn.softplus(brdf[..., 4:5]) + cfg.min_glossiness

    diffuse_rgb = jnp.clip(irradiance(env[..., :9, :3], normals_primary),
                           0.0, None)
    diffuse = albedo * diffuse_rgb

    if cfg.use_specular:
        d = view_dirs / (jnp.linalg.norm(view_dirs, axis=-1,
                                         keepdims=True) + 1e-6)
        cos_t = -jnp.sum(d * normals_primary, axis=-1, keepdims=True)
        refl = 2.0 * cos_t * normals_primary + d
        refl = refl / (jnp.linalg.norm(refl, axis=-1, keepdims=True)
                       + 1e-6)
        # band attenuation exp(-l^2 / (2 s))  (sh_light_model.py:592-595)
        l_of = jnp.floor(jnp.sqrt(jnp.arange(9, dtype=jnp.float32)))
        atten = jnp.exp(-(l_of ** 2)[None, :, None]
                        / (2.0 * gloss[..., None]))
        sh_coeff = atten * env[..., :9, :3]
        specular_rgb = irradiance(sh_coeff, refl)
        specular = spec_w * specular_rgb
    else:
        specular = jnp.zeros_like(diffuse)

    color = jnp.clip(diffuse + specular, 0.0, None)
    g = cfg.gamma if gamma is None else gamma
    return (safe_pow(color, 1.0 / g),
            safe_pow(jnp.clip(specular, 0.0, 1.0), 1.0 / g),
            safe_pow(jnp.clip(diffuse, 0.0, 1.0), 1.0 / g),
            jnp.clip(albedo, 0.0, 1.0))


# ---------------------------------------------------------------------------
# envmap import (host-side preprocessing)
# ---------------------------------------------------------------------------

def image_to_envmap(path: str, force_white: bool = True,
                    gamma: float = 2.4) -> "np.ndarray":
    """Load an image file as a linear-radiance equirect envmap
    (image2envmap, sh_light_model.py:~700)."""
    import imageio.v3 as iio

    img = iio.imread(path).astype(np.float32)
    if img.max() > 1.5:
        img = img / 255.0
    img = img[..., :3] ** gamma           # sRGB-ish -> linear
    if force_white:
        img = np.repeat(img.mean(-1, keepdims=True), 3, axis=-1)
    return img


def envmap_to_sh(envmap: np.ndarray, sh_order: int = 3) -> np.ndarray:
    """Project an equirect envmap [H, W, 3] onto SH coefficients by
    solid-angle-weighted integration (replaces the reference's iterative
    ``EnvMap2SH`` fit, sh_light_model.py:730-766)."""
    H, W = envmap.shape[:2]
    theta = (np.arange(H) + 0.5) / H * np.pi          # polar from +y
    phi = (np.arange(W) + 0.5) / W * 2 * np.pi
    tt, pp = np.meshgrid(theta, phi, indexing="ij")
    dirs = np.stack([np.sin(tt) * np.cos(pp), np.cos(tt),
                     np.sin(tt) * np.sin(pp)], -1).reshape(-1, 3)
    d_omega = (np.sin(tt) * (np.pi / H) * (2 * np.pi / W)).reshape(-1)
    basis = np.asarray(sh_encode(jnp.asarray(dirs), sh_order + 1))
    vals = envmap.reshape(-1, envmap.shape[-1])
    return np.einsum("nk,n,nc->kc", basis, d_omega, vals)


def build_visibility_probes(env_shs9, *, res: int = 8):
    """Per-probe visibility-modulated environments
    (load_envmap_with_visibility, sh_light_model.py:647-670).

    Returns (env_vis [res*res, 9, C], probes [res*res, 3])."""
    h = w = res
    phi = np.linspace(np.pi / h, np.pi, h)
    theta = np.linspace(-0.5 * np.pi, 1.5 * np.pi, w)
    pp, tt = np.meshgrid(phi, theta, indexing="ij")
    probes = np.stack([np.cos(tt) * np.sin(pp), np.cos(pp),
                       np.sin(tt) * np.sin(pp)], -1).reshape(-1, 3)
    probes_j = jnp.asarray(probes, jnp.float32)
    vis = zonal_rotate(_VIS_ZONAL, probes_j)               # [P, 9]
    env = jnp.asarray(env_shs9, jnp.float32)[:9]
    if env.shape[-1] == 1:
        env = jnp.broadcast_to(env, (9, 3))
    outs = []
    for i in range(probes.shape[0]):
        outs.append(fit_product_shs(env, jnp.broadcast_to(
            vis[i][:, None], (9, 3))))
    return jnp.stack(outs), probes_j
