"""The NeRF-Texture flagship model (curved surface field).

Rebuild of the reference ``NeRFNetwork`` in ``nerf/network_curvedfield.py``:
MeshFeatureField -> sigma MLP (2 x 32 -> 1 + 15) -> either a static
SH-reflection color net or a relightable light model (SH / SG / Envmap);
normals from -grad(sigma) with the ``1/lambda (1 - exp(-lambda sigma))``
remap (:244-245, lambda = 5e-2) supervised against the factorized fine
normals; visual modes RGB/UV/Grad/Nc/Tan/Btan/normal/Fea (:211-217,
356-394).

Functional layout: `CurvedFieldConfig` (static), params pytree from
`init`, `MeshFieldState` carries geometry/imported data, and `forward`
variants select behavior via static flags.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from ..ops import sh_encode, sh_encode_dim, trunc_exp
from ..utils.mlp import apply_mlp, init_mlp
from . import mesh_field
from .lights import envmap as envmap_light
from .lights import sg as sg_light
from .lights import sh as sh_light
from .mesh_field import FieldRuntime, MeshFieldConfig, MeshFieldState

SIGMA_REMAP_LAMBDA = 5e-2  # network_curvedfield.py:244


@dataclasses.dataclass(frozen=True)
class CurvedFieldConfig:
    field: MeshFieldConfig = MeshFieldConfig()
    num_layers: int = 2
    hidden_dim: int = 32
    geo_feat_dim: int = 15
    num_layers_color: int = 3
    hidden_dim_color: int = 64
    dir_degree: int = 4
    light_model: str = "SH"     # 'SH' | 'SG' | 'Envmap' | 'None'
    smooth_grad_weight: float = 1e-1
    no_visibility: bool = False
    bound: float = 1.0
    # light model configs
    sh_order: int = 3
    use_specular: bool = True
    white_light: bool = True
    num_lgt_sgs: int = 8
    num_brdf_sgs: int = 1
    white_specular: bool = True
    env_res: int = 16

    @property
    def render_light_model(self) -> bool:
        return self.light_model in ("SH", "SG", "Envmap")

    @property
    def sh_cfg(self) -> sh_light.SHLightConfig:
        return sh_light.SHLightConfig(
            input_dim=self.geo_feat_dim, sh_order=self.sh_order,
            white_light=self.white_light, use_specular=self.use_specular)

    @property
    def sg_cfg(self) -> sg_light.SGLightConfig:
        return sg_light.SGLightConfig(
            input_dim=self.geo_feat_dim, num_lgt_sgs=self.num_lgt_sgs,
            num_brdf_sgs=self.num_brdf_sgs, white_light=self.white_light,
            white_specular=self.white_specular)

    @property
    def env_cfg(self) -> envmap_light.EnvmapLightConfig:
        return envmap_light.EnvmapLightConfig(
            input_dim=self.geo_feat_dim, env_res=self.env_res,
            white_light=self.white_light, use_specular=self.use_specular)

    @property
    def field_name(self) -> str:
        """Config-encoding name used to namespace checkpoints/field files
        (network_curvedfield.py:133-150)."""
        name = "curved_grid"
        if self.field.encoder_type == "hash":
            name += "_hash"
        if self.field.clustering:
            name += "_clus"
        if self.field.prob_model:
            name += "_prob"
        if self.field.lip:
            name += "_lip"
        name += "_" + self.light_model
        if self.no_visibility:
            name += "_novis"
        if self.field.bound_output_normal:
            name += "_bd"
        return name


def init(key, cfg: CurvedFieldConfig) -> dict[str, Any]:
    k_field, k_sigma, k_color, k_light = jax.random.split(key, 4)
    params = {"field": mesh_field.init(k_field, cfg.field)}
    in_dim = cfg.field.embed_dim
    sigma_dims = ([in_dim] + [cfg.hidden_dim] * (cfg.num_layers - 1)
                  + [1 + cfg.geo_feat_dim])
    params["sigma_net"] = init_mlp(k_sigma, sigma_dims, bias=True)
    if cfg.render_light_model:
        if cfg.light_model == "SH":
            params["light"] = sh_light.init(k_light, cfg.sh_cfg)
        elif cfg.light_model == "SG":
            params["light"] = sg_light.init(k_light, cfg.sg_cfg)
        else:
            params["light"] = envmap_light.init(k_light, cfg.env_cfg)
    else:
        color_in = (sh_encode_dim(cfg.dir_degree) + cfg.geo_feat_dim
                    if cfg.dir_degree > 0 else cfg.geo_feat_dim)
        params["color_net"] = init_mlp(
            k_color, [color_in] + [cfg.hidden_dim_color]
            * (cfg.num_layers_color - 1) + [3], bias=True)
    return params


def _sigma_from_embed(params, embed):
    h = apply_mlp(params["sigma_net"], embed)
    return trunc_exp(h[..., 0]), h[..., 1:]


def density(params, state: MeshFieldState, x, cfg: CurvedFieldConfig,
            rt: FieldRuntime | None = None, *, mode: str = "none",
            key=None, frames=None):
    """sigma (shell-masked) + geo features (network_curvedfield.py:
    412-433)."""
    out = mesh_field.apply(params["field"], state, x, cfg.field, rt,
                           mode=mode, key=key, no_noise=key is None,
                           need_normals=False, frames=frames)
    sigma, geo_feat = _sigma_from_embed(params, out.embed)
    return jnp.where(out.h_mask, sigma, 0.0), geo_feat


def sigma_with_aux(params, state: MeshFieldState, x, d,
                   cfg: CurvedFieldConfig, rt: FieldRuntime | None = None,
                   *, mode: str = "none", frames=None):
    """Two-phase sigma pass: (sigma, aux) where aux caches the embedding
    and geo features so `color_from_aux` can shade survivors without
    re-running the projection + hash-encode chain."""
    out = mesh_field.apply(params["field"], state, x, cfg.field, rt,
                           mode=mode, no_noise=True, need_normals=False,
                           frames=frames)
    sigma, geo_feat = _sigma_from_embed(params, out.embed)
    sigma = jnp.where(out.h_mask, sigma, 0.0)
    aux = {"geo": geo_feat, "embed": out.embed,
           "h_mask": out.h_mask}
    return sigma, aux


def color_from_aux(params, state: MeshFieldState, x, d, aux,
                   cfg: CurvedFieldConfig, rt: FieldRuntime | None, frames,
                   *, visual_mode: str = "RGB",
                   light_visual_mode: str = "Full", light_import=None,
                   euler_rot=None):
    """Shading pass over the survivor pool (mode='none' + per-ray frames
    fast path only), reusing aux['embed'] / aux['geo'] from the sigma
    pass.  Handles every visual mode except 'Grad' (which needs the
    -grad(sigma) chain and falls back to the one-pass renderer)."""
    fcfg = cfg.field
    F = fcfg.encoder_f_out_dim
    x_embed = aux["embed"][..., :F]
    z_embed = aux["embed"][..., F:]
    n = frames["normal"]
    normal_coarse = n / (jnp.linalg.norm(n, axis=-1, keepdims=True)
                         + 1e-5)
    mask = aux["h_mask"][..., None]
    if visual_mode == "UV":
        rt_eff = rt if rt is not None else FieldRuntime.default()
        color, uv_mask = uv_visual(state, x, cfg, rt_eff, "none")
        m = mask if uv_mask is None else (aux["h_mask"]
                                          & uv_mask)[..., None]
        return jnp.where(m, color, 0.0)
    if visual_mode in ("Tan", "Btan"):
        color = tbn_visual(state, x, cfg, "none",
                           row=0 if visual_mode == "Tan" else 1)
        return jnp.where(mask, color, 0.0)
    if visual_mode == "Fea":
        color = jnp.clip((aux["embed"][..., :3] + 1.0) / 2.0, 0.0, 1.0)
        return jnp.where(mask, color, 0.0)
    if visual_mode == "Nc":
        return jnp.where(mask, (normal_coarse + 1.0) / 2.0, 0.0)

    if fcfg.pred_normal:
        h = jnp.sum((x - frames["p0"]) * n, axis=-1, keepdims=True)
        p_sur = x - h * n
        ncfg = fcfg.normal_cfg
        nparams = params["field"]["normal"]
        from . import normal_net
        phi_embed = normal_net.phi_embedding(
            nparams, p_sur, ncfg, amp=fcfg.infer_table_bf16)
        nf_local = normal_net.apply(nparams, z_embed, x_embed, ncfg,
                                    phi_embed=phi_embed)
        nf = jnp.einsum("nba,nb->na", frames["tbn"], nf_local)
        nf = nf / (jnp.linalg.norm(nf, axis=-1, keepdims=True) + 1e-5)
    else:
        nf = normal_coarse
    if visual_mode == "Nf":
        return jnp.where(mask, (nf + 1.0) / 2.0, 0.0)
    normal = nf if cfg.render_light_model else normal_coarse
    if (cfg.render_light_model and rt is not None
            and rt.fc_weight is not None):
        # fine/coarse blend slider (network_curvedfield.py:300) --
        # same blend as `forward` so the two paths render identically
        normal = rt.fc_weight * normal \
            + (1.0 - rt.fc_weight) * normal_coarse
        normal = normal / (jnp.linalg.norm(normal, axis=-1,
                                           keepdims=True) + 1e-5)
    if visual_mode not in ("RGB",):
        # 'normal' and any unrecognized mode: the display normal
        return jnp.where(mask, (normal + 1.0) / 2.0, 0.0)

    if euler_rot is not None:
        # rotate light directions (network_curvedfield.py:304-308);
        # euler_rot stays a traced [3, 3] so slider ticks never recompile
        d = jnp.einsum("ab,nb->na", euler_rot, d)
        normal = jnp.einsum("ab,nb->na", euler_rot, normal)
        normal_coarse = jnp.einsum("ab,nb->na", euler_rot, normal_coarse)

    if cfg.render_light_model:
        full, spec, dif, alb = shade(
            params, aux["geo"], jax.lax.stop_gradient(normal), d, cfg,
            normal_secondary=normal_coarse, light_import=light_import)
        color = {"Full": full, "Specular": spec, "Diffuse": dif,
                 "Albedo": alb}[light_visual_mode]
    else:
        from ..utils.mlp import apply_mlp
        if cfg.dir_degree > 0:
            dn = d / (jnp.linalg.norm(d, axis=-1, keepdims=True) + 1e-5)
            wr = 2.0 * jnp.sum(-dn * normal, -1,
                               keepdims=True) * normal + dn
            h_in = jnp.concatenate([sh_encode(wr, cfg.dir_degree),
                                    aux["geo"]], -1)
        else:
            h_in = aux["geo"]
        color = jax.nn.sigmoid(apply_mlp(params["color_net"], h_in))
    return jnp.where(mask, color, 0.0)


def uv_visual(state: MeshFieldState, x, cfg: CurvedFieldConfig, rt,
              mode: str):
    """UV visual mode: uvh[..., :2] in the red/green channels
    (network_curvedfield.py:356-364; tools/map.py:775-787).

    Pure visualization -- everything stop_gradient'd.  Returns
    (color [N, 3], h_mask [N] | None).  Mode handling mirrors the
    reference's active-projector selection: base template for 'none',
    the imported mesh for 'shape'/'unhash' (with the runtime sdf
    scaling of mesh_field's shape path), canvas coordinates for
    'field' (the reference's uv() returns zeros there -- its imported
    projector has no UVs -- the canvas coords are strictly more
    informative), zeros for 'patch' (point cloud, no UVs)."""
    from ..geometry import projector as proj

    fcfg = cfg.field
    if mode == "field":
        u = x[..., 0] / state.imported.bounds[0]
        v = x[..., 1] / state.imported.bounds[1]
        sdf = x[..., 2] - rt.sdf_offset
        h_mask = ((jnp.abs(sdf) < fcfg.h_threshold)
                  & (jnp.abs(u) <= 1.0) & (jnp.abs(v) <= 1.0))
        uv = jnp.stack([(u + 1.0) / 2.0, (v + 1.0) / 2.0], -1)
    elif mode == "patch":
        return jnp.zeros_like(x), None
    else:
        parr = (state.projector if mode == "none"
                else state.projector_imported)
        uvh_out, h_mask, _, _ = proj.uvh(parr, x, k=fcfg.k_for_uv,
                                         h_threshold=None)
        sdf = uvh_out[..., 2]
        if mode in ("shape", "unhash"):
            sdf = (sdf / jnp.maximum(rt.sdf_scale_factor, 1e-5)
                   - rt.sdf_offset)
        h_mask = h_mask & (jnp.abs(sdf) < fcfg.h_threshold)
        uv = uvh_out[..., :2]
    color = jnp.concatenate([uv, jnp.zeros_like(uv[..., :1])], -1)
    return jax.lax.stop_gradient(color), h_mask


def tbn_visual(state: MeshFieldState, x, cfg: CurvedFieldConfig,
               mode: str, row: int):
    """Tan (row=0) / Btan (row=1) visual modes: the local TBN frame's
    tangent or bitangent as (v+1)/2 color (network_curvedfield.py:
    365-373; tools/map.py:788-798).  'field' shows the identity frame,
    'patch' the reference's zero frame (mid-gray)."""
    from ..geometry import projector as proj

    if mode == "field":
        vec = jnp.zeros_like(x).at[..., row].set(1.0)
        return (vec + 1.0) / 2.0
    if mode == "patch":
        return jnp.full_like(x, 0.5)
    parr = state.projector if mode == "none" else state.projector_imported
    tbn, _ = proj.query_tbn(parr, x, k=cfg.field.k_for_uv,
                            h_threshold=cfg.field.h_threshold)
    return jax.lax.stop_gradient((tbn[:, row] + 1.0) / 2.0)


def shade(params, geo_feat, normal_primary, view_dirs,
          cfg: CurvedFieldConfig, *, normal_secondary=None,
          shade_visibility: bool = True, gamma=None, light_import=None):
    """Run the configured light model
    (network_curvedfield.py:327-352)."""
    li = light_import or {}
    if cfg.light_model == "SH":
        return sh_light.apply(
            params["light"], geo_feat, normal_primary, view_dirs,
            cfg.sh_cfg, normals_secondary=normal_secondary,
            shade_visibility=shade_visibility and not cfg.no_visibility,
            gamma=gamma, **li)
    if cfg.light_model == "SG":
        # SG uses -d as view dirs (network_curvedfield.py:333)
        return sg_light.apply(params["light"], geo_feat, normal_primary,
                              -view_dirs, cfg.sg_cfg, **li)
    return envmap_light.apply(params["light"], geo_feat, normal_primary,
                              view_dirs, cfg.env_cfg,
                              normal_coarse=normal_secondary, gamma=gamma,
                              **li)


def forward(params, state: MeshFieldState, x, d, cfg: CurvedFieldConfig,
            rt: FieldRuntime | None = None, *, mode: str = "none",
            key=None, training: bool = False, euler_rot=None,
            visual_mode: str = "RGB", light_visual_mode: str = "Full",
            gamma=None, light_import=None, frames=None):
    """Full shading forward (network_curvedfield.py:230-409).

    Returns (sigma [N], color [N, 3], extras dict).  During training with
    a light model, extras carries 'normal' (predicted fine) and
    'normal_grad' (the smoothed -grad(sigma) supervision target).
    """
    extras = {}
    use_grad_normal = cfg.render_light_model and training

    if use_grad_normal:
        def sigma_remap_fn(pts):
            out = mesh_field.apply(params["field"], state, pts, cfg.field,
                                   rt, mode=mode, key=key,
                                   requires_grad_xyz=True, frames=frames)
            sigma, geo = _sigma_from_embed(params, out.embed)
            remap = (1.0 / SIGMA_REMAP_LAMBDA
                     * (1.0 - jnp.exp(-SIGMA_REMAP_LAMBDA * sigma)))
            return jnp.sum(remap), (sigma, geo, out)

        grad_x, (sigma, geo_feat, fout) = jax.grad(
            sigma_remap_fn, has_aux=True)(x)
        normal_grad = -grad_x
        normal_grad = normal_grad / (jnp.linalg.norm(
            normal_grad, axis=-1, keepdims=True) + 1e-5)
        h_mask = fout.h_mask & jnp.all(
            jnp.isfinite(normal_grad), axis=-1)
    else:
        fout = mesh_field.apply(params["field"], state, x, cfg.field, rt,
                                mode=mode, key=key, no_noise=not training,
                                frames=frames)
        sigma, geo_feat = _sigma_from_embed(params, fout.embed)
        normal_grad = None
        h_mask = fout.h_mask

    normal_coarse = fout.normal_coarse
    normal_fine = fout.normal_fine
    normal = normal_fine if cfg.render_light_model else normal_coarse
    if (cfg.render_light_model and rt is not None
            and rt.fc_weight is not None):
        # fine/coarse blend slider (network_curvedfield.py:300)
        normal = rt.fc_weight * normal \
            + (1.0 - rt.fc_weight) * normal_coarse
    normal = normal / (jnp.linalg.norm(normal, axis=-1,
                                       keepdims=True) + 1e-5)

    if cfg.render_light_model and training and normal_grad is not None:
        # smoothed supervision target (network_curvedfield.py:274-288)
        w = cfg.smooth_grad_weight
        tgt = jax.lax.stop_gradient(normal_grad) * (1 - w) \
            + normal_coarse * w
        tgt = tgt / (jnp.linalg.norm(tgt, axis=-1, keepdims=True) + 1e-5)
        extras["normal"] = normal_fine
        extras["normal_grad"] = tgt

    normal_rot = normal
    coarse_rot = normal_coarse
    d_eff = d
    if euler_rot is not None and not training:
        # rotate light directions (network_curvedfield.py:304-308)
        d_eff = jnp.einsum("ab,nb->na", euler_rot, d)
        normal_rot = jnp.einsum("ab,nb->na", euler_rot, normal)
        coarse_rot = jnp.einsum("ab,nb->na", euler_rot, normal_coarse)

    if training or visual_mode == "RGB":
        if cfg.render_light_model:
            n_primary = jax.lax.stop_gradient(normal_rot)
            full, spec, dif, alb = shade(
                params, geo_feat, n_primary, d_eff, cfg,
                normal_secondary=coarse_rot, gamma=gamma,
                light_import=light_import)
            color = {"Full": full, "Specular": spec, "Diffuse": dif,
                     "Albedo": alb}[light_visual_mode if not training
                                    else "Full"]
        else:
            if cfg.dir_degree > 0:
                dn = d_eff / (jnp.linalg.norm(d_eff, axis=-1,
                                              keepdims=True) + 1e-5)
                wr = 2.0 * jnp.sum(-dn * normal_rot, -1,
                                   keepdims=True) * normal_rot + dn
                dir_embed = sh_encode(wr, cfg.dir_degree)
                h = jnp.concatenate([dir_embed, geo_feat], -1)
            else:
                h = geo_feat
            color = jax.nn.sigmoid(apply_mlp(params["color_net"], h))
    elif visual_mode == "UV":
        rt_eff = rt if rt is not None else FieldRuntime.default()
        color, uv_mask = uv_visual(state, x, cfg, rt_eff, mode)
        if uv_mask is not None:
            h_mask = uv_mask
    elif visual_mode in ("Tan", "Btan"):
        color = tbn_visual(state, x, cfg, mode,
                           row=0 if visual_mode == "Tan" else 1)
    elif visual_mode == "Grad" and normal_grad is not None:
        color = (normal_grad + 1.0) / 2.0
    elif visual_mode == "Nc":
        color = (normal_coarse + 1.0) / 2.0
    elif visual_mode == "Nf":
        color = (normal_fine + 1.0) / 2.0
    elif visual_mode == "normal":
        color = (normal + 1.0) / 2.0
    elif visual_mode == "Fea":
        color = jnp.clip((fout.embed[..., :3] + 1.0) / 2.0, 0.0, 1.0)
    else:
        color = (normal + 1.0) / 2.0

    sigma = jnp.where(h_mask, sigma, 0.0)
    color = jnp.where(h_mask[..., None], color, 0.0)
    return sigma, color, extras


def forward_baked(params, bake, x, d, cfg: CurvedFieldConfig,
                  rt: FieldRuntime | None, frames, *,
                  light_visual_mode: str = "Full", euler_rot=None,
                  light_import=None):
    """Shading forward through a baked feature atlas (render/baked.py).

    Replaces the projection + hash-encode + phi-encode chain (the frame's
    dominant gather cost) with ONE corner-packed atlas row per sample;
    everything downstream (sigma MLP, factorized normal net, light model)
    is identical to `forward`/`color_from_aux`.  Inference only, mode
    'none', RGB visual mode."""
    from ..ops import freq_encode
    from ..render import baked as baked_mod

    fcfg = cfg.field
    n = frames["normal"]
    normal_coarse = n / (jnp.linalg.norm(n, axis=-1, keepdims=True)
                         + 1e-5)
    p0 = frames["p0"]
    h = jnp.sum((x - p0) * normal_coarse, axis=-1, keepdims=True)

    vals, tile_ok = baked_mod.lookup(bake, frames, x)
    F = fcfg.encoder_f_out_dim
    x_embed = vals[:, :F]
    phi_embed = vals[:, F:]
    z_embed = freq_encode(h, fcfg.z_multires)
    sigma, geo_feat = _sigma_from_embed(
        params, jnp.concatenate([x_embed, z_embed], axis=-1))
    h_mask = (jnp.abs(h[..., 0]) < fcfg.h_threshold) & frames["hit"] \
        & tile_ok
    sigma = jnp.where(h_mask, sigma, 0.0)

    color = _baked_shade(params, x_embed, phi_embed, z_embed, geo_feat,
                         frames["tbn"], normal_coarse, d, cfg, rt,
                         light_visual_mode=light_visual_mode,
                         euler_rot=euler_rot, light_import=light_import)
    color = jnp.where(h_mask[..., None], color, 0.0)
    return sigma, color


def _baked_shade(params, x_embed, phi_embed, z_embed, geo_feat, tbn,
                 normal_coarse, d, cfg: CurvedFieldConfig,
                 rt: FieldRuntime | None, *,
                 light_visual_mode: str = "Full", euler_rot=None,
                 light_import=None):
    """Shading tail shared by the per-sample baked forward and the
    per-ray deferred stage (normal net -> fc blend -> light/color)."""
    fcfg = cfg.field
    if fcfg.pred_normal:
        from . import normal_net
        ncfg = fcfg.normal_cfg
        nf_local = normal_net.apply(params["field"]["normal"], z_embed,
                                    x_embed, ncfg, phi_embed=phi_embed)
        nf = jnp.einsum("nba,nb->na", tbn, nf_local)
        nf = nf / (jnp.linalg.norm(nf, axis=-1, keepdims=True) + 1e-5)
    else:
        nf = normal_coarse
    normal = nf if cfg.render_light_model else normal_coarse
    if (cfg.render_light_model and rt is not None
            and rt.fc_weight is not None):
        normal = rt.fc_weight * normal \
            + (1.0 - rt.fc_weight) * normal_coarse
        normal = normal / (jnp.linalg.norm(normal, axis=-1,
                                           keepdims=True) + 1e-5)

    d_eff = d
    if euler_rot is not None:
        d_eff = jnp.einsum("ab,nb->na", euler_rot, d)
        normal = jnp.einsum("ab,nb->na", euler_rot, normal)
        normal_coarse = jnp.einsum("ab,nb->na", euler_rot, normal_coarse)

    if cfg.render_light_model:
        full, spec, dif, alb = shade(
            params, geo_feat, jax.lax.stop_gradient(normal), d_eff, cfg,
            normal_secondary=normal_coarse, light_import=light_import)
        return {"Full": full, "Specular": spec, "Diffuse": dif,
                "Albedo": alb}[light_visual_mode]
    if cfg.dir_degree > 0:
        dn = d_eff / (jnp.linalg.norm(d_eff, axis=-1,
                                      keepdims=True) + 1e-5)
        wr = 2.0 * jnp.sum(-dn * normal, -1,
                           keepdims=True) * normal + dn
        hcol = jnp.concatenate([sh_encode(wr, cfg.dir_degree),
                                geo_feat], -1)
    else:
        hcol = geo_feat
    return jax.nn.sigmoid(apply_mlp(params["color_net"], hcol))


def forward_baked_s1(params, bake, x, cfg: CurvedFieldConfig, frames):
    """Deferred baked stage 1 (per SAMPLE): sigma + the flat shading
    feature row.

    Layout of `feat` (split again by `forward_baked_s2`):
    [x_embed F | phi_embed P | z_embed Z | geo_feat G | tbn 9 | nc 3].
    Rows outside the shell (h_mask false) are zeroed: their composite
    weight is zero and zeros keep the weighted mean well-conditioned."""
    from ..ops import freq_encode
    from ..render import baked as baked_mod

    fcfg = cfg.field
    n = frames["normal"]
    normal_coarse = n / (jnp.linalg.norm(n, axis=-1, keepdims=True)
                         + 1e-5)
    h = jnp.sum((x - frames["p0"]) * normal_coarse, axis=-1,
                keepdims=True)
    vals, tile_ok = baked_mod.lookup(bake, frames, x)
    F = fcfg.encoder_f_out_dim
    x_embed = vals[:, :F]
    phi_embed = vals[:, F:]
    z_embed = freq_encode(h, fcfg.z_multires)
    sigma, geo_feat = _sigma_from_embed(
        params, jnp.concatenate([x_embed, z_embed], axis=-1))
    h_mask = (jnp.abs(h[..., 0]) < fcfg.h_threshold) & frames["hit"] \
        & tile_ok
    feat = jnp.concatenate(
        [x_embed, phi_embed, z_embed, geo_feat,
         frames["tbn"].reshape(-1, 9), normal_coarse], axis=-1)
    return (jnp.where(h_mask, sigma, 0.0),
            jnp.where(h_mask[:, None], feat, 0.0))


def forward_baked_s2(params, fbar, d, cfg: CurvedFieldConfig,
                     rt: FieldRuntime | None, *,
                     light_visual_mode: str = "Full", euler_rot=None,
                     light_import=None):
    """Deferred baked stage 2 (per RAY): shade the weight-composited
    feature row.  The SNeRG move (deferred NeRF rendering): at
    infer_color_cap survivors per ray this runs the normal net + light
    model once per ray instead of once per sample."""
    fcfg = cfg.field
    F = fcfg.encoder_f_out_dim
    P = fcfg.normal_cfg.phi_embed_dim if fcfg.pred_normal else 0
    G = cfg.geo_feat_dim
    Z = fbar.shape[-1] - F - P - G - 12
    x_embed = fbar[:, :F]
    phi_embed = fbar[:, F:F + P]
    z_embed = fbar[:, F + P:F + P + Z]
    geo_feat = fbar[:, F + P + Z:F + P + Z + G]
    tbn = fbar[:, F + P + Z + G:F + P + Z + G + 9].reshape(-1, 3, 3)
    nc = fbar[:, F + P + Z + G + 9:]
    nc = nc / (jnp.linalg.norm(nc, axis=-1, keepdims=True) + 1e-5)
    return _baked_shade(params, x_embed, phi_embed, z_embed, geo_feat,
                        tbn, nc, d, cfg, rt,
                        light_visual_mode=light_visual_mode,
                        euler_rot=euler_rot, light_import=light_import)


VISUAL_MODES = ["RGB", "UV", "Grad", "Nc", "Tan", "Btan", "normal", "Fea",
                "Nf"]
LIGHT_VISUAL_MODES = ["Full", "Specular", "Diffuse", "Albedo"]


def regular_loss(params, cfg: CurvedFieldConfig, step, *,
                 optimize_camera_loss=None, key=None,
                 camera_reg_weight=None):
    """meshfea regularizers + lip regularization (+ camera reg supplied by
    the trainer) -- network_curvedfield.py:219-228.

    camera_reg_weight overrides the reference's hardcoded schedule
    (1e4 below step 2000, 1e2 after): at short schedules the early
    clamp pins the deltas to zero by design, so tuning runs need the
    knob the reference lacks."""
    loss = mesh_field.regular_loss(params["field"], cfg.field, key=key)
    if (cfg.field.lip and cfg.render_light_model
            and cfg.field.pred_normal):
        from . import normal_net
        loss = loss + 1e-4 * normal_net.regularization(
            params["field"]["normal"])
    if optimize_camera_loss is not None:
        weight = (camera_reg_weight if camera_reg_weight is not None
                  else jnp.where(step > 2000, 1e2, 1e4))
        loss = loss + weight * optimize_camera_loss
    return loss
