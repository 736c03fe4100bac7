"""Interactive viewer application (NeRFGUI rebuild, nerf/gui.py:62-798).

The reference uses dearpygui on the training workstation; on TPU the
natural split is a headless render/train service driven over HTTP from
any browser.  ``ViewerApp`` is the engine: the per-frame train/test loop
with the frame-time controllers, the orbit camera, and every GUI action
as a method (save/load field, patch, shape, unhash, envmap, visual/light
modes, the sliders).  ``serve()`` (server.py) exposes it as an MJPEG
stream + JSON control endpoints.
"""

from __future__ import annotations

import numpy as np

from ..train import field_io
from .camera import OrbitCamera
from .controllers import (FrameTimer, ResolutionController,
                          TrainStepController)


class ViewerApp:
    def __init__(self, trainer, *, W: int = 800, H: int = 800,
                 train_target_ms: float = 500.0,
                 render_target_ms: float = 200.0):
        self.trainer = trainer
        self.camera = OrbitCamera(W, H, radius=getattr(
            trainer.dataset, "radius", 2.0))
        self.train_ctrl = TrainStepController(train_target_ms)
        self.res_ctrl = ResolutionController(render_target_ms)
        self.training = False
        self.bg_color = 1.0
        self.euler = np.zeros(3)
        self.last_metrics = {}

    # ---- per-frame loop (gui.py:791-798) -----------------------------

    def frame(self) -> np.ndarray:
        if self.training:
            with FrameTimer() as t:
                self.last_metrics = self.trainer.train(
                    self.train_ctrl.steps)
            self.train_ctrl.update(t.ms)
        with FrameTimer() as t:
            img = self.render()
        self.res_ctrl.update(t.ms)
        return img

    def render(self) -> np.ndarray:
        ds = self.res_ctrl.downscale
        H = max(self.camera.H // ds, 32)
        W = max(self.camera.W // ds, 32)
        kw = {}
        if (getattr(self, "baked", False) and not self.training
                and hasattr(self.trainer, "bake_atlas")):
            # texture-mapped fast path (render/baked.py): only while
            # NOT training -- the atlas re-bakes per parameter change
            kw["baked"] = True
        out = self.trainer.render_frame(self.camera.pose, H=H, W=W,
                                        bg_color=self.bg_color, **kw)
        img = np.clip(np.asarray(out["image"]), 0, 1)
        if ds > 1:
            img = np.repeat(np.repeat(img, ds, 0), ds, 1)
        return (img[:self.camera.H, :self.camera.W] * 255).astype(
            np.uint8)

    # ---- GUI actions (gui.py:192-700 button wiring) ------------------

    def start_training(self):
        self.training = True

    def stop_training(self):
        self.training = False

    def toggle_baked(self):
        """Baked texture-mapped rendering (render/baked.py): ~2x frame
        rate while viewing a trained state.  Bakes on first use
        (seconds); training frames always use the live field."""
        self.baked = not getattr(self, "baked", False)
        return self.baked

    def switch_visual_mode(self, mode: str | None = None):
        from ..models.curved_field import VISUAL_MODES

        modes = VISUAL_MODES
        cur = getattr(self.trainer, "visual_mode", "RGB")
        if mode is None:
            mode = modes[(modes.index(cur) + 1) % len(modes)]
        self.trainer.visual_mode = mode
        return mode

    def switch_light_mode(self, mode: str | None = None):
        from ..models.curved_field import LIGHT_VISUAL_MODES

        modes = LIGHT_VISUAL_MODES
        cur = getattr(self.trainer, "light_visual_mode", "Full")
        if mode is None:
            mode = modes[(modes.index(cur) + 1) % len(modes)]
        self.trainer.light_visual_mode = mode
        return mode

    def set_euler(self, x: float, y: float, z: float):
        """Light-rotation sliders (reference gui.py:560-584): the
        rotation vector is threaded as a traced [3, 3] into the render
        bundle (CurvedTrainer.render_frame), so dragging never
        recompiles."""
        self.euler = np.array([x, y, z], np.float32)
        self.trainer.euler = self.euler

    # sliders (gui.py:192-700; FieldRuntime keeps these recompile-free)
    def set_sdf_factor(self, v: float):
        import jax.numpy as jnp

        self.trainer.runtime = self.trainer.runtime._replace(
            sdf_scale_factor=jnp.asarray(float(v)))

    def set_sdf_offset(self, v: float):
        import jax.numpy as jnp

        self.trainer.runtime = self.trainer.runtime._replace(
            sdf_offset=jnp.asarray(float(v)))

    def set_uv_rate(self, v: float):
        import jax.numpy as jnp

        self.trainer.runtime = self.trainer.runtime._replace(
            uv_utilize_rate=jnp.asarray(float(v)))

    def set_fc_weight(self, v: float):
        """Fine/coarse normal blend (reference gui.py:628)."""
        import jax.numpy as jnp

        self.trainer.runtime = self.trainer.runtime._replace(
            fc_weight=jnp.asarray(float(v)))

    def set_aabb(self, dim: int, v: float):
        """Inference AABB crop (reference gui.py:677-692: six sliders
        clip aabb_infer).  Intersected with the occupancy AABB at
        render time via CurvedTrainer.crop_aabb."""
        crop = getattr(self.trainer, "crop_aabb", None)
        if crop is None:
            b = self.trainer.rcfg.bound
            crop = np.array([-b, -b, -b, b, b, b], np.float32)
        crop = np.asarray(crop, np.float32).copy()
        crop[int(dim)] = float(v)
        self.trainer.crop_aabb = crop

    def set_h_threshold(self, v: float):
        import dataclasses

        fcfg = dataclasses.replace(self.trainer.ccfg.field,
                                   h_threshold=float(v))
        self.trainer.ccfg = dataclasses.replace(self.trainer.ccfg,
                                                field=fcfg)
        self.trainer.initialize_states(10)

    # save/load wiring (field_io).  mesh arguments accept an .obj path
    # so every action stays drivable through the JSON /control endpoint
    # (the reference GUI passes live objects; a web viewer cannot).
    def save_field(self, path, mesh=None, scan_pcl=None, scfg=None):
        mesh = self._resolve_mesh(mesh)
        return field_io.save_field(self.trainer, path, mesh=mesh,
                                   scan_pcl=scan_pcl, scfg=scfg)

    def load_field(self, path):
        field_io.load_field(self.trainer, path)

    def load_patch(self, path, patch_id=0):
        field_io.load_patch(self.trainer, path, patch_id)

    def load_shape(self, mesh):
        return field_io.load_shape(self.trainer, self._resolve_mesh(mesh))

    def _resolve_mesh(self, mesh):
        """None -> the trainer's template mesh; str -> load_obj(path)."""
        if mesh is None:
            mesh = getattr(self.trainer, "template_mesh", None)
            if mesh is None:
                raise ValueError("no mesh given and trainer has no "
                                 "template_mesh")
            return mesh
        if isinstance(mesh, str):
            from ..geometry.mesh import load_obj
            return load_obj(mesh)
        return mesh

    def load_unhash(self, path):
        return field_io.load_unhash(self.trainer, path)

    def bake_unhash(self, min_vertices: int = 100000):
        """Bake the trained hash field into per-vertex features
        (callback_unhash; MeshFeatureField.unhash, tools/map.py:842-860)."""
        return field_io.unhash(self.trainer, min_vertices=min_vertices)

    def switch_import(self, mode: str | None = None):
        """Toggle between the trained field ('none') and the last
        imported source (callback_switch_import,
        network_curvedfield.py switch_import): with no argument,
        flips; with one, sets it explicitly.  Refreshes the density
        grid for the newly active source."""
        tr = self.trainer
        cur = getattr(tr, "mode", "none")
        last = getattr(tr, "_last_import_mode", None)
        if mode is None:
            if cur == "none" and last is None:
                import warnings
                warnings.warn("switch_import: nothing imported yet")
                return cur
            mode = last if cur == "none" else "none"
        if cur != "none":
            tr._last_import_mode = cur
        tr.mode = mode
        tr.initialize_states(10)
        return mode

    def pick_region(self, x0: float, y0: float, x1: float, y1: float):
        """Select template-mesh faces whose centroids project into the
        pixel rect [x0,x1]x[y0,y1] of the CURRENT camera view and face
        the camera -- the headless-viewer equivalent of the reference
        GUI's mesh face picking (tools/map.py:1000-1011 picked_faces).
        The picked set restricts save_field's patch sampling.  Returns
        the number of picked faces (0 + warning when no template mesh
        is set -- face ids must index the ORIGINAL mesh's face order,
        not the projector's padded/reordered device arrays)."""
        mesh = getattr(self.trainer, "template_mesh", None)
        if mesh is None:
            import warnings
            warnings.warn("pick_region needs trainer.template_mesh")
            return 0
        verts = np.asarray(mesh.vertices)
        faces = np.asarray(mesh.faces)
        tri = verts[faces]                       # [F, 3, 3]
        cent = tri.mean(1)
        fn = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
        pose = self.camera.pose
        cam = (cent - pose[:3, 3]) @ pose[:3, :3]
        z = np.maximum(cam[:, 2], 1e-6)
        fx, fy, cx, cy = self.camera.intrinsics
        u = fx * cam[:, 0] / z + cx
        v = fy * cam[:, 1] / z + cy
        facing = np.sum(fn * (cent - pose[:3, 3]), -1) < 0
        keep = ((cam[:, 2] > 0) & facing
                & (u >= min(x0, x1)) & (u <= max(x0, x1))
                & (v >= min(y0, y1)) & (v <= max(y0, y1)))
        picked = np.where(keep)[0].astype(np.int32)
        self.trainer.picked_faces = picked if picked.size else None
        return int(picked.size)

    def clear_picked_region(self):
        self.trainer.picked_faces = None

    def load_envmap(self, path, with_visibility: bool = True):
        """Import an environment map for relighting (reference gui
        envmap controls + Trainer.load_envmap, nerf/utils.py:1265-1292)."""
        return self.trainer.load_envmap(path,
                                        with_visibility=with_visibility)

    def clear_envmap(self):
        self.trainer.clear_envmap()

    def save_checkpoint(self, path):
        self.trainer.save_checkpoint(path)

    def load_checkpoint(self, path):
        self.trainer.load_checkpoint(path)

    # ---- offline renderers / exports (gui.py callbacks) ---------------

    def take_photo(self, path, H=None, W=None):
        """High-res snapshot of the current camera (callback_take_photo;
        Trainer.take_photo, nerf/utils.py:734-768)."""
        return field_io.take_photo(self.trainer, self.camera.pose,
                                   H=H, W=W, path=path)

    def render_train(self, out_dir, indices=None):
        """Re-render every training pose (callback_render_train)."""
        return field_io.render_train(self.trainer, out_dir,
                                     indices=indices)

    def render_round(self, out_dir, n_frames: int = 30):
        """Orbit turntable render (callback_render_round)."""
        return field_io.render_round(self.trainer, out_dir,
                                     n_frames=n_frames)

    def save_point_cloud(self, path):
        """Scan point cloud via depth backprojection (callback_pcl;
        Trainer.save_point_cloud, nerf/utils.py:1093-1149)."""
        return field_io.save_point_cloud(self.trainer, path)

    def save_mesh(self, path, resolution: int = 256):
        """Marching-cubes mesh of the current density (callback_mesh)."""
        tr = self.trainer
        if hasattr(tr, "ccfg"):
            from ..models import curved_field

            def density_fn(pts):
                return curved_field.density(
                    tr.state.params, tr.field_state, pts, tr.ccfg,
                    tr.runtime, mode=tr.mode)[0]
        else:
            from ..models import ngp

            def density_fn(pts):
                return ngp.density(tr.state.params, pts, tr.mcfg)[0]
        return field_io.save_mesh(density_fn, path,
                                  resolution=resolution,
                                  bound=tr.rcfg.bound)

    def save_envmap(self, path, H: int = 128):
        """Export the CURRENT environment light as an equirect image
        (callback_save_envmap).  Renders the learned/imported light at
        lat-long directions; linear values are tonemapped by clip."""
        import numpy as np

        tr = self.trainer
        th = (np.arange(H) + 0.5) / H * np.pi
        ph = (np.arange(2 * H) + 0.5) / (2 * H) * 2 * np.pi - np.pi
        T, P = np.meshgrid(th, ph, indexing="ij")
        dirs = np.stack([np.sin(T) * np.cos(P), np.sin(T) * np.sin(P),
                         np.cos(T)], -1).reshape(-1, 3)
        li = getattr(tr, "light_import", None) or {}
        model = getattr(tr.ccfg, "light_model", "SH")
        params = tr.state.params.get("light", {})
        # a model trained without a light model has nothing to export --
        # fail with a clear message instead of an IndexError deep in the
        # per-model branches (ADVICE r4)
        probe, imp = {"SH": ("env_shs", "env_import"),
                      "SG": ("lgt_sgs", "lgt_sgs_import"),
                      "Envmap": ("env_probes", "env_import")
                      }.get(model, ("env_shs", "env_import"))
        if li.get(imp) is None and params.get(probe) is None:
            raise ValueError(
                "no environment light to export: the model was built with "
                f"light_model={model!r} but carries no light parameters "
                "(render_light_model off?) and no imported envmap")
        if model == "SH":
            from ..models.lights import sh as shl  # noqa: PLC0415
            coeffs = li.get("env_import", params.get("env_shs"))
            img = np.asarray(shl.sh_eval_color(
                coeffs, dirs, int(np.sqrt(np.asarray(coeffs).shape[0]))))
        elif model == "SG":
            lob = li.get("lgt_sgs_import", params.get("lgt_sgs"))
            lob = np.asarray(lob)
            axis = lob[:, :3] / (np.linalg.norm(lob[:, :3], axis=-1,
                                                keepdims=True) + 1e-8)
            lam, mu = np.abs(lob[:, 3:4]), np.abs(lob[:, 4:7])
            cos = dirs @ axis.T                          # [N, S]
            img = np.exp((cos - 1.0) * lam[:, 0][None]) @ mu
        else:
            env = np.asarray(li.get("env_import",
                                    params.get("env_probes")))
            iy = (np.arange(H) * env.shape[0] // H)
            ix = (np.arange(2 * H) * env.shape[1] // (2 * H))
            img = env[iy][:, ix].reshape(-1, env.shape[-1])
        img = np.clip(img.reshape(H, 2 * H, -1), 0.0, 1.0)
        if img.shape[-1] == 1:
            img = np.repeat(img, 3, -1)
        import imageio.v3 as iio
        iio.imwrite(path, (img * 255).astype(np.uint8))
        return path

    # ---- misc toggles (gui.py sliders/buttons) -------------------------

    def set_bg(self, v):
        """Background brightness (callback_change_bg)."""
        self.bg_color = float(v)

    def set_fovy(self, v: float):
        self.camera.fovy = float(v)

    def set_dt_gamma(self, v: float):
        import dataclasses

        self.trainer.rcfg = dataclasses.replace(self.trainer.rcfg,
                                                dt_gamma=float(v))

    def set_k_for_uv(self, k: int):
        """callback_k_for_uv: static model config -- changing it
        recompiles the import-mode programs (same as the reference
        rebuilding its projector)."""
        import dataclasses

        fcfg = dataclasses.replace(self.trainer.ccfg.field,
                                   k_for_uv=int(k))
        self.trainer.ccfg = dataclasses.replace(self.trainer.ccfg,
                                                field=fcfg)

    def toggle_shade_visibility(self):
        """callback_switch_shade_visibility (SH visibility probes)."""
        import dataclasses

        c = self.trainer.ccfg
        self.trainer.ccfg = dataclasses.replace(
            c, no_visibility=not c.no_visibility)
        return not self.trainer.ccfg.no_visibility

    def toggle_distillation(self):
        """callback_distillation: only effective with a loaded teacher."""
        import dataclasses

        t = self.trainer.tcfg
        self.trainer.tcfg = dataclasses.replace(
            t, distillation=not t.distillation)
        return self.trainer.tcfg.distillation

    def reset_camera(self):
        self.camera = OrbitCamera(self.camera.W, self.camera.H,
                                  radius=getattr(self.trainer.dataset,
                                                 "radius", 2.0))

    def set_dynamic_resolution(self, on: bool = True, tier: int = 3):
        """callback_set_dynamic_resolution: freeze the downscale tier
        (tier 3 = full resolution) or re-enable the controller."""
        self.res_ctrl.enabled = bool(on)
        if not on:
            self.res_ctrl.tier = int(tier)
