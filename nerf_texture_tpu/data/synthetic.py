"""Procedural synthetic scenes for tests and benchmarks.

The reference repo ships captured scenes (star_flower, durian, ...) which
are not redistributable test fixtures; instead we render ground truth for a
textured sphere analytically (ray-sphere intersection + a procedural
checker/stripe texture), giving deterministic images any NeRF that works
must fit to high PSNR.
"""

from __future__ import annotations

import json
import os

import numpy as np

from .poses import orbit_pose


def sphere_texture(points: np.ndarray) -> np.ndarray:
    """Procedural RGB at surface points of the unit-ish sphere."""
    x, y, z = points[..., 0], points[..., 1], points[..., 2]
    u = np.arctan2(z, x)
    v = np.arccos(np.clip(y / (np.linalg.norm(points, axis=-1) + 1e-9),
                          -1, 1))
    checker = ((np.floor(u / np.pi * 4) + np.floor(v / np.pi * 6)) % 2)
    r = 0.25 + 0.5 * checker
    g = 0.5 + 0.4 * np.sin(3 * u) * np.sin(4 * v)
    b = 0.3 + 0.5 * (1 - checker)
    return np.clip(np.stack([r, g, b], axis=-1), 0, 1)


def render_gt_sphere(pose, intrinsics, H, W, radius=0.5):
    """Analytic ground-truth render: RGBA uint8 [H, W, 4]."""
    fx, fy, cx, cy = intrinsics
    j, i = np.meshgrid(np.arange(H, dtype=np.float32),
                       np.arange(W, dtype=np.float32), indexing="ij")
    xs = (i + 0.5 - cx) / fx
    ys = (j + 0.5 - cy) / fy
    dirs = np.stack([xs, ys, np.ones_like(xs)], axis=-1)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    rays_d = dirs @ pose[:3, :3].T
    o = pose[:3, 3]

    b = np.sum(rays_d * o, axis=-1)
    c = np.dot(o, o) - radius * radius
    disc = b * b - c
    hit = disc > 0
    t = -b - np.sqrt(np.maximum(disc, 0))
    hit &= t > 0
    pts = o + t[..., None] * rays_d
    rgb = sphere_texture(pts)
    # simple head-light shading so views differ smoothly
    n = pts / (np.linalg.norm(pts, axis=-1, keepdims=True) + 1e-9)
    shade = 0.4 + 0.6 * np.clip(-np.sum(n * rays_d, axis=-1), 0, 1)
    rgb = rgb * shade[..., None]
    rgba = np.zeros((H, W, 4), np.uint8)
    rgba[..., :3] = (np.clip(rgb, 0, 1) * 255).astype(np.uint8) \
        * hit[..., None]
    rgba[..., 3] = hit.astype(np.uint8) * 255
    return rgba


class SyntheticSphereDataset:
    """In-memory dataset with the same interface as `NeRFDataset`."""

    def __init__(self, n_frames: int = 24, H: int = 64, W: int = 64,
                 radius: float = 2.0, sphere_radius: float = 0.5,
                 focal: float = None, seed: int = 0):
        self.H, self.W = H, W
        focal = focal if focal is not None else 0.9 * max(H, W)
        self.intrinsics = np.array([focal, focal, W / 2, H / 2], np.float32)
        rng = np.random.default_rng(seed)
        poses, images = [], []
        for k in range(n_frames):
            phi = 2 * np.pi * k / n_frames
            theta = np.pi / 2 + 0.5 * np.sin(2 * phi) \
                + 0.05 * rng.standard_normal()
            pose = orbit_pose(theta, phi, radius)
            poses.append(pose)
            images.append(render_gt_sphere(pose, self.intrinsics, H, W,
                                           sphere_radius))
        self.poses = np.stack(poses).astype(np.float32)
        self.images = np.stack(images)
        self.radius = radius
        self.sphere_radius = sphere_radius

    @property
    def num_frames(self) -> int:
        return self.poses.shape[0]

    def write_to_disk(self, path: str):
        """Write a transforms.json scene (for dataset-loader tests).

        Poses are written in the *nerf/blender* convention so that the
        loader's ``nerf_matrix_to_ngp`` round-trips back to ours.
        """
        import imageio.v3 as iio

        os.makedirs(os.path.join(path, "images"), exist_ok=True)
        frames = []
        for k in range(self.num_frames):
            ngp = self.poses[k]
            # invert nerf_matrix_to_ngp (scale=1): rows (1,2,0) with sign
            # flips on the last two columns
            nerf = np.eye(4, dtype=np.float32)
            nerf[0] = [ngp[2, 0], -ngp[2, 1], -ngp[2, 2], ngp[2, 3]]
            nerf[1] = [ngp[0, 0], -ngp[0, 1], -ngp[0, 2], ngp[0, 3]]
            nerf[2] = [ngp[1, 0], -ngp[1, 1], -ngp[1, 2], ngp[1, 3]]
            name = f"images/frame_{k:04d}.png"
            iio.imwrite(os.path.join(path, name), self.images[k])
            frames.append({"file_path": name,
                           "transform_matrix": nerf.tolist()})
        meta = {
            "fl_x": float(self.intrinsics[0]),
            "fl_y": float(self.intrinsics[1]),
            "cx": float(self.intrinsics[2]),
            "cy": float(self.intrinsics[3]),
            "h": self.H, "w": self.W,
            "frames": frames,
        }
        with open(os.path.join(path, "transforms.json"), "w") as f:
            json.dump(meta, f)
