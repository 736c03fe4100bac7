"""Data preparation: video -> frames -> masks -> COLMAP -> transforms.json.

Rebuild of the reference's capture pipeline
(``tools/prepare_your_data.py`` + ``tools/colmap2nerf.py``): ffmpeg frame
extraction, blurry-frame removal by Laplacian variance (:25-74), an
automatic foreground-mask hook (GrabCut replaces the MiVOS GUI of
``tools/interactive_invoke.py`` -- interactive video segmentation is out
of scope for a headless TPU host), COLMAP subprocess drivers, and the
COLMAP-model -> nerf ``transforms.json`` conversion (colmap2nerf.py:
145-461).  External binaries (ffmpeg, colmap) are optional: every step
degrades with a clear message.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess

import numpy as np


def extract_frames(video_path: str, out_dir: str, fps: int = 2) -> int:
    """ffmpeg frame extraction (prepare_your_data.py:106)."""
    os.makedirs(out_dir, exist_ok=True)
    if shutil.which("ffmpeg") is None:
        raise RuntimeError("ffmpeg not found on PATH")
    subprocess.run(["ffmpeg", "-y", "-i", video_path, "-vf",
                    f"fps={fps}", os.path.join(out_dir, "%04d.png")],
                   check=True)
    return len([f for f in os.listdir(out_dir) if f.endswith(".png")])


def laplacian_variance(image: np.ndarray) -> float:
    """Sharpness metric (prepare_your_data.py:25-74)."""
    import cv2

    gray = cv2.cvtColor(image, cv2.COLOR_RGB2GRAY) \
        if image.ndim == 3 else image
    return float(cv2.Laplacian(gray, cv2.CV_64F).var())


def remove_blurry_frames(frame_dir: str, keep_ratio: float = 0.8) -> int:
    """Drop the blurriest (1 - keep_ratio) of frames."""
    import imageio.v3 as iio

    files = sorted(f for f in os.listdir(frame_dir)
                   if f.lower().endswith((".png", ".jpg", ".jpeg")))
    scores = []
    for f in files:
        scores.append(laplacian_variance(
            iio.imread(os.path.join(frame_dir, f))))
    thresh = np.quantile(scores, 1.0 - keep_ratio)
    removed = 0
    for f, s in zip(files, scores):
        if s < thresh:
            os.remove(os.path.join(frame_dir, f))
            removed += 1
    return removed


def segment_foreground(image: np.ndarray, rect=None,
                       iterations: int = 5) -> np.ndarray:
    """Automatic foreground mask via GrabCut (stand-in for the MiVOS GUI
    hook, prepare_your_data.py:150-155).  Returns a uint8 alpha mask."""
    import cv2

    h, w = image.shape[:2]
    if rect is None:
        rect = (w // 10, h // 10, w * 8 // 10, h * 8 // 10)
    mask = np.zeros((h, w), np.uint8)
    bgd = np.zeros((1, 65), np.float64)
    fgd = np.zeros((1, 65), np.float64)
    bgr = image[..., :3][..., ::-1].copy()
    cv2.grabCut(bgr, mask, rect, bgd, fgd, iterations,
                cv2.GC_INIT_WITH_RECT)
    return np.where((mask == cv2.GC_FGD) | (mask == cv2.GC_PR_FGD), 255,
                    0).astype(np.uint8)


def apply_masks(frame_dir: str, out_dir: str):
    """Write RGBA frames with GrabCut alpha."""
    import imageio.v3 as iio

    os.makedirs(out_dir, exist_ok=True)
    for f in sorted(os.listdir(frame_dir)):
        if not f.lower().endswith((".png", ".jpg", ".jpeg")):
            continue
        img = iio.imread(os.path.join(frame_dir, f))[..., :3]
        alpha = segment_foreground(img)
        rgba = np.concatenate([img, alpha[..., None]], -1)
        iio.imwrite(os.path.join(out_dir, os.path.splitext(f)[0]
                                 + ".png"), rgba)


def run_colmap(image_dir: str, workspace: str,
               matcher: str = "sequential") -> str:
    """COLMAP feature/match/mapper drivers (colmap2nerf.py:49-95)."""
    if shutil.which("colmap") is None:
        raise RuntimeError("colmap not found on PATH")
    db = os.path.join(workspace, "colmap.db")
    sparse = os.path.join(workspace, "sparse")
    text = os.path.join(workspace, "colmap_text")
    os.makedirs(sparse, exist_ok=True)
    os.makedirs(text, exist_ok=True)
    run = lambda *cmd: subprocess.run(list(cmd), check=True)
    run("colmap", "feature_extractor", "--database_path", db,
        "--image_path", image_dir, "--ImageReader.camera_model",
        "OPENCV", "--ImageReader.single_camera", "1")
    run("colmap", f"{matcher}_matcher", "--database_path", db)
    run("colmap", "mapper", "--database_path", db, "--image_path",
        image_dir, "--output_path", sparse)
    run("colmap", "model_converter", "--input_path",
        os.path.join(sparse, "0"), "--output_path", text,
        "--output_type", "TXT")
    return text


def _qvec2rotmat(q):
    w, x, y, z = q
    return np.array([
        [1 - 2 * y * y - 2 * z * z, 2 * x * y - 2 * z * w,
         2 * x * z + 2 * y * w],
        [2 * x * y + 2 * z * w, 1 - 2 * x * x - 2 * z * z,
         2 * y * z - 2 * x * w],
        [2 * x * z - 2 * y * w, 2 * y * z + 2 * x * w,
         1 - 2 * x * x - 2 * y * y]])


def colmap_to_transforms(text_dir: str, image_dir: str, out_path: str,
                         aabb_scale: int = 4) -> dict:
    """COLMAP text model -> transforms.json (colmap2nerf.py:145-461).

    Pose convention: COLMAP world2cam -> cam2world with the nerf/blender
    axis flips; NeRFDataset then applies nerf_matrix_to_ngp.
    """
    # cameras.txt
    with open(os.path.join(text_dir, "cameras.txt")) as f:
        for line in f:
            if line.startswith("#"):
                continue
            parts = line.split()
            w, h = float(parts[2]), float(parts[3])
            fl_x = float(parts[4])
            model = parts[1]
            fl_y = fl_x if model in ("SIMPLE_PINHOLE", "SIMPLE_RADIAL") \
                else float(parts[5])
            cx = float(parts[5 if model in ("SIMPLE_PINHOLE",
                                            "SIMPLE_RADIAL") else 6])
            cy = float(parts[6 if model in ("SIMPLE_PINHOLE",
                                            "SIMPLE_RADIAL") else 7])
            break

    frames = []
    with open(os.path.join(text_dir, "images.txt")) as f:
        lines = [ln for ln in f if not ln.startswith("#")]
    for ln in lines[::2]:   # every other line is the 2D-points list
        parts = ln.split()
        if len(parts) < 10:
            continue
        q = np.array([float(v) for v in parts[1:5]])
        t = np.array([float(v) for v in parts[5:8]])
        name = parts[9]
        R = _qvec2rotmat(q)
        w2c = np.eye(4)
        w2c[:3, :3] = R
        w2c[:3, 3] = t
        c2w = np.linalg.inv(w2c)
        # colmap camera (x right, y down, z forward) -> nerf convention
        # (x right, y up, z back): flip y and z columns
        c2w[0:3, 1] *= -1
        c2w[0:3, 2] *= -1
        frames.append({
            "file_path": os.path.join(os.path.basename(image_dir), name),
            "transform_matrix": c2w.tolist(),
        })

    out = {
        "fl_x": fl_x, "fl_y": fl_y, "cx": cx, "cy": cy,
        "w": int(w), "h": int(h), "aabb_scale": aabb_scale,
        "frames": frames,
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=2)
    return out


def prepare_scene(video_path: str, scene_dir: str, *, fps: int = 2,
                  keep_ratio: float = 0.8, mask: bool = True,
                  interactive: bool = False, port: int = 7870):
    """Full pipeline driver (prepare_your_data.py:136-164).

    interactive=True serves the browser scribble segmenter
    (viewer/segment.py, the reference's MiVOS-GUI stage) and blocks
    until the user saves masks; mask=True without interactive runs the
    automatic GrabCut stand-in."""
    frames_dir = os.path.join(scene_dir, "images_raw")
    extract_frames(video_path, frames_dir, fps=fps)
    remove_blurry_frames(frames_dir, keep_ratio=keep_ratio)
    image_dir = frames_dir
    if interactive:
        from ..viewer.segment import serve_segmenter
        from .segmenter import MaskSession

        session = MaskSession(frames_dir)
        print("[prepare] scribble the object, then 'save masks' and "
              "Ctrl-C to continue")
        try:
            serve_segmenter(session, port=port)
        except KeyboardInterrupt:
            pass
        masked = os.path.join(scene_dir, "images_masked")
        if os.path.isdir(masked) and os.listdir(masked):
            image_dir = masked
    elif mask:
        image_dir = os.path.join(scene_dir, "images")
        apply_masks(frames_dir, image_dir)
    text_dir = run_colmap(image_dir, scene_dir)
    return colmap_to_transforms(text_dir, image_dir,
                                os.path.join(scene_dir,
                                             "transforms.json"))
