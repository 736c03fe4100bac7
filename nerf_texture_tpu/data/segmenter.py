"""Interactive video segmentation: scribbles -> GrabCut -> propagation.

Replaces the reference's MiVOS-based PyQt segmentation GUI
(/root/reference/tools/interactive_invoke.py:47,974 and its hook in
tools/prepare_your_data.py:150-155) with a headless-host-compatible
workflow of the same shape:

  1. the user scribbles foreground/background strokes on a KEYFRAME
     (served by the web viewer, viewer/segment.py);
  2. GrabCut turns strokes + a prior mask into a full mask;
  3. the mask PROPAGATES to neighboring frames by dense optical flow
     (Farneback) warping, each refined by another GrabCut pass seeded
     from the warped mask -- the interaction model of MiVOS (annotate
     few keyframes, propagate to the rest) without its GPU network;
  4. masks are written as the `masks/` directory + alpha-composited
     `images/` that the COLMAP/transforms pipeline consumes
     (prepare.py), matching the reference's handoff.

Pure host-side OpenCV/numpy -- segmentation is data preparation, not a
TPU workload.
"""

from __future__ import annotations

import os

import numpy as np


class MaskSession:
    """One segmentation session over an ordered frame directory."""

    def __init__(self, frame_dir: str, max_side: int = 960):
        import imageio.v3 as iio

        self.frame_dir = frame_dir
        self.files = sorted(
            f for f in os.listdir(frame_dir)
            if f.lower().endswith((".png", ".jpg", ".jpeg")))
        if not self.files:
            raise ValueError(f"no frames in {frame_dir}")
        self._iio = iio
        first = self.load_frame(0)
        self.H, self.W = first.shape[:2]
        scale = max(self.H, self.W) / max_side
        self.work_scale = max(1.0, scale)    # GrabCut/flow resolution
        n = len(self.files)
        # per-frame scribbles: 0 = none, 1 = foreground, 2 = background
        self.strokes = [np.zeros((self.H, self.W), np.uint8)
                        for _ in range(n)]
        self.masks: list[np.ndarray | None] = [None] * n

    # -- frame / stroke IO ------------------------------------------------

    def load_frame(self, idx: int) -> np.ndarray:
        img = self._iio.imread(os.path.join(self.frame_dir,
                                            self.files[idx]))
        if img.ndim == 2:
            img = np.stack([img] * 3, -1)
        return np.ascontiguousarray(img[..., :3])

    def add_stroke(self, idx: int, points, label: int,
                   radius: int = 6) -> None:
        """Rasterize a polyline scribble; label 1=fg, 2=bg."""
        import cv2

        pts = np.asarray(points, np.int32).reshape(-1, 2)
        cv2.polylines(self.strokes[idx], [pts], False, int(label),
                      thickness=2 * radius)
        if len(pts) == 1:
            cv2.circle(self.strokes[idx], tuple(pts[0]), radius,
                       int(label), -1)

    def clear_strokes(self, idx: int) -> None:
        self.strokes[idx][:] = 0

    # -- segmentation -----------------------------------------------------

    def _grabcut(self, img: np.ndarray, seed: np.ndarray,
                 iters: int = 5) -> np.ndarray:
        """seed: cv2 GrabCut label map (GC_BGD/FGD/PR_BGD/PR_FGD)."""
        import cv2

        s = self.work_scale
        if s > 1.0:
            size = (int(round(img.shape[1] / s)),
                    int(round(img.shape[0] / s)))
            img_w = cv2.resize(img, size, interpolation=cv2.INTER_AREA)
            seed_w = cv2.resize(seed, size,
                                interpolation=cv2.INTER_NEAREST)
        else:
            img_w, seed_w = img, seed.copy()
        if not ((seed_w == cv2.GC_FGD) | (seed_w == cv2.GC_PR_FGD)).any():
            return np.zeros(img.shape[:2], bool)
        if not ((seed_w == cv2.GC_BGD) | (seed_w == cv2.GC_PR_BGD)).any():
            seed_w[0, :] = seed_w[-1, :] = cv2.GC_BGD
            seed_w[:, 0] = seed_w[:, -1] = cv2.GC_BGD
        bgd = np.zeros((1, 65), np.float64)
        fgd = np.zeros((1, 65), np.float64)
        # grabCut updates the mask IN PLACE: materialize contiguity
        # BEFORE the call or the update lands in a temporary copy
        seed_w = np.ascontiguousarray(seed_w)
        cv2.grabCut(np.ascontiguousarray(img_w), seed_w, None, bgd, fgd,
                    iters, cv2.GC_INIT_WITH_MASK)
        m = (seed_w == cv2.GC_FGD) | (seed_w == cv2.GC_PR_FGD)
        if s > 1.0:
            m = cv2.resize(m.astype(np.uint8),
                           (img.shape[1], img.shape[0]),
                           interpolation=cv2.INTER_NEAREST) > 0
        return m

    def segment(self, idx: int) -> np.ndarray:
        """GrabCut from this frame's scribbles (+ previous mask prior)."""
        import cv2

        seed = np.full((self.H, self.W), cv2.GC_PR_BGD, np.uint8)
        prior = self.masks[idx]
        if prior is not None:
            seed[prior] = cv2.GC_PR_FGD
        else:
            # no prior: a thin foreground scribble alone makes GrabCut
            # collapse to the stroke (measured IoU 0.11); seed a
            # generous probable-foreground box around the fg strokes
            # (the classic rect init) and let the background model +
            # bg strokes carve it back (IoU 1.0 on the test sphere)
            ys, xs = np.nonzero(self.strokes[idx] == 1)
            if len(ys):
                ex = int(1.5 * max(int(np.ptp(xs)), int(np.ptp(ys)), 10))
                seed[max(0, ys.min() - ex):ys.max() + ex,
                     max(0, xs.min() - ex):xs.max() + ex] = cv2.GC_PR_FGD
        seed[self.strokes[idx] == 1] = cv2.GC_FGD
        seed[self.strokes[idx] == 2] = cv2.GC_BGD
        mask = self._grabcut(self.load_frame(idx), seed)
        self.masks[idx] = mask
        return mask

    def propagate(self, src: int, dst: int) -> np.ndarray:
        """Warp src's mask to dst by dense optical flow, refine with a
        GrabCut pass seeded from the warped mask (eroded core = sure
        foreground, dilated ring = uncertain) -- MiVOS-style temporal
        propagation (interactive_invoke.py's propagation step)."""
        import cv2

        if self.masks[src] is None:
            raise ValueError(f"frame {src} has no mask to propagate")
        s = self.work_scale
        size = (int(round(self.W / s)), int(round(self.H / s)))
        g0 = cv2.cvtColor(cv2.resize(self.load_frame(src), size),
                          cv2.COLOR_RGB2GRAY)
        g1 = cv2.cvtColor(cv2.resize(self.load_frame(dst), size),
                          cv2.COLOR_RGB2GRAY)
        flow = cv2.calcOpticalFlowFarneback(
            g1, g0, None, 0.5, 3, 21, 3, 5, 1.2, 0)   # dst -> src
        yy, xx = np.mgrid[0:size[1], 0:size[0]].astype(np.float32)
        map_x = xx + flow[..., 0]
        map_y = yy + flow[..., 1]
        m_small = cv2.resize(self.masks[src].astype(np.uint8), size,
                             interpolation=cv2.INTER_NEAREST)
        warped = cv2.remap(m_small, map_x, map_y, cv2.INTER_NEAREST,
                           borderValue=0) > 0
        k = np.ones((5, 5), np.uint8)
        core = cv2.erode(warped.astype(np.uint8), k, iterations=2) > 0
        ring = cv2.dilate(warped.astype(np.uint8), k, iterations=3) > 0
        seed_small = np.full(warped.shape, cv2.GC_BGD, np.uint8)
        seed_small[ring] = cv2.GC_PR_BGD
        seed_small[warped] = cv2.GC_PR_FGD
        seed_small[core] = cv2.GC_FGD
        seed = cv2.resize(seed_small, (self.W, self.H),
                          interpolation=cv2.INTER_NEAREST)
        # dst scribbles (if any) override the propagated prior
        seed[self.strokes[dst] == 1] = cv2.GC_FGD
        seed[self.strokes[dst] == 2] = cv2.GC_BGD
        mask = self._grabcut(self.load_frame(dst), seed)
        self.masks[dst] = mask
        return mask

    def propagate_all(self, src: int) -> int:
        """Propagate outward (src -> both ends); returns frames masked."""
        n = 0
        for i in range(src + 1, len(self.files)):
            self.propagate(i - 1, i)
            n += 1
        for i in range(src - 1, -1, -1):
            self.propagate(i + 1, i)
            n += 1
        return n

    # -- output -----------------------------------------------------------

    def save(self, out_dir: str, composite_dir: str | None = None) -> int:
        """Write masks/<frame>.png (0/255) and optionally the
        white-composited masked images the COLMAP stage consumes
        (reference prepare_your_data.py:150-155 hands MiVOS masks to the
        same place)."""
        import imageio.v3 as iio

        os.makedirs(out_dir, exist_ok=True)
        if composite_dir:
            os.makedirs(composite_dir, exist_ok=True)
        n = 0
        for i, f in enumerate(self.files):
            if self.masks[i] is None:
                continue
            m = (self.masks[i] * 255).astype(np.uint8)
            iio.imwrite(os.path.join(out_dir,
                                     os.path.splitext(f)[0] + ".png"), m)
            if composite_dir:
                img = self.load_frame(i)
                rgba = np.dstack([img, m])
                iio.imwrite(os.path.join(
                    composite_dir, os.path.splitext(f)[0] + ".png"), rgba)
            n += 1
        return n
