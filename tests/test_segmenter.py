"""Interactive segmentation engine: scribble -> GrabCut -> propagation.

Certifies the MiVOS-replacement workflow (reference
tools/interactive_invoke.py) on synthetic sphere frames whose alpha
channel is the ground-truth mask."""

import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def frame_dir(tmp_path_factory):
    import imageio.v3 as iio

    from nerf_texture_tpu.data.synthetic import SyntheticSphereDataset

    ds = SyntheticSphereDataset(n_frames=4, H=96, W=96)
    root = tmp_path_factory.mktemp("frames")
    gts = []
    for i in range(4):
        img = np.asarray(ds.images[i])
        rgb = img[..., :3].astype(np.float32)
        a = img[..., 3:].astype(np.float32) / 255.0
        # composite over a dark background so fg/bg are separable
        comp = (rgb * a + 24.0 * (1 - a)).astype(np.uint8)
        iio.imwrite(os.path.join(root, f"{i:04d}.png"), comp)
        gts.append(a[..., 0] > 0.5)
    return str(root), gts


def _iou(a, b):
    return (a & b).sum() / max(1, (a | b).sum())


def test_scribble_segment_and_propagate(frame_dir):
    root, gts = frame_dir
    from nerf_texture_tpu.data.segmenter import MaskSession

    s = MaskSession(root)
    gt0 = gts[0]
    ys, xs = np.nonzero(gt0)
    cy, cx = int(ys.mean()), int(xs.mean())
    # foreground scribble across the object center, background strokes
    # along two borders -- what a user would draw
    s.add_stroke(0, [[cx - 10, cy], [cx + 10, cy]], label=1, radius=3)
    s.add_stroke(0, [[2, 2], [93, 2]], label=2, radius=2)
    s.add_stroke(0, [[2, 93], [93, 93]], label=2, radius=2)
    m0 = s.segment(0)
    assert _iou(m0, gt0) > 0.7, _iou(m0, gt0)

    # propagate to every other frame without new scribbles
    s.propagate_all(0)
    for i in range(1, 4):
        iou = _iou(s.masks[i], gts[i])
        assert iou > 0.6, (i, iou)

    # corrective scribble on a propagated frame refines it
    s.add_stroke(1, [[2, 2], [40, 2]], label=2, radius=2)
    m1 = s.segment(1)
    assert _iou(m1, gts[1]) > 0.6

    # save writes masks + RGBA composites
    out = s.save(os.path.join(root, "..", "masks"),
                 composite_dir=os.path.join(root, "..", "images_masked"))
    assert out == 4
    import imageio.v3 as iio
    rgba = iio.imread(os.path.join(root, "..", "images_masked",
                                   "0000.png"))
    assert rgba.shape[-1] == 4


def test_segment_http_ui(frame_dir):
    """Drive the scribble UI over HTTP end-to-end."""
    import json
    import threading
    import urllib.request

    root, gts = frame_dir
    from nerf_texture_tpu.data.segmenter import MaskSession
    from nerf_texture_tpu.viewer.segment import serve_segmenter

    s = MaskSession(root)
    httpd = serve_segmenter(s, host="127.0.0.1", port=7931, block=False)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        page = urllib.request.urlopen(
            "http://127.0.0.1:7931/", timeout=10).read()
        assert b"segmenter" in page
        gt0 = gts[0]
        ys, xs = np.nonzero(gt0)
        cy, cx = int(ys.mean()), int(xs.mean())

        def api(body):
            req = urllib.request.Request(
                "http://127.0.0.1:7931/api",
                data=json.dumps(body).encode(), method="POST")
            return json.loads(urllib.request.urlopen(
                req, timeout=30).read())

        assert api({"op": "info"})["n"] == 4
        api({"op": "stroke", "i": 0, "label": 1,
             "points": [[cx - 10, cy], [cx + 10, cy]]})
        api({"op": "stroke", "i": 0, "label": 2,
             "points": [[2, 2], [93, 2]]})
        assert api({"op": "segment", "i": 0})["ok"]
        assert _iou(s.masks[0], gt0) > 0.5
        jpg = urllib.request.urlopen(
            "http://127.0.0.1:7931/frame?i=0", timeout=10).read()
        assert jpg[:2] == b"\xff\xd8"          # JPEG magic
    finally:
        httpd.shutdown()
