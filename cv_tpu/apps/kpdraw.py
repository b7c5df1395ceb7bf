"""kpdraw: render AKAZE keypoints as crosses on an image.

Re-design of ``/root/reference/kpdraw/src/main.rs`` / ``lib.rs``.

Usage:
    python -m cv_tpu.apps.kpdraw [--threshold T] INPUT OUTPUT
"""

from __future__ import annotations

import argparse


def render_crosses(image, points, arm: int = 3):
    """Draw magenta crosses at keypoint locations (kpdraw/src/lib.rs:5-13)."""
    import numpy as np

    if image.ndim == 2:
        canvas = np.repeat(image[:, :, None], 3, axis=2)
    else:
        canvas = image.copy()
    h, w = canvas.shape[:2]
    color = np.array([255, 0, 255], np.uint8)
    for x, y in points:
        xi, yi = int(round(float(x))), int(round(float(y)))
        for d in range(-arm, arm + 1):
            if 0 <= yi < h and 0 <= xi + d < w:
                canvas[yi, xi + d] = color
            if 0 <= yi + d < h and 0 <= xi < w:
                canvas[yi + d, xi] = color
    return canvas


def main(argv=None):
    p = argparse.ArgumentParser(prog="kpdraw", description="Draw AKAZE keypoints")
    p.add_argument("--threshold", type=float, default=0.001)
    p.add_argument("input")
    p.add_argument("output")
    opt = p.parse_args(argv)

    from PIL import Image

    from ..akaze import Akaze, AkazeExtractor, load_gray

    image = load_gray(opt.input)
    kp, _ = AkazeExtractor(Akaze.new(opt.threshold)).extract(image)
    print(f"extracted {len(kp['response'])} keypoints")
    canvas = render_crosses(image, kp["point"])
    Image.fromarray(canvas).save(opt.output)
    print(f"wrote {opt.output}")


if __name__ == "__main__":
    main()
