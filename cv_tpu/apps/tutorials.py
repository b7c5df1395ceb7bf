"""The four tutorial programs (reference ``tutorial-code/chapter{2..5}``)
as runnable functions, sharing the KITTI fixtures.

Run all:  python -m cv_tpu.apps.tutorials [chapter]
"""

from __future__ import annotations

import sys

from cv_tpu.utils.fixtures import fixture_path

KITTI0 = fixture_path("0000000000.png")
KITTI14 = fixture_path("0000000014.png")
# K_00 from res/calib_cam_to_cam.txt, as used by chapter 5.
KITTI_INTRINSICS = (9.842439e2, 9.808141e2, 6.9e2, 2.331966e2)


def chapter2_random_draw(output="chapter2.png"):
    """Random cross rendering (chapter2-first-program/src/main.rs)."""
    import numpy as np

    from .kpdraw import render_crosses

    rng = np.random.default_rng(0)
    canvas = np.zeros((512, 512), np.uint8)
    pts = rng.uniform(0, 512, (50, 2))
    out = render_crosses(canvas, pts)
    from PIL import Image

    Image.fromarray(out).save(output)
    print(f"chapter 2: drew 50 random crosses -> {output}")


def chapter3_akaze_extraction(output="chapter3.png"):
    """AKAZE extraction + keypoint render
    (chapter3-akaze-feature-extraction/src/main.rs:17)."""
    from PIL import Image

    from ..akaze import Akaze, AkazeExtractor, load_gray
    from .kpdraw import render_crosses

    image = load_gray(KITTI0)
    kp, _ = AkazeExtractor(Akaze.new(0.001)).extract(image)
    print(f"chapter 3: extracted {len(kp['response'])} keypoints")
    Image.fromarray(render_crosses(image, kp["point"])).save(output)
    return kp


def chapter4_feature_matching(output="chapter4.png"):
    """Symmetric matching + side-by-side match render
    (chapter4-feature-matching/src/main.rs:91-137)."""
    import numpy as np
    from PIL import Image

    from ..akaze import Akaze, AkazeExtractor, load_gray
    from ..matching import symmetric_matches
    import jax.numpy as jnp

    ex = AkazeExtractor(Akaze.new(0.001))
    img_a, img_b = load_gray(KITTI0), load_gray(KITTI14)
    kp_a, w_a = ex.extract(img_a)
    kp_b, w_b = ex.extract(img_b)
    idx, keep = symmetric_matches(jnp.asarray(w_a), jnp.asarray(w_b), better_by=48)
    keep = np.asarray(keep)
    idx = np.asarray(idx)
    matches = [(i, int(idx[i])) for i in np.nonzero(keep)[0]]
    print(f"chapter 4: {len(matches)} symmetric matches")

    h, w = img_a.shape
    canvas = np.zeros((2 * h, w, 3), np.uint8)
    canvas[:h] = img_a[:, :, None]
    canvas[h:] = img_b[:, :, None]
    rng = np.random.default_rng(0)
    for ia, ib in matches:
        xa, ya = kp_a["point"][ia]
        xb, yb = kp_b["point"][ib]
        color = rng.integers(64, 255, 3)
        _draw_line(canvas, (xa, ya), (xb, yb + h), color)
    Image.fromarray(canvas).save(output)
    return matches


def _draw_line(canvas, p0, p1, color):
    import numpy as np

    n = int(max(abs(p1[0] - p0[0]), abs(p1[1] - p0[1]))) + 1
    xs = np.linspace(p0[0], p1[0], n).round().astype(int)
    ys = np.linspace(p0[1], p1[1], n).round().astype(int)
    h, w = canvas.shape[:2]
    ok = (xs >= 0) & (xs < w) & (ys >= 0) & (ys < h)
    canvas[ys[ok], xs[ok]] = color


def chapter5_geometric_verification():
    """ARRSAC + eight-point geometric verification with camera-motion
    printout (chapter5-geometric-verification/src/main.rs:36-82)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..akaze import Akaze, AkazeExtractor, load_gray
    from ..camera import CameraIntrinsics
    from ..consensus import BatchConsensus, Estimator
    from ..core import Isometry3, camera_to_camera_residual, lie
    from ..matching import symmetric_matches
    from ..solvers import eight_point

    ex = AkazeExtractor(Akaze.new(0.001))
    kp_a, w_a = ex.extract(load_gray(KITTI0))
    kp_b, w_b = ex.extract(load_gray(KITTI14))
    idx, keep = symmetric_matches(jnp.asarray(w_a), jnp.asarray(w_b), better_by=48)
    keep = np.asarray(keep)
    idx = np.asarray(idx)
    ia = np.nonzero(keep)[0]
    ib = idx[ia]
    print(f"chapter 5: {len(ia)} symmetric matches")

    intr = CameraIntrinsics.from_values(*KITTI_INTRINSICS)
    a = intr.calibrate(jnp.asarray(kp_a["point"][ia], jnp.float64))
    b = intr.calibrate(jnp.asarray(kp_b["point"][ib], jnp.float64))
    est = Estimator(
        min_samples=8,
        models_per_sample=4,
        estimate=lambda s: eight_point.estimate(s[0], s[1]),
        residual=lambda m, d: camera_to_camera_residual(
            Isometry3(
                rotation=m.rotation[..., None, :, :],
                translation=m.translation[..., None, :],
            ),
            d[0],
            d[1],
        ),
    )
    cons = BatchConsensus(threshold=1e-7, hypotheses=2048)
    model, mask, count = cons.model_inliers(jax.random.key(0), est, (a, b))
    print(f"chapter 5: {int(count)} inliers of {len(ia)} matches")
    t = np.asarray(model.translation)
    t = t / np.linalg.norm(t)
    w = np.asarray(lie.so3_log(model.rotation))
    print(f"camera motion (unscaled translation direction): {t.round(4)}")
    print(f"camera rotation (scaled axis, rad): {w.round(5)}")
    return model, int(count)


def main(argv=None):
    args = argv if argv is not None else sys.argv[1:]
    chapters = {
        "2": chapter2_random_draw,
        "3": chapter3_akaze_extraction,
        "4": chapter4_feature_matching,
        "5": chapter5_geometric_verification,
    }
    if args and args[0] in chapters:
        chapters[args[0]]()
    else:
        for fn in chapters.values():
            fn()


if __name__ == "__main__":
    main()
