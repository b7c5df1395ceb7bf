"""Locate the KITTI test fixtures regardless of the reference mount.

The reference pins its golden counts on two KITTI frames shipped in its
``res/`` directory (reference akaze/tests/estimate_pose.rs:30-42).  The
same pair is committed into this repo at ``tests/fixtures/`` (with a
provenance note, ``source.txt``) so the golden gate, bench.py, and the
test suite all run with ``/root/reference`` unmounted.  The reference
mount is kept as a fallback for environments that predate the copy.
"""

import os

_REPO_FIXTURES = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "tests",
    "fixtures",
)
_REFERENCE_RES = "/root/reference/res"

KITTI_FRAME_0 = "0000000000.png"
KITTI_FRAME_14 = "0000000014.png"
KITTI_CALIB = "calib_cam_to_cam.txt"

# KITTI cam 00 intrinsics (fx, fy, cx, cy) as used by the reference's
# chapter-5 tutorial (reference tutorial-code chapter5 main.rs) and
# matching the K_00 line of calib_cam_to_cam.txt.
KITTI_INTRINSICS = (9.842439e2, 9.808141e2, 6.9e2, 2.331966e2)


def fixture_path(name):
    """Absolute path of a named fixture; repo copy first, reference fallback."""
    local = os.path.join(_REPO_FIXTURES, name)
    if os.path.exists(local):
        return local
    ref = os.path.join(_REFERENCE_RES, name)
    if os.path.exists(ref):
        return ref
    raise FileNotFoundError(
        f"fixture {name!r} not found in {_REPO_FIXTURES} or {_REFERENCE_RES}"
    )


def kitti_pair():
    """Paths of the two golden KITTI frames (399/343 keypoints)."""
    return fixture_path(KITTI_FRAME_0), fixture_path(KITTI_FRAME_14)
