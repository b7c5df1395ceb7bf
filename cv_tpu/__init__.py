"""cv_tpu — a TPU-native computer-vision / visual-SLAM framework.

Built from scratch on JAX/XLA/Pallas with the capabilities of the
``rust-cv/cv`` mono-repo (see SURVEY.md): AKAZE feature extraction, bit-packed
Hamming matching on the MXU, batched sample-consensus pose estimation with
vmapped minimal solvers (eight-point, Nister-Stewenius five-point,
Lambda-Twist P3P), triangulation, epipolar-gradient pose optimizers, and an
incremental multi-view reconstruction engine.

Layering (mirrors SURVEY.md section 1):

* :mod:`cv_tpu.core` — poses, Lie algebra, projective points (cv-core)
* :mod:`cv_tpu.camera` — pinhole camera models, essential matrix (cv-pinhole)
* :mod:`cv_tpu.ops` — image/stencil kernels (XLA + Pallas)
* :mod:`cv_tpu.akaze` — nonlinear scale-space feature extraction (akaze)
* :mod:`cv_tpu.matching` — Hamming descriptor matching + LSH (space/hgg/hamming-lsh)
* :mod:`cv_tpu.solvers` — minimal solvers (eight-point/nister-stewenius/lambda-twist)
* :mod:`cv_tpu.consensus` — batched sample-consensus (arrsac)
* :mod:`cv_tpu.triangulate` — triangulators (cv-geom)
* :mod:`cv_tpu.optimize` — pose optimizers (cv-optimize)
* :mod:`cv_tpu.sfm` — the reconstruction engine (cv-sfm)
"""

__version__ = "0.1.0"

# Batteries-included facade (the reference's `cv` crate, cv/src/lib.rs:42-148):
# the full vocabulary importable from the top level. Submodules with heavy
# dependencies stay lazy via their own packages.
from .camera import (  # noqa: E402,F401
    CameraIntrinsics,
    CameraIntrinsicsK1Distortion,
    CameraSpecification,
)
from .core import (  # noqa: E402,F401
    CameraToCamera,
    CameraToWorld,
    Isometry3,
    WorldToCamera,
    WorldToWorld,
    camera_to_camera_residual,
    world_to_camera_residual,
)


def __getattr__(name):
    # Lazy subpackage access: cv_tpu.akaze, cv_tpu.sfm, ... import on demand.
    import importlib

    if name in (
        "akaze",
        "camera",
        "consensus",
        "core",
        "geom",
        "matching",
        "ops",
        "optimize",
        "sfm",
        "solvers",
        "triangulate",
        "apps",
        "parallel",
        "utils",
        "video",
    ):
        return importlib.import_module(f".{name}", __name__)
    raise AttributeError(name)
