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
