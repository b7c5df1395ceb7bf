"""NumPy transliteration of the reference's two-view geometry — TEST ORACLE.

Like ``oracle_akaze.py``, this is a deliberate, line-faithful port of the
reference Rust (f64 host math, same operation order) used ONLY to pin
cv_tpu's pose VALUES at 1e-4 (BASELINE.md: "poses within 1e-4 of the Rust
reference").  It must never be imported by library code.

Sources:
  - eight-point:    reference eight-point/src/lib.rs:11-58
  - recondition:    reference cv-pinhole/src/essential.rs:60-78
  - decomposition:  reference cv-pinhole/src/essential.rs:114-162
  - LinearEigen:    reference cv-geom/src/triangulation.rs:83-129

nalgebra's try_symmetric_eigen / SVD and NumPy's eigh/svd both converge to
machine precision on these well-conditioned 3x3/4x4/9x9 problems; the only
representational slack is eigenvector sign and the essential matrix's
global scale, which the comparisons below quotient out.
"""

from __future__ import annotations

import numpy as np

# `W` from essential.rs:126 (Wikipedia "Finding one solution").
W = np.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])


def encode_epipolar_equation(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(8, 9) design matrix (eight-point/src/lib.rs:11-24).

    ``a``/``b``: (8, 3) homogeneous coordinates.  Keeps the reference's
    quirk of dividing BOTH sides by ``a.z`` (lib.rs:15-16: ``ap = a / a.z;
    bp = b / a.z``).
    """
    out = np.zeros((8, 9))
    for i in range(8):
        ap = a[i] / a[i][2]
        bp = b[i] / a[i][2]
        for j in range(3):
            out[i, 3 * j : 3 * j + 3] = ap[j] * bp
    return out


def eight_point_essential(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Essential matrix from 8 matches (eight-point/src/lib.rs:44-58).

    The reference takes the minimum-eigenvalue eigenvector of EᵀE and fills
    a Matrix3 COLUMN-major (``Matrix3::from_iterator``, lib.rs:56)."""
    ec = encode_epipolar_equation(a, b)
    eet = ec.T @ ec
    vals, vecs = np.linalg.eigh(eet)  # ascending
    eigenvector = vecs[:, 0]
    return eigenvector.reshape(3, 3, order="F")


def recondition(e: np.ndarray) -> np.ndarray:
    """Closest essential matrix in Frobenius form (essential.rs:60-78):
    average the two large singular values, zero the third."""
    u, s, vt = np.linalg.svd(e)
    new_singular = (s[0] + s[1]) / 2.0
    return u @ np.diag([new_singular, new_singular, 0.0]) @ vt


def possible_rotations_unscaled_translation(e: np.ndarray):
    """(rot_a, rot_b, t) from the essential matrix (essential.rs:114-162):
    SVD, force positive determinants of U (flip its last column) and Vᵀ
    (flip its last row), then R_a = U W Vᵀ, R_b = U Wᵀ Vᵀ, t = U[:, 2]."""
    u, _, vt = np.linalg.svd(e)
    if np.linalg.det(u) < 0.0:
        u = u.copy()
        u[:, 2] *= -1.0
    if np.linalg.det(vt) < 0.0:
        vt = vt.copy()
        vt[2, :] *= -1.0
    rot_a = u @ W @ vt
    rot_b = u @ W.T @ vt
    t = u[:, 2].copy()
    return rot_a, rot_b, t


def possible_unscaled_poses(e: np.ndarray):
    """Four (rotation, translation) CameraToCamera candidates
    (essential.rs:218-233): {(t, R_a), (t, R_b), (-t, R_a), (-t, R_b)}."""
    rot_a, rot_b, t = possible_rotations_unscaled_translation(e)
    return [(rot_a, t), (rot_b, t), (rot_a, -t), (rot_b, -t)]


def essential_from_pose(rot: np.ndarray, t: np.ndarray) -> np.ndarray:
    """E = [t]x R for a CameraToCamera (a->b) pose (essential.rs
    ``From<CameraToCamera>``)."""
    tx = np.array(
        [[0.0, -t[2], t[1]], [t[2], 0.0, -t[0]], [-t[1], t[0], 0.0]]
    )
    return tx @ rot


def linear_eigen_triangulate(poses, bearings) -> np.ndarray | None:
    """LinearEigen triangulation (cv-geom/src/triangulation.rs:83-129).

    ``poses``: list of (rot (3,3), trans (3,)) WorldToCamera; ``bearings``:
    list of unit (3,) camera-space bearings.  Returns the homogeneous world
    point or None (non-finite / cheirality failure)."""
    if len(poses) < 2:
        return None
    a = np.zeros((4, 4))
    for (rot, trans), bearing in zip(poses, bearings):
        p = np.concatenate([rot, trans[:, None]], axis=1)  # (3, 4)
        term = p - np.outer(bearing, bearing) @ p
        a += term.T @ term
    vals, vecs = np.linalg.eigh(a)
    point = vecs[:, 0]
    if not np.all(np.isfinite(point)):
        return None
    # point.bearing(): normalize(xyz * sign-corrected by w) — cv-core's
    # WorldPoint::bearing treats the homogeneous point projectively.
    xyz = point[:3] * np.sign(point[3]) if point[3] != 0.0 else point[:3]
    nrm = np.linalg.norm(xyz)
    if nrm == 0.0:
        return None
    pb = xyz / nrm
    for (rot, trans), bearing in zip(poses, bearings):
        # pose.inverse() maps the camera bearing into world space.
        world_bearing = rot.T @ bearing
        if not (world_bearing @ pb >= 0.0):
            return None
    return point


def epipolar_residual(e: np.ndarray, a: np.ndarray, b: np.ndarray):
    """Sampson-free bilinear residual bᵀ E a per match ((N, 3) inputs)."""
    return np.einsum("ni,ij,nj->n", b, e, a)
