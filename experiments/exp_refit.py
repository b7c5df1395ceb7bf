"""Does the consensus refit ladder earn its keep? (VERDICT r1 weak #4)

Synthetic two-view problems with bearing noise + outliers; measures pose
error and inlier recall for refit_rounds 0/1/2 at equal total hypothesis
budget (so the comparison is refit structure, not extra compute), plus the
default budgets.  Accuracy on CPU f64; TPU timing is separate (each refit
round costs 2 extra XLA dispatches/frame through the tunnel).
"""

import sys

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from cv_tpu.consensus import BatchConsensus, Estimator
from cv_tpu.core import CameraToCamera, Isometry3, camera_to_camera_residual, lie, projective
from cv_tpu.solvers import eight_point


def make_problem(rng, n=128, outlier_frac=0.4, noise=2e-4):
    rot = lie.so3_exp(jnp.asarray(rng.normal(size=3) * 0.15))
    t = jnp.asarray(rng.normal(size=3))
    pose = CameraToCamera.from_parts(t, rot)
    pts = rng.uniform([-2, -2, 3], [2, 2, 9], (n, 3))
    a_h = projective.from_point(jnp.asarray(pts))
    b_h = pose.transform(a_h)
    a = np.asarray(projective.bearing(a_h))
    b = np.asarray(projective.bearing(b_h))
    # bearing noise
    b = b + rng.normal(0, noise, b.shape)
    b /= np.linalg.norm(b, axis=-1, keepdims=True)
    # outliers: random bearings
    n_out = int(outlier_frac * n)
    out_idx = rng.choice(n, n_out, replace=False)
    rnd = rng.normal(size=(n_out, 3))
    b[out_idx] = rnd / np.linalg.norm(rnd, axis=-1, keepdims=True)
    inlier_mask = np.ones(n, bool)
    inlier_mask[out_idx] = False
    return jnp.asarray(a), jnp.asarray(b), pose, inlier_mask


EST = Estimator(
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


def run(configs, n_problems=16, threshold=1e-6):
    rng = np.random.default_rng(0)
    problems = [make_problem(rng) for _ in range(n_problems)]
    for label, kwargs in configs:
        cons = BatchConsensus(threshold=threshold, **kwargs)
        rot_errs, t_errs, recalls, precisions = [], [], [], []
        for i, (a, b, pose, true_in) in enumerate(problems):
            model, mask, count = cons.model_inliers(jax.random.key(i), EST, (a, b))
            mask = np.asarray(mask)
            re = float(
                jnp.linalg.norm(
                    lie.so3_log(model.rotation.T @ pose.rotation)
                )
            )
            tn = np.asarray(pose.translation); tn = tn / np.linalg.norm(tn)
            te = np.asarray(model.translation)
            te = te / max(np.linalg.norm(te), 1e-12)
            t_err = min(np.linalg.norm(te - tn), np.linalg.norm(te + tn))
            rot_errs.append(re); t_errs.append(t_err)
            recalls.append((mask & true_in).sum() / true_in.sum())
            precisions.append((mask & true_in).sum() / max(mask.sum(), 1))
        sys.stdout.flush()
        print(
            f"{label:26s} rot_err med {np.median(rot_errs):.2e} "
            f"t_err med {np.median(t_errs):.2e} "
            f"recall {np.mean(recalls):.3f} precision {np.mean(precisions):.3f}"
        )


if __name__ == "__main__":
    # CPU-sized budgets (the structure comparison, not absolute accuracy;
    # equal total hypothesis budget between plain and refit variants).
    run(
        [
            ("plain-512", dict(hypotheses=512)),
            ("refit1-384+128", dict(hypotheses=384, refit_rounds=1, refit_hypotheses=128)),
            ("refit2-256+2x128", dict(hypotheses=256, refit_rounds=2, refit_hypotheses=128)),
            ("refit2-512+2x128", dict(hypotheses=512, refit_rounds=2, refit_hypotheses=128)),
        ]
    )
