"""Batched sample consensus (the ARRSAC slot of the reference).

The reference injects the external ``arrsac`` crate — an adaptive,
sequential RANSAC variant — everywhere a ``sample_consensus::Consensus`` is
needed (vslam-sandbox/src/main.rs:105-117).  Sequential adaptive hypothesis
scheduling is hostile to an accelerator, so the TPU-native design generates a
fixed budget of hypotheses up front, solves every minimal problem in one
batched estimator call, scores all (hypothesis, model) pairs against all
data points in one pass, and argmaxes inlier counts — same contract
(best model + inlier set), accelerator-shaped execution.

The ``Estimator`` vocabulary is preserved: an estimator is (min_samples,
estimate_fn, residual_fn); a consensus takes an estimator and data.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Estimator:
    """A minimal solver: maps sampled data to a batch of candidate models.

    * ``min_samples``: size of a minimal sample set.
    * ``estimate``: pytree of ``(..., min_samples, ...)`` arrays -> models
      pytree with batch shape ``(..., models_per_sample)``.
    * ``residual``: (models with batch shape S, data pytree of ``(N, ...)``)
      -> residuals ``S + (N,)``.
    """

    min_samples: int
    models_per_sample: int
    estimate: Callable[..., Any]
    residual: Callable[..., Any]


@dataclasses.dataclass(frozen=True)
class BatchConsensus:
    """Fixed-budget batched consensus (the reference's Arrsac slot).

    ``threshold``: inlier residual threshold (reference thresholds: 0.1 for
    the akaze test, settings.rs consensus thresholds 1e-5/1e-7).
    ``hypotheses``: number of minimal sets drawn per call.
    """

    threshold: float
    hypotheses: int = 1024

    @partial(jax.jit, static_argnames=("self", "estimator"))
    def model_inliers(self, key, estimator: Estimator, data, n_valid=None):
        """Find the best model and its inlier mask.

        ``data``: pytree of ``(N, ...)`` arrays (all matching leading N).
        ``n_valid``: optional scalar count <= N of real rows (rows past it
        are padding and are neither sampled nor scored).

        Returns ``(model, inlier_mask (N,), inlier_count)``. The model is a
        single pytree element (best hypothesis). If no hypothesis yields
        any inliers the count is 0 and the model is whatever scored best.
        """
        leaves = jax.tree_util.tree_leaves(data)
        n = leaves[0].shape[0]
        m = estimator.min_samples
        if n_valid is None:
            n_valid = jnp.int32(n)

        def sample_one(k):
            # Sample a minimal set without replacement from the valid prefix
            # via masked Gumbel top-k (static shapes, any n_valid).
            g = jax.random.gumbel(k, (n,))
            g = jnp.where(jnp.arange(n) < n_valid, g, -jnp.inf)
            _, idx = jax.lax.top_k(g, m)
            return idx

        keys = jax.random.split(key, self.hypotheses)
        idx = jax.vmap(sample_one)(keys)  # (H, m)
        sampled = jax.tree_util.tree_map(lambda x: x[idx], data)
        models = estimator.estimate(sampled)  # batch (H, M)
        res = estimator.residual(models, data)  # (H, M, N)
        valid_row = jnp.arange(n) < n_valid
        inliers = (res < self.threshold) & valid_row & jnp.isfinite(res)
        counts = jnp.sum(inliers, axis=-1)  # (H, M)
        flat_counts = counts.reshape(-1)
        best = jnp.argmax(flat_counts)
        best_model = jax.tree_util.tree_map(
            lambda x: x.reshape((-1,) + x.shape[2:])[best], models
        )
        best_mask = inliers.reshape((-1, n))[best]
        return best_model, best_mask, flat_counts[best]
