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
    ``refit_rounds``/``refit_hypotheses``: optional inlier-refit stages (the
    batched analog of ARRSAC's block-based refinement): each round draws
    ``refit_hypotheses`` minimal sets from the best model's inlier set,
    re-estimates, and keeps the overall argmax.  Inlier-only samples are far
    more likely to be all-inlier, so refit recovers inliers the initial
    random sets missed.
    """

    threshold: float
    hypotheses: int = 1024
    refit_rounds: int = 0
    refit_hypotheses: int = 256
    # ARRSAC-style preemptive scoring (arrsac evaluates hypotheses on data
    # blocks and discards losers before seeing all points): when
    # ``prescore_matches`` > 0, every candidate model is first scored on
    # a key-randomized block of ``prescore_matches`` data rows and only the best
    # ``prescore_keep`` models (by subset inlier count, ties toward lower
    # subset residual) graduate to full scoring.  The final selection over
    # survivors stays exact two-stage lexicographic.  At the engine's
    # two-view shape (8192 models x 512 matches) this cuts residual
    # evaluations ~5x; it is a PREFILTER, so the quantized tie-break here
    # cannot reorder the exact final ordering — it only decides which
    # near-tied models graduate (the same nondeterminism ARRSAC's block
    # schedule has).
    prescore_matches: int = 0
    prescore_keep: int = 256
    # Optional NamedSharding for the hypothesis axis: solving and scoring
    # run device-local over a mesh, only the best-model argmax reduces
    # across devices (cv_tpu.parallel.sharded_consensus sets this; results
    # are identical to the unsharded run for the same key).
    hypothesis_sharding: Any = None

    @partial(jax.jit, static_argnames=("self", "estimator", "n_hyp"))
    def _estimate_stage(self, key, estimator, data, sample_mask, n_hyp):
        """Sample ``n_hyp`` minimal sets (masked Gumbel top-k, static shapes
        for any n_valid) and solve them: returns the candidate-model pytree
        with batch shape (n_hyp, models_per_sample)."""
        leaves = jax.tree_util.tree_leaves(data)
        n = leaves[0].shape[0]
        m = estimator.min_samples

        def sample_one(kk):
            g = jax.random.gumbel(kk, (n,))
            g = jnp.where(sample_mask, g, -jnp.inf)
            _, idx = jax.lax.top_k(g, m)
            return idx

        keys = jax.random.split(key, n_hyp)
        idx = jax.vmap(sample_one)(keys)  # (H, m)
        if self.hypothesis_sharding is not None:
            idx = jax.lax.with_sharding_constraint(idx, self.hypothesis_sharding)
        sampled = jax.tree_util.tree_map(lambda x: x[idx], data)
        return estimator.estimate(sampled)

    @partial(jax.jit, static_argnames=("self", "estimator"))
    def _prescore_stage(self, key, estimator, models, data, valid_row):
        """Preemption: keep the ``prescore_keep`` most promising models by
        scoring only a RANDOM block of ``prescore_matches`` rows (see class
        doc).  The block is drawn with the consensus PRNG key — ARRSAC's
        blocks are randomized, and a deterministic first-rows block is
        response-biased on P3P paths that feed matches in feature order: a
        spatially degenerate block (strongest features on one plane) could
        preempt the true pose before full scoring.  Valid rows are preferred
        via masked Gumbel top-k (invalid rows only fill the block when fewer
        than ``prescore_matches`` valid rows exist; their valid_row gate
        still excludes them from counts).  Returns a models pytree with
        batch shape (prescore_keep, 1)."""
        p = self.prescore_matches
        n = valid_row.shape[0]
        g = jnp.where(valid_row, jax.random.gumbel(key, (n,)), -jnp.inf)
        _, bidx = jax.lax.top_k(g, min(p, n))
        sub = jax.tree_util.tree_map(lambda x: x[bidx], data)
        res = estimator.residual(models, sub)  # (H, M, P)
        inliers = (res < self.threshold) & valid_row[bidx] & jnp.isfinite(res)
        counts = jnp.sum(inliers, axis=-1).reshape(-1)
        total = jnp.sum(jnp.where(inliers, res, 0.0), axis=-1).reshape(-1)
        # Composite preemption key: counts are small ints (<= p), and the
        # tie-break term lives in (0, 1], so it can never reorder counts.
        key = counts.astype(jnp.float32) * 2.0 + 1.0 / (1.0 + total)
        _, kidx = jax.lax.top_k(key, min(self.prescore_keep, key.shape[0]))
        return jax.tree_util.tree_map(
            lambda x: x.reshape((-1,) + x.shape[2:])[kidx][:, None], models
        )

    @partial(jax.jit, static_argnames=("self", "estimator"))
    def _score_stage(self, estimator, models, data, valid_row):
        """Score every candidate model against every data row and pick the
        lexicographic best: max inlier count, ties broken by least total
        inlier residual.  Plain count-argmax is fragile when several motions
        tie (the tie went to whichever hypothesis the sampler drew first);
        the residual tie-break selects the geometrically tightest model, the
        same model ARRSAC's refinement ladder converges to
        (vslam-sandbox/src/main.rs:105-117).

        The ordering is computed as a true two-stage lexicographic argmax
        (argmin of total over the models at max count), NOT as a combined
        float score: folding the tie-break into ``count - scaled_total``
        quantizes away totals below the count's ULP (~3e-5 at count 400 in
        f32), which degraded the pick to "first model with a small-enough
        total" and measurably broke three-view bootstrapping on exact
        synthetic scenes where dozens of near-perfect models tie at full
        count (totals 1e-15..1e-7) and only the genuine minimum is reliably
        the true motion.  Returns ``(best model, inlier mask, inlier count,
        total inlier residual)``."""
        leaves = jax.tree_util.tree_leaves(data)
        n = leaves[0].shape[0]
        res = estimator.residual(models, data)  # (H, M, N)
        inliers = (res < self.threshold) & valid_row & jnp.isfinite(res)
        counts = jnp.sum(inliers, axis=-1)  # (H, M)
        total = jnp.sum(jnp.where(inliers, res, 0.0), axis=-1)
        flat_counts = counts.reshape(-1)
        flat_total = total.reshape(-1)
        at_max = flat_counts == jnp.max(flat_counts)
        # argmin picks the first index among equal totals, preserving the
        # deterministic first-drawn order for exact ties.
        best = jnp.argmin(jnp.where(at_max, flat_total, jnp.inf))
        best_model = jax.tree_util.tree_map(
            lambda x: x.reshape((-1,) + x.shape[2:])[best], models
        )
        return (
            best_model,
            inliers.reshape((-1, n))[best],
            flat_counts[best],
            flat_total[best],
        )

    def model_inliers(self, key, estimator: Estimator, data, n_valid=None):
        """Find the best model and its inlier mask.

        ``data``: pytree of ``(N, ...)`` arrays (all matching leading N).
        ``n_valid``: optional scalar count <= N of real rows (rows past it
        are padding and are neither sampled nor scored).

        Returns ``(model, inlier_mask (N,), inlier_count)``. The model is a
        single pytree element (best hypothesis). If no hypothesis yields
        any inliers the count is 0 and the model is whatever scored best.

        Estimate and scoring run as two separate XLA programs on purpose:
        fusing a heavy solver (Lambda-Twist) with its residual scoring in
        one program SIGABRTs the TPU compiler, and the split also lets the
        two programs cache independently across estimators.
        """
        leaves = jax.tree_util.tree_leaves(data)
        n = leaves[0].shape[0]
        m = estimator.min_samples
        if n_valid is None:
            n_valid = jnp.int32(n)
        valid_row = jnp.arange(n) < n_valid

        def run_round(k, n_hyp, sample_mask):
            models = self._estimate_stage(k, estimator, data, sample_mask, n_hyp)
            if (
                self.prescore_matches > 0
                and n_hyp * estimator.models_per_sample > self.prescore_keep
            ):
                pk = jax.random.fold_in(k, 0x9E3779B9)  # block != sample draws
                models = self._prescore_stage(pk, estimator, models, data, valid_row)
            return self._score_stage(estimator, models, data, valid_row)

        # The first round consumes ``key`` itself so refit_rounds=0 draws
        # exactly the same minimal sets as the plain single-round version.
        best_model, best_mask, best_count, best_total = run_round(
            key, self.hypotheses, valid_row
        )

        for r in range(self.refit_rounds):
            sub = jax.random.fold_in(key, r + 1)
            # Sample from the current inlier set when it can fill a minimal
            # set; otherwise fall back to all valid rows (no-op round).
            enough = best_count >= m
            sample_mask = jnp.where(enough, best_mask & valid_row, valid_row)
            model_r, mask_r, count_r, total_r = run_round(
                sub, self.refit_hypotheses, sample_mask
            )
            # Same lexicographic order as _score_stage: count first, then
            # least total inlier residual; exact ties keep the incumbent.
            take = (count_r > best_count) | (
                (count_r == best_count) & (total_r < best_total)
            )
            best_model = jax.tree_util.tree_map(
                lambda new, old: jnp.where(take, new, old), model_r, best_model
            )
            best_mask = jnp.where(take, mask_r, best_mask)
            best_count = jnp.where(take, count_r, best_count)
            best_total = jnp.where(take, total_r, best_total)

        return best_model, best_mask, best_count
