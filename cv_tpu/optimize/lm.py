"""Levenberg-Marquardt nonlinear least squares.

Facade parity with the reference's ``cv::optimize::lm`` module
(``/root/reference/cv/src/lib.rs:124-129``), which re-exports the
``levenberg-marquardt`` crate — a MINPACK-style LM over a user-supplied
residual/Jacobian pair.  The reference pipeline never calls it (the SfM
engine uses the gradient-descent optimizers in ``optimizers.py``); it is
public API surface for users fitting arbitrary models.

TPU-first design: instead of the crate's ``LeastSquaresProblem`` trait the
solver is a pure function over a residual callable — the Jacobian comes
from ``jax.jacfwd`` unless one is supplied — with a ``lax.while_loop``
trust-region iteration (Marquardt diagonal scaling).  Everything is fixed
shape, so the solver jits, vmaps over batched problems, and differentiates
through (the loop carries only accept/reject state).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class LMResult(NamedTuple):
    """Solution and convergence report (crate's ``MinimizationReport``)."""

    x: jnp.ndarray  # (N,) final parameters
    cost: jnp.ndarray  # scalar 0.5*||f||^2 at x
    iterations: jnp.ndarray  # int32 accepted+rejected steps taken
    converged: jnp.ndarray  # bool: any tolerance hit before max_iterations


def levenberg_marquardt(
    residuals: Callable[[jnp.ndarray], jnp.ndarray],
    x0: jnp.ndarray,
    jacobian: Callable[[jnp.ndarray], jnp.ndarray] | None = None,
    *,
    max_iterations: int = 100,
    initial_lambda: float = 1e-3,
    lambda_up: float = 10.0,
    lambda_down: float = 0.1,
    gtol: float = 1e-10,
    ftol: float = 1e-12,
) -> LMResult:
    """Minimize ``0.5 * ||residuals(x)||^2`` from ``x0``.

    ``residuals`` maps (N,) params to (M,) residuals with static M.
    Damped normal equations with Marquardt scaling:
    ``(J^T J + lambda * diag(J^T J)) dx = -J^T f``; accepted steps shrink
    ``lambda`` by ``lambda_down``, rejected steps grow it by ``lambda_up``
    (the crate's trust-region update, simplified to multiplicative form).

    Stops when the max-abs gradient falls below ``gtol``, an accepted step
    improves cost by less than ``ftol`` relative, or ``max_iterations``.
    Wrap with ``jax.vmap`` for batched problems.
    """
    if jacobian is None:
        jacobian = jax.jacfwd(residuals)

    x0 = jnp.asarray(x0)
    dtype = x0.dtype
    eps = jnp.asarray(jnp.finfo(dtype).tiny, dtype)

    def cost_of(x):
        f = residuals(x)
        return 0.5 * jnp.sum(f * f)

    def cond(state):
        _, _, _, it, done = state
        return (~done) & (it < max_iterations)

    def body(state):
        x, cost, lam, it, _ = state
        f = residuals(x)
        j = jacobian(x)  # (M, N)
        jtj = j.T @ j
        g = j.T @ f
        # Marquardt scaling: damp by the diagonal so the step is invariant
        # to per-parameter scale; floor the diagonal to keep the system
        # solvable for flat directions.
        d = jnp.maximum(jnp.diagonal(jtj), eps)
        a = jtj + lam * jnp.diag(d)
        dx = -jnp.linalg.solve(a, g)
        x_new = x + dx
        cost_new = cost_of(x_new)
        accept = jnp.isfinite(cost_new) & (cost_new < cost)
        x = jnp.where(accept, x_new, x)
        rel_improve = (cost - cost_new) / jnp.maximum(cost, eps)
        done = (jnp.max(jnp.abs(g)) < gtol) | (accept & (rel_improve < ftol))
        lam = jnp.where(accept, lam * lambda_down, lam * lambda_up)
        cost = jnp.where(accept, cost_new, cost)
        return x, cost, lam, it + 1, done

    state = (
        x0,
        cost_of(x0),
        jnp.asarray(initial_lambda, dtype),
        jnp.asarray(0, jnp.int32),
        jnp.asarray(False),
    )
    x, cost, _, it, done = jax.lax.while_loop(cond, body, state)
    return LMResult(x=x, cost=cost, iterations=it, converged=done)
