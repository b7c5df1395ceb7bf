"""Pallas-fused FED diffusion chains for the nonlinear scale space.

Each evolution runs ``n`` explicit FED steps (3-17; evolution.rs:80-126,
fed_tau.rs:26-93).  The XLA path (ops.fed_step) materializes Lt to HBM
after every step — octave 0 alone is 10 full-resolution round trips.  This
kernel runs one evolution's ENTIRE tau chain per grid step with Lt resident
in VMEM: one HBM read of (Lt, flow), one write of the final Lt.

Bit-exactness: each step reuses the exact gather-stencil expression of
``ops.fed_step`` (same slices, same add/sub order), so the fused chain is
bitwise identical to the sequential XLA path — verified by
tests/test_pallas_scale.py against the goldens' anchor path.

Workload reference: ``/root/reference/akaze/src/nonlinear_diffusion.rs:14-58``
(the half-flow scatter loops this re-expresses as a fused VMEM stencil).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fed_step(lt: jnp.ndarray, c: jnp.ndarray, tau: float) -> jnp.ndarray:
    """One FED step on a (H, W) VMEM-resident plane — the exact expression
    of ops.fed_step (kept in lockstep; see its docstring)."""
    step = jnp.float32(0.5 * tau)
    l = lt
    hf = step * (c[:, :-1] + c[:, 1:]) * (l[:, 1:] - l[:, :-1])
    vf = step * (c[:-1, :] + c[1:, :]) * (l[1:, :] - l[:-1, :])
    zc = jnp.zeros_like(l[:, :1])
    zr = jnp.zeros_like(l[:1, :])
    return (
        l
        + jnp.concatenate([hf, zc], axis=1)
        - jnp.concatenate([zc, hf], axis=1)
        + jnp.concatenate([vf, zr], axis=0)
        - jnp.concatenate([zr, vf], axis=0)
    )


def _chain_kernel(lt_ref, flow_ref, out_ref, *, taus):
    lt = lt_ref[0]
    c = flow_ref[0]
    for tau in taus:
        lt = _fed_step(lt, c, tau)
    out_ref[0] = lt


@partial(jax.jit, static_argnames=("taus", "interpret"))
def fed_chain(
    lt: jnp.ndarray,  # (B, H, W) f32
    flow: jnp.ndarray,  # (B, H, W) f32 conductivity
    taus: tuple,
    interpret: bool = False,
) -> jnp.ndarray:
    """Run the full FED tau chain of one evolution in a single HBM pass.

    On the CPU backend (tests, dryrun meshes) Pallas only supports
    interpret mode, so it is forced there — same math, just evaluated by
    the XLA CPU executor."""
    if not taus:
        return lt
    interpret = interpret or jax.default_backend() == "cpu"
    b, h, w = lt.shape
    taus = tuple(float(t) for t in taus)
    return pl.pallas_call(
        partial(_chain_kernel, taus=taus),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, w), jnp.float32),
        interpret=interpret,
    )(lt, flow)
