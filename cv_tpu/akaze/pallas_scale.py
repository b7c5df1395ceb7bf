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


def _conv1d_inkernel(x: jnp.ndarray, taps: "np.ndarray", axis: int) -> jnp.ndarray:
    """ops._conv1d's exact shift+fma chain on a VMEM-resident (H, W) plane
    (same zero-tap skip, same accumulation order — kept in lockstep)."""
    import numpy as np

    half = len(taps) // 2
    pad = [(0, 0), (0, 0)]
    pad[axis] = (half, half)
    padded = jnp.pad(x, pad, mode="edge")
    n = x.shape[axis]
    taps = np.asarray(taps)
    out = None
    for i in range(taps.shape[0]):
        if taps[i] == 0.0:
            continue
        sl = jax.lax.slice_in_dim(padded, i, i + n, axis=axis)
        term = sl * float(taps[i])
        out = term if out is None else out + term
    return out


def _scharr_x(x, main, off):
    """scharr_horizontal: horizontal main kernel, vertical off kernel."""
    return _conv1d_inkernel(_conv1d_inkernel(x, main, 1), off, 0)


def _scharr_y(x, main, off):
    """scharr_vertical: horizontal off kernel, vertical main kernel."""
    return _conv1d_inkernel(_conv1d_inkernel(x, off, 1), main, 0)


def _deriv1_kernel(lsm_ref, lx_ref, ly_ref, *, main, off):
    lsm = lsm_ref[0]
    lx_ref[0] = _scharr_x(lsm, main, off)
    ly_ref[0] = _scharr_y(lsm, main, off)


def _deriv2_kernel(lx_ref, ly_ref, ldet_ref, *, main, off, s4):
    lx = lx_ref[0]
    ly = ly_ref[0]
    lxx = _scharr_x(lx, main, off)
    lyy = _scharr_y(ly, main, off)
    lxy = _scharr_y(lx, main, off)
    ldet_ref[0] = (lxx * lyy - lxy * lxy) * jnp.float32(s4)


def detector_response(
    lsmooth: jnp.ndarray,  # (B, H, W) f32
    sigma_size: int,
    interpret: bool = False,
):
    """Fused multiscale derivatives + Hessian response for one evolution
    (detector_response.rs:8-57): two Pallas kernels (Lx/Ly, then Ldet)
    replace ten separable-filter HBM passes with six plane transfers.
    Returns ``(lx, ly, ldet)``, bit-exact vs the jitted ops chain
    (tests/test_pallas_scale.py)."""
    import numpy as np

    from ..ops.image import scharr_main_kernel, scharr_off_kernel

    interpret = interpret or jax.default_backend() == "cpu"
    b, h, w = lsmooth.shape
    main = scharr_main_kernel(sigma_size)
    off = scharr_off_kernel(sigma_size)
    spec = pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((b, h, w), jnp.float32)
    lx, ly = pl.pallas_call(
        partial(_deriv1_kernel, main=main, off=off),
        grid=(b,),
        in_specs=[spec],
        out_specs=(spec, spec),
        out_shape=(shape, shape),
        interpret=interpret,
    )(lsmooth)
    ldet = pl.pallas_call(
        partial(
            _deriv2_kernel, main=main, off=off, s4=float(sigma_size) ** 4
        ),
        grid=(b,),
        in_specs=[spec, spec],
        out_specs=spec,
        out_shape=shape,
        interpret=interpret,
    )(lx, ly)
    return lx, ly, ldet
