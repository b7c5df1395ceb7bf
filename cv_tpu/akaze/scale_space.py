"""Nonlinear scale-space construction + detector response (device side).

Re-design of ``/root/reference/akaze/src/lib.rs:193-258`` (scale space),
``contrast_factor.rs`` (contrast factor), ``detector_response.rs`` (Hessian
response).  The whole pipeline is one jittable function over a batch of
frames ``(B, H, W) float32``; evolutions are traced sequentially (the
diffusion chain is inherently sequential) but every op is batched over
frames, so XLA pipelines the per-evolution convolutions across the batch.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import image as ops
from .config import Akaze, EvolutionSpec


@dataclass(frozen=True)
class EvolutionPlanes:
    """Device buffers for one evolution, each ``(B, H_o, W_o)``."""

    spec: EvolutionSpec
    lt: jnp.ndarray  # diffused image (descriptor sampling source)
    lsmooth: jnp.ndarray  # sigma-1 smoothed (derivative source)
    lx: jnp.ndarray  # multiscale d/dx of Lsmooth (orientation/descriptors)
    ly: jnp.ndarray  # multiscale d/dy
    ldet: jnp.ndarray  # Hessian determinant response

    @property
    def detector_sigma_size(self) -> int:
        s = self.spec
        return int(round(s.esigma * 1.5 / s.ratio))


def compute_contrast_factor(
    image: jnp.ndarray,
    percentile: float,
    gradient_histogram_scale: float,
    num_bins: int,
) -> jnp.ndarray:
    """Per-frame contrast factor k (contrast_factor.rs:16-64).

    70th-percentile of the interior gradient-magnitude histogram of the
    sigma-1-blurred image; the reference's sequential histogram walk becomes
    a bincount + cumulative-sum + searchsorted, batched over frames.
    """
    g = ops.gaussian_blur(image, gradient_histogram_scale)
    lx = ops.scharr_horizontal(g, 1)
    ly = ops.scharr_vertical(g, 1)
    mag2 = (lx * lx + ly * ly)[..., 1:-1, 1:-1]
    batch = mag2.shape[:-2]
    # Histogram math follows the reference in f64 when x64 is enabled (the
    # CPU parity path); on the TPU fast path it runs in f32 — the k-bin
    # selection is a quantile and is insensitive at that precision (verified
    # against the 399/343 goldens).
    ftype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    flat2 = mag2.reshape((-1,) + (mag2.shape[-2] * mag2.shape[-1],)).astype(ftype)

    def one_frame(m2):
        hmax = jnp.sqrt(jnp.max(m2))
        modg = jnp.sqrt(m2)
        nonzero = modg != 0.0
        num_points = jnp.sum(nonzero)
        threshold = jnp.floor(num_points.astype(ftype) * percentile).astype(jnp.int32)
        # The reference walks a 300-bin histogram until the cumulative count
        # reaches the threshold (contrast_factor.rs:49-54); the answer k is
        # (smallest bin j with cumcount(<= j) >= T) + 1.  cumcount(<= j) is
        # monotone in j, so binary-search j with one masked reduction per
        # step (9 passes for 300 bins) — no full-plane sort, no scatter
        # histogram, and bit-faithful to the integer bin walk.
        safe_hmax = jnp.where(hmax == 0, 1.0, hmax)
        bin_idx = jnp.minimum(
            jnp.floor(num_bins * (modg / safe_hmax)).astype(jnp.int32),
            num_bins - 1,
        )
        lo = jnp.int32(0)
        hi = jnp.int32(num_bins - 1)
        steps = int(np.ceil(np.log2(num_bins)))
        for _ in range(steps):
            mid = (lo + hi) // 2
            cnt = jnp.sum(nonzero & (bin_idx <= mid))
            ge = cnt >= threshold
            lo = jnp.where(ge, lo, mid + 1)
            hi = jnp.where(ge, mid, hi)
        k = jnp.where(threshold > 0, lo + 1, 0)
        # Fallback 0.03 when the percentile is never reached (empty image).
        result = hmax * k.astype(ftype) / num_bins
        return jnp.where(num_points >= threshold, result, 0.03)

    result = jax.vmap(one_frame)(flat2)
    return result.reshape(batch).astype(image.dtype)


def build_scale_space(
    config: Akaze,
    specs: list[EvolutionSpec],
    image: jnp.ndarray,
    diffusion_dtype=None,
) -> list[EvolutionPlanes]:
    """Build all evolutions and their detector responses for a batch of
    frames (lib.rs:193-258 + detector_response.rs).

    Stays pure-XLA by measurement: whole-frame Pallas stencil fusion of the
    FED chains / derivative filters was built in round 2 and device-timed
    in round 3 at 60x SLOWER than this XLA path (a 1-tau fused chain ran
    5.0 ms vs ~0.08 ms for the XLA step at B=8 — Mosaic lane-dim
    concat/shift relayouts dominate; docs/perf-notes.md round-3 findings),
    so the kernels were deleted per the round-2 verdict's instruction."""
    contrast0 = compute_contrast_factor(
        image, config.contrast_percentile, 1.0, config.contrast_factor_num_bins
    )

    # Optional reduced-precision DIFFUSION: the FED chains + per-evolution
    # blur/Scharr/conductivity are HBM-bandwidth-bound; running them in
    # bfloat16 halves that traffic.  Detection math downstream (detector
    # response, extrema, refinement, descriptors) always runs in f32 on
    # f32-cast planes.  NOT golden-exact — keypoint counts shift slightly
    # (the nonlinear diffusion is a smoothing operator, so the drift is
    # bounded; tolerance policy + measurements in
    # experiments/exp_r3_bf16.py and docs/perf-notes.md).  Opt-in via
    # DeviceExtractor(diffusion_dtype='bfloat16').
    dd = diffusion_dtype
    image_d = image.astype(dd) if dd is not None else image

    lts = []
    lsmooths = []
    lt = ops.gaussian_blur(image_d, config.base_scale_offset)
    lts.append(lt)
    lsmooths.append(lt)  # evolution 0: Lsmooth = Lt (lib.rs:199-201)
    contrast = contrast0
    for i in range(1, len(specs)):
        if specs[i].octave > specs[i - 1].octave:
            lt = ops.half_size(lt)
            contrast = contrast * 0.75
        lsmooth = ops.gaussian_blur(lt, 1.0)
        lx = ops.scharr_horizontal(lsmooth, 1)
        ly = ops.scharr_vertical(lsmooth, 1)
        flow = ops.pm_g2(lx, ly, contrast.astype(lt.dtype))
        for tau in specs[i].fed_tau_steps:
            lt = ops.fed_step(lt, flow, jnp.asarray(tau, lt.dtype))
        lts.append(lt)
        lsmooths.append(lsmooth)
    if dd is not None:
        lts = [x.astype(jnp.float32) for x in lts]
        lsmooths = [x.astype(jnp.float32) for x in lsmooths]

    # Detector response: multiscale derivatives + Hessian determinant
    # (detector_response.rs:8-57). Lx/Ly are *overwritten* with the
    # multiscale versions, which orientation/descriptors then consume.
    out = []
    for spec, lt_i, lsm_i in zip(specs, lts, lsmooths):
        sigma_size = int(round(spec.esigma * config.derivative_factor / spec.ratio))
        lx = ops.scharr_horizontal(lsm_i, sigma_size)
        ly = ops.scharr_vertical(lsm_i, sigma_size)
        lxx = ops.scharr_horizontal(lx, sigma_size)
        lyy = ops.scharr_vertical(ly, sigma_size)
        lxy = ops.scharr_vertical(lx, sigma_size)
        ldet = (lxx * lyy - lxy * lxy) * jnp.float32(float(sigma_size) ** 4)
        out.append(
            EvolutionPlanes(spec=spec, lt=lt_i, lsmooth=lsm_i, lx=lx, ly=ly, ldet=ldet)
        )
    return out
