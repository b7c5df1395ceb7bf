"""AKAZE configuration and scale-space allocation (host side).

Re-design of ``/root/reference/akaze/src/lib.rs:108-185`` (config),
``evolution.rs`` (allocation) and ``fed_tau.rs`` (FED step schedules).
Everything here is shape-determining static data computed once per image
size on the host; the device pipeline consumes it as Python constants.
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np


def _is_prime(n: int) -> bool:
    if n < 2:
        return False
    if n % 2 == 0:
        return n == 2
    f = 3
    while f * f <= n:
        if n % f == 0:
            return False
        f += 2
    return True


def fed_tau_by_process_time(
    t_total: float, m: int, tau_max: float, reordering: bool
) -> np.ndarray:
    """FED step sizes for process time ``t_total`` over ``m`` cycles
    (fed_tau.rs:26-29)."""
    return fed_tau_by_cycle_time(t_total / float(m), tau_max, reordering)


def fed_tau_by_cycle_time(t: float, tau_max: float, reordering: bool) -> np.ndarray:
    """FED step sizes for one cycle of stopping time ``t`` (fed_tau.rs:40-48)."""
    n = int(math.ceil(math.sqrt(3.0 * t / tau_max + 0.25) - 0.5 - 1.0e-8) + 0.5)
    scale = 3.0 * t / (tau_max * (n * (n + 1)))
    return _fed_tau_internal(n, scale, tau_max, reordering)


def _fed_tau_internal(
    n: int, scale: float, tau_max: float, reordering: bool
) -> np.ndarray:
    c = 1.0 / (4.0 * n + 2.0)
    d = scale * tau_max / 2.0
    k = np.arange(n, dtype=np.float64)
    h = np.cos(math.pi * (2.0 * k + 1.0) * c)
    tau = d / (h * h)
    if not reordering:
        return tau
    # Kappa-cycle permutation (fed_tau.rs:71-90): modular reordering with the
    # smallest prime >= n+1. A zero modulus (usize underflow skip in the
    # reference) is treated as out-of-range and skipped.
    kappa = n // 2
    prime = n + 1
    while not _is_prime(prime):
        prime += 1
    out = np.empty(n, dtype=np.float64)
    k_i = 0
    for j in range(n):
        while True:
            mod = ((k_i + 1) * kappa) % prime
            index = mod - 1 if mod != 0 else prime  # mod==0 wraps out of range
            if index < n:
                break
            k_i += 1
        k_i += 1
        out[j] = tau[index]
    return out


@dataclasses.dataclass(frozen=True)
class Akaze:
    """AKAZE tunables with the reference defaults (lib.rs:169-185)."""

    maximum_features: int = 2**31
    num_sublevels: int = 4
    max_octave_evolution: int = 4
    base_scale_offset: float = 1.6
    initial_contrast: float = 0.001
    contrast_percentile: float = 0.7
    contrast_factor_num_bins: int = 300
    derivative_factor: float = 1.5
    detector_threshold: float = 0.001
    descriptor_channels: int = 3
    descriptor_pattern_size: int = 10

    @classmethod
    def new(cls, threshold: float) -> "Akaze":
        return cls(detector_threshold=threshold)

    @classmethod
    def sparse(cls) -> "Akaze":
        """Sparse detection preset, threshold 0.01 (lib.rs:157-160)."""
        return cls.new(0.01)

    @classmethod
    def dense(cls) -> "Akaze":
        """Dense detection preset, threshold 0.0001 (lib.rs:162-166)."""
        return cls.new(0.0001)


@dataclasses.dataclass(frozen=True)
class EvolutionSpec:
    """Static description of one scale-space evolution (evolution.rs:6-70)."""

    index: int
    octave: int
    sublevel: int
    esigma: float
    etime: float
    width: int
    height: int
    fed_tau_steps: tuple  # () for evolution 0

    @property
    def ratio(self) -> float:
        return float(2**self.octave)

    @property
    def sigma_size(self) -> int:
        """Integer sigma for pose of detector filters (evolution.rs:57).

        Note: this is ``round(esigma)``; the *detector response* uses
        ``round(esigma * derivative_factor / 2^octave)`` computed separately
        (detector_response.rs:11-14).
        """
        return int(round(self.esigma))


def allocate_evolutions(config: Akaze, width: int, height: int) -> list[EvolutionSpec]:
    """Octave/sublevel layout + FED schedules (evolution.rs:80-126).

    Octaves continue while the downscaled min-dim is >= 40; below 80 only one
    sublevel is used. Image dims per octave follow repeated ``half_size``
    (floor division), matching the actual buffers the reference produces.
    """
    specs: list[tuple[int, int]] = []
    for octave in range(config.max_octave_evolution):
        rfactor = 2.0 ** (-octave)
        level_w = int(width * rfactor)
        level_h = int(height * rfactor)
        smallest = min(level_w, level_h)
        if smallest < 40:
            break
        sublevels = 1 if smallest < 80 else config.num_sublevels
        for sublevel in range(sublevels):
            specs.append((octave, sublevel))

    # Actual buffer shapes come from repeated half_size (floor at each step).
    shapes = [(height, width)]
    for _ in range(config.max_octave_evolution - 1):
        h, w = shapes[-1]
        shapes.append((h // 2, w // 2))

    out: list[EvolutionSpec] = []
    prev_etime = None
    for i, (octave, sublevel) in enumerate(specs):
        esigma = config.base_scale_offset * 2.0 ** (
            sublevel / config.num_sublevels + octave
        )
        etime = 0.5 * esigma * esigma
        h, w = shapes[octave]
        taus: tuple = ()
        if i > 0:
            taus = tuple(
                fed_tau_by_process_time(etime - prev_etime, 1, 0.25, True).tolist()
            )
        out.append(
            EvolutionSpec(
                index=i,
                octave=octave,
                sublevel=sublevel,
                esigma=esigma,
                etime=etime,
                width=w,
                height=h,
                fed_tau_steps=taus,
            )
        )
        prev_etime = etime
    return out
