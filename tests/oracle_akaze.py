"""NumPy oracle port of the reference Rust AKAZE (test-only).

This is the per-stage cross-validation harness prescribed by SURVEY.md §7
(hard part 1): an INDEPENDENT, scalar-faithful NumPy transliteration of
/root/reference/akaze/src/*.rs, used purely to anchor cv_tpu's AKAZE stage
outputs — it shares no code with the cv_tpu library, whose implementation is
batched/TPU-shaped.  Every function cites the reference lines it mirrors.

Arithmetic notes:
* The reference does all image math in f32.  The oracle keeps image planes
  f32 and rounds back to f32 after each filter; filter taps accumulate in
  f64 (the Rust SIMD accumulates in f32 lanes with FMA, so the two can
  differ in the last ULP — stage comparisons use tight tolerances and the
  keypoint-level comparisons are exact unless a response sits within ~1e-6
  of a decision boundary, which the tests measure and report).
* f32::round in Rust rounds half away from zero; `np.round` rounds half to
  even.  `_round_f32` mirrors the Rust semantics.
* `f32 as usize` in Rust saturates; `_as_usize` mirrors that.
"""

from __future__ import annotations

import numpy as np

F32 = np.float32


def _round_f32(x):
    """f32::round — round half away from zero (not numpy's half-to-even)."""
    x = np.asarray(x, np.float32)
    return np.sign(x) * np.floor(np.abs(x) + np.float32(0.5))


def _as_usize(x):
    """Rust `f32 as usize`: truncate toward zero, saturate at 0."""
    return np.maximum(np.asarray(x), 0).astype(np.int64)


# -- image.rs ----------------------------------------------------------------


def load_gray_unit(path) -> np.ndarray:
    """GrayFloatImage::from_dynamic (image.rs:45-112): u8/u16 -> [0,1] f32."""
    from PIL import Image

    im = Image.open(path).convert("L")
    a = np.asarray(im)
    return (a.astype(np.float32) / np.float32(255.0)).astype(np.float32)


def horizontal_filter(img: np.ndarray, kernel: np.ndarray) -> np.ndarray:
    """image.rs:205-261 — replicate-edge 1D filter along x."""
    ksz = len(kernel)
    half = ksz // 2
    pad = np.pad(img.astype(np.float64), ((0, 0), (half, half)), mode="edge")
    out = np.zeros(img.shape, np.float64)
    for t in range(ksz):
        out += pad[:, t : t + img.shape[1]] * np.float64(np.float32(kernel[t]))
    return out.astype(np.float32)


def vertical_filter(img: np.ndarray, kernel: np.ndarray) -> np.ndarray:
    """image.rs:263-345 — replicate-edge 1D filter along y."""
    ksz = len(kernel)
    half = ksz // 2
    pad = np.pad(img.astype(np.float64), ((half, half), (0, 0)), mode="edge")
    out = np.zeros(img.shape, np.float64)
    for t in range(ksz):
        out += pad[t : t + img.shape[0], :] * np.float64(np.float32(kernel[t]))
    return out.astype(np.float32)


def separable_filter(img, h_kernel, v_kernel):
    """image.rs:347-355: horizontal then vertical."""
    return vertical_filter(horizontal_filter(img, h_kernel), v_kernel)


def gaussian_kernel(r: float, kernel_size: int) -> np.ndarray:
    """image.rs:376-390 — f32 Gaussian taps normalized by their f32 sum."""
    assert kernel_size % 2 == 1
    half = kernel_size // 2
    r = np.float32(r)
    taps = []
    s = np.float32(0.0)
    for i in range(-half, half + 1):
        v = np.float32(1.0) / (
            np.float32(np.sqrt(2.0 * np.pi, dtype=np.float32)) * r
        ) * np.exp(
            -np.float32(i) ** 2 / (np.float32(2.0) * r * r), dtype=np.float32
        )
        v = np.float32(v)
        taps.append(v)
        s = np.float32(s + v)
    return np.asarray([np.float32(t / s) for t in taps], np.float32)


def gaussian_blur(img: np.ndarray, r: float) -> np.ndarray:
    """image.rs:392-404: radius = ceil(2r), size = 2*radius+1."""
    radius = int(np.ceil(2.0 * r))
    k = gaussian_kernel(r, radius * 2 + 1)
    return separable_filter(img, k, k)


def half_size(img: np.ndarray) -> np.ndarray:
    """image.rs:157-199 — 2x2 box downsample with odd-edge handling."""
    h, w = img.shape
    hh, hw = h // 2, w // 2
    a = img.astype(np.float64)
    out = np.zeros((hh, hw), np.float64)
    core = a[: hh * 2, : hw * 2]
    out = (
        core[0::2, 0::2] + core[0::2, 1::2] + core[1::2, 0::2] + core[1::2, 1::2]
    ) * 0.25
    out = out.astype(np.float32).astype(np.float64)
    if hh * 2 != h:
        out[-1, :] = ((a[-1, : hw * 2][0::2] + a[-1, : hw * 2][1::2]) * 0.5).astype(
            np.float32
        )
    if hw * 2 != w:
        out[:, -1] = ((a[: hh * 2, -1][0::2] + a[: hh * 2, -1][1::2]) * 0.5).astype(
            np.float32
        )
    if hh * 2 != h and hw * 2 != w:
        out[-1, -1] = a[-1, -1]
    return out.astype(np.float32)


# -- derivatives.rs ----------------------------------------------------------


def simple_scharr_horizontal(img):
    """derivatives.rs:3-6."""
    return separable_filter(img, np.array([-1.0, 0.0, 1.0], F32), np.array([3.0, 10.0, 3.0], F32))


def simple_scharr_vertical(img):
    """derivatives.rs:8-11."""
    return separable_filter(img, np.array([3.0, 10.0, 3.0], F32), np.array([-1.0, 0.0, 1.0], F32))


def _scharr_kernels(sigma_size: int):
    """derivatives.rs:59-79 — main/off kernels for sigma_size > 1."""
    w = 10.0 / 3.0
    norm = np.float32(1.0 / (2.0 * float(sigma_size) * (w + 2.0)))
    middle = np.float32(norm * np.float32(w))
    ksize = 3 + 2 * (sigma_size - 1)
    main = np.zeros(ksize, F32)
    main[0], main[-1] = -1.0, 1.0
    off = np.zeros(ksize, F32)
    off[0], off[ksize // 2], off[-1] = norm, middle, norm
    return main, off


def scharr_horizontal(img, sigma_size: int):
    """derivatives.rs:22-33."""
    if sigma_size == 1:
        return simple_scharr_horizontal(img)
    main, off = _scharr_kernels(sigma_size)
    return separable_filter(img, main, off)


def scharr_vertical(img, sigma_size: int):
    """derivatives.rs:42-52."""
    if sigma_size == 1:
        return simple_scharr_vertical(img)
    main, off = _scharr_kernels(sigma_size)
    return separable_filter(img, off, main)


# -- contrast_factor.rs ------------------------------------------------------


def compute_contrast_factor(
    img, percentile=0.7, gradient_histogram_scale=1.0, num_bins=300
) -> float:
    """contrast_factor.rs:16-64."""
    g = gaussian_blur(img, gradient_histogram_scale)
    lx = simple_scharr_horizontal(g).astype(np.float64)
    ly = simple_scharr_vertical(g).astype(np.float64)
    lx2 = lx[1:-1, 1:-1] ** 2 + ly[1:-1, 1:-1] ** 2
    hmax = np.sqrt(lx2.max())
    modg = np.sqrt(lx2)
    nz = modg != 0.0
    num_points = int(nz.sum())
    bins = np.floor(num_bins * (modg[nz] / hmax)).astype(np.int64)
    bins[bins == num_bins] = num_bins - 1
    histogram = np.bincount(bins, minlength=num_bins)
    threshold = int(num_points * percentile)
    cum = 0
    k = 0
    while cum < threshold and k < num_bins:
        cum += int(histogram[k])
        k += 1
    if cum >= threshold:
        return float(hmax * k / num_bins)
    return 0.03


# -- fed_tau.rs ---------------------------------------------------------------


def _is_prime(n: int) -> bool:
    if n < 2:
        return False
    i = 2
    while i * i <= n:
        if n % i == 0:
            return False
        i += 1
    return True


def fed_tau_by_process_time(T: float, M: int, tau_max: float, reordering: bool):
    """fed_tau.rs:27-93."""
    t = T / float(M)
    n = int(np.ceil(np.sqrt(3.0 * t / tau_max + 0.25) - 0.5 - 1.0e-8) + 0.5)
    scale = 3.0 * t / (tau_max * (n * (n + 1)))
    c = 1.0 / (4.0 * n + 2.0)
    d = scale * tau_max / 2.0
    tau = [d / np.cos(np.pi * (2.0 * k + 1.0) * c) ** 2 for k in range(n)]
    if not reordering:
        return tau
    kappa = n // 2
    prime = n + 1
    while not _is_prime(prime):
        prime += 1
    out = []
    k = 0
    for _ in range(n):
        # usize wrap: (x % prime) == 0 makes index == usize::MAX >= n.
        index = ((k + 1) * kappa) % prime - 1
        while index < 0 or index >= n:
            k += 1
            index = ((k + 1) * kappa) % prime - 1
        k += 1
        out.append(tau[index])
    return out


# -- evolution.rs -------------------------------------------------------------


class Evolution:
    """EvolutionStep (evolution.rs:6-37) as a plain namespace."""

    def __init__(self, octave, sublevel, base_scale_offset=1.6, num_sublevels=4):
        self.octave = octave
        self.sublevel = sublevel
        self.esigma = base_scale_offset * 2.0 ** (sublevel / num_sublevels + octave)
        self.etime = 0.5 * self.esigma * self.esigma
        self.sigma_size = int(np.round(self.esigma))
        self.fed_tau_steps = []
        self.lt = self.lsmooth = self.lx = self.ly = None
        self.lxx = self.lyy = self.lxy = self.lflow = self.ldet = None


def allocate_evolutions(width, height, max_octave_evolution=4, num_sublevels=4):
    """evolution.rs:78-127."""
    evolutions = []
    for octave in range(max_octave_evolution):
        rfactor = 2.0 ** (-octave)
        level_height = int(height * rfactor)
        level_width = int(width * rfactor)
        smallest = min(level_width, level_height)
        if smallest < 40:
            continue
        sublevels = 1 if smallest < 80 else num_sublevels
        for sub in range(sublevels):
            evolutions.append(Evolution(octave, sub, num_sublevels=num_sublevels))
    for i in range(1, len(evolutions)):
        ttime = evolutions[i].etime - evolutions[i - 1].etime
        evolutions[i].fed_tau_steps = fed_tau_by_process_time(ttime, 1, 0.25, True)
    return evolutions


# -- nonlinear_diffusion.rs ---------------------------------------------------


def pm_g2(lx, ly, k: float):
    """nonlinear_diffusion.rs:62-83."""
    inverse_k = np.float32(1.0 / (k * k))
    return (
        np.float32(1.0) / (np.float32(1.0) + inverse_k * (lx * lx + ly * ly))
    ).astype(np.float32)


def diffusion_step(lt, lflow, step_size: float):
    """nonlinear_diffusion.rs:14-59 — one FED forward-Euler step (f32)."""
    lt = lt.copy()
    half_step = np.float32(0.5) * np.float32(step_size)
    hflow = half_step * (lflow[:, :-1] + lflow[:, 1:]) * (lt[:, 1:] - lt[:, :-1])
    hflow = hflow.astype(np.float32)
    vflow = half_step * (lflow[:-1, :] + lflow[1:, :]) * (lt[1:, :] - lt[:-1, :])
    vflow = vflow.astype(np.float32)
    lt[:, :-1] += hflow
    lt[:, 1:] -= hflow
    lt[:-1, :] += vflow
    lt[1:, :] -= vflow
    return lt.astype(np.float32)


# -- lib.rs create_nonlinear_scale_space --------------------------------------


def create_nonlinear_scale_space(evolutions, image, config):
    """lib.rs:189-253."""
    evolutions[0].lt = gaussian_blur(image, config["base_scale_offset"])
    evolutions[0].lsmooth = evolutions[0].lt.copy()
    contrast_factor = compute_contrast_factor(
        image,
        config["contrast_percentile"],
        1.0,
        config["contrast_factor_num_bins"],
    )
    for i in range(1, len(evolutions)):
        if evolutions[i].octave > evolutions[i - 1].octave:
            evolutions[i].lt = half_size(evolutions[i - 1].lt)
            contrast_factor *= 0.75
        else:
            evolutions[i].lt = evolutions[i - 1].lt.copy()
        evolutions[i].lsmooth = gaussian_blur(evolutions[i].lt, 1.0)
        evolutions[i].lx = simple_scharr_horizontal(evolutions[i].lsmooth)
        evolutions[i].ly = simple_scharr_vertical(evolutions[i].lsmooth)
        evolutions[i].lflow = pm_g2(evolutions[i].lx, evolutions[i].ly, contrast_factor)
        for step in evolutions[i].fed_tau_steps:
            evolutions[i].lt = diffusion_step(
                evolutions[i].lt, evolutions[i].lflow, step
            )
    return contrast_factor


# -- detector_response.rs -----------------------------------------------------


def detector_response(evolutions, derivative_factor=1.5):
    """detector_response.rs:8-57 (+ compute_multiscale_derivatives 60-85).

    Overwrites .lx/.ly with the multiscale Scharr derivatives, exactly like
    the reference (descriptors sample the OVERWRITTEN planes).
    """
    for ev in evolutions:
        ratio = 2.0**ev.octave
        sigma_size = int(np.round(ev.esigma * derivative_factor / ratio))
        ev.lx = scharr_horizontal(ev.lsmooth, sigma_size)
        ev.ly = scharr_vertical(ev.lsmooth, sigma_size)
        ev.lxx = scharr_horizontal(ev.lx, sigma_size)
        ev.lyy = scharr_vertical(ev.ly, sigma_size)
        ev.lxy = scharr_vertical(ev.lx, sigma_size)
        sigma_quat = np.float32(float(sigma_size) ** 4)
        ev.ldet = ((ev.lxx * ev.lyy - ev.lxy * ev.lxy) * sigma_quat).astype(
            np.float32
        )


# -- scale_space_extrema.rs ---------------------------------------------------


def find_scale_space_extrema(evolutions, detector_threshold, derivative_factor=1.5):
    """scale_space_extrema.rs:14-143 — candidate scan + in-order dedup.

    Returns a list of keypoint dicts in cache order (point already upscaled).
    """
    smax = np.float32(10.0) * np.float32(np.sqrt(2.0, dtype=np.float32))
    # Growing cache arrays for vectorized scans (semantics stay sequential).
    cache = []  # list of dicts
    c_x = np.zeros(0, np.float32)
    c_y = np.zeros(0, np.float32)
    c_resp = np.zeros(0, np.float32)
    c_class = np.zeros(0, np.int64)

    for e_id, ev in enumerate(evolutions):
        ldet = ev.ldet
        h, w = ldet.shape
        center = ldet[1:-1, 1:-1]
        neighbors = [
            ldet[0:-2, 0:-2], ldet[0:-2, 1:-1], ldet[0:-2, 2:],
            ldet[1:-1, 0:-2], ldet[1:-1, 2:],
            ldet[2:, 0:-2], ldet[2:, 1:-1], ldet[2:, 2:],
        ]
        mask = center > np.float32(detector_threshold)
        for nb in neighbors:
            mask &= center > nb
        ys, xs = np.nonzero(mask)  # row-major order == reference scan order
        ys = ys + 1
        xs = xs + 1
        ratio = np.float32(2.0**ev.octave)
        size = np.float32(np.float32(ev.esigma * derivative_factor))
        sigma_size = _round_f32(size / ratio)
        for y, x in zip(ys, xs):
            resp = np.float32(abs(ldet[y, x]))
            px = np.float32(x)
            py = np.float32(y)
            is_repeated = False
            id_repeated = 0
            is_extremum = True
            if len(cache):
                cls_ok = (c_class == e_id) | ((e_id != 0) & (c_class == e_id - 1))
                dx = px * ratio - c_x
                dy = py * ratio - c_y
                within = cls_ok & (dx * dx + dy * dy <= size * size)
                hits = np.nonzero(within)[0]
                if len(hits):
                    k = int(hits[0])  # reference breaks at the FIRST hit
                    if resp > c_resp[k]:
                        is_repeated = True
                        id_repeated = k
                    else:
                        is_extremum = False
            if not is_extremum:
                continue
            left_x = _round_f32(px - smax * sigma_size) - np.float32(1.0)
            right_x = _round_f32(px + smax * sigma_size) + np.float32(1.0)
            up_y = _round_f32(py - smax * sigma_size) - np.float32(1.0)
            down_y = _round_f32(py + smax * sigma_size) + np.float32(1.0)
            if left_x < 0 or right_x >= w or up_y < 0 or down_y >= h:
                continue
            ux = np.float32(px * ratio + np.float32(0.5) * (ratio - np.float32(1.0)))
            uy = np.float32(py * ratio + np.float32(0.5) * (ratio - np.float32(1.0)))
            kp = {
                "x": ux, "y": uy, "response": resp,
                "size": size, "octave": ev.octave, "class_id": e_id,
                "ix": int(x), "iy": int(y),  # level coords (for stage diffs)
            }
            if is_repeated:
                cache[id_repeated] = kp
                c_x[id_repeated] = ux
                c_y[id_repeated] = uy
                c_resp[id_repeated] = resp
                c_class[id_repeated] = e_id
            else:
                cache.append(kp)
                c_x = np.append(c_x, ux)
                c_y = np.append(c_y, uy)
                c_resp = np.append(c_resp, resp)
                c_class = np.append(c_class, e_id)

    # Upper-scale filter pass (scale_space_extrema.rs:122-140).
    out = []
    n = len(cache)
    for i in range(n):
        kp = cache[i]
        upper = (c_class[i + 1 :] == kp["class_id"] + 1)
        dx = kp["x"] - c_x[i + 1 :]
        dy = kp["y"] - c_y[i + 1 :]
        rep = upper & (dx * dx + dy * dy <= kp["size"] * kp["size"]) & (
            kp["response"] <= c_resp[i + 1 :]
        )
        if not rep.any():
            out.append(kp)
    return out


def do_subpixel_refinement(keypoints, evolutions):
    """scale_space_extrema.rs:290-346 + orientation 229-288."""
    out = []
    for kp in keypoints:
        ratio = np.float32(2.0 ** np.float32(kp["octave"]))
        x = int(_as_usize(_round_f32(kp["x"] / ratio)))
        y = int(_as_usize(_round_f32(kp["y"] / ratio)))
        ldet = evolutions[kp["class_id"]].ldet
        x_i = ldet[y, x]
        x_p = ldet[y, x + 1]
        x_m = ldet[y, x - 1]
        y_p = ldet[y + 1, x]
        y_m = ldet[y - 1, x]
        x_p_y_p = ldet[y + 1, x + 1]
        x_p_y_m = ldet[y - 1, x + 1]
        x_m_y_p = ldet[y + 1, x - 1]
        x_m_y_m = ldet[y - 1, x - 1]
        d_x = np.float32(0.5) * (x_p - x_m)
        d_y = np.float32(0.5) * (y_p - y_m)
        d_xx = np.float32(x_p + x_m - np.float32(2.0) * x_i)
        d_yy = np.float32(y_p + y_m - np.float32(2.0) * x_i)
        d_xy = np.float32(0.25) * (x_p_y_p + x_m_y_m) - np.float32(0.25) * (
            x_p_y_m + x_m_y_p
        )
        inv_det = np.float32(1.0) / np.float32(d_xx * d_yy - d_xy * d_xy)
        inv_a = (inv_det * d_yy, inv_det * -d_xy, inv_det * -d_xy, inv_det * d_xx)
        dst0 = np.float32(-d_x * inv_a[0] + -d_y * inv_a[1])
        dst1 = np.float32(-d_x * inv_a[2] + -d_y * inv_a[3])
        if abs(dst0) <= 1.0 and abs(dst1) <= 1.0:
            power = np.float32(2.0 ** np.float32(kp["octave"]))
            nx = np.float32(
                (np.float32(x) + dst0) * power
                + np.float32(0.5) * (power - np.float32(1.0))
            )
            ny = np.float32(
                (np.float32(y) + dst1) * power
                + np.float32(0.5) * (power - np.float32(1.0))
            )
            kp2 = dict(kp)
            kp2["x"], kp2["y"] = nx, ny
            kp2["size"] = np.float32(kp["size"] * np.float32(2.0))
            kp2["angle"] = compute_main_orientation(kp2, evolutions)
            out.append(kp2)
    return out


GAUSS25 = np.array(
    [
        [0.02546481, 0.02350698, 0.01849125, 0.01239505, 0.00708017, 0.00344629, 0.00142946],
        [0.02350698, 0.02169968, 0.01706957, 0.01144208, 0.00653582, 0.00318132, 0.00131956],
        [0.01849125, 0.01706957, 0.01342740, 0.00900066, 0.00514126, 0.00250252, 0.00103800],
        [0.01239505, 0.01144208, 0.00900066, 0.00603332, 0.00344629, 0.00167749, 0.00069579],
        [0.00708017, 0.00653582, 0.00514126, 0.00344629, 0.00196855, 0.00095820, 0.00039744],
        [0.00344629, 0.00318132, 0.00250252, 0.00167749, 0.00095820, 0.00046640, 0.00019346],
        [0.00142946, 0.00131956, 0.00103800, 0.00069579, 0.00039744, 0.00019346, 0.00008024],
    ],
    np.float32,
)


def _cv_fast_atan2(y, x):
    """scale_space_extrema.rs:244: (atan2(y,x) + 2pi).rem_euclid(2pi), f32."""
    two_pi = np.float32(2.0) * np.float32(np.pi)
    return np.float32(
        np.remainder(np.float32(np.arctan2(y, x, dtype=np.float32)) + two_pi, two_pi)
    )


def _orientation_offsets():
    ident = [6, 5, 4, 3, 2, 1, 0, 1, 2, 3, 4, 5, 6]
    offs = []
    for j in range(-6, 7):
        for i in range(-6, 7):
            if i * i + j * j < 36:
                offs.append((i, j, GAUSS25[ident[j + 6]][ident[i + 6]]))
    di = np.array([o[0] for o in offs], np.float32)
    dj = np.array([o[1] for o in offs], np.float32)
    wt = np.array([o[2] for o in offs], np.float32)
    return di, dj, wt


_ORI_DI, _ORI_DJ, _ORI_WT = _orientation_offsets()


def compute_main_orientation(kp, evolutions):
    """scale_space_extrema.rs:229-288.

    Window sums use numpy f32 reductions (pairwise) where the reference
    accumulates sequentially — a last-ULP deviation the stage tests measure
    rather than assume away.
    """
    level = kp["class_id"]
    ratio = np.float32(1 << evolutions[level].octave)
    s = _round_f32(np.float32(0.5) * kp["size"] / ratio)
    xf = np.float32(kp["x"] / ratio)
    yf = np.float32(kp["y"] / ratio)
    lx = evolutions[level].lx
    ly = evolutions[level].ly
    iy = _as_usize(_round_f32(yf + _ORI_DJ * s))
    ix = _as_usize(_round_f32(xf + _ORI_DI * s))
    res_x = (_ORI_WT * lx[iy, ix]).astype(np.float32)
    res_y = (_ORI_WT * ly[iy, ix]).astype(np.float32)
    two_pi = np.float32(2.0) * np.float32(np.pi)
    angs = np.remainder(
        np.arctan2(res_y, res_x, dtype=np.float32) + two_pi, two_pi
    ).astype(np.float32)

    third_pi = np.float32(np.pi) / np.float32(3.0)
    # ang1 advances by f32 accumulation of 0.15 (reference loop variable).
    ang1s = []
    a = np.float32(0.0)
    while a < two_pi:
        ang1s.append(a)
        a = np.float32(a + np.float32(0.15))
    ang1s = np.array(ang1s, np.float32)
    wrap = ang1s + third_pi > two_pi
    ang2s = np.where(
        wrap,
        ang1s - np.float32(5.0) * np.float32(np.pi) / np.float32(3.0),
        ang1s + third_pi,
    ).astype(np.float32)
    fwd = ang1s < ang2s
    sel = np.where(
        fwd[:, None],
        (ang1s[:, None] < angs[None, :]) & (angs[None, :] < ang2s[:, None]),
        ((angs[None, :] > 0) & (angs[None, :] < ang2s[:, None]))
        | ((angs[None, :] > ang1s[:, None]) & (angs[None, :] < two_pi)),
    )
    sum_x = np.where(sel, res_x[None, :], np.float32(0)).sum(axis=1, dtype=np.float32)
    sum_y = np.where(sel, res_y[None, :], np.float32(0)).sum(axis=1, dtype=np.float32)
    val = (sum_x * sum_x + sum_y * sum_y).astype(np.float32)
    # Reference keeps the FIRST strict maximum (val > max).
    best = int(np.argmax(val))
    if val[best] <= 0:
        return np.float32(0.0)
    return _cv_fast_atan2(sum_y[best], sum_x[best])


# -- descriptors.rs -----------------------------------------------------------


def get_mldb_descriptor(kp, evolutions, pattern_size=10, channels=3):
    """descriptors.rs:47-202.  Returns (64-byte bytearray) or None if any
    sample is out of bounds (the reference drops the keypoint)."""
    size_mult = [1.0, 2.0 / 3.0, 1.0 / 2.0]
    ratio = np.float32(1 << kp["octave"])
    scale = _round_f32(np.float32(0.5) * kp["size"] / ratio)
    xf = np.float32(kp["x"] / ratio)
    yf = np.float32(kp["y"] / ratio)
    co = np.float32(np.cos(kp["angle"], dtype=np.float32))
    si = np.float32(np.sin(kp["angle"], dtype=np.float32))
    ev = evolutions[kp["class_id"]]
    lt, lx, ly = ev.lt, ev.lx, ev.ly
    h, w = lt.shape
    bits = []
    for lvl, mult in enumerate(size_mult):
        grid = lvl + 2
        val_count = grid * grid
        sample_step = int(np.ceil(np.float32(pattern_size) * np.float32(mult)))
        # Cell top-left corners in reference iteration order (i outer, j
        # inner), then in-cell offsets in reference order (k outer, l inner).
        starts = list(range(-pattern_size, pattern_size, sample_step))
        i0 = np.repeat(starts, len(starts)).astype(np.int64)  # (cells,)
        j0 = np.tile(starts, len(starts)).astype(np.int64)
        koff = np.repeat(np.arange(sample_step), sample_step)  # (ss*ss,)
        loff = np.tile(np.arange(sample_step), sample_step)
        kf = (i0[:, None] + koff[None, :]).astype(np.float32)  # (cells, ss*ss)
        lf = (j0[:, None] + loff[None, :]).astype(np.float32)
        sample_y = (yf + ((lf * co) * scale + (kf * si) * scale)).astype(np.float32)
        sample_x = (xf + (-(lf * si) * scale + (kf * co) * scale)).astype(np.float32)
        y1 = _round_f32(sample_y).astype(np.int64)
        x1 = _round_f32(sample_x).astype(np.int64)
        if (x1 < 0).any() or (x1 >= w).any() or (y1 < 0).any() or (y1 >= h).any():
            return None  # descriptors.rs:133-142: any OOB sample drops the kp
        ri = lt[y1, x1]
        rx = lx[y1, x1]
        ry = ly[y1, x1]
        rry = (rx * co + ry * si).astype(np.float32)
        rrx = (-rx * si + ry * co).astype(np.float32)
        # Sequential f32 accumulation in in-cell sample order (k outer, l
        # inner), vectorized across cells — bitwise the reference's order.
        acc = np.zeros((3, val_count), np.float32)
        for t in range(sample_step * sample_step):
            acc[0] = (acc[0] + ri[:, t]).astype(np.float32)
            acc[1] = (acc[1] + rrx[:, t]).astype(np.float32)
            acc[2] = (acc[2] + rry[:, t]).astype(np.float32)
        ns = np.float32(sample_step * sample_step)
        values = (acc / ns).astype(np.float32)  # (3, cells): di, dx, dy
        a_idx, b_idx = np.triu_indices(val_count, k=1)
        for pos in range(channels):
            bits.append(values[pos, a_idx] > values[pos, b_idx])
    bits = np.concatenate(bits)
    descriptor = bytearray(64)
    for dpos in np.nonzero(bits)[0]:
        descriptor[dpos >> 3] |= 1 << (int(dpos) & 7)
    return bytes(descriptor)


# -- end-to-end ----------------------------------------------------------------


def extract(image: np.ndarray, detector_threshold=0.001, maximum_features=None):
    """Akaze::extract (lib.rs:295-339): full oracle pipeline.

    Returns (keypoints: list of dicts with x/y/response/size/octave/class_id/
    angle, descriptors: list of 64-byte strings, evolutions).
    """
    config = {
        "base_scale_offset": 1.6,
        "contrast_percentile": 0.7,
        "contrast_factor_num_bins": 300,
    }
    h, w = image.shape
    evolutions = allocate_evolutions(w, h)
    create_nonlinear_scale_space(evolutions, image.astype(np.float32), config)
    detector_response(evolutions)
    kps = find_scale_space_extrema(evolutions, detector_threshold)
    kps = do_subpixel_refinement(kps, evolutions)
    # lib.rs:326-327: sort by response desc (stable), truncate.
    kps.sort(key=lambda kp: -kp["response"])
    if maximum_features is not None:
        kps = kps[:maximum_features]
    out_kps = []
    out_desc = []
    for kp in kps:
        d = get_mldb_descriptor(kp, evolutions)
        if d is not None:
            out_kps.append(kp)
            out_desc.append(d)
    return out_kps, out_desc, evolutions
