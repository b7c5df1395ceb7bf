"""Pallas patch-sample selection for orientation + M-LDB descriptors.

Replaces the XLA two-dot one-hot selection (descriptors.orient_mldb_onehot)
whose middle tensor ``(chunk, ns, C, 128)`` round-trips HBM (~87 MB per
128-keypoint chunk) and whose second contraction is an MXU-hostile batched
(M=C, K=128, N=1) dot.  Here both contractions fuse in VMEM:

  t[s, w]  = sum_h onehot_row[s, h] * patch[c, h, w]     (MXU, bf16x3 exact)
  v[c, s]  = sum_w (w == rel_x[s]) ? t[s, w] : 0          (VPU masked reduce)

The bf16x3 split is bit-exact: a one-hot row has a single nonzero, so each
pass selects one bf16 split term exactly and the f32 sum of the three terms
reconstructs the f32 sample (see descriptors._split_bf16x3).

Two grid layouts:

* ``select_samples``: ``(K/8, 8)`` — one keypoint per grid step (the rel
  tables ride in 8-row blocks; the kernel picks its row by
  ``program_id(1)``).
* ``select_samples_batched``: ``(K/8,)`` — 8 keypoints per grid step with
  an in-kernel loop, amortizing per-step overhead 8x (the suspected cause
  of the per-keypoint variants' 10-15% MXU utilization).

Workload reference: ``/root/reference/akaze/src/descriptors.rs:102-202`` and
``scale_space_extrema.rs:229-288`` (the per-keypoint rotated sampling loops).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

P = 128  # patch side
G = 8  # keypoints per rel-table block (sublane tile)


def _select_kernel(relx_ref, rely_ref, patch_ref, out_ref, *, c, ns):
    j = pl.program_id(1)
    rx = relx_ref[j]  # (ns,) i32
    ry = rely_ref[j]
    iota = jax.lax.broadcasted_iota(jnp.int32, (ns, P), 1)
    ohr = (iota == ry[:, None]).astype(jnp.bfloat16)  # (ns, P) row select
    colmask = iota == rx[:, None]  # (ns, P) col select
    for ch in range(c):
        p = patch_ref[0, ch]  # (P, P) f32
        p1 = p.astype(jnp.bfloat16)
        r1 = p - p1.astype(jnp.float32)
        p2 = r1.astype(jnp.bfloat16)
        p3 = (r1 - p2.astype(jnp.float32)).astype(jnp.bfloat16)
        t = None
        for ps in (p1, p2, p3):
            ti = jax.lax.dot_general(
                ohr,
                ps,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (ns, P): t[s, w] = patch[rel_y[s], w]
            t = ti if t is None else t + ti
        v = jnp.sum(jnp.where(colmask, t, 0.0), axis=1)  # (ns,)
        out_ref[0, ch] = v


def _select_kernel_batched(relx_ref, rely_ref, patch_ref, out_ref, *, c, ns, g):
    """G keypoints per grid step: one rel-table block load, G x C x 3
    back-to-back matmuls amortize the per-step overhead that throttled the
    one-keypoint-per-step variant (512 grid steps instead of 4096)."""
    iota = jax.lax.broadcasted_iota(jnp.int32, (ns, P), 1)
    for j in range(g):
        rx = relx_ref[j]
        ry = rely_ref[j]
        ohr = (iota == ry[:, None]).astype(jnp.bfloat16)
        colmask = iota == rx[:, None]
        for ch in range(c):
            p = patch_ref[j, ch]  # (P, P) f32
            p1 = p.astype(jnp.bfloat16)
            r1 = p - p1.astype(jnp.float32)
            p2 = r1.astype(jnp.bfloat16)
            p3 = (r1 - p2.astype(jnp.float32)).astype(jnp.bfloat16)
            t = None
            for ps in (p1, p2, p3):
                ti = jax.lax.dot_general(
                    ohr,
                    ps,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                t = ti if t is None else t + ti
            out_ref[j, ch] = jnp.sum(jnp.where(colmask, t, 0.0), axis=1)


def _select_kernel_gather(
    relx_ref, rely_ref, patch_ref, out_ref, *, c, ns, g, c0=0
):
    """Hardware dynamic-gather selection — no one-hot, no MXU, pure f32.

    v5e's ``tpu.dynamic_gather`` is per-tile only (lane gather within one
    128-lane tile, sublane gather within one 8-row tile; larger shapes
    crash the backend — measured), so the 2-D select decomposes as:

      u[h, s] = p[h, rx[s]]          lane gather on the (128, 128) patch
      w[r, s] = u[8*q_s + r, s]      16-way masked band reduce (VPU; one
                                     nonzero term, so f32-exact)
      v[s]    = w[ry[s] % 8, s]      sublane gather on the (8, 128) band

    Samples ride lanes end-to-end (tables (G, NS), output (G, C, NS)), so
    every broadcast is sublane replication — zero relayouts, which is what
    killed the one-hot variants (3.9 us/kp building transposed one-hots vs
    ~0.6 us/kp here, exp_r3_mxu_probe / exp_r3_gather_probe).
    """
    for j in range(g):
        for cc in range(ns // P):
            rx = relx_ref[j, cc * P : (cc + 1) * P]  # (P,) on lanes
            ry = rely_ref[j, cc * P : (cc + 1) * P]
            rx_b = jnp.broadcast_to(rx[None, :], (P, P))
            q = ry // 8
            r_b = jnp.broadcast_to((ry % 8)[None, :], (8, P))
            qmask = (
                jax.lax.broadcasted_iota(jnp.int32, (P // 8, 8, P), 0)
                == q[None, None, :]
            )
            for ch in range(c0, c):
                p = patch_ref[j, ch]  # (P, P)
                u = jnp.take_along_axis(p, rx_b, axis=1)
                w = jnp.sum(
                    jnp.where(qmask, u.reshape(P // 8, 8, P), 0.0), axis=0
                )  # (8, P)
                v = jnp.take_along_axis(w, r_b, axis=0)
                out_ref[j, ch - c0, cc * P : (cc + 1) * P] = v[0]


@partial(jax.jit, static_argnames=("interpret", "g", "c0"))
def select_samples_gather(
    patches: jnp.ndarray,  # (K, C, P, P) f32
    rel_x: jnp.ndarray,  # (K, NS) i32 in [0, P)
    rel_y: jnp.ndarray,  # (K, NS) i32
    interpret: bool = False,
    g: int = G,
    c0: int = 0,
) -> jnp.ndarray:
    """vals[k, c - c0, s] = patches[k, c, rel_y[k, s], rel_x[k, s]] via
    per-tile hardware gathers (see _select_kernel_gather).  Bit-exact f32.

    ``c0``: first channel to select — lets the orientation pass (Lx/Ly
    only) share the SAME 3-channel patches operand as the M-LDB pass
    instead of slicing a channel-copy of it (XLA CSEs the one operand)."""
    k, c, p, p2 = patches.shape
    assert p == P and p2 == P, (p, p2)
    ns = rel_x.shape[1]
    assert ns % P == 0, ns
    assert k % g == 0, (k, g)
    interpret = interpret or jax.default_backend() == "cpu"
    return pl.pallas_call(
        partial(_select_kernel_gather, c=c, ns=ns, g=g, c0=c0),
        grid=(k // g,),
        in_specs=[
            pl.BlockSpec((g, ns), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, ns), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (g, c, P, P), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (g, c - c0, ns), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((k, c - c0, ns), jnp.float32),
        interpret=interpret,
    )(rel_x, rel_y, patches)


@partial(jax.jit, static_argnames=("interpret",))
def select_samples_batched(
    patches: jnp.ndarray,  # (K, C, P, P) f32
    rel_x: jnp.ndarray,  # (K, NS) i32 in [0, P)
    rel_y: jnp.ndarray,  # (K, NS) i32
    interpret: bool = False,
) -> jnp.ndarray:
    """vals[k, c, s] = patches[k, c, rel_y[k, s], rel_x[k, s]] with G=8
    keypoints per grid step (see _select_kernel_batched)."""
    k, c, p, p2 = patches.shape
    assert p == P and p2 == P, (p, p2)
    ns = rel_x.shape[1]
    assert ns % 128 == 0, ns
    assert k % G == 0, (k, G)
    interpret = interpret or jax.default_backend() == "cpu"
    return pl.pallas_call(
        partial(_select_kernel_batched, c=c, ns=ns, g=G),
        grid=(k // G,),
        in_specs=[
            pl.BlockSpec((G, ns), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, ns), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (G, c, P, P), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (G, c, ns), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((k, c, ns), jnp.float32),
        interpret=interpret,
    )(rel_x, rel_y, patches)


@partial(jax.jit, static_argnames=("interpret",))
def select_samples(
    patches: jnp.ndarray,  # (K, C, P, P) f32
    rel_x: jnp.ndarray,  # (K, NS) i32 in [0, P)
    rel_y: jnp.ndarray,  # (K, NS) i32
    interpret: bool = False,
) -> jnp.ndarray:
    """vals[k, c, s] = patches[k, c, rel_y[k, s], rel_x[k, s]].

    ``K`` must be a multiple of 8; ``NS`` a multiple of 128.
    """
    k, c, p, p2 = patches.shape
    assert p == P and p2 == P, (p, p2)
    ns = rel_x.shape[1]
    assert ns % 128 == 0, ns
    assert k % G == 0, (k, G)
    interpret = interpret or jax.default_backend() == "cpu"
    return pl.pallas_call(
        partial(_select_kernel, c=c, ns=ns),
        grid=(k // G, G),
        in_specs=[
            pl.BlockSpec((G, ns), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, ns), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, c, P, P),
                lambda i, j: (i * G + j, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, c, ns), lambda i, j: (i * G + j, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((k, c, ns), jnp.float32),
        interpret=interpret,
    )(rel_x, rel_y, patches)


# The measured-loser fused cut+select kernels (select_samples_epatch,
# select_samples_tiles, select_samples_tiles8) were retired to
# experiments/pallas_mldb_losers.py after their round-4 device verdicts
# (docs/perf-notes.md "Describe-stage attack" / "session 4"); importing
# that module re-registers their describe modes for experiments and tests.


def _select_kernel_groups(
    lvl_ref, ty_ref, tx_ref, nact_ref,  # scalar-prefetch (NGW*W,) i32
    relx_ref, rely_ref,                  # (1, W*G, NS) window-relative [0, 2P)
    *rest,                               # 4*W quadrant refs (1, C, P, P) + out
    c, ns, c0, g, w,
):
    """Tile-COHERENT group select: each of the step's W window-groups shares
    ONE 256x256 window (four quadrant blocks) across its G keypoints, so a
    step issues 4*W quadrant DMAs for W*G keypoints — vs the 4-per-keypoint
    refs that sank tiles8 (block reuse across strided refs never triggered,
    round-4 verdict).  Groups are window-sorted and laid out COLUMN-major
    across steps (group t -> step t %% ngw, ref t // ngw), so each quadrant
    ref walks consecutive sorted groups and same-window runs repeat their
    block indices — skipped by Pallas.  Padding slots (j >= n_active) write
    deterministic zero rows via pl.when."""
    quads = rest[: 4 * w]
    out_ref = rest[4 * w]
    i = pl.program_id(0)
    for wl in range(w):
        q00, q01, q10, q11 = quads[4 * wl : 4 * wl + 4]
        n_act = nact_ref[i * w + wl]
        for j in range(g):
            # Skipped slots (group padding / invalid keypoints) still get a
            # deterministic zero row — out blocks are uninitialized VMEM.
            @pl.when(j >= n_act)
            def _zero(wl=wl, j=j):
                out_ref[wl * g + j] = jnp.zeros((c - c0, ns), jnp.float32)

            @pl.when(j < n_act)
            def _slot(wl=wl, j=j, q00=q00, q01=q01, q10=q10, q11=q11):
                for cc in range(ns // P):
                    rx = relx_ref[0, wl * g + j, cc * P : (cc + 1) * P]
                    ry = rely_ref[0, wl * g + j, cc * P : (cc + 1) * P]
                    right = rx >= P
                    rx_l = jnp.where(right, rx - P, rx)
                    rx_b = jnp.broadcast_to(rx_l[None, :], (P, P))
                    bottom = ry >= P
                    ry_l = jnp.where(bottom, ry - P, ry)
                    q = ry_l // 8
                    r_b = jnp.broadcast_to((ry_l % 8)[None, :], (8, P))
                    qmask = (
                        jax.lax.broadcasted_iota(jnp.int32, (P // 8, 8, P), 0)
                        == q[None, None, :]
                    )
                    for ch in range(c0, c):
                        def half(top_ref, bot_ref):
                            ut = jnp.take_along_axis(top_ref[0, ch], rx_b, axis=1)
                            ub = jnp.take_along_axis(bot_ref[0, ch], rx_b, axis=1)
                            u = jnp.where(bottom[None, :], ub, ut)
                            wsum = jnp.sum(
                                jnp.where(qmask, u.reshape(P // 8, 8, P), 0.0),
                                axis=0,
                            )
                            return jnp.take_along_axis(wsum, r_b, axis=0)[0]

                        v = jnp.where(
                            right, half(q01, q11), half(q00, q10)
                        )
                        out_ref[wl * g + j, ch - c0, cc * P : (cc + 1) * P] = v


@partial(jax.jit, static_argnames=("interpret", "c0", "g", "w"))
def select_samples_groups(
    planes: jnp.ndarray,  # (L, C, Hp, Wp) padded plane stack, Hp/Wp % 128 == 0
    win_lvl: jnp.ndarray,  # (NG,) i32 per-GROUP window plane index (strided layout)
    win_ty: jnp.ndarray,  # (NG,) i32 window tile row (window = [128ty, 128ty+256))
    win_tx: jnp.ndarray,  # (NG,) i32 window tile col
    n_active: jnp.ndarray,  # (NG,) i32 live slots in each group (0..G)
    rel_x: jnp.ndarray,  # (NG//w, w*g, NS) i32 in [0, 256), window-relative
    rel_y: jnp.ndarray,  # (NG//w, w*g, NS)
    interpret: bool = False,
    c0: int = 0,
    g: int = G,
    w: int = 1,
) -> jnp.ndarray:
    """vals[(i*w + wl)*g + j, c - c0, s] = planes[win_lvl[i*w + wl], c,
    128*win_ty[..] + rel_y[i, wl*g + j, s], 128*win_tx[..] + rel_x[..]] for
    j < n_active[i*w + wl] (padding slots come back as zero rows).

    The round-5 tile-coherent describe kernel: callers build window-sorted
    padded group tables (descriptors._group_tables) in the COLUMN-major
    strided layout (canonical group t at table position
    (t %% ngw)*w + t // ngw), so each quadrant ref walks consecutive sorted
    groups across steps and same-window runs skip their DMAs; ``w`` window-
    groups per step amortize the per-grid-step overhead.  Empty groups must
    point at window (0, 0, 0) with n_active 0.  Bit-exact f32."""
    l, c, hp, wp = planes.shape
    assert hp % P == 0 and wp % P == 0, (hp, wp)
    ng = win_lvl.shape[0]
    assert ng % w == 0, (ng, w)
    ngw = ng // w
    assert rel_x.shape[:2] == (ngw, w * g), (rel_x.shape, ngw, w, g)
    ns = rel_x.shape[2]
    assert ns % P == 0, ns
    interpret = interpret or jax.default_backend() == "cpu"

    def quad(wl, dy, dx):
        return pl.BlockSpec(
            (1, c, P, P),
            lambda i, lvl_r, ty_r, tx_r, na_r, wl=wl, dy=dy, dx=dx: (
                lvl_r[i * w + wl], 0, ty_r[i * w + wl] + dy, tx_r[i * w + wl] + dx
            ),
            memory_space=pltpu.VMEM,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(ngw,),
        in_specs=[
            pl.BlockSpec(
                (1, w * g, ns), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, w * g, ns), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ]
        + [quad(wl, dy, dx) for wl in range(w) for dy in (0, 1) for dx in (0, 1)],
        out_specs=pl.BlockSpec(
            (w * g, c - c0, ns), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
        ),
    )
    return pl.pallas_call(
        partial(_select_kernel_groups, c=c, ns=ns, c0=c0, g=g, w=w),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((ng * g, c - c0, ns), jnp.float32),
        interpret=interpret,
    )(
        win_lvl, win_ty, win_tx, n_active,
        rel_x, rel_y,
        *([planes] * (4 * w)),
    )


def _select_one(patch2d, rx, ry):
    """The proven per-tile gather chain for ONE (P, P) plane and one 128-
    sample chunk (see _select_kernel_gather): lane gather -> 16-band masked
    reduce -> sublane gather.  f32-exact."""
    rx_b = jnp.broadcast_to(rx[None, :], (P, P))
    q = ry // 8
    r_b = jnp.broadcast_to((ry % 8)[None, :], (8, P))
    qmask = (
        jax.lax.broadcasted_iota(jnp.int32, (P // 8, 8, P), 0)
        == q[None, None, :]
    )
    u = jnp.take_along_axis(patch2d, rx_b, axis=1)
    w = jnp.sum(jnp.where(qmask, u.reshape(P // 8, 8, P), 0.0), axis=0)
    return jnp.take_along_axis(w, r_b, axis=0)[0]  # (P,)


def _select_kernel_fused(
    xf_ref, yf_ref, sc_ref, wl_ref, hl_ref,  # scalar-prefetch (K,)
    orelx_ref, orely_ref,  # (1, G, 128) patch-relative orientation samples
    wt_ref,                # (8, 128) f32; row 0 = orientation weights
    a1_ref, a2_ref,        # (48, 128) f32; rows >= 42 unused
    uk_ref, ul_ref,        # (8, 128) f32; rows 0..nc-1 = M-LDB offset chunks
    patch_ref,             # (G, 3, P, P)
    vals_ref,              # (G, 3, NSP)
    meta_ref,              # (G, 128) f32: lanes 0..3 = angle, cos, sin, ok
    *, g, nsp, n_or, ns_u, hmax, wmax,
):
    """Single-pass describe: orientation select + IN-KERNEL dominant angle
    + M-LDB sample positions + M-LDB select, one patch DMA per keypoint
    (the two-pass 'pgather' path reads every 805 MB patch buffer twice).

    The angle math replicates descriptors._orientation_from_samples
    lane-for-lane (the 109-sample reduce is a 128-lane masked reduce in XLA
    too), and the position math replicates the XLA chunked path op-for-op;
    whether Mosaic's atan2/cos/sin bit-match XLA's TPU lowering is gated by
    an on-device equality test before this mode can be a default."""
    two_pi = jnp.float32(2.0 * 3.14159265358979323846)
    i = pl.program_id(0)
    row48 = jax.lax.broadcasted_iota(jnp.int32, (48, 1), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)[0]
    for j in range(g):
        base = i * g + j
        xf = xf_ref[base]
        yf = yf_ref[base]
        sc = sc_ref[base]
        wl = wl_ref[base]
        hl = hl_ref[base]
        # --- orientation samples (rel tables precomputed in XLA) ---
        orx = orelx_ref[0, j]
        ory = orely_ref[0, j]
        vo_x = _select_one(patch_ref[j, 1], orx, ory)
        vo_y = _select_one(patch_ref[j, 2], orx, ory)
        res_x = wt_ref[0] * vo_x  # weights are 0 beyond lane n_or
        res_y = wt_ref[0] * vo_y
        angs = jnp.mod(jnp.arctan2(res_y, res_x) + two_pi, two_pi)
        ang_b = angs[None, :]
        a1 = a1_ref[:, :]
        a2 = a2_ref[:, :]
        in_win = ((a1 < a2) & (a1 < ang_b) & (ang_b < a2)) | (
            (a2 < a1)
            & (((ang_b > 0) & (ang_b < a2)) | ((ang_b > a1) & (ang_b < two_pi)))
        )
        sum_x = jnp.sum(jnp.where(in_win, res_x[None, :], 0.0), axis=1)[:, None]
        sum_y = jnp.sum(jnp.where(in_win, res_y[None, :], 0.0), axis=1)[:, None]
        val = sum_x * sum_x + sum_y * sum_y  # (48, 1)
        val = jnp.where(row48 < 42, val, -jnp.inf)
        m = jnp.max(val)
        best = jnp.min(jnp.where(val == m, row48, 48))
        bx = jnp.sum(jnp.where(row48 == best, sum_x, 0.0))
        by = jnp.sum(jnp.where(row48 == best, sum_y, 0.0))
        angle = jnp.mod(jnp.arctan2(by, bx) + two_pi, two_pi)
        co = jnp.cos(angle)
        si = jnp.sin(angle)

        # --- M-LDB sample positions + select (patch anchor recomputed
        # exactly as the XLA path: clip(int(center) - 64, 0, max - P)) ---
        x0 = jnp.clip(xf.astype(jnp.int32) - P // 2, 0, wmax - P)
        y0 = jnp.clip(yf.astype(jnp.int32) - P // 2, 0, hmax - P)
        ok = jnp.float32(1.0)
        nc = (ns_u + P - 1) // P
        for cc in range(nc):
            kt = uk_ref[cc]
            lt = ul_ref[cc]
            sy = yf + (lt * co + kt * si) * sc
            sx = xf + (-lt * si + kt * co) * sc
            # round_half_away (Rust f32::round semantics)
            x1 = (jnp.sign(sx) * jnp.floor(jnp.abs(sx) + 0.5)).astype(jnp.int32)
            y1 = (jnp.sign(sy) * jnp.floor(jnp.abs(sy) + 0.5)).astype(jnp.int32)
            lane_in = lane < (ns_u - cc * P)
            oob = lane_in & (
                (x1 < 0) | (x1 >= wl) | (y1 < 0) | (y1 >= hl)
            )
            ok = ok * (1.0 - jnp.max(oob.astype(jnp.float32)))
            x1 = jnp.clip(x1, 0, wl - 1)
            y1 = jnp.clip(y1, 0, hl - 1)
            relx = jnp.clip(x1 - x0, 0, P - 1)
            rely = jnp.clip(y1 - y0, 0, P - 1)
            for ch in range(3):
                vals_ref[j, ch, cc * P : (cc + 1) * P] = _select_one(
                    patch_ref[j, ch], relx, rely
                )
        meta = jnp.where(
            lane == 0,
            angle,
            jnp.where(lane == 1, co, jnp.where(lane == 2, si, ok)),
        )
        meta_ref[j] = jnp.where(lane < 4, meta, 0.0)


@partial(jax.jit, static_argnames=("interpret", "g", "hmax", "wmax", "ns_u"))
def select_samples_fused(
    patches: jnp.ndarray,  # (K, 3, P, P) f32
    orel_x: jnp.ndarray,  # (K, 128) i32 orientation samples, patch-relative
    orel_y: jnp.ndarray,  # (K, 128) i32
    xf: jnp.ndarray,  # (K,) f32 keypoint center (level coords)
    yf: jnp.ndarray,  # (K,) f32
    scale: jnp.ndarray,  # (K,) f32 sampling scale
    wlim: jnp.ndarray,  # (K,) i32 true plane width
    hlim: jnp.ndarray,  # (K,) i32
    wt_row: jnp.ndarray,  # (8, 128) f32 orientation weights (row 0)
    a1_tbl: jnp.ndarray,  # (48, 128) f32 window starts (rows 42+ zero)
    a2_tbl: jnp.ndarray,  # (48, 128) f32 window ends
    uk_tbl: jnp.ndarray,  # (8, 128) f32 M-LDB k offsets by chunk row
    ul_tbl: jnp.ndarray,  # (8, 128) f32 M-LDB l offsets
    ns_u: int,  # number of real unique M-LDB offsets (441)
    hmax: int,  # padded plane height (patch-anchor clamp)
    wmax: int,
    interpret: bool = False,
    g: int = G,
):
    """Fused orientation + angle + M-LDB describe over per-keypoint patches.
    Returns ``(vals (K, 3, NSP), meta (K, 128))`` with meta lanes
    [angle, cos, sin, ok]."""
    k, c, p, p2 = patches.shape
    assert c == 3 and p == P and p2 == P, patches.shape
    assert k % g == 0, (k, g)
    nsp = -(-ns_u // P) * P
    interpret = interpret or jax.default_backend() == "cpu"
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(k // g,),
        in_specs=[
            pl.BlockSpec((1, g, P), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g, P), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, P), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((48, P), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((48, P), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, P), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, P), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (g, 3, P, P), lambda i, *_: (i, 0, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (g, 3, nsp), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((g, P), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
        ],
    )
    return pl.pallas_call(
        partial(
            _select_kernel_fused,
            g=g, nsp=nsp, n_or=128, ns_u=ns_u, hmax=hmax, wmax=wmax,
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((k, 3, nsp), jnp.float32),
            jax.ShapeDtypeStruct((k, P), jnp.float32),
        ],
        interpret=interpret,
    )(
        xf, yf, scale, wlim, hlim,
        orel_x.reshape(k // g, g, P), orel_y.reshape(k // g, g, P),
        wt_row, a1_tbl, a2_tbl, uk_tbl, ul_tbl,
        patches,
    )
