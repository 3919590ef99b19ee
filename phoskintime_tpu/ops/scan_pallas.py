"""Pallas TPU megakernel for the ETD2RK segment scan (models 0/1/2-unbucketed).

The production objective has two device phases: the propagator-table build
(already a VMEM-resident Pallas kernel, :mod:`phoskintime_tpu.ops.phi_pallas`)
and the S-segment evolution scan. The XLA scan
(:func:`phoskintime_tpu.network.expo.exponential_simulate_batched`) re-reads
the (w, w, P*N) table slab of its (bucket, h) pair from HBM at EVERY one of
the ~133 segments, carries the state through HBM each iteration, and
round-trips the lane layout through (P, N, w) reshapes twice per segment for
the synthesis drive — measured 19% HBM-bandwidth utilization with the chip
99% busy at pop 8192, i.e. latency-bound on table gathers.

This kernel runs the ENTIRE segment scan in one pallas_call: per grid tile it
loads ALL U pair tables (~2.7 KB/lane), the initial state, and the per-bucket
driven inputs into VMEM ONCE, then advances every segment with the state
resident, writing only the T output snapshots. Total HBM traffic drops from
~S table-reads to exactly one.

STATUS (round-4 measurement, TPU v5e, synchronous timing): the
pallas_call itself runs 24.9 ms @ pop 2048 / 91.2 ms @ pop 8192 — far
SLOWER than the XLA scan residual it replaces (~3 ms @ 2048, which the
decomposition profile shows already sits on its HBM table-traffic
roofline). The cost is the in-kernel compute pattern: S=133 sequential
fori iterations of narrow (w=6 sublane) VPU work plus 2xD lane-roll
chains per synthesis evaluation, with no cross-segment parallelism to
hide latency. The earlier 0.65 ms figure (round 3) was measured without
blocking on the result and timed only dispatch. Kept opt-in
(`use_scan_kernel=True`) for experimentation; correctness is pinned in
interpret mode by tests/test_pallas.py.

The one cross-protein coupling — the TF drive v = (tfm @ P_vec) / tf_deg
(reference ``global_model/network.py:379-383``) — is laid out so it needs no
reshape and no matmul: lanes are ordered (member-major, protein-minor) with
the protein axis zero-padded to ``Npad``, and the static tfm/tf_deg matrix is
decomposed into its D nonzero cyclic diagonals. Each diagonal contributes
``coef_d[i] * P_vec[(i + d) mod Npad]`` per member block, which on the flat
lane vector is a pair of static lane rotations (one for the in-block part,
one for the block-wrap part) with precomputed per-lane coefficients — the
whole TF matvec is 2D lane-rolls + D fused multiply-adds on (1, blk) vectors.

The synthesis total is a per-slot weight contraction (``tot_w``), which
covers model 0/1 (P0 + masked site sum, reference ``models.py:149-306``) and
model 2 (state-mask sum over hypercube states, ``models.py:322-432``) with
one code path. Kinase live-drive overrides (``driver_map``,
``jacspeedup.py``) enter as a precomputed per-bucket per-lane table.

Math spec: the `step` closure of the unbucketed scan in
``network/expo.py::exponential_simulate_batched`` — this kernel computes the
identical ETD2RK update a = E y + p1 s(y); y' = a + (p2/h)(s(a) - s(y)).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# per-tile VMEM budget (bytes) for 2x (double-buffered) the tile-mapped
# buffers. Measured cliff on v5e at the demo shapes (U=14, w=6, D=19):
# 2x-buffered footprint 10.2 MB (blk 1152) ran 458 ms/call — Mosaic
# spills the segment-loop temporaries once the working set nears the
# 16 MB scoped-vmem limit — while 6.8 MB (blk 768) ran 0.65 ms, at the
# HBM-traffic floor. Stay well under the spill point.
_VMEM_BUDGET = 7 * 1024 * 1024


def _lane_bytes(U, w, NB, D, T):
    """Per-lane VMEM bytes of one buffer copy, counting the (8, 128) tile
    padding of every (rows, blk) buffer's sublane dim."""
    pad8 = lambda x: -(-x // 8) * 8
    return 4 * (U * w * pad8(w)          # E tables
                + 2 * U * pad8(w)        # p1, p2h
                + pad8(w)                # y0
                + pad8(NB)               # drv
                + 3 * 8                  # A, ts, dm
                + 2 * pad8(D)            # c1, c2
                + T * pad8(w))           # output snapshots
# densest TF matrix the diagonal decomposition is worth: above this the
# roll chain costs more than the XLA scan's gathers (and such networks do
# not occur — the reference's CollecTRI-derived tfm is ~1% dense)
MAX_DIAGS = 64


def tf_diagonals(tfm: np.ndarray, tf_deg: np.ndarray, Npad: int):
    """Decompose the (N, N) TF coupling into cyclic diagonals over the
    zero-padded (Npad, Npad) block, with tf_deg folded into the
    coefficients and the block-wrap split precomputed.

    Returns (shifts, c1, c2): for lane q within a member block,
      v[q] = sum_k c1[k, q] * Pv[q + shifts[k]]            (q + d <  Npad)
           + sum_k c2[k, q] * Pv[q + shifts[k] - Npad]     (q + d >= Npad)
    """
    N = tfm.shape[0]
    pad = np.zeros((Npad, Npad), np.float64)
    pad[:N, :N] = np.asarray(tfm, np.float64)
    deg = np.ones((Npad,), np.float64)
    deg[:N] = np.asarray(tf_deg, np.float64)
    q = np.arange(Npad)
    shifts, c1, c2 = [], [], []
    for d in range(Npad):
        coef = pad[q, (q + d) % Npad] / deg
        if not np.any(coef):
            continue
        wrap = (q + d) >= Npad
        shifts.append(d)
        c1.append(np.where(~wrap, coef, 0.0))
        c2.append(np.where(wrap, coef, 0.0))
    if not shifts:  # degenerate: no TF coupling at all
        shifts, c1, c2 = [0], [np.zeros(Npad)], [np.zeros(Npad)]
    return (tuple(shifts), np.stack(c1).astype(np.float32),
            np.stack(c2).astype(np.float32))


def _scan_kernel(S, w, Npad, shifts, init_slots,
                 uidx_ref, jb_ref, slot_ref,
                 E_ref, p1_ref, p2h_ref, y0_ref, drv_ref, A_ref, ts_ref,
                 totw_ref, dm_ref, c1_ref, c2_ref, out_ref):
    blk = y0_ref.shape[-1]
    y0 = y0_ref[:]
    for k in init_slots:                      # t_eval <= 0 -> initial state
        out_ref[k] = y0

    A = A_ref[:]                              # (1, blk)
    ts = ts_ref[:]
    dm = dm_ref[:]
    totw = totw_ref[:]                        # (w, blk)
    c1 = c1_ref[:]                            # (D, blk)
    c2 = c2_ref[:]

    def synth(yv, drv_row):
        """Synthesis drive (reference models.py:27-65) on lane layout."""
        tot = jnp.sum(yv * totw, axis=0, keepdims=True)        # (1, blk)
        Pv = dm * drv_row + (1.0 - dm) * tot
        v = None
        for k, d in enumerate(shifts):
            ck1 = c1[k, :][None]
            if d == 0:
                t = ck1 * Pv
            else:
                r1 = pltpu.roll(Pv, blk - d, axis=1)           # Pv[i + d]
                r2 = pltpu.roll(Pv, Npad - d, axis=1)          # block wrap
                t = ck1 * r1 + c2[k, :][None] * r2
            v = t if v is None else v + t
        u = v / (1.0 + jnp.abs(v))
        act = A * (1.0 + (ts * u) / (1.0 + u + 1e-6))
        rep = A / (1.0 + ts * jnp.abs(u))
        return jnp.where(u >= 0.0, act, rep)

    def body(s, y):
        ui = uidx_ref[s]
        drv_row = drv_ref[pl.ds(jb_ref[s], 1), :]              # (1, blk)
        E = E_ref[pl.ds(ui, 1)][0]                             # (w, w, blk)
        p1 = p1_ref[pl.ds(ui, 1)][0]                           # (w, blk)
        p2h = p2h_ref[pl.ds(ui, 1)][0]
        s_n = synth(y, drv_row)
        a = jnp.sum(E * y[None, :, :], axis=1) + p1 * s_n
        s_a = synth(a, drv_row)
        y_new = a + p2h * (s_a - s_n)
        slot = slot_ref[s]

        @pl.when(slot >= 0)
        def _():
            out_ref[pl.ds(slot, 1)] = y_new[None]

        return y_new

    jax.lax.fori_loop(0, S, body, y0)


def prepare_scan_plan(rhs, seg_jb, seg_uidx, u_h, out_idx, T,
                      max_diags: int = MAX_DIAGS):
    """Static (trace-time) plan for the megakernel, or None if the problem
    is ineligible (non-affine mechanism, t_eval slot collisions, TF matrix
    too dense for the diagonal decomposition, or no lane-padding Npad whose
    minimum tile fits the VMEM budget).

    Returns a dict of numpy/static pieces; the caller tiles the per-member
    lanes on device (tiling here would bake ~(D x P*Npad) constants into
    the executable).
    """
    model = int(rhs.model)
    if model not in (0, 1, 2):
        return None
    N, w = int(rhs.N), int(rhs.width)
    out_idx = np.asarray(out_idx)
    pos = out_idx[out_idx >= 0]
    if len(np.unique(pos)) != len(pos):
        return None  # two t_eval points on one segment: kernel writes one
    S = len(seg_uidx)
    out_slot = np.full(S, -1, np.int32)
    for i, si in enumerate(out_idx):
        if si >= 0:
            out_slot[int(si)] = i
    init_slots = tuple(int(i) for i in np.where(out_idx < 0)[0])

    tfm = np.asarray(rhs.tf_mat, np.float64)
    tfd = np.asarray(rhs.tf_deg, np.float64)
    U = int(np.max(np.asarray(seg_uidx))) + 1
    NB = int(rhs.Kmat.shape[1])

    # smallest multiple-of-8 protein padding whose minimum lane tile
    # (lcm(Npad, 128), the member-block x lane-tile alignment) fits VMEM
    chosen = None
    for Npad in range((N + 7) // 8 * 8, N + 129, 8):
        shifts, c1, c2 = tf_diagonals(tfm, tfd, Npad)
        D = len(shifts)
        if D > max_diags:
            continue
        per_lane = 2 * _lane_bytes(U, w, NB, D, T)
        group = int(np.lcm(Npad, 128))
        if group * per_lane <= _VMEM_BUDGET:
            chosen = (Npad, shifts, c1, c2)
            break
    if chosen is None:
        return None
    Npad, shifts, c1, c2 = chosen

    # per-slot total-protein weights (reference models.py total semantics:
    # tot = P0 + masked site sum for models 0/1, state-mask sum for 2)
    totw = np.zeros((w, Npad), np.float32)
    if model == 2:
        totw[1:, :N] = np.asarray(rhs.state_mask, np.float32).T
    else:
        totw[1, :N] = 1.0
        totw[2:, :N] = np.asarray(rhs.site_mask, np.float32).T

    dm = np.zeros((1, Npad), np.float32)
    dm[0, :N] = np.asarray(rhs.driven, np.float32)
    didx = np.zeros((Npad,), np.int32)
    didx[:N] = np.asarray(rhs.driver_idx, np.int32)

    return dict(Npad=Npad, shifts=shifts, c1=c1, c2=c2, totw=totw, dm=dm,
                driver_idx=didx,
                jb=np.clip(np.asarray(seg_jb, np.int32), 0, NB - 1),
                uidx=np.asarray(seg_uidx, np.int32), out_slot=out_slot,
                init_slots=init_slots, T=int(T), NB=NB)


@partial(jax.jit, static_argnames=("shifts", "Npad", "T", "init_slots",
                                   "blk", "interpret"))
def etd2rk_scan_pallas(E, p1, p2h, y0, drv, A, ts, totw, dm, c1, c2,
                       uidx, jb, out_slot, *, shifts, Npad, T,
                       init_slots=(), blk=None, interpret=False):
    """Run the full ETD2RK segment scan in one pallas_call.

    Args:
      E:    (U, w, w, B) propagator tables, lane layout, B = P * Npad.
      p1:   (U, w, B) h*phi1(Lh) e0 columns.
      p2h:  (U, w, B) h^2*phi2(Lh) e0 / h (the 1/h of the correction term
            is folded in per pair — it is static).
      y0:   (w, B) initial state lanes.
      drv:  (NB, B) per-kinase-bucket driven P_vec override values.
      A, ts, dm: (1, B) synthesis amplitude, tf_scale, driven mask lanes.
      totw: (w, B) total-protein slot weights (site_mask / state_mask).
      c1, c2: (D, B) TF diagonal coefficients (from :func:`tf_diagonals`,
            tiled to B lanes).
      uidx, jb, out_slot: (S,) int32 segment metadata (scalar-prefetched):
            table row, kinase bucket, output snapshot slot (-1 = none).
      shifts: static tuple of D diagonal shifts.
      init_slots: static tuple of output slots equal to the initial state
            (t_eval <= 0).
    Returns ys (T, w, B).
    """
    U, w, _, B = E.shape
    NB = drv.shape[0]
    D = len(shifts)
    S = int(uidx.shape[0])
    if blk is None:
        per_lane = 2 * _lane_bytes(U, w, NB, D, T)
        group = int(np.lcm(Npad, 128))
        blk = max(group, _VMEM_BUDGET // per_lane // group * group)
    if B % blk != 0:
        padB = (B + blk - 1) // blk * blk - B
        padf = lambda x: jnp.concatenate(
            [x, jnp.zeros(x.shape[:-1] + (padB,), x.dtype)], axis=-1)
        E, p1, p2h, y0, drv, A, ts, totw, dm, c1, c2 = (
            padf(x) for x in (E, p1, p2h, y0, drv, A, ts, totw, dm, c1, c2))
    Bp = E.shape[-1]

    grid = (Bp // blk,)
    t3 = pl.BlockSpec((U, w, w, blk), lambda i, *_: (0, 0, 0, i),
                      memory_space=pltpu.VMEM)
    t2 = pl.BlockSpec((U, w, blk), lambda i, *_: (0, 0, i),
                      memory_space=pltpu.VMEM)
    vw = pl.BlockSpec((w, blk), lambda i, *_: (0, i),
                      memory_space=pltpu.VMEM)
    v1 = pl.BlockSpec((1, blk), lambda i, *_: (0, i),
                      memory_space=pltpu.VMEM)
    vnb = pl.BlockSpec((NB, blk), lambda i, *_: (0, i),
                       memory_space=pltpu.VMEM)
    vd = pl.BlockSpec((D, blk), lambda i, *_: (0, i),
                      memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((T, w, blk), lambda i, *_: (0, 0, i),
                            memory_space=pltpu.VMEM)

    ys = pl.pallas_call(
        partial(_scan_kernel, S, w, Npad, shifts, tuple(init_slots)),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=grid,
            in_specs=[t3, t2, t2, vw, vnb, v1, v1, vw, v1, vd, vd],
            out_specs=out_spec,
        ),
        out_shape=jax.ShapeDtypeStruct((T, w, Bp), E.dtype),
        interpret=interpret,
    )(jnp.asarray(uidx, jnp.int32), jnp.asarray(jb, jnp.int32),
      jnp.asarray(out_slot, jnp.int32),
      E, p1, p2h, y0, drv, A, ts, totw, dm, c1, c2)
    return ys[..., :B]
