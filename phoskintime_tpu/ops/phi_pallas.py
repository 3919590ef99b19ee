"""Pallas TPU kernel for the ETD2RK propagator-table build.

The flagship objective's cost is NOT the segment scan — it is building
the per-(bucket, h) propagator tables E = expm(Lh), p1 = h phi1(Lh) e0,
p2 = h^2 phi2(Lh) e0 for every (member, protein) block: measured 38 ms
of the 44 ms objective at pop 2048 (ablation, round 2). The XLA version
(:func:`phoskintime_tpu.network.expo._phi_vectors_lanes`) round-trips the
(w, w, P*N) carry through HBM at every Taylor/Horner term and every
squaring-ladder iteration — ~1 GB of traffic per pair, 14 pairs.

This kernel runs the ENTIRE scaling + Taylor + doubling ladder in VMEM:
per grid tile it reads one (w, w, BLK) slab of L and writes E, p1, p2 —
~33 MB total instead of ~1 GB. The ladder is unrolled to a STATIC
per-pair trip count derived from the segment length and the bio-bound
rate cap (same contract as the `unroll=` mode of `_phi_vectors_lanes`);
lanes that need fewer squarings are masked per iteration, exactly like
the XLA path.

Math spec: `network/expo.py:_phi_vectors_lanes` (the doubling identities
E(2h) = E^2, p1(2h) = (I+E)p1, p2(2h) = (I+E)p2 + h p1). Behavioral spec
for the tables themselves: reference ``global_model/solvers.py`` +
``jacspeedup.py`` integrate the same linear blocks step by step; here
they are integrated exactly.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# pre-squaring Taylor radius 0.5 at 8 terms reaches ~5.4e-9 — beyond f32
# (0.5^9/9!); the wider radius saves one squaring-ladder iteration for
# EVERY lane vs the earlier 0.25 at identical Taylor cost
_TAYLOR_TERMS = 8
_RADIUS = 0.5
# ladder sizing: ||L h||_inf <= RATE_CAP * w * h for softplus-bounded rates
_RATE_CAP = 32.0


def ladder_len(w: int, h: float, max_squarings: int = 24) -> int:
    """Static squaring count covering ||Lh|| <= RATE_CAP * w * h."""
    norm = max(_RATE_CAP * w * float(h), 1e-30)
    need = int(np.ceil(np.log2(max(norm / _RADIUS, 1.0)))) + 1  # +1 headroom
    return int(np.clip(need, 1, max_squarings))


def _mm(x, y):
    """(w, w, BLK) lane-resident block matmul as w broadcasts.

    Written as slice-then-expand (NOT `x[:, j, None, :]`): mixed
    int/None indexing lowers to an N-D gather, which Mosaic rejects.
    """
    w = x.shape[0]
    acc = None
    for j in range(w):
        xj = x[:, j, :][:, None, :]                  # (w, 1, BLK)
        yj = y[j][None]                              # (1, w, BLK)
        t = xj * yj
        acc = t if acc is None else acc + t
    return acc


def _mv(M, v):
    """(w, w, BLK) x (w, BLK) -> (w, BLK)."""
    return jnp.sum(M * v[None, :, :], axis=1)


def _phi_math(ladder: int, L, h):
    """Shared kernel math: L (w, w, BLK) resident in VMEM, h scalar ->
    (E, p1, p2). Factored out so the single-pair and all-pairs kernels
    compile the identical ladder."""
    w = L.shape[0]
    blk = L.shape[-1]
    A = L * h
    # per-lane inf-norm -> squaring count s in [0, ladder]
    norm = jnp.max(jnp.sum(jnp.abs(A), axis=1), axis=0, keepdims=True)
    s = jnp.ceil(jnp.log2(jnp.maximum(norm, 1e-30) / _RADIUS))
    s = jnp.clip(s, 0.0, float(ladder))              # (1, BLK)
    scale = jnp.exp2(s)
    A = A / scale[None]                              # (1,1,BLK) broadcast
    hs = h / scale                                   # (1, BLK)

    # NOTE: iota-built identity/e0 tensors may only be used ADDITIVELY —
    # feeding them as a multiplicand into the lane matmul crashes the
    # Mosaic layout pass ("limits[i] <= dim(i)"). The first Horner/series
    # steps are peeled so every multiply sees computed data.
    r = jax.lax.broadcasted_iota(jnp.int32, (w, w, blk), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (w, w, blk), 1)
    eye = (r == c).astype(L.dtype)

    # E = expm(A) by Horner; first step mm(A/k, I) = A/k done directly
    E = eye + A / float(_TAYLOR_TERMS)
    for k in range(_TAYLOR_TERMS - 1, 0, -1):
        E = eye + _mm(A / float(k), E)

    # phi1/phi2 columns (remainder lives in slot 0 only);
    # mv(A, e0) = A[:, 0, :] done as a slice
    rr = jax.lax.broadcasted_iota(jnp.int32, (w, blk), 0)
    e0 = (rr == 0).astype(L.dtype)
    term = A[:, 0, :]
    v1 = e0 + term / 2.0
    v2 = e0 / 2.0 + term / 6.0
    for k in range(2, _TAYLOR_TERMS + 1):
        term = _mv(A, term) / float(k)
        v1 = v1 + term / float(k + 1)
        v2 = v2 + term / float((k + 1) * (k + 2))
    p1 = v1 * hs
    p2 = v2 * (hs * hs)

    # doubling ladder, statically unrolled (a dynamic fori_loop trip
    # count measured 30% SLOWER here — the loop carries lose fusion),
    # per-lane masked — entirely in VMEM (this is the point of the
    # kernel). Masked lanes stop squaring at their own s, which also
    # protects their accuracy (every excess squaring doubles rounding).
    #
    # Runtime skip: `ladder` is the STATIC worst-case bound (rate-cap
    # sizing, ~10x above real ||Lh||), but once every lane in the tile
    # has reached its own s the remaining iterations are dead selects —
    # each one is wrapped in a value-carrying cond on the tile-wide max
    # need, so they cost one scalar predicate instead of a w^3 matmul.
    # Measured on the decomp profile: static ladder 15 vs per-pair need
    # 6-15 by plan, and per-LANE need far lower still (the cap
    # overestimates the physical rates by ~10x).
    hc = hs
    s_max = jnp.max(s)                               # scalar, this tile

    def ladder_iter(i, carry):
        E, p1, p2, hc = carry
        go = (float(i) < s)                          # (1, BLK)
        p2n = p2 + _mv(E, p2) + p1 * hc
        p1n = p1 + _mv(E, p1)
        En = _mm(E, E)
        return (jnp.where(go[None], En, E), jnp.where(go, p1n, p1),
                jnp.where(go, p2n, p2), jnp.where(go, 2.0 * hc, hc))

    carry = (E, p1, p2, hc)
    for i in range(ladder):
        carry = jax.lax.cond(float(i) < s_max,
                             partial(ladder_iter, i),
                             lambda c: c, carry)
    E, p1, p2, _ = carry

    return E, p1, p2


def _phi_kernel(ladder: int, w: int, L_ref, h_ref, E_ref, p1_ref, p2_ref):
    E, p1, p2 = _phi_math(ladder, L_ref[:], h_ref[0, 0])
    E_ref[:] = E
    p1_ref[:] = p1
    p2_ref[:] = p2


def _phi_kernel_all(ladder: int, w: int, binv_ref, h_ref, L_ref,
                    E_ref, p1_ref, p2_ref):
    # binv/h arrive via scalar prefetch (SMEM, indexed by the pair axis
    # of the grid) — a (U, 1)-shaped SMEM *input* would need a (1, 1)
    # block, which the TPU lowering rejects for U > 1
    E, p1, p2 = _phi_math(ladder, L_ref[0], h_ref[pl.program_id(0)])
    E_ref[0] = E
    p1_ref[0] = p1
    p2_ref[0] = p2


@partial(jax.jit, static_argnames=("ladder", "blk", "interpret"))
def phi_vectors_pallas(L, h: float, ladder: int, blk: int | None = None,
                       interpret: bool = False):
    """E = expm(Lh), p1 = h phi1(Lh) e0, p2 = h^2 phi2(Lh) e0.

    Args:
      L: (w, w, B) lane-layout blocks (f32).
      h: the segment length (uniform across lanes — one table per
         unique (bucket, h) pair).
      ladder: static squaring-ladder length (see :func:`ladder_len`).
      blk: lanes per grid tile; None auto-scales with the block width so
        the kernel's VMEM footprint stays inside the 16 MB budget
        (w=7 -> 2048; the combinatorial mechanism's w=17 -> 256).
    Returns (E (w, w, B), p1 (w, B), p2 (w, B)).
    """
    w, _, B = L.shape
    if blk is None:
        # VMEM footprint has a term linear in blk from the (w, blk) /
        # sublane-padded buffers, so the pure 1/w^2 scaling overshoots
        # badly for narrow blocks (w=2 at blk 14336 hit a measured
        # 25.98M scoped-vmem stack vs the 16M limit); cap at 4096 lanes
        blk = max(128, min(2048 * 49 // (w * w), 4096) // 128 * 128)
    Bp = ((B + blk - 1) // blk) * blk
    if Bp != B:
        L = jnp.concatenate(
            [L, jnp.zeros((w, w, Bp - B), L.dtype)], axis=-1)
    h_arr = jnp.asarray([[h]], L.dtype)

    grid = (Bp // blk,)
    spec3 = pl.BlockSpec((w, w, blk), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM)
    spec2 = pl.BlockSpec((w, blk), lambda i: (0, i),
                         memory_space=pltpu.VMEM)
    E, p1, p2 = pl.pallas_call(
        partial(_phi_kernel, ladder, w),
        out_shape=(jax.ShapeDtypeStruct((w, w, Bp), L.dtype),
                   jax.ShapeDtypeStruct((w, Bp), L.dtype),
                   jax.ShapeDtypeStruct((w, Bp), L.dtype)),
        grid=grid,
        in_specs=[spec3, pl.BlockSpec((1, 1), lambda i: (0, 0),
                                      memory_space=pltpu.SMEM)],
        out_specs=(spec3, spec2, spec2),
        interpret=interpret,
    )(L, h_arr)
    return E[..., :B], p1[..., :B], p2[..., :B]


# ---------------------------------------------------------------------
# Pages-layout variant: matrix indices in LEADING dims, batch on the
# native (8, 128) vreg tile.
#
# The (w, w, BLK) layout above puts the matrix row index on the SUBLANE
# axis, so every `_mm` j-term is a sublane extract + sublane broadcast —
# Mosaic shuffle ops that outnumber the actual FMAs ~6x at w=6 (honest
# slope-timed decomposition, round 5: 12.2 ms for a build whose
# FLOP+DMA roofline is ~1.7 ms at pop 2048). Here every matrix entry
# (i, j) is its own (8, blk8) page — a full vreg tile — and the block
# matmuls unroll to w^3 pure vreg FMAs with ZERO shuffles. The identity
# matrix degenerates to per-page scalar `+ 1.0` on diagonal pages (the
# iota workaround above becomes moot). Only viable for small w (the
# unrolled statement count is O(w^3 * ladder)); the flagship affine
# mechanisms run w <= 2 + Smax <= 8.
# ---------------------------------------------------------------------


def _phi_math_pages(ladder: int, w: int, Lp, h):
    """Pages core: Lp[i][j] are (8, blk8) vreg tiles; h scalar.

    Returns (E pages [w][w], p1 pages [w], p2 pages [w]). Same math and
    masking semantics as :func:`_phi_math` (pinned by equivalence test).
    """
    A = [[Lp[i][j] * h for j in range(w)] for i in range(w)]
    # per-lane inf-norm over rows
    norm = None
    for i in range(w):
        row = A[i][0] * 0.0
        for j in range(w):
            row = row + jnp.abs(A[i][j])
        norm = row if norm is None else jnp.maximum(norm, row)
    s = jnp.ceil(jnp.log2(jnp.maximum(norm, 1e-30) * (1.0 / _RADIUS)))
    s = jnp.clip(s, 0.0, float(ladder))
    inv = jnp.exp2(-s)                    # 1/scale without a VPU divide
    A = [[A[i][j] * inv for j in range(w)] for i in range(w)]
    hs = h * inv

    def mm(x, y):
        out = []
        for i in range(w):
            row = []
            for k in range(w):
                acc = x[i][0] * y[0][k]
                for j in range(1, w):
                    acc = acc + x[i][j] * y[j][k]
                row.append(acc)
            out.append(row)
        return out

    def mv(M, v):
        out = []
        for i in range(w):
            acc = M[i][0] * v[0]
            for j in range(1, w):
                acc = acc + M[i][j] * v[j]
            out.append(acc)
        return out

    def plus_eye(M):
        return [[M[i][j] + 1.0 if i == j else M[i][j] for j in range(w)]
                for i in range(w)]

    # E = expm(A), Horner. All 1/k divides are trace-time reciprocal
    # constants: a runtime VPU divide is ~10x an FMA and this unrolled
    # body is ISSUE-bound, not FLOP-bound (measured: divides were ~25%
    # of the kernel). f32 rounding shift is below the Taylor truncation.
    E = plus_eye([[A[i][j] * (1.0 / _TAYLOR_TERMS) for j in range(w)]
                  for i in range(w)])
    for k in range(_TAYLOR_TERMS - 1, 0, -1):
        rk = 1.0 / k
        Ak = [[A[i][j] * rk for j in range(w)] for i in range(w)]
        E = plus_eye(mm(Ak, E))

    # phi1/phi2 e0 columns
    term = [A[i][0] for i in range(w)]
    v1 = [term[i] * 0.5 + (1.0 if i == 0 else 0.0) for i in range(w)]
    v2 = [term[i] * (1.0 / 6.0) + (0.5 if i == 0 else 0.0)
          for i in range(w)]
    for k in range(2, _TAYLOR_TERMS + 1):
        rk = 1.0 / k
        term = [t * rk for t in mv(A, term)]
        r1, r2 = 1.0 / (k + 1), 1.0 / ((k + 1) * (k + 2))
        for i in range(w):
            v1[i] = v1[i] + term[i] * r1
            v2[i] = v2[i] + term[i] * r2
    p1 = [v1[i] * hs for i in range(w)]
    p2 = [v2[i] * (hs * hs) for i in range(w)]

    s_max = jnp.max(s)

    def flat(E, p1, p2, hc):
        return tuple([E[i][j] for i in range(w) for j in range(w)]
                     + p1 + p2 + [hc])

    def unflat(c):
        E = [[c[i * w + j] for j in range(w)] for i in range(w)]
        p1 = list(c[w * w:w * w + w])
        p2 = list(c[w * w + w:w * w + 2 * w])
        return E, p1, p2, c[-1]

    def ladder_iter(i, carry):
        E, p1, p2, hc = unflat(carry)
        go = (float(i) < s)
        p1n = mv(E, p1)
        p2n = mv(E, p2)
        En = mm(E, E)
        E2 = [[jnp.where(go, En[i2][j2], E[i2][j2]) for j2 in range(w)]
              for i2 in range(w)]
        p12 = [jnp.where(go, p1[i2] + p1n[i2], p1[i2]) for i2 in range(w)]
        p22 = [jnp.where(go, p2[i2] + p2n[i2] + p1[i2] * hc, p2[i2])
               for i2 in range(w)]
        return flat(E2, p12, p22, jnp.where(go, 2.0 * hc, hc))

    carry = flat(E, p1, p2, hs)
    for i in range(ladder):
        carry = jax.lax.cond(float(i) < s_max,
                             partial(ladder_iter, i),
                             lambda c: c, carry)
    E, p1, p2, _ = unflat(carry)
    return E, p1, p2


def _phi_kernel_pages(ladder: int, w: int, binv_ref, h_ref, L_ref,
                      E_ref, p1_ref, p2_ref):
    Lp = [[L_ref[0, i, j] for j in range(w)] for i in range(w)]
    E, p1, p2 = _phi_math_pages(ladder, w, Lp, h_ref[pl.program_id(0)])
    for i in range(w):
        for j in range(w):
            E_ref[0, i, j] = E[i][j]
        p1_ref[0, i] = p1[i]
        p2_ref[0, i] = p2[i]


@partial(jax.jit, static_argnames=("ladder", "blk8", "interpret"))
def phi_vectors_pallas_pages(L, binv, h_u, ladder: int,
                             blk8: int | None = None,
                             interpret: bool = False):
    """Pages-layout all-pairs table build (drop-in for
    :func:`phi_vectors_pallas_all`, small w only).

    Args/returns identical to :func:`phi_vectors_pallas_all`; internally
    the lane axis B is viewed as (8, B/8) so batch fills the native vreg
    tile and every matrix entry is a leading-dim page (no shuffles).
    """
    Bu, w, _, B = L.shape
    U = int(binv.shape[0])
    if blk8 is None:
        blk8 = 256
    blk8 = max(128, blk8 // 128 * 128)   # lane dim: multiple of 128
    unit = 8 * blk8
    Bp = ((B + unit - 1) // unit) * unit
    if Bp != B:
        L = jnp.concatenate(
            [L, jnp.zeros((Bu, w, w, Bp - B), L.dtype)], axis=-1)
    Lr = L.reshape(Bu, w, w, 8, Bp // 8)
    binv = jnp.asarray(binv, jnp.int32)
    h_vec = jnp.asarray(h_u, L.dtype)

    grid = (U, Bp // unit)
    spec_L = pl.BlockSpec((1, w, w, 8, blk8),
                          lambda u, i, bv, hv: (bv[u], 0, 0, 0, i),
                          memory_space=pltpu.VMEM)
    spec_E = pl.BlockSpec((1, w, w, 8, blk8),
                          lambda u, i, bv, hv: (u, 0, 0, 0, i),
                          memory_space=pltpu.VMEM)
    spec_p = pl.BlockSpec((1, w, 8, blk8),
                          lambda u, i, bv, hv: (u, 0, 0, i),
                          memory_space=pltpu.VMEM)
    E, p1, p2 = pl.pallas_call(
        partial(_phi_kernel_pages, ladder, w),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[spec_L],
            out_specs=(spec_E, spec_p, spec_p),
        ),
        out_shape=(jax.ShapeDtypeStruct((U, w, w, 8, Bp // 8), L.dtype),
                   jax.ShapeDtypeStruct((U, w, 8, Bp // 8), L.dtype),
                   jax.ShapeDtypeStruct((U, w, 8, Bp // 8), L.dtype)),
        interpret=interpret,
    )(binv, h_vec, Lr)
    E = E.reshape(U, w, w, Bp)[..., :B]
    p1 = p1.reshape(U, w, Bp)[..., :B]
    p2 = p2.reshape(U, w, Bp)[..., :B]
    return E, p1, p2


@partial(jax.jit, static_argnames=("ladder", "blk", "interpret"))
def phi_vectors_pallas_all(L, binv, h_u, ladder: int,
                           blk: int | None = None,
                           interpret: bool = False):
    """Tables for ALL (bucket, h) pairs in ONE pallas_call.

    The per-pair variant re-traces (and re-Mosaic-compiles) once per
    unique pair because the ladder length is static — measured ~U
    compiles of ~5-40 s each through the remote-compile tunnel, and the
    width-bucketed combinatorial path multiplies that by the number of
    width classes (482 s trace+compile at a 12-protein demo). Here the
    pair axis is a grid dimension: the kernel reads its bucket's L slab
    via a scalar-prefetch index map and its own h from SMEM, the
    per-lane squaring mask (`s`, clipped to the GLOBAL max ladder) keeps
    short-segment pairs exact, and Mosaic compiles the body once.

    Args:
      L: (Bu, w, w, B) lane-layout blocks, one slab per unique bucket.
      binv: (U,) int32 bucket index of each (bucket, h) pair.
      h_u: (U,) segment length of each pair.
      ladder: static ladder bound — max of :func:`ladder_len` over pairs.
    Returns (E (U, w, w, B), p1 (U, w, B), p2 (U, w, B)).
    """
    Bu, w, _, B = L.shape
    U = int(binv.shape[0])
    if blk is None:
        # VMEM footprint has a term linear in blk from the (w, blk) /
        # sublane-padded buffers, so the pure 1/w^2 scaling overshoots
        # badly for narrow blocks (w=2 at blk 14336 hit a measured
        # 25.98M scoped-vmem stack vs the 16M limit); cap at 4096 lanes.
        # The pair-axis grid double-buffers a little more than the
        # per-pair kernel (w=9 measured 17.15M at the per-pair block
        # size), hence the extra 3/4 headroom factor here.
        blk = max(128,
                  min(2048 * 49 // (w * w), 4096) * 3 // 4 // 128 * 128)
    blk = min(blk, ((B + 127) // 128) * 128)
    Bp = ((B + blk - 1) // blk) * blk
    if Bp != B:
        L = jnp.concatenate(
            [L, jnp.zeros((Bu, w, w, Bp - B), L.dtype)], axis=-1)
    binv = jnp.asarray(binv, jnp.int32)
    h_vec = jnp.asarray(h_u, L.dtype)

    grid = (U, Bp // blk)
    spec_L = pl.BlockSpec((1, w, w, blk),
                          lambda u, i, bv, hv: (bv[u], 0, 0, i),
                          memory_space=pltpu.VMEM)
    spec_E = pl.BlockSpec((1, w, w, blk),
                          lambda u, i, bv, hv: (u, 0, 0, i),
                          memory_space=pltpu.VMEM)
    spec_p = pl.BlockSpec((1, w, blk), lambda u, i, bv, hv: (u, 0, i),
                          memory_space=pltpu.VMEM)
    E, p1, p2 = pl.pallas_call(
        partial(_phi_kernel_all, ladder, w),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[spec_L],
            out_specs=(spec_E, spec_p, spec_p),
        ),
        out_shape=(jax.ShapeDtypeStruct((U, w, w, Bp), L.dtype),
                   jax.ShapeDtypeStruct((U, w, Bp), L.dtype),
                   jax.ShapeDtypeStruct((U, w, Bp), L.dtype)),
        interpret=interpret,
    )(binv, h_vec, L)
    return E[..., :B], p1[..., :B], p2[..., :B]
