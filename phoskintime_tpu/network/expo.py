"""Exponential (ETD2RK) integrator for the global network model.

The TPU-native replacement for step-by-step adaptive integration of this
system. Key structural facts (models 0/1/2):

* Within one kinase bucket the RHS is **affine** in the state: site rates S
  are frozen, and the only nonlinearity — the rational synthesis term —
  enters through the scalar TF input u (the single cross-protein coupling).
* With u frozen, the linear operator L is **block-diagonal per protein**
  (block width = 2 + Smax, or 1 + 2^Smax for the combinatorial model).

So we split dy = L y + g(y) with g = rhs - L y (the synthesis coupling) and
integrate each static segment with the exponential trapezoidal rule
(Cox & Matthews 2002 ETD2RK):

    a    = E y_n + Phi1 g(y_n)
    y_+  = a + (Phi2 / h) (g(a) - g(y_n))

where E = expm(L h), Phi1 = h*phi1(Lh), Phi2 = h^2*phi2(Lh) are built for
all (population x bucket x protein) blocks at once by lane-resident
scaling + Taylor + exact doubling recurrences (see :func:`_phi_matrices`).

The stiff linear decay is integrated **exactly**, so the sequential chain
shrinks from ~1250 stability-bound RK45 steps to ~40-100 fixed segments
(t_eval points + bucket boundaries + a substep refinement for the slow
nonlinear coupling). No while_loop, no lane divergence — a vmapped
population runs in lockstep.

Accuracy: local error O(h^3 * d2/dt2 of the synthesis drive); validated
against tight-tolerance RK45 in the test suite (rtol ~1e-5 at substep=16).

Model 4 (Michaelis-Menten, reference ``global_model/models.py:71-146``) has
a state-dependent linear part (the saturating fluxes C R/(1+R) and
S P0/(1+P0)), so no static phi table exists. It integrates with the
**exponential Rosenbrock** variant of the same rule: the block-diagonal
Jacobian (TF input frozen) is refreshed at every CHUNK entry (a run of
up to 8 equal-h segments inside one kinase bucket) and the phi matrices
are built in-scan once per chunk — the build is the dominant per-segment
cost, so amortizing it over the chunk is a measured 4.3x (5.5k -> 23.6k
objective evals/s at pop 2048 on v5e) with no accuracy change (the
remainder g is still evaluated exactly every substep).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from phoskintime_tpu.network.rhs import synthesis_rate
from phoskintime_tpu.ops.integrators import ODEResult


def _phi_pallas_ok(dtype) -> bool:
    """Route the propagator-table build to the Pallas kernel on real TPU
    backends (f32 only); CPU (tests, virtual meshes) and f64 use XLA.
    Multi-device configs also take the XLA path: a pallas_call inside a
    GSPMD-sharded program has no partitioning rule, so the mesh-sharded
    population evaluation must stay pure-XLA (the tables partition
    trivially there — the batch axis is the sharded population)."""
    try:
        if len(jax.devices()) != 1:
            return False
        plat = jax.devices()[0].platform
    except Exception:
        return False
    return plat in ("tpu", "axon") and dtype == jnp.float32


@lru_cache(maxsize=None)
def _segment_plan(kin_grid: tuple, t_eval: tuple, substep: float,
                  early_t: float = 64.0, early_div: int = 4,
                  very_early_t: float = 4.0, very_early_div: int = 8):
    """Static plan: segments (t0, h, bucket) covering [0, t_end], with every
    t_eval point landing on a segment boundary. Returns numpy arrays plus
    the map from t_eval index -> segment index whose end equals it.

    The grid is graded: intervals in the transient window (< ``early_t``)
    are subdivided ``early_div``-fold, the initial burst (< ``very_early_t``)
    ``very_early_div``-fold — that is where the nonlinear synthesis drive
    varies fastest."""
    grid = np.asarray(kin_grid, float)
    te = np.asarray(t_eval, float)
    t_end = te[-1]
    knots = np.unique(np.concatenate([[0.0], te, grid[(grid > 0) & (grid < t_end)]]))
    knots = knots[(knots >= 0.0) & (knots <= t_end)]

    seg_t0, seg_h, seg_jb = [], [], []
    for a, b in zip(knots[:-1], knots[1:]):
        n_sub = max(1, int(np.ceil((b - a) / substep)))
        if a < very_early_t:
            n_sub *= very_early_div
        elif a < early_t:
            n_sub *= early_div
        hs = (b - a) / n_sub
        for k in range(n_sub):
            t0 = a + k * hs
            jb = int(np.clip(np.searchsorted(grid, t0, side="right") - 1, 0,
                             len(grid) - 1))
            seg_t0.append(t0)
            seg_h.append(hs)
            seg_jb.append(jb)
    seg_t0 = np.asarray(seg_t0)
    seg_h = np.asarray(seg_h)
    seg_jb = np.asarray(seg_jb, np.int32)
    seg_end = seg_t0 + seg_h

    out_idx = np.full(len(te), -1, np.int64)
    for i, t in enumerate(te):
        if t <= 0.0:
            out_idx[i] = -1  # initial state
        else:
            out_idx[i] = int(np.argmin(np.abs(seg_end - t)))

    # unique (bucket, h) pairs: propagators are computed once per pair and
    # gathered per segment (bounds memory: tiny padded matrices are held
    # only U-fold, not S-fold)
    pairs = np.stack([seg_jb.astype(float), np.round(seg_h, 9)], axis=1)
    uniq, uidx = np.unique(pairs, axis=0, return_inverse=True)
    u_jb = uniq[:, 0].astype(np.int32)
    u_h = uniq[:, 1]
    return (seg_t0, seg_h, seg_jb, out_idx, uidx.astype(np.int32), u_jb, u_h)


def _run_plan(seg_uidx, out_idx):
    """Static run decomposition of the segment plan.

    Segments come in contiguous RUNS of equal (bucket, h) pair (the plan
    subdivides each knot interval into equal substeps), so the scan can
    hoist the propagator-table lookup per run instead of gathering it per
    segment. Runs are additionally split at every t_eval segment so each
    output lands exactly at a run END — the scan then never materializes
    per-segment states at all (the full (S, w, P*N) stacked trajectory of
    a flat ``lax.scan`` was ~300 MB of pure HBM writes at pop 2048 that
    the loss never reads).

    Returns (runs [(start, n)], out_pos (T,) int64) with out_pos[k] the
    index into [y0] + [run-end states] for t_eval[k].
    """
    S = len(seg_uidx)
    out_set = {int(i) for i in np.asarray(out_idx) if i >= 0}
    runs = []
    i = 0
    while i < S:
        j = i + 1
        while (j < S and seg_uidx[j] == seg_uidx[i]
               and (j - 1) not in out_set):
            j += 1
        runs.append((i, j - i))
        i = j
    end_to_run = {start + n - 1: r for r, (start, n) in enumerate(runs)}
    out_pos = np.asarray([0 if o < 0 else end_to_run[int(o)] + 1
                          for o in np.asarray(out_idx)], np.int64)
    return runs, out_pos


def _block_linear_operators(system, params, buckets: np.ndarray, dtype):
    """(B, N, w, w) block-diagonal linear parts, one per unique bucket.

    With u frozen the RHS is affine and block-diagonal, so w jvp passes
    (one per block slot, all proteins at once) recover the exact blocks.
    """
    topo = system.topo
    N, w = topo.N, topo.width
    u0 = jnp.zeros((N,), dtype)
    y_lin = jnp.zeros((N * w,), dtype)

    def columns_for_bucket(jb):
        def f(y_flat):
            return system.rhs(0.0, y_flat, jb, params, u_override=u0)

        def col(j):
            v = jnp.zeros((N, w), dtype).at[:, j].set(1.0).reshape(-1)
            _, tangent = jax.jvp(f, (y_lin,), (v,))
            return tangent.reshape(N, w)  # column j of every block

        cols = jax.vmap(col)(jnp.arange(w))         # (w, N, w)
        return jnp.transpose(cols, (1, 2, 0))       # (N, w, w): [i, row, col]

    return jax.vmap(columns_for_bucket)(jnp.asarray(buckets))


def _linear_blocks_lanes(system, params_b, buckets: np.ndarray, dtype,
                         Npad: int):
    """(Bu, w, w, P*Npad) linear blocks for the affine mechanisms
    (models 0/1), built DIRECTLY in the lane layout.

    Same entries as :meth:`PaddedRHS.linear_blocks` (pinned by test),
    but assembled as w*w lane planes instead of per-member (N, w, w)
    tensors: the (P, Bu, N, w, w) -> (Bu, w, w, P*N) transpose that
    layout required was the bulk of a measured 16.9 ms at pop 8192
    (round-4 decomp profile) — a major-to-minor inversion of ~690 MB
    that XLA executes as a strided copy. Here every plane is an
    elementwise function of parameter lanes, and the only contractions
    are Smax (Bu*P, K) @ (K, N) site-rate matmuls that land N-minor,
    i.e. already in lane order. Lanes beyond N (protein padding for the
    scan megakernel) hold all-zero blocks.
    """
    rhs = system.rhs
    N, w, Smax = rhs.N, rhs.width, rhs.Smax
    P = params_b["c_k"].shape[0]
    Bu = len(buckets)
    hi = jax.lax.Precision.HIGHEST

    def lane(x):                                  # (P, N) -> (1, P*Npad)
        x = jnp.asarray(x, dtype)
        if Npad != N:
            x = jnp.pad(x, ((0, 0), (0, Npad - N)))
        return x.reshape(1, -1)

    Kt = (params_b["c_k"][None]
          * jnp.transpose(rhs.Kmat[:, jnp.asarray(buckets)])[:, None, :])
    Kt = jnp.asarray(Kt, dtype)                   # (Bu, P, K)
    msk = rhs.site_mask                           # (N, Smax)

    def srate(j):                                 # masked S_j, (Bu, P*Npad)
        Wj = jnp.asarray(rhs.W_pad[:, j, :] * msk[:, j:j + 1], dtype)
        Smj = jnp.einsum("bpk,nk->bpn", Kt, Wj, precision=hi)
        if Npad != N:
            Smj = jnp.pad(Smj, ((0, 0), (0, 0), (0, Npad - N)))
        return Smj.reshape(Bu, -1)

    Sm = [srate(j) for j in range(Smax)]
    B_l, C_l, D_l, E_l = (lane(params_b[k])
                          for k in ("B_i", "C_i", "D_i", "E_i"))
    msk_l = [lane(jnp.broadcast_to(msk[None, :, j], (P, N)))
             for j in range(Smax)]
    Dp_l = [lane(params_b["Dp_i"][:, :, j]) for j in range(Smax)]
    zero = jnp.zeros((Bu, P * Npad), dtype)
    bc = lambda x: jnp.broadcast_to(x, (Bu, P * Npad))

    rows = [[zero for _ in range(w)] for _ in range(w)]
    rows[0][0] = bc(-B_l)
    rows[1][0] = bc(C_l)
    if rhs.model == 0:
        rows[1][1] = bc(-D_l) - sum(Sm)
        for j in range(Smax):
            rows[1][2 + j] = bc(E_l * msk_l[j])
            rows[2 + j][1] = Sm[j]
            rows[2 + j][2 + j] = bc(-(E_l + Dp_l[j] + D_l) * msk_l[j])
    else:                                         # model 1 (chain)
        has = msk_l                               # site-presence lanes
        has_next = has[1:] + [jnp.zeros_like(has[0])]
        k_next = Sm[1:] + [zero]
        rows[1][1] = bc(-D_l) - Sm[0] * bc(has[0])
        if w > 2:
            rows[1][2] = bc(E_l * has[0])
        rows[2][1] = Sm[0] * bc(msk_l[0])
        for j in range(1, Smax):
            rows[2 + j][1 + j] = Sm[j] * bc(msk_l[j])
        for j in range(Smax):
            if j + 1 < Smax:
                rows[2 + j][3 + j] = bc(E_l * has_next[j] * msk_l[j])
            rows[2 + j][2 + j] = -(k_next[j] * bc(has_next[j]) + bc(E_l)
                                   + bc(Dp_l[j]) + bc(D_l)) * bc(msk_l[j])
    return jnp.stack([jnp.stack(r, axis=1) for r in rows], axis=1)


def _block_linear_operators_class(system, params, buckets: np.ndarray,
                                  dtype, idx: np.ndarray, wc: int):
    """(B, Nc, wc, wc) blocks for ONE width class (protein subset ``idx``
    at class width ``wc``), probed narrow from the start.

    Same jvp extraction as :func:`_block_linear_operators`, but the probe
    vectors touch only class proteins and only the first ``wc`` state
    slots, and only class rows are read back — the wide (N, w, w) block
    tensor is never formed. This matters for layout, not just FLOPs:
    gathering class lanes out of the full lane-layout tensor makes XLA
    materialize it with the (w, w) matrix dims minor, which tile-pads
    (8, 128) to a measured 10.6x HBM expansion (13.7 GB at pop 2048,
    straight past the v5e's 16 GB)."""
    topo = system.topo
    N, w = topo.N, topo.width
    u0 = jnp.zeros((N,), dtype)
    y_lin = jnp.zeros((N * w,), dtype)
    idx_j = jnp.asarray(np.asarray(idx))

    def columns_for_bucket(jb):
        def f(y_flat):
            return system.rhs(0.0, y_flat, jb, params, u_override=u0)

        def col(j):
            # one probe lights slot j of EVERY class protein at once —
            # exact because the frozen-u RHS is block-diagonal
            v = jnp.zeros((N, w), dtype).at[idx_j, j].set(1.0).reshape(-1)
            _, tangent = jax.jvp(f, (y_lin,), (v,))
            return tangent.reshape(N, w)[idx_j, :wc]     # (Nc, wc)

        cols = jax.vmap(col)(jnp.arange(wc))             # (wc, Nc, wc)
        return jnp.transpose(cols, (1, 2, 0))            # (Nc, wc, wc)

    return jax.vmap(columns_for_bucket)(jnp.asarray(buckets))


def _jac_blocks_batched(system, params_b, Yb, jb, t, dtype):
    """(P, N, w, w) block-diagonal Jacobians at per-member states Yb.

    With the TF input frozen the RHS has no cross-protein coupling, so the
    Jacobian is exactly block-diagonal and w jvp passes (one per block
    column, all proteins and members at once) recover every block. Used by
    the model-4 exponential-Rosenbrock path, where the linear part depends
    on the state."""
    topo = system.topo
    N, w = topo.N, topo.width
    u0 = jnp.zeros((N,), dtype)

    def one(y, p):
        y_flat = y.reshape(-1)

        def f(z):
            return system.rhs(t, z, jb, p, u_override=u0)

        def col(j):
            v = jnp.zeros((N, w), dtype).at[:, j].set(1.0).reshape(-1)
            _, tangent = jax.jvp(f, (y_flat,), (v,))
            return tangent.reshape(N, w)

        cols = jax.vmap(col)(jnp.arange(w))          # (w, N, w)
        return jnp.transpose(cols, (1, 2, 0))        # (N, w, w)

    return jax.vmap(one)(Yb, params_b)


_MAX_SQUARINGS = 24
_TAYLOR_TERMS = 12


def _taylor_radius(dtype) -> float:
    """Pre-squaring Taylor radius, by dtype: f32 runs 8 terms at 0.5
    (err 0.5^9/9! ~ 5.4e-9, beyond f32 eps — one squaring saved for
    every lane vs 0.25); f64 runs 12 terms at 0.25 (0.25^13/13! ~
    2.4e-17). Must match ``ops/phi_pallas._RADIUS`` for the f32 case:
    per-lane squaring counts decide the rounding path, so the Pallas
    kernel and the XLA ladder stay bit-comparable only on a shared
    radius."""
    return 0.25 if dtype == jnp.float64 else 0.5
# per-rate cap used to size the static (unrolled) squaring ladders in the
# batched table build: ||L||_inf <= cap * (block width); softplus-bounded
# physical rates sit well under it
_PHI_RATE_CAP = 32.0


def _mm_lanes(x, y):
    """(w, w, B) @ (w, w, B) block matmul as w fused multiply-adds.

    Written as an explicit j-loop of elementwise broadcasts so XLA keeps the
    batch on the LANES: a ``dot_general`` over a (B, w, w) batch tile-pads
    every tiny matrix to (8, 128) (9.5x memory/bandwidth waste — measured
    OOM at pop 1024); this form's only padding is w -> 8 sublanes.
    """
    w = x.shape[0]
    acc = x[:, 0, None, :] * y[None, 0, :, :]
    for j in range(1, w):
        acc = acc + x[:, j, None, :] * y[None, j, :, :]
    return acc


def expm_taylor_batched(A: jnp.ndarray) -> jnp.ndarray:
    """Batched matrix exponential for LARGE batches of TINY matrices.

    Lane-layout scaling + Taylor-Horner + fixed masked squaring — no Pade
    denominator solve (batched LU serializes on TPU), no data-dependent
    control flow, no tile-padded batched matmuls. A: (B, w, w).
    """
    At = jnp.transpose(A, (1, 2, 0))                       # (w, w, B)
    norm = jnp.max(jnp.sum(jnp.abs(At), axis=1), axis=0)   # inf-norm, (B,)
    rad = _taylor_radius(A.dtype)
    s = jnp.maximum(0.0, jnp.ceil(jnp.log2(jnp.maximum(norm, 1e-30) / rad)))
    s = jnp.minimum(s, float(_MAX_SQUARINGS))
    At = At / (2.0 ** s)[None, None, :]

    w = A.shape[-1]
    eye = jnp.broadcast_to(jnp.eye(w, dtype=A.dtype)[:, :, None], At.shape)
    R = eye
    for k in range(_TAYLOR_TERMS, 0, -1):
        R = eye + _mm_lanes(At / k, R)

    def body(i, Rc):
        R2 = _mm_lanes(Rc, Rc)
        return jnp.where((i < s)[None, None, :], R2, Rc)

    R = jax.lax.fori_loop(0, _MAX_SQUARINGS, body, R)
    return jnp.transpose(R, (2, 0, 1))


def _phi_matrices(L, h, max_squarings: int = _MAX_SQUARINGS,
                  taylor_terms: int | None = None):
    """E = expm(Lh), Phi1 = h phi1(Lh), Phi2 = h^2 phi2(Lh), batched.

    Instead of a (3w, 3w) Van Loan augmentation (9x the flops/memory of the
    base block), the three matrices are built together by scaling + short
    Taylor series + the exact doubling identities

        E(2h)    = E(h)^2
        Phi1(2h) = (I + E(h)) Phi1(h)
        Phi2(2h) = (I + E(h)) Phi2(h) + h Phi1(h)

    (derived from Phi1 = int_0^h e^{Ls} ds, Phi2 = int_0^h e^{L(h-s)} s ds),
    all in the lane-resident layout. L: (B, w, w); h: (B,). No inversion of
    L anywhere, so singular/near-singular blocks are fine.
    """
    E, Phi1, Phi2 = _phi_matrices_lanes(jnp.transpose(L, (1, 2, 0)), h,
                                        max_squarings, taylor_terms)
    tr = lambda M: jnp.transpose(M, (2, 0, 1))
    return tr(E), tr(Phi1), tr(Phi2)


def _phi_matrices_lanes(L, h, max_squarings: int = _MAX_SQUARINGS,
                        taylor_terms: int | None = None,
                        dynamic: bool = False,
                        unroll: int | None = None):
    """Lane-layout core of :func:`_phi_matrices`: L, outputs (w, w, B).

    ``dynamic=True`` runs the squaring loop with a traced trip count (the
    batch-wide max of the per-block needs, usually 5-12 instead of the
    static worst case) — exact, but only legal outside ``vmap``.

    ``unroll=k`` PYTHON-unrolls the squaring loop to exactly k masked
    iterations. This is the fast path: a ``fori``/``while`` squaring loop
    materializes the 3-matrix carry through HBM every iteration (~10x the
    whole build's roofline), while the unrolled chain fuses into one
    kernel. The per-block squaring need is clamped to k, so k must be an
    upper bound for full accuracy (callers derive it from the static h and
    a rate cap).
    """
    w = L.shape[0]
    if taylor_terms is None:
        # after scaling ||A|| <= _taylor_radius(dtype): f32 runs 8 terms
        # at radius 0.5 (err 0.5^9/9! ~ 5.4e-9, past f32 eps), f64 runs
        # 12 terms at 0.25 (0.25^13/13! ~ 2.4e-17)
        taylor_terms = 12 if L.dtype == jnp.float64 else 8
    A = L * jnp.asarray(h)[None, None, :]             # Lh, (w, w, B)
    norm = jnp.max(jnp.sum(jnp.abs(A), axis=1), axis=0)
    rad = _taylor_radius(L.dtype)
    s = jnp.maximum(0.0, jnp.ceil(jnp.log2(jnp.maximum(norm, 1e-30) / rad)))
    s = jnp.minimum(s, float(unroll if unroll is not None else max_squarings))
    scale = 2.0 ** s
    A = A / scale[None, None, :]
    hs = jnp.asarray(h) / scale                       # (B,) scaled step

    eye = jnp.broadcast_to(jnp.eye(w, dtype=L.dtype)[:, :, None], A.shape)
    # E by Horner; phi1 = sum_k A^k/(k+1)!, phi2 = sum_k A^k/(k+2)! by the
    # plain series sharing the powers A^k/k! (||A|| <= the per-dtype
    # _taylor_radius after scaling, so the series reaches dtype accuracy).
    E = eye
    for k in range(taylor_terms, 0, -1):
        E = eye + _mm_lanes(A / k, E)
    term = eye
    F1 = eye
    F2 = eye / 2.0
    for k in range(1, taylor_terms + 1):
        term = _mm_lanes(term, A) / k                 # A^k / k!
        F1 = F1 + term / (k + 1)
        F2 = F2 + term / ((k + 1) * (k + 2))
    Phi1 = F1 * hs[None, None, :]
    Phi2 = F2 * (hs * hs)[None, None, :]

    def body(i, carry):
        Ec, P1c, P2c, hc = carry
        go = (i < s)[None, None, :]
        go_h = (i < s)
        P2n = P2c + _mm_lanes(Ec, P2c) + P1c * hc[None, None, :]
        P1n = P1c + _mm_lanes(Ec, P1c)
        En = _mm_lanes(Ec, Ec)
        return (jnp.where(go, En, Ec), jnp.where(go, P1n, P1c),
                jnp.where(go, P2n, P2c), jnp.where(go_h, 2 * hc, hc))

    if unroll is not None:
        carry = (E, Phi1, Phi2, hs)
        for i in range(unroll):
            carry = body(i, carry)
        E, Phi1, Phi2, _ = carry
    else:
        n_iter = (jnp.max(s).astype(jnp.int32) if dynamic
                  else max_squarings)
        E, Phi1, Phi2, _ = jax.lax.fori_loop(
            0, n_iter, body, (E, Phi1, Phi2, hs))
    return E, Phi1, Phi2


def _phi_vectors_lanes(L, h, taylor_terms: int | None = None,
                       max_squarings: int = _MAX_SQUARINGS,
                       unroll: int | None = None):
    """E = expm(Lh) plus ONLY column 0 of h*phi1(Lh) and h^2*phi2(Lh).

    The ETD2RK remainder g(y) lives in the R slot alone (synthesis term),
    so the phi matrices only ever multiply e_0 — the doubling identities
    then propagate VECTORS (1 matmul + 2 matvecs per squaring instead of
    3 matmuls), and the Taylor stage for the phis is w matvec passes.
    Layout: L (w, w, B); returns E (w, w, B), p1 (w, B), p2 (w, B).

    Default runs the squaring ladder with a traced trip count (legal
    outside vmap, NOT reverse-differentiable). ``unroll=k`` PYTHON-unrolls
    to exactly k masked iterations — same values when k upper-bounds the
    per-lane need — which reverse-mode AD requires (the gradient-polish
    path).
    """
    w = L.shape[0]
    if taylor_terms is None:
        taylor_terms = 12 if L.dtype == jnp.float64 else 8
    A = L * jnp.asarray(h)[None, None, :]
    norm = jnp.max(jnp.sum(jnp.abs(A), axis=1), axis=0)
    rad = _taylor_radius(L.dtype)
    s = jnp.maximum(0.0, jnp.ceil(jnp.log2(jnp.maximum(norm, 1e-30) / rad)))
    s = jnp.minimum(s, float(unroll if unroll is not None else max_squarings))
    scale = 2.0 ** s
    A = A / scale[None, None, :]
    hs = jnp.asarray(h) / scale

    mv = lambda M, v: jnp.sum(M * v[None, :, :], axis=1)   # (w,w,B)x(w,B)

    eye = jnp.broadcast_to(jnp.eye(w, dtype=L.dtype)[:, :, None], A.shape)
    E = eye
    for k in range(taylor_terms, 0, -1):
        E = eye + _mm_lanes(A / k, E)

    e0 = jnp.zeros((w, A.shape[-1]), L.dtype).at[0].set(1.0)
    term = e0                                    # A^k/k! e0
    v1 = e0                                      # sum term/(k+1)
    v2 = e0 / 2.0                                # sum term/((k+1)(k+2))
    for k in range(1, taylor_terms + 1):
        term = mv(A, term) / k
        v1 = v1 + term / (k + 1)
        v2 = v2 + term / ((k + 1) * (k + 2))
    p1 = v1 * hs[None, :]
    p2 = v2 * (hs * hs)[None, :]

    def body(i, carry):
        Ec, p1c, p2c, hc = carry
        go = (i < s)[None, :]
        p2n = p2c + mv(Ec, p2c) + p1c * hc[None, :]
        p1n = p1c + mv(Ec, p1c)
        En = _mm_lanes(Ec, Ec)
        return (jnp.where(go[None], En, Ec), jnp.where(go, p1n, p1c),
                jnp.where(go, p2n, p2c), jnp.where(i < s, 2 * hc, hc))

    if unroll is not None:
        carry = (E, p1, p2, hs)
        for i in range(unroll):
            carry = body(i, carry)
        E, p1, p2, _ = carry
    else:
        n_iter = jnp.max(s).astype(jnp.int32)
        E, p1, p2, _ = jax.lax.fori_loop(0, n_iter, body, (E, p1, p2, hs))
    return E, p1, p2


def _run_scan_megakernel(system, params_b, mega, E_u, Phi1_u, Phi2_u, u_h,
                         y0b, P, N, w, dtype):
    """Pack the lane layout and run the whole segment scan as ONE Pallas
    kernel (:func:`phoskintime_tpu.ops.scan_pallas.etd2rk_scan_pallas`).

    Lanes are member-major, protein-minor, protein axis padded to
    ``mega['Npad']`` so member blocks tile the lane axis exactly — the TF
    coupling then runs as static lane rotations inside the kernel. Tables
    arrive already in the padded layout (the caller pads L before the
    table build). Off-TPU the kernel runs in interpret mode (tests).
    """
    from phoskintime_tpu.ops.scan_pallas import etd2rk_scan_pallas

    rhs = system.rhs
    Np, T = mega["Npad"], mega["T"]
    u_h_j = jnp.asarray(u_h, dtype)
    # fold the static per-pair 1/h of the ETD2RK correction into the table
    p2h = Phi2_u / u_h_j[:, None, None]

    A = jnp.pad(jnp.asarray(params_b["A_i"], dtype),
                ((0, 0), (0, Np - N))).reshape(1, P * Np)
    ts = jnp.repeat(jnp.asarray(params_b["tf_scale"], dtype),
                    Np).reshape(1, P * Np)
    # kinase live-drive table: drv[b, lane(p, q)] = (Kmat[:, b] * c_k[p])
    # [driver_idx[q]] (reference jacspeedup driver_map semantics); lanes
    # whose protein is not driven are masked by dm inside the kernel
    Kt_all = params_b["c_k"][:, :, None] * rhs.Kmat[None]   # (P, K, NB)
    drv = Kt_all[:, jnp.asarray(mega["driver_idx"]), :]     # (P, Np, NB)
    drv = jnp.transpose(drv, (2, 0, 1)).reshape(-1, P * Np)

    Y0 = jnp.pad(y0b.reshape(P, N, w), ((0, 0), (0, Np - N), (0, 0)))
    y0l = jnp.transpose(Y0.reshape(P * Np, w), (1, 0))      # (w, P*Np)

    tile = lambda x: jnp.tile(jnp.asarray(x, dtype), (1, P))
    try:
        interpret = jax.devices()[0].platform not in ("tpu", "axon")
    except Exception:
        interpret = True
    ys_l = etd2rk_scan_pallas(
        E_u, Phi1_u, p2h, y0l, drv, A, ts, tile(mega["totw"]),
        tile(mega["dm"]), tile(mega["c1"]), tile(mega["c2"]),
        mega["uidx"], mega["jb"], mega["out_slot"],
        shifts=mega["shifts"], Npad=Np, T=T,
        init_slots=mega["init_slots"], interpret=interpret)
    ys = jnp.transpose(ys_l.reshape(T, w, P, Np)[..., :N],
                       (2, 0, 3, 1)).reshape(P, T, N * w)
    success = jnp.all(jnp.isfinite(ys), axis=(1, 2))
    return ys, success


def _obs_from_ys(system, ys):
    """(R, TOT, PHO) observables from a batched padded trajectory
    ys (P, T, N*w): a vmap of ``extract_observables`` over the population
    axis. Every return path of :func:`exponential_simulate_batched` funnels
    through this when ``return_observables=True`` (the trajectory is always
    materialized first)."""
    from phoskintime_tpu.network.simulate import extract_observables

    def one(Y):
        o = extract_observables(system, Y)
        return o.R, o.TOT, o.PHO

    return jax.vmap(one)(ys)


def exponential_simulate_batched(system, params_b, t_eval,
                                 substep: float = 16.0, y0=None,
                                 use_pallas: bool | None = None,
                                 differentiable: bool = False,
                                 width_bucketing: bool | None = None,
                                 use_scan_kernel: bool | None = None,
                                 use_kron: bool | None = None,
                                 return_observables: bool = False):
    """Natively-batched ETD2RK: params_b leaves carry a leading population
    axis P; returns (ys (P, T, d), success (P,)).

    This exists because composing ``jax.vmap`` over the per-candidate
    version leaves the tiny propagator matrices in a layout XLA handles
    poorly; here the (P x pairs x proteins) block batch is flattened into
    ONE lane-parallel expm call (0.3 ms for ~160k blocks on v5e), and the
    segment scan advances the whole population in lockstep.

    ``use_pallas=False`` forces the pure-XLA propagator-table build — the
    Pallas kernel has no VJP, so DIFFERENTIABLE consumers (the gradient
    polish stage) must take the XLA path. None = auto (Pallas on a single
    real TPU chip at f32). ``differentiable=True`` additionally replaces
    every traced-trip-count squaring ladder with a statically-unrolled
    masked one (identical values; reverse-mode AD requires static trips).

    ``width_bucketing``: None = auto (combinatorial mechanism at w >= 9
    with heterogeneous site counts, see the class-build block below);
    False forces the single full-width path; True lifts the auto
    thresholds (still a no-op when every protein shares one width).

    ``use_scan_kernel``: None = auto — on a single real TPU chip at f32
    the ENTIRE segment scan additionally runs as one Pallas megakernel
    (:mod:`phoskintime_tpu.ops.scan_pallas`) that keeps the state and all
    propagator tables VMEM-resident across every segment (the XLA scan
    re-reads its (bucket, h) table slab from HBM per segment — measured
    19% HBM-bandwidth utilization with the chip 99% busy). True forces it
    (interpret mode off-TPU, for tests); False keeps the XLA scan. The
    kernel silently falls back to the XLA scan when the problem is
    ineligible (model 4, width-bucketed model 2, t_eval slot collisions,
    TF matrix too dense, VMEM-infeasible tile).

    ``return_observables=True`` returns ``((R, TOT, PHO), success)``
    with R/TOT (P, T, N) and PHO (P, T, N, Smax) instead of the padded
    trajectory. This is a post-hoc ``vmap`` of ``extract_observables``
    on the materialized (P, T, N*w) trajectory — a convenience for
    callers that only consume observables, not a memory saving. Honored
    on every path (model 4, megakernel, width-bucketed, unbucketed);
    values match ``extract_observables`` on the returned trajectory
    exactly (pinned by ``tests/test_expo.py::TestReturnObservables``).
    """
    if differentiable:
        use_pallas = False
    topo = system.topo
    N, w = topo.N, topo.width
    P = jax.tree.leaves(params_b)[0].shape[0]
    if y0 is None:
        y0 = system.y0()
    dtype = system.rhs.W_pad.dtype
    params_b = jax.tree.map(lambda v: jnp.asarray(v, dtype), params_b)
    y0b = jnp.broadcast_to(jnp.asarray(y0, dtype).reshape(-1)[None],
                           (P, N * w))

    (seg_t0, seg_h, seg_jb, out_idx, seg_uidx, u_jb, u_h) = _segment_plan(
        tuple(np.asarray(system.kin_grid, float)),
        tuple(np.asarray(t_eval, float)), float(substep))

    if topo.model == 4:
        ys, success = _rosenbrock_simulate_batched(
            system, params_b, y0b, seg_t0, seg_h, seg_jb, out_idx, dtype,
            differentiable=differentiable)
        if return_observables:
            return _obs_from_ys(system, ys), success
        return ys, success

    # --- Kronecker-factorized combinatorial path (round 5): exact
    # per-site 2×2 propagator factors replace the O(w³·ladder) table
    # build; the −D·δ₀ mask-0 correction and the C·R translation move
    # into the explicit remainder g (see network/kron.py). OPT-IN ONLY:
    # the re-splitting that makes the factors exact puts the mask-0
    # decay under an RK2-style explicit stability bound h·D ≲ 2, which
    # the production segment plan (h up to 16) violates — measured
    # divergence at substep 4, exact parity at substep ≤ 0.5
    # (tests/test_kron.py). The full negative result — why no stable
    # O(1)-apply factorization of the corrected operator exists — is
    # documented in benchmarks/RESULTS_r5.md and network/kron.py.
    if topo.model == 2:
        if use_kron is None:
            use_kron = False
        if use_kron:
            from phoskintime_tpu.network.kron import kron_simulate_batched

            ys, success = kron_simulate_batched(
                system, params_b, y0b,
                (seg_t0, seg_h, seg_jb, out_idx, seg_uidx, u_jb, u_h),
                dtype)
            if return_observables:
                return _obs_from_ys(system, ys), success
            return ys, success

    bucket_uniq, bucket_inv = np.unique(u_jb, return_inverse=True)

    # --- linear operators per unique bucket, straight into LANE layout
    # (Bu, w, w, P*N): analytic closed form for the affine mechanisms
    # (~15x cheaper than jvp extraction), jvp fallback for model 2.
    def blocks_one(p):
        if topo.model in (0, 1):
            def per_bucket(jb):
                Kt = system.rhs.kinase_activity(p, jb)
                return system.rhs.linear_blocks(system.rhs.site_rates(Kt), p)
            return jax.vmap(per_bucket)(jnp.asarray(bucket_uniq))
        return _block_linear_operators(system, p, bucket_uniq, dtype)

    u_h_j = jnp.asarray(u_h, dtype)
    binv_j = jnp.asarray(bucket_inv)

    # one lane-parallel phi build per unique (bucket, h) pair. On TPU the
    # whole scaling+Taylor+doubling pipeline runs as a Pallas kernel that
    # keeps every intermediate in VMEM (ops/phi_pallas.py — the XLA
    # version round-trips the (w, w, PN) carry through HBM each Horner
    # term and ladder iteration, measured 32 ms of the 44 ms objective at
    # pop 2048). CPU/f64 falls back to the XLA path, sequential over the
    # ~14 pairs (a flat P*U*N batch OOMs at the 10k-candidate ensemble;
    # its ladder runs a traced trip count — the batch-wide actual need
    # instead of the static worst case).
    if use_pallas is None:
        use_pallas = _phi_pallas_ok(dtype)

    def build_tables(L_in, w_in, n_lanes):
        """Per-(bucket, h)-pair propagator tables at width ``w_in`` for
        ``L_in`` (Bu, w_in, w_in, n_lanes)."""
        if use_pallas:
            # ONE pallas_call for every (bucket, h) pair: the pair axis
            # is a grid dimension (scalar-prefetch bucket lookup), so
            # Mosaic compiles the ladder once instead of once per pair
            # (and, bucketed, once per pair PER CLASS — 482 s of
            # trace+compile at a 12-protein demo, measured)
            from phoskintime_tpu.ops.phi_pallas import (
                ladder_len, phi_vectors_pallas_all,
                phi_vectors_pallas_pages)

            lad = max(ladder_len(w_in, float(h)) for h in u_h)
            if w_in <= 8:
                # pages layout: matrix entries as leading-dim vreg pages
                # — no sublane shuffles (12.2 -> 5.0 ms at pop 2048,
                # honest slope timing, round 5). Statement count is
                # O(w^3 * ladder), so wide model-2 classes keep the
                # sublane-layout kernel.
                return phi_vectors_pallas_pages(
                    L_in, np.asarray(bucket_inv, np.int32),
                    np.asarray(u_h, np.float32), lad)
            return phi_vectors_pallas_all(
                L_in, np.asarray(bucket_inv, np.int32),
                np.asarray(u_h, np.float32), lad)
        if differentiable:
            # statically-unrolled masked ladder per pair (same contract
            # as the Pallas kernel's ladder_len sizing) — reverse-mode AD
            # cannot see a traced trip count
            from phoskintime_tpu.ops.phi_pallas import ladder_len

            Es, P1s, P2s = [], [], []
            for u in range(len(u_h)):
                h_u = float(u_h[u])
                E1, p11, p21 = _phi_vectors_lanes(
                    L_in[int(bucket_inv[u])],
                    jnp.broadcast_to(jnp.asarray(h_u, dtype), (n_lanes,)),
                    unroll=ladder_len(w_in, h_u))
                Es.append(E1)
                P1s.append(p11)
                P2s.append(p21)
            return jnp.stack(Es), jnp.stack(P1s), jnp.stack(P2s)

        def phis_one(args):
            slot, h_p = args
            return _phi_vectors_lanes(L_in[slot],
                                      jnp.broadcast_to(h_p, (n_lanes,)))

        return jax.lax.map(phis_one, (binv_j, u_h_j))

    # --- width bucketing (combinatorial mechanism): proteins with fewer
    # sites get narrower blocks. The padded rows/cols of every affine L
    # block are exactly zero (the masked RHS neither reads nor writes
    # padded state slots), so the top-left (w_i, w_i) corner propagates
    # exactly and the padded state stays 0. At model 2's global
    # w = 1 + 2^Smax the ladder matmul is cubic in width and the TABLES
    # are quadratic — most proteins are far narrower (w_i = 1 + 2^s_i),
    # so each width class gets its OWN tables at its own width, and the
    # scan step applies them class-resident (no padded global table is
    # ever materialized: at pop 2048 / N 40 / w 17 the padded table alone
    # is 13.3 GB; class-resident it is ~3-4x smaller and the ladder FLOPs
    # drop by the cube). Models 0/1 (w <= 2+Smax) skip bucketing — the
    # saving is small and splitting the lane batch into several narrow
    # kernel launches measured 3.8x SLOWER at model-0 demo shapes.
    # Reference cap semantics anchor:
    # /root/reference/global_model/steadystate.py:658-662.
    classes: list = []
    if width_bucketing is None:
        width_bucketing = topo.model == 2 and w >= 9
    if width_bucketing and topo.model == 2:
        ws_prot = 1 + 2 ** np.asarray(topo.n_sites)
        uniq_ws = sorted({int(v) for v in ws_prot})
        if len(uniq_ws) > 1:
            # greedy merge: accumulate ascending widths until the group
            # holds >= 5% of proteins; the group runs at its LARGEST
            # width (running a narrow protein at a wider class is exact)
            acc: list = []
            for wc in uniq_ws:
                acc.append(np.where(ws_prot == wc)[0])
                if (sum(len(a) for a in acc) / N >= 0.05
                        or wc == uniq_ws[-1]):
                    classes.append((wc, np.concatenate(acc)))
                    acc = []
        if len(classes) <= 1:
            classes = []

    if classes:
        # protein order is permuted ONCE so each width class is a
        # CONTIGUOUS protein range — every per-step class access below is
        # then a static slice. (The first cut gathered class lanes with
        # `yl[:, lidx]` inside the scan step: lane-axis gathers serialize
        # on TPU and measured ~200x slower than the unbucketed path.)
        prot_perm = np.concatenate([idx for _, idx in classes])
        poffs = np.cumsum([0] + [len(idx) for _, idx in classes])
        tables = []
        for wc, idx in classes:
            # narrow from the first probe: gathering class lanes out of
            # the FULL lane tensor instead forces XLA to re-materialize
            # it (w, w)-minor — tile padding blew that up 10.6x (13.7 GB
            # at pop 2048) before this per-class build existed
            Lc_pb = jax.vmap(lambda p, i=idx, wci=wc:
                             _block_linear_operators_class(
                                 system, p, bucket_uniq, dtype, i, wci)
                             )(params_b)                 # (P, Bu, Nc, wc, wc)
            Lc = jnp.transpose(Lc_pb, (1, 3, 4, 0, 2)).reshape(
                len(bucket_uniq), wc, wc, -1)            # (Bu, wc, wc, P*Nc)
            tables.append(build_tables(Lc, wc, P * len(idx)))
    else:
        if use_scan_kernel is None:
            # opt-in only: the round-4 decomposition profile (TPU v5e,
            # synchronous timing) measured the kernel pallas_call itself
            # at 24.9 ms @ pop 2048 / 91.2 ms @ 8192 — the XLA scan
            # residual it replaces is ~3 ms @ 2048 (already at its HBM
            # table-traffic roofline). The round-3 "0.65 ms" figure was
            # an async-dispatch artifact. The kernel remains available
            # for experimentation (True) and correctness-tested in
            # interpret mode, but is not a production win at these
            # shapes.
            use_scan_kernel = False
        mega = None
        if use_scan_kernel and not differentiable:
            from phoskintime_tpu.ops.scan_pallas import prepare_scan_plan

            mega = prepare_scan_plan(system.rhs, seg_jb, seg_uidx, u_h,
                                     out_idx, len(out_idx))
        # megakernel lane layout pads the protein axis to a multiple of 8
        # (member blocks must tile the lane axis); padded blocks are zero
        # -> E = I, p1 = h e0, and the padded state stays exactly 0
        Np = N if mega is None else mega["Npad"]
        # lane layout: batch (P*N) on the minor (lane) axis — a
        # (..., w, w) trailing layout tile-pads every tiny matrix to
        # (8, 128), a ~20x memory/bandwidth tax measured on the gathers
        # in the segment scan. Models 0/1 assemble the blocks directly
        # as lane planes (:func:`_linear_blocks_lanes`); the jvp
        # fallback (model 2 unbucketed) pays the big transpose.
        if topo.model in (0, 1):
            L_lanes = _linear_blocks_lanes(system, params_b, bucket_uniq,
                                           dtype, Np)
        else:
            L_pb = jax.vmap(blocks_one)(params_b)        # (P, Bu, N, w, w)
            if Np != N:
                L_pb = jnp.pad(L_pb, ((0, 0), (0, 0), (0, Np - N),
                                      (0, 0), (0, 0)))
            L_lanes = jnp.transpose(L_pb, (1, 3, 4, 0, 2)).reshape(
                len(bucket_uniq), w, w, P * Np)          # (Bu, w, w, PNp)
        E_u, Phi1_u, Phi2_u = build_tables(L_lanes, w, P * Np)
        if mega is not None:
            ys, success = _run_scan_megakernel(system, params_b, mega, E_u,
                                               Phi1_u, Phi2_u, u_h, y0b,
                                               P, N, w, dtype)
            if return_observables:
                return _obs_from_ys(system, ys), success
            return ys, success
    # unbucketed: E_u (U, w, w, PN); Phi*_u (U, w, PN); scan-step lookup
    # is a contiguous leading-axis slice. bucketed: per-class narrow
    # tables in ``tables`` aligned with ``classes``/``lane_idx_c``.

    t0s = jnp.asarray(seg_t0, dtype)
    hs = jnp.asarray(seg_h, dtype)
    jbs = jnp.asarray(seg_jb)
    uidxs = jnp.asarray(seg_uidx)

    # lane batched matvec: (w, w, B) x (w, B) -> (w, B)
    bmv_l = lambda M, v: jnp.sum(M * v[None, :, :], axis=1)

    def to_lanes(Y):                                     # (P, N, w) -> (w, PN)
        return jnp.transpose(Y.reshape(P * N, w), (1, 0))

    def from_lanes(yl):                                  # (w, PN) -> (P, N, w)
        return jnp.transpose(yl, (1, 0)).reshape(P, N, w)

    # lane-native synthesis: the scan state lives as (w, P*N) lane
    # planes with member-major lanes, so the total-protein sum is a
    # masked reduction over slot planes and the (PN,) -> (P, N) view
    # for the TF matvec is a FREE reshape — the earlier from_lanes
    # round-trip was two (w, PN) <-> (PN, w) relayouts per segment
    # (~0.6 GB of pure transpose traffic over the 133-segment plan).
    rhs_m = system.rhs
    if topo.model == 2:
        stm_lane = jnp.tile(jnp.transpose(rhs_m.state_mask), (1, P))
    else:
        msk_lane = jnp.tile(jnp.transpose(rhs_m.site_mask), (1, P))
    drv_lane = jnp.tile(rhs_m.driven, P)
    didx_j = rhs_m.driver_idx
    A_b = params_b["A_i"]                            # (P, N)
    ts_b = params_b["tf_scale"][:, None]             # (P, 1)
    ck_b = params_b["c_k"]                           # (P, K)

    def synth_of(yl, jb):
        """g(y) = rhs(y) - L y collapses to the synthesis drive in the R
        slot for the affine mechanisms — computed directly instead of
        evaluating the full RHS and subtracting the L-matvec."""
        if topo.model == 2:
            tot = jnp.sum(yl[1:] * stm_lane, axis=0)            # (PN,)
        else:
            tot = yl[1] + jnp.sum(yl[2:] * msk_lane, axis=0)    # (PN,)
        jbc = jnp.clip(jb, 0, rhs_m.Kmat.shape[1] - 1)
        Kt = rhs_m.Kmat[:, jbc][None, :] * ck_b                 # (P, K)
        Pv = jnp.where(drv_lane, Kt[:, didx_j].reshape(-1), tot)
        v = (Pv.reshape(P, N) @ rhs_m.tf_mat.T) / rhs_m.tf_deg[None]
        u = v / (1.0 + jnp.abs(v))
        return synthesis_rate(A_b, ts_b, u).reshape(P * N)

    if classes:
        # synthesis computed DIRECTLY on class-permuted topology tensors
        # (permuted once here, at trace time) — the scan step never
        # touches the original protein order, so there are no per-step
        # gathers at all. Bucketing is model-2 only, so only the
        # combinatorial total-protein form is needed.
        rhs_m = system.rhs
        pp_j = jnp.asarray(prot_perm)
        tfm_p = rhs_m.tf_mat[pp_j][:, pp_j]
        tfd_p = rhs_m.tf_deg[pp_j]
        driven_p = rhs_m.driven[pp_j]
        didx_p = rhs_m.driver_idx[pp_j]
        stm_p = rhs_m.state_mask[pp_j]                   # (N, Mmax)
        A_p = params_b["A_i"][:, pp_j]                   # (P, N)
        ck_b = params_b["c_k"]                           # (P, K)
        ts_b = params_b["tf_scale"]                      # (P,)

        spans = [(int(poffs[ci]), len(idx), wc)
                 for ci, (wc, idx) in enumerate(classes)]
        # per-class per-lane state masks (constant): stm_c tiled p-major
        # so the total-protein sum runs directly on the 2D lane layout
        stm_lane = [jnp.tile(stm_p[off:off + nc, :wc - 1], (P, 1))
                    for off, nc, wc in spans]            # [(P*nc, wc-1)]

        def synth_perm(yls, jb):
            """(P, N) synthesis drive from per-class lane states
            yls = [(wc, P*nc)] (class-permuted protein order)."""
            tots = [jnp.einsum("ml,lm->l", yc[1:], sm).reshape(P, nc)
                    for yc, sm, (off, nc, wc)
                    in zip(yls, stm_lane, spans)]
            tot = jnp.concatenate(tots, axis=1)          # (P, N) permuted
            jbc = jnp.clip(jb, 0, rhs_m.Kmat.shape[1] - 1)
            Kt = rhs_m.Kmat[:, jbc][None, :] * ck_b      # (P, K)
            Pv = jnp.where(driven_p[None, :], Kt[:, didx_p], tot)
            v = (Pv @ tfm_p.T) / tfd_p[None, :]
            u = v / (1.0 + jnp.abs(v))
            return synthesis_rate(A_p, ts_b[:, None], u)

        def step(yls, seg):
            # carry is a per-class pytree — no packed full-width buffer
            # ever exists inside the scan (a first cut packed classes
            # into one (w, P, N) array: the per-step partial-tile
            # dynamic-update-slices on the 45-wide minor axis tripled
            # the scan time, 46 -> 166 ms/run at pop 2048)
            t0, h, jb, uidx = seg
            s_n = synth_perm(yls, jb)                    # (P, N)
            a = []
            for yc, (off, nc, wc), (Ec, P1c, _) in zip(yls, spans, tables):
                snc = s_n[:, off:off + nc].reshape(P * nc)
                a.append(bmv_l(Ec[uidx], yc) + P1c[uidx] * snc[None, :])
            s_a = synth_perm(a, jb)
            d = s_a - s_n
            y_new = [
                ac + (P2c[uidx] / h)
                * d[:, off:off + nc].reshape(P * nc)[None, :]
                for ac, (off, nc, wc), (_, _, P2c)
                in zip(a, spans, tables)]
            return y_new, y_new

        Y0p = y0b.reshape(P, N, w)[:, pp_j, :]           # (P, N, w)
        yl0 = [jnp.transpose(Y0p[:, off:off + nc, :wc]
                             .reshape(P * nc, wc), (1, 0))
               for off, nc, wc in spans]                 # [(wc, P*nc)]
        _, ys_seg = jax.lax.scan(step, yl0, (t0s, hs, jbs, uidxs))
        # assemble the full-width padded trajectory ONCE outside the scan
        inv = np.argsort(prot_perm)
        T = len(out_idx)
        oidx = jnp.asarray(out_idx) + 1
        parts = []
        for y0c, ysc, (off, nc, wc) in zip(yl0, ys_seg, spans):
            all_c = jnp.concatenate([y0c[None], ysc], axis=0)  # (S+1,wc,PN_c)
            sel_c = all_c[oidx]                                # (T, wc, PN_c)
            pad = jnp.zeros((T, w - wc, P * nc), sel_c.dtype)
            full = jnp.concatenate([sel_c, pad], axis=1)       # (T, w, PN_c)
            parts.append(jnp.transpose(full, (2, 0, 1))
                         .reshape(P, nc, T, w))
        ys_p = jnp.concatenate(parts, axis=1)                  # (P, N, T, w)
        ys = jnp.transpose(ys_p[:, inv], (0, 2, 1, 3)).reshape(
            P, T, N * w)
        success = jnp.all(jnp.isfinite(ys), axis=(1, 2))
        if return_observables:
            return _obs_from_ys(system, ys), success
        return ys, success

    # run-structured scan: one lax.scan PER RUN of equal-(bucket, h)
    # segments, with the table row, bucket and step all STATIC. vs the
    # flat scan over (t0s, hs, jbs, uidxs) this (a) removes the per-step
    # dynamic table gather, (b) hoists the kinase-activity lookup per
    # run, (c) stops materializing per-segment states (runs end exactly
    # at t_eval points, see :func:`_run_plan`) — honest slope-timed
    # measurement: 10.5 -> ~3 ms of the pop-2048 objective (round 5).
    runs, out_pos = _run_plan(seg_uidx, out_idx)
    yl = to_lanes(y0b.reshape(P, N, w))
    states = [yl]
    for start, n in runs:
        uidx = int(seg_uidx[start])
        jb = int(seg_jb[start])
        h = float(seg_h[start])
        Es, P1 = E_u[uidx], Phi1_u[uidx]
        P2h = Phi2_u[uidx] * (1.0 / h)

        def step(yl, _, Es=Es, P1=P1, P2h=P2h, jb=jb):
            s_n = synth_of(yl, jb)
            a = bmv_l(Es, yl) + P1 * s_n[None, :]
            s_a = synth_of(a, jb)
            y_new = a + P2h * (s_a - s_n)[None, :]
            return y_new, None

        if n == 1:
            yl = step(yl, None)[0]
        else:
            yl, _ = jax.lax.scan(step, yl, None, length=n)
        states.append(yl)
    ys_all = jnp.stack(states)                              # (R+1, w, PN)
    sel = ys_all[jnp.asarray(out_pos)]                      # (T, w, PN)
    ys = jnp.transpose(sel.reshape(len(out_idx), w, P, N),
                       (2, 0, 3, 1)).reshape(P, len(out_idx), N * w)
    success = jnp.all(jnp.isfinite(ys), axis=(1, 2))
    if return_observables:
        return _obs_from_ys(system, ys), success
    return ys, success


def _chunk_plan(seg_t0, seg_h, seg_jb, out_idx, chunk: int = 8):
    """Group consecutive equal-(h, bucket) contiguous segments into chunks
    of at most ``chunk`` substeps. The model-4 path freezes the Jacobian
    (and hence the phi matrices) per CHUNK instead of per segment — the
    phi build is the dominant per-segment cost, and within a chunk every
    substep shares (L, h), so one build serves up to ``chunk`` steps.

    Returns (c_t0, c_h, c_jb, c_n) chunk arrays plus ``out_pad``: the
    t_eval -> padded (chunk*chunk_len) flat state index map (-1 = y0).
    """
    S = len(seg_t0)
    chunks_t0, chunks_h, chunks_jb, chunks_n = [], [], [], []
    chunk_of = np.zeros(S, np.int64)
    sub_of = np.zeros(S, np.int64)
    i = 0
    while i < S:
        j = i + 1
        while (j < S and j - i < chunk and seg_jb[j] == seg_jb[i]
               and seg_h[j] == seg_h[i]
               and abs(seg_t0[j] - (seg_t0[j - 1] + seg_h[j - 1])) < 1e-9):
            j += 1
        c = len(chunks_t0)
        chunks_t0.append(seg_t0[i])
        chunks_h.append(seg_h[i])
        chunks_jb.append(seg_jb[i])
        chunks_n.append(j - i)
        chunk_of[i:j] = c
        sub_of[i:j] = np.arange(j - i)
        i = j
    pad_idx = chunk_of * chunk + sub_of
    out_pad = np.where(np.asarray(out_idx) < 0, -1,
                       pad_idx[np.maximum(out_idx, 0)])
    return (np.asarray(chunks_t0), np.asarray(chunks_h),
            np.asarray(chunks_jb, np.int32), np.asarray(chunks_n, np.int32),
            out_pad.astype(np.int64))


def _rosenbrock_simulate_batched(system, params_b, y0b, seg_t0, seg_h,
                                 seg_jb, out_idx, dtype, chunk: int = 8,
                                 differentiable: bool = False):
    """Model-4 path: exponential Rosenbrock (exprb2 with the ETD2RK internal
    stage). No static phi table exists because L depends on the state
    through the Michaelis-Menten saturations — instead the block Jacobian
    is refreshed at every CHUNK entry (a run of <= ``chunk`` equal-h
    segments inside one kinase bucket) and the phi matrices built in-scan
    once per chunk. The remainder g(y) = rhs(y) - L y is evaluated exactly
    at every substep, so freezing L only moves linearization error into
    the ETD2RK-corrected g term (measured ~2e-3 relative vs tight RK45 at
    demo scale, same order as the per-segment refresh)."""
    topo = system.topo
    N, w = topo.N, topo.width
    P = y0b.shape[0]

    c_t0, c_h, c_jb, c_n, out_pad = _chunk_plan(seg_t0, seg_h, seg_jb,
                                                out_idx, chunk)
    t0s = jnp.asarray(c_t0, dtype)
    hs = jnp.asarray(c_h, dtype)
    jbs = jnp.asarray(c_jb)
    n_valid = jnp.asarray(c_n)

    # lane layout throughout (batch on the minor axis — see the affine
    # path above for the measured ~20x layout tax of (..., w, w) trailing)
    bmv_l = lambda M, v: jnp.sum(M * v[None, :, :], axis=1)

    def to_lanes(Y):                                     # (P, N, w) -> (w, PN)
        return jnp.transpose(Y.reshape(P * N, w), (1, 0))

    def from_lanes(yl):
        return jnp.transpose(yl, (1, 0)).reshape(P, N, w)

    def g_of(t, yl, jb, L):
        Yb = from_lanes(yl)
        r = jax.vmap(lambda yy, pp: system.rhs(t, yy.reshape(-1), jb, pp)
                     )(Yb, params_b).reshape(P, N, w)
        return to_lanes(r) - bmv_l(L, yl)

    def jac_one(Y, pp, jb):
        Kt = system.rhs.kinase_activity(pp, jb)
        S = system.rhs.site_rates(Kt)
        return system.rhs.jac_blocks_saturating(Y, S, pp)

    def chunk_step(yl, seg):
        t0, h, jb, nv = seg
        Y = from_lanes(yl)
        L_pn = jax.vmap(jac_one, in_axes=(0, 0, None))(Y, params_b, jb)
        L = jnp.transpose(L_pn.reshape(P * N, w, w), (1, 2, 0))
        Es, P1, P2 = _phi_matrices_lanes(L, jnp.broadcast_to(h, (P * N,)),
                                         dynamic=not differentiable)

        def sub(yc, k):
            t = t0 + k.astype(dtype) * h
            g_n = g_of(t, yc, jb, L)
            a = bmv_l(Es, yc) + bmv_l(P1, g_n)
            g_a = g_of(t + h, a, jb, L)
            y_new = a + bmv_l(P2 / h, g_a - g_n)
            y_new = jnp.where(k < nv, y_new, yc)   # padded tail: no-op
            return y_new, y_new

        y_out, ys_c = jax.lax.scan(sub, yl, jnp.arange(chunk))
        return y_out, ys_c                          # (chunk, w, PN)

    yl0 = to_lanes(y0b.reshape(P, N, w))
    _, ys_chunks = jax.lax.scan(chunk_step, yl0, (t0s, hs, jbs, n_valid))
    ys_flat = ys_chunks.reshape(len(c_t0) * chunk, w, P * N)
    ys_all = jnp.concatenate([yl0[None], ys_flat], axis=0)
    sel = ys_all[jnp.asarray(out_pad) + 1]
    ys = jnp.transpose(sel.reshape(len(out_pad), w, P, N),
                       (2, 0, 3, 1)).reshape(P, len(out_pad), N * w)
    success = jnp.all(jnp.isfinite(ys), axis=(1, 2))
    return ys, success


def exponential_simulate(system, params, t_eval, substep: float = 16.0,
                         y0=None) -> ODEResult:
    """Integrate the padded system over ``t_eval`` with bucketed ETD2RK
    (exponential Rosenbrock for model 4)."""
    topo = system.topo
    if topo.model == 4:
        params_b = jax.tree.map(lambda v: jnp.asarray(v)[None], params)
        ys, success = exponential_simulate_batched(system, params_b, t_eval,
                                                   substep=substep, y0=y0)
        S = ys.shape[1]
        return ODEResult(ys[0], success[0], jnp.asarray(S, jnp.int32),
                         jnp.asarray(S, jnp.int32))
    N, w = topo.N, topo.width
    if y0 is None:
        y0 = system.y0()
    dtype = system.rhs.W_pad.dtype
    params = jax.tree.map(lambda v: jnp.asarray(v, dtype), params)
    y0 = jnp.asarray(y0, dtype).reshape(-1)
    t_eval_j = jnp.asarray(t_eval, dtype)

    (seg_t0, seg_h, seg_jb, out_idx, seg_uidx, u_jb, u_h) = _segment_plan(
        tuple(np.asarray(system.kin_grid, float)),
        tuple(np.asarray(t_eval, float)), float(substep))
    S = len(seg_t0)

    # linear operators per unique bucket
    bucket_uniq, bucket_inv = np.unique(u_jb, return_inverse=True)
    L_bucket = _block_linear_operators(system, params, bucket_uniq, dtype)

    # propagator tables per unique (bucket, h) pair, sequentially to bound
    # the footprint of the tile-padded tiny matrices
    u_L = L_bucket[jnp.asarray(bucket_inv)]            # (U, N, w, w)
    u_h_j = jnp.asarray(u_h, dtype)

    def phis_one(args):
        L_u, h_u = args
        return _phi_matrices(L_u, jnp.broadcast_to(h_u, (N,)))

    E_u, Phi1_u, Phi2_u = jax.lax.map(phis_one, (u_L, u_h_j))  # (U, N, w, w)

    t0s = jnp.asarray(seg_t0, dtype)
    hs = jnp.asarray(seg_h, dtype)
    jbs = jnp.asarray(seg_jb)
    uidxs = jnp.asarray(seg_uidx)
    seg_bucket_slot = jnp.asarray(bucket_inv)[uidxs]   # segment -> L table row

    bmv = lambda M, v: jnp.einsum("nij,nj->ni", M, v)

    def g_of(t, Y, jb, L):
        r = system.rhs(t, Y.reshape(-1), jb, params).reshape(N, w)
        return r - bmv(L, Y)

    def step(y, seg):
        t0, h, jb, uidx, bslot = seg
        Es, P1, P2 = E_u[uidx], Phi1_u[uidx], Phi2_u[uidx]
        L = L_bucket[bslot]
        Y = y.reshape(N, w)
        g_n = g_of(t0, Y, jb, L)
        a = bmv(Es, Y) + bmv(P1, g_n)
        g_a = g_of(t0 + h, a, jb, L)
        Y_new = a + bmv(P2 / h, g_a - g_n)
        y_new = Y_new.reshape(-1)
        return y_new, y_new

    _, ys_seg = jax.lax.scan(step, y0, (t0s, hs, jbs, uidxs, seg_bucket_slot))

    ys_all = jnp.concatenate([y0[None], ys_seg], axis=0)  # index -1 -> slot 0
    ys = ys_all[jnp.asarray(out_idx) + 1]
    success = jnp.all(jnp.isfinite(ys))
    return ODEResult(ys, success, jnp.asarray(S, jnp.int32),
                     jnp.asarray(S, jnp.int32))
