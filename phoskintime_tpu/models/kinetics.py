"""Per-gene kinetic models (distributive / successive / random).

Behavioral spec: reference ``models/distmod.py``, ``models/succmod.py``,
``models/randmod.py``. All three per-gene systems are *linear*
time-invariant ODEs ``dy/dt = M(theta) y + b(theta)``; instead of
re-integrating with LSODA for every optimizer iterate (the reference's
hottest loop, ``paramest/normest.py:403-423``), we assemble (M, b) from the
parameter vector with static scatter indices and solve **exactly** with
batched matrix exponentials (:mod:`phoskintime_tpu.ops.linear`). The whole
multistart x weights x lambda grid becomes one vmapped XLA program.

State layouts (matching the reference):

* distributive / successive: ``y = [R, P, P_1..P_n]``
* random (combinatorial):    ``y = [R, P, X_1..X_m]``, ``m = 2^n - 1``,
  where ``X_s`` is the bitmask-s phospho state (bit j <=> site j occupied).

Parameter layouts:

* dist/succ: ``[A, B, C, D, S_1..S_n, Dd_1..Dd_n]`` (4 + 2n)
* random:    ``[A, B, C, D, S_1..S_n, Ddeg_1..Ddeg_m]`` (4 + n + 2^n - 1)

Fit-vector contract (reference ``distmod.py:125-134`` / ``randmod.py:289-305``):
``concat(R[OFFSET:], P, sites.T.flatten())`` with OFFSET = 5 dropping the
early mRNA points; for the random model "sites" are the first ``n`` states
in bitmask order (the reference slices ``sol[:, 2:2+n]`` — for n >= 3 this
includes multi-phospho masks; we reproduce that contract exactly).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from phoskintime_tpu.ops.linear import solve_lti

OFFSET = 5  # early mRNA timepoints dropped from the fit vector


# ---------------------------------------------------------------------------
# system matrix builders
# ---------------------------------------------------------------------------

def system_matrices_dist(params: jnp.ndarray, n_sites: int):
    """Distributive: sites are independent (reference distmod.py:6-65).

    dR   = A - B R
    dP   = C R - (D + sum S) P + sum P_i
    dP_i = S_i P - (1 + Dd_i) P_i
    """
    n = n_sites
    d = 2 + n
    A, B, C, D = params[0], params[1], params[2], params[3]
    S = params[4:4 + n]
    Dd = params[4 + n:4 + 2 * n]

    M = jnp.zeros((d, d), dtype=params.dtype)
    M = M.at[0, 0].set(-B)
    M = M.at[1, 0].set(C)
    M = M.at[1, 1].set(-(D + jnp.sum(S)))
    if n > 0:
        M = M.at[1, 2:].set(1.0)
        idx = jnp.arange(n)
        M = M.at[2 + idx, 1].set(S)
        M = M.at[2 + idx, 2 + idx].set(-(1.0 + Dd))
    b = jnp.zeros((d,), dtype=params.dtype).at[0].set(A)
    return M, b


def system_matrices_succ(params: jnp.ndarray, n_sites: int):
    """Successive chain P -> P_1 -> ... -> P_n with unit dephospho feedback
    (reference succmod.py:8-90)."""
    n = n_sites
    d = 2 + n
    A, B, C, D = params[0], params[1], params[2], params[3]
    S = params[4:4 + n]
    Dd = params[4 + n:4 + 2 * n]

    M = jnp.zeros((d, d), dtype=params.dtype)
    M = M.at[0, 0].set(-B)
    M = M.at[1, 0].set(C)
    if n == 0:
        M = M.at[1, 1].set(-D)
    else:
        M = M.at[1, 1].set(-(D + S[0]))
        M = M.at[1, 2].set(1.0)  # dephospho feedback from P_1 (rate 1)
        if n == 1:
            M = M.at[2, 1].set(S[0])
            M = M.at[2, 2].set(-(1.0 + Dd[0]))
        else:
            # first site P_1
            M = M.at[2, 1].set(S[0])
            M = M.at[2, 2].set(-(1.0 + S[1] + Dd[0]))
            M = M.at[2, 3].set(1.0)
            # middle sites P_{j+1}, j = 1..n-2
            for j in range(1, n - 1):
                M = M.at[2 + j, 1 + j].set(S[j])
                M = M.at[2 + j, 2 + j].set(-(1.0 + S[j + 1] + Dd[j]))
                M = M.at[2 + j, 3 + j].set(1.0)
            # last site P_n
            j = n - 1
            M = M.at[2 + j, 1 + j].set(S[j])
            M = M.at[2 + j, 2 + j].set(-(1.0 + Dd[j]))
    b = jnp.zeros((d,), dtype=params.dtype).at[0].set(A)
    return M, b


@lru_cache(maxsize=None)
def _random_transition_tables(n: int):
    """Static transition index tables for the bitmask hypercube
    (spec: reference randmod.py:8-85).

    Each table entry contributes ``sign * rate`` to ``M[row, col]`` where
    ``rate = S[site]`` for phospho transitions (site >= 0) and ``1.0`` for
    dephospho transitions (site == -1).
    """
    m = (1 << n) - 1
    rows, cols, sites, signs = [], [], [], []

    def st(s):  # state s (bitmask, 1..m) -> y index
        return 2 + s - 1

    def add(row, col, site, sign):
        rows.append(row); cols.append(col); sites.append(site); signs.append(sign)

    for j in range(n):  # mono-phosphorylation P -> X_{1<<j} at rate S_j
        add(st(1 << j), 1, j, +1.0)
        add(1, 1, j, -1.0)

    for s in range(1, m + 1):
        for j in range(n):
            bit = 1 << j
            if s & bit:
                # dephospho s -> s ^ bit at unit rate
                to = s ^ bit
                add(st(to) if to else 1, st(s), -1, +1.0)
                add(st(s), st(s), -1, -1.0)
            else:
                # phospho s -> s | bit at rate S_j
                add(st(s | bit), st(s), j, +1.0)
                add(st(s), st(s), j, -1.0)

    return (np.asarray(rows, np.int32), np.asarray(cols, np.int32),
            np.asarray(sites, np.int32), np.asarray(signs, np.float64), m)


def system_matrices_rand(params: jnp.ndarray, n_sites: int):
    """Random (combinatorial) model over all 2^n - 1 phospho bitmask states
    (reference randmod.py:121-247)."""
    n = n_sites
    rows, cols, sites, signs, m = _random_transition_tables(n)
    d = 2 + m
    A, B, C, D = params[0], params[1], params[2], params[3]
    S = params[4:4 + n]
    Ddeg = params[4 + n:4 + n + m]

    # rate per table entry: S[site] for phospho, 1.0 for dephospho (site = -1)
    S_ext = jnp.concatenate([S, jnp.ones((1,), params.dtype)])
    gather = jnp.where(sites >= 0, sites, n)
    vals = jnp.asarray(signs, params.dtype) * S_ext[gather]

    M = jnp.zeros((d, d), dtype=params.dtype)
    M = M.at[rows, cols].add(vals)
    M = M.at[0, 0].add(-B)
    M = M.at[1, 0].add(C)
    M = M.at[1, 1].add(-D)
    idx = jnp.arange(m)
    M = M.at[2 + idx, 2 + idx].add(-Ddeg)  # per-state degradation
    b = jnp.zeros((d,), dtype=params.dtype).at[0].set(A)
    return M, b


_BUILDERS = {
    "distmod": system_matrices_dist,
    "succmod": system_matrices_succ,
    "randmod": system_matrices_rand,
}


def n_params(model: str, n_sites: int) -> int:
    if model == "randmod":
        return 4 + n_sites + (1 << n_sites) - 1
    return 4 + 2 * n_sites


def state_dim(model: str, n_sites: int) -> int:
    if model == "randmod":
        return 2 + (1 << n_sites) - 1
    return 2 + n_sites


# ---------------------------------------------------------------------------
# solve
# ---------------------------------------------------------------------------

def solve_ode(params: jnp.ndarray, init_cond: jnp.ndarray, n_sites: int,
              t: jnp.ndarray, model: str = "distmod",
              normalize: bool = False):
    """Solve one per-gene system exactly; return (sol, fit_vector).

    Matches the reference contract (``models/distmod.py:93-134``):
    solution clipped >= 0, optional normalization by y0, fit vector
    ``[R[5:], P, sites.T.flat]``.
    """
    builder = _BUILDERS[model]
    M, b = builder(params, n_sites)
    sol = solve_lti(M, b, init_cond, t)
    sol = jnp.clip(sol, 0.0, None)
    if normalize:
        sol = sol / init_cond[None, :]
    fit = fit_vector(sol, n_sites)
    return sol, fit


def fit_vector(sol: jnp.ndarray, n_sites: int) -> jnp.ndarray:
    """[R after OFFSET, P over all t, first n_sites phospho columns
    site-major] — the reference's target alignment."""
    R = sol[OFFSET:, 0]
    P = sol[:, 1]
    sites = sol[:, 2:2 + n_sites].T.reshape(-1)
    return jnp.concatenate([R, P, sites])


def solve_ode_batched(params_batch: jnp.ndarray, init_cond: jnp.ndarray,
                      n_sites: int, t: jnp.ndarray, model: str = "distmod",
                      normalize: bool = False):
    """vmap of :func:`solve_ode` over a leading batch of parameter vectors."""
    return jax.vmap(
        lambda p: solve_ode(p, init_cond, n_sites, t, model, normalize)
    )(params_batch)


# ---------------------------------------------------------------------------
# steady-state initial conditions
# ---------------------------------------------------------------------------

def initial_condition(n_sites: int, model: str = "distmod",
                      dtype=jnp.float64) -> jnp.ndarray:
    """Steady state with ALL rate parameters set to 1.

    The reference solves dy/dt = 0 with an SLSQP equality-constrained
    root-find (``steady/initdist.py:9-50`` etc.); since the systems are
    linear this is exactly ``y* = -M^{-1} b``, computed directly.

    Note: the reference's random-model variant enumerates states in
    (cardinality, lexicographic) order while its ODE uses bitmask order; at
    params = 1 the steady state depends only on the bit count, so the two
    orderings carry identical values — we use bitmask order throughout.
    """
    npar = n_params(model, n_sites)
    params = jnp.ones((npar,), dtype=dtype)
    M, b = _BUILDERS[model](params, n_sites)
    y = jnp.linalg.solve(M, -b)
    return jnp.maximum(y, 1e-12)
