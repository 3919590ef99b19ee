"""Gradient polish of global-fit solutions (exact reverse-mode descent).

The single biggest TPU-native advantage over the reference: the ENTIRE
objective — softplus unpack -> bucketed ETD2RK network integration ->
robust 3-modality loss + prior penalty — is differentiable end-to-end, so
candidate solutions can be sharpened with exact gradients. The reference's
only post-search sharpening tool is bound-zoom refinement
(``global_model/refine.py:32-357``), which re-SAMPLES inside shrunken
boxes; this DESCENDS.

Design:

* the scalarized loss per member is ``F(theta) . w`` with per-member
  weight vectors ``w`` on the 3-objective simplex — polishing a Pareto
  set keeps its spread by scalarizing each member along its own
  (normalized-objective) direction;
* bounded Adam in RAW (softplus) space, box projection by clipping to
  [xl, xu] after every step, with the best-so-far iterate tracked per
  member (Adam is not monotone);
* the whole multistep polish of one chunk is ONE jitted XLA program
  (``lax.scan`` over steps; each step = forward + reverse sweep of the
  full network integration), vmapped/batched over the member axis exactly
  like the GA's population evaluation;
* the propagator-table build runs the statically-unrolled XLA ladder
  (``differentiable=True``) — the Pallas table kernel has no VJP.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def simplex_weights(F: np.ndarray, floor: float = 0.05) -> np.ndarray:
    """Per-member scalarization weights from a population's objectives.

    Each member is weighted INVERSELY to its normalized objective values
    (a member strong on objective j keeps pushing j), floored so no
    objective is ever ignored. Rows sum to 1."""
    F = np.asarray(F, float)
    lo, hi = F.min(axis=0), F.max(axis=0)
    Fn = (F - lo) / np.maximum(hi - lo, 1e-12)
    w = 1.0 / (Fn + 0.25)
    w = np.maximum(w / w.sum(axis=1, keepdims=True), floor)
    return w / w.sum(axis=1, keepdims=True)


def polish_solutions(system, slices, loss_data, defaults, lambdas, time_grid,
                     thetas, xl, xu, *, weights=None, steps: int = 150,
                     lr: float = 0.02, loss_mode: int = 0, y0=None,
                     chunk: int = 128, seed: int = 0,
                     adam_b1: float = 0.9, adam_b2: float = 0.999,
                     mesh=None):
    """Polish a set of raw-space solutions with bounded Adam.

    Args:
      thetas: (P, n) raw decision vectors (e.g. a Pareto set).
      weights: (P, 3) scalarization weights; None -> uniform (the
        best-by-sum criterion the selection/exports use).
      steps: Adam steps; lr decays cosine to 10%.
      chunk: members per compiled program (bounds the reverse-sweep
        memory; chunks share one compilation). Must be a multiple of
        the mesh size when ``mesh`` is given.
      mesh: optional ``jax.sharding.Mesh`` with a "pop" axis — shards
        the member axis of each chunk across devices (the polish is
        embarrassingly parallel over members, like the GA population).

    Returns (thetas_polished (P, n), F_polished (P, 3)) — each member's
    best-scoring iterate (never worse than its input under its own
    scalarization, measured by the same objective).
    """
    from phoskintime_tpu.network.objective import make_population_objective

    thetas = np.asarray(thetas, float)
    P, n = thetas.shape
    if weights is None:
        weights = np.full((P, 3), 1.0 / 3.0)
    weights = np.asarray(weights, float)
    xl_j = jnp.asarray(xl, jnp.float32)
    xu_j = jnp.asarray(xu, jnp.float32)

    objective = make_population_objective(
        system, slices, loss_data, defaults, lambdas, time_grid,
        loss_mode=loss_mode, y0=y0, differentiable=True)

    def scalar_total(X, W):
        s = jnp.sum(objective(X) * W, axis=1)  # per-member scores (aux)
        return jnp.sum(s), s

    grad_fn = jax.value_and_grad(scalar_total, has_aux=True)

    def polish_chunk(X0, W):
        # each step costs ONE forward+reverse sweep: the gradient pass's
        # aux scores the INCOMING iterate (scoring the updated X with a
        # second forward would make every step forward+reverse+forward)
        def adam_step(carry, i):
            X, m, v, bestX, bestS = carry
            (_, score), g = grad_fn(X, W)
            score = score.astype(bestS.dtype)  # keep the scan carry stable
            better = score < bestS
            bestX = jnp.where(better[:, None], X, bestX)
            bestS = jnp.where(better, score, bestS)
            # cosine decay to 10% of lr
            lr_i = lr * (0.55 + 0.45 * jnp.cos(jnp.pi * i / steps))
            m = adam_b1 * m + (1 - adam_b1) * g
            v = adam_b2 * v + (1 - adam_b2) * g * g
            t = i.astype(X.dtype) + 1.0
            mh = m / (1 - adam_b1 ** t)
            vh = v / (1 - adam_b2 ** t)
            X = X - lr_i * mh / (jnp.sqrt(vh) + 1e-8)
            X = jnp.clip(X, xl_j, xu_j)
            return (X, m, v, bestX, bestS), None

        s_inf = jnp.full((X0.shape[0],), jnp.inf, X0.dtype)
        init = (X0, jnp.zeros_like(X0), jnp.zeros_like(X0), X0, s_inf)
        (Xf, _, _, bestX, bestS), _ = jax.lax.scan(
            adam_step, init, jnp.arange(steps))
        # the loop scores iterates one step behind — score the final one
        sF = jnp.sum(objective(Xf) * W, axis=1).astype(bestS.dtype)
        better = sF < bestS
        bestX = jnp.where(better[:, None], Xf, bestX)
        bestS = jnp.where(better, sF, bestS)
        return bestX, bestS

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as Pspec

        n_dev = int(np.prod(list(mesh.shape.values())))
        if chunk % n_dev:
            raise ValueError(
                f"polish: chunk ({chunk}) must be a multiple of the mesh "
                f"size ({n_dev})")
        if P < chunk:  # single padded chunk: only pad to mesh multiple
            chunk = -(-P // n_dev) * n_dev
        mat = NamedSharding(mesh, Pspec("pop", None))
        row = NamedSharding(mesh, Pspec("pop"))
        polish_jit = jax.jit(polish_chunk, in_shardings=(mat, mat),
                             out_shardings=(mat, row))
    else:
        polish_jit = jax.jit(polish_chunk)

    out_X = np.empty_like(thetas, dtype=np.float32)
    for c0 in range(0, P, chunk):
        c1 = min(P, c0 + chunk)
        Xc = thetas[c0:c1].astype(np.float32)
        Wc = weights[c0:c1].astype(np.float32)
        if c1 - c0 < chunk and (P > chunk or mesh is not None):
            # pad to the compiled chunk shape (repeat last row)
            padn = chunk - (c1 - c0)
            Xc = np.vstack([Xc, np.repeat(Xc[-1:], padn, axis=0)])
            Wc = np.vstack([Wc, np.repeat(Wc[-1:], padn, axis=0)])
        bX, _ = polish_jit(jnp.asarray(Xc), jnp.asarray(Wc))
        out_X[c0:c1] = np.asarray(bX)[: c1 - c0]

    # final objectives through the PRODUCTION objective (Pallas path ok)
    prod_obj = make_population_objective(
        system, slices, loss_data, defaults, lambdas, time_grid,
        loss_mode=loss_mode, y0=y0)
    F_out = np.asarray(jax.jit(prod_obj)(jnp.asarray(out_X, jnp.float32)),
                       float)
    return out_X.astype(float), F_out


def gradient_multistart(system, slices, loss_data, defaults, lambdas,
                        time_grid, xl, xu, *, pop: int = 256,
                        steps: int = 300, lr: float = 0.03,
                        loss_mode: int = 0, y0=None, seed: int = 42,
                        chunk: int = 128, mesh=None):
    """Pure gradient-based multistart global fit (no evolutionary search).

    LHS-samples ``pop`` raw starts, assigns each a Das-Dennis simplex
    direction as its scalarization, and runs the bounded-Adam polish.
    Returns (X (pop, n), F (pop, 3)) — feed to non-dominated sorting for a
    Pareto set. This mode has no reference counterpart (the reference
    cannot differentiate through LSODA); it exists because the TPU rebuild
    can.
    """
    from phoskintime_tpu.ops.nsga import das_dennis, lhs_sampling

    rng = np.random.default_rng(seed)
    X0 = lhs_sampling(pop, np.asarray(xl, float), np.asarray(xu, float), rng)
    dirs = das_dennis(3, 12)
    W = dirs[rng.integers(0, len(dirs), pop)]
    W = np.maximum(W, 0.05)
    W = W / W.sum(axis=1, keepdims=True)
    return polish_solutions(system, slices, loss_data, defaults, lambdas,
                            time_grid, X0, xl, xu, weights=W, steps=steps,
                            lr=lr, loss_mode=loss_mode, y0=y0, chunk=chunk,
                            seed=seed, mesh=mesh)


def lm_refine(system, slices, loss_data, defaults, lambdas, time_grid,
              theta, xl, xu, *, iters: int = 15, cg_iters: int = 25,
              mu0: float = 1e-2, y0=None, logger=None):
    """Levenberg-Marquardt refinement of ONE solution on the exact
    residual vector (matrix-free Gauss-Newton, conjugate-gradient inner
    solves).

    The squared-loss objective is a genuine least-squares problem
    (:func:`phoskintime_tpu.network.objective.make_residual_fn`), so
    near an optimum a damped Gauss-Newton step converges far faster than
    first-order descent: each LM iteration solves
    ``(J^T J + mu I) d = -J^T r`` with CG where every matvec is one
    jvp + vjp sweep of the full network integration — the Jacobian is
    never materialized (n_var can be ~1e3, M ~1e4).

    Classic damping: accept lowers mu x0.3, reject raises x4. The
    iterate is box-projected onto [xl, xu] after every step. Returns
    (theta_refined, sse) — never worse than the input.

    No reference counterpart at all (LSODA exposes no J^T J structure);
    anchor for intent: the reference's bound-zoom refinement
    ``global_model/refine.py:32-357``.
    """
    from phoskintime_tpu.network.objective import make_residual_fn

    residuals = make_residual_fn(system, slices, loss_data, defaults,
                                 lambdas, time_grid, y0=y0)
    xl_j = jnp.asarray(xl, jnp.float32)
    xu_j = jnp.asarray(xu, jnp.float32)

    @jax.jit
    def sse(th):
        r = residuals(th)
        return jnp.sum(r * r)

    @jax.jit
    def lm_step(th, mu):
        r, vjp_fn = jax.vjp(residuals, th)
        g = vjp_fn(r)[0]                      # J^T r

        def matvec(p):
            _, Jp = jax.jvp(residuals, (th,), (p,))
            return vjp_fn(Jp)[0] + mu * p     # (J^T J + mu I) p

        def cg_body(carry, _):
            d, res, p, rs = carry
            Ap = matvec(p)
            alpha = rs / jnp.maximum(jnp.dot(p, Ap), 1e-30)
            d = d + alpha * p
            res = res - alpha * Ap
            rs_new = jnp.dot(res, res)
            p = res + (rs_new / jnp.maximum(rs, 1e-30)) * p
            return (d, res, p, rs_new), None

        d0 = jnp.zeros_like(th)
        (d, *_), _ = jax.lax.scan(cg_body, (d0, -g, -g, jnp.dot(g, g)),
                                  None, length=cg_iters)
        trial = jnp.clip(th + d, xl_j, xu_j)
        return trial, jnp.sum(residuals(trial) ** 2)

    th = jnp.asarray(np.asarray(theta), jnp.float32)
    best = float(sse(th))
    mu = mu0
    for it in range(iters):
        trial, cost_t = lm_step(th, jnp.asarray(mu, jnp.float32))
        cost_t = float(cost_t)
        if np.isfinite(cost_t) and cost_t < best:
            th, best = trial, cost_t
            mu = max(mu * 0.3, 1e-8)
        else:
            mu = min(mu * 4.0, 1e6)
        if logger is not None:
            logger.info(f"[LM] iter {it}: sse={best:.6g} mu={mu:.2e}")
    return np.asarray(th, float), best
