"""Benchmark: batched full-network stiff ODE objective evaluations on TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Metric: global-model objective evaluations per second (one evaluation =
softplus unpack -> full-network stiff integration over the union grid
(bucketed ETD2RK exponential integrator, the production fit path) ->
3-modality robust loss) at population batch 8192 on a 40-protein synthetic
network mirroring the reference's data scale.

Baseline: the reference evaluates candidates with SciPy LSODA + Numba-style
ragged RHS, one process per candidate on 80 CPU cores
(``config.toml:278``, ``global_model/runner.py:643-648``). The single-core
SciPy rate for the SAME network/equations is PINNED (measured once on an
idle machine; live measurement swung vs_baseline 2,702x -> 1,779x between
identical builds purely with CPU load) and scaled by 80;
vs_baseline = tpu_rate / (80 * SCIPY_1CORE_EVALS_PER_S). The live rate is
still measured and emitted as ``scipy_live_evals_per_s`` so drift stays
visible without contaminating the headline ratio.

Timing methodology (round 5): ``jax.block_until_ready`` is NOT a reliable
completion barrier on this tunneled platform — it returned in 0.1 ms for a
program whose true device time was 462 ms (verified by forcing a
device->host copy; see benchmarks/vpu_peak.py). Every timing here chains K
data-dependent calls inside ONE jit, reduces to a scalar, forces a host
fetch, and reports the SLOPE between two K arms — which both guarantees
completion and cancels the fixed dispatch/tunnel overhead (~25 ms). The
overhead itself is emitted as ``dispatch_overhead_ms`` (single-call
fetch-timed wall minus the slope).

Roofline fields (round 5 — closes the "96% of device time is in neither
roofline" gap):
  ``vpu_peak_tflops``  — measured f32 VPU peak of THIS chip
                         (benchmarks/vpu_peak.py; 6.8 TF on v5e =
                         88% of the 8x128x4x2 @940 MHz theoretical).
  ``profile_decomp``   — slope-timed stage cut at pop 2048:
                         phi table build (Pallas pages kernel) and the
                         ETD2RK segment scan, each with its own roofline:
                         * vpu_util_phi: plan-bound table-build FLOPs /
                           time / VPU peak (upper bound on useful work —
                           the in-kernel ladder skip can do less);
                         * hbm_util_scan: the scan's model traffic
                           (per-segment table re-reads + state planes) /
                           time / 819 GB/s.
  ``mfu``/``hbm_bw_util`` — XLA cost-analysis based, kept for cross-round
                         continuity; NOTE cost_analysis does not see
                         inside pallas_call, so mfu undercounts.
"""

import json
import time

import numpy as np

POP = 8192  # throughput peak on v5e (pop-scaling sweep in RESULTS_r2)
N_PROTEINS = 40
N_KINASES = 12

# Pinned single-core SciPy LSODA rate for THIS bench problem (evals/s).
# Provenance: median of 5 runs of scipy_single_core_rate() on this
# environment's host, idle, 2026-08-17 (round 3): samples
# [0.311, 0.291, 0.253, 0.276, 0.338] -> median 0.291; recorded in
# benchmarks/RESULTS_r3.md. Re-pin only with an idle-machine median and
# update the provenance line.
SCIPY_1CORE_EVALS_PER_S = 0.291

# v5e single-chip peak (dense bf16 MXU FLOP/s). f32 jnp matmuls lower to
# bf16-rate MXU passes at default precision, so this is the honest roof.
V5E_PEAK_FLOPS = 197e12
# v5e single-chip HBM bandwidth (B/s).
V5E_HBM_BW = 819e9
# Measured f32 VPU peak of this chip (benchmarks/vpu_peak.py, slope-timed
# non-reducible FMA map, 2 independent chains at (8, 2048) blocks,
# 2026-08-20). Theoretical: 8 sublanes x 128 lanes x 4 ALUs x 2 flops
# @ 940 MHz = 7.7 TF; measured 88% of it. Re-pin from vpu_peak.py output.
V5E_VPU_PEAK_F32 = 6.8e12


def _slope_time(make_scalar, x, Ks=(1, 4), n=3):
    """Per-call device seconds of ``make_scalar(x) -> scalar``: chain K
    data-dependent calls in one jit, force scalar host fetch, slope over
    the two K arms (cancels dispatch; guarantees completion)."""
    import jax
    import jax.numpy as jnp

    outs = {}
    for K in Ks:
        @jax.jit
        def chained(t, K=K):
            def body(i, acc):
                return acc + make_scalar(t, acc * 1e-20)
            return jax.lax.fori_loop(0, K, body, jnp.zeros((), jnp.float32))
        # the axon tunnel's remote_compile endpoint occasionally drops the
        # connection mid-body (INTERNAL: response body closed...); the
        # compile is stateless, so retry the warming call a few times
        # before letting the bench die
        for attempt in range(3):
            try:
                r = chained(x)
                break
            except Exception:
                if attempt == 2:
                    raise
                time.sleep(5.0)
        _ = float(r)
        ts = []
        for _i in range(n):
            t0 = time.perf_counter()
            r = chained(x)
            _ = float(r)
            ts.append(time.perf_counter() - t0)
        outs[K] = float(np.median(ts))
    return ((outs[Ks[1]] - outs[Ks[0]]) / (Ks[1] - Ks[0]),
            outs[Ks[0]])  # (slope s/call, single-chain wall)


def tpu_rate():
    import jax
    import jax.numpy as jnp

    # persistent compile cache (parity with the reference's Numba disk
    # caches); the throughput loop is warmed up either way
    try:
        from phoskintime_tpu.parallel.profile import enable_compilation_cache

        enable_compilation_cache()
    except Exception:
        pass

    from phoskintime_tpu.demo import build_demo_network
    from phoskintime_tpu.network.objective import make_population_objective

    b = build_demo_network(n_proteins=N_PROTEINS, n_kinases=N_KINASES,
                           seed=0, dtype=np.float32)
    # pop_chunk=2048: the working set scales with ODE lanes (P*N); four
    # chunks at the 2048 rate beat one 8192 program (round-4 finding,
    # revalidated with honest slope timing round 5: 121k chunked vs 85k
    # unchunked at pop 8192).
    objective = make_population_objective(
        b["system"], b["slices"], b["loss_data"], b["defaults"],
        b["lambdas"], b["grid"], pop_chunk=2048)
    rng = np.random.default_rng(0)
    thetas = jnp.asarray(
        b["theta0"][None] + 0.05 * rng.normal(size=(POP, len(b["theta0"]))),
        jnp.float32)

    f = jax.jit(objective)
    F = f(thetas)
    jax.block_until_ready(F)  # compile + warmup
    assert bool(jnp.all(jnp.isfinite(F))), "non-finite objectives"

    # FLOPs per call as XLA counts them (for the MFU field; does not see
    # inside pallas_call)
    try:
        ca = f.lower(thetas).compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        flops_per_call = float(ca.get("flops", 0.0))
        bytes_per_call = float(ca.get("bytes accessed", 0.0))
    except Exception:
        flops_per_call = 0.0
        bytes_per_call = 0.0

    def obj_scalar(t, eps):
        return objective(t + eps)[0, 0]

    t_call, t_single = _slope_time(obj_scalar, thetas, Ks=(1, 4))
    rate = POP / t_call

    extras = {
        "mfu": round(flops_per_call * rate / POP / V5E_PEAK_FLOPS, 6),
        "hbm_bw_util": round(bytes_per_call * rate / POP / V5E_HBM_BW, 4),
        "dispatch_overhead_ms": round((t_single - t_call) * 1e3, 1),
        "flops_per_eval": round(flops_per_call / POP),
        "bytes_per_eval": round(bytes_per_call / POP),
        "vpu_peak_tflops": V5E_VPU_PEAK_F32 / 1e12,
    }
    return rate, b, extras


def stage_decomp(b, pop=2048):
    """Slope-timed stage cut of the objective at ``pop``, with per-stage
    roofline utilizations (the two stages are ~85% of device time)."""
    import jax
    import jax.numpy as jnp

    from phoskintime_tpu.network import expo as X
    from phoskintime_tpu.network.params import unpack_params
    from phoskintime_tpu.ops.phi_pallas import (_TAYLOR_TERMS, ladder_len,
                                                phi_vectors_pallas_pages)

    system = b["system"]
    topo = system.topo
    N, w = topo.N, topo.width
    dtype = jnp.float32
    (seg_t0, seg_h, seg_jb, out_idx, seg_uidx, u_jb, u_h) = X._segment_plan(
        tuple(np.asarray(system.kin_grid, float)),
        tuple(np.asarray(b["grid"], float)), 16.0)
    bucket_uniq, bucket_inv = np.unique(u_jb, return_inverse=True)
    lad = max(ladder_len(w, float(h)) for h in u_h)
    U, S = len(u_h), len(seg_t0)
    lanes = pop * N

    rng = np.random.default_rng(0)
    thetas = jnp.asarray(b["theta0"][None] + 0.05 * rng.normal(
        size=(pop, len(b["theta0"]))), jnp.float32)
    params_b = jax.jit(jax.vmap(
        lambda t: unpack_params(t, b["slices"], topo)))(thetas)
    Ll = jax.jit(lambda pb: X._linear_blocks_lanes(
        system, pb, bucket_uniq, dtype, N))(params_b)
    binv32 = np.asarray(bucket_inv, np.int32)
    h32 = np.asarray(u_h, np.float32)

    # --- phi table build (Pallas pages kernel) ---
    def phi_scalar(L, eps):
        E, p1, p2 = phi_vectors_pallas_pages(L + eps, binv32, h32, lad)
        return E.sum() + p1.sum() + p2.sum()

    t_phi, _ = _slope_time(phi_scalar, Ll, Ks=(1, 5))
    # plan-bound FLOP model of the build (per lane): Horner E + Taylor
    # phi vectors + setup, plus the doubling ladder at each pair's
    # plan-bound length (the runtime tile-max skip can execute less, so
    # this utilization is an upper bound on useful work).
    horner = _TAYLOR_TERMS * (2 * w ** 3 + w ** 2)
    taylor = (_TAYLOR_TERMS - 1) * (2 * w ** 2 + 4 * w)
    setup = 3 * w ** 2 + 6 * w
    lad_sum = sum(ladder_len(w, float(h)) for h in u_h)
    phi_flops = lanes * (U * (horner + taylor + setup)
                         + lad_sum * (2 * w ** 3 + 5 * w ** 2 + 2 * w))
    vpu_util_phi = phi_flops / t_phi / V5E_VPU_PEAK_F32

    # --- ETD2RK segment scan (tables prebuilt) ---
    E_u, Phi1_u, Phi2_u = jax.jit(lambda L: phi_vectors_pallas_pages(
        L, binv32, h32, lad))(Ll)
    y0b = jnp.broadcast_to(
        jnp.asarray(system.y0(), dtype).reshape(-1)[None], (pop, N * w))
    runs, out_pos = X._run_plan(seg_uidx, out_idx)
    rhs_m = system.rhs
    msk_lane = jnp.tile(jnp.transpose(rhs_m.site_mask), (1, pop))
    drv_lane = jnp.tile(rhs_m.driven, pop)
    A_b = params_b["A_i"]
    ts_b = params_b["tf_scale"][:, None]
    ck_b = params_b["c_k"]
    bmv_l = lambda M, v: jnp.sum(M * v[None, :, :], axis=1)

    from phoskintime_tpu.network.rhs import synthesis_rate

    def synth_of(yl, jb):
        tot = yl[1] + jnp.sum(yl[2:] * msk_lane, axis=0)
        Kt = rhs_m.Kmat[:, jb][None, :] * ck_b
        Pv = jnp.where(drv_lane, Kt[:, rhs_m.driver_idx].reshape(-1), tot)
        v = (Pv.reshape(pop, N) @ rhs_m.tf_mat.T) / rhs_m.tf_deg[None]
        u = v / (1.0 + jnp.abs(v))
        return synthesis_rate(A_b, ts_b, u).reshape(pop * N)

    def scan_scalar(y0x, eps):
        yl = jnp.transpose((y0x + eps).reshape(pop * N, w), (1, 0))
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
                return a + P2h * (s_a - s_n)[None, :], None

            if n == 1:
                yl = step(yl, None)[0]
            else:
                yl, _ = jax.lax.scan(step, yl, None, length=n)
            states.append(yl)
        return jnp.stack(states).sum()

    t_scan, _ = _slope_time(scan_scalar, y0b, Ks=(1, 5))
    # traffic model per segment: table re-read (E w^2 + p1/p2 2w lanes)
    # + ~4 state-plane reads/writes + synth intermediates
    bytes_per_seg = ((w * w + 2 * w) + 4 * w + 4) * lanes * 4
    hbm_util_scan = bytes_per_seg * S / t_scan / V5E_HBM_BW

    from phoskintime_tpu.network.objective import make_population_objective

    obj = make_population_objective(
        b["system"], b["slices"], b["loss_data"], b["defaults"],
        b["lambdas"], b["grid"], pop_chunk=None)
    t_obj, _ = _slope_time(lambda t, eps: obj(t + eps)[0, 0], thetas,
                           Ks=(1, 4))

    return {
        "pop": pop,
        "objective_ms": round(t_obj * 1e3, 2),
        "phi_build_ms": round(t_phi * 1e3, 2),
        "scan_ms": round(t_scan * 1e3, 2),
        "vpu_util_phi": round(vpu_util_phi, 3),
        "hbm_util_scan": round(hbm_util_scan, 3),
        "phi_flops_planbound": int(phi_flops),
        "scan_bytes_model": int(bytes_per_seg * S),
    }


def scipy_single_core_rate(b):
    """Reference-style LSODA evaluation of the same network (ragged loops)."""
    from scipy.integrate import odeint

    topo = b["system"].topo
    Kmat = np.asarray(b["system"].Kmat, float)
    grid = np.asarray(b["system"].kin_grid, float)
    p = {k: np.asarray(v, float) for k, v in b["true"].items()}
    times = np.asarray(b["grid"], float)
    Y0 = b["system"].y0().astype(float)
    N, width = Y0.shape
    msk = topo.site_mask()

    def rhs_flat(y, t):
        Y = y.reshape(N, width)
        jb = min(max(int(np.searchsorted(grid, t, side="right") - 1), 0),
                 Kmat.shape[1] - 1)
        Kt = Kmat[:, jb] * p["c_k"]
        S = np.einsum("nsk,k->ns", topo.W_pad, Kt)
        P_vec = Y[:, 1] + (Y[:, 2:] * msk).sum(axis=1)
        drv = topo.driver_map >= 0
        P_vec[drv] = Kt[topo.driver_map[drv]]
        v = (topo.tf_mat @ P_vec) / topo.tf_deg
        u = v / (1 + np.abs(v))
        act = p["A_i"] * (1 + (p["tf_scale"] * u) / (1 + u + 1e-6))
        rep = p["A_i"] / (1 + p["tf_scale"] * np.abs(u))
        synth = np.where(u >= 0, act, rep)
        dY = np.zeros_like(Y)
        dY[:, 0] = synth - p["B_i"] * Y[:, 0]
        sites = Y[:, 2:] * msk
        Sm = S * msk
        dY[:, 2:] = (Sm * Y[:, 1:2]
                     - (p["E_i"][:, None] + p["Dp_i"] + p["D_i"][:, None]) * sites) * msk
        dY[:, 1] = (p["C_i"] * Y[:, 0] - (p["D_i"] + Sm.sum(1)) * Y[:, 1]
                    + p["E_i"] * sites.sum(1))
        return dY.reshape(-1)

    n_solves = 3
    t0 = time.perf_counter()
    for _ in range(n_solves):
        Y_lsoda = odeint(rhs_flat, Y0.reshape(-1), times, rtol=1e-5,
                         atol=1e-7, mxstep=5000)
    dt = time.perf_counter() - t0
    # separate TIGHT solve for the accuracy gate: at rtol 1e-5 most of
    # the measured "gate" was the oracle's own discretization error
    # (4.4e-3 loose vs 3.5e-4 tight, identical ETD2RK output, round 4)
    Y_tight = odeint(rhs_flat, Y0.reshape(-1), times, rtol=1e-7,
                     atol=1e-9, mxstep=20000)
    return n_solves / dt, Y_tight


def accuracy_vs_lsoda(b, Y_lsoda):
    """Accuracy gate: production ETD2RK fold-changes vs the LSODA oracle.

    Guards against buying throughput with accuracy as substep/grading are
    tuned: max relative error over every observable fold-change (mRNA,
    total protein, per-site phospho) at the true parameters, ETD2RK at the
    production substep + production dtype vs SciPy LSODA (f64, rtol 1e-7
    tight oracle — see scipy_single_core_rate).
    """
    import jax.numpy as jnp

    from phoskintime_tpu.network.expo import exponential_simulate_batched
    from phoskintime_tpu.network.simulate import (extract_observables,
                                                  fold_changes)

    system = b["system"]
    times = np.asarray(b["grid"], float)
    # the BATCHED path (P=1) — the exact code the throughput metric runs,
    # including the Pallas propagator-table kernel on TPU.
    p_b = {k: jnp.asarray(v, jnp.float32)[None] for k, v in b["true"].items()}
    ys, success = exponential_simulate_batched(system, p_b, times)
    assert bool(success[0]), "ETD2RK reported failure at true params"
    ys0 = ys[0]

    msk = np.asarray(system.topo.site_mask(), bool)

    def fcs(Y_flat):
        obs = extract_observables(system, jnp.asarray(Y_flat))
        fc_r, fc_p, fc_pho = fold_changes(obs, jnp.asarray(times))
        return (np.asarray(fc_r, float), np.asarray(fc_p, float),
                np.asarray(fc_pho, float)[:, msk])

    errs = [np.max(np.abs(a - o) / np.maximum(np.abs(o), 1e-6))
            for a, o in zip(fcs(ys0), fcs(Y_lsoda))]
    return float(max(errs))


def northstar_10k_ensemble():
    """North-star arm (BASELINE.md): full-network fit, 10k-member
    ensemble, ENTIRE generation loop on device (variation + evaluation +
    column-shardable ranking + batched water-filling NSGA-III niching).

    100-generation budget (1M full-network objective evaluations at
    reference parameter scale, n_var ~1.1k); the baseline comparison is
    ONE reference fit (pop 300 x 1000 gens = 3e5 LSODA solves on the
    80-core pool at the pinned SciPy rate). Reference anchors:
    ``config.toml:296-297``, ``global_model/runner.py:663-702``.
    """
    from phoskintime_tpu.demo import build_demo_network
    from phoskintime_tpu.network.optimize import run_global_fit

    b10 = build_demo_network(n_proteins=150, n_kinases=24, seed=1,
                             dtype=np.float32)
    t0 = time.perf_counter()
    res = run_global_fit(b10["system"], b10["slices"], b10["loss_data"],
                         b10["defaults"], b10["lambdas"], b10["grid"],
                         b10["xl"], b10["xu"], pop=10_000, n_gen=100,
                         seed=0, ftol=0.0, ftol_period=10_000,
                         n_max_evals=None, frechet_pick=False,
                         gens_per_dispatch=10)
    wall = time.perf_counter() - t0
    gens = len(res.history)
    ref_one_fit_s = 3e5 / (80.0 * SCIPY_1CORE_EVALS_PER_S)
    return {
        "wall_s": round(wall, 1),
        "gens": gens,
        "pop": 10_000,
        "evals_per_s": round(res.n_evals / wall, 1),
        "ideal": [round(float(v), 4) for v in res.F.min(axis=0)],
        # the north-star clause: 10k-member ensemble fit in less
        # wall-clock than ONE reference multi-start fit on 80 CPU cores
        "vs_one_ref_fit": round(ref_one_fit_s / wall, 1),
    }


def pallas_device_gate():
    """Compile-and-run BOTH production Pallas phi kernels on the real
    device at tiny shapes (the test suite runs them interpret-mode on
    CPU only, which cannot catch Mosaic lowering rejections — e.g. of
    the value-carrying lax.cond in the squaring-ladder runtime skip).
    Returns {"pages_ok": bool, "all_ok": bool}; a False here means the
    corresponding production route would crash, so main() asserts."""
    import jax.numpy as jnp

    from phoskintime_tpu.ops.phi_pallas import (ladder_len,
                                                phi_vectors_pallas_all,
                                                phi_vectors_pallas_pages)

    rng = np.random.default_rng(0)
    out = {}
    for name, w, fn in [("pages_ok", 6, phi_vectors_pallas_pages),
                        ("all_ok", 17, phi_vectors_pallas_all)]:
        L = rng.normal(0, 0.3, (2, w, w, 1024)).astype(np.float32)
        for i in range(w):
            L[:, i, i, :] = -rng.uniform(0.05, 8.0, (2, 1024))
        h_u = np.asarray([0.5, 16.0], np.float32)
        lad = max(ladder_len(w, float(h)) for h in h_u)
        try:
            E, p1, p2 = fn(jnp.asarray(L),
                           np.asarray([0, 1], np.int32), h_u, lad)
            out[name] = bool(jnp.all(jnp.isfinite(E))
                             and jnp.all(jnp.isfinite(p1))
                             and jnp.all(jnp.isfinite(p2)))
        except Exception:
            out[name] = False
    return out


def main():
    rate, b, extras = tpu_rate()
    gate = pallas_device_gate()
    assert all(gate.values()), f"Pallas device gate failed: {gate}"
    extras["pallas_device_gate"] = gate
    decomp = stage_decomp(b)
    cpu_rate, Y_lsoda = scipy_single_core_rate(b)
    acc = accuracy_vs_lsoda(b, Y_lsoda)
    ns10k = northstar_10k_ensemble()
    # round-4 gate: 1e-3 against a TIGHT oracle (rtol 1e-7); measured
    # 3.5e-4 on TPU f32 — VERDICT r3 item 4 closed
    assert acc < 1e-3, f"ETD2RK drifted from the LSODA oracle: {acc:.2e}"
    baseline = 80.0 * SCIPY_1CORE_EVALS_PER_S  # reference: 80-core pool
    print(json.dumps({
        "metric": "global_model_objective_evals_per_s",
        "value": round(rate, 2),
        "unit": "evals/s (pop=8192, N=40 proteins, ETD2RK + 3-mod loss, "
                "slope-timed)",
        "vs_baseline": round(rate / baseline, 3),
        "accuracy_rel_err": round(acc, 6),
        "scipy_live_evals_per_s": round(cpu_rate, 4),
        "northstar_10k_ensemble": ns10k,
        "profile_decomp": decomp,
        **extras,
    }))


if __name__ == "__main__":
    main()
