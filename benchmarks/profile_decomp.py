"""Device-time decomposition of the flagship population objective.

VERDICT r3 item 1: the chip is 98.8% busy at 0.018% MFU / 18.9% HBM —
~80% of device time is in neither roofline. This script cuts the
objective at its stage boundaries and times each piece on the real TPU,
for the XLA-scan path and the Pallas megakernel path, at pop 2048/8192.

Each stage is jitted separately (cutting forces materialization at the
boundary, so the sum of stages slightly over-counts fusion wins — the
point is the RANKING, and end-to-end arms are timed unfused too).

Writes one JSON line per measurement; run on TPU:
    python benchmarks/profile_decomp.py [pops...]
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def emit(name, ms, extra=None):
    out = {"stage": name, "ms": float(f"{ms * 1e3:.5g}")}
    if extra:
        out.update(extra)
    print(json.dumps(out), flush=True)


def timeit(f, *args, n=10):
    import jax

    r = f(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n


def main():
    import jax
    import jax.numpy as jnp

    from phoskintime_tpu.parallel.profile import enable_compilation_cache

    enable_compilation_cache()

    from phoskintime_tpu.demo import build_demo_network
    from phoskintime_tpu.network import expo as X
    from phoskintime_tpu.network.objective import (make_population_objective,
                                                   modality_losses)
    from phoskintime_tpu.network.params import unpack_params
    from phoskintime_tpu.network.simulate import extract_observables
    from phoskintime_tpu.ops.phi_pallas import ladder_len, phi_vectors_pallas_all
    from phoskintime_tpu.ops.scan_pallas import prepare_scan_plan

    pops = [int(a) for a in sys.argv[1:]] or [2048, 8192]

    b = build_demo_network(n_proteins=40, n_kinases=12, seed=0,
                           dtype=np.float32)
    system = b["system"]
    topo = system.topo
    N, w = topo.N, topo.width
    dtype = jnp.float32
    grid = b["grid"]

    # same segment plan the production path computes
    (seg_t0, seg_h, seg_jb, out_idx, seg_uidx, u_jb, u_h) = X._segment_plan(
        tuple(np.asarray(system.kin_grid, float)),
        tuple(np.asarray(grid, float)), 16.0)
    bucket_uniq, bucket_inv = np.unique(u_jb, return_inverse=True)
    U, S, T = len(u_h), len(seg_t0), len(out_idx)
    lad = max(ladder_len(w, float(h)) for h in u_h)
    # per-pair actual need (the all-pairs kernel runs the GLOBAL max,
    # masked): how much of the static ladder is dead work by plan alone
    per_pair = [ladder_len(w, float(h)) for h in u_h]
    emit("plan", 0.0, {"U": U, "S": S, "T": T, "w": w, "N": N,
                       "ladder_static": lad,
                       "ladder_per_pair": per_pair})

    mega = prepare_scan_plan(system.rhs, seg_jb, seg_uidx, u_h, out_idx, T)
    Npad = mega["Npad"] if mega else N
    emit("mega_plan", 0.0, {"eligible": mega is not None, "Npad": Npad,
                            "D": len(mega["shifts"]) if mega else -1})

    def L_lanes_of(thetas, Np):
        params_b = jax.vmap(
            lambda th: unpack_params(th, b["slices"], topo))(thetas)

        def blocks_one(p):
            def per_bucket(jb):
                Kt = system.rhs.kinase_activity(p, jb)
                return system.rhs.linear_blocks(system.rhs.site_rates(Kt), p)

            return jax.vmap(per_bucket)(jnp.asarray(bucket_uniq))

        L_pb = jax.vmap(blocks_one)(params_b)            # (P, Bu, N, w, w)
        if Np != N:
            L_pb = jnp.pad(L_pb, ((0, 0), (0, 0), (0, Np - N),
                                  (0, 0), (0, 0)))
        P = thetas.shape[0]
        return jnp.transpose(L_pb, (1, 3, 4, 0, 2)).reshape(
            len(bucket_uniq), w, w, P * Np)

    binv32 = np.asarray(bucket_inv, np.int32)
    h32 = np.asarray(u_h, np.float32)

    for POP in pops:
        rng = np.random.default_rng(0)
        thetas = jnp.asarray(
            b["theta0"][None]
            + 0.05 * rng.normal(size=(POP, len(b["theta0"]))), dtype)

        # --- end-to-end arms ---
        for name, usk in [("obj_xla", False), ("obj_mega", True)]:
            obj = make_population_objective(
                b["system"], b["slices"], b["loss_data"], b["defaults"],
                b["lambdas"], grid, pop_chunk=None, use_scan_kernel=usk)
            f = jax.jit(obj)
            t = timeit(f, thetas)
            emit(name, t, {"pop": POP,
                           "evals_per_s": round(POP / t)})
            del f, obj

        # --- stage: unpack + L build (lane layout, unpadded) ---
        fL = jax.jit(lambda th: L_lanes_of(th, N))
        tL = timeit(fL, thetas)
        emit("stage_unpack_L", tL, {"pop": POP})

        # --- stage: phi tables alone (Pallas all-pairs kernel) ---
        Ll = fL(thetas)
        jax.block_until_ready(Ll)
        fphi = jax.jit(lambda L: phi_vectors_pallas_all(L, binv32, h32, lad))
        tphi = timeit(fphi, Ll)
        emit("stage_phi_pallas", tphi, {"pop": POP, "ladder": lad})

        # --- stage: phi tables at the megakernel's padded lane count ---
        if Npad != N:
            fLp = jax.jit(lambda th: L_lanes_of(th, Npad))
            Llp = fLp(thetas)
            jax.block_until_ready(Llp)
            tphip = timeit(fphi, Llp)
            emit("stage_phi_pallas_padded", tphip, {"pop": POP})
            del fLp, Llp

        # --- stage: loss epilogue on a materialized trajectory ---
        ld = b["loss_data"]

        def loss_of(ys):
            def one(Y):
                obs = extract_observables(system, Y)
                return jnp.stack(modality_losses(
                    (obs.R, obs.TOT, obs.PHO), ld, 0))

            return jax.vmap(one)(ys)

        ys0 = jnp.ones((POP, T, N * w), dtype)
        floss = jax.jit(loss_of)
        tloss = timeit(floss, ys0)
        emit("stage_loss", tloss, {"pop": POP})

        # --- stage: XLA segment scan alone (prebuilt tables) ---
        # replicates the unbucketed scan glue of
        # exponential_simulate_batched (network/expo.py) exactly
        params_b = jax.jit(jax.vmap(
            lambda th: unpack_params(th, b["slices"], topo)))(thetas)
        E_u, Phi1_u, Phi2_u = (jax.block_until_ready(x)
                               for x in fphi(Ll))
        t0s = jnp.asarray(seg_t0, dtype)
        hs = jnp.asarray(seg_h, dtype)
        jbs = jnp.asarray(seg_jb)
        uidxs = jnp.asarray(seg_uidx)
        P = POP

        def scan_only(E_u, Phi1_u, Phi2_u, params_b, y0b):
            bmv_l = lambda M, v: jnp.sum(M * v[None, :, :], axis=1)

            def to_lanes(Y):
                return jnp.transpose(Y.reshape(P * N, w), (1, 0))

            def from_lanes(yl):
                return jnp.transpose(yl, (1, 0)).reshape(P, N, w)

            def synth_of(yl, jb):
                Yb = from_lanes(yl)
                s = jax.vmap(lambda yy, pp: system.rhs.synthesis_vector(
                    yy, system.rhs.kinase_activity(pp, jb), pp))(Yb, params_b)
                return s.reshape(P * N)

            def step(yl, seg):
                t0, h, jb, uidx = seg
                Es, P1, P2 = E_u[uidx], Phi1_u[uidx], Phi2_u[uidx]
                s_n = synth_of(yl, jb)
                a = bmv_l(Es, yl) + P1 * s_n[None, :]
                s_a = synth_of(a, jb)
                y_new = a + (P2 / h) * (s_a - s_n)[None, :]
                return y_new, y_new

            yl0 = to_lanes(y0b.reshape(P, N, w))
            _, ys_seg = jax.lax.scan(step, yl0, (t0s, hs, jbs, uidxs))
            ys_all = jnp.concatenate([yl0[None], ys_seg], axis=0)
            sel = ys_all[jnp.asarray(out_idx) + 1]
            return jnp.transpose(sel.reshape(T, w, P, N),
                                 (2, 0, 3, 1)).reshape(P, T, N * w)

        y0b = jnp.broadcast_to(
            jnp.asarray(system.y0(), dtype).reshape(-1)[None], (POP, N * w))
        fscan = jax.jit(scan_only)
        tscan = timeit(fscan, E_u, Phi1_u, Phi2_u, params_b, y0b)
        emit("stage_scan_xla", tscan, {"pop": POP})
        del fscan, E_u, Phi1_u, Phi2_u

        # --- megakernel: pack glue vs the pallas_call itself ---
        if mega is not None:
            from phoskintime_tpu.ops.scan_pallas import etd2rk_scan_pallas

            rhs = system.rhs
            Np, Tm = mega["Npad"], mega["T"]

            def pack_inputs(params_b, Llp):
                # replicate _run_scan_megakernel's packing exactly
                from phoskintime_tpu.ops.phi_pallas import (
                    ladder_len as _ll, phi_vectors_pallas_all as _pv)

                E_u, Phi1_u, Phi2_u = _pv(Llp, binv32, h32, lad)
                u_h_j = jnp.asarray(u_h, dtype)
                p2h = Phi2_u / u_h_j[:, None, None]
                A = jnp.pad(jnp.asarray(params_b["A_i"], dtype),
                            ((0, 0), (0, Np - N))).reshape(1, POP * Np)
                ts = jnp.repeat(jnp.asarray(params_b["tf_scale"], dtype),
                                Np).reshape(1, POP * Np)
                Kt_all = params_b["c_k"][:, :, None] * rhs.Kmat[None]
                drv = Kt_all[:, jnp.asarray(mega["driver_idx"]), :]
                drv = jnp.transpose(drv, (2, 0, 1)).reshape(-1, POP * Np)
                Y0 = jnp.pad(y0b.reshape(POP, N, w),
                             ((0, 0), (0, Np - N), (0, 0)))
                y0l = jnp.transpose(Y0.reshape(POP * Np, w), (1, 0))
                tile = lambda x: jnp.tile(jnp.asarray(x, dtype), (1, POP))
                return (E_u, Phi1_u, p2h, y0l, drv, A, ts,
                        tile(mega["totw"]), tile(mega["dm"]),
                        tile(mega["c1"]), tile(mega["c2"]))

            fLp2 = jax.jit(lambda th: L_lanes_of(th, Np))
            Llp2 = jax.block_until_ready(fLp2(thetas))
            fpack = jax.jit(pack_inputs)
            packed = fpack(params_b, Llp2)
            jax.block_until_ready(packed)
            tpack = timeit(fpack, params_b, Llp2)
            emit("stage_mega_pack_incl_phi", tpack, {"pop": POP})

            fker = jax.jit(lambda *xs: etd2rk_scan_pallas(
                *xs, jnp.asarray(mega["uidx"]), jnp.asarray(mega["jb"]),
                jnp.asarray(mega["out_slot"]), shifts=mega["shifts"],
                Npad=Np, T=Tm, init_slots=mega["init_slots"]))
            tker = timeit(fker, *packed)
            emit("stage_mega_kernel", tker, {"pop": POP})

            def unpack_ys(ys_l):
                ys = jnp.transpose(
                    ys_l.reshape(Tm, w, POP, Np)[..., :N],
                    (2, 0, 3, 1)).reshape(POP, Tm, N * w)
                return ys

            ys_l = jax.block_until_ready(fker(*packed))
            funp = jax.jit(unpack_ys)
            tunp = timeit(funp, ys_l)
            emit("stage_mega_unpack", tunp, {"pop": POP})
            del fLp2, Llp2, fpack, packed, fker, ys_l, funp
        del fL, Ll, fphi, floss, ys0, params_b

    print(json.dumps({"done": True}), flush=True)


if __name__ == "__main__":
    main()
