"""Real-TPU compile gate for the Pallas kernels (ADVICE r4 #1).

The interpret-mode tests cannot catch Mosaic lowering rejections (e.g. of
the value-carrying ``lax.cond`` runtime squaring skip in
``phi_vectors_pallas_all``) or a both-branches select lowering that would
void the claimed savings.  This script compiles and runs every production
Pallas kernel ON DEVICE and cross-checks values against the XLA ladder;
it exits non-zero on any failure, so it can gate a round.

Usage: python benchmarks/tpu_smoke.py    (requires the real TPU backend)
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    plat = jax.devices()[0].platform
    if plat not in ("tpu", "axon"):
        print(json.dumps({"ok": False, "reason": f"not a TPU backend: {plat}"}))
        return 1

    from phoskintime_tpu.network.expo import _phi_vectors_lanes
    from phoskintime_tpu.ops.phi_pallas import (ladder_len,
                                                phi_vectors_pallas_all,
                                                phi_vectors_pallas_pages)

    rng = np.random.default_rng(0)
    out = {"platform": plat, "ok": True, "kernels": {}}
    for name, w, fn in [("pages", 7, phi_vectors_pallas_pages),
                        ("all", 9, phi_vectors_pallas_all)]:
        B = 1024
        Bu = 3
        # generator-shaped blocks: negative diagonal, mixed off-diagonal
        L = rng.normal(0.0, 0.4, (Bu, w, w, B)).astype(np.float32)
        L[:, np.arange(w), np.arange(w), :] -= 2.0
        binv = np.asarray([0, 1, 2, 1], np.int32)
        u_h = np.asarray([0.5, 2.0, 8.0, 16.0], np.float32)
        lad = max(ladder_len(w, float(h)) for h in u_h)
        t0 = time.perf_counter()
        E, p1, p2 = fn(jnp.asarray(L), binv, u_h, lad)
        jax.block_until_ready(E)
        t_compile = time.perf_counter() - t0
        t0 = time.perf_counter()
        E, p1, p2 = fn(jnp.asarray(L), binv, u_h, lad)
        jax.block_until_ready(E)
        t_warm = time.perf_counter() - t0
        # value parity vs the XLA ladder (same radius/terms contract)
        bad = 0.0
        for u in range(len(u_h)):
            E_x, p1_x, p2_x = _phi_vectors_lanes(
                jnp.asarray(L[binv[u]]), jnp.full((B,), float(u_h[u]),
                                                  jnp.float32),
                unroll=lad)
            for got, ref in [(E[u], E_x), (p1[u], p1_x), (p2[u], p2_x)]:
                bad = max(bad, float(jnp.max(jnp.abs(got - ref)
                                             / (1e-4 + jnp.abs(ref)))))
        out["kernels"][name] = {"w": w, "compile_s": round(t_compile, 2),
                                "warm_s": round(t_warm, 4),
                                "max_rel_err_vs_xla": float(f"{bad:.3g}")}
        if not np.isfinite(bad) or bad > 5e-3:
            out["ok"] = False
    print(json.dumps(out))
    return 0 if out["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
