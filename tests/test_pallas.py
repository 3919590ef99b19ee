"""Pallas kernel equivalence tests (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from phoskintime_tpu.ops.pallas_kernels import (
    hypercube_flux_pallas,
    hypercube_flux_reference,
    thomas_pallas,
)
from phoskintime_tpu.ops.tridiag import thomas_solve_batched


class TestThomasPallas:
    def test_matches_scan_solver(self):
        rng = np.random.default_rng(0)
        B, n = 37, 6
        a = rng.normal(0, 1, (B, n)); a[:, 0] = 0
        c = rng.normal(0, 1, (B, n)); c[:, -1] = 0
        b = np.abs(rng.normal(0, 1, (B, n))) + 4.0
        d = rng.normal(0, 1, (B, n))
        got = thomas_pallas(jnp.asarray(a), jnp.asarray(b), jnp.asarray(c),
                            jnp.asarray(d), interpret=True)
        ref = thomas_solve_batched(jnp.asarray(a), jnp.asarray(b),
                                   jnp.asarray(c), jnp.asarray(d))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-10, atol=1e-12)

    def test_single_lane_batch(self):
        a = jnp.asarray([[0.0, -1.0, -1.0]])
        b = jnp.asarray([[4.0, 4.0, 4.0]])
        c = jnp.asarray([[-1.0, -1.0, 0.0]])
        d = jnp.asarray([[1.0, 2.0, 3.0]])
        got = thomas_pallas(a, b, c, d, interpret=True)
        A = np.diag([4.0, 4, 4]) + np.diag([-1.0, -1], -1) + np.diag([-1.0, -1], 1)
        np.testing.assert_allclose(np.asarray(got[0]),
                                   np.linalg.solve(A, np.asarray(d[0])),
                                   rtol=1e-10)


class TestHypercubePallas:
    def test_matches_reference(self):
        rng = np.random.default_rng(1)
        smax = 3
        N, Mmax = 11, 1 << smax
        X = jnp.asarray(rng.uniform(0, 1, (N, Mmax)))
        S = jnp.asarray(rng.uniform(0.1, 2.0, (N, smax)))
        E = jnp.asarray(rng.uniform(0.1, 2.0, N))
        got = hypercube_flux_pallas(X, S, E, smax, interpret=True)
        ref = hypercube_flux_reference(X, S, E, smax)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-10, atol=1e-12)

    def test_mass_conservation(self):
        # pure edge fluxes conserve total mass per protein
        rng = np.random.default_rng(2)
        smax = 4
        X = jnp.asarray(rng.uniform(0, 1, (5, 1 << smax)))
        S = jnp.asarray(rng.uniform(0.1, 2.0, (5, smax)))
        E = jnp.asarray(rng.uniform(0.1, 2.0, 5))
        dX = hypercube_flux_pallas(X, S, E, smax, interpret=True)
        np.testing.assert_allclose(np.asarray(dX).sum(axis=1), 0.0, atol=1e-10)


class TestPhiTablesPallas:
    """Propagator-table kernel vs the XLA reference ladder
    (ops/phi_pallas.py; production route for the flagship objective)."""

    def _blocks(self, B=640, w=7, seed=0):
        rng = np.random.default_rng(seed)
        L = rng.normal(0, 0.6, (w, w, B)).astype(np.float32)
        for i in range(w):
            L[i, i, :] = -rng.uniform(0.01, 25.0, B)
        return jnp.asarray(L)

    @pytest.mark.slow
    def test_matches_xla_ladder(self):
        from phoskintime_tpu.network.expo import _phi_vectors_lanes
        from phoskintime_tpu.ops.phi_pallas import (ladder_len,
                                                    phi_vectors_pallas)

        L = self._blocks()
        B = L.shape[-1]
        for h in [0.0625, 1.0, 16.0]:
            lad = ladder_len(7, h)
            E_p, p1_p, p2_p = phi_vectors_pallas(L, h, lad, blk=128,
                                                 interpret=True)
            E_x, p1_x, p2_x = _phi_vectors_lanes(
                L, jnp.broadcast_to(jnp.float32(h), (B,)))
            for a, b in [(E_p, E_x), (p1_p, p1_x), (p2_p, p2_x)]:
                scale = float(jnp.max(jnp.abs(b))) + 1e-30
                np.testing.assert_allclose(np.asarray(a) / scale,
                                           np.asarray(b) / scale, atol=2e-5)

    def test_expm_identity_at_zero_rates(self):
        from phoskintime_tpu.ops.phi_pallas import phi_vectors_pallas

        w, B = 7, 128
        L = jnp.zeros((w, w, B), jnp.float32)
        E, p1, p2 = phi_vectors_pallas(L, 2.0, 4, blk=128, interpret=True)
        np.testing.assert_allclose(
            np.asarray(E), np.broadcast_to(np.eye(w)[..., None], (w, w, B)),
            atol=1e-6)
        # phi1(0) = I -> p1 = h e0; phi2(0) = I/2 -> p2 = h^2/2 e0
        np.testing.assert_allclose(np.asarray(p1[0]), 2.0, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(p2[0]), 2.0, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(p1[1:]), 0.0, atol=1e-9)

    @pytest.mark.slow
    def test_wide_block_auto_blk(self):
        """w=17 (combinatorial mechanism): auto block size must shrink so
        the kernel fits VMEM (regression: model-2 objective OOM'd at the
        w=7 default)."""
        from phoskintime_tpu.network.expo import _phi_vectors_lanes
        from phoskintime_tpu.ops.phi_pallas import (ladder_len,
                                                    phi_vectors_pallas)

        rng = np.random.default_rng(0)
        w, B = 17, 300
        L = rng.normal(0, 0.3, (w, w, B)).astype(np.float32)
        for i in range(w):
            L[i, i, :] = -rng.uniform(0.01, 10.0, B)
        L = jnp.asarray(L)
        h = 4.0
        E_p, p1_p, p2_p = phi_vectors_pallas(L, h, ladder_len(w, h),
                                             interpret=True)
        E_x, p1_x, p2_x = _phi_vectors_lanes(
            L, jnp.broadcast_to(jnp.float32(h), (B,)))
        for a, b in [(E_p, E_x), (p1_p, p1_x), (p2_p, p2_x)]:
            scale = float(jnp.max(jnp.abs(b))) + 1e-30
            np.testing.assert_allclose(np.asarray(a) / scale,
                                       np.asarray(b) / scale, atol=2e-5)


class TestPhiPallasAll:
    """All-pairs kernel (one pallas_call for every (bucket, h) pair)."""

    @pytest.mark.slow
    def test_matches_per_pair(self):
        from phoskintime_tpu.ops.phi_pallas import (ladder_len,
                                                    phi_vectors_pallas,
                                                    phi_vectors_pallas_all)

        rng = np.random.default_rng(3)
        Bu, w, B = 3, 7, 200
        L = rng.normal(0, 0.5, (Bu, w, w, B)).astype(np.float32)
        for i in range(w):
            L[:, i, i, :] = -rng.uniform(0.01, 20.0, (Bu, B))
        L = jnp.asarray(L)
        binv = np.asarray([0, 1, 2, 1, 0], np.int32)
        h_u = np.asarray([0.0625, 1.0, 16.0, 4.0, 0.5], np.float32)
        lad = max(ladder_len(w, float(h)) for h in h_u)
        E_a, p1_a, p2_a = phi_vectors_pallas_all(L, binv, h_u, lad,
                                                 blk=128, interpret=True)
        for u in range(len(h_u)):
            E, p1, p2 = phi_vectors_pallas(L[binv[u]], float(h_u[u]),
                                           ladder_len(w, float(h_u[u])),
                                           blk=128, interpret=True)
            for a, b in [(E_a[u], E), (p1_a[u], p1), (p2_a[u], p2)]:
                scale = float(jnp.max(jnp.abs(b))) + 1e-30
                np.testing.assert_allclose(np.asarray(a) / scale,
                                           np.asarray(b) / scale,
                                           atol=2e-5)

    def test_unpadded_tail(self):
        """B not a multiple of blk exercises the zero-pad tail path."""
        from phoskintime_tpu.ops.phi_pallas import (ladder_len,
                                                    phi_vectors_pallas_all)

        rng = np.random.default_rng(4)
        w, B = 5, 77
        L = rng.normal(0, 0.4, (1, w, w, B)).astype(np.float32)
        for i in range(w):
            L[:, i, i, :] = -rng.uniform(0.1, 5.0, (1, B))
        h_u = np.asarray([2.0], np.float32)
        E, p1, p2 = phi_vectors_pallas_all(
            jnp.asarray(L), np.asarray([0], np.int32), h_u,
            ladder_len(w, 2.0), blk=128, interpret=True)
        assert E.shape == (1, w, w, B) and p1.shape == (1, w, B)
        assert bool(jnp.all(jnp.isfinite(E)))


@pytest.mark.slow
class TestPhiPallasPages:
    """Pages-layout all-pairs kernel (matrix entries as leading-dim vreg
    pages; the production route for the affine mechanisms' w <= 8)."""

    def test_matches_all_pairs_kernel(self):
        from phoskintime_tpu.ops.phi_pallas import (ladder_len,
                                                    phi_vectors_pallas_all,
                                                    phi_vectors_pallas_pages)

        rng = np.random.default_rng(5)
        Bu, w, B = 3, 6, 200
        L = rng.normal(0, 0.5, (Bu, w, w, B)).astype(np.float32)
        for i in range(w):
            L[:, i, i, :] = -rng.uniform(0.01, 20.0, (Bu, B))
        L = jnp.asarray(L)
        binv = np.asarray([0, 1, 2, 1, 0], np.int32)
        h_u = np.asarray([0.0625, 1.0, 16.0, 4.0, 0.5], np.float32)
        lad = max(ladder_len(w, float(h)) for h in h_u)
        E_a, p1_a, p2_a = phi_vectors_pallas_all(L, binv, h_u, lad,
                                                 blk=128, interpret=True)
        E_p, p1_p, p2_p = phi_vectors_pallas_pages(L, binv, h_u, lad,
                                                   blk8=128, interpret=True)
        assert E_p.shape == E_a.shape and p1_p.shape == p1_a.shape
        for a, b in [(E_p, E_a), (p1_p, p1_a), (p2_p, p2_a)]:
            scale = float(jnp.max(jnp.abs(b))) + 1e-30
            np.testing.assert_allclose(np.asarray(a) / scale,
                                       np.asarray(b) / scale, atol=2e-5)

    def test_unpadded_tail(self):
        """B not a multiple of 8*blk8 exercises the zero-pad tail path."""
        from phoskintime_tpu.ops.phi_pallas import (ladder_len,
                                                    phi_vectors_pallas_pages)

        rng = np.random.default_rng(6)
        w, B = 5, 77
        L = rng.normal(0, 0.4, (1, w, w, B)).astype(np.float32)
        for i in range(w):
            L[:, i, i, :] = -rng.uniform(0.1, 5.0, (1, B))
        h_u = np.asarray([2.0], np.float32)
        E, p1, p2 = phi_vectors_pallas_pages(
            jnp.asarray(L), np.asarray([0], np.int32), h_u,
            ladder_len(w, 2.0), blk8=128, interpret=True)
        assert E.shape == (1, w, w, B) and p1.shape == (1, w, B)
        assert bool(jnp.all(jnp.isfinite(E)))


class TestScanMegakernel:
    """The whole-segment-scan Pallas kernel (ops/scan_pallas.py) against
    the XLA lax.scan path it replaces — identical ETD2RK math, so parity
    holds to f32 ordering noise (both sit within the method's own
    discretization error of a fine-substep run)."""

    def _batched(self, model, P=4, seed=7):
        import sys as _s
        _s.path.insert(0, "tests")
        from test_expo import make_system
        rng = np.random.default_rng(seed)
        sys_, pj = make_system(model)
        pb = {}
        for k, v in pj.items():
            v = np.asarray(v, np.float32)
            pb[k] = jnp.asarray(v[None] * rng.uniform(
                0.8, 1.2, (P,) + v.shape).astype(np.float32))
        return sys_, pb

    @pytest.mark.slow
    def test_parity_models(self):
        from test_expo import GRID
        from phoskintime_tpu.network.expo import exponential_simulate_batched

        for model in (0, 1, 2):
            sys_, pb = self._batched(model)
            ys_ref, ok_r = exponential_simulate_batched(
                sys_, pb, GRID, use_scan_kernel=False)
            ys_m, ok_m = exponential_simulate_batched(
                sys_, pb, GRID, use_scan_kernel=True)
            assert bool(ok_r.all()) and bool(ok_m.all())
            np.testing.assert_allclose(np.asarray(ys_m), np.asarray(ys_ref),
                                       rtol=2e-3, atol=1e-5)

    def test_plan_gates(self):
        from test_expo import GRID
        from phoskintime_tpu.network.expo import _segment_plan
        from phoskintime_tpu.ops.scan_pallas import prepare_scan_plan

        sys_, _ = self._batched(0)
        (seg_t0, seg_h, seg_jb, out_idx, seg_uidx, u_jb, u_h) = _segment_plan(
            tuple(np.asarray(sys_.kin_grid, float)),
            tuple(np.asarray(GRID, float)), 16.0)
        plan = prepare_scan_plan(sys_.rhs, seg_jb, seg_uidx, u_h, out_idx,
                                 len(out_idx))
        assert plan is not None
        assert plan["Npad"] % 8 == 0 and plan["Npad"] >= sys_.topo.N
        # every positive t_eval has exactly one writing segment
        pos = np.asarray(out_idx)[np.asarray(out_idx) >= 0]
        assert sorted(plan["out_slot"][plan["out_slot"] >= 0].tolist()) == \
            sorted(range(len(GRID)))[len(GRID) - len(pos):]
        # collision (two t_eval on one segment) -> fallback
        bad = np.asarray(out_idx).copy()
        bad[2] = bad[1]
        assert prepare_scan_plan(sys_.rhs, seg_jb, seg_uidx, u_h, bad,
                                 len(bad)) is None

    def test_model4_falls_back(self):
        """The saturating mechanism has no static phi table; forcing the
        kernel must silently take the Rosenbrock path."""
        from test_expo import GRID
        from phoskintime_tpu.network.expo import exponential_simulate_batched

        sys_, pb = self._batched(4)
        ys_a, ok_a = exponential_simulate_batched(
            sys_, pb, GRID, use_scan_kernel=True)
        ys_b, ok_b = exponential_simulate_batched(
            sys_, pb, GRID, use_scan_kernel=False)
        assert bool(ok_a.all()) and bool(ok_b.all())
        np.testing.assert_allclose(np.asarray(ys_a), np.asarray(ys_b))
