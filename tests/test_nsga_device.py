"""All-device U-NSGA-III: machinery equality vs the host GA + convergence.

The device loop (ops/nsga_device.py) must reproduce the host path's
selection semantics exactly where those are deterministic (non-dominated
ranks, niching picks that never hit the random tie-break) and match its
optimization quality on a standard multi-objective test problem.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # integration tier: excluded from the <5-min smoke run

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from phoskintime_tpu.ops.nsga import (das_dennis, fast_non_dominated_sort,
                                      nsga3_survival)
from phoskintime_tpu.ops.nsga_device import (device_nd_ranks,
                                             device_survival,
                                             run_unsga3_device)


def _host_ranks(F):
    rank = np.empty(len(F), int)
    for r, fr in enumerate(fast_non_dominated_sort(F)):
        rank[fr] = r
    return rank


def _dtlz2(X):
    """DTLZ2 (m=3): ideal point 0, Pareto front on the unit sphere."""
    X = jnp.asarray(X)
    g = jnp.sum((X[:, 2:] - 0.5) ** 2, axis=1)
    a = X[:, 0] * (np.pi / 2)
    b = X[:, 1] * (np.pi / 2)
    f1 = (1 + g) * jnp.cos(a) * jnp.cos(b)
    f2 = (1 + g) * jnp.cos(a) * jnp.sin(b)
    f3 = (1 + g) * jnp.sin(a)
    return jnp.stack([f1, f2, f3], axis=1)


class TestDeviceRanks:
    def test_matches_host_sort(self):
        rng = np.random.default_rng(0)
        F = rng.random((64, 3))
        # duplicate rows and a dominated copy exercise tie handling
        F = np.vstack([F, F[:5], F[:3] + 0.1])
        got = np.asarray(device_nd_ranks(jnp.asarray(F)))
        assert (got == _host_ranks(F)).all()

    def test_single_front(self):
        # points on the simplex plane are mutually non-dominated
        W = das_dennis(3, 8)
        got = np.asarray(device_nd_ranks(jnp.asarray(W + 0.5)))
        assert (got == 0).all()

    def test_chain(self):
        # strictly ordered chain: one front per point
        F = np.arange(12, dtype=float)[:, None] * np.ones((1, 3))
        got = np.asarray(device_nd_ranks(jnp.asarray(F)))
        assert (got == np.arange(12)).all()


class TestDeviceSurvival:
    def _refs_unit(self, n_partitions=6):
        refs = das_dennis(3, n_partitions)
        return refs / np.linalg.norm(refs, axis=1, keepdims=True)

    def test_front_semantics(self):
        """Survivors = every full front before the splitting front plus
        exactly the owed number from the splitting front."""
        rng = np.random.default_rng(1)
        F = rng.random((80, 3))
        X = rng.random((80, 5))
        unit = self._refs_unit()
        n_keep = 32
        Xs, Fs, rank, niche, nd = device_survival(
            jnp.asarray(X), jnp.asarray(F), n_keep, jnp.asarray(unit),
            jax.random.PRNGKey(0))
        Fs = np.asarray(Fs)
        assert Fs.shape == (n_keep, 3)
        host_rank = _host_ranks(F)
        counts = np.bincount(host_rank)
        cum = np.cumsum(counts)
        L = int(np.argmax(cum >= n_keep))
        # match survivor rows back to the combined pool by value
        sel = [int(np.argmin(np.abs(F - f).sum(axis=1))) for f in Fs]
        assert len(set(sel)) == n_keep  # no duplicates selected
        ranks_sel = host_rank[sel]
        for r in range(L):
            assert (ranks_sel == r).sum() == counts[r]
        assert (ranks_sel == L).sum() == n_keep - (cum[L - 1] if L else 0)
        assert np.asarray(rank).max() <= L

    def test_matches_host_when_deterministic(self):
        """When every niching pick goes through the empty-niche min-nd
        branch (more distinct candidate niches than owed slots, unique
        distances), host and device survival keep the SAME set."""
        rng = np.random.default_rng(2)
        # one big mutually-non-dominated front: points on the simplex
        refs = das_dennis(3, 9)                       # 55 directions
        take = rng.permutation(len(refs))[:40]
        F = refs[take] + 0.2 + rng.uniform(0, 1e-4, (40, 3))  # unique nd
        X = rng.random((40, 4))
        n_keep = 12
        unit = self._refs_unit(9)

        Xs_d, Fs_d, *_ = device_survival(
            jnp.asarray(X), jnp.asarray(F), n_keep, jnp.asarray(unit),
            jax.random.PRNGKey(0))
        Xh, Fh, *_ = nsga3_survival(X, F, n_keep, refs,
                                    np.random.default_rng(0))
        got = {tuple(np.round(r, 12)) for r in np.asarray(Fs_d)}
        want = {tuple(np.round(r, 12)) for r in Fh}
        assert got == want

    def test_survival_of_exact_fit(self):
        """Population already at the cap: survival is the identity set."""
        rng = np.random.default_rng(3)
        F = rng.random((24, 3))
        X = rng.random((24, 4))
        unit = self._refs_unit()
        Xs, Fs, rank, niche, nd = device_survival(
            jnp.asarray(X), jnp.asarray(F), 24, jnp.asarray(unit),
            jax.random.PRNGKey(0))
        assert {tuple(r) for r in np.round(np.asarray(Fs), 12)} \
            == {tuple(r) for r in np.round(F, 12)}
        assert (np.asarray(rank) == _host_ranks(F)[
            [int(np.argmin(np.abs(F - f).sum(1))) for f in np.asarray(Fs)]
        ]).all()


class TestDeviceLoop:
    def test_converges_on_dtlz2(self):
        n_var = 7
        xl = np.zeros(n_var)
        xu = np.ones(n_var)
        res = run_unsga3_device(_dtlz2, xl, xu, pop_size=40, n_gen=30,
                                seed=0, gens_per_block=10, ftol=0.0,
                                n_max_evals=None)
        assert res.n_gen == 30
        assert res.n_evals == 40 * 31
        assert len(res.history) == 30
        # DTLZ2 ideal is 0 per objective; the front is the unit sphere
        ideal = res.pareto_F.min(axis=0)
        assert (ideal < 0.35).all()
        norms = np.linalg.norm(res.pareto_F, axis=1)
        assert 0.9 < np.median(norms) < 1.6
        # history ideal must be monotone non-increasing per objective
        ideals = np.array([h[1] for h in res.history])
        assert (np.diff(ideals, axis=0) <= 1e-9).all()

    def test_quality_matches_host_loop(self):
        from phoskintime_tpu.ops.nsga import run_unsga3

        n_var = 7
        xl, xu = np.zeros(n_var), np.ones(n_var)
        dev = run_unsga3_device(_dtlz2, xl, xu, pop_size=40, n_gen=30,
                                seed=0, gens_per_block=10, ftol=0.0,
                                n_max_evals=None)
        host = run_unsga3(lambda X: np.asarray(_dtlz2(X)), xl, xu,
                          pop_size=40, n_gen=30, seed=0, ftol=0.0,
                          n_max_evals=None)
        # same budget, comparable quality (deliberately loose: the RNG
        # streams differ; this guards against gross selection bugs)
        assert dev.pareto_F.min(axis=0).sum() \
            <= host.pareto_F.min(axis=0).sum() * 2.0 + 0.1

    def test_ftol_early_stop_and_cap(self):
        n_var = 5
        xl, xu = np.zeros(n_var), np.ones(n_var)
        res = run_unsga3_device(_dtlz2, xl, xu, pop_size=16, n_gen=40,
                                seed=0, gens_per_block=5,
                                ftol=1e9, ftol_period=5)  # stops ASAP
        assert res.n_gen <= 10  # first block past the window
        res2 = run_unsga3_device(_dtlz2, xl, xu, pop_size=16, n_gen=40,
                                 seed=0, gens_per_block=5, ftol=0.0,
                                 n_max_evals=100)
        assert res2.n_evals >= 100
        assert res2.n_gen <= 10

    def test_callback_block_granularity(self):
        n_var = 5
        xl, xu = np.zeros(n_var), np.ones(n_var)
        seen = []

        def cb(gen, X, F):
            seen.append((gen, X.shape, F.shape))
            return len(seen) >= 2  # stop after second block

        res = run_unsga3_device(_dtlz2, xl, xu, pop_size=16, n_gen=40,
                                seed=0, gens_per_block=4, ftol=0.0,
                                n_max_evals=None, callback=cb)
        assert [g for g, *_ in seen] == [4, 8]
        assert res.n_gen == 8

    def test_x0_resume(self):
        n_var = 5
        xl, xu = np.zeros(n_var), np.ones(n_var)
        x0 = np.full((10, n_var), 0.5)  # undersized: padded with LHS
        res = run_unsga3_device(_dtlz2, xl, xu, pop_size=16, n_gen=4,
                                seed=0, gens_per_block=2, ftol=0.0,
                                x0=x0, n_max_evals=None)
        assert res.X.shape == (16, n_var)


class TestDeviceNSGA2:
    def test_crowding_matches_host(self):
        from phoskintime_tpu.ops.nsga import crowding_distance
        from phoskintime_tpu.ops.nsga_device import device_crowding

        rng = np.random.default_rng(5)
        F = rng.random((60, 3))
        host_rank = _host_ranks(F)
        want = np.empty(len(F))
        for r in np.unique(host_rank):
            fr = np.where(host_rank == r)[0]
            want[fr] = crowding_distance(F[fr])
        got = np.asarray(device_crowding(jnp.asarray(F),
                                         jnp.asarray(host_rank)))
        finite = np.isfinite(want)
        assert (np.isfinite(got) == finite).all()
        np.testing.assert_allclose(got[finite], want[finite], rtol=1e-10)

    def test_survival_matches_host(self):
        from phoskintime_tpu.ops.nsga import nsga2_survival
        from phoskintime_tpu.ops.nsga_device import device_nsga2_survival

        rng = np.random.default_rng(6)
        F = rng.random((48, 3))
        X = rng.random((48, 4))
        Xh, Fh = nsga2_survival(X, F, 20)
        Xd, Fd, rank, crowd = device_nsga2_survival(
            jnp.asarray(X), jnp.asarray(F), 20)
        got = {tuple(r) for r in np.round(np.asarray(Fd), 12)}
        want = {tuple(r) for r in np.round(Fh, 12)}
        assert got == want

    def test_loop_converges(self):
        from phoskintime_tpu.ops.nsga_device import run_nsga2_device

        n_var = 6
        res = run_nsga2_device(_dtlz2, np.zeros(n_var), np.ones(n_var),
                               pop_size=32, n_gen=30, seed=0,
                               gens_per_block=10)
        assert res.n_evals == 32 * 31
        assert (res.pareto_F.min(axis=0) < 0.4).all()

    def test_repair_applied(self):
        """A jax repair projecting onto x0+x1=1 must hold for the whole
        final population (applied to offspring inside the program)."""
        from phoskintime_tpu.ops.nsga_device import run_nsga2_device

        def repair(X):
            s = X[:, :2].sum(axis=1, keepdims=True)
            return jnp.concatenate([X[:, :2] / jnp.maximum(s, 1e-9),
                                    X[:, 2:]], axis=1)

        res = run_nsga2_device(_dtlz2, np.full(5, 1e-3), np.ones(5),
                               pop_size=16, n_gen=6, seed=0,
                               gens_per_block=3, repair_fn=repair)
        np.testing.assert_allclose(res.X[:, :2].sum(axis=1), 1.0, rtol=1e-4)


class TestGlobalFitWiring:
    def test_gens_per_dispatch(self):
        """run_global_fit(gens_per_dispatch>1) routes through the
        all-device loop and accounts evaluations exactly."""
        from phoskintime_tpu.demo import build_demo_network
        from phoskintime_tpu.network.optimize import run_global_fit

        b = build_demo_network(n_proteins=6, n_kinases=3, seed=1,
                               dtype=np.float32)
        res = run_global_fit(b["system"], b["slices"], b["loss_data"],
                             b["defaults"], b["lambdas"], b["grid"],
                             b["xl"], b["xu"], pop=16, n_gen=6, seed=0,
                             frechet_pick=False, gens_per_dispatch=3)
        assert res.n_evals == 16 * 7
        assert np.isfinite(res.pareto_F).all()

    def test_checkpoint_resume_device_loop(self, tmp_path):
        """Checkpointing fires at block granularity; a second run resumes
        from the stored population."""
        from phoskintime_tpu.demo import build_demo_network
        from phoskintime_tpu.network.optimize import run_global_fit
        from phoskintime_tpu.parallel.checkpoint import GACheckpointer

        b = build_demo_network(n_proteins=6, n_kinases=3, seed=1,
                               dtype=np.float32)
        ck_path = str(tmp_path / "ga.ckpt")
        run_global_fit(b["system"], b["slices"], b["loss_data"],
                       b["defaults"], b["lambdas"], b["grid"],
                       b["xl"], b["xu"], pop=16, n_gen=4, seed=0,
                       frechet_pick=False, gens_per_dispatch=2,
                       checkpoint_path=ck_path, checkpoint_every=1)
        ck = GACheckpointer(ck_path, every=1)
        x0 = ck.resume_x0()
        assert x0 is not None and x0.shape == (16, len(b["xl"]))
        assert ck.start_gen >= 2  # block-granular: multiples of 2
        res2 = run_global_fit(b["system"], b["slices"], b["loss_data"],
                              b["defaults"], b["lambdas"], b["grid"],
                              b["xl"], b["xu"], pop=16, n_gen=2, seed=1,
                              frechet_pick=False, gens_per_dispatch=2,
                              checkpoint_path=ck_path)
        assert np.isfinite(res2.pareto_F).all()

    def test_refinement_reuses_device_loop(self):
        """Refinement rounds run through the device loop with zoomed
        TRACED bounds (no recompile per round) and account evals."""
        from phoskintime_tpu.demo import build_demo_network
        from phoskintime_tpu.network.optimize import run_global_fit

        b = build_demo_network(n_proteins=6, n_kinases=3, seed=1,
                               dtype=np.float32)
        res = run_global_fit(b["system"], b["slices"], b["loss_data"],
                             b["defaults"], b["lambdas"], b["grid"],
                             b["xl"], b["xu"], pop=16, n_gen=6, seed=0,
                             frechet_pick=False, gens_per_dispatch=3,
                             refine=True, num_refinements=1)
        # main fit 16*(1+6); each refinement round adds >= 16*(1+10)
        assert res.n_evals >= 16 * 7 + 16 * 11 or res.n_evals == 16 * 7
        assert np.isfinite(res.pareto_F).all()


class TestDeviceLoopMesh:
    def test_uneven_pop_rejected(self):
        from jax.sharding import Mesh

        if len(jax.devices()) < 8:
            pytest.skip("needs the 8-device CPU mesh")
        mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("pop",))
        with pytest.raises(ValueError, match="multiple of the mesh"):
            run_unsga3_device(_dtlz2, np.zeros(6), np.ones(6), pop_size=30,
                              n_gen=2, gens_per_block=2, mesh=mesh)

    def test_runs_sharded(self):
        from jax.sharding import Mesh

        if len(jax.devices()) < 8:
            pytest.skip("needs the 8-device CPU mesh")
        mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("pop",))
        n_var = 6
        xl, xu = np.zeros(n_var), np.ones(n_var)
        res = run_unsga3_device(_dtlz2, xl, xu, pop_size=32, n_gen=6,
                                seed=0, gens_per_block=3, ftol=0.0,
                                n_max_evals=None, mesh=mesh)
        assert res.F.shape == (32, 3)
        assert np.isfinite(res.F).all()
        ideals = np.array([h[1] for h in res.history])
        assert (np.diff(ideals, axis=0) <= 1e-9).all()
        # sharded vs unsharded: identical machinery, same seed — the
        # trajectories agree to float tolerance for a short run
        ref = run_unsga3_device(_dtlz2, xl, xu, pop_size=32, n_gen=6,
                                seed=0, gens_per_block=3, ftol=0.0,
                                n_max_evals=None)
        np.testing.assert_allclose(
            np.sort(res.pareto_F.min(axis=0)),
            np.sort(ref.pareto_F.min(axis=0)), rtol=1e-3, atol=1e-6)


class TestShardedRanking:
    """Column-sharded dominance ranking (VERDICT r3 item 3): exact
    equality with the replicated computation under the 8-device mesh."""

    def _mesh(self):
        from jax.sharding import Mesh
        if len(jax.devices()) < 8:
            pytest.skip("needs the 8-device CPU mesh")
        return Mesh(np.array(jax.devices()[:8]).reshape(8), ("pop",))

    def test_ranks_equal_replicated(self):
        from jax.sharding import NamedSharding, PartitionSpec as P
        mesh = self._mesh()
        rng = np.random.default_rng(0)
        F = rng.random((1024, 3)).astype(np.float32)
        r_rep = np.asarray(jax.jit(device_nd_ranks)(jnp.asarray(F)))
        f_sh = jax.device_put(jnp.asarray(F),
                              NamedSharding(mesh, P("pop", None)))
        r_sh = np.asarray(
            jax.jit(lambda f: device_nd_ranks(f, mesh=mesh))(f_sh))
        assert np.array_equal(r_rep, r_sh)

    def test_survival_equal_replicated(self):
        from jax.sharding import NamedSharding, PartitionSpec as P
        mesh = self._mesh()
        rng = np.random.default_rng(1)
        Q = 512
        F = rng.random((Q, 3)).astype(np.float32)
        X = rng.random((Q, 10)).astype(np.float32)
        refs = das_dennis(3, 12)
        unit = jnp.asarray(
            refs / np.linalg.norm(refs, axis=1, keepdims=True), jnp.float32)
        key = jax.random.PRNGKey(0)
        rep = jax.jit(lambda x, f: device_survival(
            x, f, Q // 2, unit, key))(jnp.asarray(X), jnp.asarray(F))
        sh = NamedSharding(mesh, P("pop", None))
        out = jax.jit(lambda x, f: device_survival(
            x, f, Q // 2, unit, key, mesh=mesh))(
                jax.device_put(jnp.asarray(X), sh),
                jax.device_put(jnp.asarray(F), sh))
        for a, b in zip(rep, out):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))
