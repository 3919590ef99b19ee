"""End-to-end demo on a synthetic network.

Builds a 40-protein kinase-substrate/TF network with synthetic
observations, runs a short global UNSGA3 fit on whatever accelerator jax
sees, picks a solution by Frechet distance, runs Morris sensitivity and
the 7-day steady-state check, and writes figures + an HTML report.

    python examples/run_demo.py [out_dir]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp
import numpy as np

from phoskintime_tpu.demo import GRID, RNA_GRID, build_demo_network
from phoskintime_tpu.network.analysis import simulate_until_steady
from phoskintime_tpu.network.optimize import run_global_fit
from phoskintime_tpu.network.params import unpack_params
from phoskintime_tpu.network.sensitivity import run_sensitivity_analysis
from phoskintime_tpu.parallel import population_mesh
from phoskintime_tpu.report.dashboard import render_dashboard, save_dashboard_bundle


def main(out_dir="demo_results"):
    b = build_demo_network(n_proteins=40, n_kinases=12, seed=0,
                           dtype=np.float32)
    res = run_global_fit(
        b["system"], b["slices"], b["loss_data"], b["defaults"],
        b["lambdas"], b["grid"], b["xl"], b["xu"],
        pop=256, n_gen=40, seed=0, mesh=population_mesh(),
        # all-device loop: 10 generations per dispatch; add
        # polish_steps=600 for the exact-gradient sharpening pass
        gens_per_dispatch=10,
        frechet_pick=True, df_prot=b["df_prot"], df_rna=b["df_rna"],
        df_pho=b["df_pho"], t_points=(GRID, RNA_GRID, GRID))
    print(f"fit done: {res.n_evals} evaluations, "
          f"{len(res.pareto_X)} Pareto members, ideal "
          f"{res.pareto_F.min(axis=0)}")

    theta = res.pareto_X[res.best_idx]
    params = unpack_params(jnp.asarray(theta, jnp.float32), b["slices"],
                           b["system"].topo)
    sens = run_sensitivity_analysis(b["system"], b["slices"], theta,
                                    b["grid"], n_trajectories=20,
                                    num_levels=8)
    top = np.argsort(-sens.morris.mu_star)[:5]
    print("most sensitive decision variables:", top.tolist())

    ss = simulate_until_steady(b["system"], params)
    print(f"steady-state convergence: {int(ss.converged.sum())}/"
          f"{len(ss.converged)} proteins")

    bundle = save_dashboard_bundle(
        f"{out_dir}/bundle.pkl", pareto_X=res.pareto_X,
        pareto_F=res.pareto_F, best_idx=res.best_idx, history=res.history,
        topo_summary={"N": b["system"].topo.N, "K": b["system"].topo.K})
    print("dashboard:", render_dashboard(bundle, out_dir))


if __name__ == "__main__":
    main(*sys.argv[1:2])
