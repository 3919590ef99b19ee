"""Kinase input K(t): observed fold-change trajectories on the protein grid.

Spec: reference ``global_model/network.py:170-196`` — per-kinase step
("bucketed") interpolation over TIME_POINTS_PROTEIN, default 1.0, values
clamped >= 1e-6.
"""

from __future__ import annotations

import numpy as np


def build_kinase_matrix(kinases: list[str], df_fc, grid: np.ndarray) -> np.ndarray:
    """(K, len(grid)) kinase fold-change matrix.

    df_fc: tidy DataFrame [protein, time, fc] (may be empty/None).
    """
    grid = np.asarray(grid, float)
    Kmat = np.ones((len(kinases), len(grid)))
    if df_fc is None or len(df_fc) == 0:
        return Kmat
    for i, k in enumerate(kinases):
        sub = df_fc[df_fc["protein"] == k]
        if len(sub) == 0:
            continue
        mp = dict(zip(sub["time"].astype(float), sub["fc"].astype(float)))
        for j, t in enumerate(grid):
            if t in mp:
                Kmat[i, j] = max(mp[t], 1e-6)
    return Kmat


def eval_step(Kmat: np.ndarray, grid: np.ndarray, t: float) -> np.ndarray:
    """Host-side step interpolation (for debugging / parity tests)."""
    grid = np.asarray(grid, float)
    if t <= grid[0]:
        return Kmat[:, 0]
    if t >= grid[-1]:
        return Kmat[:, -1]
    j = int(np.searchsorted(grid, t, side="right") - 1)
    return Kmat[:, j]
