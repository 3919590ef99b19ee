"""Parameter-name / state-label helpers.

Behavioral spec: reference ``config/helpers/__init__.py:5-108`` — the random
(combinatorial) per-gene model has 4 + n + (2^n - 1) parameters
(A, B, C, D, S_1..S_n, and one degradation rate per non-empty site subset),
while distributive/successive models have 4 + 2n (A, B, C, D, S_i, D_i).
"""

from __future__ import annotations

from itertools import combinations


def get_number_of_params_rand(num_psites: int) -> int:
    return 4 + num_psites + (2 ** num_psites - 1)


def get_number_of_params_ds(num_psites: int) -> int:
    return 4 + 2 * num_psites


def subset_labels(num_psites: int) -> list[str]:
    """Non-empty subsets of sites ordered by cardinality then lexicographic,
    matching the reference's `itertools.combinations` enumeration order."""
    labels = []
    for k in range(1, num_psites + 1):
        for comb in combinations(range(1, num_psites + 1), k):
            labels.append("".join(str(c) for c in comb))
    return labels


def get_param_names_rand(num_psites: int) -> list[str]:
    names = ["A", "B", "C", "D"]
    names += [f"S{i + 1}" for i in range(num_psites)]
    names += [f"D{lbl}" for lbl in subset_labels(num_psites)]
    return names


def get_param_names_ds(num_psites: int) -> list[str]:
    names = ["A", "B", "C", "D"]
    names += [f"S{i + 1}" for i in range(num_psites)]
    names += [f"D{i + 1}" for i in range(num_psites)]
    return names


def generate_labels_rand(num_psites: int) -> list[str]:
    """State labels [R, P, P_subset...] for the random model (2^n - 1 phospho states)."""
    return ["mRNA (R)", "Protein (P)"] + [f"P{lbl}" for lbl in subset_labels(num_psites)]


def generate_labels_ds(num_psites: int) -> list[str]:
    return ["mRNA (R)", "Protein (P)"] + [f"P{i + 1}" for i in range(num_psites)]


def get_param_names(model: str, num_psites: int) -> list[str]:
    return get_param_names_rand(num_psites) if model == "randmod" else get_param_names_ds(num_psites)


def generate_labels(model: str, num_psites: int) -> list[str]:
    return generate_labels_rand(num_psites) if model == "randmod" else generate_labels_ds(num_psites)


def future_times(n_new: int, ratio: float | None = None,
                 tp=None) -> "np.ndarray":
    """Extend a time grid by n_new points with geometrically growing gaps
    (spec: reference config/config.py:228-246)."""
    import numpy as np

    if tp is None:
        tp = np.asarray([0.0, 0.5, 0.75, 1.0, 2.0, 4.0, 8.0, 16.0, 30.0,
                         60.0, 120.0, 240.0, 480.0, 960.0])
    times = list(np.asarray(tp, float))
    if ratio is None:
        ratio = times[-1] / times[-2]
    for _ in range(n_new):
        times.append(times[-1] * ratio)
    return np.asarray(times)
