"""Softplus parameter packing: flat raw theta <-> physical parameter pytree.

Spec: reference ``global_model/params.py:26-132`` — positivity via
softplus, flat vector ordered [c_k, A_i, B_i, C_i, D_i, Dp_i, E_i, tf_scale]
with a `slices` dict, physical bounds mapped through inverse softplus.

Per-site Dp_i travels flat in reference order (protein-major, valid sites
only) and is re-padded to (N, Smax) on unpack for the dense kernels.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def softplus(x):
    x = jnp.asarray(x)
    return jnp.where(x > 20.0, x, jnp.log1p(jnp.exp(jnp.minimum(x, 20.0))))


def inv_softplus(y):
    y = np.maximum(np.asarray(y, float), 1e-12)
    # log(expm1(y)); stable for large y
    return np.where(y > 20.0, y, np.log(np.expm1(y)))


def init_raw_params(defaults: dict, topo, bounds_config: dict,
                    custom_bounds: dict | None = None):
    """Flatten defaults into raw theta0 plus slices and raw-space bounds.

    defaults: physical dict with Dp_i as padded (N, Smax).
    Returns (theta0, slices, xl, xu) exactly as the reference contract.
    """
    from phoskintime_tpu.network.system import flat_site_values

    custom_bounds = custom_bounds or {}
    vecs, slices, bl, bu = [], {}, [], []
    curr = 0

    def phys_bounds(key):
        if key in custom_bounds:
            return custom_bounds[key]
        return bounds_config[key]

    for k in ["c_k", "A_i", "B_i", "C_i", "D_i", "Dp_i", "E_i"]:
        v = defaults[k]
        if k == "Dp_i":
            v = flat_site_values(topo, np.asarray(v))
        raw = inv_softplus(v)
        vecs.append(np.atleast_1d(raw))
        n = np.atleast_1d(raw).shape[0]
        slices[k] = slice(curr, curr + n)
        curr += n
        lo, hi = phys_bounds(k)
        bl.extend([float(inv_softplus(lo))] * n)
        bu.extend([float(inv_softplus(hi))] * n)

    raw_tf = inv_softplus(np.asarray([defaults["tf_scale"]], float))
    vecs.append(raw_tf)
    slices["tf_scale"] = slice(curr, curr + 1)
    lo, hi = phys_bounds("tf_scale")
    bl.append(float(inv_softplus(lo)))
    bu.append(float(inv_softplus(hi)))

    theta0 = np.concatenate(vecs)
    return theta0, slices, np.asarray(bl), np.asarray(bu)


def unpack_params(theta, slices, topo):
    """Raw theta -> physical parameter pytree (softplus), Dp re-padded.

    jit/vmap-safe: slice bounds and the pad gather are static.
    """
    smax = topo.max_sites
    n_sites = np.asarray(topo.n_sites)
    # static gather indices: padded slot (i, j) -> flat site index (or 0)
    gather = np.zeros((topo.N, smax), np.int32)
    valid = np.zeros((topo.N, smax), bool)
    c = 0
    for i in range(topo.N):
        ns = int(n_sites[i])
        gather[i, :ns] = np.arange(c, c + ns)
        valid[i, :ns] = True
        c += ns

    dp_flat = softplus(theta[slices["Dp_i"]])
    dp_flat = jnp.concatenate([dp_flat, jnp.zeros((1,), dp_flat.dtype)])
    gather_j = jnp.asarray(np.where(valid, gather, c))  # invalid -> the 0 pad
    dp_pad = dp_flat[gather_j] * jnp.asarray(valid, dp_flat.dtype)

    return {
        "c_k": softplus(theta[slices["c_k"]]),
        "A_i": softplus(theta[slices["A_i"]]),
        "B_i": softplus(theta[slices["B_i"]]),
        "C_i": softplus(theta[slices["C_i"]]),
        "D_i": softplus(theta[slices["D_i"]]),
        "Dp_i": dp_pad,
        "E_i": softplus(theta[slices["E_i"]]),
        "tf_scale": softplus(theta[slices["tf_scale"]])[0],
    }
