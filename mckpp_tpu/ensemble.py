"""Perturbed-physics ensembles as column-batch replication.

Columns are independent (the model's defining property, SURVEY.md §2.6), so
an N-member ensemble IS just N copies of the column set stacked along the
batch axis: members ride the same fused kernels, the same mesh sharding and
the same diagnostics machinery with zero new parallel code — the TPU-native
answer to running e.g. the BASELINE.json 10-member perturbed-physics global
configuration on a pod slice.

Perturbations are applied per member to any (State, ColumnParams, Forcing)
leaf — initial-condition noise, per-member Jerlov types, forcing scalings —
via a user callback.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp


def replicate(tree, n_members: int):
    """Stack ``n_members`` copies of a column-batched pytree along the
    column axis: (ncol, ...) -> (n_members * ncol, ...).  Member m owns
    rows [m*ncol, (m+1)*ncol)."""
    def rep(a):
        return jnp.concatenate([a] * n_members, axis=0)
    return jax.tree_util.tree_map(rep, tree)


def member_slice(tree, member: int, ncol: int):
    """View one member's columns of a replicated pytree."""
    return jax.tree_util.tree_map(
        lambda a: a[member * ncol:(member + 1) * ncol], tree)


def make_ensemble(st, prm, frc, n_members: int,
                  perturb: Optional[Callable] = None,
                  key: Optional[jax.Array] = None):
    """Build an ensemble state from a single-member (st, prm, frc).

    ``perturb(member_index, key, st_m, prm_m, frc_m) -> (st_m, prm_m,
    frc_m)`` customizes each member (member 0 conventionally unperturbed).
    Returns the stacked (st, prm, frc) with ``n_members * ncol`` columns.
    """
    ncol = st.u.shape[0]
    members = []
    for m in range(n_members):
        sm, pm, fm = st, prm, frc
        if perturb is not None and m > 0:
            k = None if key is None else jax.random.fold_in(key, m)
            sm, pm, fm = perturb(m, k, sm, pm, fm)
        members.append((sm, pm, fm))
    cat = lambda trees: jax.tree_util.tree_map(
        lambda *xs: jnp.concatenate(xs, axis=0), *trees)
    st_e = cat([t[0] for t in members])
    prm_e = cat([t[1] for t in members])
    frc_e = cat([t[2] for t in members])
    return st_e, prm_e, frc_e


def ensemble_mean_spread(arr, n_members: int):
    """(n_members * ncol, ...) -> (mean, spread) over the member axis."""
    per = arr.reshape((n_members, -1) + arr.shape[1:])
    return per.mean(axis=0), per.std(axis=0)
