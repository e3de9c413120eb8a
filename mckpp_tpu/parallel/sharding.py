"""Column-axis SPMD over a device mesh.

The reference's sole parallel axis is data parallelism over independent
columns (OpenMP today, MPI-over-columns intended; SURVEY.md section 2.6).
TPU-native equivalent: a 1-D ``jax.sharding.Mesh`` over all chips/hosts,
every State/Forcing/ColumnParams leaf sharded along its leading column
axis.  Columns never exchange state, so the only cross-device traffic is

* the scalar all-reduce implied by the batched while-loop conditions in
  ocnstep (any-column-still-iterating), and
* host->device forcing scatter / device->host diagnostic gather,

both of which ride ICI and overlap with column compute.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

COLS = "cols"


def make_mesh(devices=None) -> Mesh:
    """1-D mesh over all (or the given) devices, axis name 'cols'."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (COLS,))


def col_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (column) axis; replicate the rest."""
    return NamedSharding(mesh, P(COLS))


def pad_columns(tree, multiple: int, *, fill_inactive: bool = True):
    """Pad every leaf's leading axis up to a multiple of ``multiple``.

    Padded columns are marked inactive when the tree has
    l_ocean/run_physics fields (so physics masks them out).
    Returns (padded_tree, original_ncol).
    """
    leaves = jax.tree_util.tree_leaves(tree)
    ncol = leaves[0].shape[0]
    npad = (-ncol) % multiple
    if npad == 0:
        return tree, ncol

    def pad(a):
        pad_width = [(0, npad)] + [(0, 0)] * (a.ndim - 1)
        return jnp.pad(a, pad_width)

    padded = jax.tree_util.tree_map(pad, tree)
    if fill_inactive and hasattr(padded, "run_physics"):
        mask = jnp.arange(ncol + npad) < ncol
        padded = dataclasses.replace(
            padded,
            l_ocean=padded.l_ocean & mask,
            run_physics=padded.run_physics & mask)
    return padded, ncol


def unpad_columns(tree, ncol: int):
    return jax.tree_util.tree_map(lambda a: a[:ncol], tree)


def shard_columns(tree, mesh: Mesh):
    """Place a column-batched pytree on the mesh, sharded over columns."""
    sh = col_sharding(mesh)
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sh), tree)


def make_sharded_step(model, mesh: Mesh):
    """Jit the model step with explicit column shardings over the mesh.

    Returns step(st, prm, frc, first_step) -> st with all operands and
    results sharded along the column axis.
    """
    sh = col_sharding(mesh)
    rep = NamedSharding(mesh, P())

    def step(st, prm, frc, first_step, with_diags=True):
        return model._step(st, prm, frc, first_step, with_diags=with_diags)

    # with_diags is static and must be POSITIONAL: pjit rejects kwargs
    # when in_shardings is given
    jitted = jax.jit(
        step,
        static_argnums=(4,),
        in_shardings=(sh, sh, sh, rep),
        out_shardings=sh,
        donate_argnums=(0,))

    def wrapper(st, prm, frc, first_step, with_diags=True):
        return jitted(st, prm, frc, first_step, bool(with_diags))

    wrapper._jitted = jitted        # AOT access (background pre-compile)
    return wrapper
