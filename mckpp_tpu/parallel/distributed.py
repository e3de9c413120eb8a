"""Multi-host distribution: jax.distributed init, host-local column layout,
sharded host<->device data motion, and diagnostic gathers.

This is the TPU-native replacement for the reference's intended
MPI-over-columns decomposition (README.md:5; MPI is initialized today only
as XIOS's transport, mckpp_xios_control.F90:20-28; production runs 1 task,
run/KPPocean.slurm:5-20).  Columns never exchange state, so the design is:

* one process per host, ``jax.distributed.initialize`` at entry;
* a 1-D ``Mesh`` over every chip of every host, column axis sharded;
* each host reads only *its* slab of forcing/ancillary files and assembles
  the global sharded array with ``jax.make_array_from_process_local_data``
  (host -> its own chips only; no cross-host data motion on the read path);
* diagnostics/restart gather with ``multihost_utils.process_allgather``
  only when a single writer is wanted, else each host writes its shard.

Single-process (1 host, N chips — or the CPU virtual-device test mesh) is
the degenerate case of the same code path.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .sharding import COLS, make_mesh, col_sharding, pad_columns, unpad_columns


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Initialize multi-host JAX.  On TPU pods all arguments are inferred
    from the runtime; on other fabrics pass them (or set
    KPP_COORDINATOR/KPP_NUM_PROCS/KPP_PROC_ID).  No-op when already
    initialized or when the job is single-process."""
    coordinator_address = coordinator_address or os.environ.get("KPP_COORDINATOR")
    if num_processes is None and "KPP_NUM_PROCS" in os.environ:
        num_processes = int(os.environ["KPP_NUM_PROCS"])
    if process_id is None and "KPP_PROC_ID" in os.environ:
        process_id = int(os.environ["KPP_PROC_ID"])
    if coordinator_address is None and num_processes is None:
        # TPU pod: the runtime supplies everything; elsewhere single-process.
        try:
            jax.distributed.initialize()
        except Exception:
            pass            # single-process fallback (e.g. CPU tests)
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


@dataclasses.dataclass(frozen=True)
class ColumnLayout:
    """Host-local view of the globally sharded column axis.

    ``ncol`` is the *padded* global column count (a multiple of the device
    count); ``lo:hi`` is this process's contiguous slice.  The reference's
    analog is the per-rank column block an MPI decomposition would own.
    """
    mesh: Mesh
    ncol: int
    ncol_unpadded: int

    @property
    def sharding(self) -> NamedSharding:
        return col_sharding(self.mesh)

    @property
    def n_devices(self) -> int:
        return int(np.prod(self.mesh.devices.shape))

    @property
    def lo(self) -> int:
        return self.ncol // jax.process_count() * jax.process_index()

    @property
    def hi(self) -> int:
        return self.ncol // jax.process_count() * (jax.process_index() + 1)

    def global_array(self, arr) -> jax.Array:
        """Build the globally sharded device array from host data.

        Accepts either the full ``(ncol, ...)`` array (every host read the
        whole slab — single-process path, or small ancillaries) or just this
        host's ``(hi-lo, ...)`` slice (host-local reads).  Host rows not
        owned by this process are ignored.
        """
        a = np.asarray(arr)
        if a.shape[0] not in (self.ncol, self.hi - self.lo):
            # unpadded full array: pad the trailing columns with zeros
            if a.shape[0] == self.ncol_unpadded:
                pad = [(0, self.ncol - a.shape[0])] + [(0, 0)] * (a.ndim - 1)
                a = np.pad(a, pad)
            else:
                raise ValueError(
                    f"global_array: got leading dim {a.shape[0]}, expected "
                    f"{self.ncol} (global) or {self.hi - self.lo} (local)")
        if jax.process_count() == 1:
            return jax.device_put(jnp.asarray(a), self.sharding)
        local = a if a.shape[0] == self.hi - self.lo else a[self.lo:self.hi]
        return jax.make_array_from_process_local_data(self.sharding, local)

    def shard_tree(self, tree):
        """Pad + place a column-batched pytree on the mesh.  Padded columns
        are marked inactive (l_ocean/run_physics masked) by pad_columns."""
        padded, _ = pad_columns(tree, self.ncol)
        return jax.tree_util.tree_map(self.global_array, padded)

    def gather(self, arr) -> np.ndarray:
        """Fetch a sharded array to host, unpadded — the diagnostic/restart
        gather (device->host only; cross-host gather uses allgather)."""
        if jax.process_count() == 1:
            return np.asarray(arr)[: self.ncol_unpadded]
        from jax.experimental import multihost_utils
        full = multihost_utils.process_allgather(arr, tiled=True)
        return np.asarray(full)[: self.ncol_unpadded]

    def gather_tree(self, tree):
        return jax.tree_util.tree_map(self.gather, tree)


def make_layout(ncol_unpadded: int, mesh: Optional[Mesh] = None) -> ColumnLayout:
    """Layout for ``ncol_unpadded`` columns over all devices of all hosts."""
    if mesh is None:
        mesh = make_mesh()
    ndev = int(np.prod(mesh.devices.shape))
    # pad to a multiple of the global device count; since devices are
    # evenly spread over processes, host slices then align with shards
    ncol = ncol_unpadded + (-ncol_unpadded) % max(ndev, 1)
    return ColumnLayout(mesh=mesh, ncol=ncol, ncol_unpadded=ncol_unpadded)
