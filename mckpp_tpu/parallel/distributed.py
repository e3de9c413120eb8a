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
  only when a single writer is wanted (write_mode="single", XIOS
  one_file); with write_mode="shard" each host writes its own row slab
  with no collective at all (XIOS multiple_file; merge offline with
  tools/merge_shards.py).

Single-process (1 host, N chips — or the CPU virtual-device test mesh) is
the degenerate case of the same code path.
"""

from __future__ import annotations

import dataclasses
import os
from functools import cached_property
from typing import Optional, Tuple

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
    else:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    warmup_collectives()


def warmup_collectives() -> None:
    """Establish the cross-process collective clique while every process
    is at the same program point (right after initialize), BEFORE the
    per-process compile phase.  Collective-backend context setup (e.g.
    gloo on CPU) exchanges peer addresses under a short timeout; if the
    first real collective fires while a peer is still deep in a long
    XLA compile, that exchange can time out.  One tiny allgather here
    builds the all-device context once, deterministically."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices("mckpp:init")
    # host-collective clique (one rank per process): process_allgather path
    np.asarray(multihost_utils.process_allgather(np.zeros((1,), np.float32)))
    # all-DEVICE clique: an all-reduce over an array sharded across every
    # device — the clique the sharded step's collectives use
    mesh = Mesh(np.asarray(jax.devices()), ("d",))
    arr = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("d")),
        np.zeros((len(jax.local_devices()),), np.float32))
    np.asarray(jax.jit(jnp.sum)(arr))


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

    @cached_property
    def _local_slab(self) -> Tuple[int, int]:
        """This process's [lo, hi) of the padded column axis, derived from
        the sharding's actual device->index map (NOT assumed): the union of
        the addressable devices' shards, verified to be one contiguous
        slab.  Guards against device orderings where a process's shards
        would not be contiguous — host-local reads would silently scatter
        the wrong rows."""
        imap = self.sharding.devices_indices_map((self.ncol,))
        spans = sorted(
            ((imap[d][0].start or 0,
              self.ncol if imap[d][0].stop is None else imap[d][0].stop)
             for d in self.sharding.addressable_devices))
        lo, pos = spans[0][0], spans[0][0]
        for a, b in spans:
            if a != pos:
                raise ValueError(
                    f"process {jax.process_index()}: addressable shards "
                    f"{spans} are not one contiguous slab; host-local "
                    "ancillary reads require contiguous per-process shards")
            pos = b
        return lo, pos

    @property
    def lo(self) -> int:
        return self._local_slab[0]

    @property
    def hi(self) -> int:
        return self._local_slab[1]

    def global_array(self, arr, local: Optional[bool] = None) -> jax.Array:
        """Build the globally sharded device array from host data.

        ``local=True``: ``arr`` is this host's ``(hi-lo, ...)`` slab
        (host-local reads).  ``local=False``: ``arr`` is the full domain,
        padded ``(ncol, ...)`` or unpadded ``(ncol_unpadded, ...)`` (the
        padding columns are zero-filled).  ``local=None`` infers from the
        shape, raising if ambiguous — callers on the multi-host path
        should always pass it explicitly.

        A single-process, already-padded DEVICE array takes a pure
        device-side reshard: the ``np.asarray`` path would fetch the
        whole array to host and re-upload it, doubling the initial-state
        transfer at production scale for nothing.
        """
        if (jax.process_count() == 1 and isinstance(arr, jax.Array)
                and arr.shape[0] == self.ncol):
            return jax.device_put(arr, self.sharding)
        a = np.asarray(arr)
        want_local = self.hi - self.lo
        if local is None:
            is_local = a.shape[0] == want_local \
                and a.shape[0] not in (self.ncol, self.ncol_unpadded)
            is_full = a.shape[0] in (self.ncol, self.ncol_unpadded)
            if is_full and a.shape[0] == want_local \
                    and jax.process_count() > 1:
                raise ValueError(
                    f"global_array: leading dim {a.shape[0]} is both a "
                    "valid local slab and a valid full domain; pass "
                    "local=True/False explicitly")
            local = is_local
        if local:
            if a.shape[0] != want_local:
                raise ValueError(
                    f"global_array(local=True): got leading dim "
                    f"{a.shape[0]}, expected {want_local}")
            loc = a
        else:
            if a.shape[0] == self.ncol_unpadded and a.shape[0] != self.ncol:
                pad = [(0, self.ncol - a.shape[0])] + [(0, 0)] * (a.ndim - 1)
                a = np.pad(a, pad)
            elif a.shape[0] != self.ncol:
                raise ValueError(
                    f"global_array: got leading dim {a.shape[0]}, expected "
                    f"{self.ncol} (padded), {self.ncol_unpadded} "
                    f"(unpadded) or {want_local} with local=True")
            loc = a[self.lo:self.hi]
        if jax.process_count() == 1:
            # with one process the local slab IS the full domain
            return jax.device_put(jnp.asarray(loc if local else a),
                                  self.sharding)
        return jax.make_array_from_process_local_data(self.sharding, loc)

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

    def local_shard(self, arr) -> np.ndarray:
        """This process's rows [lo, min(hi, npts)) of a sharded array,
        fetched from its OWN addressable device shards only — a pure
        device->host copy, NO collective.  The per-host write path
        (write_mode='shard', the XIOS multiple_file analog) uses this so
        emits never synchronize processes."""
        if isinstance(arr, jax.Array) and jax.process_count() > 1:
            shards = sorted(arr.addressable_shards,
                            key=lambda s: s.index[0].start or 0)
            loc = np.concatenate([np.asarray(s.data) for s in shards],
                                 axis=0)
        else:
            loc = np.asarray(arr)[self.lo:self.hi]
        lo_u, hi_u = self.local_rows(self.ncol_unpadded)
        return loc[: hi_u - lo_u]

    def gather_tree(self, tree):
        return jax.tree_util.tree_map(self.gather, tree)

    def local_rows(self, npts: int) -> Tuple[int, int]:
        """This process's slab clamped to the unpadded domain [0, npts) —
        the rows a host-local ancillary read should fetch."""
        return min(self.lo, npts), min(self.hi, npts)


def any_across_processes(flag: bool) -> bool:
    """Logical OR of a host-side boolean over all processes.  Used for
    decisions that must be domain-global but are detected on host-local
    slabs (e.g. the SST Kelvin-autoconvert heuristic,
    mckpp_read_sst_mod.F90:75-82, which the reference evaluates over the
    whole domain, mckpp_read_sst_mod.F90:84-88)."""
    if jax.process_count() == 1:
        return bool(flag)
    from jax.experimental import multihost_utils
    flags = multihost_utils.process_allgather(np.asarray([bool(flag)]))
    return bool(np.any(flags))


def make_layout(ncol_unpadded: int, mesh: Optional[Mesh] = None,
                pad_multiple: int = 1) -> ColumnLayout:
    """Layout for ``ncol_unpadded`` columns over all devices of all hosts.

    ``pad_multiple``: additionally pad so each device's shard is a
    multiple of it (e.g. the Pallas column-tile size — production column
    counts like 453*319 = 144,507 are odd and would otherwise leave the
    kernel without a valid tile)."""
    if mesh is None:
        mesh = make_mesh()
    ndev = int(np.prod(mesh.devices.shape))
    # pad to a multiple of the global device count (host slices then align
    # with shards) times the per-shard tile multiple
    m = max(ndev, 1) * max(pad_multiple, 1)
    ncol = ncol_unpadded + (-ncol_unpadded) % m
    return ColumnLayout(mesh=mesh, ncol=ncol, ncol_unpadded=ncol_unpadded)
