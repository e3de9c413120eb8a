"""Subprocess worker for the multi-process jax.distributed CPU tests.

Runs the REAL sharded model loop — flux-file reads, SST ancillary refresh
on its cadence, the jitted sharded step — over a ColumnLayout built from
all global devices, with host-local slab reads when multi-process.  The
gathered trajectory is saved by process 0; the test asserts the 2-process
run equals the single-process run bitwise (the MPI-over-columns
decomposition proof the reference never had, README.md:5).

Invoked as:
    python multihost_worker.py --nprocs 2 --procid 0 \
        --coordinator localhost:PORT --devcount 2 --datadir D --out OUT.npz
"""

import argparse
import os
import sys

parser = argparse.ArgumentParser()
parser.add_argument("--nprocs", type=int, required=True)
parser.add_argument("--procid", type=int, required=True)
parser.add_argument("--coordinator", default="")
parser.add_argument("--devcount", type=int, default=2)
parser.add_argument("--datadir", required=True)
parser.add_argument("--out", required=True)
parser.add_argument("--steps", type=int, default=4)
args = parser.parse_args()

# hermetic CPU platform with N virtual devices (must precede jax import)
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + f" --xla_force_host_platform_device_count="
                             f"{args.devcount}").strip()
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax                            # noqa: E402
import jax.experimental.pallas        # noqa: E402,F401  (see conftest.py)
from jax._src import xla_bridge as _xb  # noqa: E402

for _plat in ("axon", "tpu"):
    _xb._backend_factories.pop(_plat, None)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_test_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

if args.nprocs > 1:
    jax.distributed.initialize(coordinator_address=args.coordinator,
                               num_processes=args.nprocs,
                               process_id=args.procid)

import dataclasses                    # noqa: E402

import jax.numpy as jnp               # noqa: E402
import numpy as np                    # noqa: E402

from mckpp_tpu.config import KppConfig, DomainConfig, TimeConfig  # noqa: E402
from mckpp_tpu.models.column_model import KppModel  # noqa: E402
from mckpp_tpu.parallel import sharding as sh       # noqa: E402
from mckpp_tpu.parallel import distributed as dist  # noqa: E402
from mckpp_tpu.io.ancillaries import BoundaryManager, FluxFileReader  # noqa: E402
from mckpp_tpu import forcing as forcing_mod        # noqa: E402
from mckpp_tpu.grid import coriolis                 # noqa: E402
from mckpp_tpu.state import init_params             # noqa: E402

NX, NY, NZ = 5, 3, 6
NCOL = NX * NY


def build_config(datadir):
    cfg = KppConfig(
        domain=DomainConfig(nx=NX, ny=NY, nz=NZ, dmax=200.0),
        time=TimeConfig(dtsec=3600.0, ndtocn=2, startt=0.0, finalt=1.0),
        dtype="float64")
    cfg = dataclasses.replace(
        cfg,
        boundary=dataclasses.replace(
            cfg.boundary, l_relax_sst=True, l_climsst=True,
            l_upd_climsst=True, ndtupdsst=2,
            sst_file=f"{datadir}/sst.nc"),
        forcing=dataclasses.replace(
            cfg.forcing, l_fluxdata=True,
            forcing_file=f"{datadir}/fluxes.nc"))
    return cfg


def main():
    # build the collective clique while both processes are here, before
    # the per-process compile phase (see distributed.warmup_collectives)
    dist.warmup_collectives()
    cfg = build_config(args.datadir)
    model = KppModel(cfg)
    nzp1 = NZ + 1
    zm = np.asarray(model.grid.zm)
    t0 = np.tile(20.0 + 6.0 * np.exp(zm / 60.0), (NCOL, 1))
    s0 = np.tile(35.0 - 0.3 * np.exp(zm / 90.0), (NCOL, 1))
    u0 = np.zeros((NCOL, nzp1, 2))
    prm = init_params(NCOL, nzp1, dtype=model.dtype)
    lat = jnp.linspace(-25.0, 25.0, NCOL, dtype=model.dtype)
    prm = dataclasses.replace(
        prm, f=coriolis(lat), dlat=lat,
        relax_sst=jnp.full((NCOL,), 1.0 / (3 * 86400.0), model.dtype))
    st, prm, frc = model.warm_start(jnp.asarray(u0), jnp.asarray(t0),
                                    jnp.asarray(s0), prm)

    mesh = sh.make_mesh()                   # all global devices
    layout = dist.make_layout(NCOL, mesh)
    st = layout.shard_tree(st)
    prm = layout.shard_tree(prm)
    frc = layout.shard_tree(frc)

    flux_reader = FluxFileReader(cfg, 0.0, 0.0)
    flux_reader.set_layout(layout)
    mgr = BoundaryManager(cfg, 0.0, 0.0, nzp1, np.zeros(NCOL),
                          prefetch=False)
    mgr.set_layout(layout)

    step = sh.make_sharded_step(model, mesh)
    for nt in range(1, args.steps + 1):
        time_days = (nt - 1) * cfg.time.dto / 86400.0
        if (nt - 1) % cfg.time.ndtocn == 0:
            raw = flux_reader(time_days)
            st, frc = forcing_mod.update_fluxes(
                cfg, st, prm, frc, raw, jnp.asarray(nt <= 1), model.grid.dm)
        if nt != 1:
            frc = mgr.update(nt, time_days, frc)
        st = step(st, prm, frc, jnp.asarray(nt <= 1))
    jax.block_until_ready(st)

    # exercised-branch proof: multi-process runs must actually take the
    # process_count>1 paths
    if args.nprocs > 1:
        assert jax.process_count() == args.nprocs
        lo, hi = layout.lo, layout.hi
        assert (hi - lo) * args.nprocs == layout.ncol

    out = {
        "x": layout.gather(st.x), "u": layout.gather(st.u),
        "hmix": layout.gather(st.hmix), "sst0": layout.gather(frc.sst0),
        "sflux": layout.gather(frc.sflux),
    }
    if jax.process_index() == 0:
        np.savez(args.out, **out)
    # all processes exit together (gather is itself a barrier)


if __name__ == "__main__":
    main()
