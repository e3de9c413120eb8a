"""Main program: the TPU-native equivalent of PROGRAM mckpp_ocean_model_3d
(mckpp_ocean_model_3D.F90:22-76).

Usage:  python -m mckpp_tpu.cli [--namelist 3D_ocn.nml] [--data-dir DIR]
        [--output-dir DIR] [--steps N] [--devices all|1]

Reads the reference-format namelist, assembles the model (setup.build),
and runs the time loop with per-step flux/boundary updates, diagnostic
streams, restart writes and the named-timer report.
"""

from __future__ import annotations

import argparse
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

from .utils import namelist as nml
from .utils.timer import Timers
from .utils.logging import mckpp_print
from . import setup as setup_mod
from . import forcing as forcing_mod
from .io.diagnostics import DiagnosticsManager, default_streams, Stream
from .io.restart import RestartControl
from .parallel import sharding as shard
from .parallel import distributed as dist


def main(argv=None):
    p = argparse.ArgumentParser(description="TPU-native MC-KPP ocean model")
    p.add_argument("--namelist", default="3D_ocn.nml")
    p.add_argument("--data-dir", default=".")
    p.add_argument("--output-dir", default=".")
    p.add_argument("--steps", type=int, default=None,
                   help="override number of ocean timesteps")
    p.add_argument("--iodef", default=None,
                   help="iodef.xml-style stream-config file (overrides the "
                        "namelist's IODEF_FILE)")
    p.add_argument("--dtype", choices=["float64", "float32"], default=None,
                   help="override precision: float64 = reference parity "
                        "(the namelist default, -fdefault-real-8), "
                        "float32 = TPU production mode")
    p.add_argument("--multi-device", action="store_true",
                   help="shard the column axis over all local devices")
    p.add_argument("--distributed", action="store_true",
                   help="multi-host: jax.distributed.initialize, shard the "
                        "column axis over every chip of every host")
    p.add_argument("--profile", default=None, metavar="DIR",
                   help="capture a jax.profiler device trace of a few "
                        "steady-state steps (flux update + physics + "
                        "diagnostic emit) into DIR; view with xprof/"
                        "tensorboard-plugin-profile.  The SURVEY §5 "
                        "tracing hook: host timers cover the loop, this "
                        "covers on-device time.")
    p.add_argument("--profile-steps", type=int, default=6,
                   help="number of steps to trace under --profile")
    p.add_argument("--output-mode", choices=["single", "shard"],
                   default="single",
                   help="diagnostic writes: 'single' gathers each emitted "
                        "window to process 0 (XIOS one_file); 'shard' has "
                        "every process write its own row slab with zero "
                        "cross-host transfer (XIOS multiple_file) — merge "
                        "with tools/merge_shards.py")
    args = p.parse_args(argv)

    if args.distributed:
        dist.initialize()

    routine = "MCKPP_TPU_MAIN"
    # persistent XLA compile cache: the step function costs tens of
    # seconds to compile per (shape, dtype, with_diags) variant; cache it
    # across runs (override dir with MCKPP_COMPILE_CACHE, disable with
    # MCKPP_COMPILE_CACHE=0)
    cache_dir = os.environ.get(
        "MCKPP_COMPILE_CACHE",
        os.path.join(os.path.expanduser("~/.cache"), "mckpp_jax_cache"))
    if cache_dir != "0":
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    timers = Timers()
    timers.start("Initialization")
    cfg, extras = nml.load_config(args.namelist)
    if args.dtype:
        import dataclasses as _dc
        cfg = _dc.replace(cfg, dtype=args.dtype)
    if cfg.dtype == "float64" and not jax.config.jax_enable_x64:
        # the reference compiles with -fdefault-real-8; honor it rather than
        # silently truncating every array to f32
        jax.config.update("jax_enable_x64", True)
    mckpp_print(routine, f"read namelist {args.namelist}")
    for grp, vals in extras.items():
        # declared-but-inert variables (Fortran sizing params, flags dead
        # in the reference too) — surfaced, never silently dropped
        mckpp_print(routine, f"namelist {grp}: not modeled, ignored: {vals}")
    model, st, prm, frc, flux_provider, mgr = setup_mod.build(
        cfg, args.data_dir)
    ncol = st.u.shape[0]
    mckpp_print(routine, f"initialized {ncol} columns x {model.grid.nz} levels")

    step_fn = model.step
    unpad = lambda tree: tree
    l_ocean_np = np.asarray(prm.l_ocean)       # unpadded output-domain mask
    # rectilinear domain axes for the output files (XIOS domain lon/lat)
    lons_ax = np.asarray(prm.dlon).reshape(cfg.domain.ny, cfg.domain.nx)[0]
    lats_ax = np.asarray(prm.dlat).reshape(cfg.domain.ny, cfg.domain.nx)[:, 0]
    layout = None
    multi = (args.multi_device or args.distributed) and len(jax.devices()) > 1
    pad_mult = (cfg.physics.pass_block
                if model.pass_impl.startswith("pallas") else 1)
    # the Pallas kernel needs a column count divisible by its tile; odd
    # production domains (453x319 = 144,507) go through the padded layout
    # even single-device
    if multi or (ncol % pad_mult != 0):
        mesh = shard.make_mesh(jax.devices() if multi else jax.devices()[:1])
        layout = dist.make_layout(ncol, mesh, pad_multiple=pad_mult)
        st = layout.shard_tree(st)
        prm = layout.shard_tree(prm)
        frc = layout.shard_tree(frc)
        mgr.set_layout(layout)
        ncol = layout.ncol
        sharded = shard.make_sharded_step(model, mesh)

        def step_fn(s, pr, fr, first_step=False, with_diags=True):
            return sharded(s, pr, fr, jnp.asarray(first_step),
                           with_diags=with_diags)

        unpad = layout.gather_tree

        if flux_provider is not None:
            if hasattr(flux_provider, "set_layout"):
                # host-local slab reads: the provider shards its own output
                flux_provider.set_layout(layout)
            else:
                inner_provider = flux_provider

                def flux_provider(time_days):
                    raw = inner_provider(time_days)
                    return jax.tree_util.tree_map(
                        lambda a: layout.global_array(a, local=False), raw)

        mckpp_print(
            routine,
            f"sharded over {layout.n_devices} devices "
            f"({jax.process_count()} hosts), {ncol} padded columns")

    iodef_path = args.iodef or cfg.output.iodef_file
    if cfg.output.streams:
        streams = [Stream(name, red, freq)
                   for (name, red, freq) in cfg.output.streams]
    elif iodef_path:
        from .io.streams import parse_iodef
        if not os.path.isabs(iodef_path):
            iodef_path = os.path.join(args.data_dir, iodef_path)
        streams = parse_iodef(iodef_path, cfg.time.dto)
        mckpp_print(routine, f"output streams from {iodef_path}: "
                    f"{[s.name for s in streams]}")
    else:
        streams = default_streams(
            cfg.time.dto, split_freq_days=cfg.output.split_freq_days)
    diag = DiagnosticsManager(
        streams, cfg.domain.nx, cfg.domain.ny,
        model.grid.zm, outdir=args.output_dir,
        start_time_days=cfg.time.startt, dto_seconds=cfg.time.dto,
        l_ocean=l_ocean_np, write_mode=args.output_mode,
        lons=lons_ax, lats=lats_ax)
    if layout is not None:
        diag.set_layout(layout)
    restart = RestartControl(
        f"{args.output_dir}/{cfg.output.restart_outfile}",
        cfg.output.ndt_per_restart, cfg.time.num_timesteps,
        cfg.time.dto, cfg.time.startt,
        netcdf_grid=((cfg.domain.nx, cfg.domain.ny)
                     if cfg.output.l_restart_netcdf else None))
    timers.stop("Initialization")

    num_steps = args.steps or cfg.time.num_timesteps
    _snapshot = jax.jit(
        lambda tree: jax.tree_util.tree_map(jnp.copy, tree))

    # Flux prefetch: the next flux-cadence step's file read + host->device
    # transfer runs on a background thread while the model steps (the
    # reference reads synchronously every ndtocn, mckpp_fluxes_mod.F90:35;
    # here the read+put latency — significant through a slow host link —
    # overlaps compute).  One-slot lookahead keeps memory bounded.
    from concurrent.futures import ThreadPoolExecutor
    _flux_exec = ThreadPoolExecutor(max_workers=1)
    _flux_next = {}                    # time_days -> Future

    def _flux_at(time_days):
        fut = _flux_next.pop(time_days, None)
        if fut is not None:
            return fut.result()
        if flux_provider is not None:
            return flux_provider(time_days)
        return forcing_mod.constant_test_fluxes(ncol, model.dtype)

    def _flux_schedule(time_days):
        if flux_provider is None or time_days in _flux_next:
            return
        _flux_next[time_days] = _flux_exec.submit(flux_provider, time_days)

    # Background pre-compile of the with_diags variant the FIRST step does
    # not use: its trace+compile overlaps the loop's early steps instead of
    # stalling the loop when the cadence first flips (the compiled
    # executable lands in the persistent cache, which the loop's own jit
    # call then deserializes).  The variant step 1 needs is compiled by
    # step 1 itself — racing a duplicate would only burn CPU.
    first_full = (diag.needs_full(1)
                  or (cfg.output.l_restartw and restart.due(1)))
    other_variant = not first_full

    def _precompile_other():
        try:
            sds = jax.tree_util.tree_map(
                lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype),
                (st, prm, frc))
            # concrete jnp.asarray(False) — not a ShapeDtypeStruct — so
            # the cache key (incl. weak_type) matches the loop's own
            # jnp.asarray(first_step) argument exactly
            fs = jnp.asarray(False)
            if layout is not None:
                sharded._jitted.lower(*sds, fs, other_variant).compile()
            else:
                model._step_jit.lower(*sds, fs,
                                      with_diags=other_variant).compile()
        except Exception as e:           # best-effort warm-up only
            mckpp_print(routine, f"background pre-compile skipped: {e}")

    # Multi-step dispatch chaining (models/chain.py): every event-free
    # span of steps — flux updates, ancillary refreshes, emits and
    # restarts bound it — runs as ONE jitted call, with the per-step
    # diagnostic accumulation folded in.  MCKPP_CHAIN=0 restores the
    # per-step dispatch loop (they produce bitwise-identical
    # trajectories; tests/test_chain.py).
    use_chain = os.environ.get("MCKPP_CHAIN", "1") != "0"
    # the warm-up only pays off through the persistent compile cache (the
    # AOT executable itself is discarded): with the cache disabled it
    # would burn a core for nothing.  The chained loop compiles its own
    # executables, so the per-step warm-up is only useful unchained.
    if num_steps > 1 and cache_dir != "0" and not use_chain:
        import threading
        threading.Thread(target=_precompile_other, daemon=True).start()
    mckpp_print(routine, f"timestepping loop: {num_steps} steps")
    import time as _time
    t_half = None
    # --profile: trace a window of steady-state steps (start at the
    # midpoint so every executable is already compiled; compile events
    # would otherwise dominate the trace)
    prof_start = num_steps // 2 + 1 if num_steps >= 4 else 1
    prof_end = min(num_steps, prof_start + max(1, args.profile_steps) - 1)
    prof_on = False
    half_marker = num_steps // 2 + 1 if num_steps >= 4 else None

    def _pre_step(nt):
        """Per-step host-side events BEFORE the physics: steady-state /
        profile markers, the flux-cadence update and ancillary refresh."""
        nonlocal t_half, prof_on, st, frc
        if nt == half_marker:
            jax.block_until_ready(jax.tree_util.tree_leaves(st))
            t_half = _time.perf_counter()
        if args.profile and nt == prof_start and not prof_on:
            jax.block_until_ready(jax.tree_util.tree_leaves(st))
            jax.profiler.start_trace(args.profile)
            prof_on = True
        time_days = cfg.time.startt + (nt - 1) * cfg.time.dto / 86400.0
        if (nt - 1) % cfg.time.ndtocn == 0:
            timers.start("Update surface fluxes")
            raw = _flux_at(time_days)
            st, frc = forcing_mod.update_fluxes(
                cfg, st, prm, frc, raw, jnp.asarray(nt <= 1), model.grid.dm)
            nt_next = nt + cfg.time.ndtocn
            if nt_next <= num_steps:
                _flux_schedule(cfg.time.startt
                               + (nt_next - 1) * cfg.time.dto / 86400.0)
            timers.stop("Update surface fluxes")
        if nt != 1 and (not use_chain or mgr.due_any(nt)):
            timers.start("Update ancillaries")
            frc = mgr.update(nt, time_days, frc)
            timers.stop("Update ancillaries")

    def _post_step(nt):
        """Restart write + profile stop AFTER the physics of step nt."""
        nonlocal prof_on
        timers.start("Restart output")
        if cfg.output.l_restartw and restart.due(nt):
            # detached restart writes (the reference stamps restarts
            # through the same detached XIOS path as diagnostics,
            # mckpp_xios_control.F90:61-83): the loop thread never blocks
            # on the fetch/encode.
            if jax.process_count() > 1:
                # the cross-host gather is a collective — run it here,
                # synchronously; only the encode is detached
                restart.maybe_write(nt, unpad(st), unpad(prm), unpad(frc))
            elif layout is not None and not use_chain:
                # the sharded per-step path DONATES its state buffers, so
                # the background fetch needs its own on-device copies
                # (a cheap HBM copy, ~ms); the chained path does not
                # donate, so it hands the live buffers over directly
                restart.maybe_write(nt, _snapshot(st), prm, frc,
                                    fetch=layout.gather_tree)
            elif layout is not None:
                restart.maybe_write(nt, st, prm, frc,
                                    fetch=layout.gather_tree)
            else:
                restart.maybe_write(nt, st, prm, frc)
        timers.stop("Restart output")
        if prof_on and nt >= prof_end:
            jax.block_until_ready(jax.tree_util.tree_leaves(st))
            jax.profiler.stop_trace()
            prof_on = False
            mckpp_print(routine,
                        f"profiler trace of steps {prof_start}-{prof_end} "
                        f"written to {args.profile}")

    if use_chain:
        from .models.chain import ChainedStepper, plan_segments, emit_due
        stepper = ChainedStepper(
            model._step, diag,
            mesh=(mesh if layout is not None else None))

        def _end(nt):
            return (emit_due(diag, nt)
                    or (cfg.output.l_restartw and restart.due(nt))
                    or (diag.needs_full(nt) and not stepper.wide_reducing)
                    or (args.profile and nt == prof_end))

        def _start(nt):
            return (mgr.due_any(nt) or nt == half_marker
                    or (args.profile and nt == prof_start))

        max_k = int(os.environ.get("MCKPP_CHAIN_MAX", "32"))
        segments = plan_segments(num_steps, ndtocn=cfg.time.ndtocn,
                                 end_pred=_end, start_pred=_start,
                                 max_k=max_k)
        mckpp_print(routine,
                    f"chained dispatch: {len(segments)} segments for "
                    f"{num_steps} steps (max k "
                    f"{max(k for _, k in segments)})")
        for nt0, k in segments:
            _pre_step(nt0)
            nt_end = nt0 + k - 1
            timers.start("Physics")
            need_full = (diag.needs_full(nt_end)
                         or (cfg.output.l_restartw and restart.due(nt_end)))
            st, accums, inst_fields = stepper.exec(
                nt0, k, st, prm, frc, final_full=need_full)
            timers.stop("Physics")
            timers.start("Diagnostic output")
            stepper.commit(nt_end, k, accums, inst_fields)
            timers.stop("Diagnostic output")
            _post_step(nt_end)
    else:
        for nt in range(1, num_steps + 1):
            _pre_step(nt)
            timers.start("Physics")
            # steps where no output stream samples a wide diagnostic field
            # (and no restart is due) skip the diagnostic-materialization
            # pass — ~a full kernel pass saved per step (ocnstep_fused.py)
            need_full = (diag.needs_full(nt)
                         or (cfg.output.l_restartw and restart.due(nt)))
            st = step_fn(st, prm, frc, first_step=(nt <= 1),
                         with_diags=need_full)
            timers.stop("Physics")
            timers.start("Diagnostic output")
            # sharded runs feed the sharded trees straight in: reductions
            # accumulate on device, the gather happens only when a window
            # emits (no per-step cross-host transfers)
            diag.step(nt, st, prm, frc)
            timers.stop("Diagnostic output")
            _post_step(nt)

    jax.block_until_ready(jax.tree_util.tree_leaves(st))
    if t_half is not None:
        n2 = num_steps - num_steps // 2
        dt2 = _time.perf_counter() - t_half
        mckpp_print(routine,
                    f"steady-state: {dt2:.3f} s for the last {n2} steps "
                    f"({ncol * n2 / dt2:.1f} column-steps/s)")
    paths = diag.flush()
    mckpp_print(routine, f"wrote diagnostics: {sorted(paths.values())}")
    mckpp_print(routine, f"diag emit gathers: {diag.emit_gathers}")
    timers.start("Restart output")
    written = restart.flush()
    timers.stop("Restart output")
    mckpp_print(routine, f"wrote restarts: {written}")
    print(timers.report())
    return 0


if __name__ == "__main__":
    sys.exit(main())
