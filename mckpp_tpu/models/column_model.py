"""The multi-column KPP ocean mixed-layer model: init, step, run.

This is the TPU-native equivalent of the reference's entry point + field
initialization + physics driver (mckpp_ocean_model_3D.F90,
mckpp_initialize_fields_mod.F90, mckpp_initialize_ocean.F90,
mckpp_physics_driver_mod.F90).  Columns are a batch axis: the per-column
:func:`~mckpp_tpu.ops.ocnstep.ocnstep` is vmapped, so the reference's
OpenMP gather->step->scatter loop becomes one fused XLA computation over
``(ncol, nz)`` arrays; land columns are masked with ``where`` selects.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as c
from ..config import KppConfig
from ..grid import VerticalGrid, make_vertical_grid, vertical_grid_from_arrays
from ..state import State, ColumnParams, Forcing, init_state, init_forcing, init_params
from ..ops import wscale as wscale_mod
from ..ops.swfrac import swfrac_levels
from ..ops.vmix import vmix
from ..ops.ocnstep import ocnstep
from ..ops.overrides import check_profile, bottomtemp
from .. import forcing as forcing_mod


def _select(mask, new, old):
    """Per-column select over a State pytree (mask: (ncol,) bool)."""
    def sel(a, b):
        m = mask.reshape(mask.shape + (1,) * (a.ndim - 1))
        return jnp.where(m, a, b)
    return jax.tree_util.tree_map(sel, new, old)


class KppModel:
    """Holds static configuration, grids and lookup tables; exposes pure
    jitted functions over (State, ColumnParams, Forcing)."""

    def __init__(self, cfg: KppConfig, vgrid: Optional[VerticalGrid] = None):
        cfg.validate()
        self.dtype = jnp.float64 if cfg.dtype == "float64" else jnp.float32
        if cfg.physics.wscale_mode == "auto":
            # production (TPU f32): exact LMD stability functions — 4x
            # fewer node evaluations than reconstructing the table
            # interpolation, measured 12% faster whole-step (BASELINE.md
            # r5 roofline) and at least as accurate as the table that
            # discretizes these same formulas.  Parity/CPU runs keep the
            # reference's interpolation semantics ("nodal").
            # (the per-column "reference" impl evaluates wscale through
            # the nodal/table path only, so auto never picks analytic
            # there)
            mode = ("analytic" if (self._on_tpu()
                                   and self.dtype == jnp.float32
                                   and cfg.physics.pass_impl != "reference")
                    else "nodal")
            cfg = cfg.replace(physics=dataclasses.replace(
                cfg.physics, wscale_mode=mode))
        self.cfg = cfg
        d = cfg.domain
        if vgrid is None:
            vgrid = make_vertical_grid(
                d.nz, d.dmax, cfg.time.dto, stretch=d.l_stretchgrid,
                dscale=d.dscale, dtype=self.dtype)
        self.grid = vgrid
        if cfg.physics.wscale_mode == "table":
            wmt, wst = wscale_mod.build_tables(np.float64,
                                               vonk=cfg.constants.vonk)
            self.wmt = wmt.astype(self.dtype)
            self.wst = wst.astype(self.dtype)
        else:       # "analytic": exact stability functions, gather-free
            self.wmt = self.wst = None
        self.pass_impl = self._resolve_pass_impl()
        if self.pass_impl != "reference":
            from ..ops.ocnstep_fused import make_ocnstep_fused
            impl = {"fused_xla": "xla", "pallas": "pallas",
                    "pallas_interpret": "interpret",
                    "fused_xla_step": "xla_step",
                    "pallas_step": "pallas_step",
                    "pallas_step_interpret": "interpret_step"}[self.pass_impl]
            self._fused_step = make_ocnstep_fused(
                self.grid, cfg, self.dtype, impl=impl,
                block=cfg.physics.pass_block)
        self._step_jit = jax.jit(self._step, static_argnames=("with_diags",))
        self._init_jit = jax.jit(self._init_columns)

    @staticmethod
    def _on_tpu() -> bool:
        try:
            return jax.devices()[0].platform in ("tpu", "axon")
        except Exception:
            return False

    def _resolve_pass_impl(self) -> str:
        """Pick the per-pass implementation (see PhysicsFlags.pass_impl):
        the fused Pallas kernel on TPU float32, the fused XLA body on CPU /
        float64, the unfused reference path for unsupported features."""
        from ..ops.ocnstep_fused import supports_fused
        choice = self.cfg.physics.pass_impl
        if choice == "reference":
            return "reference"
        supported = supports_fused(self.cfg)
        if choice == "auto":
            if not supported:
                return "reference"
            if self._on_tpu() and self.dtype == jnp.float32:
                # whole-step kernel: bitwise-equal to "pallas" and
                # measured faster (BASELINE.md r4: 6.9 vs 7.8 ms/step
                # full, 5.9 vs 6.9 lazy at ncol=16384, nz=69)
                return "pallas_step"
            return "fused_xla"
        if not supported:
            raise ValueError(
                f"pass_impl={choice!r} requested but the configuration "
                "uses features the fused pass does not cover "
                "(wscale table / thomas solver)")
        return choice

    # ------------------------------------------------------------------
    # Initialization (reference: mckpp_initialize_ocean.F90:18-111)
    # ------------------------------------------------------------------
    def initial_state(self, u0, t0, s0, prm: ColumnParams):
        """Build the initial State from interpolated profiles.

        u0: (ncol, nzp1, 2) currents; t0: (ncol, nzp1) temperature (degC);
        s0: (ncol, nzp1) *absolute* salinity (psu).  The reference
        salinity (Sref = (S_top + S_bot)/2) is removed here
        (reference: mckpp_initialize_ocean_profiles_mod.F90:103-117) and the
        initial vertical-mixing pass seeds hmix and the two-level history.
        """
        ncol, nzp1 = t0.shape
        # cast to the model dtype up front: f64 numpy inputs must not
        # leak f64 sref/ssurf into an f32 model (mixed-dtype scatters)
        sref = jnp.asarray((s0[:, 0] + s0[:, -1]) / 2.0, self.dtype)
        prm = dataclasses.replace(prm, sref=sref, ssref=sref,
                                  u_init=jnp.asarray(u0, self.dtype))
        st = init_state(ncol, nzp1, self.dtype)
        x = jnp.stack([jnp.asarray(t0, self.dtype),
                       jnp.asarray(s0, self.dtype) - sref[:, None]],
                      axis=-1)
        st = dataclasses.replace(st, u=jnp.asarray(u0, self.dtype),
                                 x=x.astype(self.dtype),
                                 tref=t0[:, 0].astype(self.dtype))
        if self.cfg.physics.l_ssref:
            st = dataclasses.replace(st, ssurf=prm.ssref)
        else:
            st = dataclasses.replace(st, ssurf=x[:, 0, 1] + prm.sref)
        frc = init_forcing(ncol, nzp1, self.dtype)
        st = self._init_jit(st, prm, frc)
        return st, prm, frc

    def warm_start(self, u0, t0, s0, prm: ColumnParams):
        """Fast benchmark/bring-up initialization: seed the two-level
        history and the shortwave caches WITHOUT the initial per-column
        vertical-mixing pass (which exists for reference parity of the
        first step's diagnostics, not for the trajectory physics).
        Use :meth:`initial_state` for reference-parity runs."""
        ncol, nzp1 = t0.shape
        sref = (s0[:, 0] + s0[:, -1]) / 2.0
        prm = dataclasses.replace(prm, sref=jnp.asarray(sref, self.dtype),
                                  ssref=jnp.asarray(sref, self.dtype),
                                  u_init=jnp.asarray(u0, self.dtype))
        st = init_state(ncol, nzp1, self.dtype)
        x = jnp.stack([t0, s0 - sref[:, None]], axis=-1).astype(self.dtype)
        u = jnp.asarray(u0, self.dtype)

        @jax.jit
        def seed(st, prm, x, u):
            swf = jax.vmap(lambda j: swfrac_levels(1.0, self.grid.zm, j))(prm.jerlov)
            from ..ops.swfrac import swdk as _swdk
            swdk_opt = jax.vmap(lambda j: _swdk(-self.grid.dm, j))(prm.jerlov)
            from ..ops.eos import abk80, cpsw
            s_abs = x[..., 1] + prm.sref[:, None]
            alpha, beta, _, sig0, _ = abk80(s_abs, x[..., 0], -self.grid.zm)
            return dataclasses.replace(
                st, u=u, x=x,
                us=jnp.stack([u, u], axis=-1), xs=jnp.stack([x, x], axis=-1),
                hmixd=jnp.stack([st.hmix, st.hmix], axis=-1),
                swfrac=swf.astype(self.dtype),
                swdk_opt=swdk_opt.astype(self.dtype),
                rho=1000.0 + sig0, cp=cpsw(s_abs, x[..., 0], -self.grid.zm),
                talpha=alpha, sbeta=beta,
                tref=x[:, 0, 0], ssurf=prm.ssref,
                old=jnp.zeros((ncol,), jnp.int32),
                new=jnp.ones((ncol,), jnp.int32))

        st = seed(st, prm, x, u)
        frc = init_forcing(ncol, nzp1, self.dtype)
        return st, prm, frc

    def _init_columns(self, st: State, prm: ColumnParams, frc: Forcing):
        grid, wmt, wst = self.grid, self.wmt, self.wst
        ph = self.cfg.physics
        nz = grid.nz

        # cached shortwave fraction at levels (swfrac_opt with fact=1)
        swf = jax.vmap(lambda j: swfrac_levels(1.0, grid.zm, j))(prm.jerlov)
        st = dataclasses.replace(st, swfrac=swf.astype(grid.zm.dtype))

        def per_col(stc, prmc, frcc):
            vm = vmix(stc.u, stc.x, frcc.sflux, stc.ssurf, prmc.sref,
                      prmc.jerlov, prmc.f, prmc.ocdepth, jnp.asarray(True),
                      stc.swdk_opt, stc.swfrac, stc.wxnt,
                      jnp.asarray(True), grid, wmt, wst,
                      lri=ph.lri, ldd=ph.ldd, lkpp=ph.lkpp,
                      update_wxnt=False, cst=self.cfg.constants)
            stc = dataclasses.replace(
                stc, rho=vm.rho, cp=vm.cp, talpha=vm.talpha, sbeta=vm.sbeta,
                buoy=vm.buoy, rhoh2o=vm.rhoh2o, difm=vm.difm, difs=vm.difs,
                dift=vm.dift, ghat=vm.ghat, rig=vm.rig, dbloc=vm.dbloc,
                shsq=vm.shsq, wu=stc.wu.at[0].set(vm.wu0),
                wx=stc.wx.at[0].set(vm.wx0), wxnt=vm.wxnt,
                swdk_opt=vm.swdk_opt, uref=vm.uref, vref=vm.vref,
                hmix=vm.hbl, kmix=vm.kbl, tref=stc.x[0, 0])
            # initial diagnostic fluxes (reference :66-81)
            hm = grid.hm
            deltaz = 0.5 * (hm[:nz] + hm[1:])
            wx1 = -stc.difs[1:nz + 1] * ((stc.x[:nz, 0] - stc.x[1:, 0]) / deltaz
                                         - stc.ghat[1:] * stc.wx[0, 0])
            wx2 = -stc.difs[1:nz + 1] * ((stc.x[:nz, 1] - stc.x[1:, 1]) / deltaz
                                         - stc.ghat[1:] * stc.wx[0, 1])
            if ph.ldd:
                wx1 = -stc.dift[1:nz + 1] * ((stc.x[:nz, 0] - stc.x[1:, 0]) / deltaz
                                             - stc.ghat[1:] * stc.wx[0, 0])
            wxb = self.cfg.constants.grav * (stc.talpha[:nz] * wx1
                                             - stc.sbeta[:nz] * wx2)
            wu1 = -stc.difm[1:nz + 1] * (stc.u[:nz, 0] - stc.u[1:, 0]) / deltaz
            wu2 = -stc.difm[1:nz + 1] * (stc.u[:nz, 1] - stc.u[1:, 1]) / deltaz
            wx = stc.wx.at[1:, 0].set(wx1).at[1:, 1].set(wx2).at[1:, 2].set(wxb)
            wu = stc.wu.at[1:, 0].set(wu1).at[1:, 1].set(wu2)
            # two-level history seed (reference :83-100)
            us = jnp.stack([stc.u, stc.u], axis=-1)
            xs = jnp.stack([stc.x, stc.x], axis=-1)
            hmixd = jnp.stack([stc.hmix, stc.hmix])
            return dataclasses.replace(
                stc, wx=wx, wu=wu, us=us, xs=xs, hmixd=hmixd,
                old=jnp.asarray(0, jnp.int32), new=jnp.asarray(1, jnp.int32))

        new_st = jax.vmap(per_col)(st, prm, frc)
        # pin declared dtypes: under jax_enable_x64 (the f64 parity mode's
        # process setting) float64 constants inside swfrac/vmix silently
        # promote some initialized fields, and _select's where() would
        # propagate the promotion into an f32 model's state
        new_st = jax.tree_util.tree_map(
            lambda a, b: a.astype(b.dtype), new_st, st)
        return _select(prm.run_physics, new_st, st)

    # ------------------------------------------------------------------
    # One ocean timestep (physics driver + overrides)
    # ------------------------------------------------------------------
    def _step(self, st: State, prm: ColumnParams, frc: Forcing, first_step,
              with_diags: bool = True):
        """One ocean timestep.  ``with_diags=False`` (fused path only)
        skips the diagnostic-materialization pass: same prognostic
        trajectory, stale wide diagnostic fields — see
        ops/ocnstep_fused.py.  The reference path always materializes."""
        grid, wmt, wst, cfg = self.grid, self.wmt, self.wst, self.cfg

        if self.pass_impl != "reference":
            new_st, comp = self._fused_step(st, prm, frc, first_step,
                                            with_diags=with_diags)
        else:
            def per_col(stc, prmc, frcc, act):
                return ocnstep(stc, prmc, frcc, grid, wmt, wst, cfg,
                               first_step, act)

            new_st, comp = jax.vmap(per_col, in_axes=(0, 0, 0, 0))(
                st, prm, frc, prm.run_physics)
        new_st = jax.vmap(partial(check_profile, grid=grid, cfg=cfg))(
            new_st, prm, frc, comp)
        out = _select(prm.run_physics, new_st, st)
        if cfg.forcing.l_vary_bottom_temp:
            out = bottomtemp(out, frc, grid, cfg.time.dto)
        return out

    def step(self, st, prm, frc, first_step=False, with_diags=True):
        return self._step_jit(st, prm, frc, jnp.asarray(first_step),
                              with_diags=with_diags)

    # ------------------------------------------------------------------
    # Time loop (reference: mckpp_ocean_model_3D.F90:38-70)
    # ------------------------------------------------------------------
    def run(self, st: State, prm: ColumnParams, frc: Forcing,
            num_steps: Optional[int] = None,
            flux_provider: Optional[Callable[[int], forcing_mod.RawFluxes]] = None,
            boundary_update: Optional[Callable[[int, Forcing], Forcing]] = None,
            step_callback: Optional[Callable] = None):
        """Run the main loop on the host, invoking the jitted step.

        flux_provider(nt) -> RawFluxes on the ndtocn cadence;
        boundary_update(nt, frc) -> frc for ancillary refreshes;
        step_callback(nt, st) for diagnostics/restart hooks.
        """
        cfg = self.cfg
        n = num_steps if num_steps is not None else cfg.time.num_timesteps
        ncol = st.u.shape[0]
        for nt in range(1, n + 1):
            if (nt - 1) % cfg.time.ndtocn == 0:
                raw = (flux_provider(nt) if flux_provider is not None
                       else forcing_mod.constant_test_fluxes(ncol, self.dtype))
                st, frc = forcing_mod.update_fluxes(
                    cfg, st, prm, frc, raw, jnp.asarray(nt <= 1), self.grid.dm)
            if nt != 1 and boundary_update is not None:
                frc = boundary_update(nt, frc)
            st = self.step(st, prm, frc, first_step=(nt <= 1))
            if step_callback is not None:
                step_callback(nt, st)
        return st, frc
