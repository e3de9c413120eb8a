"""Full-step trajectory oracle: N steps of the framework's per-column
ocnstep vs the independent loop-for-loop NumPy transliteration of the
reference physics (tests/oracle_fortran.py).

The framework runs in float64 with the reference operation order
(solver="thomas") and the resident wscale lookup table (wscale_mode="table"),
so the two trajectories must agree to near machine precision.  Together with
tests/test_fused_parity.py (ocnstep == fused_xla == pallas-interpret) this
pins the production TPU kernel path to the reference semantics end-to-end.

Reference: mckpp_physics_ocnstep_mod.F90:43-357 and callees.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mckpp_tpu import KppConfig, DomainConfig, TimeConfig
from mckpp_tpu.config import PhysicsFlags, ForcingConfig, BoundaryConfig
from mckpp_tpu.models.column_model import KppModel
from mckpp_tpu.grid import coriolis
from mckpp_tpu.state import init_params
from mckpp_tpu import forcing as forcing_mod

import oracle_fortran as orc

pytestmark = pytest.mark.slow

NCOL, NZ = 3, 16
NZP1 = NZ + 1
MAXMODEADV = 6


def make_model(**phys):
    cfg = KppConfig(
        domain=DomainConfig(nx=NCOL, ny=1, nz=NZ, dmax=200.0),
        time=TimeConfig(dtsec=1200.0, ndtocn=1, startt=0.0, finalt=1.0),
        physics=PhysicsFlags(solver="thomas", wscale_mode="table",
                             pass_impl="reference", **phys),
        dtype="float64")
    return KppModel(cfg)


def make_initial(model):
    zm = np.asarray(model.grid.zm)
    t0 = np.stack([20.0 + 8.0 * np.exp(zm / 60.0),
                   12.0 + 5.0 * np.exp(zm / 40.0),
                   26.0 + 3.0 * np.exp(zm / 90.0)])
    s0 = np.stack([35.0 - 0.4 * np.exp(zm / 80.0),
                   34.0 + 0.3 * np.exp(zm / 50.0),
                   35.5 - 0.2 * np.exp(zm / 70.0)])
    u0 = np.zeros((NCOL, NZP1, 2))
    u0[:, :, 0] = 0.08 * np.exp(zm / 30.0)[None, :]
    u0[:, :, 1] = -0.05 * np.exp(zm / 45.0)[None, :]
    prm = init_params(NCOL, NZP1, dtype=model.dtype)
    lat = jnp.asarray([10.0, 35.0, -20.0], model.dtype)
    prm = dataclasses.replace(
        prm, f=coriolis(lat), dlat=lat,
        jerlov=jnp.asarray([2, 0, 4], jnp.int32))
    return model.initial_state(jnp.asarray(u0), jnp.asarray(t0),
                               jnp.asarray(s0), prm)


# --------------------------------------------------------------------------
# State <-> oracle conversion
# --------------------------------------------------------------------------
def make_cst(model):
    g = model.grid
    cfg = model.cfg
    zm = np.zeros(NZP1 + 1)
    hm = np.zeros(NZP1 + 1)
    zm[1:] = np.asarray(g.zm, np.float64)
    hm[1:] = np.asarray(g.hm, np.float64)
    tri = np.zeros((NZ + 1, 2))
    tri[:, 0] = np.asarray(g.tri_up, np.float64)
    tri[:, 1] = np.asarray(g.tri_dn, np.float64)
    f, b, p = cfg.forcing, cfg.boundary, cfg.physics
    return dict(
        nz=NZ, nzp1=NZP1, zm=zm, hm=hm, dm=np.asarray(g.dm, np.float64),
        tri=tri, dto=cfg.time.dto, itermax=p.itermax,
        hmixtolfrac=p.hmixtolfrac,
        LKPP=p.lkpp, LRI=p.lri, LDD=p.ldd, L_SSref=p.l_ssref,
        L_DAMP_CURR=f.l_damp_curr, dt_uvdamp=f.dtuvdamp,
        L_RELAX_SST=b.l_relax_sst, L_RELAX_CALCONLY=b.l_relax_calconly,
        L_RELAX_SAL=b.l_relax_sal, L_RELAX_OCNT=b.l_relax_ocnt,
        L_FCORR=f.l_fcorr, L_FCORR_WITHZ=f.l_fcorr_withz,
        L_SFCORR=f.l_sfcorr, L_SFCORR_WITHZ=f.l_sfcorr_withz,
    )


def state_to_fld(st, prm, frc, i):
    """Convert column i of (State, ColumnParams, Forcing) to the oracle's
    Fortran-indexed field dict."""
    g = lambda a: np.asarray(a, np.float64)

    def lvl(a):                      # (nzp1,) -> 1-based (nzp1+1,)
        out = np.zeros(NZP1 + 1)
        out[1:] = g(a)
        return out

    def lvl0(a):                     # keep 0-based (reference 0:NZP1 or 0:NZ)
        return g(a).copy()

    U = np.zeros((NZP1 + 1, 3))
    U[1:, 1] = g(st.u[i, :, 0])
    U[1:, 2] = g(st.u[i, :, 1])
    X = np.zeros((NZP1 + 1, 3))
    X[1:, 1] = g(st.x[i, :, 0])
    X[1:, 2] = g(st.x[i, :, 1])
    Us = np.zeros((NZP1 + 1, 3, 2))
    Xs = np.zeros((NZP1 + 1, 3, 2))
    for ph in range(2):
        Us[1:, 1, ph] = g(st.us[i, :, 0, ph])
        Us[1:, 2, ph] = g(st.us[i, :, 1, ph])
        Xs[1:, 1, ph] = g(st.xs[i, :, 0, ph])
        Xs[1:, 2, ph] = g(st.xs[i, :, 1, ph])
    wU = np.zeros((NZ + 1, 3))
    wU[:, 1] = g(st.wu[i, :, 0])
    wU[:, 2] = g(st.wu[i, :, 1])
    wX = np.zeros((NZ + 1, 4))
    wX[:, 1] = g(st.wx[i, :, 0])
    wX[:, 2] = g(st.wx[i, :, 1])
    wX[:, 3] = g(st.wx[i, :, 2])
    wXNT = np.zeros((NZ + 1, 3))
    wXNT[:, 1] = g(st.wxnt[i, :, 0])
    wXNT[:, 2] = g(st.wxnt[i, :, 1])
    sflux = np.zeros(7)
    sflux[1:] = g(frc.sflux[i])

    def sfc(a):                      # level array with rho(0)=rho(1) alias
        out = np.zeros(NZP1 + 1)
        out[1:] = g(a)
        out[0] = out[1]
        return out

    nm = np.zeros(3, np.int64)
    nm[1:] = np.asarray(prm.nmodeadv[i])
    md = np.zeros((MAXMODEADV + 1, 3), np.int64)
    md[1:, 1] = np.asarray(prm.modeadv[i, :, 0])
    md[1:, 2] = np.asarray(prm.modeadv[i, :, 1])
    adv = np.zeros((MAXMODEADV + 1, 3))
    adv[1:, 1] = g(prm.advection[i, :, 0])
    adv[1:, 2] = g(prm.advection[i, :, 1])

    return dict(
        U=U, X=X, Us=Us, Xs=Xs,
        hmixd=np.array([float(st.hmixd[i, 0]), float(st.hmixd[i, 1])]),
        old=int(st.old[i]), new=int(st.new[i]),
        hmix=float(st.hmix[i]), kmix=int(st.kmix[i]),
        rho=sfc(st.rho[i]), cp=sfc(st.cp[i]),
        talpha=sfc(st.talpha[i]), sbeta=sfc(st.sbeta[i]),
        buoy=lvl(st.buoy[i]), rhoh2o=float(st.rhoh2o[i]),
        difm=lvl0(st.difm[i]), difs=lvl0(st.difs[i]), dift=lvl0(st.dift[i]),
        ghat=lvl0(st.ghat[i]), Rig=lvl0(st.rig[i]),
        dbloc=lvl0(st.dbloc[i]), Shsq=lvl0(st.shsq[i]),
        wU=wU, wX=wX, wXNT=wXNT,
        swdk_opt=lvl0(st.swdk_opt[i]), swfrac=lvl(st.swfrac[i]),
        sflux=sflux,
        tinc_fcorr=np.zeros(NZP1 + 1), sinc_fcorr=np.zeros(NZP1 + 1),
        ocnTcorr=np.zeros(NZP1 + 1), scorr=np.zeros(NZP1 + 1),
        fcorr=float(st.fcorr[i]), fcorr_twod=float(frc.fcorr_twod[i]),
        fcorr_withz=lvl(frc.fcorr_withz[i]),
        sfcorr_withz=lvl(frc.sfcorr_withz[i]),
        ocnT_clim=lvl(frc.ocnt_clim[i]), sal_clim=lvl(frc.sal_clim[i]),
        SST0=float(frc.sst0[i]),
        relax_sst=float(prm.relax_sst[i]),
        relax_ocnt=float(prm.relax_ocnt[i]),
        relax_sal=float(prm.relax_sal[i]),
        f=float(prm.f[i]), ocdepth=float(prm.ocdepth[i]),
        jerlov=int(prm.jerlov[i]) + 1,
        Sref=float(prm.sref[i]), SSref=float(prm.ssref[i]),
        Ssurf=float(st.ssurf[i]), Tref=float(st.tref[i]),
        uref=float(st.uref[i]), vref=float(st.vref[i]),
        nmodeadv=nm, modeadv=md, advection=adv,
        l_initflag=False, comp_flag=False, reset_flag=0,
        dampu_flag=0.0, dampv_flag=0.0, l_ocean=bool(prm.l_ocean[i]),
        U_init=_uinit(prm, i), freeze_flag=0.0,
    )


def _uinit(prm, i):
    out = np.zeros((NZP1 + 1, 3))
    out[1:, 1] = np.asarray(prm.u_init[i, :, 0], np.float64)
    out[1:, 2] = np.asarray(prm.u_init[i, :, 1], np.float64)
    return out


FIELD_TOL = {
    # (rtol, atol): atol covers fields whose natural scale is tiny
    "U": (1e-9, 1e-13), "X": (1e-9, 1e-11),
    "hmix": (1e-9, 1e-10), "difm": (1e-8, 1e-13), "difs": (1e-8, 1e-13),
    "dift": (1e-8, 1e-13), "ghat": (1e-8, 1e-10),
    "wU": (1e-7, 1e-14), "wX": (1e-7, 1e-14),
    "rho": (1e-11, 1e-12), "cp": (1e-11, 1e-12),
    "Us": (1e-9, 1e-13), "Xs": (1e-9, 1e-11),
}


def compare_column(st, i, fld, nt):
    def chk(name, got, want):
        rtol, atol = FIELD_TOL[name]
        np.testing.assert_allclose(
            got, want, rtol=rtol, atol=atol,
            err_msg=f"step {nt} col {i} field {name}")

    chk("U", np.asarray(st.u[i, :, 0]), fld["U"][1:, 1])
    chk("U", np.asarray(st.u[i, :, 1]), fld["U"][1:, 2])
    chk("X", np.asarray(st.x[i, :, 0]), fld["X"][1:, 1])
    chk("X", np.asarray(st.x[i, :, 1]), fld["X"][1:, 2])
    chk("hmix", float(st.hmix[i]), fld["hmix"])
    assert int(st.kmix[i]) == fld["kmix"], f"kmix step {nt} col {i}"
    assert int(st.old[i]) == fld["old"]
    assert int(st.new[i]) == fld["new"]
    assert float(st.reset_flag[i]) == fld["reset_flag"]
    chk("difm", np.asarray(st.difm[i]), fld["difm"])
    chk("difs", np.asarray(st.difs[i]), fld["difs"])
    chk("dift", np.asarray(st.dift[i]), fld["dift"])
    chk("ghat", np.asarray(st.ghat[i]), fld["ghat"])
    chk("wU", np.asarray(st.wu[i, :, 0]), fld["wU"][:, 1])
    chk("wX", np.asarray(st.wx[i, :, 0]), fld["wX"][:, 1])
    chk("wX", np.asarray(st.wx[i, :, 1]), fld["wX"][:, 2])
    chk("rho", np.asarray(st.rho[i]), fld["rho"][1:])
    chk("cp", np.asarray(st.cp[i]), fld["cp"][1:])
    for ph in range(2):
        chk("Us", np.asarray(st.us[i, :, 0, ph]), fld["Us"][1:, 1, ph])
        chk("Xs", np.asarray(st.xs[i, :, 0, ph]), fld["Xs"][1:, 1, ph])
        chk("Xs", np.asarray(st.xs[i, :, 1, ph]), fld["Xs"][1:, 2, ph])


def run_trajectory(model, n_steps, raw_fn=None, frc_mod=None, prm_mod=None):
    st, prm, frc = make_initial(model)
    if prm_mod is not None:
        prm = prm_mod(prm)
    if frc_mod is not None:
        frc = frc_mod(frc)
    cfg = model.cfg
    cst = make_cst(model)
    flds = None

    for nt in range(1, n_steps + 1):
        raw = (raw_fn(nt) if raw_fn is not None
               else forcing_mod.constant_test_fluxes(NCOL, model.dtype))
        st, frc = forcing_mod.update_fluxes(
            cfg, st, prm, frc, raw, jnp.asarray(nt <= 1), model.grid.dm)
        if flds is None:
            # seed the oracle from the model state after the first flux pack
            flds = [state_to_fld(st, prm, frc, i) for i in range(NCOL)]
        else:
            for i, fld in enumerate(flds):
                fld["sflux"][1:] = np.asarray(frc.sflux[i], np.float64)
                orc.ntflux(fld, cst, nt)
        st = model.step(st, prm, frc, first_step=(nt <= 1))
        for i, fld in enumerate(flds):
            orc.ocnstep(fld, cst, nt)
            orc.check_profile(fld, cst)
            compare_column(st, i, fld, nt)
    return st, flds


def test_trajectory_constant_forcing():
    """12-step trajectory, constant test fluxes, no ancillaries: framework
    ocnstep == Fortran transliteration to ~1e-9 relative in f64."""
    model = make_model()
    run_trajectory(model, 12)


def test_trajectory_with_relaxation_and_corrections():
    """Feature-rich trajectory: SST relaxation + 3-D salinity relaxation +
    2-D heat correction + current damping, exercising the ocnint correction
    branches (mckpp_physics_ocnint_mod.F90:96-219) and the damping block
    (mckpp_physics_ocnstep_mod.F90:317-340)."""
    model = make_model()
    cfg = model.cfg.replace(
        boundary=dataclasses.replace(
            model.cfg.boundary, l_relax_sst=True, l_relax_sal=True,
            l_relax_ocnt=True),
        forcing=dataclasses.replace(
            model.cfg.forcing, l_fcorr=False, l_damp_curr=True,
            dtuvdamp=360))
    model = KppModel(cfg)

    def prm_mod(prm):
        return dataclasses.replace(
            prm,
            relax_sst=jnp.full((NCOL,), 1.0 / (5.0 * 86400.0), model.dtype),
            relax_sal=jnp.full((NCOL,), 1.0 / (10.0 * 86400.0), model.dtype),
            relax_ocnt=jnp.full((NCOL,), 1.0 / (15.0 * 86400.0), model.dtype))

    def frc_mod(frc):
        zm = np.asarray(model.grid.zm)
        ocnt = np.stack([19.0 + 7.0 * np.exp(zm / 55.0),
                         11.0 + 6.0 * np.exp(zm / 45.0),
                         25.0 + 4.0 * np.exp(zm / 85.0)])
        sal = np.zeros((NCOL, NZP1)) + 0.05   # relative to Sref
        return dataclasses.replace(
            frc, sst0=jnp.asarray([21.0, 13.0, 26.5], model.dtype),
            ocnt_clim=jnp.asarray(ocnt, model.dtype),
            sal_clim=jnp.asarray(sal, model.dtype))

    run_trajectory(model, 8, frc_mod=frc_mod, prm_mod=prm_mod)


def test_trajectory_with_advection():
    """Advection-correction trajectory: mixed rhsmod modes across columns
    (mckpp_physics_solvers.F90:176-335; note only the salinity scalar's
    nmodeadv(2) modes are applied by the reference's ocnint,
    mckpp_physics_ocnint_mod.F90:179-184)."""
    model = make_model()
    cfg = model.cfg.replace(
        boundary=dataclasses.replace(model.cfg.boundary, l_advect=True))
    model = KppModel(cfg)

    def prm_mod(prm):
        nmode = np.zeros((NCOL, 2), np.int32)
        mode = np.zeros((NCOL, MAXMODEADV, 2), np.int32)
        mag = np.zeros((NCOL, MAXMODEADV, 2))
        # column 0: upper-layer + whole-column salt advection
        nmode[0, 1] = 2
        mode[0, :2, 1] = [1, 3]
        mag[0, :2, 1] = [2.0e-6, -1.0e-6]
        # column 1: mixed-layer + deep-vertical
        nmode[1, 1] = 2
        mode[1, :2, 1] = [2, 4]
        mag[1, :2, 1] = [1.5e-6, 1.0e-6]
        # column 2: bottom diffusion + seasonal ML + seasonal thermocline
        nmode[2, 1] = 3
        mode[2, :3, 1] = [5, 6, 7]
        mag[2, :3, 1] = [1.0e-6, 2.0e-6, -5.0e-7]
        # temperature modes are configured but must be IGNORED (reference
        # applies rhsmod only for the salinity scalar)
        nmode[:, 0] = 1
        mode[:, 0, 0] = 3
        mag[:, 0, 0] = 50.0
        return dataclasses.replace(
            prm, nmodeadv=jnp.asarray(nmode), modeadv=jnp.asarray(mode),
            advection=jnp.asarray(mag, model.dtype))

    run_trajectory(model, 6, prm_mod=prm_mod)
