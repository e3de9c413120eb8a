"""Deliberately dumb, loop-for-loop NumPy float64 transliteration of the
reference's per-column physics step.

This is an *independent oracle* for ``mckpp_tpu.ops.ocnstep`` (and through
the existing fused-parity tests, for the production fused/Pallas paths):
every loop, goto and temporary mirrors the Fortran control flow one-to-one,
with no vectorization and no reuse of the framework's code.

Transliterated routines (reference file:line):

* ocnstep driver         mckpp_physics_ocnstep_mod.F90:43-357
* verticalmixing (vmix)  mckpp_physics_verticalmixing_mod.F90:14-161
* kppmix                 mckpp_physics_verticalmixing_kppmix_mod.F90:25-126
* bldepth                mckpp_physics_verticalmixing_bldepth_mod.F90:32-203
* wscale (table lookup)  mckpp_physics_verticalmixing_wscale_mod.F90:12-97
* lookup-table build     mckpp_physics_lookup_mod.F90:11-66
* blmix                  mckpp_physics_verticalmixing_blmix_mod.F90:13-151
* enhance                mckpp_physics_verticalmixing_enhance_mod.F90:10-51
* rimix + z121           mckpp_physics_verticalmixing_rimix_mod.F90:13-106,
                         mckpp_physics_verticalmixing_z121_mod.F90:7-45
* ddmix                  mckpp_physics_verticalmixing_ddmix_mod.F90:12-52
* ocnint                 mckpp_physics_ocnint_mod.F90:19-221
* tridcof/tridrhs/tridmat/rhsmod  mckpp_physics_solvers.F90:14-335
* ABK80/CPSW EOS         mckpp_physics_state_equations.F90:7-476
* swfrac/swfrac_opt/swdk mckpp_physics_swfrac_mod.F90:14-79,
                         mckpp_fluxes_mod.F90:119-137
* ntflux                 mckpp_fluxes_mod.F90:91-116

Arrays use Fortran 1-based indexing: a field dimensioned (NZP1) in Fortran
is stored here as length NZP1+1 with element 0 unused (except for arrays the
reference itself dimensions from 0, e.g. difm(0:NZP1), wX(0:NZ,..)).
"""

from __future__ import annotations

import math

import numpy as np

# --------------------------------------------------------------------------
# Constants (reference: mckpp_initialize_namelist_mod.F90:92-106 defaults)
# --------------------------------------------------------------------------
GRAV = 9.816
VONK = 0.4
SICE = 4.0

NVEL = 2
NSCLR = 2
NSP1 = NSCLR + 1


# --------------------------------------------------------------------------
# EOS: MCKPP_CPSW (mckpp_physics_state_equations.F90:7-58)
# --------------------------------------------------------------------------
def cpsw(S, T1, P0):
    T = T1
    if T < -2.0:
        T = -2.0
    P = P0 / 10.0
    SR = math.sqrt(abs(S))
    A = (-1.38385E-3 * T + 0.1072763) * T - 7.643575
    B = (5.148E-5 * T - 4.07718E-3) * T + 0.1770383
    C = (((2.093236E-5 * T - 2.654387E-3) * T + 0.1412855) * T
         - 3.720283) * T + 4217.4
    CP0 = (B * SR + A) * S + C
    A = (((1.7168E-8 * T + 2.0357E-6) * T - 3.13885E-4) * T
         + 1.45747E-2) * T - 0.49592
    B = (((2.2956E-11 * T - 4.0027E-9) * T + 2.87533E-7) * T
         - 1.08645E-5) * T + 2.4931E-4
    C = ((6.136E-13 * T - 6.5637E-11) * T + 2.6380E-9) * T - 5.422E-8
    CP1 = ((C * P + B) * P + A) * P
    A = (((-2.9179E-10 * T + 2.5941E-8) * T + 9.802E-7) * T
         - 1.28315E-4) * T + 4.9247E-3
    B = (3.122E-8 * T - 1.517E-6) * T - 1.2331E-4
    A = (A + B * SR) * S
    B = ((1.8448E-11 * T - 2.3905E-9) * T + 1.17054E-7) * T - 2.9558E-6
    B = (B + 9.971E-8 * SR) * S
    C = (3.513E-13 * T - 1.7682E-11) * T + 5.540E-10
    C = (C - 1.4300E-12 * T * SR) * S
    CP2 = ((C * P + B) * P + A) * P
    return CP0 + CP1 + CP2


# --------------------------------------------------------------------------
# EOS: Sig80 / Bet80 / Alf80 (mckpp_physics_state_equations.F90:133-476).
# Only the alpha/beta/sig0/sig path used by vmix (kappa request = 0).
# --------------------------------------------------------------------------
def _sig80(S, T, P):
    """Returns (Sig0, Sig, and the intermediates Beta/Alpha need)."""
    P0 = P / 10.0
    SR = math.sqrt(abs(S))
    R1 = ((((6.536332E-9 * T - 1.120083E-6) * T + 1.001685E-4) * T
           - 9.095290E-3) * T + 6.793952E-2) * T - 0.157406
    R2 = (((5.3875E-9 * T - 8.2467E-7) * T + 7.6438E-5) * T
          - 4.0899E-3) * T + 8.24493E-1
    R3 = (-1.6546E-6 * T + 1.0227E-4) * T - 5.72466E-3
    R4 = 4.8314E-4
    Sig0 = (R4 * S + R3 * SR + R2) * S + R1
    Rho0 = 1000.0 + Sig0
    if P == 0.0:
        return dict(Sig0=Sig0, Sig=Sig0, Rho=Rho0, Rho0=Rho0, R1=R1, R2=R2,
                    R3=R3, R4=R4, SR=SR, P0=P0, K=0.0, PK=0.0,
                    A=0.0, B=0.0, C=0.0, D=0.0, E=0.0, A1=0.0, B1=0.0)
    B1 = (-5.3009E-4 * T + 1.6483E-2) * T + 7.944E-2
    A1 = ((-6.1670E-5 * T + 1.09987E-2) * T - 0.603459) * T + 54.6746
    KW = (((-5.155288E-5 * T + 1.360477E-2) * T - 2.327105) * T
          + 148.4206) * T + 19652.21
    K0 = (B1 * SR + A1) * S + KW
    E = (9.1697E-10 * T + 2.0816E-8) * T - 9.9348E-7
    BW = (5.2787E-8 * T - 6.12293E-6) * T + 8.50935E-5
    B = BW + E * S
    D = 1.91075E-4
    C = (-1.6078E-6 * T - 1.0981E-5) * T + 2.2838E-3
    AW = ((-5.77905E-7 * T + 1.16092E-4) * T + 1.43713E-3) * T + 3.239908
    A = (D * SR + C) * S + AW
    K = (B * P0 + A) * P0 + K0
    PK = P0 / K
    Sig = (1000.0 * PK + Sig0) / (1.0 - PK)
    Rho = 1000.0 + Sig
    return dict(Sig0=Sig0, Sig=Sig, Rho=Rho, Rho0=Rho0, R1=R1, R2=R2, R3=R3,
                R4=R4, SR=SR, P0=P0, K=K, PK=PK, A=A, B=B, C=C, D=D, E=E,
                A1=A1, B1=B1)


def _bet80(S, T, P, c):
    SR5 = c["SR"] * 1.5
    DRho = c["R2"] + SR5 * c["R3"] + (S + S) * c["R4"]
    if P == 0.0:
        return DRho / c["Rho"], None
    # bulk-modulus derivative terms (values as recomputed by Bet80's caller
    # context: A1,B1,C,D,E already hold the Sig80 bulk-modulus coefficients)
    DK0 = c["A1"] + SR5 * c["B1"]
    DA = c["C"] + SR5 * c["D"]
    DB = c["E"]
    DK = (DB * c["P0"] + DA) * c["P0"] + DK0
    ABFac = c["Rho0"] * c["P0"] / ((c["K"] - c["P0"]) * (c["K"] - c["P0"]))
    Beta = DRho / (1.0 - c["PK"]) - ABFac * DK
    return Beta / c["Rho"], ABFac


def _alf80(S, T, P, c, ABFac):
    R1 = (((0.3268166E-7 * T - 0.4480332E-5) * T + 0.3005055E-3) * T
          - 0.1819058E-1) * T + 6.793952E-2
    R2 = ((0.215500E-7 * T - 0.247401E-5) * T + 0.152876E-3) * T - 4.0899E-3
    R3 = -0.33092E-5 * T + 1.0227E-4
    Alph0 = (R3 * c["SR"] + R2) * S + R1
    if P == 0.0:
        return -Alph0 / c["Rho"]
    B1 = -0.106018E-2 * T + 1.6483E-2
    A1 = (-0.18501E-3 * T + 0.219974E-1) * T - 0.603459
    KW = ((-0.2062115E-3 * T + 0.4081431E-1) * T - 0.4654210E+1) * T + 148.4206
    K0 = (B1 * c["SR"] + A1) * S + KW
    E = 0.183394E-8 * T + 2.0816E-8
    BW = 0.105574E-6 * T - 6.12293E-6
    AlphB = BW + E * S
    C = -0.32156E-5 * T - 1.0981E-5
    AW = (-0.1733715E-5 * T + 0.232184E-3) * T + 1.43713E-3
    AlphaA = C * S + AW
    AlphK = (AlphB * c["P0"] + AlphaA) * c["P0"] + K0
    if ABFac is None:
        ABFac = c["Rho0"] * c["P0"] / ((c["K"] - c["P0"]) * (c["K"] - c["P0"]))
    Alpha = Alph0 / (1.0 - c["PK"]) - ABFac * AlphK
    return -Alpha / c["Rho"]


def abk80(S, T1, P):
    """(alpha, beta, sig0, sig) — the vmix call pattern (kappa unused)."""
    T = T1
    if T < -2.0:
        T = -2.0
    c = _sig80(S, T, P)
    beta, ABFac = _bet80(S, T, P, c)
    alpha = _alf80(S, T, P, c, ABFac)
    return alpha, beta, c["Sig0"], c["Sig"]


# --------------------------------------------------------------------------
# Shortwave absorption (mckpp_physics_swfrac_mod.F90; mckpp_fluxes_mod.F90)
# --------------------------------------------------------------------------
RFAC = (0.0, 0.58, 0.62, 0.67, 0.77, 0.78)   # 1-based by jerlov type
A1J = (0.0, 0.35, 0.6, 1.0, 1.5, 1.4)
A2J = (0.0, 23.0, 20.0, 17.0, 14.0, 7.9)


def swfrac(fact, z, jwtype):
    rmin = -80.0
    r1 = max(z * fact / A1J[jwtype], rmin)
    r2 = max(z * fact / A2J[jwtype], rmin)
    return RFAC[jwtype] * math.exp(r1) + (1.0 - RFAC[jwtype]) * math.exp(r2)


def swfrac_opt(fact, fld, cst):
    nzp1 = cst["nzp1"]
    for l in range(1, nzp1 + 1):
        rmin = -80.0
        j = fld["jerlov"]
        r1 = max(cst["zm"][l] * fact / A1J[j], rmin)
        r2 = max(cst["zm"][l] * fact / A2J[j], rmin)
        fld["swfrac"][l] = RFAC[j] * math.exp(r1) + (1.0 - RFAC[j]) * math.exp(r2)


def fluxes_swdk(z, j):
    return (RFAC[j] * math.exp(z / A1J[j])
            + (1.0 - RFAC[j]) * math.exp(z / A2J[j]))


def ntflux(fld, cst, ntime):
    """mckpp_fluxes_ntflux (mckpp_fluxes_mod.F90:91-116)."""
    nz = cst["nz"]
    if ntime <= 1:
        for k in range(0, nz + 1):
            fld["swdk_opt"][k] = fluxes_swdk(-cst["dm"][k], fld["jerlov"])
    if ntime >= 1:
        for k in range(0, nz + 1):
            fld["wXNT"][k, 1] = (-fld["sflux"][3] * fld["swdk_opt"][k]
                                 / (fld["rho"][0] * fld["cp"][0]))


# --------------------------------------------------------------------------
# wscale lookup table (mckpp_physics_lookup_mod.F90:11-66) and interpolation
# (mckpp_physics_verticalmixing_wscale_mod.F90:12-97)
# --------------------------------------------------------------------------
_NI, _NJ = 890, 48
_ZMIN, _ZMAX = -4.0e-7, 0.0
_UMIN, _UMAX = 0.0, 0.04


def build_lookup():
    epsln = 1.0e-20
    c1, am, cm, c2, zetam = 5.0, 1.257, 8.380, 16.0, -0.2
    as_, cs, c3, zetas = -28.86, 98.96, 16.0, -1.0
    deltaz = (_ZMAX - _ZMIN) / (_NI + 1)
    deltau = (_UMAX - _UMIN) / (_NJ + 1)
    wmt = np.zeros((_NI + 2, _NJ + 2))
    wst = np.zeros((_NI + 2, _NJ + 2))
    for i in range(0, _NI + 2):
        zehat = deltaz * i + _ZMIN
        for j in range(0, _NJ + 2):
            usta = deltau * j + _UMIN
            zeta = zehat / (usta ** 3 + epsln)
            if zehat >= 0.0:
                wmt[i, j] = VONK * usta / (1.0 + c1 * zeta)
                wst[i, j] = wmt[i, j]
            else:
                if zeta > zetam:
                    wmt[i, j] = VONK * usta * (1.0 - c2 * zeta) ** 0.25
                else:
                    wmt[i, j] = VONK * (am * usta ** 3 - cm * zehat) ** (1.0 / 3.0)
                if zeta > zetas:
                    wst[i, j] = VONK * usta * (1.0 - c3 * zeta) ** 0.5
                else:
                    wst[i, j] = VONK * (as_ * usta ** 3 - cs * zehat) ** (1.0 / 3.0)
    return wmt, wst


_WMT, _WST = None, None


def _tables():
    global _WMT, _WST
    if _WMT is None:
        _WMT, _WST = build_lookup()
    return _WMT, _WST


def wscale(sigma, hbl, ustar, bfsfc):
    wmt, wst = _tables()
    c1 = 5.0
    deltaz = (_ZMAX - _ZMIN) / (_NI + 1)
    deltau = (_UMAX - _UMIN) / (_NJ + 1)
    zehat = VONK * sigma * hbl * bfsfc
    if zehat <= _ZMAX:
        zdiff = zehat - _ZMIN
        iz = int(zdiff / deltaz)
        iz = min(iz, _NI)
        iz = max(iz, 0)
        izp1 = iz + 1
        udiff = ustar - _UMIN
        ju = int(udiff / deltau)
        ju = min(ju, _NJ)
        ju = max(ju, 0)
        jup1 = ju + 1
        zfrac = zdiff / deltaz - float(iz)
        ufrac = udiff / deltau - float(ju)
        fzfrac = 1.0 - zfrac
        wam = fzfrac * wmt[iz, jup1] + zfrac * wmt[izp1, jup1]
        wbm = fzfrac * wmt[iz, ju] + zfrac * wmt[izp1, ju]
        wm = (1.0 - ufrac) * wbm + ufrac * wam
        was = fzfrac * wst[iz, jup1] + zfrac * wst[izp1, jup1]
        wbs = fzfrac * wst[iz, ju] + zfrac * wst[izp1, ju]
        ws = (1.0 - ufrac) * wbs + ufrac * was
    else:
        ucube = ustar ** 3
        wm = VONK * ustar * ucube / (ucube + c1 * zehat)
        ws = wm
    return wm, ws


# --------------------------------------------------------------------------
# z121 / rimix / ddmix
# --------------------------------------------------------------------------
def z121(kmp1, vlo, vhi, V):
    """In-place 1-2-1 smoothing (mckpp_physics_verticalmixing_z121_mod.F90)."""
    km = kmp1 - 1
    w = np.zeros(kmp1 + 1)
    w[0] = 0.0
    w[kmp1] = 0.0
    V[0] = 0.0
    V[kmp1] = 0.0
    for k in range(1, km + 1):
        if V[k] < vlo or V[k] > vhi:
            w[k] = 0.0
        else:
            w[k] = 1.0
    for k in range(1, km + 1):
        tmp = V[k]
        V[k] = w[k - 1] * V[0] + 2.0 * V[k] + w[k + 1] * V[k + 1]
        wait = w[k - 1] + 2.0 + w[k + 1]
        V[k] = V[k] / wait
        V[0] = tmp


def rimix(km, kmp1, fld, cst):
    epsln = 1.0e-16
    Riinfty, Ricon = 0.8, -0.2
    difm0, difs0 = 0.005, 0.005
    difmiw, difsiw = 0.0001, 0.00001
    difmcon, difscon = 0.0, 0.0
    c1, c0 = 1.0, 0.0
    for ki in range(1, km + 1):
        fld["Rig"][ki] = (fld["dbloc"][ki] * (cst["zm"][ki] - cst["zm"][ki + 1])
                          / (fld["Shsq"][ki] + epsln))
        fld["dift"][ki] = fld["Rig"][ki]
        fld["difm"][ki] = fld["dift"][ki]
    z121(kmp1, c0, Riinfty, fld["difm"])
    for ki in range(1, km + 1):
        Rigg = max(fld["dift"][ki], Ricon)
        ratio = min((Ricon - Rigg) / Ricon, c1)
        fcon = (c1 - ratio * ratio) ** 3
        Rigg = max(fld["difm"][ki], c0)
        ratio = min(Rigg / Riinfty, c1)
        fri = (c1 - ratio * ratio) ** 3
        fld["difm"][ki] = difmiw + fcon * difmcon + fri * difm0
        fld["difs"][ki] = difsiw + fcon * difscon + fri * difs0
        fld["dift"][ki] = fld["difs"][ki]
    fld["difm"][0] = c0
    fld["dift"][0] = c0
    fld["difs"][0] = c0


def ddmix(km, kmp1, alphaDT, betaDS, fld):
    Rrho0, dsfmax = 1.9, 1.0e-4
    for ki in range(1, km + 1):
        if alphaDT[ki] > betaDS[ki] and betaDS[ki] > 0.0:
            Rrho = min(alphaDT[ki] / betaDS[ki], Rrho0)
            diffdd = 1.0 - ((Rrho - 1.0) / (Rrho0 - 1.0)) ** 2
            diffdd = dsfmax * diffdd ** 3
            fld["dift"][ki] += diffdd * 0.8 / Rrho
            fld["difs"][ki] += diffdd
        elif alphaDT[ki] < 0.0 and betaDS[ki] < 0.0 and alphaDT[ki] < betaDS[ki]:
            Rrho = alphaDT[ki] / betaDS[ki]
            diffdd = 1.5e-6 * 9.0 * 0.101 * math.exp(
                4.6 * math.exp(-0.54 * (1.0 / Rrho - 1.0)))
            prandtl = 0.15 * Rrho
            if Rrho > 0.5:
                prandtl = (1.85 - 0.85 / Rrho) * Rrho
            fld["dift"][ki] += diffdd
            fld["difs"][ki] += prandtl * diffdd


# --------------------------------------------------------------------------
# bldepth (mckpp_physics_verticalmixing_bldepth_mod.F90:32-203)
# --------------------------------------------------------------------------
def bldepth(km, kmp1, dVsq, Ritop, ustar, Bo, Bosol, fld, cst, ntime):
    epsln = 1.0e-16
    Ricr = 0.30
    epsilon = 0.1
    cekman, cmonob = 0.7, 1.0
    cs, cv = 98.96, 1.6
    hbf = 1.0
    zm = cst["zm"]

    Vtc = cv * math.sqrt(0.2 / cs / epsilon) / VONK ** 2 / Ricr
    ka, ku = 1, 2
    Rib = {1: 0.0, 2: 0.0}
    dmo = {1: -zm[kmp1], 2: 0.0}
    kbl = km
    hbl = -zm[km]
    hek = cekman * ustar / (abs(fld["f"]) + epsln)
    bfsfc = 0.0
    stable = 0.0
    sigma = 0.0
    caseA = 0.0
    wm = ws = 0.0

    for kl in range(2, km + 1):
        if ntime <= 1 and kl == 2:
            swfrac_opt(hbf, fld, cst)
        if kbl >= km:
            caseA = -zm[kl]
            bfsfc = Bo + Bosol * (1.0 - fld["swfrac"][kl])
            stable = 0.5 + math.copysign(0.5, bfsfc + epsln)
            sigma = stable * 1.0 + (1.0 - stable) * epsilon
        wm, ws = wscale(sigma, caseA, ustar, bfsfc)
        if kbl >= km:
            bvsq = 0.5 * (fld["dbloc"][kl - 1] / (zm[kl - 1] - zm[kl])
                          + fld["dbloc"][kl] / (zm[kl] - zm[kl + 1]))
            Vtsq = -zm[kl] * ws * math.sqrt(abs(bvsq)) * Vtc
            Rib[ku] = Ritop[kl] / (dVsq[kl] + Vtsq + epsln)
            Rib[ku] = max(Rib[ku], Rib[ka] + epsln)
            hri = -zm[kl - 1] + (zm[kl - 1] - zm[kl]) * (Ricr - Rib[ka]) \
                / (Rib[ku] - Rib[ka])
            fmonob = stable * 1.0
            dmo[ku] = cmonob * ustar ** 3 / VONK / (abs(bfsfc) + epsln)
            dmo[ku] = fmonob * dmo[ku] - (1.0 - fmonob) * zm[kmp1]
            if dmo[ku] <= -zm[kl]:
                hmonob = (dmo[ku] - dmo[ka]) / (zm[kl - 1] - zm[kl])
                hmonob = (dmo[ku] + hmonob * zm[kl]) / (1.0 - hmonob)
            else:
                hmonob = -zm[kmp1]
            fekman = stable * 1.0
            hekman = fekman * hek - (1.0 - fekman) * zm[kmp1]
            hmin = min(hri, hmonob, hekman, -fld["ocdepth"])
            if hmin < -zm[kl]:
                if not fld["l_initflag"]:
                    if hmin < -zm[kl - 1]:
                        hmin2 = min(hri, hmonob, -fld["ocdepth"])
                        if hmin2 < -zm[kl]:
                            hmin = hmin2
                hbl = hmin
                kbl = kl
        ka, ku = ku, ka

    bfsfc = swfrac(-1.0, hbl, fld["jerlov"])
    bfsfc = Bo + Bosol * (1.0 - bfsfc)
    stable = 0.5 + math.copysign(0.5, bfsfc)
    bfsfc = bfsfc + stable * epsln
    caseA = 0.5 + math.copysign(0.5, -zm[kbl] - 0.5 * cst["hm"][kbl] - hbl)
    return hbl, bfsfc, stable, caseA, kbl


# --------------------------------------------------------------------------
# blmix / enhance (mckpp_physics_verticalmixing_blmix_mod.F90,
#                  mckpp_physics_verticalmixing_enhance_mod.F90)
# --------------------------------------------------------------------------
def blmix(km, ustar, bfsfc, hbl, stable, caseA, kbl, fld, cst):
    epsln = 1.0e-20
    epsilon = 0.1
    c1 = 5.0
    cs = 98.96
    cstar = 5.0
    zm, hm = cst["zm"], cst["hm"]

    cg = cstar * VONK * (cs * VONK * epsilon) ** (1.0 / 3.0)
    sigma = stable * 1.0 + (1.0 - stable) * epsilon
    wm, ws = wscale(sigma, hbl, ustar, bfsfc)
    kn = int(caseA + epsln) * (kbl - 1) + (1 - int(caseA + epsln)) * kbl

    delhat = 0.5 * hm[kn] - zm[kn] - hbl
    R = 1.0 - delhat / hm[kn]
    dvdzup = (fld["difm"][kn - 1] - fld["difm"][kn]) / hm[kn]
    dvdzdn = (fld["difm"][kn] - fld["difm"][kn + 1]) / hm[kn + 1]
    viscp = 0.5 * ((1.0 - R) * (dvdzup + abs(dvdzup))
                   + R * (dvdzdn + abs(dvdzdn)))
    dvdzup = (fld["difs"][kn - 1] - fld["difs"][kn]) / hm[kn]
    dvdzdn = (fld["difs"][kn] - fld["difs"][kn + 1]) / hm[kn + 1]
    difsp = 0.5 * ((1.0 - R) * (dvdzup + abs(dvdzup))
                   + R * (dvdzdn + abs(dvdzdn)))
    dvdzup = (fld["dift"][kn - 1] - fld["dift"][kn]) / hm[kn]
    dvdzdn = (fld["dift"][kn] - fld["dift"][kn + 1]) / hm[kn + 1]
    diftp = 0.5 * ((1.0 - R) * (dvdzup + abs(dvdzup))
                   + R * (dvdzdn + abs(dvdzdn)))
    visch = fld["difm"][kn] + viscp * delhat
    difsh = fld["difs"][kn] + difsp * delhat
    difth = fld["dift"][kn] + diftp * delhat

    f1 = stable * c1 * bfsfc / (ustar ** 4 + epsln)
    gat1 = np.zeros(4)
    dat1 = np.zeros(4)
    gat1[1] = visch / hbl / (wm + epsln)
    dat1[1] = min(-viscp / (wm + epsln) + f1 * visch, 0.0)
    gat1[2] = difsh / hbl / (ws + epsln)
    dat1[2] = min(-difsp / (ws + epsln) + f1 * difsh, 0.0)
    gat1[3] = difth / hbl / (ws + epsln)
    dat1[3] = min(-diftp / (ws + epsln) + f1 * difth, 0.0)

    blmc = np.zeros((km + 1, 4))
    for ki in range(1, km + 1):
        sig = (-zm[ki] + 0.5 * hm[ki]) / hbl
        sigma = stable * sig + (1.0 - stable) * min(sig, epsilon)
        wm, ws = wscale(sigma, hbl, ustar, bfsfc)
        sig = (-zm[ki] + 0.5 * hm[ki]) / hbl
        a1 = sig - 2.0
        a2 = 3.0 - 2.0 * sig
        a3 = sig - 1.0
        Gm = a1 + a2 * gat1[1] + a3 * dat1[1]
        Gs = a1 + a2 * gat1[2] + a3 * dat1[2]
        Gt = a1 + a2 * gat1[3] + a3 * dat1[3]
        blmc[ki, 1] = hbl * wm * sig * (1.0 + sig * Gm)
        blmc[ki, 2] = hbl * ws * sig * (1.0 + sig * Gs)
        blmc[ki, 3] = hbl * ws * sig * (1.0 + sig * Gt)
        fld["ghat"][ki] = (1.0 - stable) * cg / (ws * hbl + epsln)

    sig = -zm[kbl - 1] / hbl
    sigma = stable * sig + (1.0 - stable) * min(sig, epsilon)
    wm, ws = wscale(sigma, hbl, ustar, bfsfc)
    sig = -zm[kbl - 1] / hbl
    a1 = sig - 2.0
    a2 = 3.0 - 2.0 * sig
    a3 = sig - 1.0
    Gm = a1 + a2 * gat1[1] + a3 * dat1[1]
    Gs = a1 + a2 * gat1[2] + a3 * dat1[2]
    Gt = a1 + a2 * gat1[3] + a3 * dat1[3]
    dkm1 = np.zeros(4)
    dkm1[1] = hbl * wm * sig * (1.0 + sig * Gm)
    dkm1[2] = hbl * ws * sig * (1.0 + sig * Gs)
    dkm1[3] = hbl * ws * sig * (1.0 + sig * Gt)
    return dkm1, blmc


def enhance(km, dkm1, hbl, kbl, caseA, blmc, fld, cst):
    zm = cst["zm"]
    for ki in range(1, km):
        if ki == kbl - 1:
            delta = (hbl + zm[ki]) / (zm[ki] - zm[ki + 1])
            dkmp5 = caseA * fld["difm"][ki] + (1.0 - caseA) * blmc[ki, 1]
            dstar = (1.0 - delta) ** 2 * dkm1[1] + delta ** 2 * dkmp5
            blmc[ki, 1] = (1.0 - delta) * fld["difm"][ki] + delta * dstar
            dkmp5 = caseA * fld["difs"][ki] + (1.0 - caseA) * blmc[ki, 2]
            dstar = (1.0 - delta) ** 2 * dkm1[2] + delta ** 2 * dkmp5
            blmc[ki, 2] = (1.0 - delta) * fld["difs"][ki] + delta * dstar
            dkmp5 = caseA * fld["dift"][ki] + (1.0 - caseA) * blmc[ki, 3]
            dstar = (1.0 - delta) ** 2 * dkm1[3] + delta ** 2 * dkmp5
            blmc[ki, 3] = (1.0 - delta) * fld["dift"][ki] + delta * dstar
            fld["ghat"][ki] = (1.0 - caseA) * fld["ghat"][ki]


# --------------------------------------------------------------------------
# kppmix (mckpp_physics_verticalmixing_kppmix_mod.F90:25-126)
# --------------------------------------------------------------------------
def kppmix(km, kmp1, dVsq, ustar, Bo, Bosol, alphaDT, betaDS, Ritop,
           fld, cst, ntime):
    for ki in range(0, km + 1):
        fld["difm"][ki] = 0.0
        fld["difs"][ki] = 0.0
        fld["dift"][ki] = 0.0
    if cst["LRI"]:
        rimix(km, kmp1, fld, cst)
    if cst["LDD"]:
        ddmix(km, kmp1, alphaDT, betaDS, fld)
    fld["difm"][kmp1] = fld["difm"][km]
    fld["difs"][kmp1] = fld["difs"][km]
    fld["dift"][kmp1] = fld["dift"][km]

    hbl = -cst["zm"][km]
    kbl = km
    if cst["LKPP"]:
        hbl, bfsfc, stable, caseA, kbl = bldepth(
            km, kmp1, dVsq, Ritop, ustar, Bo, Bosol, fld, cst, ntime)
        dkm1, blmc = blmix(km, ustar, bfsfc, hbl, stable, caseA, kbl,
                           fld, cst)
        enhance(km, dkm1, hbl, kbl, caseA, blmc, fld, cst)
        for ki in range(1, km + 1):
            if ki < kbl:
                fld["difm"][ki] = blmc[ki, 1]
                fld["difs"][ki] = blmc[ki, 2]
                fld["dift"][ki] = blmc[ki, 3]
            else:
                fld["ghat"][ki] = 0.0
    return hbl, kbl


# --------------------------------------------------------------------------
# verticalmixing (mckpp_physics_verticalmixing_mod.F90:14-161)
# --------------------------------------------------------------------------
def verticalmixing(fld, cst, ntime):
    nz, nzp1 = cst["nz"], cst["nzp1"]
    zm = cst["zm"]
    epsilon = 0.1

    _, _, sigma0, _ = abk80(0.0, fld["X"][1, 1], -zm[1])
    fld["rhoh2o"] = 1000.0 + sigma0
    _, _, sigma0, _ = abk80(SICE, fld["X"][1, 1], -zm[1])
    rhob = 1000.0 + sigma0

    for k in range(1, nzp1 + 1):
        alpha, beta, sigma0, _ = abk80(fld["X"][k, 2] + fld["Sref"],
                                       fld["X"][k, 1], -zm[k])
        fld["rho"][k] = 1000.0 + sigma0
        fld["cp"][k] = cpsw(fld["X"][k, 2] + fld["Sref"], fld["X"][k, 1],
                            -zm[k])
        fld["talpha"][k] = alpha
        fld["sbeta"][k] = beta
        fld["buoy"][k] = -GRAV * sigma0 / 1000.0
    fld["rho"][0] = fld["rho"][1]
    fld["cp"][0] = fld["cp"][1]
    fld["talpha"][0] = fld["talpha"][1]
    fld["sbeta"][0] = fld["sbeta"][1]

    ntflux(fld, cst, ntime)

    fld["wU"][0, 1] = -fld["sflux"][1] / fld["rho"][0]
    fld["wU"][0, 2] = -fld["sflux"][2] / fld["rho"][0]
    tau = math.sqrt(fld["sflux"][1] ** 2 + fld["sflux"][2] ** 2) + 1.0e-16
    ustar = math.sqrt(tau / fld["rho"][0])

    fld["wX"][0, 1] = -fld["sflux"][4] / fld["rho"][0] / fld["cp"][0]
    fld["wX"][0, 2] = (fld["Ssurf"] * fld["sflux"][6] / fld["rhoh2o"]
                       + (fld["Ssurf"] - SICE) * fld["sflux"][5] / rhob)
    B0 = -GRAV * (fld["talpha"][0] * fld["wX"][0, 1]
                  - fld["sbeta"][0] * fld["wX"][0, 2])
    fld["wX"][0, NSP1] = -B0
    B0sol = GRAV * fld["talpha"][0] * fld["sflux"][3] \
        / (fld["rho"][0] * fld["cp"][0])

    alphaDT = np.zeros(nzp1 + 1)
    betaDS = np.zeros(nzp1 + 1)
    for n in range(1, nz + 1):
        alphaDT[n] = 0.5 * (fld["talpha"][n] + fld["talpha"][n + 1]) * \
            (fld["X"][n, 1] - fld["X"][n + 1, 1])
        betaDS[n] = 0.5 * (fld["sbeta"][n] + fld["sbeta"][n + 1]) * \
            (fld["X"][n, 2] - fld["X"][n + 1, 2])

    dVsq = np.zeros(nzp1 + 1)
    Ritop = np.zeros(nz + 1)
    for n in range(1, nz + 1):
        zref = epsilon * zm[n]
        wz = max(zm[1], zref)
        fld["uref"] = fld["U"][1, 1] * wz / zref
        fld["vref"] = fld["U"][1, 2] * wz / zref
        bref = fld["buoy"][1] * wz / zref
        for kl in range(1, nz + 1):
            if zref >= zm[kl]:
                break
            wz = min(zm[kl] - zm[kl + 1], zm[kl] - zref)
            del_ = 0.5 * wz / (zm[kl] - zm[kl + 1])
            fld["uref"] = fld["uref"] - wz * (
                fld["U"][kl, 1] + del_ * (fld["U"][kl + 1, 1]
                                          - fld["U"][kl, 1])) / zref
            fld["vref"] = fld["vref"] - wz * (
                fld["U"][kl, 2] + del_ * (fld["U"][kl + 1, 2]
                                          - fld["U"][kl, 2])) / zref
            bref = bref - wz * (fld["buoy"][kl] + del_ * (
                fld["buoy"][kl + 1] - fld["buoy"][kl])) / zref
        Ritop[n] = (zref - zm[n]) * (bref - fld["buoy"][n])
        fld["dbloc"][n] = fld["buoy"][n] - fld["buoy"][n + 1]
        dVsq[n] = (fld["uref"] - fld["U"][n, 1]) ** 2 \
            + (fld["vref"] - fld["U"][n, 2]) ** 2
        fld["Shsq"][n] = (fld["U"][n, 1] - fld["U"][n + 1, 1]) ** 2 \
            + (fld["U"][n, 2] - fld["U"][n + 1, 2]) ** 2

    hmixn, kmixn = kppmix(nz, nzp1, dVsq, ustar, B0, B0sol, alphaDT, betaDS,
                          Ritop, fld, cst, ntime)

    dlimit = 0.00001
    vlimit = 0.0001
    for k in range(nz, nzp1 + 1):
        fld["difm"][k] = vlimit
        fld["difs"][k] = dlimit
        fld["dift"][k] = dlimit
    fld["ghat"][nz] = 0.0
    return hmixn, kmixn


# --------------------------------------------------------------------------
# solvers (mckpp_physics_solvers.F90)
# --------------------------------------------------------------------------
def tridcof(diff, nzi, ind, cst):
    tri = cst["tri"]          # tri[k, 0|1]
    cu = np.zeros(nzi + 1)
    cc = np.zeros(nzi + 1)
    cl = np.zeros(nzi + 1)
    cu[1] = 0.0
    cc[1] = 1.0 + tri[1, 1] * diff[1]
    cl[1] = -tri[1, 1] * diff[1]
    for i in range(2, nzi + 1):
        cu[i] = -tri[i, 0] * diff[i - 1]
        cc[i] = 1.0 + tri[i, 1] * diff[i] + tri[i, 0] * diff[i - 1]
        cl[i] = -tri[i, 1] * diff[i]
    cl[nzi] = 0.0
    return cu, cc, cl


def tridrhs(npd, h, yo, ntflx, diff, ghat, sturflux, ghatflux, dto, nzi,
            ind, cst):
    tri = cst["tri"]
    rhs = np.zeros(nzi + 1)
    divflx = 1.0 / float(npd)
    rhs[1] = yo[1] + dto / h[1] * (ghatflux * diff[1] * ghat[1]
                                   - sturflux * divflx + ntflx[1] - ntflx[0])
    if npd >= 2:
        for i in range(2, npd + 1):
            rhs[i] = yo[i] + dto / h[i] * (
                ghatflux * diff[i] * ghat[i]
                - ghatflux * diff[i - 1] * ghat[i - 1]
                - sturflux * divflx + ntflx[i] - ntflx[i - 1])
    for i in range(npd + 1, nzi):
        rhs[i] = yo[i] + dto / h[i] * (
            ghatflux * (diff[i] * ghat[i] - diff[i - 1] * ghat[i - 1])
            + ntflx[i] - ntflx[i - 1])
    if nzi > 1:
        i = nzi
        rhs[i] = yo[i] + dto / h[i] * (
            ghatflux * (diff[i] * ghat[i] - diff[i - 1] * ghat[i - 1])
            + ntflx[i] - ntflx[i - 1]) + yo[i + 1] * tri[i, 1] * diff[i]
    return rhs


def tridmat(cu, cc, cl, rhs, yo, nzi):
    yn = np.zeros(nzi + 2)
    gam = np.zeros(nzi + 1)
    bet = cc[1]
    yn[1] = rhs[1] / bet
    for i in range(2, nzi + 1):
        gam[i] = cl[i - 1] / bet
        bet = cc[i] - cu[i] * gam[i]
        if bet == 0.0:
            raise ZeroDivisionError("tridiagonal solver zero pivot")
        yn[i] = (rhs[i] - cu[i] * yn[i - 1]) / bet
    for i in range(nzi - 1, 0, -1):
        yn[i] = yn[i] - gam[i + 1] * yn[i + 1]
    yn[nzi + 1] = yo[nzi + 1]
    return yn


def rhsmod(jsclr, mode, A, dto, km, dm_km, nzi, rhs, fld, cst):
    """mckpp_physics_solvers_rhsmod (mckpp_physics_solvers.F90:176-335)."""
    hm, zm = cst["hm"], cst["zm"]
    if mode <= 0:
        return
    Am = A
    if mode == 1:
        if jsclr == 1:
            fact = dto * Am / (fld["rho"][1] * fld["cp"][1])
        else:
            fact = dto * Am * 0.033
        rhs[1] = rhs[1] + fact / hm[1]
    elif mode == 2:
        delta = 0.0
        for n in range(1, km):
            delta += hm[n]
        for n in range(1, km):
            if jsclr == 1:
                fact = dto * Am / (fld["rho"][n] * fld["cp"][n])
            else:
                fact = dto * Am * 0.033
            rhs[n] = rhs[n] + fact / delta
    elif mode == 3:
        delta = 0.0
        for n in range(1, nzi + 1):
            delta += hm[n]
        for n in range(1, nzi + 1):
            if jsclr == 1:
                fact = dto * Am / (fld["rho"][n] * fld["cp"][n])
            else:
                fact = dto * Am * 0.033
            rhs[n] = rhs[n] + fact / delta
    elif mode == 4:
        nzend = nzi - 1
        n1 = 0
        while True:
            n1 += 1
            if not zm[n1] >= -100.0:
                break
        delta = 0.0
        for n in range(n1, nzend + 1):
            delta += hm[n]
        for n in range(n1, nzend + 1):
            if jsclr == 1:
                fact = dto * Am / (fld["rho"][n] * fld["cp"][n])
            else:
                fact = dto * Am * 0.033
            rhs[n] = rhs[n] + fact / delta
    elif mode == 5:
        if jsclr == 1:
            fact = dto * Am / (fld["rho"][nzi] * fld["cp"][nzi])
        else:
            fact = dto * Am * 0.033
        rhs[nzi] = rhs[nzi] + fact / hm[nzi]
    else:
        if mode == 6:
            n1 = 1
            depth = hm[1]
            dmax = dm_km - 0.5 * (hm[km] + hm[km - 1])
            delta = 0.0
            n2 = n1
            for n in range(n1, nzi + 1):
                n2 = n
                delta += hm[n]
                depth += hm[n + 1]
                if depth >= dmax:
                    break
        elif mode == 7:
            n1 = km - 1
            depth = dm_km - 0.5 * hm[km]
            dmax = 100.0
            delta = 0.0
            n2 = n1
            for n in range(n1, nzi + 1):
                n2 = n
                delta += hm[n]
                depth += hm[n + 1]
                if depth >= dmax:
                    break
        else:
            raise ValueError(f"mode out of range, mode = {mode}")
        for n in range(n1, n2 + 1):
            if jsclr == 1:
                fact = dto * Am / (fld["rho"][n] * fld["cp"][n])
            else:
                fact = dto * Am * 0.033
            rhs[n] = rhs[n] + fact / delta


# --------------------------------------------------------------------------
# ocnint (mckpp_physics_ocnint_mod.F90:19-221)
# --------------------------------------------------------------------------
def ocnint(fld, cst, intri, kmixe, Uo, Xo):
    nz, nzp1 = cst["nz"], cst["nzp1"]
    dto = cst["dto"]
    hm = cst["hm"]
    tri = cst["tri"]
    ftemp = fld["f"]

    diff = np.zeros(nzp1 + 1)
    for k in range(0, nzp1 + 1):
        diff[k] = fld["difm"][k] if k <= nzp1 else 0.0
    cu, cc, cl = tridcof(diff, nz, intri, cst)

    rhs = np.zeros(nz + 1)
    rhs[1] = Uo[1, 1] + dto * (ftemp * 0.5 * (Uo[1, 2] + fld["U"][1, 2])
                               - fld["wU"][0, 1] / hm[1])
    for i in range(2, nz):
        rhs[i] = Uo[i, 1] + dto * ftemp * 0.5 * (Uo[i, 2] + fld["U"][i, 2])
    i = nz
    rhs[i] = Uo[i, 1] + dto * ftemp * 0.5 * (Uo[i, 2] + fld["U"][i, 2]) \
        + tri[i, 1] * fld["difm"][i] * Uo[i + 1, 1]
    yn = tridmat(cu, cc, cl, rhs, Uo[:, 1], nz)
    for k in range(1, nzp1 + 1):
        fld["U"][k, 1] = yn[k]

    rhs[1] = Uo[1, 2] - dto * (ftemp * 0.5 * (Uo[1, 1] + fld["U"][1, 1])
                               + fld["wU"][0, 2] / hm[1])
    for i in range(2, nz):
        rhs[i] = Uo[i, 2] - dto * ftemp * 0.5 * (Uo[i, 1] + fld["U"][i, 1])
    i = nz
    rhs[i] = Uo[i, 2] - dto * ftemp * 0.5 * (Uo[i, 1] + fld["U"][i, 1]) \
        + tri[i, 1] * fld["difm"][i] * Uo[i + 1, 2]
    npd = 1
    yn = tridmat(cu, cc, cl, rhs, Uo[:, 2], nz)
    for k in range(1, nzp1 + 1):
        fld["U"][k, 2] = yn[k]

    # ---- temperature --------------------------------------------------
    ghatflux = fld["wX"][0, 1]
    sturflux = fld["wX"][0, 1]
    diff = np.array(fld["dift"])
    ntflx = np.zeros((nzp1 + 1, NSCLR + 1))
    gcap = np.zeros(nzp1 + 1)
    ntflx[0, 1] = fld["wXNT"][0, 1]
    for k in range(1, nzp1 + 1):
        if k <= nz:
            gcap[k] = fld["ghat"][k]
        ntflx[k, 1] = fld["wXNT"][k, 1] if k <= nz else 0.0
    cu, cc, cl = tridcof(diff, nz, intri, cst)
    rhs = tridrhs(npd, hm, Xo[:, 1], ntflx[:, 1], diff, gcap, sturflux,
                  ghatflux, dto, nz, intri, cst)

    if cst["L_RELAX_SST"] and not cst["L_FCORR_WITHZ"] and not cst["L_FCORR"]:
        if fld["relax_sst"] > 1.0e-10:
            if not cst["L_RELAX_CALCONLY"]:
                rhs[1] = rhs[1] + dto * fld["relax_sst"] * \
                    (fld["SST0"] - Xo[1, 1]) * cst["dm"][kmixe] / hm[1]
            fld["fcorr"] = fld["relax_sst"] * (fld["SST0"] - Xo[1, 1]) * \
                cst["dm"][kmixe] * fld["rho"][1] * fld["cp"][1]
        else:
            fld["fcorr"] = 0.0

    if cst["L_FCORR"] and not cst["L_RELAX_SST"] and not cst["L_FCORR_WITHZ"]:
        rhs[1] = rhs[1] + dto * fld["fcorr_twod"] / \
            (fld["rho"][1] * fld["cp"][1] * hm[1])

    fld["tinc_fcorr"][:] = 0.0
    if cst["L_FCORR_WITHZ"] and not cst["L_FCORR"]:
        for k in range(1, nzp1 + 1):
            fld["tinc_fcorr"][k] = dto * fld["fcorr_withz"][k] / \
                (fld["rho"][k] * fld["cp"][k])
    if cst["L_RELAX_OCNT"]:
        for k in range(1, nzp1 + 1):
            fld["tinc_fcorr"][k] = fld["tinc_fcorr"][k] + \
                dto * fld["relax_ocnt"] * (fld["ocnT_clim"][k] - Xo[k, 1])
    for k in range(1, nzp1 + 1):
        if k <= nz:
            rhs[k] = rhs[k] + fld["tinc_fcorr"][k]
        fld["ocnTcorr"][k] = fld["tinc_fcorr"][k] * fld["rho"][k] * \
            fld["cp"][k] / dto

    yn = tridmat(cu, cc, cl, rhs, Xo[:, 1], nz)
    for k in range(1, nzp1 + 1):
        fld["X"][k, 1] = yn[k]

    # ---- salinity and other scalars ------------------------------------
    diff = np.array(fld["difs"])
    cu, cc, cl = tridcof(diff, nz, intri, cst)
    for n in range(2, NSCLR + 1):
        for k in range(0, nzp1 + 1):
            ntflx[k, n] = fld["wXNT"][k, n] if k <= nz else 0.0
        ghatflux = fld["wX"][0, n]
        sturflux = fld["wX"][0, n]
        rhs = tridrhs(npd, hm, Xo[:, n], ntflx[:, n], diff, gcap, sturflux,
                      ghatflux, dto, nz, intri, cst)
        for imode in range(1, fld["nmodeadv"][2] + 1):
            adv_mode = fld["modeadv"][imode, 2]
            adv_mag = fld["advection"][imode, 2]
            rhsmod(2, adv_mode, adv_mag, dto, kmixe, cst["dm"][kmixe],
                   nz, rhs, fld, cst)
        if n == 2:
            fld["sinc_fcorr"][:] = 0.0
            if cst["L_SFCORR_WITHZ"] and not cst["L_SFCORR"]:
                for k in range(1, nzp1 + 1):
                    fld["sinc_fcorr"][k] = dto * fld["sfcorr_withz"][k]
            if cst["L_RELAX_SAL"]:
                for k in range(1, nzp1 + 1):
                    fld["sinc_fcorr"][k] = fld["sinc_fcorr"][k] + \
                        dto * fld["relax_sal"] * (fld["sal_clim"][k] - Xo[k, n])
            for k in range(1, nzp1 + 1):
                if k <= nz:
                    rhs[k] = rhs[k] + fld["sinc_fcorr"][k]
                fld["scorr"][k] = fld["sinc_fcorr"][k] / dto
        yn = tridmat(cu, cc, cl, rhs, Xo[:, n], nz)
        for k in range(1, nzp1 + 1):
            fld["X"][k, n] = yn[k]


# --------------------------------------------------------------------------
# ocnstep (mckpp_physics_ocnstep_mod.F90:43-357)
# --------------------------------------------------------------------------
def ocnstep(fld, cst, ntime):
    nz, nzp1 = cst["nz"], cst["nzp1"]
    hm, dm = cst["hm"], cst["dm"]
    comp_iter_max = 10
    rmsd_threshold = (1.0, 1.0, 1.0, 1.0)
    lam = 0.5
    itermax = cst["itermax"]
    hmixtolfrac = cst["hmixtolfrac"]

    Uo = np.array(fld["U"])
    Xo = np.array(fld["X"])
    fld["comp_flag"] = True
    fld["reset_flag"] = 0
    fld["dampu_flag"] = 0.0
    fld["dampv_flag"] = 0.0

    Ux = np.zeros((nzp1 + 1, NVEL + 1))
    Xx = np.zeros((nzp1 + 1, NSCLR + 1))
    hmixe = hmixn = 0.0
    kmixe = kmixn = nz

    while fld["comp_flag"] and fld["reset_flag"] <= comp_iter_max:
        # extrapolation from the two-level history
        if fld["old"] < 0 or fld["old"] > 1:
            fld["old"] = fld["new"]
        if fld["new"] < 0 or fld["new"] > 1:
            fld["new"] = fld["old"]
        for k in range(1, nzp1 + 1):
            for l in range(1, NVEL + 1):
                fld["U"][k, l] = 2.0 * fld["Us"][k, l, fld["new"]] \
                    - fld["Us"][k, l, fld["old"]]
                Ux[k, l] = fld["U"][k, l]
            for l in range(1, NSCLR + 1):
                fld["X"][k, l] = 2.0 * fld["Xs"][k, l, fld["new"]] \
                    - fld["Xs"][k, l, fld["old"]]
                Xx[k, l] = fld["X"][k, l]

        iter_ = 0
        iconv = 0
        for iter_ in range(0, 3):
            for k in range(1, nzp1 + 1):
                for l in range(1, NVEL + 1):
                    fld["U"][k, l] = lam * Ux[k, l] + (1 - lam) * fld["U"][k, l]
                    Ux[k, l] = fld["U"][k, l]
                for l in range(1, NSCLR + 1):
                    fld["X"][k, l] = lam * Xx[k, l] + (1 - lam) * fld["X"][k, l]
                    Xx[k, l] = fld["X"][k, l]
            hmixe, kmixe = verticalmixing(fld, cst, ntime)
            ocnint(fld, cst, 1, kmixe, Uo, Xo)
        iter_ = 3

        if cst["LKPP"]:
            while True:                                   # label 45
                for k in range(1, nzp1 + 1):
                    for l in range(1, NVEL + 1):
                        fld["U"][k, l] = lam * Ux[k, l] \
                            + (1 - lam) * fld["U"][k, l]
                        Ux[k, l] = fld["U"][k, l]
                    for l in range(1, NSCLR + 1):
                        fld["X"][k, l] = lam * Xx[k, l] \
                            + (1 - lam) * fld["X"][k, l]
                        Xx[k, l] = fld["X"][k, l]
                hmixn, kmixn = verticalmixing(fld, cst, ntime)
                ocnint(fld, cst, 1, kmixn, Uo, Xo)
                iter_ += 1

                tol = hmixtolfrac * hm[kmixn]
                if kmixn == nzp1:
                    tol = hmixtolfrac * hm[nz]
                if abs(hmixn - hmixe) > tol:
                    iconv = 0
                else:
                    iconv += 1
                if iconv < 3:
                    if iter_ < itermax:
                        hmixe = hmixn
                        kmixe = kmixn
                        continue
                    else:
                        if hmixn > hmixe:
                            hmixe = hmixn
                            kmixe = kmixn
                            continue
                break
        else:
            hmixn, kmixn = hmixe, kmixe
        fld["niter"] = iter_          # instrumentation (not in the reference)

        # computational-instability trap
        fld["comp_flag"] = False
        for k in range(1, nz + 1):
            if (abs(fld["U"][k, 1]) >= 10 or abs(fld["U"][k, 2]) >= 10 or
                    abs(fld["X"][k, 1] - fld["X"][k + 1, 1]) >= 10):
                fld["comp_flag"] = True
                fld["f"] = fld["f"] * 1.01
        if not fld["comp_flag"]:
            rmsd = [0.0] * 5
            for k in range(1, nzp1 + 1):
                w = hm[k] / dm[nz]
                rmsd[1] += (fld["U"][k, 1] - Uo[k, 1]) ** 2 * w
                rmsd[2] += (fld["U"][k, 2] - Uo[k, 2]) ** 2 * w
                rmsd[3] += (fld["X"][k, 1] - Xo[k, 1]) ** 2 * w
                rmsd[4] += (fld["X"][k, 2] - Xo[k, 2]) ** 2 * w
            for k in range(1, 5):
                rmsd[k] = math.sqrt(rmsd[k])
                if rmsd[k] >= rmsd_threshold[k - 1]:
                    fld["comp_flag"] = True
                    fld["f"] = fld["f"] * 1.01
        fld["reset_flag"] += 1

    # diagnostic fluxes
    for k in range(1, nz + 1):
        deltaz = 0.5 * (hm[k] + hm[k + 1])
        for n in range(1, NSCLR + 1):
            fld["wX"][k, n] = -fld["difs"][k] * (
                (fld["X"][k, n] - fld["X"][k + 1, n]) / deltaz
                - fld["ghat"][k] * fld["wX"][0, n])
        if cst["LDD"]:
            fld["wX"][k, 1] = -fld["dift"][k] * (
                (fld["X"][k, 1] - fld["X"][k + 1, 1]) / deltaz
                - fld["ghat"][k] * fld["wX"][0, 1])
        fld["wX"][k, NSP1] = GRAV * (fld["talpha"][k] * fld["wX"][k, 1]
                                     - fld["sbeta"][k] * fld["wX"][k, 2])
        for n in range(1, NVEL + 1):
            fld["wU"][k, n] = -fld["difm"][k] * (
                fld["U"][k, n] - fld["U"][k + 1, n]) / deltaz

    fld["hmix"] = hmixn
    fld["kmix"] = kmixn
    fld["uref"] = fld["U"][1, 1]
    fld["vref"] = fld["U"][1, 2]
    fld["Tref"] = fld["X"][1, 1]
    if cst["L_SSref"]:
        fld["Ssurf"] = fld["SSref"]
    else:
        fld["Ssurf"] = fld["X"][1, 2] + fld["Sref"]

    if cst["L_DAMP_CURR"]:
        dampU = [0.0, 0.0, 0.0]
        for k in range(1, nzp1 + 1):
            for l in range(1, NVEL + 1):
                a = 0.99 * abs(fld["U"][k, l])
                b = fld["U"][k, l] ** 2 / (cst["dt_uvdamp"]
                                           * (86400.0 / cst["dto"]))
                Ui = min(a, b)
                if b < a:
                    dampU[l] += 1.0 / float(nzp1)
                fld["U"][k, l] = fld["U"][k, l] - math.copysign(
                    Ui, fld["U"][k, l])
        fld["dampu_flag"] = dampU[1]
        fld["dampv_flag"] = dampU[2]

    fld["old"] = fld["new"]
    fld["new"] = 1 - fld["old"]
    fld["hmixd"][fld["new"]] = fld["hmix"]
    for k in range(1, nzp1 + 1):
        for l in range(1, NVEL + 1):
            fld["Us"][k, l, fld["new"]] = fld["U"][k, l]
        for l in range(1, NSCLR + 1):
            fld["Xs"][k, l, fld["new"]] = fld["X"][k, l]
    return fld


# --------------------------------------------------------------------------
# check_profile (mckpp_physics_overrides.F90:42-125)
# --------------------------------------------------------------------------
def check_profile(fld, cst):
    nzp1 = cst["nzp1"]
    have_clim = cst.get("have_clim", False)
    if fld["comp_flag"] and have_clim:
        for k in range(1, nzp1 + 1):
            fld["X"][k, 1] = fld["ocnT_clim"][k]
            fld["X"][k, 2] = fld["sal_clim"][k]
            fld["U"][k, 1] = fld["U_init"][k, 1]
            fld["U"][k, 2] = fld["U_init"][k, 2]
        fld["reset_flag"] = 999
    elif fld["comp_flag"]:
        for k in range(1, nzp1 + 1):
            fld["U"][k, 1] = fld["U_init"][k, 1]
            fld["U"][k, 2] = fld["U_init"][k, 2]
        fld["reset_flag"] = 999

    if fld["l_ocean"] and cst.get("L_NO_FREEZE", False):
        for z in range(1, nzp1 + 1):
            if fld["X"][z, 1] < -1.8:
                fld["tinc_fcorr"][z] = fld["tinc_fcorr"][z] \
                    + (-1.8 - fld["X"][z, 1])
                fld["X"][z, 1] = -1.8
                fld["freeze_flag"] = fld.get("freeze_flag", 0.0) \
                    + 1.0 / float(nzp1)

    if fld["l_ocean"] and cst.get("L_NO_ISOTHERM", False):
        dtdz_total = 0.0
        dz_total = 0.0
        for j in range(2, cst["iso_bot"] + 1):
            dz = cst["zm"][j] - cst["zm"][j - 1]
            dtdz_total += abs(fld["X"][j, 1] - fld["X"][j - 1, 1]) * dz
            dz_total += dz
        dtdz_total = dtdz_total / dz_total
        if abs(dtdz_total) < cst["iso_thresh"]:
            for k in range(1, nzp1 + 1):
                fld["X"][k, 1] = fld["ocnT_clim"][k]
                fld["X"][k, 2] = fld["sal_clim"][k]
            fld["reset_flag"] = -1.0 * fld["reset_flag"]
    else:
        fld["reset_flag"] = 0
