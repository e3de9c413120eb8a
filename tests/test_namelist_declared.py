"""Namelist declaration fidelity: variables outside a group's reference
declaration (mckpp_namelists.F90:12-129) abort like the Fortran READ
would; declared-but-inert variables (Fortran sizing params, flags dead in
the reference too) are accepted and surfaced in ``extras``; the
unimplemented coupled-grid index window (ifirst/ilast/jfirst/jlast,
README "Intentional deviations") refuses loudly on non-default values
instead of silently shifting nothing."""

import pytest

from mckpp_tpu.utils import namelist


NML = """
 &NAME_PARAMETERS nz=10, nx=4, ny=2 {params} &END
 &NAME_CONSTANTS &END
 &NAME_PROCSWIT {procswit} &END
 &NAME_DOMAIN dmax=200.0 &END
 &NAME_LANDSEA &END
 &NAME_START &END
 &NAME_TIMES dtsec=3600.0, startt=0.0, finalt=1.0, ndtocn=3 {times} &END
 &NAME_COUPLE {couple} &END
 &NAME_ADVEC {advec} &END
 &NAME_PARAS &END
 &NAME_FORCING &END
 &NAME_OUTPUT &END
"""


def make(**kw):
    body = {k: "" for k in ("params", "procswit", "times", "couple",
                            "advec")}
    body.update(kw)
    return NML.format(**body)


def test_undeclared_variable_aborts():
    """The Fortran READ rejects a variable outside the group declaration."""
    with pytest.raises(ValueError, match="unknown namelist variable LFOO"):
        namelist.config_from_namelist(make(procswit="LFOO=.T."))


def test_sizing_params_accepted_into_extras():
    """NAME_PARAMETERS Fortran sizing (the reference production namelist
    sets all of these, run/3D_ocn.nml:2-4) ingests; shapes derive from
    data here, so they land in extras, not in the config."""
    cfg, extras = namelist.config_from_namelist(
        make(params=", NZTMAX=83, NGRID=69, NX_GLOBE=538"))
    assert cfg.domain.nz == 10
    assert extras["NAME_PARAMETERS"] == {"NZTMAX": 83, "NGRID": 69,
                                         "NX_GLOBE": 538}


def test_dead_reference_flags_accepted():
    """LBIO/LTGRID/nyear are stored-but-never-used in the reference
    (mckpp_initialize_constants_mod.F90 copies them; no live reads) —
    setting them is accepted and surfaced, matching reference behavior."""
    cfg, extras = namelist.config_from_namelist(
        make(procswit="LBIO=.T., LTGRID=.F.", times=", nyear=1998"))
    assert extras["NAME_PROCSWIT"] == {"LBIO": True, "LTGRID": False}
    assert extras["NAME_TIMES"] == {"NYEAR": 1998}


def test_couple_index_window_default_ok():
    """ifirst=1/ilast=nx/jfirst=1/jlast=ny are the reference defaults
    (mckpp_initialize_namelist_mod.F90:207-210) — explicit defaults pass."""
    cfg, extras = namelist.config_from_namelist(
        make(couple="ifirst=1, ilast=4, jfirst=1, jlast=2"))
    assert set(extras["NAME_COUPLE"]) == {"IFIRST", "ILAST", "JFIRST",
                                          "JLAST"}


def test_couple_index_window_nondefault_aborts():
    """A shifted coupled-grid window has no implementation — refuse
    loudly (VERDICT r4 standard: no silent drop)."""
    with pytest.raises(ValueError, match="coupled-grid index addressing"):
        namelist.config_from_namelist(make(couple="ifirst=5"))
    with pytest.raises(ValueError, match="coupled-grid index addressing"):
        namelist.config_from_namelist(make(couple="jlast=7"))


def test_indexed_assignment_aborts():
    """Indexed array assignment is refused with guidance, not dropped."""
    with pytest.raises(ValueError, match="indexed namelist assignment"):
        namelist.config_from_namelist(
            make(advec="RELAX_SST_IN(1)=24.0"))


def test_unknown_group_passes_to_extras():
    """Extra groups in the file are skipped by the reference's named READs
    — they pass through to extras rather than aborting."""
    text = make() + "\n &NAME_SITE mylocal=3 &END\n"
    cfg, extras = namelist.config_from_namelist(text)
    assert extras["NAME_SITE"] == {"MYLOCAL": 3}


def test_reference_production_namelist_ingests():
    """The verbatim TerraMaris namelist still ingests; its only
    unmodeled variables are the NAME_PARAMETERS sizing set."""
    import pathlib
    p = pathlib.Path("/root/reference/run/3D_ocn.nml")
    if not p.exists():
        pytest.skip("reference tree not present")
    cfg, extras = namelist.config_from_namelist(p.read_text())
    assert cfg.domain.nx == 453 and cfg.domain.ny == 319
    assert set(extras) == {"NAME_PARAMETERS"}
