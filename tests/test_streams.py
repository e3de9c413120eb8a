"""iodef.xml-style stream config: parsing, mixed-operation streams, and
output time metadata (VERDICT r2 item 5)."""

import numpy as np
import pytest

from mckpp_tpu.io import diagnostics as diag
from mckpp_tpu.io import ncio
from mckpp_tpu.io.streams import parse_iodef, duration_to_steps

from test_io import _build

IODEF = """<?xml version="1.0"?>
<simulation>
  <context id="kpp">
    <file_definition type="one_file" par_access="collective" enabled=".TRUE.">
      <file id="output_kpp" name="output_kpp" output_freq="1h" split_freq="1d">
        <field field_ref="T" name="T_inst" operation="instant"/>
        <field field_ref="hmix" name="hmix_inst" operation="instant"/>
      </file>
      <file id="output_kpp_means" name="output_kpp_means" output_freq="3h">
        <field field_ref="T" name="T_mean" operation="average"/>
        <field field_ref="hmix" name="hmix_max" operation="maximum"/>
      </file>
      <file id="disabled" name="nope" output_freq="1h" enabled=".FALSE.">
        <field field_ref="T" operation="instant"/>
      </file>
    </file_definition>
  </context>
</simulation>
"""


def test_duration_parsing():
    assert duration_to_steps("1h", 1200.0) == 3
    assert duration_to_steps("3h", 1200.0) == 9
    assert duration_to_steps("1h", 3600.0) == 1
    assert duration_to_steps("2ts", 1200.0) == 2
    assert duration_to_steps("30mn", 600.0) == 3
    with pytest.raises(ValueError):
        duration_to_steps("7mn", 1200.0)     # not a whole step count


def test_parse_iodef(tmp_path):
    p = tmp_path / "iodef.xml"
    p.write_text(IODEF)
    streams = parse_iodef(str(p), 1200.0)
    assert [s.name for s in streams] == ["output_kpp", "output_kpp_means"]
    s0, s1 = streams
    assert s0.freq == 3 and s0.split_freq_days == 1.0
    assert s0.entries == (("T_inst", "T", "instant"),
                          ("hmix_inst", "hmix", "instant"))
    assert s1.freq == 9 and s1.split_freq_days is None
    assert s1.reduction == "mixed"
    assert s1.entries == (("T_mean", "T", "average"),
                          ("hmix_max", "hmix", "maximum"))


def test_parse_reference_iodef_verbatim():
    """The reference job's ACTUAL iodef.xml (byte-identical copy at
    tests/data/reference_iodef.xml) must ingest unmodified — including the
    raw ``<`` XIOS tolerates inside the comp_flag long_name attribute
    (run/iodef.xml:80) — into its 5 streams: 1h instant, 3h mean/min/max,
    and the 3h 35-field all-diags file, all split daily
    (run/iodef.xml:88-157)."""
    import os
    path = os.path.join(os.path.dirname(__file__), "data",
                        "reference_iodef.xml")
    streams = parse_iodef(path, 1200.0)       # TerraMaris dto = 1200 s
    assert [s.name for s in streams] == [
        "output_kpp", "output_kpp_means", "output_kpp_min",
        "output_kpp_max", "output_kpp_all"]
    by_name = {s.name: s for s in streams}
    inst = by_name["output_kpp"]
    assert inst.freq == 3 and inst.split_freq_days == 1.0
    assert inst.entries == (("T_inst", "T", "instant"),
                            ("S_inst", "S", "instant"),
                            ("hmix_inst", "hmix", "instant"))
    for nm, op in (("output_kpp_means", "average"),
                   ("output_kpp_min", "minimum"),
                   ("output_kpp_max", "maximum")):
        s = by_name[nm]
        assert s.freq == 9 and s.split_freq_days == 1.0
        assert s.reduction == op
        assert [src for _, src, _ in s.entries] == ["T", "S", "hmix"]
    alld = by_name["output_kpp_all"]
    assert alld.freq == 9 and alld.split_freq_days == 1.0
    assert alld.reduction == "instant" and len(alld.entries) == 35
    from mckpp_tpu.io.diagnostics import DEPTH_FIELDS, SURFACE_FIELDS
    assert set(src for _, src, _ in alld.entries) == \
        set(DEPTH_FIELDS + SURFACE_FIELDS)


def test_sanitize_xml_roundtrip():
    """Well-formed XML is unchanged; raw < / & inside attribute values are
    escaped; comments with quotes/apostrophes are left alone."""
    from mckpp_tpu.io.streams import _sanitize_xml
    good = IODEF
    assert _sanitize_xml(good) == good
    bad = ('<!-- don\'t "quote" me <x> -->\n'
           '<a name="x<0 & y>1 &amp; z &lt;2"><b/></a>')
    fixed = _sanitize_xml(bad)
    import xml.etree.ElementTree as ET
    root = ET.fromstring(fixed)
    assert root.get("name") == "x<0 & y>1 & z <2"


def test_parse_iodef_unknown_field(tmp_path):
    p = tmp_path / "bad.xml"
    p.write_text('<x><file name="f" output_freq="1h">'
                 '<field field_ref="nosuch"/></file></x>')
    with pytest.raises(ValueError, match="unknown field_ref"):
        parse_iodef(str(p), 1200.0)


def test_mixed_operation_stream(tmp_path):
    """One file mixing average and maximum, with renamed outputs — the
    shape of run/iodef.xml's per-field operation attribute."""
    model, st, prm, frc = _build()
    s = diag.Stream("mixed", "mixed", 3,
                    entries=(("T_mean", "T", "average"),
                             ("hmix_max", "hmix", "maximum"),
                             ("hmix_last", "hmix", "instant")))
    dm = diag.DiagnosticsManager([s], nx=4, ny=1, zm=model.grid.zm,
                                 outdir=str(tmp_path), dto_seconds=1200.0,
                                 async_write=False)
    import dataclasses
    Ts, hs = [], []
    for nt in range(1, 4):
        st2 = dataclasses.replace(
            st, x=st.x + 0.5 * nt, hmix=st.hmix + 7.0 * ((nt % 2) == 1))
        Ts.append(np.asarray(st2.x[..., 0]))
        hs.append(np.asarray(st2.hmix))
        dm.step(nt, st2, prm, frc)
    dm.flush()
    with ncio.open_nc(str(tmp_path / "mixed.nc")) as nc:
        t_mean = ncio.get_var(nc, "T_mean")
        h_max = ncio.get_var(nc, "hmix_max")
        h_last = ncio.get_var(nc, "hmix_last")
    np.testing.assert_allclose(          # (z, y=1, x) -> (ncol, nzp1)
        t_mean[0].reshape(len(model.grid.zm), 4).T,
        np.mean(Ts, axis=0), rtol=1e-12)
    np.testing.assert_allclose(h_max[0].reshape(-1),
                               np.max(hs, axis=0), rtol=1e-12)
    np.testing.assert_allclose(h_last[0].reshape(-1), hs[-1], rtol=1e-12)


def test_output_time_metadata(tmp_path):
    """Outputs carry CF time units/calendar (the XIOS Gregorian-calendar
    stamp, mckpp_xios_io.F90:41,63) — both native and scipy writers."""
    model, st, prm, frc = _build()
    s = diag.Stream("meta", "instant", 1, fields=("T",))
    dm = diag.DiagnosticsManager([s], nx=4, ny=1, zm=model.grid.zm,
                                 outdir=str(tmp_path), dto_seconds=1200.0,
                                 l_ocean=np.array([True, True, True, False]),
                                 async_write=False)
    dm.step(1, st, prm, frc)
    dm.flush()
    with ncio.open_nc(str(tmp_path / "meta.nc")) as nc:
        tv = nc.variables["time"]
        zv = nc.variables["z"]
        attrs = (tv.units, tv.calendar, zv.units, zv.positive,
                 float(nc.variables["T"]._FillValue))
        del tv, zv               # drop memmap refs before close
    assert attrs[0].startswith(b"days since 0000-01-02")
    assert attrs[1] == b"gregorian"
    assert attrs[2] == b"m" and attrs[3] == b"up"
    assert attrs[4] == diag.FILL_VALUE


@pytest.mark.slow
def test_cli_uses_iodef(tmp_path, monkeypatch):
    """The CLI picks up streams from an iodef file named in the namelist
    (IODEF_FILE) and writes those files."""
    import pathlib
    from test_endtoend import write_inputs
    from mckpp_tpu import cli

    write_inputs(pathlib.Path(tmp_path))
    (tmp_path / "iodef.xml").write_text(IODEF)
    nml = (tmp_path / "3D_ocn.nml").read_text()
    nml = nml.replace("&NAME_OUTPUT",
                      "&NAME_OUTPUT\n IODEF_FILE='iodef.xml'")
    (tmp_path / "3D_ocn.nml").write_text(nml)
    out = tmp_path / "out"
    out.mkdir()
    rc = cli.main(["--namelist", str(tmp_path / "3D_ocn.nml"),
                   "--data-dir", str(tmp_path),
                   "--output-dir", str(out), "--steps", "9"])
    assert rc == 0
    written = sorted(p.name for p in out.glob("*.nc"))
    assert any(n.startswith("output_kpp_0") for n in written), written
    assert "output_kpp_means.nc" in written
    with ncio.open_nc(str(out / "output_kpp_means.nc")) as nc:
        assert "T_mean" in nc.variables and "hmix_max" in nc.variables
