"""Contract tests for the bundled CNS .inp protocol templates.

The five templates (generate_seq / generate_extended / dg_sa /
generate_easy / model_minimize) are clean-room CNSsolve 1.21 protocol
scripts honoring the variable contract of fold/cns.py's renderers
(reference counterpart: evcouplings/fold/cns.py:107-313 rendering the
reference's cns_templates/*.inp).  These tests render each template
through its public renderer and check the substitution is complete
and the protocol structure is present.
"""

import re

import pytest

from evcouplings_tpu.fold.cns import (
    cns_dgsa_inp,
    cns_extended_inp,
    cns_generate_easy_inp,
    cns_minimize_inp,
    cns_mtf_inp,
)


def assert_fully_rendered(text):
    assert "{{" not in text and "}}" not in text
    assert "{%" not in text and "%}" not in text


def test_generate_seq_renders():
    out = cns_mtf_inp("target.seq", "target.mtf", first_index=5)
    assert_fully_rendered(out)
    assert "sequence @@target.seq end" in out
    assert 'write structure output="target.mtf" end' in out
    # renumbering honors first_index
    assert "+ 5 - 1" in out
    # no disulfides requested -> no patches
    assert "patch DISU" not in out


def test_generate_seq_disulfides():
    out = cns_mtf_inp(
        "t.seq", "t.mtf", disulfide_bridges=[(12, 40), (77, 103)],
    )
    assert_fully_rendered(out)
    assert out.count("patch DISU") == 2
    assert "reference=1=(resid 12)" in out
    assert "reference=2=(resid 40)" in out
    assert "reference=1=(resid 77)" in out
    assert "reference=2=(resid 103)" in out


def test_generate_extended_renders():
    out = cns_extended_inp("t.mtf", "t_extended.pdb")
    assert_fully_rendered(out)
    assert "structure @@t.mtf end" in out
    assert 'write coordinates output="t_extended.pdb" end' in out
    # regularization protocol present
    assert "minimize powell" in out
    assert "dynamics verlet" in out


def test_dgsa_renders():
    out = cns_dgsa_inp(
        "t_extended.pdb", "t.mtf", "t",
        "t_couplings.tbl", "t_ss_distance.tbl", "t_ss_angle.tbl",
        num_structures=7, log_level="quiet",
    )
    assert_fully_rendered(out)
    assert "coordinates @@t_extended.pdb" in out
    assert "structure @@t.mtf end" in out
    # the three restraint tables feed distinct restraint classes
    assert "@@t_couplings.tbl" in out
    assert "@@t_ss_distance.tbl" in out
    assert "@@t_ss_angle.tbl" in out
    assert "class dist" in out
    assert "class ssdist" in out
    assert "restraints dihedral" in out
    # trial loop count and runtime-assembled output names
    assert re.search(r"while \(\$count < 7\) loop dgsa", out)
    assert re.search(
        r'\$filename\s*=\s*"t_"\s*\+\s*'
        r"encode\(\$count\)\s*\+\s*\"\.pdb\"",
        out, re.S,
    )
    # empty hbond table -> no hbnd restraint class
    assert "class hbnd" not in out
    # cooling ramps to the requested NOE scale
    assert "$noe_target  = 5" in out


def test_dgsa_hbond_class_optional():
    out = cns_dgsa_inp(
        "e.pdb", "t.mtf", "t", "a.tbl", "b.tbl", "c.tbl",
    )
    base_has = "class hbnd" in out
    assert not base_has

    # a non-empty hbond file must engage the hbnd class; the public
    # renderer pins it empty (reference fold/cns.py does the same), so
    # render the template directly for this variant
    from evcouplings_tpu.fold.cns import _cns_render_template

    out2 = _cns_render_template(
        "dg_sa",
        pdb_infile="e.pdb", mtf_infile="t.mtf",
        num_structures=3,
        ec_pair_tbl_infile="a.tbl",
        ss_dist_tbl_infile="b.tbl",
        ss_angle_tbl_infile="c.tbl",
        pdb_outfile_basename="t",
        hbond_tbl_infile="hb.tbl",
        log_level="quiet",
        md_cool_noe_scale_factor=5,
        ss_dist_noe_avg_mode="cent",
        ec_pair_noe_avg_mode="cent",
    )
    assert_fully_rendered(out2)
    assert "class hbnd" in out2
    assert "@@hb.tbl" in out2


def test_generate_easy_renders():
    out = cns_generate_easy_inp("m.pdb", "m_h.pdb", "m_h.mtf")
    assert_fully_rendered(out)
    assert "coordinates @@m.pdb" in out
    assert 'write structure output="m_h.mtf" end' in out
    assert 'write coordinates output="m_h.pdb" end' in out
    # hydrogen_flag=true -> hbuild path, no hydrogen deletion
    assert "hbuild" in out
    assert "delete selection=(hydrogen)" not in out
    # default atom naming: no rename statements rendered
    assert 'do (name="CD1")' not in out


def test_minimize_renders():
    out = cns_minimize_inp("m_h.pdb", "m_h.mtf", "m_hMIN.pdb",
                           num_cycles=3)
    assert_fully_rendered(out)
    assert "coordinates @@m_h.pdb" in out
    assert "structure @@m_h.mtf end" in out
    assert 'write coordinates output="m_hMIN.pdb" end' in out
    assert re.search(r"while \(\$cycle < 3\) loop mini", out)
    # use_cryst defaults off -> no crystal-symmetry block
    assert "xray" not in out


@pytest.mark.parametrize("render", [
    lambda: cns_mtf_inp("a.seq", "a.mtf"),
    lambda: cns_extended_inp("a.mtf", "a.pdb"),
    lambda: cns_dgsa_inp("a.pdb", "a.mtf", "a", "x.tbl", "y.tbl",
                         "z.tbl"),
    lambda: cns_generate_easy_inp("a.pdb", "b.pdb", "b.mtf"),
    lambda: cns_minimize_inp("a.pdb", "a.mtf", "b.pdb"),
])
def test_templates_end_with_stop(render):
    """Every protocol script terminates the CNS session."""
    out = render()
    assert out.rstrip().endswith("stop")
