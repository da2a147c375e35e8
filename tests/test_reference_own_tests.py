"""Run the REFERENCE repository's own unit-test suite against this
framework through the import alias (evcouplings_tpu.compat): the
strongest drop-in-compatibility statement available — the reference's
tests exercise our implementations of its API.

Only the hermetic modules run (the golden-data modules TestComplex /
TestMutation / TestFold need the reference's downloadable fixture
tarball, and a handful of individual tests need network or that same
tarball — the reference's own CI has the identical constraints).

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
    ("TestUtilsCalculate", [
        "test_entropy_map",        # needs the fixture tarball
    ]),
    ("TestUtilsConfig", []),
    ("TestUtilsHelpers", []),
    ("TestUtilsSystem", [
        # live-network tests (zero-egress container)
        "test_get_Error",
        "test_get_InvalidStatusCodeError",
        "test_get_NoOutputFileError",
    ]),
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
    assert n >= 45, n
