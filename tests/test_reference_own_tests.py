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
