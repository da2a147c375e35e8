"""The evcouplings -> evcouplings_tpu import alias
(evcouplings_tpu.compat): reference-style imports must resolve to this
framework's modules after the explicit opt-in, and must never shadow a
real reference package. Run in subprocesses so alias state cannot leak
into the rest of the suite (which imports the REAL reference via
tests/reference_shim.py).
"""

import subprocess
import sys

import pytest


def run_py(code):
    return subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=240,
    )


class TestAlias:
    def test_reference_imports_resolve_to_framework(self):
        r = run_py(
            "import evcouplings_tpu.compat\n"
            "import evcouplings\n"
            "import evcouplings_tpu\n"
            "assert evcouplings is evcouplings_tpu\n"
            "from evcouplings.couplings import CouplingsModel\n"
            "from evcouplings_tpu.couplings.model import (\n"
            "    CouplingsModel as real)\n"
            "assert CouplingsModel is real\n"
            "from evcouplings.align import Alignment  # noqa: F401\n"
            "from evcouplings.utils import read_config_file  # noqa\n"
            "import evcouplings.couplings.pairs as p\n"
            "assert p.__name__ == 'evcouplings_tpu.couplings.pairs'\n"
            "print('ALIAS-OK')\n"
        )
        assert r.returncode == 0, r.stdout + r.stderr
        assert "ALIAS-OK" in r.stdout

    def test_no_alias_without_opt_in(self):
        r = run_py(
            "import evcouplings_tpu\n"
            "try:\n"
            "    import evcouplings\n"
            "except ImportError:\n"
            "    print('NOT-ALIASED')\n"
        )
        assert r.returncode == 0, r.stdout + r.stderr
        assert "NOT-ALIASED" in r.stdout

    def test_refuses_to_shadow_real_package(self):
        r = run_py(
            "import sys, types\n"
            "real = types.ModuleType('evcouplings')\n"
            "real.__file__ = '/root/reference/evcouplings/__init__.py'\n"
            "sys.modules['evcouplings'] = real\n"
            "try:\n"
            "    import evcouplings_tpu.compat\n"
            "except ImportError as e:\n"
            "    assert 'refusing to shadow' in str(e)\n"
            "    print('REFUSED')\n"
        )
        assert r.returncode == 0, r.stdout + r.stderr
        assert "REFUSED" in r.stdout

    def test_uninstall_restores_clean_state(self):
        r = run_py(
            "import sys\n"
            "import evcouplings_tpu.compat as c\n"
            "import evcouplings\n"
            "c.uninstall_alias()\n"
            "assert 'evcouplings' not in sys.modules\n"
            "try:\n"
            "    import evcouplings\n"
            "except ImportError:\n"
            "    print('CLEAN')\n"
        )
        assert r.returncode == 0, r.stdout + r.stderr
        assert "CLEAN" in r.stdout


@pytest.mark.slow
class TestAliasEndToEnd:
    def test_reference_style_fit_script(self, tmp_path):
        """A small script written entirely against the reference's
        import paths runs the native fit through the alias."""
        msa = tmp_path / "a.fasta"
        msa.write_text(
            ">s0/1-6\nACDEFG\n>s1/1-6\nACDEFW\n>s2/1-6\nACKEFG\n"
            ">s3/1-6\nYCDEFG\n>s4/1-6\nACDEQG\n>s5/1-6\nACDRFG\n"
        )
        r = run_py(
            "import os\n"
            "os.environ['EVCOUPLINGS_JAX_PLATFORM'] = 'cpu'\n"
            "import evcouplings_tpu.compat\n"
            "from evcouplings.couplings.tools import run_plmc\n"
            "from evcouplings.couplings.model import CouplingsModel\n"
            "res = run_plmc({msa!r}, {ec!r}, {model!r},\n"
            "               focus_seq='s0/1-6', iterations=5)\n"
            "m = CouplingsModel({model!r})\n"
            "assert m.L == 6 and m.num_symbols == 21\n"
            "print('E2E-OK', res.num_valid_seqs)\n".format(
                msa=str(msa), ec=str(tmp_path / "ECs.txt"),
                model=str(tmp_path / "m.model"),
            )
        )
        assert r.returncode == 0, r.stdout + r.stderr
        assert "E2E-OK 6" in r.stdout
