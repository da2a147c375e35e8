"""
Drop-in import-path compatibility with the reference package: symbols
that live in `evcouplings_tpu.ops` kernels must also be importable at
the module paths where the reference defines them (so code written
against debbiemarkslab/EVcouplings ports by renaming the package).
"""

import numpy as np
import pytest


class TestAlignmentKernelPaths:
    """Reference align/alignment.py:1078-1233 module-level kernels."""

    def test_num_cluster_members(self):
        from evcouplings_tpu.align.alignment import num_cluster_members
        from evcouplings_tpu.ops.weights import (
            num_cluster_members as ops_kernel,
        )

        rng = np.random.default_rng(0)
        m = rng.integers(0, 5, size=(40, 12)).astype(np.int8)
        np.testing.assert_array_equal(
            np.asarray(num_cluster_members(m, 0.8)),
            np.asarray(ops_kernel(m, 0.8)),
        )

    def test_frequencies_and_pairs(self):
        from evcouplings_tpu.align.alignment import (
            frequencies, pair_frequencies,
        )

        rng = np.random.default_rng(1)
        m = rng.integers(0, 4, size=(30, 8)).astype(np.int8)
        w = rng.uniform(0.5, 1.0, size=30)
        fi = np.asarray(frequencies(m, w, 4))
        assert fi.shape == (8, 4)
        np.testing.assert_allclose(fi.sum(axis=1), 1.0, rtol=1e-5)
        fij = np.asarray(pair_frequencies(m, w, 4, fi))
        assert fij.shape == (8, 8, 4, 4)
        # diagonal blocks carry f_i on their diagonal
        np.testing.assert_allclose(
            fij[3, 3].diagonal(), fi[3], rtol=1e-5
        )

    def test_identities_to_seq(self):
        from evcouplings_tpu.align.alignment import identities_to_seq

        m = np.array([[0, 1, 2], [0, 1, 3], [3, 3, 3]], dtype=np.int8)
        ids = np.asarray(identities_to_seq(m[0], m))
        np.testing.assert_array_equal(ids, [3, 2, 0])


class TestMeanFieldKernelPaths:
    """Reference mean_field.py:791-1014 module-level kernels."""

    def test_aliases_point_at_ops(self):
        from evcouplings_tpu.couplings import mean_field as mf
        from evcouplings_tpu.ops import mean_field as ops_mf

        assert mf.compute_covariance_matrix is ops_mf.compute_covariance_matrix
        assert mf.reshape_invC_to_4d is ops_mf.reshape_invC_to_4d
        assert mf.fields is ops_mf.fields_from_couplings
        assert mf.tilde_fields is ops_mf.tilde_fields
        assert mf.direct_information is ops_mf.direct_information

    def test_fields_reference_semantics(self):
        from evcouplings_tpu.couplings.mean_field import fields

        rng = np.random.default_rng(2)
        L, q = 5, 3
        J = rng.normal(size=(L, L, q, q)) * 0.1
        J[np.arange(L), np.arange(L)] = 0.0
        fi = rng.uniform(0.1, 1.0, size=(L, q))
        fi /= fi.sum(axis=1, keepdims=True)

        got = fields(J, fi)

        # reference loop formulation (mean_field.py:996-1014)
        want = np.zeros((L, q))
        for i in range(L):
            log_fi = np.log(fi[i] / fi[i, q - 1])
            s = np.zeros(q)
            for j in range(L):
                if i != j:
                    s += J[i, j] @ fi[j]
            want[i] = log_fi - s
        np.testing.assert_allclose(got, want, rtol=1e-10)


class TestBatchAndTrackerCompat:
    def test_ejob_enum(self):
        from evcouplings_tpu.utils.batch import EJob

        assert EJob.SUBMIT == 0 and EJob.STOP == 3 and EJob.PID == 5

    def test_sql_session_scope_and_compute_job(self, tmp_path):
        from evcouplings_tpu.utils.tracker.sql import (
            ComputeJob, JOB_TABLE_NAME, SQLTracker,
        )

        db = tmp_path / "jobs.db"
        t = SQLTracker(
            connection_string="sqlite:///{}".format(db),
            job_id="j1", prefix=str(tmp_path / "out"),
            pipeline="protein_monomer", file_list=None, delete_list=[],
            config={}, retry_max_number=1, retry_wait=0,
        )
        t.update(status="running", stage="align")

        with t.session_scope() as conn:
            row = conn.execute(
                "SELECT * FROM {} WHERE job_id = ?".format(
                    JOB_TABLE_NAME
                ),
                ("j1",),
            ).fetchone()
        job = ComputeJob.from_row(row)
        assert job.job_id == "j1"
        assert job.status == "running"
        assert job.stage == "align"
        assert "j1" in repr(job)

        # rollback on exception inside the scope
        with pytest.raises(RuntimeError):
            with t.session_scope() as conn:
                conn.execute(
                    "UPDATE {} SET status = 'boom'".format(
                        JOB_TABLE_NAME
                    )
                )
                raise RuntimeError("abort")
        assert t.get()["status"] == "running"


class TestClassicPDBFromId:
    def test_from_id_fetches_and_parses(self, monkeypatch, tmp_path):
        from evcouplings_tpu.compare import pdb as pdb_mod

        pdb_text = (
            "ATOM      1  N   ALA A   1      11.104   6.134  -6.504"
            "  1.00  0.00           N  \n"
            "ATOM      2  CA  ALA A   1      11.639   6.071  -5.147"
            "  1.00  0.00           C  \n"
            "END\n"
        )
        urls = []

        def fake_get(url, output_path=None, allow_redirects=False):
            urls.append(url)
            with open(output_path, "w") as f:
                f.write(pdb_text)

        monkeypatch.setattr(
            "evcouplings_tpu.utils.system.get", fake_get
        )
        monkeypatch.setattr(
            "evcouplings_tpu.utils.system.tempdir",
            lambda: str(tmp_path),
        )

        s = pdb_mod.ClassicPDB.from_id("1ABC")
        assert urls == ["https://files.rcsb.org/download/1abc.pdb"]
        chain = s.get_chain("A")
        assert len(chain.residues) == 1



class TestFullPublicSurface:
    """EVERY public module-level symbol, keyword parameter, and class
    method of EVERY reference module must resolve through the compat
    alias — the line-by-line completeness gates for the whole package
    surface (parsed from the reference's own source, so new reference
    symbols fail here rather than silently missing)."""

    REFERENCE_ROOT = "/root/reference/evcouplings"

    @classmethod
    def _iter_reference_modules(cls):
        """Return [(dotted_name, ast_tree, imported_module)] for every
        reference module, importing it through the compat alias.

        Other test modules (the live-reference parity suite, the
        alias's own tests) leave `evcouplings*` entries in sys.modules
        and may have uninstalled the alias finder — so this makes the
        alias authoritative for the duration of the walk and restores
        the prior import state afterward, keeping the gate independent
        of test order."""
        import ast
        import importlib
        import os
        import sys
        import warnings

        from evcouplings_tpu import compat

        if not os.path.isdir(cls.REFERENCE_ROOT):
            pytest.skip("reference checkout not available")

        saved = {
            k: sys.modules.pop(k)
            for k in list(sys.modules)
            if k == "evcouplings" or k.startswith("evcouplings.")
        }
        had_finder = any(
            isinstance(f, compat.EvcouplingsAliasFinder)
            for f in sys.meta_path
        )
        compat.install_alias()

        out = []
        try:
            for root, dirs, files in os.walk(cls.REFERENCE_ROOT):
                dirs[:] = [
                    d for d in dirs
                    if d not in ("cns_templates", "scoring_models",
                                 "__pycache__")
                ]
                for f in sorted(files):
                    if not f.endswith(".py") or f == "__init__.py":
                        continue
                    path = os.path.join(root, f)
                    rel = os.path.relpath(
                        path, os.path.dirname(cls.REFERENCE_ROOT)
                    )[:-3].replace(os.sep, ".")
                    with open(path) as fh, warnings.catch_warnings():
                        warnings.simplefilter("ignore", SyntaxWarning)
                        tree = ast.parse(fh.read())
                    out.append((rel, tree, importlib.import_module(rel)))
        finally:
            if not had_finder:
                compat.uninstall_alias()
            for k in list(sys.modules):
                if k == "evcouplings" or k.startswith("evcouplings."):
                    del sys.modules[k]
            sys.modules.update(saved)
        return out

    def test_every_reference_symbol_resolves(self):
        import ast

        missing = {}
        n_symbols = 0
        for rel, tree, mod in self._iter_reference_modules():
            public = [
                n.name for n in tree.body
                if isinstance(n, (ast.FunctionDef, ast.ClassDef))
                and not n.name.startswith("_")
            ]
            n_symbols += len(public)
            miss = [nm for nm in public if not hasattr(mod, nm)]
            if miss:
                missing[rel] = miss

        assert not missing, missing
        # the reference surface is ~200 public symbols; guard against
        # the walk silently finding nothing
        assert n_symbols > 150

    def test_every_reference_keyword_accepted(self):
        """Keyword-calling code written against the reference must not
        hit TypeError: for every shared public function, each of the
        reference's parameter names is accepted by ours (or we take
        **kwargs)."""
        import ast
        import inspect

        issues = []
        for rel, tree, mod in self._iter_reference_modules():
            for n in tree.body:
                if not (isinstance(n, ast.FunctionDef)
                        and not n.name.startswith("_")):
                    continue
                ref_params = [
                    a.arg for a in n.args.args + n.args.kwonlyargs
                ]
                ours = getattr(mod, n.name, None)
                if ours is None:
                    continue
                try:
                    sig = inspect.signature(ours)
                except (ValueError, TypeError):
                    continue
                if any(p.kind == p.VAR_KEYWORD
                       for p in sig.parameters.values()):
                    continue
                missing = [
                    p for p in ref_params if p not in sig.parameters
                ]
                if missing:
                    issues.append((rel, n.name, missing))

        assert not issues, issues

    def test_every_reference_class_method_resolves(self):
        """Public methods of every shared public class must exist on
        our class too (same walk as the symbol gate, one level
        deeper)."""
        import ast

        missing = {}
        n_methods = 0
        for rel, tree, mod in self._iter_reference_modules():
            for n in tree.body:
                if not (isinstance(n, ast.ClassDef)
                        and not n.name.startswith("_")):
                    continue
                cls = getattr(mod, n.name, None)
                if cls is None:
                    continue
                methods = [
                    m.name for m in n.body
                    if isinstance(m, ast.FunctionDef)
                    and not m.name.startswith("_")
                ]
                n_methods += len(methods)
                miss = [m for m in methods if not hasattr(cls, m)]
                if miss:
                    missing["{}.{}".format(rel, n.name)] = miss

        assert not missing, missing
        assert n_methods > 120
