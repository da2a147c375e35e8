"""
Notebook gate: the six Jupyter notebooks in notebooks/ (the
counterpart of the reference's notebooks/*.ipynb set) stay in sync
with their generator and EXECUTE end to end — every code cell runs,
in order, in one namespace per notebook, against the bundled demo
data (the reference never executes its notebooks in CI).
"""

import json
import os
import shutil
import subprocess
import sys

import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
NOTEBOOKS = os.path.join(REPO, "notebooks")

NAMES = [
    "alignment_analysis.ipynb",
    "model_parameters_mutation_effects.ipynb",
    "distance_calculations.ipynb",
    "output_files_tutorial.ipynb",
    "running_jobs.ipynb",
    "running_jobs_complexes.ipynb",
]

# executes one notebook's code cells sequentially from its directory
RUNNER = """
import json, os, sys
nb_path = os.path.abspath(sys.argv[1])
os.chdir(os.path.dirname(nb_path))
cells = json.load(open(nb_path))["cells"]
ns = {}
for i, c in enumerate(c for c in cells if c["cell_type"] == "code"):
    src = "".join(c["source"])
    try:
        exec(compile(src, "cell %d" % i, "exec"), ns)
    except Exception:
        sys.stderr.write("FAILED cell %d:\\n%s\\n" % (i, src))
        raise
"""


def test_notebooks_match_generator(tmp_path):
    """Committed notebooks are exactly what examples/make_notebooks.py
    generates (regenerate + commit after editing a tutorial)."""
    out = str(tmp_path / "nb")
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    subprocess.run(
        [sys.executable,
         os.path.join(REPO, "examples", "make_notebooks.py"), out],
        check=True, capture_output=True, env=env, timeout=120,
    )
    generated = sorted(os.listdir(out))
    assert generated == sorted(NAMES)
    for name in generated:
        with open(os.path.join(out, name)) as f_new, \
                open(os.path.join(NOTEBOOKS, name)) as f_old:
            assert f_new.read() == f_old.read(), (
                "{} is stale — regenerate with "
                "python examples/make_notebooks.py".format(name))


@pytest.fixture(scope="module")
def notebook_tree(tmp_path_factory):
    """Copy of notebooks/ + examples/ so cell outputs land in a temp
    tree (cells resolve ../examples relative to the notebook dir)."""
    root = tmp_path_factory.mktemp("nb_run")
    shutil.copytree(
        os.path.join(REPO, "examples"), str(root / "examples"),
        ignore=shutil.ignore_patterns("output"),
    )
    shutil.copytree(NOTEBOOKS, str(root / "notebooks"))
    return str(root / "notebooks")


@pytest.mark.parametrize("name", NAMES)
def test_notebook_executes(notebook_tree, name):
    env = dict(os.environ)
    env["EVCOUPLINGS_JAX_PLATFORM"] = "cpu"
    env["TUTORIAL_ITERS"] = "15"
    env["MPLBACKEND"] = "Agg"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, "-c", RUNNER, os.path.join(notebook_tree, name)],
        capture_output=True, text=True, env=env, timeout=900,
    )
    assert proc.returncode == 0, (
        "{} failed\n--- stdout ---\n{}\n--- stderr ---\n{}".format(
            name, proc.stdout[-3000:], proc.stderr[-5000:])
    )
