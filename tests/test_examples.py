"""
Executable-tutorial gate: every script in examples/ runs end to end
against the bundled demo data (the counterpart of the reference's
notebooks/ walkthroughs — model_parameters_mutation_effects.ipynb and
distance_calculations.ipynb map to the two tutorial_* scripts).

Each script is executed as a real subprocess from a COPY of examples/
in a temp dir (scripts resolve their data/output paths relative to
their own location, so nothing is written into the repo), on the CPU
backend with reduced iteration counts.
"""

import os
import shutil
import subprocess
import sys

import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
EXAMPLES = os.path.join(REPO, "examples")


@pytest.fixture(scope="module")
def examples_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("examples_run") / "examples")
    shutil.copytree(EXAMPLES, d, ignore=shutil.ignore_patterns("output"))
    return d


def run_script(examples_dir, name, *args, iters=15):
    env = dict(os.environ)
    env["EVCOUPLINGS_JAX_PLATFORM"] = "cpu"
    env["TUTORIAL_ITERS"] = str(iters)
    env["MPLBACKEND"] = "Agg"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, os.path.join(examples_dir, name), *args],
        capture_output=True, text=True, env=env, timeout=900,
    )
    assert proc.returncode == 0, (
        "{} failed\n--- stdout ---\n{}\n--- stderr ---\n{}".format(
            name, proc.stdout[-4000:], proc.stderr[-4000:])
    )
    return proc.stdout


def test_generate_data_is_reproducible(examples_dir):
    """Regenerating the demo alignments yields the committed bytes
    (seeded), so the other examples run against known data."""
    before = {}
    data = os.path.join(examples_dir, "data")
    for f in sorted(os.listdir(data)):
        with open(os.path.join(data, f), "rb") as fh:
            before[f] = fh.read()
    run_script(examples_dir, "generate_data.py")
    for f, content in before.items():
        with open(os.path.join(data, f), "rb") as fh:
            assert fh.read() == content, f


def test_tutorial_model_parameters(examples_dir):
    out = run_script(examples_dir, "tutorial_model_parameters.py")
    assert "Part 2: predict mutation effects" in out
    assert "effect_prediction_epistatic" in out
    assert "double mutant" in out
    assert "Part 4: index mapping for complexes" in out
    assert "seq(('B_1', 3))" in out
    assert os.path.isfile(os.path.join(
        examples_dir, "output", "tutorial_model",
        "mutation_predictions.csv"))


def test_tutorial_distances(examples_dir):
    out = run_script(examples_dir, "tutorial_distances.py", iters=25)
    # the planted pairs are in contact in the synthetic structures,
    # so the top-4 long-range ECs are all true contacts
    assert "precision of the top-4 long-range ECs: 1.00" in out
    outdir = os.path.join(examples_dir, "output", "tutorial_distances")
    assert os.path.isfile(
        os.path.join(outdir, "CouplingScoresCompared.csv"))
    assert os.path.isfile(os.path.join(outdir, "contact_map.png"))
    # distance map persisted as residue-table csv + npy matrix
    assert os.path.isfile(
        os.path.join(outdir, "demo_distance_map.csv"))


def test_tutorial_alignment_analysis(examples_dir):
    out = run_script(examples_dir, "tutorial_alignment_analysis.py")
    assert "alignment is of length 30 and has 400 sequences" in out
    assert "most gapped sequence" in out
    assert os.path.isfile(os.path.join(
        examples_dir, "output", "tutorial_alignment",
        "identity_heatmap.png"))


def test_library_quickstart(examples_dir):
    out = run_script(examples_dir, "library_quickstart.py")
    assert "top ECs" in out
    mono = os.path.join(examples_dir, "output", "monomer")
    assert os.path.isfile(os.path.join(mono, "demo.model"))
    assert os.path.isfile(os.path.join(mono, "single_mutants.csv"))


def test_complex_quickstart(examples_dir):
    out = run_script(examples_dir, "complex_quickstart.py")
    assert "inter" in out.lower()


def test_scaling_quickstart(examples_dir):
    out = run_script(examples_dir, "scaling_quickstart.py")
    assert "data" in out


def test_sparse_couplings_quickstart(examples_dir):
    out = run_script(examples_dir, "sparse_couplings_quickstart.py")
    # exact group-L1 must actually zero pair blocks
    assert "exactly-zero pair blocks" in out
    assert "% sparse" in out
    sparse_line = next(
        ln for ln in out.splitlines() if "% sparse" in ln
    )
    pct = int(sparse_line.split("(")[1].split("%")[0])
    assert pct >= 50


def run_pipeline_config(examples_dir, cfg_name):
    """examples/README.md §3: the YAML configs drive evcouplings_runcfg
    with paths relative to the directory containing examples/."""
    root = os.path.dirname(examples_dir)
    env = dict(os.environ)
    env["EVCOUPLINGS_JAX_PLATFORM"] = "cpu"
    env["MPLBACKEND"] = "Agg"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, "-m", "evcouplings_tpu.utils.pipeline",
         os.path.join("examples", cfg_name)],
        capture_output=True, text=True, env=env, cwd=root, timeout=900,
    )
    assert proc.returncode == 0, (
        "{} failed\n--- stdout ---\n{}\n--- stderr ---\n{}".format(
            cfg_name, proc.stdout[-4000:], proc.stderr[-4000:])
    )
    return root


def test_monomer_pipeline_config(examples_dir):
    root = run_pipeline_config(examples_dir, "monomer_pipeline.yml")
    prefix = os.path.join(root, "examples", "output", "pipeline", "demo")
    assert os.path.isfile(prefix + ".done")
    assert os.path.isfile(prefix + "_final.outcfg")
    # per-stage subdirectories under the prefix directory
    assert os.path.isfile(os.path.join(
        prefix, "couplings", "demo_CouplingScores.csv"))


def test_complex_pipeline_config(examples_dir):
    root = run_pipeline_config(examples_dir, "complex_pipeline.yml")
    import glob

    done = glob.glob(os.path.join(
        root, "examples", "output", "**", "*.done"), recursive=True)
    inter = glob.glob(os.path.join(
        root, "examples", "output", "**", "*_CouplingScores_inter.csv"),
        recursive=True)
    assert done and inter
