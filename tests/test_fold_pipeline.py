"""
Hermetic end-to-end test of the fold stage: the full standard protocol
(secondary structure -> clash filtering -> restraint generation ->
CNS dg/sa orchestration -> model ranking) driven through the REAL
bundled .inp protocol templates (evcouplings_tpu/fold/cns_templates/)
with a fake CNS binary. The fake binary parses the rendered CNS
scripts it receives on stdin — `write structure output=`, `write
coordinates output=`, and the dg_sa trial loop's runtime-assembled
$filename — and produces the corresponding output files, so every
real code path (template rendering, restraint writers, topology/
extended/dgsa/minimize sequencing, model collection, dihedral
ranking) runs without CNSsolve.
"""

import os

import numpy as np
import pandas as pd
import pytest

from evcouplings_tpu.fold import protocol as fold_protocol

SEQ = "MKTAYIAKQRQISFVKSHFSRQ"
L = len(SEQ)

FAKE_CNS = """#!/usr/bin/env python3
# fake CNSsolve: reads the rendered protocol script from stdin (the
# way run_cns drives the real binary) and materializes every output
# file the script would write
import os, re, shutil, sys

script = sys.stdin.read()
src = os.environ["PDBSRC"]

# write structure output="<file>" end  -> molecular topology file
for m in re.finditer(r'write\\s+structure\\s+output="([^"]+)"', script):
    with open(m.group(1), "w") as f:
        f.write("fake mtf\\n")

# write coordinates [format=X] output="<file>" end -> PDB copy
for m in re.finditer(
        r'write\\s+coordinates\\s+(?:format=\\w+\\s+)?output="([^"]+)"',
        script):
    shutil.copy(src, m.group(1))

# dg_sa trial loop: filename assembled at CNS runtime from
#   evaluate ($filename = "<base>_" + encode($count) + ".pdb")
# inside  while ($count < N) loop dgsa
fm = re.search(
    r'\\$filename\\s*=\\s*"([^"]+)"\\s*\\+\\s*'
    r'encode\\(\\$count\\)\\s*\\+\\s*"\\.pdb"',
    script, re.S)
cm = re.search(r'while\\s+\\(\\$count\\s*<\\s*(\\d+)\\)\\s+loop\\s+dgsa',
               script)
if fm and cm:
    for k in range(1, int(cm.group(1)) + 1):
        shutil.copy(src, fm.group(1) + str(k) + ".pdb")
"""


def helix_pdb(n_residues):
    """CA-trace PDB of an ideal alpha helix (parseable by ClassicPDB,
    enough geometry for the dihedral ranking)."""
    lines = []
    aa3 = {
        "M": "MET", "K": "LYS", "T": "THR", "A": "ALA", "Y": "TYR",
        "I": "ILE", "Q": "GLN", "R": "ARG", "S": "SER", "F": "PHE",
        "V": "VAL", "H": "HIS",
    }
    for k in range(n_residues):
        theta = np.deg2rad(100.0 * k)
        x, y, z = (
            2.3 * np.cos(theta), 2.3 * np.sin(theta), 1.5 * k
        )
        lines.append(
            "ATOM  {:>5}  CA  {} A{:>4}    "
            "{:8.3f}{:8.3f}{:8.3f}  1.00  0.00           C".format(
                k + 1, aa3[SEQ[k]], k + 1, x, y, z
            )
        )
    return "\n".join(lines) + "\nEND\n"


@pytest.fixture
def fold_env(tmp_path, monkeypatch):
    # the REAL bundled templates are the default search path; make
    # sure no environment override redirects them
    monkeypatch.delenv("EVCOUPLINGS_CNS_TEMPLATE_DIR", raising=False)

    # fake cns binary, three levels deep like a real install
    bin_dir = tmp_path / "cnsroot" / "intel" / "bin"
    bin_dir.mkdir(parents=True)
    cns = bin_dir / "cns"
    cns.write_text(FAKE_CNS)
    cns.chmod(0o755)

    # the model every MAKEPDB/MAKEMODELS directive copies
    pdb_src = tmp_path / "model_src.pdb"
    pdb_src.write_text(helix_pdb(L))
    monkeypatch.setenv("PDBSRC", str(pdb_src))

    return str(cns)


def test_fold_standard_protocol(tmp_path, fold_env):
    prefix = str(tmp_path / "out" / "fold")

    # inputs normally produced by earlier stages
    residues = pd.DataFrame({
        "i": np.arange(1, L + 1),
        "A_i": list(SEQ),
        "sec_struct_3state": ["H"] * L,
    })
    sec_struct_file = str(tmp_path / "ss.csv")
    residues.to_csv(sec_struct_file, index=False)

    rng = np.random.default_rng(0)
    pairs = [(i, j) for i in range(1, L + 1)
             for j in range(i + 6, L + 1)]
    ecs = pd.DataFrame([
        {
            "i": i, "A_i": SEQ[i - 1], "j": j, "A_j": SEQ[j - 1],
            "cn": rng.random(), "probability": rng.random(),
        }
        for i, j in pairs
    ]).sort_values("cn", ascending=False)
    ec_file = str(tmp_path / "ecs.csv")
    ecs.to_csv(ec_file, index=False)

    target_seq_file = str(tmp_path / "target.fa")
    with open(target_seq_file, "w") as f:
        f.write(">TARGET/1-{}\n{}\n".format(L, SEQ))

    outcfg = fold_protocol.run(
        protocol="standard",
        prefix=prefix,
        engine="cns_dgsa",
        ec_file=ec_file,
        target_sequence_file=target_seq_file,
        segments=None,
        folding_config_file=None,
        cut_to_alignment_region=False,
        sec_struct_method="file",
        reuse_sec_struct=False,
        sec_struct_file=sec_struct_file,
        filter_sec_struct_clashes=True,
        min_sequence_distance=5,
        fold_probability_cutoffs=None,
        fold_lowest_count=10,
        fold_highest_count=10,
        fold_increase=5,
        num_models=1,
        psipred=None,
        cpu=1,
        remapped_pdb_files=None,
        cleanup=False,
        cns=fold_env,
        maxcluster=None,
    )

    # one folding sub-run, one model, minimized and copied out
    models = outcfg["folded_structure_files"]
    assert len(models) == 1
    assert models[0].endswith("_hMIN.pdb")
    assert os.path.isfile(models[0])

    # clash-annotated EC table written
    clashes = pd.read_csv(outcfg["folding_ec_file"])
    assert "ss_clash" in clashes.columns
    # an all-helix structure makes short-range pairs clash-prone but
    # |i-j|>5 pairs over a 22-mer helix are mostly fine; just check
    # both values occur only within the defined vocabulary
    assert set(clashes.ss_clash.unique()) <= {True, False}

    # dihedral ranking produced
    ranking = pd.read_csv(outcfg["folding_ranking_file"])
    assert len(ranking) == 1
    assert "ranking_score" in ranking.columns

    # secondary structure persisted with in_model flags
    ss = pd.read_csv(outcfg["sec_struct_file"])
    assert ss.in_model.all()

    # pymol secondary-structure script
    assert os.path.isfile(outcfg["secondary_structure_pml_file"])


FAKE_PSIPRED = r"""#!/bin/bash
# fake runpsipred: writes ss2/horiz predictions for the input FASTA
# into the current working directory (like the real driver script)
set -e
FASTA="$1"
ROOT=$(basename "$FASTA")
ROOT="${ROOT%.*}"
python3 - "$FASTA" "$ROOT" <<'PYEOF'
import sys
fasta, root = sys.argv[1], sys.argv[2]
seq = "".join(
    l.strip() for l in open(fasta) if not l.startswith(">")
)
with open(root + ".ss2", "w") as f:
    f.write("# PSIPRED VFORMAT (fake)\n\n")
    for k, aa in enumerate(seq, start=1):
        f.write("{:4d} {} {}   0.100  0.800  0.100\n".format(
            k, aa, "H"))
with open(root + ".horiz", "w") as f:
    f.write("# PSIPRED HFORMAT (fake)\n")
    f.write("Conf: " + "9" * len(seq) + "\n")
    f.write("Pred: " + "H" * len(seq) + "\n")
    f.write("  AA: " + seq + "\n")
PYEOF
"""

FAKE_MAXCLUSTER = """#!/bin/bash
# fake maxcluster: emit clustering output in the REAL maxcluster
# layout — assignment lines "INFO : <item> : <cluster>  <file>"
# inside the "Clusters @ Threshold" section, followed by a Centroids
# section that a correct parser must NOT ingest
set -e
LIST=
args=("$@")
for ((k=0; k<$#; k++)); do
  [ "${args[k]}" = "-l" ] && LIST="${args[k+1]}"
done
echo "INFO  : Clusters @ Threshold  5.000 (size)"
n=0
while read -r f; do
  n=$((n+1))
  echo "INFO  :   $n : 1  $f"
done < "$LIST"
echo "INFO  : Centroids"
echo "INFO  :   1 : 99  ignored_centroid.pdb"
"""


def test_fold_standard_with_psipred_and_clustering(tmp_path, fold_env,
                                                   monkeypatch):
    """Same protocol, but secondary structure comes from the (fake)
    PSIPRED binary and two models trigger the (fake) maxcluster
    clustering path."""
    prefix = str(tmp_path / "out2" / "fold")

    psipred = tmp_path / "runpsipred"
    psipred.write_text(FAKE_PSIPRED)
    psipred.chmod(0o755)

    maxcluster = tmp_path / "maxcluster"
    maxcluster.write_text(FAKE_MAXCLUSTER)
    maxcluster.chmod(0o755)

    rng = np.random.default_rng(1)
    pairs = [(i, j) for i in range(1, L + 1)
             for j in range(i + 6, L + 1)]
    ecs = pd.DataFrame([
        {
            "i": i, "A_i": SEQ[i - 1], "j": j, "A_j": SEQ[j - 1],
            "cn": rng.random(), "probability": rng.random(),
        }
        for i, j in pairs
    ]).sort_values("cn", ascending=False)
    ec_file = str(tmp_path / "ecs2.csv")
    ecs.to_csv(ec_file, index=False)

    target_seq_file = str(tmp_path / "target2.fa")
    with open(target_seq_file, "w") as f:
        f.write(">TARGET/1-{}\n{}\n".format(L, SEQ))

    outcfg = fold_protocol.run(
        protocol="standard",
        prefix=prefix,
        engine="cns_dgsa",
        ec_file=ec_file,
        target_sequence_file=target_seq_file,
        segments=None,
        folding_config_file=None,
        cut_to_alignment_region=False,
        sec_struct_method="psipred",
        reuse_sec_struct=False,
        sec_struct_file=None,
        filter_sec_struct_clashes=False,
        min_sequence_distance=5,
        fold_probability_cutoffs=None,
        fold_lowest_count=8,
        fold_highest_count=12,
        fold_increase=4,
        num_models=1,
        psipred=str(psipred),
        cpu=1,
        remapped_pdb_files=None,
        cleanup=True,
        cns=fold_env,
        maxcluster=str(maxcluster),
    )

    # two count-ramp sub-runs (8 and 12 ECs) -> two models -> ranking
    # merged with the clustering table
    models = outcfg["folded_structure_files"]
    assert len(models) == 2
    ranking = pd.read_csv(outcfg["folding_ranking_file"])
    assert {"cluster_average", "cluster_size_average"} <= set(
        ranking.columns
    )
    assert (ranking.cluster_size_average == 2).all()

    # PSIPRED-predicted secondary structure persisted
    ss = pd.read_csv(outcfg["sec_struct_file"])
    assert (ss.sec_struct_3state == "H").all()
    assert len(ss) == L

    # aux directory removed by cleanup
    assert not os.path.isdir(
        os.path.join(os.path.dirname(prefix), "aux")
    )
