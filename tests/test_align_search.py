"""
Hermetic tests of the jackhmmer-based align protocols using a fake
jackhmmer binary (a shell script that validates the CLI contract and
writes prepared Stockholm/tblout outputs). The reference leaves this
layer untested because it needs real HMMER + databases (SURVEY.md §4
coverage gaps); the fake-binary pattern covers the protocol plumbing
— flag construction, threshold logic, focus-column selection, outcfg
chaining, reuse_alignment restart — without either.
"""

import os
import stat

import numpy as np
import pytest

from evcouplings_tpu.align import protocol as align_protocol
from evcouplings_tpu.align.tools import run_jackhmmer
from evcouplings_tpu.utils.config import read_config_file
from evcouplings_tpu.utils.system import ExternalToolError

QUERY_SEQ = "MKTAYIAKQRQISFVKSHFSRQ"

STOCKHOLM = """# STOCKHOLM 1.0
#=GS TARGET/1-22 DE query protein
#=GS hom1 DE homolog one
#=GS hom2 DE homolog two
TARGET/1-22 MKTAYIAKQRQISFVKSHFSRQ
hom1        MKSAYIGKQRQLSFVKDHFSRQ
hom2        MRTAYLAKQ-QISYVKSHYSRQ
hom3        -KTAYIAKRRQISFVQSHFSR-
//
"""

TBLOUT = """#                                                       --- full sequence ---
# target name   accession  query name  accession    E-value  score  bias
hom1             -          TARGET      -            1e-30    100.0   0.0
hom2             -          TARGET      -            1e-20     80.0   0.0
hom3             -          TARGET      -            1e-10     60.0   0.0
#
"""

DOMTBLOUT = """# target name  accession  tlen query name  accession qlen  E-value  score  bias  #  of  c-Evalue  i-Evalue  score  bias  from  to  ali_from  ali_to  env_from  env_to  acc  description
hom1            -          22   TARGET      -         22    1e-30    100.0  0.0   1  1   1e-30     1e-30     100.0  0.0   1     22  1         22      1         22      0.99 -
hom2            -          22   TARGET      -         22    1e-20    80.0   0.0   1  1   1e-20     1e-20     80.0   0.0   1     22  1         22      1         22      0.95 -
hom3            -          22   TARGET      -         22    1e-10    60.0   0.0   1  1   1e-10     1e-10     60.0   0.0   1     22  1         22      1         22      0.90 -
#
"""


@pytest.fixture
def fake_jackhmmer(tmp_path):
    """Shell script standing in for jackhmmer: checks the flag
    contract, then writes prepared outputs to the -A/-o/--tblout/
    --domtblout paths."""
    sto = tmp_path / "prepared.sto"
    sto.write_text(STOCKHOLM)
    tbl = tmp_path / "prepared.tbl"
    tbl.write_text(TBLOUT)
    dom = tmp_path / "prepared.dom"
    dom.write_text(DOMTBLOUT)

    template = (
        "#!/bin/bash\n"
        "set -e\n"
        "ALI=; OUT=; TBL=; DOM=\n"
        "args=(\"$@\")\n"
        "for ((k=0; k<$#; k++)); do\n"
        "  case \"${args[k]}\" in\n"
        "    -A) ALI=\"${args[k+1]}\";;\n"
        "    -o) OUT=\"${args[k+1]}\";;\n"
        "    --tblout) TBL=\"${args[k+1]}\";;\n"
        "    --domtblout) DOM=\"${args[k+1]}\";;\n"
        "  esac\n"
        "done\n"
        "[ -n \"$ALI\" ] && [ -n \"$OUT\" ] || exit 64\n"
        "# last two args: query and database, both must exist\n"
        "QUERY=\"${args[$#-2]}\"; DB=\"${args[$#-1]}\"\n"
        "[ -f \"$QUERY\" ] && [ -f \"$DB\" ] || exit 65\n"
        "cp @STO@ \"$ALI\"\n"
        "cp @TBL@ \"$TBL\"\n"
        "cp @DOM@ \"$DOM\"\n"
        "echo done > \"$OUT\"\n"
    )
    script = tmp_path / "jackhmmer"
    script.write_text(
        template.replace("@STO@", str(sto))
        .replace("@TBL@", str(tbl))
        .replace("@DOM@", str(dom))
    )
    script.chmod(script.stat().st_mode | stat.S_IEXEC)
    return str(script)


@pytest.fixture
def seq_and_db(tmp_path):
    seq_file = tmp_path / "target.fa"
    seq_file.write_text(">TARGET\n{}\n".format(QUERY_SEQ))
    db_file = tmp_path / "db.fasta"
    db_file.write_text(">someseq\nMKTAYIAKQRQISFVKSHFSRQ\n")
    return str(seq_file), str(db_file)


class TestRunJackhmmer:
    def test_wrapper_produces_result_files(self, fake_jackhmmer,
                                           seq_and_db, tmp_path):
        query, db = seq_and_db
        prefix = str(tmp_path / "out" / "search")
        result = run_jackhmmer(
            query, db, prefix, use_bitscores=True,
            domain_threshold=0.5, seq_threshold=0.5,
            binary=fake_jackhmmer,
        )
        assert os.path.isfile(result.alignment)
        assert open(result.alignment).read() == STOCKHOLM
        assert os.path.isfile(result.domtblout)

    def test_missing_binary_raises(self, seq_and_db, tmp_path):
        query, db = seq_and_db
        with pytest.raises((ExternalToolError, OSError)):
            run_jackhmmer(
                query, db, str(tmp_path / "x"), use_bitscores=True,
                domain_threshold=0.5, seq_threshold=0.5,
                binary="/nonexistent/jackhmmer",
            )


def make_kwargs(tmp_path, fake_jackhmmer, seq_file, db_file, **extra):
    kwargs = {
        "prefix": str(tmp_path / "run" / "job"),
        "sequence_id": "TARGET",
        "sequence_file": seq_file,
        "sequence_download_url": "http://invalid.example/{}",
        "region": None,
        "first_index": 1,
        "use_bitscores": True,
        "domain_threshold": 0.3,
        "sequence_threshold": 0.3,
        "database": "seqdb",
        "seqdb": db_file,
        "iterations": 2,
        "cpu": 1,
        "nobias": False,
        "reuse_alignment": False,
        "checkpoints_hmm": False,
        "checkpoints_ali": False,
        "jackhmmer": fake_jackhmmer,
        "extract_annotation": True,
        # modify_alignment stage
        "seqid_filter": None,
        "hhfilter": None,
        "minimum_sequence_coverage": 50,
        "minimum_column_coverage": 50,
        "compute_num_effective_seqs": True,
        "theta": 0.8,
    }
    kwargs.update(extra)
    return kwargs


class TestJackhmmerProtocols:
    def test_standard_protocol_end_to_end(self, tmp_path,
                                          fake_jackhmmer, seq_and_db):
        seq_file, db_file = seq_and_db
        kwargs = make_kwargs(
            tmp_path, fake_jackhmmer, seq_file, db_file
        )
        outcfg = align_protocol.run(protocol="standard", **kwargs)

        # final focus alignment contains the homologs, uppercased to
        # the query's non-gap columns
        assert os.path.isfile(outcfg["alignment_file"])
        from evcouplings_tpu.align.alignment import Alignment

        ali = Alignment.from_path(outcfg["alignment_file"])
        assert ali.N == 4
        assert ali.L == len(QUERY_SEQ)

        assert outcfg["focus_sequence"] == "TARGET/1-22"
        assert outcfg["num_sites"] == len(QUERY_SEQ)
        assert outcfg["effective_sequences"] > 0
        # annotation extracted from the Stockholm GS records
        assert os.path.isfile(outcfg["annotation_file"])

        # statistics outputs
        assert os.path.isfile(outcfg["statistics_file"])
        assert os.path.isfile(outcfg["frequencies_file"])

    def test_reuse_alignment_skips_search(self, tmp_path,
                                          fake_jackhmmer, seq_and_db):
        seq_file, db_file = seq_and_db
        kwargs = make_kwargs(
            tmp_path, fake_jackhmmer, seq_file, db_file
        )
        align_protocol.run(protocol="standard", **kwargs)

        # second run: reuse previous search with a broken binary —
        # must not invoke it at all
        kwargs2 = dict(
            kwargs, reuse_alignment=True,
            jackhmmer="/nonexistent/jackhmmer",
        )
        outcfg = align_protocol.run(protocol="standard", **kwargs2)
        assert os.path.isfile(outcfg["alignment_file"])

    def test_region_cut(self, tmp_path, fake_jackhmmer, seq_and_db):
        seq_file, db_file = seq_and_db
        kwargs = make_kwargs(
            tmp_path, fake_jackhmmer, seq_file, db_file,
            region=(5, 15),
        )
        outcfg = align_protocol.run(
            protocol="jackhmmer_search", **kwargs
        )
        # the query written for the search is the cut region
        target = open(outcfg["target_sequence_file"]).read()
        assert QUERY_SEQ[4:15] in target
        segment = outcfg["segments"][0]
        assert segment[3] == 5 and segment[4] == 15


class TestSeqidFilter:
    def test_modify_alignment_invokes_hhfilter(self, tmp_path):
        """seqid_filter routes through run_hhfilter; the fake binary
        drops one sequence so the filter's effect is observable."""
        from evcouplings_tpu.align.alignment import Alignment
        from evcouplings_tpu.align.protocol import modify_alignment

        # focus alignment: query + 3 homologs
        seqs = {
            "TARGET/1-8": "MKTAYIAK",
            "h1": "MKSAYIGK",
            "h2": "MRTAYLAK",
            "h3": "MKTAYIAK",
        }
        ali = Alignment.from_dict(seqs)

        # fake hhfilter: copy input to output, dropping the last record
        script = tmp_path / "hhfilter"
        script.write_text(
            "#!/bin/bash\nset -e\n"
            "IN=; OUTF=\n"
            "args=(\"$@\")\n"
            "for ((k=0; k<$#; k++)); do\n"
            "  case \"${args[k]}\" in\n"
            "    -i) IN=\"${args[k+1]}\";;\n"
            "    -o) OUTF=\"${args[k+1]}\";;\n"
            "  esac\n"
            "done\n"
            "head -n -2 \"$IN\" > \"$OUTF\"\n"
        )
        script.chmod(0o755)

        outcfg, filtered = modify_alignment(
            ali, 0, "TARGET", 1,
            prefix=str(tmp_path / "job"),
            seqid_filter=95,
            hhfilter=str(script),
            minimum_sequence_coverage=0,
            minimum_column_coverage=0,
            compute_num_effective_seqs=False,
            theta=0.8,
        )
        assert filtered.N == 3
        assert os.path.isfile(outcfg["alignment_file"])


HMMSEARCH_STO = """# STOCKHOLM 1.0
#=GC RF xxxxxxxx
hitA MKSAYIGK
hitB MRTAYLAK
hitC -KTAYIAR
//
"""


class TestHmmbuildAndSearch:
    @pytest.fixture
    def fake_hmm_binaries(self, tmp_path):
        """Fake hmmbuild (writes .hmm) and hmmsearch (writes -A
        Stockholm with RF annotation plus tblout/domtblout/-o)."""
        sto = tmp_path / "hmmsearch_result.sto"
        sto.write_text(HMMSEARCH_STO)

        hmmbuild = tmp_path / "hmmbuild"
        hmmbuild.write_text(
            "#!/bin/bash\nset -e\n"
            "args=(\"$@\")\n"
            "OUT=\n"
            "for ((k=0; k<$#; k++)); do\n"
            "  [ \"${args[k]}\" = \"-o\" ] && OUT=\"${args[k+1]}\"\n"
            "done\n"
            "HMM=\"${args[$#-2]}\"; ALI=\"${args[$#-1]}\"\n"
            "[ -f \"$ALI\" ] || exit 65\n"
            "echo 'HMMER3/f fake profile' > \"$HMM\"\n"
            "echo ok > \"$OUT\"\n"
        )
        hmmbuild.chmod(0o755)

        hmmsearch = tmp_path / "hmmsearch"
        hmmsearch.write_text(
            "#!/bin/bash\nset -e\n"
            "args=(\"$@\")\n"
            "ALI=; OUT=; TBL=; DOM=\n"
            "for ((k=0; k<$#; k++)); do\n"
            "  case \"${args[k]}\" in\n"
            "    -A) ALI=\"${args[k+1]}\";;\n"
            "    -o) OUT=\"${args[k+1]}\";;\n"
            "    --tblout) TBL=\"${args[k+1]}\";;\n"
            "    --domtblout) DOM=\"${args[k+1]}\";;\n"
            "  esac\n"
            "done\n"
            "HMM=\"${args[$#-2]}\"; DB=\"${args[$#-1]}\"\n"
            "[ -f \"$HMM\" ] && [ -f \"$DB\" ] || exit 66\n"
            "cp @STO@ \"$ALI\"\n"
            "echo '# tbl' > \"$TBL\"\n"
            "echo '# dom' > \"$DOM\"\n"
            "echo ok > \"$OUT\"\n".replace("@STO@", str(sto))
        )
        hmmsearch.chmod(0o755)
        return str(hmmbuild), str(hmmsearch)

    def test_protocol_end_to_end(self, tmp_path, fake_hmm_binaries,
                                 seq_and_db):
        _, db_file = seq_and_db
        hmmbuild, hmmsearch = fake_hmm_binaries

        # input alignment containing the target (8 aligned columns)
        input_ali = tmp_path / "input.fasta"
        input_ali.write_text(
            ">TARGET/1-8\nMKTAYIAK\n>other\nMKSAYIGK\n"
        )

        outcfg = align_protocol.run(
            protocol="hmmbuild_and_search",
            prefix=str(tmp_path / "run" / "hb"),
            sequence_id="TARGET",
            alignment_file=str(input_ali),
            first_index=1,
            use_bitscores=True,
            domain_threshold=0.3,
            sequence_threshold=0.3,
            database="seqdb",
            seqdb=db_file,
            cpu=1,
            nobias=False,
            reuse_alignment=False,
            hmmbuild=hmmbuild,
            hmmsearch=hmmsearch,
            extract_annotation=False,
            # modify_alignment stage
            seqid_filter=None,
            hhfilter=None,
            minimum_sequence_coverage=0,
            minimum_column_coverage=0,
            compute_num_effective_seqs=False,
            theta=0.8,
        )

        assert outcfg["focus_mode"] is True
        assert outcfg["focus_sequence"] == "TARGET/1-8"

        from evcouplings_tpu.align.alignment import Alignment

        # query prepended to the search hits, gapped onto RF columns
        raw = Alignment.from_path(
            outcfg["raw_focus_alignment_file"], "fasta"
        )
        assert raw.N == 4
        assert "".join(raw[0]) == "MKTAYIAK"

        # hmmbuild_and_search stops at the raw focus alignment (the
        # reference does too — downstream stages run the filtering)
        assert os.path.isfile(outcfg["raw_alignment_file"])
        assert os.path.isfile(outcfg["hittable_file"])
        assert outcfg["segments"][0][3] == 1
        assert outcfg["segments"][0][4] == 8
