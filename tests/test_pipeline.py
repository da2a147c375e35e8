"""
Pipeline runtime tests: monomer pipeline execution through
execute_wrapped (flag files, stage chaining, skip/reuse, archive) and
the sqlite job tracker.
"""

import os
import tarfile

import pandas as pd
import pytest

from test_protocols import ALIGN_KWARGS, COUPLINGS_KWARGS, write_synthetic_a2m

from evcouplings_tpu.utils import pipeline
from evcouplings_tpu.utils.config import read_config_file
from evcouplings_tpu.utils.tracker import EStatus, get_result_tracker
from evcouplings_tpu.utils.tracker.sql import SQLTracker


def make_config(tmp_path, stages=("align", "couplings"), management=None):
    a2m = str(tmp_path / "input.a2m")
    write_synthetic_a2m(a2m)

    config = {
        "pipeline": "protein_monomer",
        "stages": list(stages),
        "global": {
            "prefix": str(tmp_path / "out" / "job"),
            "sequence_id": "TARGET_SEQ",
            "theta": 0.8,
        },
        "tools": {"jackhmmer": None, "hhfilter": None, "plmc": None},
        "databases": {},
        "align": {
            "protocol": "existing",
            "input_alignment": a2m,
            **{k: v for k, v in ALIGN_KWARGS.items()
               if k not in ("sequence_id", "theta")},
        },
        "couplings": {
            "protocol": "standard",
            "frequencies_file": None,  # overridden by align output
            **{k: v for k, v in COUPLINGS_KWARGS.items()
               if k != "theta"},
        },
        "mutate": {
            "protocol": "standard",
            "mutation_dataset_file": None,
        },
        "compare": {"protocol": "standard"},
        "fold": {"protocol": "standard"},
        "management": management or {},
    }
    return config


class TestExecute:
    def test_monomer_align_couplings(self, tmp_path):
        config = make_config(tmp_path)
        global_state = pipeline.execute_wrapped(**config)

        prefix = config["global"]["prefix"]
        # success flag written, no failure flags
        assert os.path.isfile(prefix + ".done")
        assert not os.path.isfile(prefix + ".failed")

        # stage in/outcfg chain exists (insert_dir layout:
        # <dir>/<rootname>/<stage>/<rootname>_<stage>.incfg)
        from evcouplings_tpu.utils.system import insert_dir

        for stage in ("align", "couplings"):
            stage_prefix = insert_dir(prefix, stage)
            assert os.path.isfile(
                "{}_{}.incfg".format(stage_prefix, stage)
            )
            assert os.path.isfile(
                "{}_{}.outcfg".format(stage_prefix, stage)
            )

        # stage outputs merged into final state
        assert "alignment_file" in global_state
        assert "ec_file" in global_state
        assert os.path.isfile(global_state["ec_file"])
        assert os.path.isfile(prefix + "_final.outcfg")

        final = read_config_file(prefix + "_final.outcfg")
        assert final["ec_file"] == global_state["ec_file"]

        # per-stage runtime table emitted by the tracing hooks
        assert global_state["runtime_file"] == prefix + "_runtime.csv"
        runtime = pd.read_csv(global_state["runtime_file"])
        assert set(runtime.scope) == {"align", "couplings"}
        assert (runtime.seconds > 0).all()

    def test_skip_reuses_previous_outputs(self, tmp_path):
        config = make_config(tmp_path)
        pipeline.execute_wrapped(**config)

        # second run: skip align, run couplings only
        config2 = make_config(tmp_path, stages=("couplings",))
        ec_file = pipeline.execute_wrapped(**config2)["ec_file"]
        assert os.path.isfile(ec_file)

    def test_skip_without_previous_outputs_fails(self, tmp_path):
        from evcouplings_tpu.utils.system import ResourceError

        config = make_config(tmp_path, stages=("couplings",))
        with pytest.raises(ResourceError):
            pipeline.execute_wrapped(**config)
        assert os.path.isfile(config["global"]["prefix"] + ".failed")

    def test_archive(self, tmp_path):
        config = make_config(
            tmp_path,
            management={"archive": ["ec_file", "alignment_file"]},
        )
        global_state = pipeline.execute_wrapped(**config)

        archive = config["global"]["prefix"] + ".tar.gz"
        assert global_state["archive_file"] == archive
        with tarfile.open(archive) as tar:
            names = tar.getnames()
        assert any("CouplingScores" in n for n in names)

    def test_delete_outputs(self, tmp_path):
        config = make_config(
            tmp_path, management={"delete": ["raw_ec_file"]}
        )
        global_state = pipeline.execute_wrapped(**config)
        assert "raw_ec_file" not in global_state

    def test_invalid_pipeline_rejected(self, tmp_path):
        from evcouplings_tpu.utils.config import InvalidParameterError

        config = make_config(tmp_path)
        config["pipeline"] = "bogus"
        with pytest.raises(InvalidParameterError):
            pipeline.execute(**config)


class TestConfigRobustness:
    def test_empty_yaml_sections_parse_as_none_are_tolerated(
            self, tmp_path):
        """A bare `databases:` section parses as None; the stage
        unpack must treat it as {} instead of raising TypeError."""
        config = make_config(tmp_path)
        config["databases"] = None     # as parsed from "databases:\n"
        outcfg = pipeline.execute(**config)
        assert "ec_file" in outcfg

    def test_unknown_stage_names_rejected(self, tmp_path):
        """A typo in the stages list must be diagnosed up front, not
        surface later as a misleading skip-verification failure."""
        from evcouplings_tpu.utils.config import InvalidParameterError

        config = make_config(tmp_path)
        config["stages"] = ["algin"]
        with pytest.raises(InvalidParameterError, match="algin"):
            pipeline.execute(**config)

    def test_string_stages_treated_as_single_stage(self, tmp_path):
        """`stages: align` (a bare YAML scalar) must mean the one
        stage, not a five-character substring-membership set."""
        config = make_config(tmp_path)
        config["stages"] = "align"
        outcfg = pipeline.execute(**config)
        # only the align stage ran: alignment outputs present, no ECs
        assert "alignment_file" in outcfg
        assert "ec_file" not in outcfg

    def test_empty_global_section_raises_actionable_error(
            self, tmp_path):
        """A bare `global:` section (parses as None) must surface the
        missing prefix as a configuration error, not a TypeError."""
        from evcouplings_tpu.utils.config import InvalidParameterError

        config = make_config(tmp_path)
        config["global"] = None
        with pytest.raises(InvalidParameterError, match="prefix"):
            pipeline.execute(**config)

    def test_yaml_merge_keys_supported(self):
        from evcouplings_tpu.utils.config import parse_config

        cfg = parse_config(
            "defaults: &defaults\n"
            "  theta: 0.8\n"
            "  iterations: 100\n"
            "stage_a:\n"
            "  <<: *defaults\n"
            "  iterations: 50\n"
        )
        assert cfg["stage_a"]["theta"] == 0.8
        assert cfg["stage_a"]["iterations"] == 50

    def test_sequence_mapping_keys_still_supported(self):
        from evcouplings_tpu.utils.config import parse_config

        cfg = parse_config("pairs:\n  [O, O]:\n    dist: 3.0\n")
        assert cfg["pairs"][("O", "O")]["dist"] == 3.0


class TestSQLTracker:
    def test_tracks_job_lifecycle(self, tmp_path):
        db = str(tmp_path / "jobs.db")
        config = make_config(
            tmp_path,
            management={
                "tracker_type": "sql",
                "connection_string": "sqlite:///" + db,
                "job_id": "job-1",
            },
        )
        pipeline.execute_wrapped(**config)

        tracker = get_result_tracker(config)
        row = tracker.get()
        assert row["status"] == EStatus.DONE
        assert row["stage"] == "couplings"
        assert row["pipeline"] == "protein_monomer"
        import json
        results = json.loads(row["results"])
        assert "ec_file" in results

    def test_update_merges_results(self, tmp_path):
        tracker = SQLTracker(
            connection_string="sqlite:///" + str(tmp_path / "t.db"),
            job_id="x", prefix=str(tmp_path / "p"), pipeline="m",
            file_list=None, delete_list=["secret_file"], config={},
        )
        tracker.update(status=EStatus.RUN, results={"a": 1})
        tracker.update(results={"b": 2, "secret_file": "/x"})
        import json
        row = tracker.get()
        results = json.loads(row["results"])
        assert results == {"a": 1, "b": 2}
        assert row["status"] == EStatus.RUN
        assert row["time_started"] is not None


class TestComplexPipeline:
    """protein_complex pipeline through execute_wrapped: align_1/align_2
    (existing) -> concatenate (best_hit) -> couplings (complex), with
    first_/second_ output-key prefixing wired between stages."""

    def test_complex_align_concatenate_couplings(self, tmp_path):
        from test_complex import TestComplexCouplingsEndToEnd

        gen = TestComplexCouplingsEndToEnd()
        a1, a2 = gen._make_monomers(tmp_path)

        align_section = {
            "protocol": "existing",
            "first_index": None,
            "extract_annotation": False,
            "seqid_filter": None,
            "hhfilter": None,
            "minimum_sequence_coverage": 0,
            "minimum_column_coverage": 0,
            "compute_num_effective_seqs": False,
        }
        config = {
            "pipeline": "protein_complex",
            "stages": ["align_1", "align_2", "concatenate", "couplings"],
            "global": {
                "prefix": str(tmp_path / "out" / "job"),
                "theta": 0.8,
            },
            "tools": {},
            "databases": {},
            "align_1": {
                **align_section,
                "input_alignment": a1,
                "sequence_id": "T1",
            },
            "align_2": {
                **align_section,
                "input_alignment": a2,
                "sequence_id": "T2",
            },
            "concatenate": {
                "protocol": "best_hit",
                "use_best_reciprocal": False,
                "paralog_identity_threshold": 0.95,
                # annotations provided directly (the `existing` monomer
                # protocol has no header annotations to extract here)
                "first_annotation_file": str(tmp_path / "anno1.csv"),
                "second_annotation_file": str(tmp_path / "anno2.csv"),
                **{k: v for k, v in align_section.items()
                   if k not in ("protocol", "first_index",
                                "extract_annotation")},
            },
            "couplings": {
                "protocol": "complex",
                "focus_mode": True,
                "use_all_ecs_for_scoring": False,
                "frequencies_file": None,
                **{k: v for k, v in COUPLINGS_KWARGS.items()
                   if k not in ("theta", "focus_mode")},
            },
            "compare": {"protocol": "complex"},
            "mutate": {"protocol": "complex"},
            "fold": {"protocol": "complex_dock"},
            "management": {},
        }
        global_state = pipeline.execute_wrapped(**config)

        prefix = config["global"]["prefix"]
        assert os.path.isfile(prefix + ".done")

        # stage outputs chained through the prefixed keys
        assert "first_alignment_file" in global_state
        assert "second_alignment_file" in global_state
        assert os.path.isfile(global_state["inter_ec_file"])

        # the strongest planted inter coupling survives the full chain
        inter = pd.read_csv(global_state["inter_ec_file"])
        ci, cj, _ = gen.INTER_PLANTED[0]
        assert (inter.i.iloc[0], inter.j.iloc[0]) == (ci + 1, cj + 1)
        assert {"A_1", "B_1"} == (
            set(inter.segment_i) | set(inter.segment_j)
        )

        # the complex summarizer aggregates this run into the
        # run-level statistics table
        from evcouplings_tpu.utils import summarize

        job_cfg = str(tmp_path / "job_config.txt")
        from evcouplings_tpu.utils.config import write_config_file
        write_config_file(job_cfg, config)
        table = summarize.protein_complex(prefix, [job_cfg])
        assert len(table) == 1
        assert os.path.isfile(prefix + "_job_statistics_summary.csv")
        assert "first_n_seqs" in table.columns
        assert "top_inter_rank" in table.columns
