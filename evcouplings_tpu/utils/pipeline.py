"""
Pipeline runtime: stage sequencing, state chaining, skip/resume,
archiving, flag files, and the `evcouplings_runcfg` entry point.

Parity target: reference evcouplings/utils/pipeline.py — PIPELINES
(:53-70), execute (:92-262), create_archive (:265-328), delete_outputs
(:331-372), verify_prefix (:375-436), execute_wrapped (:439-545), CLI
(:548-590). Stage semantics are identical: each stage's incfg is
{tools, databases, stage config, global state}; stage outputs merge
into the global state; stages absent from the `stages` list reuse a
verified previous outcfg.
"""

# non-interactive backend for any plotting done inside stages
import matplotlib
matplotlib.use("Agg")

import os
import signal
import sys
import tarfile
import traceback
import zipfile
from copy import deepcopy
from os import path

import click

from evcouplings_tpu.utils import BailoutException
from evcouplings_tpu.utils.config import (
    InvalidParameterError,
    check_required,
    iterate_files,
    read_config_file,
    write_config_file,
)
from evcouplings_tpu.utils.system import (
    create_prefix_folders,
    insert_dir,
    valid_file,
    verify_resources,
)
from evcouplings_tpu.utils.tracker import EStatus, get_result_tracker
from evcouplings_tpu.utils.tracing import (
    clear_spans, stage_timer, write_span_table
)

import evcouplings_tpu.align.protocol as ap
import evcouplings_tpu.couplings.protocol as cp
import evcouplings_tpu.compare.protocol as cm
import evcouplings_tpu.mutate.protocol as mt
import evcouplings_tpu.fold.protocol as fd
import evcouplings_tpu.complex.protocol as pp

# supported pipelines: list of (stage name, runner, output key prefix)
PIPELINES = {
    "protein_monomer": [
        ("align", ap.run, None),
        ("couplings", cp.run, None),
        ("compare", cm.run, None),
        ("mutate", mt.run, None),
        ("fold", fd.run, None),
    ],
    "protein_complex": [
        ("align_1", ap.run, "first_"),
        ("align_2", ap.run, "second_"),
        ("concatenate", pp.run, None),
        ("couplings", cp.run, None),
        ("compare", cm.run, None),
        ("mutate", mt.run, None),
        ("fold", fd.run, None),
    ],
}

from evcouplings_tpu.utils.constants import (  # noqa: F401
    FINAL_CONFIG_SUFFIX,  # canonical home; re-exported for compat
)

# flag files documenting how the run ended
EXTENSION_TERMINATED = ".terminated"
EXTENSION_FAILED = ".failed"
EXTENSION_BAILOUT = ".bailout"
EXTENSION_DONE = ".done"


def execute(**config):
    """Execute a pipeline configuration; returns the final global
    output state."""
    check_required(config, ["pipeline", "stages", "global"])

    if config["pipeline"] not in PIPELINES:
        raise InvalidParameterError(
            "Not a valid pipeline selection. "
            "Valid choices are:\n{}".format(", ".join(PIPELINES.keys()))
        )

    pipeline = PIPELINES[config["pipeline"]]

    stages = config["stages"]
    if stages is None:
        raise InvalidParameterError("No stages defined, need at least one.")
    if isinstance(stages, str):
        # a bare YAML scalar (stages: align) would otherwise do
        # substring membership and count characters as stages
        stages = [stages]
    known = [name for name, _, _ in pipeline]
    unknown = [s for s in stages if s not in known]
    if unknown:
        raise InvalidParameterError(
            "Unknown stage(s) {} for pipeline '{}'. Valid stages "
            "are: {}".format(
                ", ".join(unknown), config["pipeline"], ", ".join(known)
            )
        )

    # an empty `global:` YAML section parses as None — surface the
    # missing prefix as the configuration error it is
    global_section = config["global"] or {}
    prefix = global_section.get("prefix")
    if prefix is None:
        raise InvalidParameterError(
            "Configuration does not include 'prefix' setting in "
            "'global' section"
        )
    create_prefix_folders(prefix)

    # fresh span registry per job (several jobs may share a process)
    clear_spans()

    # results accumulated while moving through the stages
    global_state = global_section
    num_stages_to_run = len(stages)

    tracker = get_result_tracker(config)
    tracker.update(status=EStatus.RUN, results=global_state)

    for (stage, runner, key_prefix) in pipeline:
        # everything requested has run; trailing stages are skipped
        if num_stages_to_run == 0:
            break

        check_required(config, [stage])

        # each stage writes into its own subdirectory
        stage_prefix = insert_dir(prefix, stage)
        create_prefix_folders(stage_prefix)

        stage_incfg = "{}_{}.incfg".format(stage_prefix, stage)
        stage_outcfg = "{}_{}.outcfg".format(stage_prefix, stage)

        tracker.update(stage=stage)

        if stage in stages:
            # global state comes last: it overrides stage settings.
            # Empty YAML sections parse as None — treat them as {}
            # instead of crashing the unpack with a TypeError
            incfg = {
                **(config["tools"] or {}),
                **(config["databases"] or {}),
                **(config[stage] or {}),
                **global_state,
                "prefix": stage_prefix,
            }
            write_config_file(stage_incfg, incfg)

            with stage_timer(stage):
                outcfg = runner(**incfg)

            # avoid key collisions when a stage runs twice (complexes)
            if key_prefix is not None:
                outcfg = {key_prefix + k: v for k, v in outcfg.items()}

            write_config_file(stage_outcfg, outcfg)
            num_stages_to_run -= 1
        else:
            # skipped stage: reuse previous results after verifying them
            verify_resources(
                "Trying to skip, but output configuration "
                "for stage '{}' does not exist. Has it already "
                "been run?".format(stage),
                stage_outcfg,
            )
            outcfg = read_config_file(stage_outcfg)

            outfiles = [
                filepath for f, filepath in outcfg.items()
                if f.endswith("_file") and filepath is not None
            ]
            verify_resources(
                "Output files from stage '{}' missing".format(stage),
                *outfiles,
            )

        global_state = {**global_state, **outcfg}
        tracker.update(results=outcfg)

    archive_file = create_archive(config, global_state, prefix)
    if archive_file is not None:
        global_state["archive_file"] = archive_file

    global_state = delete_outputs(config, global_state)

    # per-stage wall-clock table (observability the reference lacks;
    # spans collected by utils.tracing.stage_timer around each runner)
    runtime_file = write_span_table(prefix + "_runtime.csv")
    if runtime_file is not None:
        global_state["runtime_file"] = runtime_file

    write_config_file(prefix + FINAL_CONFIG_SUFFIX, global_state)

    # DONE is recorded LAST (reference ordering): a tracker consumer
    # observing DONE can rely on the final outcfg existing and the
    # archive/delete cleanup having completed; the late-added keys
    # ride along so the tracker's results match the final outcfg
    late_keys = {
        k: global_state[k]
        for k in ("archive_file", "runtime_file") if k in global_state
    }
    tracker.update(status=EStatus.DONE, results=late_keys or None)
    return global_state


def create_archive(config, outcfg, prefix):
    """Archive the output files selected by management.archive into
    prefix.tar.gz (default) or prefix.zip."""
    ALLOWED_FORMATS = ["targz", "zip"]

    management = config.get("management") or {}
    archive_format = management.get("archive_format", "targz")
    archive_keys = management.get("archive", None)
    if archive_keys is None:
        return None

    if archive_format not in ALLOWED_FORMATS:
        raise InvalidParameterError(
            "Invalid format for output archive: {}. ".format(archive_format)
            + "Valid options are: " + ", ".join(ALLOWED_FORMATS)
        )

    archive_files = [
        (file_path, file_key, idx)
        for (file_path, file_key, idx)
        in iterate_files(outcfg, subset=archive_keys)
        if valid_file(file_path)
    ]
    if len(archive_files) == 0:
        return None

    if archive_format == "targz":
        final_archive_file = prefix + ".tar.gz"
        with tarfile.open(final_archive_file, "w:gz") as tar:
            for (file_path, file_key, idx) in archive_files:
                tar.add(file_path)
    else:
        final_archive_file = prefix + ".zip"
        with zipfile.ZipFile(
            final_archive_file, "w", zipfile.ZIP_DEFLATED
        ) as zip_:
            for (file_path, file_key, idx) in archive_files:
                zip_.write(file_path)

    return final_archive_file


def delete_outputs(config, outcfg):
    """Delete output files selected by management.delete; returns the
    cleaned output state."""
    delete_keys = (config.get("management") or {}).get("delete", None)
    if delete_keys is None:
        return outcfg

    outcfg_cleaned = deepcopy(outcfg)

    for (file_path, file_key, idx) in iterate_files(
        outcfg, subset=delete_keys
    ):
        try:
            os.remove(file_path)
        except OSError:
            pass
        if file_key in outcfg_cleaned:
            del outcfg_cleaned[file_key]

    return outcfg_cleaned


def verify_prefix(verify_subdir=True, **config):
    """Check that the configured prefix is present and writable."""
    try:
        prefix = config["global"]["prefix"]
    except (KeyError, TypeError):
        # TypeError: an empty `global:` YAML section parses as None
        raise InvalidParameterError(
            "Configuration does not include 'prefix' setting in "
            "'global' section"
        )

    if prefix is None:
        raise InvalidParameterError(
            "'prefix' must be specified and cannot be None"
        )

    try:
        create_prefix_folders(prefix)

        with open(prefix + ".test__", "w"):
            pass
        os.remove(prefix + ".test__")

        if verify_subdir:
            sub_prefix = insert_dir(prefix, "test__")
            create_prefix_folders(sub_prefix)
            os.rmdir(path.dirname(sub_prefix))
    except OSError as e:
        raise InvalidParameterError(
            "Not a valid prefix: {}".format(prefix)
        ) from e

    return prefix


def execute_wrapped(**config):
    """Execute a pipeline with signal/exception handling documented via
    flag files (.done/.failed/.terminated/.bailout) and the tracker."""
    tracker = get_result_tracker(config)

    try:
        prefix = verify_prefix(**config)
    except Exception:
        tracker.update(
            status=EStatus.FAIL,
            message="Invalid prefix: {}".format(traceback.format_exc()),
        )
        raise

    # clear flags from previous executions
    for ext in [
        EXTENSION_FAILED, EXTENSION_TERMINATED,
        EXTENSION_DONE, EXTENSION_BAILOUT,
    ]:
        try:
            os.remove(prefix + ext)
        except OSError:
            pass

    def _handler(signal_, frame):
        with open(prefix + EXTENSION_TERMINATED, "w") as f:
            f.write("SIGNAL: {}\n".format(signal_))
        tracker.update(
            status=EStatus.TERM,
            message="Terminated with signal: {}\n".format(signal_),
        )
        sys.exit(1)

    # handlers are restored on the way out: several jobs may share one
    # process, and a signal arriving BETWEEN jobs must not write this
    # (finished) job's .terminated flag or flip its tracker row
    handled = [
        signal.SIGINT, signal.SIGTERM, signal.SIGUSR1, signal.SIGUSR2
    ]
    previous = {sig: signal.getsignal(sig) for sig in handled}
    for sig in handled:
        signal.signal(sig, _handler)

    try:
        outcfg = execute(**config)

        with open(prefix + EXTENSION_DONE, "w") as f:
            f.write(repr(outcfg))
        return outcfg

    except Exception as e:
        trace_text = traceback.format_exc()

        # a deliberate pipeline bailout gets its own flag file and
        # tracker status; everything else is a crash
        bailed = isinstance(e, BailoutException)
        extension, status, what = (
            (EXTENSION_BAILOUT, EStatus.BAILOUT,
             "Pipeline bailed out of execution")
            if bailed else
            (EXTENSION_FAILED, EStatus.FAIL,
             "Crashed during job execution")
        )

        with open(prefix + extension, "w") as f:
            f.write(trace_text)

        tracker.update(
            status=status,
            message="{}: {}".format(what, trace_text),
        )
        raise
    finally:
        for sig, old in previous.items():
            signal.signal(sig, old)


def run(**kwargs):
    """Run a pipeline from a configuration file (single process)."""
    config_file = kwargs["config"]
    verify_resources(
        "Config file does not exist or is empty.", config_file
    )

    config = read_config_file(config_file)
    return execute_wrapped(**config)


CONTEXT_SETTINGS = dict(help_option_names=["-h", "--help"])


@click.command(context_settings=CONTEXT_SETTINGS)
@click.argument("config")
def app(**kwargs):
    """evcouplings_runcfg: execute a pipeline job configuration file."""
    outcfg = run(**kwargs)
    print(outcfg)


if __name__ == "__main__":
    app()
