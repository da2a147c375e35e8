"""
Mutation-effect (EVmutation) stage protocols.

Parity target: reference evcouplings/mutate/protocol.py — standard
(:35-143), complex (:146-287), PROTOCOLS/run (:290-326). The
interactive bokeh matrix plots are produced only when the optional
bokeh package is installed; the static matplotlib plots and all CSV /
pml artifacts are always generated.
"""

import matplotlib
matplotlib.use("Agg")

import matplotlib.pyplot as plt
import pandas as pd

from evcouplings_tpu.couplings.mapping import (
    MultiSegmentCouplingsModel,
    Segment,
)
from evcouplings_tpu.couplings.model import CouplingsModel
from evcouplings_tpu.mutate.calculations import (
    predict_mutation_table,
    single_mutant_matrix,
)
from evcouplings_tpu.utils.config import (
    InvalidParameterError,
    check_required,
)
from evcouplings_tpu.utils.system import (
    create_prefix_folders,
    verify_resources,
)
from evcouplings_tpu.visualize import mutations as vis_mutations


def _plot_models(models_and_types, prefix, outcfg):
    """Render interactive (optional) + static mutation matrix plots."""
    try:
        from bokeh.io import output_file, save
        have_bokeh = True
    except ImportError:
        have_bokeh = False

    for model, type_ in models_and_types:
        filename = prefix + "_{}_model".format(type_.lower())

        if have_bokeh:
            output_file(filename + ".html", "{} model".format(type_))
            fig = vis_mutations.plot_mutation_matrix(
                model, engine="bokeh"
            )
            save(fig)
            outcfg["mutation_matrix_plot_files"].append(
                filename + ".html"
            )

        vis_mutations.plot_mutation_matrix(model)
        plt.savefig(filename + ".pdf", bbox_inches="tight")
        plt.close("all")
        outcfg["mutation_matrix_plot_files"].append(filename + ".pdf")


def standard(**kwargs):
    """Protocol: mutation-effect calculation for protein monomers
    (epistatic + independent model)."""
    check_required(
        kwargs, ["prefix", "model_file", "mutation_dataset_file"]
    )

    prefix = kwargs["prefix"]

    outcfg = {
        "mutation_matrix_file": prefix + "_single_mutant_matrix.csv",
        "mutation_matrix_plot_files": [],
    }

    verify_resources(
        "Model parameter file does not exist", kwargs["model_file"]
    )
    create_prefix_folders(prefix)

    c = CouplingsModel(kwargs["model_file"])
    c0 = c.to_independent_model()

    _plot_models([(c, "Epistatic"), (c0, "Independent")], prefix, outcfg)

    singles = single_mutant_matrix(
        c, output_column="prediction_epistatic"
    )
    singles = predict_mutation_table(
        c0, singles, "prediction_independent"
    )
    singles.to_csv(outcfg["mutation_matrix_file"], index=False)

    outcfg["mutations_epistatic_pml_files"] = []
    for model in ["epistatic", "independent"]:
        pml_filename = prefix + "_{}_model.pml".format(model)
        vis_mutations.mutation_pymol_script(
            singles, pml_filename, effect_column="prediction_" + model
        )
        outcfg["mutations_epistatic_pml_files"].append(pml_filename)

    # score an experimental dataset if given
    dataset_file = kwargs["mutation_dataset_file"]
    if dataset_file is not None:
        verify_resources("Dataset file does not exist", dataset_file)
        data = pd.read_csv(dataset_file, comment="#")

        data_pred = predict_mutation_table(
            c, data, "prediction_epistatic"
        )
        data_pred = predict_mutation_table(
            c0, data_pred, "prediction_independent"
        )

        outcfg["mutation_dataset_predicted_file"] = (
            prefix + "_dataset_predicted.csv"
        )
        data_pred.to_csv(
            outcfg["mutation_dataset_predicted_file"], index=False
        )

    return outcfg


def complex(**kwargs):
    """Protocol: mutation-effect prediction for protein complexes
    (epistatic + independent + inter-segment-only models)."""
    check_required(
        kwargs,
        ["prefix", "model_file", "mutation_dataset_file", "segments"],
    )

    prefix = kwargs["prefix"]

    outcfg = {
        "mutation_matrix_file": prefix + "_single_mutant_matrix.csv",
        "mutation_matrix_plot_files": [],
    }

    verify_resources(
        "Model parameter file does not exist", kwargs["model_file"]
    )
    create_prefix_folders(prefix)

    segment_objects = [
        Segment.from_list(s) for s in kwargs["segments"]
    ]
    first_segment = segment_objects[0]
    second_segment = segment_objects[1]

    c = MultiSegmentCouplingsModel(kwargs["model_file"], *segment_objects)
    c0 = c.to_independent_model()
    ci = c.to_inter_segment_model()

    _plot_models(
        [(c, "Epistatic"), (c0, "Independent"), (ci, "Inter_segment")],
        prefix, outcfg,
    )

    singles = single_mutant_matrix(
        c, output_column="prediction_epistatic"
    )
    singles = predict_mutation_table(
        c0, singles, "prediction_independent"
    )
    singles = predict_mutation_table(
        ci, singles, "prediction_inter_segment"
    )
    singles.to_csv(outcfg["mutation_matrix_file"], index=False)

    segment_to_chain = {
        first_segment.segment_id: first_segment.default_chain_name(),
        second_segment.segment_id: second_segment.default_chain_name(),
    }

    outcfg["mutations_epistatic_pml_files"] = []
    for model in ["epistatic", "independent", "inter_segment"]:
        pml_filename = prefix + "_{}_model.pml".format(model)
        vis_mutations.mutation_pymol_script(
            singles, pml_filename,
            effect_column="prediction_" + model,
            segment_to_chain_mapping=segment_to_chain,
        )
        outcfg["mutations_epistatic_pml_files"].append(pml_filename)

    dataset_file = kwargs["mutation_dataset_file"]
    if dataset_file is not None:
        verify_resources("Dataset file does not exist", dataset_file)
        data = pd.read_csv(dataset_file, comment="#", sep=",")

        if "segment" not in data.columns:
            raise ValueError(
                "Input mutation dataset file does not contain "
                "a column called 'segment' to specify the "
                "protein of origin for each mutation"
            )

        data_pred = predict_mutation_table(
            c, data, "prediction_epistatic"
        )
        data_pred = predict_mutation_table(
            c0, data_pred, "prediction_independent"
        )
        # column deliberately named "inter_segment" (not
        # "prediction_inter_segment" like the matrix file): exact
        # artifact parity with the reference, which uses this name in
        # the dataset output (reference mutate/protocol.py:278-281)
        data_pred = predict_mutation_table(
            ci, data_pred, "inter_segment"
        )

        outcfg["mutation_dataset_predicted_file"] = (
            prefix + "_dataset_predicted.csv"
        )
        data_pred.to_csv(
            outcfg["mutation_dataset_predicted_file"], index=False
        )

    return outcfg


PROTOCOLS = {
    # standard EVmutation protocol
    "standard": standard,
    # EVmutation protocol for complexes
    "complex": complex,
}


def run(**kwargs):
    """Dispatch to the mutate protocol named by kwargs["protocol"]."""
    check_required(kwargs, ["protocol"])

    if kwargs["protocol"] not in PROTOCOLS:
        raise InvalidParameterError(
            "Invalid protocol selection: "
            "{}. Valid protocols are: {}".format(
                kwargs["protocol"], ", ".join(PROTOCOLS.keys())
            )
        )

    return PROTOCOLS[kwargs["protocol"]](**kwargs)
