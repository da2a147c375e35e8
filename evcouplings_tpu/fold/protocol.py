"""
Fold-stage protocols: predict 3D structures from ECs (EVfold) and
generate complex docking restraints.

Parity target: reference evcouplings/fold/protocol.py —
secondary_structure (:42), compare_models_maxcluster (:134),
maxcluster_clustering_table (:265), standard (:308-580),
complex_dock (:583-698), PROTOCOLS/run (:700-714). The reference's
billiard pool over folding sub-runs is replaced by
concurrent.futures (no extra dependency).
"""

import shutil
from concurrent.futures import ProcessPoolExecutor
from functools import partial
from math import ceil
from os import path

import pandas as pd

from evcouplings_tpu.align.alignment import parse_header, read_fasta
from evcouplings_tpu.compare.pdb import ClassicPDB
from evcouplings_tpu.couplings.mapping import Segment
from evcouplings_tpu.fold.cns import cns_dgsa_fold
from evcouplings_tpu.fold.filter import secstruct_clashes
from evcouplings_tpu.fold.haddock import haddock_dist_restraint
from evcouplings_tpu.fold.ranking import dihedral_ranking
from evcouplings_tpu.fold.restraints import docking_restraints
from evcouplings_tpu.fold.tools import (
    read_psipred_prediction,
    run_maxcluster_cluster,
    run_maxcluster_compare,
    run_psipred,
)
from evcouplings_tpu.utils.config import (
    InvalidParameterError,
    check_required,
)
from evcouplings_tpu.utils.system import (
    create_prefix_folders,
    insert_dir,
    temp,
    valid_file,
    verify_resources,
)
from evcouplings_tpu.visualize.pymol import pymol_secondary_structure


def secondary_structure(**kwargs):
    """Load (sec_struct_file) or predict (psipred) secondary structure
    for the target sequence; returns residue table (i, A_i,
    sec_struct_3state)."""
    check_required(
        kwargs,
        [
            "prefix", "target_sequence_file",
            "segments", "sec_struct_method",
            "sec_struct_file", "psipred",
        ],
    )

    prefix = kwargs["prefix"]
    create_prefix_folders(prefix)

    secstruct_file = kwargs["sec_struct_file"]
    if secstruct_file is not None:
        verify_resources(
            "Secondary structure prediction file does not "
            "exist/is empty",
            secstruct_file,
        )
        return pd.read_csv(secstruct_file)

    target_seq_file = kwargs["target_sequence_file"]
    verify_resources(
        "Sequence file does not exist/is empty", target_seq_file
    )

    # first index from segment info, else from the FASTA header range
    if kwargs["segments"] is not None:
        s = Segment.from_list(kwargs["segments"][0])
        first_index = s.region_start
    else:
        first_index = None
        with open(target_seq_file) as f:
            header, _ = next(read_fasta(f))
            if header is not None:
                _, first_index, _ = parse_header(header)

            if first_index is None:
                raise InvalidParameterError(
                    "Could not unambiguously identify sequence range "
                    "from FASTA header, needs to specified as "
                    "id/start-end: {}".format(header)
                )

    if kwargs["sec_struct_method"] == "psipred":
        output_dir = path.join(path.dirname(prefix), "psipred")

        ss2_file, horiz_file = run_psipred(
            target_seq_file, output_dir, binary=kwargs["psipred"]
        )
        return read_psipred_prediction(
            horiz_file, first_index=first_index
        )

    raise InvalidParameterError(
        "Secondary structure prediction method not implemented: "
        "{}. Valid choices: psipred".format(kwargs["sec_struct_method"])
    )


def compare_models_maxcluster(experiments, predictions,
                              norm_by_intersection=True,
                              distance_cutoff=None,
                              binary="maxcluster"):
    """Compare predicted models to experimental structures with
    maxcluster (TM normalized over the position intersection by
    default); returns (full table, {experiment file: table})."""
    def _determine_pos(filename):
        structure = ClassicPDB.from_file(filename)
        if len(structure.model_to_chains) == 0:
            raise InvalidParameterError(
                "Structure contains no model (is empty): " + filename
                + " - please verify that no problems occurred during "
                "structure mapping"
            )
        elif len(structure.model_to_chains) > 1:
            raise InvalidParameterError(
                "Structure contains more than one model: " + filename
            )

        model = list(structure.model_to_chains.keys())[0]
        chains = structure.model_to_chains[model]
        if len(chains) != 1:
            raise InvalidParameterError(
                "Structure must contain exactly one chain, but "
                "contains: " + ",".join(chains)
            )
        chain = structure.get_chain(chains[0], model)
        return chain.residues.id.astype(str).values, chain

    def _eliminate_altloc(chain):
        # keep the highest-occupancy location per atom (maxcluster
        # cannot handle duplicates)
        chain.coords = chain.coords.loc[
            chain.coords.groupby(
                ["residue_index", "atom_name"]
            ).occupancy.idxmax()
        ]
        temp_filename = temp()
        with open(temp_filename, "w") as f:
            chain.to_file(f)
        return temp_filename

    if len(predictions) == 0:
        raise InvalidParameterError(
            "Need at least one predicted structure."
        )

    pred_pos, _ = _determine_pos(predictions[0])

    full_result = pd.DataFrame()
    single_results = {}

    for exp_file in experiments:
        exp_pos, exp_chain = _determine_pos(exp_file)
        exp_file_cleaned = _eliminate_altloc(exp_chain)

        joint_pos = set(exp_pos).intersection(pred_pos)

        if norm_by_intersection:
            normalization_length = len(joint_pos)
        else:
            normalization_length = len(exp_pos)

        comp = run_maxcluster_compare(
            predictions, exp_file_cleaned,
            normalization_length=normalization_length,
            distance_cutoff=distance_cutoff, binary=binary,
        )

        comp.loc[:, "filename_experimental"] = exp_file
        comp.loc[:, "L_experiment"] = len(exp_pos)
        comp.loc[:, "L_prediction"] = len(pred_pos)
        comp.loc[:, "L_joint"] = len(joint_pos)
        comp.loc[:, "L_normalization"] = normalization_length

        comp = comp.sort_values("tm", ascending=False)
        single_results[exp_file] = comp
        full_result = pd.concat([full_result, comp])

    return full_result, single_results


def maxcluster_clustering_table(structures, binary):
    """Clustering results for all maxcluster clustering methods, one
    cluster/cluster_size column pair per method."""
    clust_all = None
    for method in [
        "single", "average", "maximum", "pairs_min", "pairs_abs"
    ]:
        clust = run_maxcluster_cluster(
            structures, method=method, binary=binary
        ).rename(columns={
            "cluster": "cluster_" + method,
            "cluster_size": "cluster_size_" + method,
        })

        if clust_all is None:
            clust_all = clust
        else:
            clust_all = clust_all.merge(
                clust, on="filename", how="outer"
            )

    return clust_all


def standard(**kwargs):
    """Protocol: EC-restrained folding (CNS dg/sa), model ranking,
    clustering, and optional comparison to remapped structures."""
    check_required(
        kwargs,
        [
            "prefix", "engine", "ec_file", "target_sequence_file",
            "segments", "folding_config_file",
            "cut_to_alignment_region",
            "sec_struct_method", "reuse_sec_struct",
            "sec_struct_file", "filter_sec_struct_clashes",
            "min_sequence_distance", "fold_probability_cutoffs",
            "fold_lowest_count", "fold_highest_count", "fold_increase",
            "num_models", "psipred", "cpu", "remapped_pdb_files",
            "cleanup",
        ],
    )

    prefix = kwargs["prefix"]
    create_prefix_folders(prefix)

    outcfg = {
        "folding_ec_file": prefix + "_CouplingScores_with_clashes.csv",
        "sec_struct_file": prefix + "_secondary_structure.csv",
    }

    # secondary structure (reused from previous run if requested)
    if kwargs["reuse_sec_struct"] and valid_file(
        outcfg["sec_struct_file"]
    ):
        residues = pd.read_csv(outcfg["sec_struct_file"])
    else:
        residues = secondary_structure(**kwargs)

    outcfg["secondary_structure_pml_file"] = prefix + "_ss_draw.pml"
    pymol_secondary_structure(
        residues, outcfg["secondary_structure_pml_file"]
    )

    verify_resources("EC file does not exist", kwargs["ec_file"])
    ecs_all = pd.read_csv(kwargs["ec_file"])
    ecs = ecs_all.query(
        "abs(i - j) > {}".format(kwargs["min_sequence_distance"])
    )

    # annotate + optionally filter secondary-structure clashes
    ecs = secstruct_clashes(ecs, residues)
    ecs.to_csv(outcfg["folding_ec_file"], index=False)

    if kwargs["filter_sec_struct_clashes"]:
        ecs_fold = ecs.loc[~ecs.ss_clash]
    else:
        ecs_fold = ecs

    # restrict modelled region to the aligned region if requested
    if kwargs["cut_to_alignment_region"]:
        segments = kwargs["segments"]
        if segments is not None:
            positions = Segment.from_list(segments[0]).positions
        else:
            positions = set(ecs.i.unique()).union(ecs.j.unique())

        first_pos, last_pos = min(positions), max(positions)
        residues.loc[:, "in_model"] = False
        residues.loc[
            (residues.i >= first_pos) & (residues.i <= last_pos),
            "in_model",
        ] = True
    else:
        residues.loc[:, "in_model"] = True

    residues.to_csv(outcfg["sec_struct_file"], index=False)
    residues_fold = residues.loc[residues.in_model]

    num_procs = kwargs["cpu"]
    if num_procs is None:
        num_procs = 1

    # define sub-runs: by probability cutoff ...
    folding_runs = []
    cutoffs = kwargs["fold_probability_cutoffs"]
    if cutoffs is not None and "probability" in ecs_fold.columns:
        if not isinstance(cutoffs, list):
            cutoffs = [cutoffs]
        for c in cutoffs:
            sig_ecs = ecs_fold.query("probability >= @c")
            if len(sig_ecs) > 0:
                folding_runs.append(
                    (sig_ecs, "_significant_ECs_{}".format(c))
                )

    # ... and by EC count ramp
    flc = kwargs["fold_lowest_count"]
    fhc = kwargs["fold_highest_count"]
    fi = kwargs["fold_increase"]
    if flc is not None and fhc is not None and fi is not None:
        num_sites = len(
            set.union(set(ecs.i.unique()), set(ecs.j.unique()))
        )

        def _discrete_count(x):
            if isinstance(x, float):
                x = ceil(x * num_sites)
            return int(x)

        lowest = _discrete_count(flc)
        highest = _discrete_count(fhc)
        step = _discrete_count(fi)

        folding_runs += [
            (ecs_fold.iloc[:c], "_{}".format(c))
            for c in range(lowest, highest + 1, step)
        ]

    method = kwargs["engine"]

    # fold into an aux subdirectory; final models are copied out
    aux_prefix = insert_dir(prefix, "aux", rootname_subdir=False)
    aux_dir = path.dirname(aux_prefix)

    folding_runs = [
        (job_ecs, aux_prefix + job_suffix)
        for (job_ecs, job_suffix) in folding_runs
    ]

    if method == "cns_dgsa":
        folder = partial(
            cns_dgsa_fold,
            residues_fold,
            config_file=kwargs["folding_config_file"],
            num_structures=kwargs["num_models"],
            log_level=None,
            binary=kwargs["cns"],
        )
    else:
        raise InvalidParameterError(
            "Invalid folding engine: {} ".format(method)
            + "Valid selections are: cns_dgsa"
        )

    # parallelize sub-runs over PROCESSES (the reference uses
    # multiprocessing.Pool, fold/protocol.py:495-502): cns_dgsa_fold
    # chdirs into the aux directory and os.chdir is process-global,
    # so threads would race on the working directory
    with ProcessPoolExecutor(max_workers=num_procs) as pool:
        futures = [
            pool.submit(folder, *args) for args in folding_runs
        ]
        results = [f.result() for f in futures]

    folded_files = {
        k: v for subres in results for k, v in subres.items()
    }

    # move structures from aux into the main folding directory
    fold_dir = path.dirname(prefix)
    prediction_files = []
    for name, file_path in folded_files.items():
        shutil.copy(file_path, fold_dir)
        prediction_files.append(file_path.replace(aux_prefix, prefix))

    outcfg["folded_structure_files"] = prediction_files

    if kwargs["cleanup"]:
        shutil.rmtree(aux_dir)

    # rank + cluster models
    ranking = dihedral_ranking(prediction_files, residues)

    if len(prediction_files) > 1:
        clustering = maxcluster_clustering_table(
            prediction_files, binary=kwargs["maxcluster"]
        )
        ranking = ranking.merge(clustering, on="filename", how="left")

    ranking = ranking.sort_values(by="ranking_score", ascending=False)
    outcfg["folding_ranking_file"] = prefix + "_ranking.csv"
    ranking.to_csv(outcfg["folding_ranking_file"], index=False)

    # compare to remapped experimental structures if available
    if (kwargs["remapped_pdb_files"] is not None
            and len(kwargs["remapped_pdb_files"]) > 0):
        experimental_files = kwargs["remapped_pdb_files"]
        comp_all, comp_singles = compare_models_maxcluster(
            list(experimental_files.keys()), prediction_files,
            norm_by_intersection=True, distance_cutoff=None,
            binary=kwargs["maxcluster"],
        )

        comparison = ranking.merge(
            comp_all, on="filename", how="left"
        ).sort_values(by="tm", ascending=False)

        outcfg["folding_comparison_file"] = prefix + "_comparison.csv"
        comparison.to_csv(
            outcfg["folding_comparison_file"], index=False
        )

        ind_comp_files = {}
        for filename, comp_single in comp_singles.items():
            comparison_s = ranking.merge(
                comp_single, on="filename", how="left"
            ).sort_values(by="tm", ascending=False)

            basename = path.splitext(path.split(filename)[1])[0]
            ind_file = path.join(fold_dir, basename + ".csv")
            ind_comp_files[ind_file] = experimental_files[filename]
            comparison_s.to_csv(ind_file, index=False)

        outcfg["folding_individual_comparison_files"] = ind_comp_files

    return outcfg


def complex_dock(**kwargs):
    """Protocol: write HADDOCK docking restraint files for inter-
    segment ECs (by probability cutoffs and EC count ramp)."""
    check_required(
        kwargs,
        [
            "prefix", "ec_file",
            "segments", "dock_probability_cutoffs",
            "dock_lowest_count", "dock_highest_count", "dock_increase",
        ],
    )

    prefix = kwargs["prefix"]
    outcfg = {}

    create_prefix_folders(prefix)

    verify_resources(
        "EC file does not exist and/or is empty", kwargs["ec_file"]
    )
    ecs_all = pd.read_csv(kwargs["ec_file"])
    ecs_dock = ecs_all.query("segment_i != segment_j")

    folding_runs = []
    cutoffs = kwargs["dock_probability_cutoffs"]
    if cutoffs is not None and "probability" in ecs_dock.columns:
        if not isinstance(cutoffs, list):
            cutoffs = [cutoffs]
        for c in cutoffs:
            sig_ecs = ecs_dock.query("probability >= @c")
            if len(sig_ecs) > 0:
                folding_runs.append(
                    (sig_ecs,
                     "_significant_ECs_{}_restraints.tbl".format(c))
                )

    flc = kwargs["dock_lowest_count"]
    fhc = kwargs["dock_highest_count"]
    fi = kwargs["dock_increase"]
    if flc is not None and fhc is not None and fi is not None:
        num_sites = (
            len(set(ecs_dock.i.unique()))
            + len(set(ecs_dock.j.unique()))
        )

        def _discrete_count(x):
            if isinstance(x, float):
                x = ceil(x * num_sites)
            return int(x)

        lowest = _discrete_count(flc)
        highest = _discrete_count(fhc)
        step = _discrete_count(fi)

        folding_runs += [
            (ecs_dock.iloc[:c], "_{}_restraints.tbl".format(c))
            for c in range(lowest, highest + 1, step)
        ]

    outcfg["docking_restraint_files"] = []
    for job_ecs, job_suffix in folding_runs:
        job_filename = prefix + job_suffix
        docking_restraints(job_ecs, job_filename, haddock_dist_restraint)
        outcfg["docking_restraint_files"].append(job_filename)

    return outcfg


PROTOCOLS = {
    # standard EVfold protocol
    "standard": standard,
    # create docking restraints for complexes
    "complex_dock": complex_dock,
}


def run(**kwargs):
    """Dispatch to the fold protocol named by kwargs["protocol"]."""
    check_required(kwargs, ["protocol"])

    if kwargs["protocol"] not in PROTOCOLS:
        raise InvalidParameterError(
            "Invalid protocol selection: "
            "{}. Valid protocols are: {}".format(
                kwargs["protocol"], ", ".join(PROTOCOLS.keys())
            )
        )

    return PROTOCOLS[kwargs["protocol"]](**kwargs)
