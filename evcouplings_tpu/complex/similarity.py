"""
Species-similarity-based concatenation helpers: per-species best hits,
paralog detection, and best-reciprocal filtering.

Parity target: reference evcouplings/complex/similarity.py —
read_species_annotation_table (:18), most_similar_by_organism (:70),
find_paralogs (:103), filter_best_reciprocal (:149). The paralog
identity matrix runs on the accelerator identity kernel.
"""

import numpy as np
import pandas as pd

from evcouplings_tpu.align.alignment import Alignment, parse_header
from evcouplings_tpu.utils.config import InvalidParameterError

SPECIES_ANNOTATION_COLUMNS = ["OS", "Tax"]


def read_species_annotation_table(annotation_file):
    """Load annotation.csv and derive a "species" column from whichever
    of OS (UniProt) / Tax (UniRef) is better populated."""
    data = pd.read_csv(annotation_file, dtype=str)

    annotation_column = None
    current_num_annotations = 0

    for column in SPECIES_ANNOTATION_COLUMNS:
        if column not in data:
            continue
        num_annotations = sum(data[column].notnull())
        if num_annotations > current_num_annotations:
            annotation_column = column
            current_num_annotations = num_annotations

    if annotation_column is None:
        raise InvalidParameterError(
            "provided annotation file {} has no annotation "
            "information".format(annotation_file)
        )

    data = data.assign(species=data.loc[:, annotation_column])
    return data[["id", "name", "species"]]


def most_similar_by_organism(similarities, id_to_organism):
    """Per species, the sequence most similar to the target.

    similarities: identities.csv contents; id_to_organism:
    annotation table with species column. Returns rows with columns
    id, species, identity_to_query.
    """
    data = similarities.merge(id_to_organism, on="id")

    most_similar_in_species = (
        data.sort_values(by="identity_to_query").groupby("species").last()
    )
    most_similar_in_species["species"] = most_similar_in_species.index
    return most_similar_in_species.reset_index(drop=True)


def find_paralogs(target_id, id_to_organism, similarities,
                  identity_threshold):
    """Sequences from the target's own species that are diverged below
    the identity threshold (putative paralogs)."""
    base_query_id, _, _ = parse_header(target_id)

    annotation_data = similarities.merge(id_to_organism, on="id")
    contains_annotation = [
        base_query_id in x for x in annotation_data.id
    ]
    query_hits = annotation_data.loc[contains_annotation, :]
    query_species = list(query_hits.species.dropna())

    paralogs = annotation_data.query("species == @query_species")
    paralogs = paralogs.query("identity_to_query < @identity_threshold")
    return paralogs


def filter_best_reciprocal(alignment, paralogs, most_similar_in_species,
                           allowed_error=0.02):
    """Keep only per-species best hits that are best reciprocal hits:
    not closer to any paralog than to the query (within allowed_error)."""
    ali = Alignment.from_path(alignment, "fasta")

    # paralog x sequence identity matrix (accelerator kernel per row)
    identity_mat = np.zeros((len(paralogs), len(ali.ids)), dtype=float)
    for idx, paralog_id in enumerate(paralogs.id):
        identity_mat[idx, :] = ali.identities_to(
            ali[ali.id_to_index[paralog_id]]
        )

    indices_to_keep = []
    for index, row in most_similar_in_species.iterrows():
        alignment_index = ali.id_to_index[row.id]
        if np.all(
            identity_mat[:, alignment_index]
            < row.identity_to_query + allowed_error
        ):
            indices_to_keep.append(index)

    return most_similar_in_species.loc[indices_to_keep, :]
