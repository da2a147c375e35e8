"""
Pfam domain identification and family utilities.

Parity target: reference evcouplings/align/pfam.py —
create_family_size_table (:20), remove_clan_overlaps (:67),
pfam_hits (:126).
"""

import gzip

import pandas as pd

from evcouplings_tpu.align.tools import read_hmmer_domtbl, run_hmmscan
from evcouplings_tpu.utils.helpers import range_overlap


def create_family_size_table(full_pfam_file, outfile=None):
    """Parse per-family sequence counts out of the Pfam-A.full.gz
    Stockholm flatfile; returns DataFrame (pfam_id, num_seqs)."""
    data = []

    with gzip.open(full_pfam_file, "rt", encoding="latin-1") as gz_ref:
        pfam_id = None
        num_seqs = None

        for line in gz_ref:
            if line.startswith("#=GF AC"):
                pfam_id = line[10:17]
            elif line.startswith("#=GF SQ"):
                num_seqs = int(line[10:])
            elif (line.startswith("//")
                    and pfam_id is not None and num_seqs is not None):
                data.append({"pfam_id": pfam_id, "num_seqs": num_seqs})
                pfam_id = None
                num_seqs = None

    df = pd.DataFrame(data, columns=["pfam_id", "num_seqs"])

    if outfile is not None:
        df.to_csv(outfile, index=False)
    return df


def remove_clan_overlaps(pfam_table):
    """Remove lower-scoring overlapping hits from the same Pfam clan
    (PfamScan.pl behavior, resolved by domain bitscore)."""
    score = "domain_score"

    grouped = pfam_table.sort_values(
        by=score, ascending=False
    ).groupby(by=["query_name", "clan_id"], as_index=False, sort=False)

    remove_hits = []

    for (query_name, clan_name), grp in grouped:
        # grouping must only ever combine hits of an actual clan
        assert clan_name.startswith("CL")

        for idx1, hit1 in grp.iterrows():
            for idx2, hit2 in grp.iterrows():
                if idx1 >= idx2:
                    continue
                if range_overlap(
                    (int(hit1["ali_from"]), int(hit1["ali_to"]) + 1),
                    (int(hit2["ali_from"]), int(hit2["ali_to"]) + 1),
                ) > 0:
                    if float(hit1[score]) >= float(hit2[score]):
                        remove_hits.append(idx2)
                    else:
                        remove_hits.append(idx1)

    return pfam_table.loc[~pfam_table.index.isin(remove_hits)]


def pfam_hits(query_file, hmm_database, prefix, clan_table_file,
              size_table_file, resolve_overlaps=True, **kwargs):
    """Scan query sequence(s) against the Pfam-A HMM database; returns
    a hit table annotated with clan membership and family sizes,
    optionally with same-clan overlaps resolved."""
    scan_res = run_hmmscan(query_file, hmm_database, prefix, **kwargs)

    hits = read_hmmer_domtbl(scan_res.domtblout)

    # strip version suffix from family accession
    hits = hits.assign(
        pfam_id=hits.target_accession.map(lambda x: x.split(".")[0])
    )

    # clan annotation (Pfam-A.clans.tsv) enables overlap resolution
    if clan_table_file is not None:
        clans = pd.read_csv(
            clan_table_file, sep="\t",
            names=[
                "pfam_id", "clan_id", "clan_name",
                "family_name", "family_text",
            ],
        )
        hits = hits.merge(clans, on="pfam_id", how="left")

    if size_table_file is not None:
        sizes = pd.read_csv(size_table_file)
        hits = hits.merge(sizes, on="pfam_id", how="left")
        hits = hits.assign(
            num_seqs_over_len=(
                hits.num_seqs
                / pd.to_numeric(hits.target_len, errors="raise")
            )
        )

    if resolve_overlaps:
        if clan_table_file is None:
            raise ValueError(
                "Need to specify clan_table_file to resolve "
                "overlapping hits from same clan."
            )
        hits = remove_clan_overlaps(hits)

    return hits
