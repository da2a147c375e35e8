"""The driver-visible bench records for BASELINE configs #1/#3/#4/#5
(bench.py _family_config_records) must keep producing valid numbers —
this is the CI gate behind BENCH_r04's whole-family evidence
(VERDICT r3 item 6). Runs the actual record functions at their bench
shapes (CPU-feasible; the heavy PLM headline has its own harness)."""

import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)


def test_family_config_records():
    import bench

    records = bench._family_config_records()

    for key in ("mi_apc", "de_scan", "evcomplex", "fold_prep"):
        assert key + "_error" not in records, records.get(
            key + "_error"
        )
        assert records[key + "_value"] > 0
        assert records[key + "_ms"] > 0
        assert records[key + "_unit"]


def test_reweighting_512k_records_shape_guard():
    """The 512k certification runs only on TPU; off-chip it must
    degrade to an explicit skip record, never an exception."""
    import bench

    records = bench._reweighting_512k_records()
    assert isinstance(records, dict) and records
    on_chip = "reweight_512k_rows" in records
    skipped = ("reweight_512k_skipped" in records
               or "reweight_512k_error" in records)
    assert on_chip or skipped
    if on_chip:
        assert records["reweight_512k_pallas_pairs_per_s"] > 0
        assert records["reweight_512k_pallas_hbm_bytes"] < \
            records["reweight_512k_xla_hbm_bytes"]
