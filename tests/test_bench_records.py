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

    # the MI+APC record must carry the kernel/rescore split (VERDICT
    # r4 item 4) and the parts must sum to the total
    assert records["mi_apc_kernel_ms"] > 0
    assert records["mi_apc_rescore_ms"] > 0
    assert abs(
        records["mi_apc_kernel_ms"] + records["mi_apc_rescore_ms"]
        - records["mi_apc_ms"]
    ) < 0.05


def test_pipeline_e2e_record():
    """The full-pipeline wall-clock record (VERDICT r4 item 6) must
    run the real 4-stage chain and produce the per-stage split.
    CPU-feasible at a reduced shape."""
    import bench

    records = bench._bench_pipeline_e2e(n_rows=300, l_cols=48)
    assert records["pipeline_e2e_s"] > 0
    stage_sum = sum(
        records["pipeline_{}_s".format(s)]
        for s in ("align", "couplings", "compare", "mutate")
    )
    assert 0 < stage_sum <= records["pipeline_e2e_s"] + 0.05
    # the warm rerun (persistent compile cache, fresh workdir) must
    # also complete and carry its couplings split
    assert records["pipeline_e2e_warm_s"] > 0
    assert records["pipeline_couplings_warm_s"] > 0


def test_family_fit_record():
    """The real-family bench record (VERDICT r4 item 8) must produce
    agreement stats or an explicit skip. Reduced shape for CPU CI."""
    import os

    import bench

    if not os.path.isfile(bench.REAL_FAMILY_A2M):
        assert "family_fit_skipped" in bench._bench_family_fit()
        return

    records = bench._bench_family_fit(l_cols=60, iterations=60)
    assert records["family_fit_rows"] > 40
    assert 1 < records["family_fit_n_eff"] < records["family_fit_rows"]
    # the two parametrizations must broadly agree on real data even
    # at this reduced depth
    assert records["family_fit_estimator_spearman"] > 0.7
    assert 0 < records["family_fit_top_half_overlap"] <= 1


def test_mfu_records():
    """The MFU/roofline record (VERDICT r4 item 1) must be present and
    internally consistent. Runs the pure-arithmetic record assembly
    with the v5e peak so the gate is CPU-feasible."""
    import bench

    peak = bench.device_peak(kind="TPU v5 lite")
    assert peak["bf16_peak_flops"] == 197e12

    # longest-prefix matching: v5p ("TPU v5") must not claim v5e
    assert bench.device_peak(kind="TPU v5p")["bf16_peak_flops"] == 459e12
    assert bench.device_peak(kind="Host CPU") is None

    # FLOP model: 4*Lq*Lq_aug + 4*L*Lq per row, checked at L=160, q=21
    # (Lq = 3360, Lq_aug = 3456)
    assert bench.plm_flops_per_seq_site(160, 21) == 4 * 21 * 3456 + 4 * 3360

    records = bench._mfu_records(475.8e6, 184.8e6, 144.5e6, peak=peak)
    for key in ("mfu_production", "mfu_parity", "mfu_production_tflops",
                "mfu_parity_tflops", "mfu_peak_tflops_bf16",
                "mfu_ai_flop_per_byte", "mfu_ridge_flop_per_byte",
                "parity_mxu_duty"):
        assert key in records, key
    # the r4 measured throughputs sit at ~73% / ~28% of v5e peak; the
    # record must land in a physical range (0, 1]
    assert 0.5 < records["mfu_production"] <= 1.0
    assert 0.2 < records["mfu_parity"] <= 1.0
    assert records["parity_mxu_duty"] == round(
        3 * records["mfu_parity"], 3
    )
    # large-L record shares the FLOP model at L=512 (~70% of peak at
    # the r4 measured rate)
    assert 0.5 < records["mfu_large_l"] <= 1.0
    # compute-bound: arithmetic intensity must clear the HBM ridge
    assert records["mfu_ai_flop_per_byte"] > records[
        "mfu_ridge_flop_per_byte"
    ]

    # off-TPU the record degrades to an explicit skip, never a throw
    assert bench._mfu_records(1e6, 1e6, peak=None) == {
        "mfu_skipped": "unknown device kind"
    }


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
