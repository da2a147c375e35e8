"""Regenerate the golden parity-fit fixture.

Run ONLY for a deliberate, understood numerics change (the point of
the fixture is to make accidental drift fail tests/
test_golden_regression.py):

    EVCOUPLINGS_JAX_PLATFORM=cpu python tests/data/golden/regen.py
"""

import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.abspath(os.path.join(HERE, "..", "..", ".."))
sys.path.insert(0, os.path.join(REPO, "tests"))


def main():
    from test_protocols import write_synthetic_a2m, write_synthetic_a2m_gappy

    from evcouplings_tpu.couplings.fitter import run_plm

    write_synthetic_a2m(os.path.join(HERE, "golden.a2m"))
    res = run_plm(
        os.path.join(HERE, "golden.a2m"),
        os.path.join(HERE, "golden_ECs.txt"),
        os.path.join(HERE, "golden.model"),
        focus_seq="TARGET_SEQ/11-28",
        theta=0.8, iterations=40, lambda_h=0.01, lambda_J=16.15,
        solver="lbfgs", compute_dtype="float32",
        matmul_precision="highest",
    )
    print("regenerated golden fixture:", res.optimization_status)

    # fixture 2: heavy gaps + focus mode + ignore_gaps (plmc -g) +
    # group-L1 (plmc -lg) through the full fitter — pins the smoothed
    # group-L1 handling (ops/plm.py +1e-12) at fit level
    write_synthetic_a2m_gappy(os.path.join(HERE, "golden2.a2m"))
    res2 = run_plm(
        os.path.join(HERE, "golden2.a2m"),
        os.path.join(HERE, "golden2_ECs.txt"),
        os.path.join(HERE, "golden2.model"),
        focus_seq="TARGET_SEQ/21-36",
        theta=0.8, ignore_gaps=True, iterations=40,
        lambda_h=0.01, lambda_J=12.3, lambda_g=0.25,
        solver="lbfgs", compute_dtype="float32",
        matmul_precision="highest",
    )
    print("regenerated golden2 fixture:", res2.optimization_status)

    # fixture 3: the ASYMMETRIC site-sharded path (the production
    # fallback of parametrization "auto" for large L) on the same
    # alignment as fixture 1 — per-site LBFGS, f32/highest, fixed
    # iterations; pins that path's numerics across toolchains
    res3 = run_plm(
        os.path.join(HERE, "golden.a2m"),
        os.path.join(HERE, "golden3_ECs.txt"),
        os.path.join(HERE, "golden3.model"),
        focus_seq="TARGET_SEQ/11-28",
        theta=0.8, iterations=25, lambda_h=0.01, lambda_J=16.15,
        parametrization="asymmetric", solver="lbfgs",
        compute_dtype="float32", matmul_precision="highest",
    )
    print("regenerated golden3 fixture:", res3.optimization_status)


if __name__ == "__main__":
    main()
