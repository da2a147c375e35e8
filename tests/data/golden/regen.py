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
    from test_protocols import write_synthetic_a2m

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


if __name__ == "__main__":
    main()
