"""
evcouplings_tpu — a TPU-native evolutionary-couplings framework.

Predicts protein 3D contacts, mutation effects, complexes, and folded
structures from evolutionary sequence covariation. Capability parity with
EVcouplings (reference: debbiemarkslab/EVcouplings), but the numerical core
(sequence reweighting, frequency counts, pseudolikelihood Potts-model fit,
EC scoring, mean-field DCA, mutation-effect scans) runs in-process as
JAX/XLA/Pallas kernels on TPU instead of shelling out to the external C
binary `plmc` and numba islands.

Artifact contract (EC tables, plmc_v2 `.model` binaries, mutation CSVs,
config/outcfg chaining) is preserved from the reference.
"""

__version__ = "0.1.0"


class BailoutException(Exception):
    """Deliberate early-exit from a pipeline (e.g. no significant couplings).

    Mirrors reference evcouplings/utils/__init__.py:40-43.
    """
