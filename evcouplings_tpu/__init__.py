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

# subpackage surface, mirroring the reference's top-level __all__
# (reference evcouplings/__init__.py) plus the TPU-specific packages
__all__ = [
    "align", "compare", "complex", "couplings", "fold", "mutate",
    "visualize", "utils", "ops", "parallel",
]

import os as _os

# Opt-in persistent XLA compilation cache: first TPU compile of the
# PLM fit / reweighting programs takes tens of seconds (minutes over a
# remote-compile tunnel); pointing EVCOUPLINGS_COMPILE_CACHE at a
# directory makes every later pipeline run with the same shapes start
# hot. Applied here (package import) so it precedes the first compile;
# _jax_cache.py is the single implementation (top-level: utils/
# imports back into this module, so it cannot host import-time code).
from evcouplings_tpu._jax_cache import (
    enable_persistent_cache as _enable_persistent_cache,
)

_enable_persistent_cache()

# Explicit backend selection: some environments force-register an
# accelerator plugin in sitecustomize so the JAX_PLATFORMS env var is
# not reliably honored; EVCOUPLINGS_JAX_PLATFORM applies the choice
# through jax.config at package import, which always wins.
_platform = _os.environ.get("EVCOUPLINGS_JAX_PLATFORM")
if _platform:
    import jax as _jax

    _jax.config.update("jax_platforms", _platform)


class BailoutException(Exception):
    """Deliberate early-exit from a pipeline (e.g. no significant couplings).

    Mirrors reference evcouplings/utils/__init__.py:40-43.
    """
