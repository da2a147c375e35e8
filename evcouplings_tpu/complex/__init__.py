"""complex package: star-exports its submodules, mirroring the
reference package __init__ (reference evcouplings/complex/__init__.py)
so reference-style imports like `from evcouplings.complex import ...`
resolve through the compat alias."""

from evcouplings_tpu.complex.protocol import *  # noqa: F401,F403
from evcouplings_tpu.complex.alignment import *  # noqa: F401,F403
from evcouplings_tpu.complex.distance import *  # noqa: F401,F403
from evcouplings_tpu.complex.similarity import *  # noqa: F401,F403
