"""mutate package: star-exports its submodules, mirroring the
reference package __init__ (reference evcouplings/mutate/__init__.py)
so reference-style imports like `from evcouplings.mutate import ...`
resolve through the compat alias."""

from evcouplings_tpu.mutate.calculations import *  # noqa: F401,F403
from evcouplings_tpu.mutate.protocol import *  # noqa: F401,F403
