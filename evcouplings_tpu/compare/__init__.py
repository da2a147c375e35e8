"""compare package: star-exports its submodules, mirroring the
reference package __init__ (reference evcouplings/compare/__init__.py)
so reference-style imports like `from evcouplings.compare import ...`
resolve through the compat alias."""

from evcouplings_tpu.compare.ecs import *  # noqa: F401,F403
from evcouplings_tpu.compare.distances import *  # noqa: F401,F403
from evcouplings_tpu.compare.mapping import *  # noqa: F401,F403
from evcouplings_tpu.compare.pdb import *  # noqa: F401,F403
from evcouplings_tpu.compare.sifts import *  # noqa: F401,F403
