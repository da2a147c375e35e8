"""visualize package: star-exports its submodules, mirroring the
reference package __init__ (reference evcouplings/visualize/__init__.py)
so reference-style imports like `from evcouplings.visualize import ...`
resolve through the compat alias."""

from evcouplings_tpu.visualize.parameters import *  # noqa: F401,F403
from evcouplings_tpu.visualize.pairs import *  # noqa: F401,F403
from evcouplings_tpu.visualize.mutations import *  # noqa: F401,F403
from evcouplings_tpu.visualize.misc import *  # noqa: F401,F403
from evcouplings_tpu.visualize.pymol import *  # noqa: F401,F403
