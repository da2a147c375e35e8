"""fold package: star-exports its submodules, mirroring the
reference package __init__ (reference evcouplings/fold/__init__.py)
so reference-style imports like `from evcouplings.fold import ...`
resolve through the compat alias."""

from evcouplings_tpu.fold.tools import *  # noqa: F401,F403
from evcouplings_tpu.fold.cns import *  # noqa: F401,F403
from evcouplings_tpu.fold.filter import *  # noqa: F401,F403
from evcouplings_tpu.fold.restraints import *  # noqa: F401,F403
from evcouplings_tpu.fold.protocol import *  # noqa: F401,F403
from evcouplings_tpu.fold.ranking import *  # noqa: F401,F403
