"""couplings package: star-exports its submodules, mirroring the
reference package __init__ (reference evcouplings/couplings/__init__.py)
so reference-style imports like `from evcouplings.couplings import ...`
resolve through the compat alias."""

from evcouplings_tpu.couplings.mapping import *  # noqa: F401,F403
from evcouplings_tpu.couplings.model import *  # noqa: F401,F403
from evcouplings_tpu.couplings.pairs import *  # noqa: F401,F403
from evcouplings_tpu.couplings.tools import *  # noqa: F401,F403
from evcouplings_tpu.couplings.mean_field import *  # noqa: F401,F403
