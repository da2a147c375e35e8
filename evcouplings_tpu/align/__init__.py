"""align package: star-exports its submodules, mirroring the
reference package __init__ (reference evcouplings/align/__init__.py)
so reference-style imports like `from evcouplings.align import ...`
resolve through the compat alias."""

from evcouplings_tpu.align.alignment import *  # noqa: F401,F403
from evcouplings_tpu.align.pfam import *  # noqa: F401,F403
from evcouplings_tpu.align.protocol import *  # noqa: F401,F403
from evcouplings_tpu.align.tools import *  # noqa: F401,F403
from evcouplings_tpu.align.ena import *  # noqa: F401,F403
