"""
Shared utilities: config, system helpers, batch submitters, trackers.

Parity target: reference evcouplings/utils/__init__.py
(SubmitterFactory :10-38, BailoutException :40-43).
"""

import abc

# the reference star-exports its submodules from evcouplings.utils
# (reference utils/__init__.py:1-7), so reference-style imports like
# `from evcouplings.utils import read_config_file` must resolve here
from evcouplings_tpu.utils.calculations import *  # noqa: F401,F403
from evcouplings_tpu.utils.config import *  # noqa: F401,F403
from evcouplings_tpu.utils.helpers import *  # noqa: F401,F403
from evcouplings_tpu.utils.system import *  # noqa: F401,F403
from evcouplings_tpu.utils.batch import *  # noqa: F401,F403
from evcouplings_tpu.utils.constants import *  # noqa: F401,F403
from evcouplings_tpu.utils.tracker import *  # noqa: F401,F403

from evcouplings_tpu import BailoutException  # noqa: F401
from evcouplings_tpu.utils.batch import ASubmitter  # noqa: F401
from evcouplings_tpu.utils.helpers import PersistentDict  # noqa: F401


class ASubmitterFactory(abc.ABCMeta):
    def __init__(cls, name, bases, nmspc):
        type.__init__(cls, name, bases, nmspc)

    def __call__(cls, _name, *args, **kwargs):
        try:
            return ASubmitter[str(_name).lower()](**kwargs)
        except KeyError:
            raise ValueError("This submitter is currently not supported")


class SubmitterFactory(metaclass=ASubmitterFactory):
    """Instantiate a registered submitter by name
    (SubmitterFactory("local", ...))."""

    @staticmethod
    def available_methods():
        """Names of all registered submitters."""
        return list(ASubmitter.registry.keys())
