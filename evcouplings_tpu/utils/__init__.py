"""
Shared utilities: config, system helpers, batch submitters, trackers.

Parity target: reference evcouplings/utils/__init__.py
(SubmitterFactory :10-38, BailoutException :40-43).
"""

import abc

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
