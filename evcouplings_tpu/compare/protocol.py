"""
Compare stage protocols (placeholder — full implementation in progress;
see reference evcouplings/compare/protocol.py for the parity target).
"""

from evcouplings_tpu.utils.config import check_required, InvalidParameterError

PROTOCOLS = {}


def run(**kwargs):
    """Dispatch to the compare protocol named by kwargs["protocol"]."""
    check_required(kwargs, ["protocol"])
    if kwargs["protocol"] not in PROTOCOLS:
        raise InvalidParameterError(
            "Invalid protocol selection: "
            "{}. Valid protocols are: {}".format(
                kwargs["protocol"], ", ".join(PROTOCOLS.keys())
            )
        )
    return PROTOCOLS[kwargs["protocol"]](**kwargs)
