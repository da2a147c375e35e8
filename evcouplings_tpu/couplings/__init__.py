from evcouplings_tpu.couplings.model import CouplingsModel  # noqa: F401
from evcouplings_tpu.couplings.mapping import (  # noqa: F401
    Segment, SegmentIndexMapper, segment_map_ecs, MultiSegmentCouplingsModel,
)
