"""
Index mapping for complexes / multi-domain sequences into internal
CouplingsModel numbering.

Parity target: reference evcouplings/couplings/mapping.py:17-415
(Segment, SegmentIndexMapper, segment_map_ecs, MultiSegmentCouplingsModel).
"""

from collections.abc import Iterable
from copy import deepcopy

import numpy as np
import pandas as pd

from evcouplings_tpu.couplings.model import CouplingsModel


class Segment:
    """A continuous stretch of sequence in an alignment (a domain, or one
    monomer of a concatenated complex alignment)."""

    def __init__(self, segment_type, sequence_id, region_start, region_end,
                 positions=None, segment_id="A"):
        self.segment_type = segment_type
        self.sequence_id = sequence_id
        self.region_start = region_start
        self.region_end = region_end
        if positions is not None:
            self.positions = list(map(int, positions))
        else:
            self.positions = None
        self.segment_id = segment_id

    @classmethod
    def from_list(cls, segment):
        """Create from list representation [segment_id, segment_type,
        sequence_id, region_start, region_end, positions] (config format)."""
        (segment_id, segment_type, sequence_id,
         region_start, region_end, positions) = segment
        return cls(
            segment_type, sequence_id, region_start, region_end,
            positions, segment_id
        )

    def to_list(self):
        """List representation for storing in configs."""
        return [
            self.segment_id, self.segment_type, self.sequence_id,
            self.region_start, self.region_end, self.positions,
        ]

    def default_chain_name(self):
        """Default PDB chain identifier (part of segment_id before "_")."""
        return self.segment_id.split("_")[0]


class SegmentIndexMapper:
    """Map per-segment indices into continuous model numbering and back."""

    def __init__(self, focus_mode, first_index, *segments):
        self.segments = deepcopy(segments)

        # build target indices: (segment_id, position) tuples
        self.target_pos = []
        for s in segments:
            if focus_mode:
                # model numbering is continuous in focus mode
                cur_target = range(s.region_start, s.region_end + 1)
            else:
                # non-focus: numbering may be discontinuous, use explicit
                # model positions
                cur_target = s.positions

            self.target_pos += list(zip(
                [s.segment_id] * len(cur_target), cur_target
            ))

        # corresponding continuous model positions (some may not exist in
        # the model if they map to lowercase columns)
        self.model_pos = list(range(
            first_index, first_index + len(self.target_pos)
        ))

        self.target_to_model = dict(zip(self.target_pos, self.model_pos))
        self.model_to_target = dict(zip(self.model_pos, self.target_pos))

    def patch_model(self, model, inplace=True):
        """Renumber a CouplingsModel to segment-based numbering."""
        if not inplace:
            model = deepcopy(model)

        try:
            mapped = [
                self.model_to_target[pos] for pos in model.index_list
            ]
        except KeyError:
            raise ValueError(
                "Mapping from target to model positions does not contain "
                "all positions of internal model numbering"
            )

        model.index_list = mapped
        return model

    def __map(self, indices, mapping_dict):
        if isinstance(indices, Iterable) and not isinstance(indices, tuple):
            return [mapping_dict[x] for x in indices]
        return mapping_dict[indices]

    def __call__(self, segment_id, pos):
        return self.to_model((segment_id, pos))

    def to_target(self, x):
        """Model index (int) -> target index ((segment_id, pos))."""
        return self.__map(x, self.model_to_target)

    def to_model(self, x):
        """Target index ((segment_id, pos)) -> model index (int)."""
        return self.__map(x, self.target_to_model)


def segment_map_ecs(ecs, mapper):
    """Map an EC table's i/j columns from model numbering to segment
    numbering, adding segment_i/segment_j columns."""
    ecs = deepcopy(ecs)

    def _map_column(col):
        seg_col = "segment_" + col
        col_m = pd.DataFrame(
            mapper.to_target(ecs.loc[:, col]),
            columns=[seg_col, col],
        )
        ecs.loc[:, col] = col_m.loc[:, col].values
        ecs.loc[:, seg_col] = col_m.loc[:, seg_col].values

    _map_column("i")
    _map_column("j")
    return ecs


class MultiSegmentCouplingsModel(CouplingsModel):
    """CouplingsModel for concatenated complex alignments: renumbers the
    model with segment-based indices, and can reduce to inter-segment-only
    couplings."""

    def __init__(self, filename, *segments, precision="float32",
                 file_format="plmc_v2", **kwargs):
        super().__init__(filename, precision, file_format, **kwargs)

        if len(segments) == 0:
            raise ValueError(
                "Must provide at least one segment for "
                "MultiSegmentCouplingsModel"
            )

        first_segment = segments[0]
        index_start = first_segment.region_start
        r = SegmentIndexMapper(True, index_start, *segments)
        r.patch_model(model=self)

    def to_inter_segment_model(self):
        """Copy of the model with h_i = 0 and only inter-segment J_ij kept
        (intra-segment couplings zeroed)."""
        h_i = np.zeros((self.L, self.num_symbols))

        # segment id per position; keep J only where segments differ
        seg_ids = np.array([i[0] for i in self.index_list])
        inter = (seg_ids[:, None] != seg_ids[None, :])
        J_ij = np.where(inter[:, :, None, None], self.J_ij, 0.0)

        ci = deepcopy(self)
        ci.h_i = h_i
        ci.J_ij = J_ij
        ci._reset_precomputed()
        return ci
