"""
Sequence-identifier extraction from alignment headers.

Parity target: reference evcouplings/align/ids.py (retrieve_sequence_ids
:26, default UniProt/UniRef regex list :12-24).
"""

import re
from collections import defaultdict

from evcouplings_tpu.align.alignment import read_fasta

ID_EXTRACTION_REGEX = [
    # example: >UniRef100_H6SNJ6/11-331
    r"^Uni\w+\_(\w+).*/",
    # example: >tr|Q1NYN0|Q1NYN0_9FLAO/...
    r"^\w+\|(\w+)\|\w+\/",
    # example: >NQO8_THET8/1-365
    r"^(\w+).*/.*$",
    # example: >Q60019|NQO8_THET8/1-365
    r"^\w+\|\w+\|(\w+)",
]


def retrieve_sequence_ids(fileobj, regex=None):
    """Extract database identifiers from all FASTA headers.

    The FIRST matching regular expression wins per header. Returns
    (list of ids, {id: [full headers]}).
    """
    if regex is None:
        regex = ID_EXTRACTION_REGEX

    sequence_ids = []
    id_to_full_header = defaultdict(list)

    for current_id, _ in read_fasta(fileobj):
        for pattern in regex:
            m = re.match(pattern, current_id)
            if m and len(m.groups()) > 0:
                sequence_ids.append(m.group(1))
                id_to_full_header[m.group(1)].append(current_id)
                break

    return sequence_ids, id_to_full_header
