"""
Provenance gate: no source file may be a transcription of the
reference.

The round-3 review found `fold/protocol.py` at 74% normalized-line
overlap with the reference — functionally complete, but a derivative
transcription that failed the "built from scratch" bar. Round 4
rewrote it (and every other file above ~50%); this test pins the
cleaned state with the same methodology the review used
(tools/overlap_check.py: comment/docstring-stripped, whitespace-
normalized lines >= 8 chars, fraction present verbatim anywhere in the
reference tree).

Thresholds (ratcheted in round 5 per the r4 verdict): files with
>= 30 significant lines must stay under 50% (current worst:
utils/system.py at 44%); tiny files (abstract interfaces, constants)
are exempt — their handful of lines are pure API contract. The
whole-package overlap must stay under 30% (currently 25.8% after the
round-5 trims: visualize/pairs.py 42->24%, align/ena.py 46->15%,
utils/config.py 47->20%, complex/distance.py 46->20%,
complex/alignment.py 48->24%, couplings/protocol.py 45->38%,
visualize/misc.py 46->38%, utils/tracker/__init__.py 46->32%,
utils/system.py 48->44%, utils/pipeline.py 45->44%,
compare/protocol.py 46->43%), so contract-driven residue (config
keys, column schemas, error texts pinned by
tests/test_reference_api_compat.py) cannot quietly grow back into
transcription.
"""

import os
import sys

import pytest

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_REFERENCE = "/root/reference/evcouplings"

sys.path.insert(0, os.path.join(_REPO_ROOT, "tools"))

pytestmark = pytest.mark.skipif(
    not os.path.isdir(_REFERENCE),
    reason="reference tree not available on this machine",
)

_PER_FILE_LIMIT = 0.50
_MIN_SIGNIFICANT_LINES = 30
_PACKAGE_LIMIT = 0.30


def _sweep():
    from pathlib import Path

    from overlap_check import REF_ROOT, normalized_lines

    ref_union = set()
    for ref_file in REF_ROOT.rglob("*.py"):
        ref_union.update(normalized_lines(ref_file))

    results = {}
    for source in Path(_REPO_ROOT, "evcouplings_tpu").rglob("*.py"):
        lines = normalized_lines(source)
        shared = sum(1 for line in lines if line in ref_union)
        results[str(source.relative_to(_REPO_ROOT))] = (shared, len(lines))
    return results


def test_no_file_is_a_transcription():
    offenders = []
    for name, (shared, total) in _sweep().items():
        if total < _MIN_SIGNIFICANT_LINES:
            continue
        ratio = shared / total
        if ratio > _PER_FILE_LIMIT:
            offenders.append(
                "{}: {}/{} = {:.0%}".format(name, shared, total, ratio)
            )
    assert not offenders, (
        "files above the {:.0%} derivative-overlap bar "
        "(rewrite, don't transcribe):\n".format(_PER_FILE_LIMIT)
        + "\n".join(offenders)
    )


def test_package_overlap_bounded():
    shared = total = 0
    for hits, lines in _sweep().values():
        shared += hits
        total += lines
    ratio = shared / total
    assert ratio < _PACKAGE_LIMIT, (
        "package-wide normalized-line overlap {:.1%} exceeds "
        "{:.0%}".format(ratio, _PACKAGE_LIMIT)
    )
