#!/usr/bin/env python
"""
Judge-style derivative-code detector for this repo.

Measures, for a repo source file, the fraction of its normalized
non-comment/non-docstring lines (>= 8 chars after whitespace removal)
that also appear in a given reference file (or anywhere in the
reference tree), plus the longest contiguous runs of matching lines.

Usage:
  python tools/overlapcheck.py REPO_FILE [REF_FILE]
  python tools/overlapcheck.py --all     # sweep largest non-test sources
"""

import io
import sys
import tokenize
from pathlib import Path

import os

REPO = Path(__file__).resolve().parents[1]
REF = Path(os.environ.get("OVERLAPCHECK_REF", "/root/reference"))


def normalized_lines(path):
    """Source lines with comments/docstrings stripped, whitespace removed,
    keeping only lines >= 8 chars. Returns list of (lineno, norm)."""
    src = Path(path).read_text(errors="replace")
    drop = set()  # line numbers fully attributable to comments/docstrings
    try:
        toks = list(tokenize.generate_tokens(io.StringIO(src).readline))
    except (tokenize.TokenError, IndentationError, SyntaxError):
        toks = []
    prev_significant = None
    for tok in toks:
        ttype, string, start, end, _ = tok
        if ttype == tokenize.COMMENT:
            pass  # comments removed per-line below
        elif ttype == tokenize.STRING:
            # docstring = string expression not assigned/used: previous
            # significant token is NEWLINE/INDENT/DEDENT or None
            if prev_significant in (
                None, tokenize.NEWLINE, tokenize.INDENT,
                tokenize.DEDENT,
            ):
                for ln in range(start[0], end[0] + 1):
                    drop.add(ln)
        if ttype not in (
            tokenize.NL, tokenize.NEWLINE, tokenize.INDENT,
            tokenize.DEDENT, tokenize.COMMENT,
        ):
            prev_significant = ttype

    out = []
    for i, raw in enumerate(src.splitlines(), start=1):
        if i in drop:
            continue
        line = raw.split("#", 1)[0] if "#" in raw else raw
        norm = "".join(line.split())
        if len(norm) >= 8:
            out.append((i, norm))
    return out


def compare(repo_file, ref_file):
    rl = normalized_lines(repo_file)
    ref_set = set(n for _, n in normalized_lines(ref_file))
    if not rl:
        return 0.0, 0, 0, []
    flags = [(ln, n in ref_set) for ln, n in rl]
    matched = sum(1 for _, f in flags if f)
    # contiguous runs of matching lines
    runs, cur, cur_start = [], 0, None
    for ln, f in flags:
        if f:
            if cur == 0:
                cur_start = ln
            cur += 1
        else:
            if cur:
                runs.append((cur, cur_start))
            cur = 0
    if cur:
        runs.append((cur, cur_start))
    runs.sort(reverse=True)
    return matched / len(rl), matched, len(rl), runs[:5]


def best_ref_match(repo_file, ref_files):
    best = (0.0, None, 0, 0, [])
    for rf in ref_files:
        ov, m, t, runs = compare(repo_file, rf)
        if ov > best[0]:
            best = (ov, rf, m, t, runs)
    return best


def main():
    ref_files = [p for p in REF.rglob("*.py") if p.stat().st_size > 500]
    if len(sys.argv) >= 2 and sys.argv[1] != "--all":
        repo_file = Path(sys.argv[1])
        if len(sys.argv) >= 3:
            ov, m, t, runs = compare(repo_file, sys.argv[2])
            rf = sys.argv[2]
        else:
            ov, rf, m, t, runs = best_ref_match(repo_file, ref_files)
        print(f"{repo_file}: {ov:.1%} ({m}/{t}) vs {rf}")
        print(f"  longest runs: {[(r, f'line {s}') for r, s in runs]}")
        return

    srcs = sorted(
        (p for p in (REPO / "evcouplings_tpu").rglob("*.py")
         if "test" not in str(p)),
        key=lambda p: -p.stat().st_size,
    )[:20]
    for p in srcs:
        ov, rf, m, t, runs = best_ref_match(p, ref_files)
        rel = p.relative_to(REPO)
        refrel = Path(rf).relative_to(REF) if rf else "-"
        top = [r for r, _ in runs[:3]]
        print(f"{ov:5.1%}  {m:4d}/{t:4d}  runs{top}  {rel}  <-  {refrel}")


if __name__ == "__main__":
    main()
