"""Regenerate the machine-readable green-history annotations used by
__spark_entry__._DEFERRED (every driver-green round per query, from
the CORRECTNESS_r*.json artifacts) — the r11 advisory fix: hand-kept
lists omitted rounds, which made the rotation comment's green-count
claims look internally inconsistent.

Usage: python scripts/green_history.py [entry ...]
Prints one annotated line per entry (all registered queries if no
args), ready to paste into _DEFERRED.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.normpath(os.path.join(HERE, ".."))


def green_rounds() -> dict[str, list[int]]:
    greens: dict[str, list[int]] = {}
    for p in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", os.path.basename(p)).group(1))
        with open(p) as f:
            for name, row in json.load(f).items():
                if (row.get("rows_match") and row.get("schema_match")
                        and row.get("hash_match")):
                    greens.setdefault(name, []).append(rnd)
    return greens


def main() -> None:
    sys.path.insert(0, ROOT)
    import __spark_entry__ as e

    greens = green_rounds()
    names = sys.argv[1:] or sorted(e.queries())
    for n in names:
        g = " ".join(f"r{r}" for r in greens.get(n, []))
        pad = " " * max(1, 34 - len(n))
        print(f'    "{n}",{pad}# {g or "never driver-green"}')


if __name__ == "__main__":
    main()
