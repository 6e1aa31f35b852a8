"""Experiment result aggregation.

Counterpart of the reference's post-hoc log scrapers (scripts/read.py:12-80,
read_long.py:23-60): collect JSON result lines from experiment directories
and tabulate mean/std across seeds.  Our CLI emits structured JSON instead
of free-form logs, so aggregation is parsing-free.
"""

from __future__ import annotations

import json
import os
from collections import defaultdict

import numpy as np


def collect_results(root: str, filename: str = "results.json") -> list[dict]:
    """Walk `root` for result files; each may hold a dict or JSON lines."""
    rows = []
    for dirpath, _, files in os.walk(root):
        for f in files:
            if f == filename or f.endswith(".jsonl"):
                path = os.path.join(dirpath, f)
                with open(path) as fh:
                    for line in fh:
                        line = line.strip()
                        if line.startswith("{"):
                            row = json.loads(line)
                            row["_path"] = path
                            rows.append(row)
    return rows


def tabulate(rows: list[dict], group_by: tuple[str, ...] = ("config",),
             metrics: tuple[str, ...] = ("ppl",)) -> str:
    """Mean +- std per group (read.py's seeds aggregation)."""
    groups = defaultdict(list)
    for r in rows:
        key = tuple(str(r.get(g, "-")) for g in group_by)
        groups[key].append(r)

    headers = list(group_by) + [f"{m} (mean±std, n)" for m in metrics]
    widths = [max(len(h), 12) for h in headers]
    lines = ["  ".join(h.ljust(w) for h, w in zip(headers, widths)),
             "  ".join("-" * w for w in widths)]
    for key in sorted(groups):
        cells = list(key)
        for m in metrics:
            vals = [r[m] for r in groups[key] if m in r]
            if vals:
                cells.append(f"{np.mean(vals):.4g}±{np.std(vals):.2g} "
                             f"(n={len(vals)})")
            else:
                cells.append("-")
        lines.append("  ".join(c.ljust(w) for c, w in zip(cells, widths)))
    return "\n".join(lines)


def main(argv=None):
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("root")
    p.add_argument("--group-by", nargs="+", default=["config"])
    p.add_argument("--metrics", nargs="+", default=["ppl"])
    a = p.parse_args(argv)
    rows = collect_results(a.root)
    print(tabulate(rows, tuple(a.group_by), tuple(a.metrics)))


if __name__ == "__main__":
    main()
