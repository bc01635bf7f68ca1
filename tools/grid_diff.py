"""Mechanical diff of two bench-grid artifacts (BENCH_GRID_r*.json).

Prints one line per (mode, metric) present in either grid: old value,
new value, and the ratio — the round-over-round regression check the
per-round grid exists for (bench.bench_grid).  Error rows and modes
missing on one side are listed explicitly instead of silently dropped.

Run: python tools/grid_diff.py OLD.json NEW.json
"""

from __future__ import annotations

import json
import sys


def _index(path):
    with open(path) as f:
        grid = json.load(f)["grid"]
    vals, errors = {}, {}
    for entry in grid:
        mode = entry["mode"]
        if "error" in entry:
            errors[mode] = entry["error"]
            continue
        for row in entry["rows"]:
            if "metric" in row and isinstance(row.get("value"), (int, float)):
                vals[(mode, row["metric"])] = row["value"]
    return vals, errors


def main(old_path, new_path):
    old, old_err = _index(old_path)
    new, new_err = _index(new_path)
    keys = sorted(set(old) | set(new))
    print("%-16s %-44s %12s %12s %8s" % ("mode", "metric", "old", "new", "ratio"))
    for k in keys:
        a, b = old.get(k), new.get(k)
        if a is None or b is None:
            print("%-16s %-44s %12s %12s %8s" % (
                k[0], k[1],
                "-" if a is None else a, "-" if b is None else b, "-"))
            continue
        ratio = (b / a) if a else float("inf")
        print("%-16s %-44s %12.2f %12.2f %7.3fx" % (k[0], k[1], a, b, ratio))
    for tag, errs in (("old", old_err), ("new", new_err)):
        for mode, msg in errs.items():
            print("ERROR[%s] %s: %s" % (tag, mode, msg[:120]))


if __name__ == "__main__":
    if len(sys.argv) != 3:
        raise SystemExit(__doc__)
    main(sys.argv[1], sys.argv[2])
