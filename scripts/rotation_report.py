#!/usr/bin/env python
"""Driver-verification coverage report: for every registered query,
its latest CORRECTNESS_r*.json status and round, flagging rotation
debt (never driver-checked) and the current window contents.

Usage: python scripts/rotation_report.py [repo_dir]

Pure file inspection — no Spark session; safe to run any time.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys


def main() -> int:
    repo = sys.argv[1] if len(sys.argv) > 1 else \
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    import __spark_entry__ as entry

    qs = list(entry.queries())
    oracles = set(entry.oracle_sql())
    window = set(qs[:50])

    latest: dict[str, tuple[int, str]] = {}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        rnd = int(m.group(1)) if m else -1
        try:
            data = json.load(open(path))
        except (OSError, json.JSONDecodeError):
            continue
        for name, rec in data.items():
            if rec.get("err") == "no_oracle":
                # rows-only by design: the driver records the run with
                # err='no_oracle' and the row count it saw
                status = ("rows-only-ran" if rec.get("spark_rows")
                          is not None else "err")
            elif rec.get("err"):
                status = "err"
            elif rec.get("hash_match"):
                status = "hash-green"
            elif rec.get("rows_match") and name not in oracles:
                status = "rows-only-green"
            elif rec.get("rows_match"):
                status = "rows-green"
            else:
                status = "FAIL"
            prev = latest.get(name)
            if prev is None or rnd >= prev[0]:
                latest[name] = (rnd, status)

    counts: dict[str, int] = {}
    never = []
    print(f"{'query':<34} {'last':>4}  status      window  oracle")
    for name in qs:
        rnd, status = latest.get(name, (0, "NEVER-CHECKED"))
        counts[status] = counts.get(status, 0) + 1
        if status == "NEVER-CHECKED":
            never.append(name)
        print(f"{name:<34} {('r%d' % rnd) if rnd else '-':>4}  "
              f"{status:<11} {'*' if name in window else '':^6}  "
              f"{'value' if name in oracles else 'rows'}")
    print()
    print("summary:", ", ".join(f"{k}={v}" for k, v in sorted(counts.items())))
    nv = [n for n in never if n in oracles]
    print(f"never driver-checked: {len(never)} "
          f"({len(nv)} with value oracles)")
    in_window = [n for n in never if n in window]
    print(f"  of those, in the CURRENT window: {len(in_window)}")
    out_window = [n for n in never if n not in window]
    if out_window:
        print("  NOT covered by the current window:", ", ".join(out_window))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
