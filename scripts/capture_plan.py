#!/usr/bin/env python
"""Capture .explain("formatted") for named queries to plans/<tag>/<q>_<suffix>.txt.

Usage: python scripts/capture_plan.py <suffix> <query> [query ...]
       (suffix is e.g. "before" or "after"; tag defaults to r14)

The plan is captured from the SAME builder the bench times (plan-build
only — no execution), so the committed files are the honest record of
plan shape (Exchange count, join strategy, PushedFilters, ReadSchema,
Python-eval nodes) that OPTIMIZATION_r14.md claims are checked against.
Queries that run streaming drains or side-effecting builds inside the
builder DO execute those side effects here; the captured plan is the
final returned DataFrame's plan.
"""
from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from wrangle_pypes_spark.session import get_session


def main() -> None:
    tag = os.environ.get("SPARK_GRAFT_PLAN_TAG", "r14")
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_session(cpus=cpus)
    outdir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", tag)
    os.makedirs(outdir, exist_ok=True)
    qs = entrymod.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
