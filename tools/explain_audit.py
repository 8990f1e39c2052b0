"""Physical-plan audit: the scale feedback loop.

For each registered query (or a named subset) prints one line of plan
vitals — shuffle count, join strategies, scan pushdown, codegen spans,
Python-boundary operators — then the offenders in detail with
``--verbose``. Review rule (SURVEY.md §4): joins against dims should be
broadcast, filters should reach the parquet scan, and anything Python
(ArrowEvalPython / MapInPandas / BatchEvalPython) should be off the
hot path unless it IS the operator under test.

Usage: python tools/explain_audit.py [sf_dir] [query ...] [--verbose]
"""

from __future__ import annotations

import io
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# calibrated against Spark 4 "formatted" output with AQE (operators show
# as tree nodes like "+- Exchange (28)"; BroadcastExchange is NOT a
# shuffle; codegen ids are absent in the AQE initial plan)
MARKERS = {
    "shuffles": r"[+:]- Exchange \(\d+\)",
    "bhj": r"BroadcastHashJoin",
    "smj": r"SortMergeJoin",
    "bnlj": r"BroadcastNestedLoopJoin",
    "scans": r"Scan parquet",
    "python": r"ArrowEvalPython|BatchEvalPython|MapInPandas|FlatMapGroupsInPandas|MapPartitionsInRWithArrow|PythonMapInArrow",
    "window": r"[+:]- Window(?:GroupLimit)? \(\d+\)",
    "pushed": r"PushedFilters: \[[^\]]",
}


def plan_text(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def audit(name: str, df, verbose: bool) -> str:
    txt = plan_text(df)
    counts = {k: len(re.findall(pat, txt)) for k, pat in MARKERS.items()}
    flags = []
    if counts["smj"] and not counts["bhj"]:
        flags.append("SMJ-only")
    if counts["python"]:
        flags.append("python-path")
    line = (
        f"{name:32s} shuffles={counts['shuffles']:2d} bhj={counts['bhj']} "
        f"smj={counts['smj']} bnlj={counts['bnlj']} "
        f"scans={counts['scans']} pushed={counts['pushed']} "
        f"win={counts['window']} "
        f"{' '.join('[' + f + ']' for f in flags)}"
    )
    if verbose:
        line += "\n" + txt
    return line


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--verbose"]
    verbose = "--verbose" in sys.argv
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    only = set(args[1:])

    from olympic_athletes_etl_spark.plans import queries
    from olympic_athletes_etl_spark.session import get_spark

    spark = get_spark(app_name="explain-audit")
    for name, fn in sorted(queries().items()):
        if only and name not in only:
            continue
        try:
            print(audit(name, fn(spark, sf_dir), verbose))
        except Exception as exc:  # noqa: BLE001
            print(f"{name:32s} EXPLAIN FAILED: {exc}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
