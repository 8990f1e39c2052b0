"""Merge the two-part r14 sf10 sweep into SWEEP_r14_sf10.json.

Part 1 ran the registry in default order and was killed after 101
queries when s_retrieval_eval's Theta(n^2/50) probe-sample eval stalled
in the straggler tail (see SCALE.md round-14); its per-query statuses
are recovered from the runner log (the r12 partial-record precedent).
Part 2 re-ran the remaining 161 queries through check_parity.py with
s_retrieval_eval reclassified skipped_at_scale and wrote a normal
sweep JSON. This script unions them, records the provenance, and
computes the summary.

Usage: python tools/merge_sf10_sweep.py PART1_LINES PART2_JSON OUT_JSON
"""
from __future__ import annotations

import json
import re
import sys


def main() -> None:
    part1_lines, part2_json, out_json = sys.argv[1:4]
    queries: dict[str, str] = {}
    for line in open(part1_lines):
        m = re.match(r"(ok|cnt|rows|skip|FAIL)\s+(\w+)[:\s]*(.*)", line.strip())
        if not m:
            continue
        tag, name, rest = m.groups()
        if tag == "ok":
            rows = re.search(r"\((\d+) rows\)", rest)
            queries[name] = f"ok:{rows.group(1)}" if rows else "ok"
        elif tag == "cnt":
            rows = re.search(r"(\d+) rows", rest)
            queries[name] = f"count_only_ok:{rows.group(1)}"
        elif tag == "rows":
            rows = re.search(r"(\d+) rows", rest)
            queries[name] = f"rows_only_descaled_oracle:{rows.group(1)}"
        elif tag == "skip":
            queries[name] = "skipped_at_scale"
        else:
            queries[name] = "FAIL (spark error)"
    n1 = len(queries)
    p2 = json.load(open(part2_json))
    for name, status in p2["queries"].items():
        assert name not in queries, f"overlap: {name}"
        queries[name] = status
    fails = sorted(k for k, v in queries.items() if v.startswith("FAIL"))
    out = {
        "sf_dir": "/root/repo/.scratch/sf10",
        "cpus": p2.get("cpus"),
        "shuffle_partitions": p2.get("shuffle_partitions"),
        "n_checked": len(queries),
        "all_green": not fails,
        "fails": fails or None,
        "queries": queries,
        "note": (
            "Two-part r14 sweep: part 1 (101 queries, statuses recovered "
            "from the runner log) was killed when s_retrieval_eval's "
            "Theta(n^2/50) probe-sample eval stalled at sf10; part 2 "
            f"({len(queries) - n1} queries) re-ran the remainder with "
            "s_retrieval_eval reclassified skipped_at_scale. "
            "d_jaccard_histogram's FAIL is the documented shingle-array "
            "pair-shuffle disk-fill class (SCALE.md round-14) - it is the "
            "one engine-side abort; every other row is green/classified."
        ),
        "rows_only_for": p2.get("rows_only_for"),
        "count_only_for": p2.get("count_only_for"),
        "skipped_at_scale": p2.get("skipped_at_scale"),
    }
    json.dump(out, open(out_json, "w"), indent=1)
    from collections import Counter

    print(Counter(v.split(":")[0] for v in queries.values()))
    print("n_checked", len(queries), "all_green", out["all_green"], "fails", fails)


if __name__ == "__main__":
    main()
