"""Per-query wall-time profile of the whole registry — the perf
counterpart of check_parity.py.

Runs every registered query (or a named subset) at the given sf dir with
a noop-sink count() and prints one line per query sorted slowest-first.
Use to catch pathological plans that correctness gates can't see:
anything taking >> its family's peers at sf0.1 deserves an
`.explain("formatted")` before the next round.

Usage: python tools/time_queries.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from olympic_athletes_etl_spark.plans import queries
    from olympic_athletes_etl_spark.session import get_spark

    spark = get_spark(app_name="time-queries")
    qs = queries()
    names = [n for n in qs if not only or n in only]
    timings: list[tuple[float, str, int]] = []
    for name in names:
        t0 = time.monotonic()
        try:
            n_rows = qs[name](spark, sf_dir).count()
        except Exception as exc:  # noqa: BLE001 - report and continue
            print(f"ERROR {name}: {exc}")
            continue
        timings.append((time.monotonic() - t0, name, n_rows))
    timings.sort(reverse=True)
    total = sum(t for t, _, _ in timings)
    for t, name, n_rows in timings:
        print(f"{t:8.2f}s  {name:32s} {n_rows} rows")
    print(f"TOTAL {total:.1f}s over {len(timings)} queries at {sf_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
