"""Local mirror of the driver's t2 correctness gate.

Runs every registered query on a given sf dir with Spark AND its DuckDB
oracle, then compares: row count, sorted column names, and an
order-insensitive value multiset (columns sorted by name — the driver's
documented compare). Exits non-zero listing mismatches.

Usage: python tools/check_parity.py [sf_dir] [query ...] [--json OUT]

``--json OUT`` additionally writes a machine-readable sweep record
(sf_dir, cpu/shuffle-partition layout, per-query status, all_green) —
the end-of-round sweeps commit these as SWEEP_r{N}_*.json evidence.

Two sweeps beyond the driver's gate are worth repeating each round
(both caught/confirmed real properties in round 5):
  - scale-up:      python tools/check_parity.py /root/testdata/sf0.1
    (found a_gini_spend's BIGINT overflow that sf0.01 could not)
  - layout-perturb: SPARK_GRAFT_CPUS=13 python tools/check_parity.py
    (13 shuffle partitions — proves partition-layout invariance of
    every registered result)
"""

from __future__ import annotations

import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def _canon(v: object) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    if isinstance(v, int):
        return str(v)
    return str(v)


def _run_full_plan(df) -> int:
    """Execute the WHOLE plan (noop sink, as bench.py forces work) and
    return the row count, observed on the stream feeding the sink.

    ``.count()`` lets Catalyst prune the output projection under the
    aggregate, so "the engine side runs at this scale" would be weaker
    evidence than a real run (r12 ADVICE). ``observe`` computes the
    count over the exact rows the sink receives — one pass, no driver
    round-trip, no prunable shortcut.
    """
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    obs = Observation()
    df.observe(obs, F.count(F.lit(1)).alias("n")).write.format(
        "noop"
    ).mode("overwrite").save()
    return obs.get["n"]


def _multiset(rows: list[tuple], names: list[str]) -> Counter:
    order = sorted(range(len(names)), key=lambda i: names[i])
    return Counter(tuple(_canon(r[i]) for i in order) for r in rows)


def main() -> int:
    argv = sys.argv[1:]
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        if i + 1 >= len(argv):
            print("usage: check_parity.py [sf_dir] [query ...] [--json OUT]",
                  file=sys.stderr)
            return 2
        json_out = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    # --rows-only-for a,b,c: run the SPARK side of the named queries and
    # record their row counts, but skip their DuckDB oracle. For
    # out-of-gate scale-up sweeps where the ORACLE (an unrolled-CTE /
    # recompute-from-scratch SQL) is the thing that does not scale, not
    # the engine — the value-hash gate for those queries stands at the
    # largest feasible oracle scale (recorded in the sweep JSON).
    rows_only_for: set[str] = set()
    if "--rows-only-for" in argv:
        i = argv.index("--rows-only-for")
        if i + 1 >= len(argv):
            print("usage: check_parity.py [sf_dir] [query ...] "
                  "[--rows-only-for a,b,c] [--skip a,b,c] [--json OUT]",
                  file=sys.stderr)
            return 2
        rows_only_for = set(argv[i + 1].split(","))
        argv = argv[:i] + argv[i + 2:]
    # --skip a,b,c: do not run the named queries AT ALL, recording a
    # skipped_at_scale status. For scale-up sweeps where the SPARK side
    # of an exact pairwise yardstick is itself super-linear on the sweep
    # corpus (e.g. exact shingle-join dedup on a tiny-vocabulary
    # synthetic corpus, where mid-frequency shingles have huge absolute
    # df) — the banded/bucketed production forms of the same operators
    # run and are hash-gated; the skips are the documented quadratic
    # yardsticks.
    skip: set[str] = set()
    if "--skip" in argv:
        i = argv.index("--skip")
        if i + 1 >= len(argv):
            print("usage: check_parity.py [sf_dir] [query ...] "
                  "[--rows-only-for a,b,c] [--skip a,b,c] [--json OUT]",
                  file=sys.stderr)
            return 2
        skip = set(argv[i + 1].split(","))
        argv = argv[:i] + argv[i + 2:]
    # --count-only-for a,b,c: run BOTH engines but compare row counts
    # only (Spark via observe()+noop-sink — the full plan executes —
    # and the oracle wrapped in SELECT count(*)).
    # For scale-up sweeps where the OUTPUT is data-proportional (pair
    # lists, per-lineitem projections — 10M-150M rows at sf10): the
    # bottleneck is the driver/Python round-trip of the collect-based
    # value compare, not either engine. The VALUE gate for these stands
    # at the largest collectable scale (sf1 collected up to 15M rows);
    # a scale bug still fails loudly here (ANSI overflow errors, count
    # divergence). The observe()+noop-sink run means the whole plan
    # executes (nothing prunable) — still, this records engine-runs +
    # cardinality parity, not value parity, and the sweep JSON says so.
    count_only: set[str] = set()
    if "--count-only-for" in argv:
        i = argv.index("--count-only-for")
        if i + 1 >= len(argv):
            print("usage: check_parity.py [sf_dir] [query ...] "
                  "[--count-only-for a,b,c] [--json OUT]",
                  file=sys.stderr)
            return 2
        count_only = set(argv[i + 1].split(","))
        argv = argv[:i] + argv[i + 2:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.001"
    only = set(argv[1:])

    from olympic_athletes_etl_spark.plans import oracle_sql, queries
    from olympic_athletes_etl_spark.session import get_spark

    # A typo'd name in --rows-only-for/--skip would be SILENTLY ignored
    # while the real query runs with its full oracle — at sf1+ that is
    # the disk-filling/quadratic failure these flags exist to prevent.
    # Fail fast on any name not in the registry (r12 ADVICE fix).
    _unknown = (rows_only_for | skip | count_only | only) - set(queries())
    if _unknown:
        print(
            "unknown query name(s): " + ", ".join(sorted(_unknown)),
            file=sys.stderr,
        )
        return 2

    spark = get_spark(app_name="parity-check")
    con = duckdb.connect()
    # OPT-IN oracle resource bound (SPARK_GRAFT_ORACLE_CAPS=1): for
    # scale-up sweeps, a runaway unrolled-CTE oracle should fail fast,
    # not fill the disk with spill files. OFF by default — the standard
    # sf0.1 gate has oracles (g_kcore) that legitimately spill more.
    if os.environ.get("SPARK_GRAFT_ORACLE_CAPS"):
        # Budgets are overridable for dedicated single-query passes
        # (e.g. the sf10 BPE-encode oracles OOM at 24GB but fit a
        # bigger budget when the Spark driver heap is dialed down).
        mem = os.environ.get("SPARK_GRAFT_ORACLE_MEM", "24GB")
        spill = os.environ.get("SPARK_GRAFT_ORACLE_SPILL", "40GB")
        for pragma in (
            f"SET memory_limit='{mem}'",
            f"SET max_temp_directory_size='{spill}'",
        ):
            try:
                con.execute(pragma)
            except duckdb.Error:
                pass
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, oracles = queries(), oracle_sql()
    failures: list[str] = []
    statuses: dict[str, str] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name in skip:
            print(f"skip  {name} (documented quadratic yardstick at this scale)")
            statuses[name] = "skipped_at_scale"
            continue
        if name in count_only:
            try:
                s_n = _run_full_plan(fn(spark, sf_dir))
            except Exception as e:  # noqa: BLE001
                failures.append(
                    f"{name}: SPARK ERROR {type(e).__name__}: {str(e)[:400]}"
                )
                print(f"FAIL  {name} (spark error)")
                statuses[name] = "spark_error"
                continue
            try:
                d_n = con.execute(
                    f"SELECT count(*) FROM ({oracles[name]}) AS _t"
                ).fetchone()[0]
            except Exception as e:  # noqa: BLE001
                failures.append(
                    f"{name}: ORACLE ERROR {type(e).__name__}: {str(e)[:400]}"
                )
                print(f"FAIL  {name} (oracle error)")
                statuses[name] = "oracle_error"
                continue
            if s_n != d_n:
                failures.append(
                    f"{name}: rowcount spark={s_n} duckdb={d_n} (count-only)"
                )
                print(f"FAIL  {name} (count mismatch)")
                statuses[name] = f"mismatch: rowcount {s_n} vs {d_n}"
            else:
                print(f"cnt   {name}: {s_n} rows (count-only at this scale)")
                statuses[name] = f"count_only_at_scale:{s_n}"
            continue
        if name in rows_only_for:
            # Spark side runs via observe()+noop-sink write — the FULL
            # plan executes (a bare .count() could let Catalyst prune
            # projection work under the aggregate; r12 ADVICE), but the
            # row OBJECTS never round-trip to the Python driver: at
            # sweep scales a quadratic candidate set (e.g. cross-replica
            # near-dup pairs under K-fold replication) can be
            # driver-memory-sized even when the engine handles it fine.
            try:
                s_n = _run_full_plan(fn(spark, sf_dir))
            except Exception as e:  # noqa: BLE001
                failures.append(
                    f"{name}: SPARK ERROR {type(e).__name__}: {str(e)[:400]}"
                )
                print(f"FAIL  {name} (spark error)")
                statuses[name] = "spark_error"
                continue
            print(f"rows  {name}: {s_n} rows (oracle descaled — rows-only)")
            statuses[name] = f"rows_only_descaled_oracle:{s_n}"
            continue
        try:
            sdf = fn(spark, sf_dir)
            s_names = list(sdf.columns)
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            failures.append(f"{name}: SPARK ERROR {type(e).__name__}: {str(e)[:400]}")
            print(f"FAIL  {name} (spark error)")
            statuses[name] = "spark_error"
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(s_rows)} rows (no oracle — rows-only)")
            statuses[name] = f"rows_only:{len(s_rows)}"
            continue
        try:
            res = con.execute(oracles[name])
            d_names = [d[0] for d in res.description]
            d_rows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append(f"{name}: ORACLE ERROR {type(e).__name__}: {str(e)[:400]}")
            print(f"FAIL  {name} (oracle error)")
            statuses[name] = "oracle_error"
            continue
        problems = []
        if len(s_rows) != len(d_rows):
            problems.append(f"rowcount spark={len(s_rows)} duckdb={len(d_rows)}")
        if sorted(s_names) != sorted(d_names):
            problems.append(f"columns spark={sorted(s_names)} duckdb={sorted(d_names)}")
        if not problems:
            ms, md = _multiset(s_rows, s_names), _multiset(d_rows, d_names)
            if ms != md:
                diff_s = list((ms - md).items())[:3]
                diff_d = list((md - ms).items())[:3]
                problems.append(f"values spark-only={diff_s} duckdb-only={diff_d}")
        if problems:
            failures.append(f"{name}: " + "; ".join(problems))
            print(f"FAIL  {name}")
            statuses[name] = "mismatch: " + "; ".join(problems)[:300]
        else:
            print(f"ok    {name} ({len(s_rows)} rows)")
            statuses[name] = f"ok:{len(s_rows)}"

    if json_out:
        import json as _json

        record = {
            "sf_dir": sf_dir,
            "cpus": os.environ.get("SPARK_GRAFT_CPUS"),
            "shuffle_partitions": spark.conf.get("spark.sql.shuffle.partitions"),
            "n_checked": len(statuses),
            "all_green": not failures,
            "rows_only_for": sorted(rows_only_for) or None,
            "count_only_for": sorted(count_only) or None,
            "skipped_at_scale": sorted(skip) or None,
            "queries": statuses,
        }
        with open(json_out, "w") as fh:
            _json.dump(record, fh, indent=0)
        print(f"sweep record -> {json_out}")

    print()
    if failures:
        print(f"{len(failures)} FAILURES:")
        for f in failures:
            print(" -", f)
        return 1
    print(f"all green ({len([n for n in qs if not only or n in only])} queries)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
