"""Command-line entry point — the operational surface a user drives
without writing PySpark:

    python -m olympic_athletes_etl_spark list [--prefix d_]
    python -m olympic_athletes_etl_spark run <query> [--sf-dir D]
        [--limit N] [--explain] [--out PATH]
    python -m olympic_athletes_etl_spark oracle <query>
    python -m olympic_athletes_etl_spark pipeline --gold-dir DIR

``run`` executes any registry query against the parquet tables in
--sf-dir (default $SPARK_GRAFT_SF_DIR or /root/testdata/sf0.001) and
prints the first --limit rows; --out writes the FULL result as parquet
instead (the ad-hoc-extract path). ``pipeline`` runs the bronze->gold
reference pipeline against fixture inputs under --sf-dir conventions.
Session knobs come from session.get_spark ($SPARK_GRAFT_CPUS etc.).
"""

from __future__ import annotations

import argparse
import os
import sys


def _default_sf_dir() -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def _cmd_list(args: argparse.Namespace) -> int:
    from olympic_athletes_etl_spark.plans import oracle_sql, queries

    osql = oracle_sql()
    names = [n for n in queries() if n.startswith(args.prefix)]
    for n in names:
        print(f"{n}\t{'oracle' if n in osql else 'rows-only'}")
    print(f"{len(names)} queries", file=sys.stderr)
    return 0


def _cmd_run(args: argparse.Namespace) -> int:
    from olympic_athletes_etl_spark.plans import queries
    from olympic_athletes_etl_spark.session import get_spark

    qs = queries()
    if args.query not in qs:
        near = [n for n in qs if args.query in n]
        print(
            f"unknown query {args.query!r}"
            + (f"; did you mean: {', '.join(near[:5])}" if near else ""),
            file=sys.stderr,
        )
        return 2
    spark = get_spark(app_name=f"run:{args.query}")
    df = qs[args.query](spark, args.sf_dir)
    if args.explain:
        df.explain("formatted")
    if args.out:
        df.write.mode("overwrite").parquet(args.out)
        print(f"wrote {args.out}", file=sys.stderr)
    else:
        df.show(args.limit, truncate=False)
    return 0


def _cmd_oracle(args: argparse.Namespace) -> int:
    from olympic_athletes_etl_spark.plans import oracle_sql

    sql = oracle_sql().get(args.query)
    if sql is None:
        print(f"no oracle for {args.query!r} (rows-only or unknown)", file=sys.stderr)
        return 2
    print(sql)
    return 0


def _read_any(spark, path: str):
    """CSV (header, inferred types — the bronze convention) or parquet
    by extension; directories are treated as parquet."""
    from olympic_athletes_etl_spark.sources.io import read_csv

    if path.endswith(".csv"):
        return read_csv(spark, path)
    return spark.read.parquet(path)


def _cmd_pipeline(args: argparse.Namespace) -> int:
    from olympic_athletes_etl_spark.etl.pipeline import run_pipeline
    from olympic_athletes_etl_spark.session import get_spark

    spark = get_spark(app_name="pipeline")
    out = run_pipeline(
        _read_any(spark, args.bios),
        _read_any(spark, args.results),
        _read_any(spark, args.editions),
        _read_any(spark, args.iso),
        gold_dir=args.gold_dir,
    )
    for name, df in out.gold.items():
        print(f"gold.{name}: {df.count()} rows", file=sys.stderr)
    print(
        f"validation failure cases: {out.failure_cases.count()}",
        file=sys.stderr,
    )
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="olympic_athletes_etl_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    p_list = sub.add_parser("list", help="list registry queries")
    p_list.add_argument("--prefix", default="", help="filter by name prefix")
    p_list.set_defaults(fn=_cmd_list)

    p_run = sub.add_parser("run", help="run a registry query")
    p_run.add_argument("query")
    p_run.add_argument("--sf-dir", default=_default_sf_dir())
    p_run.add_argument("--limit", type=int, default=20)
    p_run.add_argument("--explain", action="store_true")
    p_run.add_argument("--out", default="", help="write full result as parquet")
    p_run.set_defaults(fn=_cmd_run)

    p_or = sub.add_parser("oracle", help="print a query's DuckDB oracle SQL")
    p_or.add_argument("query")
    p_or.set_defaults(fn=_cmd_oracle)

    p_pipe = sub.add_parser("pipeline", help="run the bronze->gold pipeline")
    p_pipe.add_argument("--bios", required=True, help="raw biodata (.csv/parquet)")
    p_pipe.add_argument("--results", required=True, help="raw results input")
    p_pipe.add_argument("--editions", required=True, help="raw editions input")
    p_pipe.add_argument("--iso", required=True, help="ISO country map input")
    p_pipe.add_argument("--gold-dir", default="", help="publish dir (optional)")
    p_pipe.set_defaults(fn=_cmd_pipeline)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
