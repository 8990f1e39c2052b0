"""Sources & sinks (SURVEY.md §2.1, S1-S10)."""

from olympic_athletes_etl_spark.sources.html_source import (
    parse_kv_table,
    parse_results_table,
    parse_tables,
    scrape_source,
    tagged_to_tables,
)
from olympic_athletes_etl_spark.sources.io import (
    checkpoint_append,
    compacted_write,
    object_store_conf,
    read_csv,
    read_jsonl,
    read_orc,
    read_parquet,
    read_parquet_glob,
    resume_remaining,
    split_by_tag,
    write_jsonl,
    write_orc,
    write_parquet,
)

__all__ = [
    "checkpoint_append",
    "compacted_write",
    "object_store_conf",
    "parse_kv_table",
    "parse_results_table",
    "parse_tables",
    "read_csv",
    "read_jsonl",
    "read_orc",
    "read_parquet",
    "read_parquet_glob",
    "resume_remaining",
    "scrape_source",
    "split_by_tag",
    "tagged_to_tables",
    "write_jsonl",
    "write_orc",
    "write_parquet",
]
