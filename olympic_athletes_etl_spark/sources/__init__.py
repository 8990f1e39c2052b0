"""Sources & sinks (SURVEY.md §2.1, S1-S10)."""

from olympic_athletes_etl_spark.sources.io import (
    checkpoint_append,
    compacted_write,
    read_csv,
    read_parquet,
    read_parquet_glob,
    resume_remaining,
    split_by_tag,
    write_parquet,
)

__all__ = [
    "checkpoint_append",
    "compacted_write",
    "read_csv",
    "read_parquet",
    "read_parquet_glob",
    "resume_remaining",
    "split_by_tag",
    "write_parquet",
]
