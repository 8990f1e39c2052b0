"""The reference pipeline re-expressed (SURVEY.md §1-§3): stage-I clean,
stage-II impute, NOC canonicalization, gold publish."""

from olympic_athletes_etl_spark.etl.clean import (
    clean_biodata,
    clean_editions,
    clean_results,
    normalize_affiliations,
)
from olympic_athletes_etl_spark.etl.impute import (
    impute_born_country,
    impute_measurements,
    impute_primary_discipline,
)
from olympic_athletes_etl_spark.etl.noc import canonicalize_noc_df, canonicalize_noc_udf
from olympic_athletes_etl_spark.etl.publish import GOLD_MAPPINGS, publish_gold

__all__ = [
    "clean_biodata",
    "clean_editions",
    "clean_results",
    "normalize_affiliations",
    "impute_born_country",
    "impute_measurements",
    "impute_primary_discipline",
    "canonicalize_noc_df",
    "canonicalize_noc_udf",
    "GOLD_MAPPINGS",
    "publish_gold",
]
