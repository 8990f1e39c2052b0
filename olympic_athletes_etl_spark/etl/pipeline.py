"""The full reference DAG as one lazy composition (SURVEY.md §3:
``scrap → clean_I → clean_II → validate → rename_reorder``; reference:
pandas_based/airflow/dags/Olympic-Athletes-ETL_DAG.py:87-92).

The Airflow layer crossed a process boundary per stage and a network
boundary per read/write; here every stage is a ``DataFrame → DataFrame``
function and the WHOLE pipeline is one Catalyst plan per output table —
stages fuse, nothing materializes between them unless the caller writes
a layer out (``silver_dir``/``gold_dir``).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame

from olympic_athletes_etl_spark.etl.clean import (
    clean_biodata,
    clean_editions,
    clean_results,
    normalize_affiliations,
)
from olympic_athletes_etl_spark.etl.impute import (
    impute_born_country,
    impute_edition_dates,
    impute_measurements,
    impute_primary_discipline,
)
from olympic_athletes_etl_spark.etl.publish import publish_gold
from olympic_athletes_etl_spark.validate.engine import RuleSet, reference_rules


@dataclass
class PipelineResult:
    gold: dict[str, DataFrame]
    validation_summary: DataFrame
    failure_cases: DataFrame


def run_pipeline(
    raw_biodata: DataFrame,
    raw_results: DataFrame,
    raw_editions: DataFrame,
    iso_countries: DataFrame,
    gold_dir: str = "",
    rules: RuleSet | None = None,
) -> PipelineResult:
    """Bronze → Gold. Validation failures are captured, never fatal
    (reference ``lazy=True`` semantics — SURVEY §5)."""
    bios = clean_biodata(raw_biodata)
    results = clean_results(raw_results)
    editions = impute_edition_dates(clean_editions(raw_editions))

    dim_aff, bridge = normalize_affiliations(bios)

    bios = impute_primary_discipline(bios, results)
    bios = impute_measurements(bios)
    bios = impute_born_country(bios, iso_countries)

    rules = rules or reference_rules()
    summary = rules.summary(bios)
    failures = rules.failures(bios, context_cols=["Athlete_Id"])

    gold = publish_gold(
        {
            "dim_athletes": bios,
            "dim_affiliations": dim_aff,
            "bridge_athletes_affiliations": bridge,
            "dim_games": editions,
            "fct_results": results,
        },
        out_dir=gold_dir,
    )
    return PipelineResult(gold=gold, validation_summary=summary, failure_cases=failures)
