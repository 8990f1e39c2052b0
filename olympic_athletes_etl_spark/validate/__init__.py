"""Declarative validation-rule engine (SURVEY.md §5, Phase 3)."""

from olympic_athletes_etl_spark.validate.engine import (
    Rule,
    RuleSet,
    editions_rules,
    reference_rules,
    results_rules,
    unique_rule,
)

__all__ = [
    "Rule",
    "RuleSet",
    "editions_rules",
    "reference_rules",
    "results_rules",
    "unique_rule",
]
