"""Spark-native validation-rule engine — the reference's Pandera layer
re-expressed as lazy DataFrame predicates (SURVEY.md §5; reference:
pandas_based/src/data_quality_and_validation.py).

A ``Rule`` is (name, predicate-Column builder, scope columns). A
``RuleSet`` evaluates all rules against a DataFrame in a handful of
Spark jobs and produces:

- ``summary()``   — one row per rule: checked / failed counts.
- ``failures()``  — the failure-case table: one row per (violating row ×
  violated rule) with ``failed_check`` + the scope column values —
  the reference's ``get_error_df`` shape
  (data_quality_and_validation.py:240-289).

Failures are captured, never fatal — the reference's ``lazy=True``
semantics: all rules evaluate, violations route to an audit sink
(failure_cases parquet) while the pipeline proceeds.

Row-level rules evaluate as one pass over the table (a single select
with N predicate columns — no per-rule job). Uniqueness rules each add
one aggregation. At 100 TB: row rules are scan-bound and fuse into
whole-stage codegen; uniqueness rules shuffle on their key subset only.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    """One validation rule.

    ``predicate`` returns a boolean Column that is TRUE for PASSING rows;
    NULL evaluations count as failures only when ``null_fails`` (e.g. a
    required-column rule) — Pandera's ``nullable=True`` default means
    NULL passes range checks.
    """

    name: str
    predicate: Callable[[DataFrame], Column]
    scope: Sequence[str] = field(default_factory=tuple)
    null_fails: bool = False

    def fail_col(self, df: DataFrame) -> Column:
        p = self.predicate(df)
        if self.null_fails:
            return ~F.coalesce(p, F.lit(False))
        # NULL predicate (from NULL inputs) ⇒ not a failure.
        return ~F.coalesce(p, F.lit(True))


def unique_rule(name: str, keys: Sequence[str]) -> Rule:
    """Uniqueness over a key subset, expressed as a row-level rule via a
    count window (each duplicated row is flagged — matching Pandera's
    per-row failure cases)."""
    from pyspark.sql.window import Window

    def pred(df: DataFrame) -> Column:
        return F.count(F.lit(1)).over(Window.partitionBy(*keys)) == 1

    return Rule(name=name, predicate=pred, scope=tuple(keys))


class RuleSet:
    def __init__(self, rules: Sequence[Rule]):
        names = [r.name for r in rules]
        if len(set(names)) != len(names):
            raise ValueError(f"duplicate rule names in {names}")
        self.rules = list(rules)

    def _flagged(self, df: DataFrame) -> DataFrame:
        out = df
        for r in self.rules:
            out = out.withColumn(f"__fail_{r.name}", r.fail_col(df))
        return out

    def summary(self, df: DataFrame) -> DataFrame:
        """(rule, n_checked, n_failed) — single aggregation job."""
        flagged = self._flagged(df)
        aggs = [F.count(F.lit(1)).alias("n_checked")] + [
            F.sum(F.col(f"__fail_{r.name}").cast("long")).alias(r.name)
            for r in self.rules
        ]
        row = flagged.agg(*aggs)
        stack_args = ", ".join(f"'{r.name}', {r.name}" for r in self.rules)
        return row.select(
            "n_checked",
            F.expr(f"stack({len(self.rules)}, {stack_args}) AS (rule, n_failed)"),
        ).select("rule", "n_checked", "n_failed")

    def failures(self, df: DataFrame, context_cols: Sequence[str] | None = None) -> DataFrame:
        """One row per (violating row × violated rule): ``failed_check`` +
        scope values + optional context columns — the reference's
        failure-case audit table (J4 re-join included: context columns
        come straight off the original row, no second join needed)."""
        flagged = self._flagged(df)
        parts = []
        for r in self.rules:
            scope_map = [
                x
                for c in r.scope
                for x in (F.lit(c), F.col(c).cast("string"))
            ]
            parts.append(
                flagged.filter(F.col(f"__fail_{r.name}")).select(
                    F.lit(r.name).alias("failed_check"),
                    F.map_from_arrays(
                        F.array(*[F.lit(c) for c in r.scope]),
                        F.array(*[F.col(c).cast("string") for c in r.scope]),
                    ).alias("scope_values")
                    if r.scope
                    else F.create_map().alias("scope_values"),
                    *[F.col(c) for c in (context_cols or [])],
                )
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out


# --------------------------------------------------------------------------
# The reference's 11 checks (data_quality_and_validation.py), generalized
# to parameterized builders so they apply to any conforming table.
# --------------------------------------------------------------------------
def reference_rules(
    *,
    sex_col: str = "Sex",
    height_col: str = "Height_cm",
    weight_col: str = "Weight_kg",
    born_col: str = "Born_Date",
    died_col: str = "Died_Date",
    name_col: str = "Name",
    country_col: str = "Born_Country",
) -> RuleSet:
    """The bios-table ruleset: Sex isin, height/weight ranges, BMI band,
    3-char country, died ≥ born, unique (Name, Born_Date)
    (data_quality_and_validation.py:24-82)."""
    bmi = F.col(weight_col) / F.pow(F.col(height_col) / 100.0, 2)
    return RuleSet(
        [
            Rule("sex_valid", lambda df: F.col(sex_col).isin("Male", "Female"), (sex_col,)),
            Rule("height_range", lambda df: F.col(height_col).between(100, 250), (height_col,)),
            Rule("weight_range", lambda df: F.col(weight_col).between(25, 200), (weight_col,)),
            Rule("bmi_range", lambda df: bmi.between(15, 45), (height_col, weight_col)),
            Rule(
                "country_3char",
                lambda df: F.length(F.col(country_col)) == 3,
                (country_col,),
            ),
            Rule(
                "died_after_born",
                lambda df: F.col(died_col) >= F.col(born_col),
                (born_col, died_col),
            ),
            unique_rule("unique_name_born", (name_col, born_col)),
        ]
    )


def results_rules(
    *,
    medal_col: str = "Medal",
    position_col: str = "Position",
    athlete_col: str = "Athlete_Id",
) -> RuleSet:
    """The results-table ruleset: medal values, medal ⇔ position
    consistency (Gold=1 / Silver=2 / Bronze=3 — NULL medal always
    passes), required athlete FK
    (data_quality_and_validation.py:118-164)."""
    medal = F.col(medal_col)
    pos = F.col(position_col)
    return RuleSet(
        [
            Rule(
                "medal_valid",
                lambda df: medal.isin("Gold", "Silver", "Bronze"),
                (medal_col,),
            ),
            Rule(
                "medal_position_match",
                lambda df: medal.isNull()
                | ((pos == 1) & (medal == "Gold"))
                | ((pos == 2) & (medal == "Silver"))
                | ((pos == 3) & (medal == "Bronze")),
                (medal_col, position_col),
                null_fails=True,  # medal with NULL position is a mismatch
            ),
            Rule(
                "athlete_id_required",
                lambda df: F.col(athlete_col).isNotNull(),
                (athlete_col,),
                null_fails=True,
            ),
        ]
    )


GAME_TYPES = (
    "Olympic Games",
    "Intercalated Games",
    "Youth Olympic Games",
    "Forerunners to the Olympic Games",
)
EDITION_NAMES = ("Summer", "Winter", "Equestrian")


def editions_rules(
    *,
    year_col: str = "Year",
    game_type_col: str = "Game_Type",
    edition_col: str = "Edition_Name",
    opened_col: str = "Opened_Date",
    closed_col: str = "Closed_Date",
    comp_start_col: str = "Competition_Start",
    comp_end_col: str = "Competition_End",
) -> RuleSet:
    """The editions-table ruleset: year range, type/edition vocab,
    unique (Year, Edition_Name, Game_Type), opened ≤ closed,
    comp_start ≤ comp_end (data_quality_and_validation.py:165-235;
    NULL-tolerant date comparisons exactly as the reference's
    ``isna() | (a <= b)``)."""
    return RuleSet(
        [
            Rule(
                "year_range",
                lambda df: F.col(year_col).between(1850, 2024),
                (year_col,),
                null_fails=True,
            ),
            Rule(
                "game_type_valid",
                lambda df: F.col(game_type_col).isin(*GAME_TYPES),
                (game_type_col,),
                null_fails=True,
            ),
            Rule(
                "edition_name_valid",
                lambda df: F.col(edition_col).isin(*EDITION_NAMES),
                (edition_col,),
            ),
            unique_rule(
                "unique_game_edition", (year_col, edition_col, game_type_col)
            ),
            Rule(
                "opened_before_closed",
                lambda df: F.col(opened_col) <= F.col(closed_col),
                (opened_col, closed_col),
            ),
            Rule(
                "competition_start_before_end",
                lambda df: F.col(comp_start_col) <= F.col(comp_end_col),
                (comp_start_col, comp_end_col),
            ),
        ]
    )
