"""Gold publish: DW rename + reorder + compacted write (SURVEY.md §2.2
F2/F3 + §2.1 S5/S7; reference:
aws_migration/src/columns_renaming_reordering_glue.py:13-93,140-147 and
the pandas twin columns_renaming_reordering_and_final_save.py:22-95).

The star schema: 3 dims (+1 bridge) and 1 fact with ``m_``-prefixed
measures. Keys here are OUR silver column names (our clean stage emits
``Height_cm`` where the reference's silver has ``"Height (cm)"`` — the
gold names are identical).

Reference semantics preserved: only mapped columns survive publish, in
mapping-declaration order; renames apply where the column exists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from olympic_athletes_etl_spark.sources.io import compacted_write

#: table → (silver name → gold name), in gold column order
GOLD_MAPPINGS: dict[str, dict[str, str]] = {
    "dim_athletes": {
        "Athlete_Id": "athlete_id",
        "Name": "athlete_name",
        "Roles": "athlete_roles",
        "Sex": "athlete_sex",
        "NOC": "athlete_NOC",
        "Height_cm": "athlete_height_cm",
        "Weight_kg": "athlete_weight_kg",
        "Born_Date": "athlete_born_date",
        "Died_Date": "athlete_died_date",
        "Is_Alive": "athlete_is_alive",
        "Born_City": "athlete_born_city",
        "Born_Region": "athlete_born_region",
        "Born_Country": "athlete_born_country",
        "Height_Imputed": "athlete_is_height_imputed",
        "Weight_Imputed": "athlete_is_weight_imputed",
        "Born_Country_From_NOC": "athlete_is_born_country_from_NOC",
    },
    "dim_affiliations": {
        "Affiliation_Id": "affiliation_id",
        "Affiliation_Club": "dim_affiliation_club",
        "Affiliation_City": "dim_affiliation_city",
        "Affiliation_Country": "dim_affiliation_country",
    },
    "bridge_athletes_affiliations": {
        "Athlete_Id": "athlete_id",
        "Affiliation_Id": "affiliation_id",
    },
    "dim_games": {
        "Game_Id": "game_id",
        "Game_Type": "dim_game_type",
        "Edition_Name": "dim_edition_name",
        "Year": "dim_game_year",
        "City": "dim_city",
        "Country": "dim_country",
        "Opened_Date": "dim_opened",
        "Closed_Date": "dim_closed",
        "Competition_Start": "dim_competition_start",
        "Competition_End": "dim_competition_end",
        "Comments": "dim_comments",
        "Opened_Imputed": "dim_opened_imputed",
        "Closed_Imputed": "dim_closed_imputed",
    },
    "fct_results": {
        "Athlete_Id": "athlete_id",
        "NOC": "dim_noc",
        "Discipline": "dim_discipline",
        "Year": "dim_game_year",
        "Games_Name": "dim_game_name",
        "Event": "dim_event_name",
        "Team": "dim_team_name",
        "As": "dim_as",
        "Tied": "m_tied_flag",
        "Position": "m_position",
        "Medal": "m_medal",
    },
}


def apply_gold_mapping(df: DataFrame, mapping: dict[str, str]) -> DataFrame:
    """Rename + project to exactly the mapped columns, in declared order
    (columns_renaming_reordering_glue.py:82-89: missing silver columns are
    skipped, unmapped columns are dropped)."""
    present = {old: new for old, new in mapping.items() if old in df.columns}
    out = df.withColumnsRenamed(present)
    return out.select(*[new for new in present.values()])


def publish_gold(
    tables: dict[str, DataFrame],
    out_dir: str,
    files_per_table: int = 1,
) -> dict[str, DataFrame]:
    """Publish every silver table through its gold mapping. Returns the
    gold DataFrames (also written when ``out_dir`` is non-empty).

    ``files_per_table=1`` mirrors the reference's ``coalesce(1)`` publish
    (columns_renaming_reordering_glue.py:140-141) — right for a demo-sized
    gold layer; at 100 TB size to ~512 MB-1 GB per output file instead.
    """
    gold: dict[str, DataFrame] = {}
    for name, df in tables.items():
        if name not in GOLD_MAPPINGS:
            raise KeyError(f"no gold mapping for table {name!r}")
        mapped = apply_gold_mapping(df, GOLD_MAPPINGS[name])
        gold[name] = mapped
        if out_dir:
            compacted_write(mapped, f"{out_dir}/{name}.parquet", files_per_table)
    return gold
