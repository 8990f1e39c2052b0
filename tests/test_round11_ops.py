"""Round-11 pins: unicode normalization (NFC + mojibake repair).

The gated query constructs dirty text deterministically, so these tests
pin the helper semantics directly on hand-written unicode fixtures —
the cases the ASCII testdata cannot exercise on its own.
"""

from __future__ import annotations

import unicodedata

from pyspark.sql import Row
from pyspark.sql import functions as F

from olympic_athletes_etl_spark.functions.text import (
    MOJIBAKE_TABLE,
    clean_unicode,
    nfc_normalize,
    repair_mojibake,
)


def _one(spark, s: str) -> str:
    df = spark.createDataFrame([Row(s=s)])
    return df.select(
        nfc_normalize(clean_unicode("s")).alias("out")
    ).collect()[0]["out"]


def test_nfc_composes_decomposed_accents(spark):
    # a + combining acute -> precomposed á; NFC is idempotent.
    assert _one(spark, "café á") == "café á"
    assert _one(spark, "café") == "café"


def test_mojibake_table_round_trips(spark):
    # every table entry is exactly the UTF-8 encoding of its repair
    # read back as Windows-1252 (the classic mojibake path) — the table
    # can't drift from the real fix.
    for bad, good in MOJIBAKE_TABLE:
        assert bad == good.encode("utf-8").decode("cp1252")
    df = spark.createDataFrame([Row(s="fiancÃ© said â€™hiâ€™")])
    out = df.select(repair_mojibake("s").alias("o")).collect()[0]["o"]
    assert out == "fiancé said ’hi’"


def test_zero_width_and_nbsp_cleanup(spark):
    dirty = "a​b﻿  c d e  f"
    assert _one(spark, dirty) == "ab c d e f"


def test_clean_matches_python_reference(spark):
    # end-to-end vs a pure-Python reference of the same pipeline
    cases = [
        "mixed á Ã© zero​width nb sp   tabs\t\tend ",
        "already clean ascii",
        "﻿bom lead Ã¨ trail‍",
    ]

    def ref(s: str) -> str:
        for bad, good in MOJIBAKE_TABLE:
            s = s.replace(bad, good)
        for z in "​‌‍﻿":
            s = s.replace(z, "")
        for n in "   ":
            s = s.replace(n, " ")
        import re

        s = re.sub("[ \t\r\n\f]+", " ", s).strip()
        return unicodedata.normalize("NFC", s)

    for s in cases:
        assert _one(spark, s) == ref(s)


def test_unicode_normalize_query_shape(spark, sf_dir):
    from olympic_athletes_etl_spark.plans.textstats import t_unicode_normalize

    out = t_unicode_normalize(spark, sf_dir)
    assert out.columns == ["doc_id", "n_chars_dirty", "n_chars_norm", "norm_md5"]
    row = out.orderBy("doc_id").first()
    # normalization only ever shrinks the constructed dirty text
    assert row["n_chars_norm"] < row["n_chars_dirty"]
