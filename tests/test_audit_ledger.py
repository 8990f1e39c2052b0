"""tools/audit_ledger.py — the generated driver-row freshness ledger.

No Spark needed: the ledger derives purely from the CORRECTNESS_r*.json
artifacts plus the registry's name list and AUDIT_PREFIX. These pins
keep the ledger honest as rounds accumulate: every registered query
appears exactly once, the suggested next prefix is exactly 50 and
favors the stalest queries, and the COVERAGE.md splice markers survive
regeneration.
"""

from __future__ import annotations

import re

from olympic_athletes_etl_spark.plans import AUDIT_PREFIX, queries
from tools.audit_ledger import BEGIN, END, build_ledger, driver_history


def test_history_covers_every_registered_query():
    # every registered query has had at least one driver row at some
    # point (the registry has never grown without entering the prefix)
    hist = driver_history()
    missing = [n for n in queries() if n not in hist and n not in AUDIT_PREFIX]
    assert not missing, missing


def test_ledger_lists_every_query_once_and_has_markers():
    md = build_ledger()
    assert md.startswith(BEGIN) and md.rstrip().endswith(END)
    names = set(queries())
    rows = re.findall(r"^\| (\S+) \| (?:r\d+|—) \|", md, flags=re.M)
    assert sorted(rows) == sorted(names)


def test_suggested_next_prefix_is_50_stalest_first():
    md = build_ledger()
    block = md.split("```")[1]
    suggested = block.split()
    assert len(suggested) == 50
    assert len(set(suggested)) == 50
    # nothing re-suggested from the CURRENT prefix while older rows
    # exist (oldest-first means the current round's fresh rows lose
    # ties to everything staler)
    hist = driver_history()
    latest = {q: max(r) for q, r in hist.items()}
    cur = set(AUDIT_PREFIX)
    stalest_outside = min(
        latest.get(n, 0) for n in queries() if n not in cur
    )
    cur_round = max(max(r) for r in hist.values()) + 1
    if stalest_outside < cur_round:
        assert not (set(suggested) & cur)
