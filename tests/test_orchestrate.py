"""etl.orchestrate — the reference DAG's retry/ordering/schedule
contract (Olympic-Athletes-ETL_DAG.py:15-16,27,87-92), pinned without
wall-clock sleeps via the injectable sleep."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest

from olympic_athletes_etl_spark.etl.orchestrate import (
    DEFAULT_RETRIES,
    DEFAULT_RETRY_DELAY_S,
    Dag,
)


def _dag(**kw):
    kw.setdefault("sleep", lambda s: None)
    return Dag("t", **kw)


def test_chain_runs_in_order_and_reports_success():
    log = []
    dag = _dag().chain(
        *[(name, lambda n=name: log.append(n)) for name in ["a", "b", "c"]]
    )
    run = dag.run()
    assert log == ["a", "b", "c"]
    assert run.ok and all(r.attempts == 1 for r in run.states.values())


def test_retry_then_succeed_counts_attempts_and_sleeps_default_delay():
    sleeps = []
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("transient")
        return "done"

    run = Dag("t", sleep=sleeps.append).add("flaky", flaky).run()
    assert run.states["flaky"].state == "success"
    assert run.states["flaky"].attempts == 3
    assert run.states["flaky"].result == "done"
    # two failures → two delays, each the reference's 2-minute default
    assert sleeps == [DEFAULT_RETRY_DELAY_S] * 2
    assert DEFAULT_RETRY_DELAY_S == 120.0 and DEFAULT_RETRIES == 5


def test_exhausted_retries_mark_downstream_upstream_failed():
    sleeps = []

    def boom():
        raise ValueError("permanent")

    ran = []
    dag = Dag("t", retries=5, sleep=sleeps.append)
    dag.add("broken", boom)
    dag.add("after", lambda: ran.append("after"), upstream=["broken"])
    dag.add("leaf", lambda: ran.append("leaf"), upstream=["after"])
    run = dag.run()
    # 5 retries on top of the first try = 6 executions, 5 sleeps
    assert run.states["broken"].state == "failed"
    assert run.states["broken"].attempts == 6
    assert len(sleeps) == 5
    assert "permanent" in run.states["broken"].error
    # transitive skip, bodies never invoked
    assert run.states["after"].state == "upstream_failed"
    assert run.states["leaf"].state == "upstream_failed"
    assert ran == [] and not run.ok


def test_sibling_branch_still_runs_when_other_fails():
    ran = []
    dag = _dag(retries=0)
    dag.add("root", lambda: ran.append("root"))
    dag.add("bad", lambda: 1 / 0, upstream=["root"])
    dag.add("good", lambda: ran.append("good"), upstream=["root"])
    run = dag.run()
    assert run.states["bad"].state == "failed"
    assert run.states["good"].state == "success"
    assert ran == ["root", "good"]


def test_build_time_validation():
    dag = _dag()
    dag.add("a", lambda: None)
    with pytest.raises(ValueError, match="duplicate"):
        dag.add("a", lambda: None)
    with pytest.raises(ValueError, match="unknown upstream"):
        dag.add("b", lambda: None, upstream=["ghost"])
    with pytest.raises(ValueError, match="unsupported schedule"):
        _dag(schedule="@fortnightly")


def test_weekly_schedule_catchup_false_skips_missed_ticks():
    dag = _dag(schedule="@weekly")
    t0 = datetime(2026, 1, 5)  # a Monday
    # inside the first week: nothing due
    assert dag.next_run_after(t0, t0 + timedelta(days=6)) is None
    # exactly one week: due
    assert dag.next_run_after(t0, t0 + timedelta(weeks=1)) == t0 + timedelta(weeks=1)
    # 3.5 weeks of downtime: only the LATEST elapsed tick, no backfill
    assert dag.next_run_after(t0, t0 + timedelta(weeks=3, days=3)) == t0 + timedelta(
        weeks=3
    )
    # unscheduled dag never fires
    assert _dag().next_run_after(t0, t0 + timedelta(weeks=9)) is None


def test_reference_shape_end_to_end():
    # the reference's exact 6-task linear DAG, with stubbed bodies
    order = []
    dag = _dag(schedule="@weekly")
    dag.chain(
        *[
            (tid, lambda t=tid: order.append(t))
            for tid in [
                "scrap_athletes",
                "scrap_editions",
                "data_clean_I",
                "data_clean_II",
                "data_validation_quality_checks",
                "column_rename_reorder",
            ]
        ]
    )
    assert dag.run().ok
    assert order[0] == "scrap_athletes" and order[-1] == "column_rename_reorder"
    assert len(order) == 6
