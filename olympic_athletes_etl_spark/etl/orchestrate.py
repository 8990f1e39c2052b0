"""Orchestration semantics of the reference's Airflow layer (SURVEY §3;
reference: pandas_based/airflow/dags/Olympic-Athletes-ETL_DAG.py:12-92 —
``retries: 5, retry_delay: 2 min``, ``schedule_interval='@weekly'``,
``catchup=False``, linear ``>>`` chaining; Glue/Step-Functions twin
aws_migration/dags/main_aws_dag.py:23-47).

This is the control plane only — deliberately scheduler-agnostic. Stage
BODIES stay lazy DataFrame→DataFrame functions (etl/pipeline.py) so the
whole data path remains one Catalyst plan; what this module adds is the
semantics a production wrapper needs and the reference's DAG encodes:

- dependency ordering (topological, cycle-rejected at build time);
- per-task bounded retries with a fixed delay, injectable sleep/clock so
  tests pin the retry contract without waiting wall-clock minutes;
- Airflow state machine: a failed task (retries exhausted) marks every
  transitive downstream ``upstream_failed`` — siblings still run;
- ``@weekly``/``@daily``/``@hourly`` tick arithmetic with catchup=False
  (only the latest elapsed tick runs after downtime).

On a real deployment these callables submit Spark jobs; the runner holds
no data, so driver memory is O(tasks).
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterable, Mapping
from dataclasses import dataclass, field
from datetime import datetime, timedelta

#: reference defaults (Olympic-Athletes-ETL_DAG.py:15-16)
DEFAULT_RETRIES = 5
DEFAULT_RETRY_DELAY_S = 120.0

_SCHEDULE_STEPS: Mapping[str, timedelta] = {
    "@hourly": timedelta(hours=1),
    "@daily": timedelta(days=1),
    "@weekly": timedelta(weeks=1),
}


@dataclass
class Task:
    task_id: str
    fn: Callable[[], object]
    upstream: tuple[str, ...] = ()


@dataclass
class TaskRun:
    task_id: str
    state: str  # success | failed | upstream_failed
    attempts: int
    error: str | None = None
    result: object = None


@dataclass
class DagRun:
    dag_id: str
    states: dict[str, TaskRun] = field(default_factory=dict)

    @property
    def ok(self) -> bool:
        return all(r.state == "success" for r in self.states.values())


class Dag:
    """Minimal DAG: ``add(task_id, fn, upstream=[...])`` then ``run()``.

    ``chain(f1, f2, ...)`` mirrors the reference's linear ``>>``."""

    def __init__(
        self,
        dag_id: str,
        schedule: str | None = None,
        retries: int = DEFAULT_RETRIES,
        retry_delay_s: float = DEFAULT_RETRY_DELAY_S,
        sleep: Callable[[float], None] = time.sleep,
    ) -> None:
        if schedule is not None and schedule not in _SCHEDULE_STEPS:
            raise ValueError(
                f"unsupported schedule {schedule!r}; one of {sorted(_SCHEDULE_STEPS)}"
            )
        self.dag_id = dag_id
        self.schedule = schedule
        self.retries = retries
        self.retry_delay_s = retry_delay_s
        self._sleep = sleep
        self._tasks: dict[str, Task] = {}

    def add(
        self,
        task_id: str,
        fn: Callable[[], object],
        upstream: Iterable[str] = (),
    ) -> "Dag":
        if task_id in self._tasks:
            raise ValueError(f"duplicate task_id {task_id!r}")
        ups = tuple(upstream)
        for u in ups:
            if u not in self._tasks:
                raise ValueError(f"unknown upstream {u!r} for {task_id!r}")
        self._tasks[task_id] = Task(task_id, fn, ups)
        return self

    def chain(self, *tasks: tuple[str, Callable[[], object]]) -> "Dag":
        """Linear dependency chain — the reference DAG's only shape
        (scrape ≫ scrape ≫ clean_I ≫ clean_II ≫ validate ≫ publish)."""
        prev: tuple[str, ...] = ()
        for task_id, fn in tasks:
            self.add(task_id, fn, upstream=prev)
            prev = (task_id,)
        return self

    def _topo_order(self) -> list[Task]:
        # Insertion order is already topological: add() rejects any
        # upstream not yet registered, so every edge points backwards —
        # cycles are unconstructible and a DFS would be dead code.
        return list(self._tasks.values())

    def run(self) -> DagRun:
        run = DagRun(self.dag_id)
        for task in self._topo_order():
            bad = [
                u for u in task.upstream if run.states[u].state != "success"
            ]
            if bad:
                run.states[task.task_id] = TaskRun(
                    task.task_id,
                    "upstream_failed",
                    attempts=0,
                    error=f"upstream failed: {', '.join(bad)}",
                )
                continue
            run.states[task.task_id] = self._run_with_retries(task)
        return run

    def _run_with_retries(self, task: Task) -> TaskRun:
        # Airflow counts RETRIES on top of the first try: 5 retries = up
        # to 6 executions, sleeping retry_delay between consecutive ones.
        last_err: str | None = None
        for attempt in range(1, self.retries + 2):
            try:
                result = task.fn()
                return TaskRun(task.task_id, "success", attempt, result=result)
            except Exception as exc:  # noqa: BLE001 - task bodies are arbitrary
                last_err = f"{type(exc).__name__}: {exc}"
                if attempt <= self.retries:
                    self._sleep(self.retry_delay_s)
        return TaskRun(
            task.task_id, "failed", self.retries + 1, error=last_err
        )

    def next_run_after(
        self, last_run: datetime, now: datetime
    ) -> datetime | None:
        """catchup=False tick arithmetic: the single most recent schedule
        tick in (last_run, now], or None when no tick has elapsed —
        missed intermediate ticks are skipped, not backfilled."""
        if self.schedule is None:
            return None
        step = _SCHEDULE_STEPS[self.schedule]
        if now - last_run < step:
            return None
        elapsed = (now - last_run) // step
        return last_run + step * elapsed
