"""Chained transforms + job-DAG control.

- ``chain``: ChainMapper/ChainReducer (LIB/chain/Chain.java, ChainMapper.java:84-119
  — SURVEY §2.3): a pipeline of per-record transforms inside one task. On
  Spark, composed DataFrame transformations ARE the chain — Catalyst fuses
  them into one whole-stage-codegen pass, which is exactly the single-task
  pipelining Chain implements by hand.

- ``JobControl``: LIB/jobcontrol/JobControl.java + ControlledJob.java
  (SURVEY §2.9): a DAG of jobs with dependencies. Spark's lazy DAG usually
  subsumes this (one multi-stage query), but multi-*action* workflows
  (write A, then read A to build B…) still need ordering — this is that
  tiny scheduler: topological execution with per-job state tracking.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field
from enum import Enum

from pyspark.sql import DataFrame


def chain(*transforms: Callable[[DataFrame], DataFrame]) -> Callable[[DataFrame], DataFrame]:
    """Compose per-record transforms: chain(f, g, h)(df) == h(g(f(df)))."""

    def run(df: DataFrame) -> DataFrame:
        for t in transforms:
            df = t(df)
        return df

    return run


class JobState(Enum):
    WAITING = "WAITING"
    RUNNING = "RUNNING"
    SUCCESS = "SUCCESS"
    FAILED = "FAILED"
    DEPENDENT_FAILED = "DEPENDENT_FAILED"


@dataclass
class ControlledJob:
    """ControlledJob.java analog: a named action with dependencies."""

    name: str
    action: Callable[[], object]
    depends_on: list[str] = field(default_factory=list)
    state: JobState = JobState.WAITING
    result: object = None
    error: BaseException | None = None


class JobControl:
    """Topological executor over ControlledJobs (JobControl.java:82-356).

    Synchronous (the reference's monitor thread exists only because MR jobs
    are async; Spark actions block). Failure propagates DEPENDENT_FAILED to
    downstream jobs, like the reference.
    """

    def __init__(self) -> None:
        self.jobs: dict[str, ControlledJob] = {}

    def add_job(self, job: ControlledJob) -> None:
        if job.name in self.jobs:
            raise ValueError(f"duplicate job {job.name!r}")
        self.jobs[job.name] = job

    def _order(self) -> list[str]:
        seen: dict[str, int] = {}  # 0=visiting, 1=done
        out: list[str] = []

        def visit(n: str) -> None:
            if seen.get(n) == 1:
                return
            if seen.get(n) == 0:
                raise ValueError(f"dependency cycle at {n!r}")
            if n not in self.jobs:
                raise KeyError(f"unknown dependency {n!r}")
            seen[n] = 0
            for d in self.jobs[n].depends_on:
                visit(d)
            seen[n] = 1
            out.append(n)

        for n in self.jobs:
            visit(n)
        return out

    def run(self) -> dict[str, JobState]:
        for name in self._order():
            job = self.jobs[name]
            dep_states = [self.jobs[d].state for d in job.depends_on]
            if any(s in (JobState.FAILED, JobState.DEPENDENT_FAILED) for s in dep_states):
                job.state = JobState.DEPENDENT_FAILED
                continue
            job.state = JobState.RUNNING
            try:
                job.result = job.action()
                job.state = JobState.SUCCESS
            except Exception as exc:  # noqa: BLE001 — reference records any job failure
                job.error = exc
                job.state = JobState.FAILED
        return {n: j.state for n, j in self.jobs.items()}
