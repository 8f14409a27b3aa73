"""Per-stage debug trace sink (SURVEY.md §2.1 S5).

The reference sprinkles ``debug('...')`` trace points through its
kernel (/root/reference/src/index.ts — the debug module is imported at
:2 and called ~15x: after intersection discovery, queue seeding, each
walk step, parent fixup) so a user can watch the algorithm's internal
counters.  A distributed engine can't print per-row, and a separate
``count()`` per stage would re-run the plan — so the engine equivalent
is Spark's Observation API: named accumulator-backed metrics evaluated
DURING the one job that runs anyway.

``TraceLog.trace(df, name, **metrics)`` interposes an ``observe`` node
(a no-op for the optimizer: it neither blocks pushdown below it nor
adds a pass) and ``report()`` yields every stage's metrics after the
action completes.  Default metric: row count.  Zero cost when unused —
tracing is opt-in per DataFrame, nothing global.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


class TraceLog:
    """Collects named per-stage observations across one job.

    >>> tl = TraceLog()
    >>> staged = tl.trace(assignments, "pip_assignments")
    >>> staged.write.parquet(out)          # any action
    >>> tl.report()["pip_assignments"]     # {'n_rows': ...}
    """

    def __init__(self) -> None:
        self._obs: dict[str, Observation] = {}

    def trace(self, df: DataFrame, name: str, **metrics) -> DataFrame:
        """Attach named metrics to ``df``; returns the observed frame.

        ``metrics``: alias → aggregate Column; defaults to a row count.
        Call once per (job, name) — Spark requires observation names to
        be unique within a job.
        """
        if name in self._obs:
            raise ValueError(f"duplicate trace point {name!r}")
        if not metrics:
            metrics = {"n_rows": F.count(F.lit(1))}
        obs = Observation(name)
        self._obs[name] = obs
        cols = [expr.alias(alias) for alias, expr in metrics.items()]
        return df.observe(obs, *cols)

    def report(self) -> dict[str, dict]:
        """Stage → metrics for every trace point whose job has run.
        Blocks on Observation.get per Spark semantics (the action must
        have completed)."""
        return {name: dict(obs.get) for name, obs in self._obs.items()}
