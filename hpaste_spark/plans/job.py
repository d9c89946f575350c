"""HJob — declarative multi-stage pipeline layer (SURVEY §2.10 X6).

Reference: HJob topological task chain with HTaskID(name, requiredTask),
temp-file wiring between tasks, per-task counters, dry-run
(mapreduce2.scala:277-419, 1113-1135).

Spark mapping: a "task" is a function from (ctx, inputs) → DataFrame;
the whole DAG is one lazy DataFrame program — no temp sequence files,
the exchange between stages is Catalyst's shuffle.  ``checkpoint=True``
on a task persists its output snapshot (the fault-isolation role the
reference's HRandomSequenceOutput temp files played).  Counters map to
Spark accumulators (A6: ctr/counter, mapreduce2.scala:1014-1050);
settings injection (X5, SettingsBase) is plain constructor args carried
on the context.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession


@dataclasses.dataclass
class HTask:
    """mapreduce2.scala:1113-1135 (HMapReduceTask / HMapTask) — here any
    DataFrame transform; `requires` mirrors HTaskID.requiredTask."""

    name: str
    fn: Callable[["JobContext", dict[str, DataFrame]], DataFrame]
    requires: tuple[str, ...] = ()
    checkpoint: bool = False


class JobContext:
    """Per-run context: settings (X5) + counters (A6)."""

    def __init__(self, spark: SparkSession, settings: dict[str, Any] | None):
        self.spark = spark
        self.settings = settings or {}
        self.counters: dict[str, int] = {}
        self._accumulators: dict[str, Any] = {}

    def counter(self, name: str, incr: int = 1) -> None:
        """Driver-side counter (mapreduce2.scala:1014-1020 ctr())."""
        self.counters[name] = self.counters.get(name, 0) + incr

    def accumulator(self, name: str):
        """Executor-side counter — the true A6 analog: incremented inside
        distributed code (foreach/mapInPandas), harvested into
        JobResult.counters after the run."""
        if name not in self._accumulators:
            self._accumulators[name] = self.spark.sparkContext.accumulator(0)
        return self._accumulators[name]

    def observe(self, df, name: str, *exprs):
        """Observed metrics on a DataFrame (A6 via df.observe) — metric
        values surface in the Spark listener bus / UI; use accumulator()
        when the job needs to read them back programmatically."""
        return df.observe(name, *exprs)

    def harvest_accumulators(self) -> None:
        for name, acc in self._accumulators.items():
            self.counters[name] = self.counters.get(name, 0) + acc.value


class HJob:
    """mapreduce2.scala:277-419."""

    def __init__(self, name: str, *tasks: HTask):
        self.name = name
        self.tasks = list(tasks)
        names = [t.name for t in self.tasks]
        if len(set(names)) != len(names):
            raise ValueError("duplicate task names")

    def add_task(self, task: HTask) -> "HJob":
        self.tasks.append(task)
        return self

    def _topo_order(self) -> list[HTask]:
        by_name = {t.name: t for t in self.tasks}
        seen: dict[str, int] = {}
        out: list[HTask] = []

        def visit(t: HTask):
            state = seen.get(t.name, 0)
            if state == 1:
                raise ValueError(f"cycle at task {t.name}")
            if state == 2:
                return
            seen[t.name] = 1
            for r in t.requires:
                if r not in by_name:
                    raise ValueError(f"task {t.name} requires unknown task {r}")
                visit(by_name[r])
            seen[t.name] = 2
            out.append(t)

        for t in self.tasks:
            visit(t)
        return out

    def run(
        self,
        spark: SparkSession,
        settings: dict[str, Any] | None = None,
        dry_run: bool = False,
        skip_to_task: str | None = None,
    ) -> "JobResult":
        """Topological execution (mapreduce2.scala:373-407); ``dry_run``
        only resolves the DAG; ``skip_to_task`` resumes mid-chain
        (reference skip-to-task, mapreduce2.scala:300-316) — upstream
        outputs must have been checkpointed."""
        ctx = JobContext(spark, settings)
        order = self._topo_order()
        if dry_run:
            return JobResult(self.name, [t.name for t in order], {}, {}, ok=True)
        outputs: dict[str, DataFrame] = {}
        timings: dict[str, float] = {}
        skipping = skip_to_task is not None
        for task in order:
            if skipping:
                if task.name == skip_to_task:
                    skipping = False
                else:
                    continue
            t0 = time.monotonic()
            inputs = {r: outputs[r] for r in task.requires if r in outputs}
            df = task.fn(ctx, inputs)
            if task.checkpoint and df is not None:
                df = df.localCheckpoint(eager=True)
            outputs[task.name] = df
            timings[task.name] = time.monotonic() - t0
        ctx.harvest_accumulators()
        return JobResult(self.name, [t.name for t in order], outputs, timings, ok=True, counters=ctx.counters)


@dataclasses.dataclass
class JobResult:
    name: str
    task_order: list[str]
    outputs: dict[str, DataFrame]
    timings: dict[str, float]
    ok: bool
    counters: dict[str, int] = dataclasses.field(default_factory=dict)
