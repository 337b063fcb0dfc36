"""Superstep driver loop: checkpointed, lineage-tracked, resumable iteration.

The reference's analogue is the per-pattern barrier loop
(core/Peregrine.hh:1320-1424): workers process a round, hit a barrier, the
driver advances. Our superstep = one Spark job over the vertex-state
DataFrame. What the reference does NOT have — and the north rule demands —
is fault tolerance: every superstep persists

  * the full vertex state (parquet, atomic via Spark's _SUCCESS marker),
  * per-partition lineage (partition id, row count, order-insensitive
    checksum of the rows), and
  * convergence metrics (delta, wall seconds, rows)

to the checkpoint directory, so a killed job resumes mid-iteration from the
last complete superstep (``resume=True``). Writing state out each superstep
also truncates the logical plan — without it, iterative DataFrame loops grow
an exponentially deeper DAG and re-execute the whole history each action.

At 100 TB this directory would be an Iceberg table (snapshot per superstep);
in the sandbox it is Iceberg-shaped parquet + a JSONL metrics log.
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Callable

from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from peregrine_spark.session import release_checkpoint


def auto_shuffle_partitions(
    spark: SparkSession,
    n_rows: int,
    rows_per_core: int = 100_000,
    rows_target: int = 2_000_000,
) -> int:
    """Size the shuffle for an iterative job to its data, not the session
    default.

    Two regimes joined smoothly:
      * small inputs — at most one partition per ``rows_per_core`` rows (a
        64-task shuffle over 1e5 rows pays 64 scheduling floors to move
        kilobytes; measured 2-4x superstep slowdown at SF=0.1), capped at
        the core count;
      * large inputs — one partition per ``rows_target`` rows (~tens of MB),
        which exceeds the core count as soon as n_rows > cores *
        rows_target and keeps every shuffle block spill-safe at 100 TB.

    The returned count is used consistently for the state repartition AND
    ``spark.sql.shuffle.partitions`` inside the superstep loop, so the
    per-iteration joins stay co-partitioned (zero-shuffle) whatever the
    session-level setting is.
    """
    cores = spark.sparkContext.defaultParallelism
    by_cores = min(cores, max(1, n_rows // rows_per_core))
    return int(max(by_cores, n_rows // rows_target, 1))


@contextmanager
def shuffle_partitions(spark: SparkSession, n: int | None):
    """Temporarily pin spark.sql.shuffle.partitions (no-op if n is None)."""
    key = "spark.sql.shuffle.partitions"
    if n is None:
        yield
        return
    before = spark.conf.get(key)
    spark.conf.set(key, str(int(n)))
    try:
        yield
    finally:
        spark.conf.set(key, before)


@dataclass
class SuperstepResult:
    state: DataFrame
    iterations: int
    converged: bool
    metrics: list[dict] = field(default_factory=list)


def _partition_lineage(state: DataFrame, key_cols: list[str]) -> list[dict]:
    """Per-partition (id, rows, checksum). Checksum = bit_xor of xxhash64
    over the row's columns — order-insensitive, overflow-free, one job."""
    agg = (
        state.withColumn("_pid", F.spark_partition_id())
        .groupBy("_pid")
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.bit_xor(F.xxhash64(*[F.col(c) for c in key_cols])).alias("checksum"),
        )
        .collect()
    )
    return [
        {"partition": r["_pid"], "rows": r["rows"], "checksum": r["checksum"]}
        for r in sorted(agg, key=lambda r: r["_pid"])
    ]


class SuperstepEngine:
    """Runs ``state_{i+1} = step_fn(state_i, i)`` to convergence.

    step_fn returns (new_state, delta) where delta is a float convergence
    measure (L1 change, changed-row count, ...); delta <= tol stops. A step
    may return delta=None, meaning "convergence not measured this step" —
    the loop continues and only the plan-truncation job runs (one Spark job
    per superstep; vertex programs expose ``check_every`` for this).
    """

    def __init__(
        self,
        spark: SparkSession,
        checkpoint_dir: str | None = None,
        run_id: str = "run",
        checkpoint_every: int = 1,
        adaptive: bool = False,
    ):
        self.spark = spark
        self.dir = Path(checkpoint_dir) if checkpoint_dir else None
        self.run_id = run_id
        self.checkpoint_every = max(1, checkpoint_every)
        # AQE re-plans every superstep query and interacts badly with
        # localCheckpoint partition materialization (measured 10x superstep
        # slowdown); iterative supersteps use static partitioning — skew is
        # handled structurally (chunked CSR blocks, degree orientation).
        # adaptive=True keeps the session setting untouched.
        self.adaptive = adaptive

    # -- checkpoint layout -------------------------------------------------
    def _step_path(self, i: int) -> Path:
        return self.dir / self.run_id / f"step={i:05d}"

    def _metrics_path(self) -> Path:
        return self.dir / self.run_id / "metrics.jsonl"

    def _complete_steps(self) -> list[int]:
        if not self.dir or not (self.dir / self.run_id).exists():
            return []
        out = []
        for p in sorted((self.dir / self.run_id).glob("step=*")):
            if (p / "_SUCCESS").exists():
                out.append(int(p.name.split("=")[1]))
        return out

    def last_checkpoint(self) -> tuple[int, DataFrame] | None:
        steps = self._complete_steps()
        if not steps:
            return None
        i = steps[-1]
        return i, self.spark.read.parquet(str(self._step_path(i)))

    # -- main loop -----------------------------------------------------------
    def run(
        self,
        state0: DataFrame,
        step_fn: Callable[[DataFrame, int], tuple[DataFrame, float]],
        max_iters: int = 20,
        tol: float = 0.0,
        resume: bool = False,
    ) -> SuperstepResult:
        metrics: list[dict] = []
        start_iter = 0
        state = state0

        if resume and self.dir:
            ckpt = self.last_checkpoint()
            if ckpt:
                start_iter = ckpt[0] + 1
                state = ckpt[1]
                if self._metrics_path().exists():
                    metrics = [
                        json.loads(l)
                        for l in self._metrics_path().read_text().splitlines()
                        if json.loads(l)["iteration"] <= ckpt[0]
                    ]
                    if metrics and metrics[-1].get("converged"):
                        return SuperstepResult(
                            state=state,
                            iterations=start_iter,
                            converged=True,
                            metrics=metrics,
                        )

        converged = False
        i = start_iter - 1
        aqe_key = "spark.sql.adaptive.enabled"
        aqe_before = self.spark.conf.get(aqe_key)
        if not self.adaptive:
            self.spark.conf.set(aqe_key, "false")
        try:
            state, i, converged = self._loop(
                state, step_fn, start_iter, max_iters, tol, metrics
            )
        finally:
            self.spark.conf.set(aqe_key, aqe_before)
        return SuperstepResult(
            state=state, iterations=i + 1, converged=converged, metrics=metrics
        )

    def _loop(self, state, step_fn, start_iter, max_iters, tol, metrics):
        converged = False
        i = start_iter - 1
        own_ckpt = None  # the engine's own live localCheckpoint, if any
        for i in range(start_iter, max_iters):
            t0 = time.monotonic()
            new_state, delta = step_fn(state, i)

            checked = delta is not None
            persist = self.dir is not None and (
                i % self.checkpoint_every == 0
                or (checked and delta <= tol)
                or i == max_iters - 1
            )
            if persist:
                path = self._step_path(i)
                new_state.write.mode("overwrite").parquet(str(path))
                new_state = self.spark.read.parquet(str(path))
                lineage = _partition_lineage(new_state, new_state.columns)
            else:
                # plan-truncation without durability (intra-checkpoint steps)
                new_state = new_state.localCheckpoint()
                lineage = None
            # the new state is materialized (parquet or eager checkpoint) —
            # the PREVIOUS round's engine-made checkpoint blocks are dead
            # weight now; without this every superstep retains one state
            # table in executor storage for the life of the session
            if own_ckpt is not None:
                release_checkpoint(own_ckpt)
            own_ckpt = new_state if lineage is None else None

            m = {
                "run_id": self.run_id,
                "iteration": i,
                "delta": float(delta) if checked else None,
                "seconds": time.monotonic() - t0,
                "rows": sum(p["rows"] for p in lineage) if lineage else None,
                "partitions": lineage,
                "converged": bool(checked and delta <= tol),
            }
            metrics.append(m)
            if self.dir:
                self._metrics_path().parent.mkdir(parents=True, exist_ok=True)
                with open(self._metrics_path(), "a") as f:
                    f.write(json.dumps(m) + "\n")

            state = new_state
            if checked and delta <= tol:
                converged = True
                break

        return state, i, converged
