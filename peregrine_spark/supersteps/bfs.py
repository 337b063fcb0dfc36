"""Multi-source BFS hop distances via frontier-propagation supersteps.

dist_0(v) = 0 for v in sources, unreached otherwise; superstep i settles
every unreached neighbour of the current frontier at dist = i + 1. The
reference's vertex-set machinery has no shortest-path app, but this is the
canonical fourth vertex program of the link-graph tier (alongside
PageRank / connected components / label propagation) and runs on the same
checkpointed, resumable :class:`SuperstepEngine`.

Scale shape: each superstep joins the FRONTIER (only the vertices settled
in the previous round) against the symmetrized edge table — never the full
state — then anti-joins the already-settled set, so per-round shuffle
volume tracks the frontier boundary, not |V|. All joins/aggregations are
JVM-side column expressions; convergence = empty frontier (exact, the
north rule's "component assignments exact" discipline applied to hop
distances).
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from peregrine_spark.graph.build import symmetrized
from peregrine_spark.supersteps.engine import (
    SuperstepEngine,
    SuperstepResult,
    auto_shuffle_partitions,
    shuffle_partitions,
)


def bfs_hops(
    edges: DataFrame,
    sources: Iterable[int] | DataFrame,
    max_iters: int = 50,
    engine: SuperstepEngine | None = None,
    resume: bool = False,
    n_partitions: int | None = None,
) -> SuperstepResult:
    """Hop distance from the nearest source over the canonical (src<dst)
    edge table, undirected. State: (v, dist) over ALL vertices, dist null
    while unreached; converged when a superstep settles no new vertex.

    ``sources``: vertex ids (iterable) or a single-column DataFrame. Ids
    not present in the edge table are ignored (an isolated source has no
    edges to traverse). Returns the standard engine result — per-superstep
    metrics carry the frontier size, and ``resume=True`` restarts from the
    last complete checkpoint like every other vertex program.
    """
    spark = edges.sparkSession
    n_part = n_partitions or auto_shuffle_partitions(spark, 2 * edges.count())
    sym = symmetrized(edges).repartition(n_part, "src").persist()
    engine = engine or SuperstepEngine(spark)

    if isinstance(sources, DataFrame):
        src_df = sources.select(F.col(sources.columns[0]).alias("v")).distinct()
    else:
        src_df = spark.createDataFrame([(int(s),) for s in sources], "v long")

    cache_box: list[DataFrame] = []

    def step(state: DataFrame, i: int) -> tuple[DataFrame, float]:
        while cache_box:
            cache_box.pop().unpersist()
        frontier = state.where(F.col("dist") == i).select("v")
        reached = (
            sym.join(frontier, sym["src"] == frontier["v"])
            .select(F.col("dst").alias("v"))
            .distinct()
        )
        newly = reached.join(
            state.where(F.col("dist").isNotNull()).select("v"), "v", "left_anti"
        ).persist()
        n_new = newly.count()
        cache_box.append(newly)
        new_state = (
            state.join(
                newly.select("v", F.lit(i + 1).cast("long").alias("_nd")), "v", "left"
            )
            .select("v", F.coalesce("dist", "_nd").alias("dist"))
        )
        return new_state, float(n_new)

    with shuffle_partitions(spark, n_part):
        verts = sym.select(F.col("src").alias("v")).distinct()
        state0 = verts.join(src_df.select("v", F.lit(0).alias("_d")), "v", "left").select(
            "v", F.col("_d").cast("long").alias("dist")
        )
        res = engine.run(state0, step, max_iters=max_iters, tol=0.0, resume=resume)
    while cache_box:
        cache_box.pop().unpersist()
    sym.unpersist()
    return res
