"""Connected components via iterative min-id propagation supersteps.

comp_0(v) = v; comp_{i+1}(v) = min(comp_i(v), min_{u∈N(v)} comp_i(u));
fixpoint when no row changes. Exact (north rule: component assignments
exact). The min-propagation converges in O(diameter) supersteps; the
groupBy(dst).min shuffle is partial-aggregated map-side, so hub fan-in is
absorbed before the shuffle.

For graphs with extreme diameters a large-star/small-star contraction
(Kiveris et al., "Connected Components in MapReduce") halves round count;
diameter of code-import graphs is small, so min-propagation is the right
default — noted as the scale-path alternative.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from peregrine_spark.graph.build import symmetrized
from peregrine_spark.supersteps.engine import SuperstepEngine, SuperstepResult


def connected_components(
    edges: DataFrame,
    max_iters: int = 50,
    engine: SuperstepEngine | None = None,
    resume: bool = False,
    check_every: int = 1,
) -> SuperstepResult:
    """State: (v, comp). Converged when changed-row count hits 0.

    check_every: the changed-row count (a second pass over the state) runs
    every k-th superstep; min-propagation is idempotent at fixpoint, so the
    up-to-k-1 extra supersteps are safe — at scale the saved pass dominates.
    """
    spark = edges.sparkSession
    sym = symmetrized(edges)
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    sym = sym.repartition(n_part, "src").persist()
    state0 = sym.select(F.col("src").alias("v")).distinct().select(
        "v", F.col("v").alias("comp")
    )
    engine = engine or SuperstepEngine(spark)

    cache_box: list[DataFrame] = []

    def step(state: DataFrame, i: int) -> tuple[DataFrame, float]:
        while cache_box:
            cache_box.pop().unpersist()
        nbr_min = (
            sym.join(state, sym["src"] == state["v"])
            .groupBy(F.col("dst").alias("v2"))
            .agg(F.min("comp").alias("nbr_comp"))
        )
        new = (
            state.join(nbr_min, state["v"] == F.col("v2"), "left")
            .select(
                "v",
                F.col("comp").alias("old"),
                F.least("comp", F.coalesce("nbr_comp", F.col("comp"))).alias("comp"),
            )
        )
        if (i + 1) % check_every and i != max_iters - 1:
            return new.select("v", "comp"), None
        new.persist()
        changed = new.where(F.col("comp") != F.col("old")).count()
        cache_box.append(new)
        return new.select("v", "comp"), float(changed)

    res = engine.run(state0, step, max_iters=max_iters, tol=0.0, resume=resume)
    while cache_box:
        cache_box.pop().unpersist()
    sym.unpersist()
    return res
