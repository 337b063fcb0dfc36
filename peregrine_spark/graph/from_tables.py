"""Derive edge tables from generic relational tables (co-occurrence graphs).

The engine's upstream is any table with a (group, item) shape — files per
commit, parts per order, docs per source. Two derivations:

* ``chain_edges`` — consecutive items within a group (sorted by a
  deterministic total order) become edges: a group touching k items yields
  k-1 edges. This is the scale-safe derivation (same idiom as
  ``graph.build.co_commit_edges``): a mega-group contributes O(k) edges,
  never O(k^2), so no single group can blow up the shuffle at 10^12 rows.
* ``pair_edges`` — all pairs within a group (k*(k-1)/2 edges). Only safe
  when group sizes are bounded; provided for completeness with an explicit
  ``max_group_size`` guard that *drops* oversized groups rather than
  exploding (the cap is the moral equivalent of the reference rejecting
  inputs that don't fit its memory model, core/DataConverter.cc:52-67).

``relabel_by_degree`` reassigns 1-based contiguous ids by descending degree
(ties by old id ascending) — the reference's load-bearing renumbering
(core/DataConverter.cc:283-304) that makes symmetry-break range pruning and
degree-based edge orientation cheap. Default physical strategy: the
distributed two-pass ranking (``graph.build.contiguous_rank`` — range
partition + per-range offsets) that works for arbitrarily large vertex
sets; a global-window variant is kept as an opt-in cross-check path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from peregrine_spark.graph.build import contiguous_rank, edges_from_pairs, symmetrized


def chain_edges(
    df: DataFrame,
    group_col: str,
    item_col: str,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Canonical (src<dst) edges between consecutive items of each group.

    Ordering within the group is (item, *order_cols) — a total order as long
    as the rows are distinct on those columns, making the derivation
    deterministic (required for the DuckDB oracle to reproduce it).
    """
    order_by = [F.col(item_col)] + [F.col(c) for c in (order_cols or [])]
    w = Window.partitionBy(group_col).orderBy(*order_by)
    pairs = (
        df.select(
            F.col(item_col).alias("a"),
            F.lag(F.col(item_col)).over(w).alias("b"),
        )
        .where(F.col("b").isNotNull())
    )
    return edges_from_pairs(pairs)


def pair_edges(
    df: DataFrame,
    group_col: str,
    item_col: str,
    max_group_size: int = 256,
) -> DataFrame:
    """Canonical edges between ALL item pairs of each group (bounded).

    Groups larger than ``max_group_size`` are dropped entirely (explicit
    skew guard — at web scale one mega-group must not produce O(k^2) rows).
    """
    items = df.select(F.col(group_col).alias("g"), F.col(item_col).alias("a")).dropDuplicates()
    sizes = items.groupBy("g").agg(F.count(F.lit(1)).alias("_n"))
    bounded = items.join(
        sizes.where(F.col("_n") <= max_group_size).select("g"), "g"
    )
    other = bounded.select("g", F.col("a").alias("b"))
    pairs = bounded.join(other, "g").where(F.col("a") < F.col("b")).select("a", "b")
    return edges_from_pairs(pairs)


def degrees(edges: DataFrame) -> DataFrame:
    """(v, degree) over the canonical edge table."""
    return (
        symmetrized(edges)
        .groupBy(F.col("src").alias("v"))
        .agg(F.count(F.lit(1)).alias("degree"))
    )


def relabel_by_degree(
    edges: DataFrame, use_window: bool = False
) -> tuple[DataFrame, DataFrame]:
    """Relabel vertices 1..|V| by (degree desc, old id asc).

    Returns (relabelled canonical edges, mapping (v, old, degree)).

    The default is the scale-safe distributed two-pass ranking
    (:func:`peregrine_spark.graph.build.contiguous_rank` — range partition +
    per-range offsets, no single-partition sort, no Python RDD).
    ``use_window=True`` opts into a single global Window sort — only sane
    for small vertex sets (everything funnels through ONE task); kept as a
    cross-check path for tests.
    """
    deg = degrees(edges)
    if use_window:
        w = Window.orderBy(F.col("degree").desc(), F.col("v").asc())
        mapping = deg.select(
            F.row_number().over(w).cast("long").alias("v"),
            F.col("v").alias("old"),
            "degree",
        )
        mapping.ranking_cache = None
    else:
        ranked = contiguous_rank(
            deg, [F.col("degree").desc(), F.col("v").asc()], "_rank"
        )
        mapping = ranked.select(
            F.col("_rank").alias("v"), F.col("v").alias("old"), "degree"
        )
        # contiguous_rank eagerly checkpoints the ranking; expose the handle
        # so long-lived sessions can release the blocks once the relabelled
        # edges / mapping have been materialized:
        #   release_checkpoint(mapping.ranking_cache)
        mapping.ranking_cache = ranked
    m_src = mapping.select(F.col("old").alias("src"), F.col("v").alias("_sv"))
    m_dst = mapping.select(F.col("old").alias("dst"), F.col("v").alias("_dv"))
    relabelled = (
        edges.join(m_src, "src")
        .join(m_dst, "dst")
        .select(
            F.least("_sv", "_dv").alias("src"), F.greatest("_sv", "_dv").alias("dst")
        )
    )
    return relabelled, mapping
