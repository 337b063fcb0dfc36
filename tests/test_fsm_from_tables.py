"""Tests for FSM (MNI support, extension, mining loop) and the relational
edge-derivation helpers."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from peregrine_spark.graph.build import symmetrized
from peregrine_spark.graph.from_tables import (
    chain_edges,
    degrees,
    pair_edges,
    relabel_by_degree,
)
from peregrine_spark.operators.fsm import extend_patterns, fsm, mni_support
from peregrine_spark.patterns.small_graph import PatternGenerator, SmallGraph
from peregrine_spark.plans.compiler import compile_match
from tests.conftest import edges_df


def test_chain_edges(spark):
    df = spark.createDataFrame(
        [("g1", 3, 1), ("g1", 1, 2), ("g1", 2, 3), ("g2", 5, 1), ("g2", 7, 2)],
        "grp string, item long, ord long",
    )
    got = {(r["src"], r["dst"]) for r in chain_edges(df, "grp", "item", ["ord"]).collect()}
    # g1 sorted items: 1,2,3 -> edges (1,2),(2,3); g2: (5,7)
    assert got == {(1, 2), (2, 3), (5, 7)}


def test_pair_edges_cap(spark):
    rows = [("big", i) for i in range(10)] + [("small", 1), ("small", 2)]
    df = spark.createDataFrame(rows, "grp string, item long")
    got = {(r["src"], r["dst"]) for r in pair_edges(df, "grp", "item", max_group_size=5).collect()}
    assert got == {(1, 2)}  # the 10-item group is dropped by the skew guard


def test_relabel_by_degree_paths_agree(spark):
    e = edges_df(spark, [(10, 20), (10, 30), (10, 40), (20, 30), (50, 60)])
    rel_w, map_w = relabel_by_degree(e, use_window=True)
    rel_z, map_z = relabel_by_degree(e, use_window=False)
    mw = {(r["v"], r["old"], r["degree"]) for r in map_w.collect()}
    mz = {(r["v"], r["old"], r["degree"]) for r in map_z.collect()}
    assert mw == mz
    # vertex 10 (degree 3) must get id 1; degree sequence non-increasing in v
    by_v = dict(sorted((r[0], r[2]) for r in mw))
    assert by_v[1] == 3
    assert list(by_v.values()) == sorted(by_v.values(), reverse=True)
    # relabelled edge count preserved
    assert rel_w.count() == e.count() == rel_z.count()


def test_degrees(spark):
    e = edges_df(spark, [(1, 2), (1, 3), (2, 3)])
    d = {r["v"]: r["degree"] for r in degrees(e).collect()}
    assert d == {1: 2, 2: 2, 3: 2}


# -- FSM -------------------------------------------------------------------


def test_mni_support_wedge(spark):
    # star: center 1 with leaves 2,3,4 -> wedge matches: C(3,2)=3
    e = edges_df(spark, [(1, 2), (1, 3), (1, 4)])
    wedge = PatternGenerator.star(3)
    m = compile_match(symmetrized(e), wedge).df
    assert m.count() == 3
    # center domain {1}; leaf domain {2,3,4} -> support = 1
    assert mni_support(m, wedge) == 1


def test_mni_support_triangle(spark):
    e = edges_df(spark, [(1, 2), (1, 3), (2, 3), (3, 4), (2, 4)])
    tri = PatternGenerator.clique(3)
    m = compile_match(symmetrized(e), tri).df
    assert m.count() == 2
    # all positions share one orbit; distinct vertices in triangles: {1,2,3,4}
    assert mni_support(m, tri) == 4


def test_extend_patterns_dedup():
    edge = SmallGraph(edges=[(1, 2)]).set_label(1, 0).set_label(2, 0)
    ext = extend_patterns([edge], labels=[0])
    # up to iso: path-3 (one labelled variant) only — closing (1,2) is present
    assert len(ext) == 1
    assert ext[0].num_vertices == 3


def test_fsm_on_labelled_clique(spark):
    # two triangles sharing an edge, all label 0
    e = edges_df(spark, [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4)])
    verts = spark.createDataFrame([(v, 0) for v in [1, 2, 3, 4]], "v long, label long")
    res = fsm(e, verts, support=2, max_vertices=3)
    by_edges = {}
    for g, s in res:
        by_edges.setdefault((g.num_vertices, g.num_true_edges), s)
    # single-edge pattern: MNI = min over both positions' domains = 4
    assert by_edges[(2, 1)] == 4
    # wedge (2 edges): every vertex appears as center and leaf -> support 4
    assert by_edges[(3, 2)] == 4
    # triangle: both triangles cover {1,2,3,4} -> support 4... but
    # MNI uses orbit domains; triangle orbit = all vertices -> 4
    assert by_edges[(3, 3)] == 4


def test_relabel_default_is_scale_safe(spark):
    """The default relabel path must not funnel the vertex set through a
    single-partition global sort (VERDICT r1 scale-killer): no
    `Exchange SinglePartition` anywhere in the executed plan."""
    e = edges_df(spark, [(1, 2), (2, 3), (3, 4), (1, 4), (1, 3), (5, 6)])
    _, mapping = relabel_by_degree(e)
    plan = mapping._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
    # sanity: the opt-in window path IS the single-partition sort
    _, mapping_w = relabel_by_degree(e, use_window=True)
    plan_w = mapping_w._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" in plan_w


def test_fsm_discover_matches_explicit(spark):
    """Partially-labelled (-1) discovery (reference parity,
    core/PatternGenerator.cc:79-475) finds exactly the same frequent
    patterns and supports as explicit per-label enumeration."""
    from peregrine_spark.patterns.canonical import canonical_form
    from tests.oracle import er_graph

    pairs = er_graph(14, 0.3, 5)
    e = edges_df(spark, pairs)
    verts = spark.createDataFrame(
        [(v, v % 3) for v in sorted({x for p in pairs for x in p})],
        "v long, label long",
    )
    r_disc = fsm(e, verts, support=3, max_vertices=3, discover=True)
    r_expl = fsm(e, verts, support=3, max_vertices=3, discover=False)
    d1 = {canonical_form(g): s for g, s in r_disc}
    d2 = {canonical_form(g): s for g, s in r_expl}
    assert d1 == d2 and len(d1) > 3


def test_mni_support_by_label_matches_explicit(spark):
    """One-pass vector aggregation over the wildcard == per-label explicit
    matching (the reference's VectorAggregator semantics)."""
    from peregrine_spark.operators.fsm import mni_support_by_label
    from tests.oracle import er_graph

    pairs = er_graph(12, 0.4, 7)
    e = edges_df(spark, pairs)
    verts = spark.createDataFrame(
        [(v, v % 3) for v in sorted({x for p in pairs for x in p})],
        "v long, label long",
    )
    wedge_pl = SmallGraph(edges=[(1, 2), (1, 3)]).set_label(1, 0).set_label(2, 1).set_label(3, -1)
    m = compile_match(symmetrized(e), wedge_pl, vertices=verts).df
    per = mni_support_by_label(m, wedge_pl, 3, verts)
    assert set(per) == {2}  # only label 2 is outside the known set {0, 1}
    explicit = SmallGraph(edges=[(1, 2), (1, 3)]).set_label(1, 0).set_label(2, 1).set_label(3, 2)
    me = compile_match(symmetrized(e), explicit, vertices=verts).df
    assert per[2] == mni_support(me, explicit)


def test_anti_edge_compiles_to_left_anti_join(spark):
    e = edges_df(spark, [(1, 2), (1, 3), (2, 3), (1, 4)])
    p = SmallGraph(edges=[(1, 2), (1, 3)], anti_edges=[(2, 3)])
    m = compile_match(symmetrized(e), p).df
    plan = m._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan


def test_support_at_least_matches_full_count(spark):
    from peregrine_spark.operators.fsm import support_at_least
    from tests.oracle import er_graph

    pairs = er_graph(14, 0.3, 9)
    e = edges_df(spark, pairs)
    wedge = PatternGenerator.star(3)
    m = compile_match(symmetrized(e), wedge).df
    full = mni_support(m, wedge)
    assert full > 2
    for t in [1, full - 1, full, full + 1, full * 10]:
        assert support_at_least(e, wedge, t) == (full >= t), t


def test_support_at_least_early_terminates(spark):
    """The threshold probe must not aggregate the whole domain: its plan
    carries a limit (CollectLimit incremental execution) — the stop()
    analogue — and an absurd threshold bails on the cheap pre-probe."""
    from peregrine_spark.operators.fsm import support_at_least

    e = edges_df(spark, [(i, i + 1) for i in range(1, 30)])
    assert support_at_least(e, PatternGenerator.star(3), 10**9) is False


def test_mni_supports_level_matches_single(spark):
    """The batched level evaluator agrees with the per-pattern functions."""
    from peregrine_spark.graph.build import symmetrized
    from peregrine_spark.operators.fsm import (
        mni_support,
        mni_support_by_label,
        mni_supports_level,
    )
    from peregrine_spark.patterns.small_graph import SmallGraph
    from peregrine_spark.plans.compiler import compile_match
    from pyspark.sql import functions as F
    from tests.conftest import edges_df
    from tests.oracle import er_graph

    pairs = er_graph(30, 0.25, seed=17)
    e = edges_df(spark, pairs)
    sym = symmetrized(e)
    verts = (
        symmetrized(e).select(F.col("src").alias("v")).distinct()
        .select("v", (F.col("v") % 3).alias("label"))
    )
    lab_wedge = (
        SmallGraph(edges=[(1, 2), (1, 3)])
        .set_label(1, 0).set_label(2, 1).set_label(3, 2)
    )
    wild_wedge = (
        SmallGraph(edges=[(1, 2), (1, 3)])
        .set_label(1, 0).set_label(2, 1).set_label(3, -1)
    )
    items = [
        (0, (lambda: compile_match(sym, lab_wedge, vertices=verts).df), lab_wedge, None),
        (1, (lambda: compile_match(sym, wild_wedge, vertices=verts).df), wild_wedge, 3),
    ]
    got = mni_supports_level(items, verts, chunk=2)

    m0 = compile_match(sym, lab_wedge, vertices=verts).df
    exp0 = mni_support(m0, lab_wedge)
    m1 = compile_match(sym, wild_wedge, vertices=verts).df
    exp1 = mni_support_by_label(m1, wild_wedge, 3, verts)
    assert got.get((0, None), 0) == exp0
    for wl, s in exp1.items():
        assert got[(1, wl)] == s
    assert {k for k in got if k[0] == 1} == {(1, wl) for wl in exp1}


def test_fsm_seed_cap_refuses_high_cardinality_labels(spark):
    """Seed discovery collects O(|labels|^2) label pairs to the driver; a
    high-cardinality label column must be refused, not collected."""
    e = edges_df(spark, [(i, i + 1) for i in range(1, 30)])
    verts = symmetrized(e).select(F.col("src").alias("v")).distinct().select(
        "v", F.col("v").alias("label")  # label == vertex id: pathological
    )
    with pytest.raises(ValueError, match="label pairs"):
        fsm(e, verts, support=1, max_vertices=2, max_seeds=10)
