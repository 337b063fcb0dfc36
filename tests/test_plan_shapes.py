"""Physical-plan regression tests — the scan-efficiency guarantees.

At 100 TB the difference between a query that pushes its filter into the
parquet scan (and prunes to the 2-3 columns it projects) and one that
reads everything is the whole I/O bill. These tests pin the plan
properties the engine's design claims, so a refactor that silently breaks
pushdown/pruning or drops a Python evaluator into a hot path fails CI —
the `.explain("formatted")` discipline, made executable.
"""

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from peregrine_spark.graph.from_tables import chain_edges
from peregrine_spark.text.analysis import lang_id, quality_score, token_stats_by

SF_DIR = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_lineitem_filter_pushdown_and_column_pruning(spark):
    """The edge-derivation scan: a `l_quantity <= 8` pre-filter must reach
    the parquet reader as a pushed filter, and the scan must read ONLY the
    chain/filter columns — none of the 7 unused lineitem columns."""
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").where("l_quantity <= 8")
    edges = chain_edges(li, "l_orderkey", "l_partkey", ["l_linenumber"])
    plan = plan_of(edges)
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert pushed and any("LessThanOrEqual(l_quantity,8" in l for l in pushed), pushed
    read_schema = next(l for l in plan.splitlines() if "ReadSchema" in l)
    for col in ("l_orderkey", "l_partkey", "l_quantity"):
        assert col in read_schema, read_schema
    for col in ("l_extendedprice", "l_returnflag", "l_shipdate", "l_comment"):
        assert col not in read_schema, read_schema


@pytest.mark.parametrize(
    "op", [quality_score, lang_id, lambda d: token_stats_by(d, "lang")]
)
def test_documents_column_pruning(spark, op):
    """Text-pipeline ops project doc_id/text(/lang) — the parquet scan must
    NOT read the unused `source` column."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = plan_of(op(docs))
    read_schema = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "text" in read_schema
    assert "source" not in read_schema, read_schema


def test_text_and_graph_hot_paths_stay_jvm_side(spark):
    """No Python evaluator of ANY kind (row-at-a-time BatchEvalPython,
    Arrow-batched ArrowEvalPython/MapInPandas) in the text ops or the
    triangle plan — everything is built-in column expressions that stay
    inside the JVM and whole-stage codegen. (Arrow kernels are allowed
    only where declared: the CSR gather-scatter, the multimodal decode.)"""
    from peregrine_spark.operators.triangles import local_clustering, triangle_count

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    edges = chain_edges(li, "l_orderkey", "l_partkey", ["l_linenumber"])
    for df in (
        quality_score(docs),
        lang_id(docs),
        triangle_count(edges),
        local_clustering(edges),
    ):
        plan = plan_of(df)
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
        assert "MapInPandas" not in plan


def test_output_remap_broadcasts_id_dict(spark, tmp_path):
    """output()'s original-id remap joins the id dictionary once per match
    column; with broadcast_dict (the default for dictionary-sized dicts)
    all k joins must be map-side BroadcastHashJoins — the match table is
    the widest table in the query, and a shuffle join per column would
    shuffle it k times at 100 TB."""
    from peregrine_spark.graph.build import canonical_edges
    from peregrine_spark.operators.match import output
    from peregrine_spark.patterns.small_graph import PatternGenerator

    pairs = [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4), (1, 4), (4, 5)]
    e = canonical_edges(
        spark.createDataFrame(pairs, "src long, dst long")
    )
    id_dict = spark.createDataFrame(
        [(v, f"orig_{v}") for v in range(1, 6)], "v long, key string"
    )
    m = output(e, PatternGenerator.clique(3), str(tmp_path / "out"), id_dict=id_dict)
    plan = plan_of(m)
    assert plan.count("BroadcastHashJoin") >= 3, plan
    # and the remap itself is value-correct
    rows = {tuple(sorted(r)) for r in m.collect()}
    assert ("orig_1", "orig_2", "orig_3") in rows
