"""Match materialization (operators.match.output) — parity with the
reference's dir-per-pattern CSV sink incl. original-id remap
(core/OutputManager.hh:92-143)."""

from __future__ import annotations

from pyspark.sql import functions as F

from peregrine_spark.operators.match import match, output
from peregrine_spark.patterns.small_graph import PatternGenerator
from tests.conftest import edges_df


def test_output_parquet_roundtrip(spark, tmp_path):
    e = edges_df(spark, [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4)])
    tri = PatternGenerator.clique(3)
    written = output(e, tri, str(tmp_path / "out"), fmt="parquet")
    dirs = list((tmp_path / "out").iterdir())
    assert len(dirs) == 1  # one dir per pattern
    back = spark.read.parquet(str(dirs[0]))
    assert sorted(back.columns) == sorted(written.columns)
    got = {tuple(r) for r in back.collect()}
    expect = {tuple(r) for r in match(e, tri).collect()}
    assert got == expect == {(1, 2, 3), (2, 3, 4)}


def test_output_with_id_remap(spark, tmp_path):
    e = edges_df(spark, [(1, 2), (1, 3), (2, 3)])
    id_dict = spark.createDataFrame(
        [(1, "a:x"), (2, "b:y"), (3, "c:z")], "v long, key string"
    )
    out = output(
        e,
        PatternGenerator.clique(3),
        str(tmp_path / "remap"),
        id_dict=id_dict,
        fmt="parquet",
    )
    rows = {tuple(r) for r in out.collect()}
    assert rows == {("a:x", "b:y", "c:z")}
