"""On-the-fly aggregation (C10): chunked counting with a mid-run readable
running aggregate and stop() parity (core/Peregrine.hh:453-463,
core/Aggregator.hh:173-176)."""

import math

import pytest

from peregrine_spark.operators.match import count, count_incremental
from peregrine_spark.patterns import PatternGenerator, SmallGraph

from tests.conftest import edges_df
from tests.oracle import er_graph


def K(n):
    return [(i, j) for i in range(1, n + 1) for j in range(i + 1, n + 1)]


def test_incremental_completes_to_exact_count(spark):
    pairs = er_graph(40, 0.25, seed=7)
    e = edges_df(spark, pairs)
    tri = PatternGenerator.clique(3)
    [(_, exact)] = count(e, tri)
    res = count_incremental(e, tri, chunks=5)
    assert res.completed
    assert res.chunks_run == 5
    assert res.value == exact
    # chunks partition the match space: per-chunk counts sum to the total
    assert sum(res.chunk_values) == exact


def test_incremental_single_chunk_equals_count(spark):
    e = edges_df(spark, K(6))
    res = count_incremental(e, PatternGenerator.clique(3), chunks=1)
    assert res.completed and res.value == math.comb(6, 3)


def test_incremental_threshold_stops_early(spark):
    # K(8) has 56 triangles; a threshold of 1 must stop before all chunks
    e = edges_df(spark, K(8))
    res = count_incremental(e, PatternGenerator.clique(3), chunks=8, threshold=1)
    assert not res.completed
    assert res.chunks_run < 8
    assert 1 <= res.value <= 56  # exact partial: a lower bound of the total


def test_incremental_callback_reads_running_value_and_stops(spark):
    pairs = er_graph(40, 0.25, seed=7)
    e = edges_df(spark, pairs)
    tri = PatternGenerator.clique(3)
    [(_, exact)] = count(e, tri)

    seen = []

    def on_update(running, i, n):
        seen.append((running, i, n))
        return running >= exact  # stop once everything has been seen

    res = count_incremental(e, tri, chunks=4, on_update=on_update)
    # running values are monotone partial sums, last one exact
    runnings = [r for r, _, _ in seen]
    assert runnings == sorted(runnings)
    assert runnings[-1] == exact == res.value
    assert all(n == 4 for _, _, n in seen)


def test_incremental_labelled_pattern(spark):
    pairs = [(1, 2), (2, 3), (1, 3), (3, 4)]
    e = edges_df(spark, pairs)
    vdf = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 20), (4, 20)], "v long, label int"
    )
    pat = SmallGraph(edges=[(1, 2), (2, 3)], labels={1: 10, 2: 20, 3: 20})
    [(_, exact)] = count(e, pat, vertices=vdf)
    res = count_incremental(e, pat, vertices=vdf, chunks=3)
    assert res.completed and res.value == exact


def test_incremental_empty_graph(spark):
    e = spark.createDataFrame([], "src long, dst long")
    res = count_incremental(e, PatternGenerator.clique(3), chunks=4)
    assert res.completed and res.value == 0 and res.chunks_run == 0


def test_incremental_rejects_bad_chunks(spark):
    e = edges_df(spark, K(4))
    with pytest.raises(ValueError):
        count_incremental(e, PatternGenerator.clique(3), chunks=0)
