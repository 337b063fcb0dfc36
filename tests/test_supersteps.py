"""Superstep engine: PageRank/CC/LP vs pure-Python oracles + resume."""

import itertools
import json

import pytest

from peregrine_spark.supersteps import (
    SuperstepEngine,
    bfs_hops,
    connected_components,
    label_propagation,
    pagerank,
    pagerank_csr,
)

from tests.conftest import edges_df
from tests.oracle import brute_components, brute_pagerank, er_graph


def two_cliques_bridge():
    k5 = list(itertools.combinations(range(1, 6), 2))
    k4 = list(itertools.combinations(range(10, 14), 2))
    return k5 + k4 + [(5, 10)], k5 + k4  # with and without bridge


def test_pagerank_matches_oracle(spark):
    pairs = er_graph(40, 0.15, seed=31)
    e = edges_df(spark, pairs)
    res = pagerank(e, max_iters=15, tol=0.0)
    got = {r["v"]: r["rank"] for r in res.state.collect()}
    truth = brute_pagerank(pairs, iters=15)
    assert set(got) == set(truth)
    for v in truth:
        assert abs(got[v] - truth[v]) < 1e-6, v
    assert abs(sum(got.values()) - 1.0) < 1e-6


def test_pagerank_csr_equals_dataframe_strategy(spark):
    pairs = er_graph(35, 0.2, seed=37)
    e = edges_df(spark, pairs)
    a = pagerank(e, max_iters=8, tol=0.0)
    b = pagerank_csr(e, max_iters=8, tol=0.0, chunk_size=4)  # force multi-chunk
    ga = {r["v"]: r["rank"] for r in a.state.collect()}
    gb = {r["v"]: r["rank"] for r in b.state.collect()}
    assert set(ga) == set(gb)
    for v in ga:
        assert abs(ga[v] - gb[v]) < 1e-9, v


def test_pagerank_uniform_on_regular_graphs(spark):
    ring = [(i, i % 10 + 1) for i in range(1, 11)]
    res = pagerank(edges_df(spark, ring), max_iters=10, tol=1e-12)
    ranks = [r["rank"] for r in res.state.collect()]
    assert all(abs(x - 0.1) < 1e-9 for x in ranks)


def test_connected_components_exact(spark):
    bridged, unbridged = two_cliques_bridge()
    res = connected_components(edges_df(spark, unbridged))
    got = dict((r["v"], r["comp"]) for r in res.state.collect())
    assert got == brute_components(unbridged)
    assert len(set(got.values())) == 2
    res2 = connected_components(edges_df(spark, bridged))
    got2 = dict((r["v"], r["comp"]) for r in res2.state.collect())
    assert got2 == brute_components(bridged)
    assert len(set(got2.values())) == 1
    assert res2.converged


def test_connected_components_er(spark):
    pairs = er_graph(50, 0.05, seed=41)
    got = dict(
        (r["v"], r["comp"])
        for r in connected_components(edges_df(spark, pairs)).state.collect()
    )
    assert got == brute_components(pairs)


def brute_lp(pairs, iters):
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    lab = {v: v for v in adj}
    for _ in range(iters):
        new = {}
        for v in adj:
            counts = {}
            for u in adj[v]:
                counts[lab[u]] = counts.get(lab[u], 0) + 1
            best = max(counts.items(), key=lambda kv: (kv[1], -kv[0]))
            new[v] = best[0]
        if new == lab:
            break
        lab = new
    return lab


def test_label_propagation_matches_oracle(spark):
    pairs, _ = two_cliques_bridge()
    res = label_propagation(edges_df(spark, pairs), max_iters=4)
    got = dict((r["v"], r["label"]) for r in res.state.collect())
    truth = brute_lp(pairs, res.iterations)
    assert got == truth


def test_personalized_pagerank_matches_oracle(spark):
    pairs = er_graph(35, 0.15, seed=53)
    e = edges_df(spark, pairs)
    for sources in ([1], [1, 7, 20]):
        res = pagerank(e, max_iters=15, tol=0.0, sources=sources)
        got = {r["v"]: r["rank"] for r in res.state.collect()}
        truth = brute_pagerank(pairs, iters=15, sources=sources)
        assert set(got) == set(truth)
        for v in truth:
            assert abs(got[v] - truth[v]) < 1e-6, (sources, v)
        # mass conserves to 1 and concentrates near the sources
        assert abs(sum(got.values()) - 1.0) < 1e-6
        assert max(got, key=got.get) in sources
    # sources absent from the graph are an error, not a silent uniform fall-back
    with pytest.raises(ValueError):
        pagerank(e, max_iters=2, sources=[10_000])


def test_bfs_hops_matches_oracle(spark):
    from tests.oracle import brute_bfs

    pairs = er_graph(40, 0.1, seed=41)  # sparse: nontrivial hops + unreached
    verts = {v for p in pairs for v in p}
    e = edges_df(spark, pairs)
    for sources in ([1], [1, 40]):
        res = bfs_hops(e, sources, max_iters=50)
        assert res.converged
        got = {r["v"]: r["dist"] for r in res.state.collect()}
        truth = brute_bfs(pairs, sources)
        assert set(got) == verts
        for v in verts:
            assert got[v] == truth.get(v), (sources, v)  # None == unreached


def test_bfs_hops_closed_forms(spark):
    # chain: dist from 1 is v-1; the final superstep settles one vertex
    chain = [(i, i + 1) for i in range(1, 8)]
    res = bfs_hops(edges_df(spark, chain), [1], max_iters=20)
    assert res.converged
    assert {r["v"]: r["dist"] for r in res.state.collect()} == {
        v: v - 1 for v in range(1, 9)
    }
    # bridged cliques: k4 side is 1 hop from the bridge, 2 from the k5 core
    pairs, _ = two_cliques_bridge()
    res = bfs_hops(edges_df(spark, pairs), [1], max_iters=20)
    got = {r["v"]: r["dist"] for r in res.state.collect()}
    assert got[5] == 1 and got[10] == 2
    assert all(got[v] == 3 for v in (11, 12, 13))
    # a source outside the graph's vertex set is ignored: nothing reached
    res = bfs_hops(edges_df(spark, chain), [999], max_iters=5)
    assert res.converged
    assert all(r["dist"] is None for r in res.state.collect())


def test_bfs_resume_equivalence(spark, tmp_path):
    pairs = er_graph(30, 0.12, seed=47)
    e = edges_df(spark, pairs)
    full = bfs_hops(e, [1], max_iters=20).state.collect()
    eng = SuperstepEngine(spark, str(tmp_path / "bfs"), run_id="bfs")
    bfs_hops(e, [1], max_iters=2, engine=eng)
    resumed = bfs_hops(e, [1], max_iters=20, engine=eng, resume=True)
    assert {(r["v"], r["dist"]) for r in resumed.state.collect()} == {
        (r["v"], r["dist"]) for r in full
    }
    # the resumed run restarted from the step-2 checkpoint, not from scratch
    steps = sorted(p.name for p in (tmp_path / "bfs" / "bfs").glob("step=*"))
    assert steps and steps[0] == "step=00000"


def test_randomized_vertex_analytics_sweep(spark):
    """Seeded randomized sweep of the round-5 vertex-analytics surface
    (bfs_hops / ktruss / local_clustering / personalized pagerank) over
    graphs of varying density vs their brute oracles — the same
    sweep-through-the-public-surface discipline as the pattern sweep in
    test_matching: fixed fixtures pin single points, this regression-tests
    the space between them."""
    import random as _random

    from peregrine_spark.operators.triangles import ktruss, local_clustering
    from tests.oracle import brute_bfs, brute_ktruss

    rng = _random.Random(777)
    for trial in range(4):
        n = rng.randint(12, 26)
        p = rng.choice([0.12, 0.25, 0.4])
        pairs = er_graph(n, p, seed=rng.randint(1, 10_000))
        if not pairs:
            continue
        verts = sorted({v for pr in pairs for v in pr})
        e = edges_df(spark, pairs)

        src = rng.choice(verts)
        res = bfs_hops(e, [src], max_iters=60)
        assert res.converged
        got = {r["v"]: r["dist"] for r in res.state.collect()}
        truth = brute_bfs(pairs, [src])
        assert all(got[v] == truth.get(v) for v in verts), (trial, src)

        k = rng.randint(3, 5)
        got_t = {(r["src"], r["dst"]) for r in ktruss(e, k).collect()}
        assert got_t == brute_ktruss(pairs, k), (trial, k)

        adj = {}
        for a, b in pairs:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        for r in local_clustering(e).collect():
            nbrs = adj[r["v"]]
            t = sum(
                1 for u, w in itertools.combinations(sorted(nbrs), 2) if w in adj[u]
            )
            d = len(nbrs)
            want = round(2.0 * t / (d * (d - 1)), 6) if d >= 2 else 0.0
            assert r["triangles"] == t and abs(r["clustering"] - want) < 1e-9, trial

        ppr = pagerank(e, max_iters=8, tol=0.0, sources=[src])
        got_r = {r["v"]: r["rank"] for r in ppr.state.collect()}
        truth_r = brute_pagerank(pairs, iters=8, sources=[src])
        assert all(abs(got_r[v] - truth_r[v]) < 1e-6 for v in verts), (trial, src)


def test_checkpoint_resume_equivalence(spark, tmp_path):
    pairs = er_graph(30, 0.15, seed=43)
    e = edges_df(spark, pairs)
    full = pagerank(
        e,
        max_iters=10,
        tol=0.0,
        engine=SuperstepEngine(spark, str(tmp_path / "full"), run_id="pr"),
    )
    # partial run: 4 supersteps, then resume to 10
    eng = SuperstepEngine(spark, str(tmp_path / "part"), run_id="pr")
    pagerank(e, max_iters=4, tol=0.0, engine=eng)
    resumed = pagerank(e, max_iters=10, tol=0.0, engine=eng, resume=True)
    gf = {r["v"]: r["rank"] for r in full.state.collect()}
    gr = {r["v"]: r["rank"] for r in resumed.state.collect()}
    for v in gf:
        assert abs(gf[v] - gr[v]) < 1e-12

    # lineage + metrics recorded per superstep
    lines = [
        json.loads(l)
        for l in (tmp_path / "part" / "pr" / "metrics.jsonl").read_text().splitlines()
    ]
    assert [m["iteration"] for m in lines] == list(range(10))
    for m in lines:
        assert m["partitions"] and all(
            "checksum" in p and p["rows"] > 0 for p in m["partitions"]
        )
    # resume skipped the first 4 completed supersteps
    steps = sorted(p.name for p in (tmp_path / "part" / "pr").glob("step=*"))
    assert len(steps) == 10


def test_resume_after_convergence_is_noop(spark, tmp_path):
    pairs, _ = two_cliques_bridge()
    e = edges_df(spark, pairs)
    eng = SuperstepEngine(spark, str(tmp_path), run_id="cc")
    r1 = connected_components(e, engine=eng)
    assert r1.converged
    r2 = connected_components(e, engine=eng, resume=True)
    assert r2.converged
    assert {tuple(r) for r in r1.state.collect()} == {
        tuple(r) for r in r2.state.collect()
    }


def test_cc_contraction_matches_minprop(spark):
    """large-star/small-star == min-propagation on a random graph."""
    from tests.oracle import er_graph

    pairs = er_graph(40, 0.06, 11)
    e = edges_df(spark, pairs)
    a = connected_components(e, max_iters=64).state
    b = connected_components(e, max_iters=20, strategy="contraction").state
    assert {(r["v"], r["comp"]) for r in a.collect()} == {
        (r["v"], r["comp"]) for r in b.collect()
    }


def test_cc_contraction_logarithmic_rounds_on_path(spark):
    """A 60-vertex path has diameter 59: min-prop needs ~59 rounds, the
    contraction variant must finish in O(log^2 n) — give it 12."""
    e = edges_df(spark, [(i, i + 1) for i in range(1, 60)])
    res = connected_components(e, max_iters=12, strategy="contraction")
    assert res.converged and res.iterations <= 12
    assert {(r["v"], r["comp"]) for r in res.state.collect()} == {
        (v, 1) for v in range(1, 61)
    }


def test_auto_shuffle_partitions_regimes(spark):
    from peregrine_spark.supersteps.engine import auto_shuffle_partitions

    cores = spark.sparkContext.defaultParallelism
    # tiny input: scheduling floor dominates -> far fewer than core count
    assert auto_shuffle_partitions(spark, 1_000) == 1
    # medium: one partition per ~100k rows up to the core count
    assert auto_shuffle_partitions(spark, 300_000) == min(cores, 3)
    # beyond cores*2M rows: ~2M-row partitions win (spill safety at scale)
    big = auto_shuffle_partitions(spark, cores * 2_000_000 * 3)
    assert big == cores * 3


def test_shuffle_partitions_context_restores(spark):
    from peregrine_spark.supersteps.engine import shuffle_partitions

    key = "spark.sql.shuffle.partitions"
    before = spark.conf.get(key)
    with shuffle_partitions(spark, 7):
        assert spark.conf.get(key) == "7"
    assert spark.conf.get(key) == before
    with shuffle_partitions(spark, None):
        assert spark.conf.get(key) == before


def test_operators_accept_pinned_partitions(spark):
    # the scaling-evidence path pins the layout on both sides
    pairs = er_graph(30, 0.2, seed=91)
    e = edges_df(spark, pairs)
    r1 = pagerank(e, max_iters=5, tol=0.0, n_partitions=3)
    r2 = pagerank(e, max_iters=5, tol=0.0)
    a = {r["v"]: r["rank"] for r in r1.state.collect()}
    b = {r["v"]: r["rank"] for r in r2.state.collect()}
    assert all(abs(a[v] - b[v]) < 1e-12 for v in a)
    c1 = connected_components(e, n_partitions=2)
    c2 = connected_components(e)
    assert {tuple(r) for r in c1.state.collect()} == {
        tuple(r) for r in c2.state.collect()
    }


def test_resume_from_torn_checkpoint(spark, tmp_path):
    """Kill-mid-write simulation: a superstep whose parquet dir lost its
    _SUCCESS marker (exactly what a mid-write kill leaves behind) must be
    treated as incomplete — resume restarts from the last COMPLETE step,
    re-runs the torn one, and the final ranks equal an uninterrupted run.
    This is the north-rule fault-tolerance path end-to-end: atomicity via
    the commit marker, idempotent overwrite of the torn step, metrics
    truncated to the resumed-from iteration."""
    pairs = er_graph(30, 0.15, seed=47)
    e = edges_df(spark, pairs)
    full = pagerank(
        e,
        max_iters=8,
        tol=0.0,
        engine=SuperstepEngine(spark, str(tmp_path / "full"), run_id="pr"),
    )

    eng = SuperstepEngine(spark, str(tmp_path / "part"), run_id="pr")
    pagerank(e, max_iters=5, tol=0.0, engine=eng)
    # tear the LAST checkpoint: step 4's _SUCCESS vanishes mid-write
    torn = tmp_path / "part" / "pr" / "step=00004"
    (torn / "_SUCCESS").unlink()
    assert eng._complete_steps() == [0, 1, 2, 3]

    resumed = pagerank(e, max_iters=8, tol=0.0, engine=eng, resume=True)
    gf = {r["v"]: r["rank"] for r in full.state.collect()}
    gr = {r["v"]: r["rank"] for r in resumed.state.collect()}
    assert gf.keys() == gr.keys()
    for v in gf:
        assert abs(gf[v] - gr[v]) < 1e-6

    # the torn step was re-run and re-committed atomically
    assert (torn / "_SUCCESS").exists()
    lines = [
        json.loads(l)
        for l in (tmp_path / "part" / "pr" / "metrics.jsonl").read_text().splitlines()
    ]
    # metrics: 0..4 from the first run, then 4..7 re-appended by the resume
    assert [m["iteration"] for m in lines] == [0, 1, 2, 3, 4, 4, 5, 6, 7]


def test_superstep_engine_releases_checkpoints(spark):
    """Each superstep localCheckpoints its state for plan truncation; the
    engine must release the superseded round's blocks — otherwise a long
    run retains one state table PER SUPERSTEP in executor storage.
    DataFrame.unpersist() is a silent no-op on checkpoint blocks (they live
    on the LogicalRDD), hence session.release_checkpoint."""

    def persistent_ids():
        return {
            int(i)
            for i in spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray()
        }

    pairs = er_graph(40, 0.15, seed=33)
    e = edges_df(spark, pairs)
    before = persistent_ids()
    res = pagerank(e, max_iters=12, tol=0.0)
    res.state.count()
    after = persistent_ids()
    # at most the FINAL state's checkpoint may remain live (the caller owns
    # the result); the 11 superseded rounds must all be gone
    assert len(after - before) <= 1, after - before
