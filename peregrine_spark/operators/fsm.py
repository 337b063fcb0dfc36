"""Frequent subgraph mining with MNI support — parity with apps/fsm.cc.

Reference loop (apps/fsm.cc:66-110): discover labelled seed edges → match
each candidate pattern aggregating a ``Domain`` (minimum node image / MNI
support, apps/Domain.hh:76-87) → keep patterns with support >= threshold →
extend the frequent ones by an edge/vertex (core/PatternGenerator.cc:79-475)
→ repeat up to the requested size.

Spark-native HOW:
* matching is the pattern→join compiler (plans/compiler.py);
* MNI support = min over automorphism orbits of the count of distinct data
  vertices appearing in that orbit's match columns — ``explode`` the orbit
  columns into one and ``countDistinct`` (exact distinct, like the
  reference's Roaring bitmaps; Spark's partial aggregation plays the role
  of the per-thread bitmap merge);
* extension + canonical dedup are driver-side pure Python (patterns are
  <= ~5 vertices — tiny).

MNI is anti-monotone, so threshold pruning between levels is sound.
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from peregrine_spark.graph.build import symmetrized
from peregrine_spark.patterns.canonical import canonical_form
from peregrine_spark.patterns.po import automorphism_sets
from peregrine_spark.patterns.small_graph import SmallGraph
from peregrine_spark.plans.compiler import compile_match


def mni_support(matches: DataFrame, pattern: SmallGraph) -> int:
    """Minimum node image support of a match table (columns v<p>).

    Domain of an automorphism orbit = distinct data vertices occurring in
    any of the orbit's positions (symmetry-broken matches still cover the
    full domain because orbit positions are interchangeable); support = min
    over orbits. One Spark job per orbit (orbits <= pattern size).
    """
    true_vs = {v for v in pattern.vertices if pattern.adj.get(v)}
    orbits = [o for o in automorphism_sets(pattern) if set(o) <= true_vs]
    support = None
    multi = len(orbits) > 1
    if multi:
        matches = matches.persist()  # one materialization, one agg per orbit
    try:
        for orbit in orbits:
            stacked = matches.select(
                F.explode(F.array(*[F.col(f"v{p}") for p in orbit])).alias("x")
            )
            n = stacked.agg(F.count_distinct("x").alias("n")).collect()[0]["n"]
            support = n if support is None else min(support, n)
    finally:
        if multi:
            matches.unpersist()
    return int(support or 0)


def extend_patterns(
    frequent: list[SmallGraph], labels: list[int]
) -> list[SmallGraph]:
    """Candidate generation: each frequent pattern grown by (a) one new
    labelled vertex attached to one existing vertex, or (b) one edge closing
    a non-adjacent pair. Canonical-form dedup across all candidates
    (reference: core/PatternGenerator.cc:79-475 with dedup :457-472)."""
    seen: dict = {}
    for g in frequent:
        nv = max(g.vertices) + 1
        for host in g.vertices:
            for lab in labels:
                h = g.copy().add_edge(host, nv).set_label(nv, lab)
                cf = canonical_form(h)
                seen.setdefault(cf, h)
        present = {tuple(e) for e in g.true_edges()}
        for u, v in itertools.combinations(g.vertices, 2):
            if (min(u, v), max(u, v)) not in present:
                h = g.copy().add_edge(u, v)
                cf = canonical_form(h)
                seen.setdefault(cf, h)
    return list(seen.values())


def fsm(
    edges: DataFrame,
    vertices: DataFrame,
    support: int,
    max_vertices: int = 3,
) -> list[tuple[SmallGraph, int]]:
    """Mine labelled patterns with MNI support >= ``support`` up to
    ``max_vertices`` pattern vertices.

    vertices: (v, label). Seeds are the distinct label pairs of actual
    edges (the DISCOVER_LABELS step, core/Peregrine.hh:552-568) — computed
    with one join+distinct instead of a discovery matching pass.
    """
    sym = symmetrized(edges)
    lab = vertices.select("v", "label")
    seed_pairs = (
        edges.join(lab.withColumnsRenamed({"v": "src", "label": "la"}), "src")
        .join(lab.withColumnsRenamed({"v": "dst", "label": "lb"}), "dst")
        .select(
            F.least("la", "lb").alias("la"), F.greatest("la", "lb").alias("lb")
        )
        .distinct()
        .collect()
    )
    labels = sorted({r["la"] for r in seed_pairs} | {r["lb"] for r in seed_pairs})
    candidates = []
    seen: dict = {}
    for r in seed_pairs:
        g = SmallGraph(edges=[(1, 2)]).set_label(1, int(r["la"])).set_label(2, int(r["lb"]))
        seen.setdefault(canonical_form(g), g)
    candidates = list(seen.values())

    results: list[tuple[SmallGraph, int]] = []
    attempted = {canonical_form(g) for g in candidates}
    while candidates:
        frequent: list[SmallGraph] = []
        for g in candidates:
            m = compile_match(sym, g, vertices=lab).df
            s = mni_support(m, g)
            if s >= support:
                frequent.append(g)
                results.append((g, s))
        if not frequent:
            break
        # extend frequent patterns: a new labelled vertex (vertex growth) or
        # a closing edge (same vertex count) — loop ends when nothing new
        # fits under max_vertices (edge closures are finitely many)
        nxt = []
        for h in extend_patterns(frequent, labels):
            cf = canonical_form(h)
            if h.num_vertices <= max_vertices and cf not in attempted:
                attempted.add(cf)
                nxt.append(h)
        candidates = nxt
    return results
