"""Driver-side counting math: vertex-induced ↔ edge-induced conversion.

Semantic parity with the reference's ``convert_counts``
(core/Peregrine.hh:1202-1218) and ``num_mappings``
(core/PatternMatching.hh:2149-2170): motif sets are matched WITHOUT
anti-edges (edge-induced — much cheaper, no anti-joins) and converted back
to vertex-induced counts by solving the downward-closure triangular system:

    E_p(G) = Σ_q  n(p, q) · V_q(G)        (q over same-size patterns)

where n(p, q) = number of spanning edge-subgraphs of q isomorphic to p
(n(p, p) = 1). Processed in descending edge count, so
V_p = E_p − Σ_{|E(q)|>|E(p)|} n(p, q) · V_q.

This is the reference's key trick for motif counting (the EuroSys'20
"pattern-aware" optimization) and it ports to Spark unchanged: the counts
vector is tiny driver-side data.
"""

from __future__ import annotations

import itertools

from peregrine_spark.patterns.canonical import canonical_form
from peregrine_spark.patterns.small_graph import SmallGraph

_nm_cache: dict = {}


def num_mappings(p: SmallGraph, q: SmallGraph) -> int:
    """n(p, q): spanning edge-subsets of q isomorphic to p (unlabelled)."""
    cf_p, cf_q = canonical_form(p), canonical_form(q)
    key = (cf_p, cf_q)
    if key in _nm_cache:
        return _nm_cache[key]
    k = q.num_vertices
    ep = p.num_true_edges
    count = 0
    if p.num_vertices == k and ep <= q.num_true_edges:
        q_edges = q.true_edges()
        for subset in itertools.combinations(q_edges, ep):
            cand = SmallGraph(edges=list(subset), num_vertices=k)
            if canonical_form(cand) == cf_p:
                count += 1
    _nm_cache[key] = count
    return count


def convert_counts(
    edge_induced: list[tuple[SmallGraph, int]]
) -> list[tuple[SmallGraph, int]]:
    """Edge-induced counts for ALL same-size connected patterns →
    vertex-induced counts (each pattern's count = occurrences as an
    *induced* subgraph)."""
    items = sorted(edge_induced, key=lambda t: -t[0].num_true_edges)
    vertex_counts: list[tuple[SmallGraph, int]] = []
    for i, (p, e_cnt) in enumerate(items):
        v = e_cnt
        for q, vq in vertex_counts:
            v -= num_mappings(p, q) * vq
        vertex_counts.append((p, v))
    return vertex_counts
