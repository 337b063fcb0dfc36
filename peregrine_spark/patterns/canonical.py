"""Canonical forms and automorphisms for tiny pattern graphs.

The reference vendors the bliss canonical-labelling library
(core/bliss-0.73, used via core/Graph.hh:146-186) — overkill for patterns
of ≤ 9 vertices. We brute-force over invariant-class-respecting bijections:
vertices are first partitioned by an isomorphism-invariant signature
(label, degree, anti-degree, sorted neighbour degrees); any isomorphism
must respect these classes, so minimizing the encoding over class-respecting
bijections yields a proper canonical form at factorial-only-within-class
cost. Fine at this size; patterns are driver-side objects.
"""

from __future__ import annotations

import itertools
from functools import lru_cache
from typing import TYPE_CHECKING

if TYPE_CHECKING:  # pragma: no cover
    from peregrine_spark.patterns.small_graph import SmallGraph


def _invariant(g: "SmallGraph", v: int):
    deg = len(g.adj.get(v, ()))
    adeg = len(g.anti_adj.get(v, ()))
    nbr_degs = tuple(sorted(len(g.adj.get(u, ())) for u in g.adj.get(v, ())))
    anbr_degs = tuple(sorted(len(g.adj.get(u, ())) for u in g.anti_adj.get(v, ())))
    label = g.labels.get(v, -2)  # -2 = unlabelled (distinct from -1 wildcard)
    return (label, deg, adeg, nbr_degs, anbr_degs)


def _class_partition(g: "SmallGraph"):
    """Vertices grouped by invariant, classes ordered by invariant value.
    Returns (classes, position_blocks): class i's vertices map to the
    contiguous position block i (positions 1..n)."""
    vs = g.vertices
    by_inv: dict = {}
    for v in vs:
        by_inv.setdefault(_invariant(g, v), []).append(v)
    classes = [sorted(by_inv[k]) for k in sorted(by_inv)]
    blocks = []
    pos = 1
    for c in classes:
        blocks.append(list(range(pos, pos + len(c))))
        pos += len(c)
    return classes, blocks


def _class_respecting_perms(g: "SmallGraph"):
    """Yield bijections vertex→position(1..n) respecting invariant classes."""
    classes, blocks = _class_partition(g)
    pools = [itertools.permutations(c) for c in classes]
    for combo in itertools.product(*pools):
        perm = {}
        for cls_vertices, positions in zip(combo, blocks):
            for v, p in zip(cls_vertices, positions):
                perm[v] = p
        yield perm


def _encode(g: "SmallGraph", perm: dict[int, int]):
    edges = tuple(
        sorted((min(perm[u], perm[v]), max(perm[u], perm[v])) for u, v in g.true_edges())
    )
    anti = tuple(
        sorted(
            (min(perm[u], perm[v]), max(perm[u], perm[v])) for u, v in g.anti_edge_list()
        )
    )
    labels = tuple(sorted((perm[v], l) for v, l in g.labels.items()))
    return (g.num_vertices, edges, anti, labels)


def canonical_form(g: "SmallGraph"):
    """Hashable canonical encoding — equal iff graphs are isomorphic
    (respecting labels and anti-edges)."""
    return min(_encode(g, p) for p in _class_respecting_perms(g))


def canonical_relabel(g: "SmallGraph") -> "SmallGraph":
    """The graph relabelled into its canonical vertex order."""
    best = min(_class_respecting_perms(g), key=lambda p: _encode(g, p))
    return g.relabel(best)


def automorphisms(g: "SmallGraph") -> list[dict[int, int]]:
    """All label/anti-edge-preserving self-bijections (as dicts v→v)."""
    vs = g.vertices
    edge_set = set(g.true_edges())
    anti_set = set(g.anti_edge_list())
    out = []
    classes, _ = _class_partition(g)
    pools = [itertools.permutations(c) for c in classes]
    for combo in itertools.product(*pools):
        perm = {}
        for cls_vertices, images in zip(classes, combo):
            for v, w in zip(cls_vertices, images):
                perm[v] = w
        ok = all(
            (min(perm[u], perm[v]), max(perm[u], perm[v])) in edge_set
            for u, v in edge_set
        ) and all(
            (min(perm[u], perm[v]), max(perm[u], perm[v])) in anti_set
            for u, v in anti_set
        )
        if ok and all(g.labels.get(perm[v], -2) == g.labels.get(v, -2) for v in vs):
            out.append(perm)
    return out
