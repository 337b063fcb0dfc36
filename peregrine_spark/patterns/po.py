"""Symmetry-breaking partial orders — the dedup-free uniqueness mechanism.

Semantic parity with the reference's partial-order discovery
(core/PO.cc:125-180 ``findPOs`` and automorphism sets :182-213): from the
pattern's automorphism group derive a set of ``id(u) < id(v)`` conditions
such that, of the |Aut| automorphic images of any subgraph occurrence,
exactly one satisfies all conditions. This is what lets the matcher count
each unique subgraph once without a DISTINCT.

Algorithm (the classical stabilizer-chain construction, as in the
GraphZero/Peregrine literature): walk vertices in ascending order; for the
current vertex v emit a condition (v < a(v)) for every automorphism a that
moves v, then restrict the group to the stabilizer of v; repeat until the
group is trivial.

Correctness guard: tests compare matcher counts against a brute-force
enumeration oracle on random graphs (tests/test_patterns.py).
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from peregrine_spark.patterns.canonical import automorphisms

if TYPE_CHECKING:  # pragma: no cover
    from peregrine_spark.patterns.small_graph import SmallGraph


def symmetry_conditions(g: "SmallGraph") -> list[tuple[int, int]]:
    """Pairs (l, gtr) meaning: require mapping[l] < mapping[gtr]."""
    auts = automorphisms(g)
    conds: set[tuple[int, int]] = set()
    for v in g.vertices:
        remaining = []
        for a in auts:
            if a[v] == v:
                remaining.append(a)
            else:
                conds.add((v, a[v]))
        auts = remaining
        if len(auts) <= 1:
            break
    return sorted(conds)


def automorphism_sets(g: "SmallGraph") -> list[list[int]]:
    """Orbits of the automorphism group (core/PO.cc:182-213) — the vertex
    sets interchangeable under symmetry. Used for MNI support (FSM): support
    is the min over orbit representatives of countDistinct(mapped vertex)."""
    auts = automorphisms(g)
    parent = {v: v for v in g.vertices}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a in auts:
        for v, w in a.items():
            rv, rw = find(v), find(w)
            if rv != rw:
                parent[max(rv, rw)] = min(rv, rw)
    orbits: dict[int, list[int]] = {}
    for v in g.vertices:
        orbits.setdefault(find(v), []).append(v)
    return [sorted(o) for o in sorted(orbits.values())]
