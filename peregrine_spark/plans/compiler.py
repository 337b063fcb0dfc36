"""Pattern → Catalyst join plan compiler.

This is the Spark-native replacement for the reference's matching engine:
where the reference walks a DFS with sorted-set intersection kernels
(core/PatternMatching.hh:1312-1399 ``map_into``, :1115-1217
``get_next_cand``), we compile the pattern into a *k-way self-join of the
edge table* and let Catalyst/AQE pick physical strategies:

  * one INNER equi-join per pattern vertex beyond the first edge (M1),
  * LEFT SEMI joins for additional adjacency constraints (M2/M3),
  * LEFT ANTI joins for anti-edges (M4) and anti-vertices (M9),
  * symmetry-breaking ``<`` predicates from the automorphism group (M5),
  * bound pruning via the TRANSITIVE CLOSURE of that partial order (M6,
    core/PatternMatching.hh:524-546): every implied (l, g) pair is applied
    at the earliest join level where both are matched — the reference's
    (max lower, min upper) candidate window re-expressed as predicates
    Catalyst pushes into the join,
  * injectivity ``!=`` predicates (M7; pairs the closure orders are
    implied and skipped),
  * label equi-filters via the vertex table (M8).

Matching-order heuristic (replacing the reference's vertex-cover matching
orders, core/Graph.hh:1477-1605): start at the max-degree pattern vertex,
then repeatedly add the vertex with the most already-matched neighbours
(maximally-constrained next — each join is as selective as possible, so
intermediate row counts stay small; ties by pattern degree then id).

Match rows use columns ``v{p}`` (long) for each true pattern vertex p —
the positional ``mapping`` of the reference's CompleteMatch
(core/PatternMatching.hh:154-164).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from peregrine_spark.patterns.small_graph import SmallGraph
from peregrine_spark.patterns.po import symmetry_conditions

# Pre-filter ordered join legs to the src<dst (or >) half of the
# symmetrized table. Off by default: measured at SF=0.1 it LOSES ~15%
# (see BENCH.md round-3 notes) — the predicate re-evaluates the union on
# every leg scan while the join cost is dominated by the intermediate
# match-row shuffles the filter cannot shrink (the `<` predicate applied
# after the join removes the same rows either way).
HALF_LEGS = False


def _vcol(p: int) -> str:
    return f"v{p}"


def _order_closure(conds: list[tuple[int, int]]) -> set[tuple[int, int]]:
    """Transitive closure of the (l < g) symmetry partial order. The
    closure is the Spark-side 'bound window' (M6,
    core/PatternMatching.hh:524-546): the reference narrows each
    candidate scan to (max lower bound, min upper bound) computed from
    ALL ordered predecessors/successors — which is exactly the set of
    implied pairs, not just the emitted ones. Patterns are <= 9 vertices,
    so the O(n^3) closure is free."""
    lt = set(conds)
    changed = True
    while changed:
        changed = False
        for (a, b) in list(lt):
            for (c, d) in list(lt):
                if b == c and (a, d) not in lt:
                    lt.add((a, d))
                    changed = True
    return lt


@dataclass
class MatchPlan:
    """Compiled plan metadata (driver-side 'AnalyzedPattern' analogue)."""

    pattern: SmallGraph
    order: list[int]
    conditions: list[tuple[int, int]]
    df: DataFrame = field(repr=False)

    @property
    def match_columns(self) -> list[str]:
        return [_vcol(p) for p in sorted(self.order)]


def matching_order(pattern: SmallGraph) -> list[int]:
    """Greedy maximally-constrained ordering over true-edge vertices.
    Anti-vertices (anti-edges only) are excluded — they become anti-join
    constraints, never enumerated."""
    true_vs = [v for v in pattern.vertices if pattern.adj.get(v)]
    if not true_vs:
        raise ValueError("pattern has no true edges")
    start = max(true_vs, key=lambda v: (len(pattern.adj[v]), -v))
    order = [start]
    remaining = set(true_vs) - {start}
    while remaining:
        def score(v):
            matched_nbrs = len(pattern.adj[v] & set(order))
            return (matched_nbrs, len(pattern.adj[v]), -v)

        nxt = max(remaining, key=score)
        if not pattern.adj[nxt] & set(order):
            raise ValueError("pattern's true-edge graph is disconnected")
        order.append(nxt)
        remaining.remove(nxt)
    return order


def compile_match(
    edges_sym: DataFrame,
    pattern: SmallGraph,
    vertices: DataFrame | None = None,
    apply_symmetry: bool = True,
    edges_canonical: DataFrame | None = None,
) -> MatchPlan:
    """Compile ``pattern`` into a DataFrame of unique matches.

    edges_sym: symmetrized edge table (src, dst) — both directions.
    vertices: (v, label) table, required for labelled patterns.
    apply_symmetry=False enumerates all automorphic images (for debugging /
    oracle cross-checks).
    edges_canonical: the CANONICAL (src < dst, each undirected edge once)
    base table edges_sym was built from, when the caller has it. Join legs
    whose endpoints the symmetry partial order relates then read this table
    directly — half the scan and half the join build side, with the ``<``
    predicate enforced by the data orientation instead of a filter. This is
    the join-world form of the reference's bounded (ordered) adjacency scan
    (core/PatternMatching.hh:524-546) that actually pays: the round-3
    ``HALF_LEGS`` variant filtered the symmetrized UNION per leg and lost
    ~15% re-scanning both halves; reading the base table never touches the
    swapped half at all.
    """
    order = matching_order(pattern)
    conds = symmetry_conditions(pattern) if apply_symmetry else []
    # M6: the closure supplies bound predicates at the EARLIEST level where
    # both endpoints are matched (a chain l<m<g constrains (l, g) even
    # before m joins) and lets ordered join legs read the half edge table
    lt = _order_closure(conds)
    cond_set = {(min(a, b), max(a, b)) for a, b in lt}
    adj_pairs = set(pattern.true_edges())

    def leg(lead: int, pk: int) -> DataFrame:
        """Edge leg binding (lead -> pk). When the partial order relates the
        two endpoints the leg reads the canonical half directly (see
        ``edges_canonical`` in the docstring) — the ordered adjacency scan,
        half the rows, the ``<`` enforced by orientation."""
        if edges_canonical is not None:
            if (lead, pk) in lt:  # v_lead < v_pk in every surviving match
                return edges_canonical.select(
                    F.col("src").alias(_vcol(lead)), F.col("dst").alias(_vcol(pk))
                )
            if (pk, lead) in lt:
                return edges_canonical.select(
                    F.col("dst").alias(_vcol(lead)), F.col("src").alias(_vcol(pk))
                )
        e = edges_sym
        if HALF_LEGS:
            if (lead, pk) in lt:
                e = edges_sym.where(F.col("src") < F.col("dst"))
            elif (pk, lead) in lt:
                e = edges_sym.where(F.col("src") > F.col("dst"))
        return e.select(F.col("src").alias(_vcol(lead)), F.col("dst").alias(_vcol(pk)))
    labelling = pattern.labelling().value if pattern.labels else "unlabelled"

    known_labels = sorted({l for l in pattern.labels.values() if l != -1})

    def label_filter(df: DataFrame, p: int) -> DataFrame:
        lab = pattern.labels.get(p)
        if lab is None or vertices is None:
            return df
        vl = vertices.select(F.col("v").alias(_vcol(p)), F.col("label").alias(f"_l{p}"))
        df = df.join(vl, _vcol(p))
        if lab == -1:
            df = df.where(~F.col(f"_l{p}").isin(known_labels) if known_labels else F.lit(True))
        else:
            df = df.where(F.col(f"_l{p}") == F.lit(lab))
        return df.drop(f"_l{p}")

    # pairs already guaranteed by a half-table leg filter — their `<`
    # predicate would be redundant plan noise
    enforced: set[tuple[int, int]] = set()

    def leg_enforces(lead: int, pk: int) -> None:
        if edges_canonical is None and not HALF_LEGS:
            return  # unfiltered legs enforce nothing — predicates must apply
        if (lead, pk) in lt:
            enforced.add((lead, pk))
        elif (pk, lead) in lt:
            enforced.add((pk, lead))

    # seed: first pattern edge (order[0], order[1])
    p0, p1 = order[0], order[1]
    m = leg(p0, p1)
    leg_enforces(p0, p1)
    matched = [p0, p1]
    # apply any conditions valid on the seed (closure pairs included)
    for (l, g) in sorted(lt):
        if l in matched and g in matched and (l, g) not in enforced:
            m = m.where(F.col(_vcol(l)) < F.col(_vcol(g)))
            enforced.add((l, g))
    m = label_filter(label_filter(m, p0), p1)

    for pk in order[2:]:
        nbrs = sorted(pattern.adj[pk] & set(matched))
        lead, rest = nbrs[0], nbrs[1:]
        m = m.join(leg(lead, pk), _vcol(lead))
        leg_enforces(lead, pk)
        # extra adjacency constraints: semi-joins against the edge table
        for nb in rest:
            m = m.join(leg(nb, pk), [_vcol(nb), _vcol(pk)], "left_semi")
            leg_enforces(nb, pk)
        # symmetry/bound conditions that became applicable (closure pairs:
        # a chain l<m<g binds (l, g) even when m is not matched yet)
        for (l, g) in sorted(lt):
            if (
                (l == pk and g in matched) or (g == pk and l in matched)
            ) and (l, g) not in enforced:
                m = m.where(F.col(_vcol(l)) < F.col(_vcol(g)))
                enforced.add((l, g))
        # injectivity for non-adjacent, non-ordered matched pairs
        for q in matched:
            pair = (min(q, pk), max(q, pk))
            if pair not in adj_pairs and pair not in cond_set:
                m = m.where(F.col(_vcol(q)) != F.col(_vcol(pk)))
        m = label_filter(m, pk)
        matched.append(pk)

    # anti-edges between true vertices → anti-join against the edge table
    # (the ordered-pair case reads the canonical half: if v_a < v_b in every
    # match, the edge — when it exists — is the canonical row (v_a, v_b))
    for (a, b) in pattern.anti_edge_list():
        if a in matched and b in matched:
            if edges_canonical is not None and (a, b) in lt:
                e = edges_canonical.select(
                    F.col("src").alias(_vcol(a)), F.col("dst").alias(_vcol(b))
                )
            elif edges_canonical is not None and (b, a) in lt:
                e = edges_canonical.select(
                    F.col("dst").alias(_vcol(a)), F.col("src").alias(_vcol(b))
                )
            else:
                e = edges_sym.select(
                    F.col("src").alias(_vcol(a)), F.col("dst").alias(_vcol(b))
                )
            m = m.join(e, [_vcol(a), _vcol(b)], "left_anti")

    # anti-vertices: no data vertex outside the match adjacent to ALL
    # anti-parents (core/PatternMatching.hh:380-488 semantics)
    for av in pattern.anti_vertices():
        parents = sorted(pattern.anti_adj[av] & set(matched))
        if not parents:
            continue
        x = "_x"
        viol = m
        lead, rest = parents[0], parents[1:]
        e = edges_sym.select(F.col("src").alias(_vcol(lead)), F.col("dst").alias(x))
        viol = viol.join(e, _vcol(lead))
        for nb in rest:
            e2 = edges_sym.select(F.col("src").alias(_vcol(nb)), F.col("dst").alias(x))
            viol = viol.join(e2, [_vcol(nb), x], "left_semi")
        for q in matched:
            viol = viol.where(F.col(x) != F.col(_vcol(q)))
        # label on the anti-vertex: a concrete label restricts the violating
        # vertex x to that label; the -1 wildcard means ANY label violates —
        # the reference treats a wildcard-labelled anti-vertex exactly like
        # an unlabelled one (core/PatternMatching.hh:437-448 falls through
        # to the unlabelled check), NOT like the partially-labelled true-
        # vertex -1 ("a label outside the pattern's known set"). So -1 here
        # = no label filter at all. Pinned by tests/test_matching.py.
        lab = pattern.labels.get(av)
        if lab is not None and lab != -1 and vertices is not None:
            vl = vertices.select(F.col("v").alias(x), F.col("label").alias("_xl"))
            viol = viol.join(vl, x).where(F.col("_xl") == F.lit(lab)).drop("_xl")
        mcols = [_vcol(p) for p in matched]
        m = m.join(viol.select(*mcols).distinct(), mcols, "left_anti")

    cols = [_vcol(p) for p in sorted(matched)]
    return MatchPlan(pattern=pattern, order=order, conditions=conds, df=m.select(*cols))
