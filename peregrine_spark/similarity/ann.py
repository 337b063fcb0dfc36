"""Similarity search over embedding columns (``array<float>``).

* ``cosine_topk`` — brute-force exact top-k: query set × corpus join with
  the dot product as a JVM higher-order-function fold (``F.zip_with`` +
  ``F.aggregate`` in double precision — no Python). The exact baseline and
  the oracle-checkable path. O(|Q|·|C|) — fine for |Q| small or as the
  per-bucket inner loop.
* ``cosine_topk_lsh`` — random-hyperplane LSH: sign-bit signatures from a
  deterministic (seeded, driver-generated) plane matrix, multi-probe bucket
  join (exact bucket + all 1-bit flips), exact cosine re-rank inside the
  bucket. The scale path: candidate generation is a bucket equi-join, so
  cost is linear in corpus size times bucket occupancy — recall measured in
  tests, precision exact (final ranking is true cosine).

At 100 TB the corpus side is bucketed/partitioned by signature so each
probe touches one partition — the same partition-pruning story as an IVF
index (buckets = cells), without a training step.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from peregrine_spark.session import release_checkpoint


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, z: acc + z,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def with_norm(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    return emb.withColumn("_norm", _norm(F.col(vec_col)))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    broadcast_queries: bool = True,
) -> DataFrame:
    """Exact top-k cosine neighbours per query: (query_id, rank, neighbor_id,
    sim) — rank 1..k by (sim desc, neighbor_id asc), self excluded, sim
    rounded to 6dp.

    This is the brute-force O(|Q|·|C|) oracle baseline (the scale path is
    ``cosine_topk_lsh``). ``broadcast_queries=True`` (default) force-hints a
    broadcast of the query side — correct ONLY for small query sets (the
    common case: a probe batch against a large corpus). Pass False for large
    |Q| so Catalyst picks a shuffle join instead of OOMing executors."""
    c = with_norm(corpus, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cv"),
        F.col("_norm").alias("_cn"),
    )
    q = with_norm(queries, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        F.col("_norm").alias("_qn"),
    )
    sim = _dot(F.col("_qv"), F.col("_cv")) / (F.col("_qn") * F.col("_cn"))
    q_side = F.broadcast(q) if broadcast_queries else q
    scored = (
        c.crossJoin(q_side)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", sim.alias("sim"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", F.round("sim", 6).alias("sim"))
    )


def hyperplanes(dim: int, n_planes: int, seed: int = 13) -> list[list[float]]:
    """Deterministic pseudo-random unit-free hyperplanes (driver-side, tiny:
    n_planes × dim floats). Hash-derived — no RNG state, reproducible."""

    def h(i: int, j: int) -> float:
        # splitmix64-style integer scramble → uniform in [-1, 1)
        x = (i * 0x9E3779B97F4A7C15 + j * 0xBF58476D1CE4E5B9 + seed) & (2**64 - 1)
        x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & (2**64 - 1)
        x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & (2**64 - 1)
        x ^= x >> 31
        return (x / 2**63) - 1.0

    return [[h(p, d) for d in range(dim)] for p in range(n_planes)]


def signature(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit LSH signature of ``vec`` as a long (bit p = dot with plane p
    > 0). Pure column fold — evaluated in codegen, vectorized."""
    sig = F.lit(0).cast("long")
    for p, plane in enumerate(planes):
        arr = F.array(*[F.lit(w) for w in plane])
        d = _dot(vec, arr)
        sig = sig + F.when(d > 0, F.lit(1 << p).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return sig


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 12,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    multiprobe: bool = True,
    dim: int | None = None,
    broadcast_queries: bool = True,
) -> DataFrame:
    """Approximate top-k: LSH bucket join + exact cosine re-rank.

    Corpus rows land in their signature bucket; each query probes its own
    bucket plus (multiprobe) every 1-bit-flip neighbour bucket — 1+n_planes
    probes, which repairs most boundary misses of sign LSH. Output schema
    matches ``cosine_topk`` (rank may differ where recall < 1).

    ``dim``: embedding dimensionality. Pass it when known (schema metadata)
    to keep the operator action-free; the fallback probes one corpus row on
    the driver.

    ``broadcast_queries=True`` (default) force-hints a broadcast of the
    EXPLODED query side — |Q| × (1 + n_planes) probe rows. Correct only for
    small probe batches; pass False for a large query set so Catalyst picks
    a shuffle join on the bucket key instead of OOMing executors (same
    escape hatch as ``cosine_topk``)."""
    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    planes = hyperplanes(dim, n_planes)

    c = with_norm(corpus, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cv"),
        F.col("_norm").alias("_cn"),
        signature(F.col(vec_col), planes).alias("bucket"),
    )
    q = with_norm(queries, vec_col).withColumn(
        "_sig", signature(F.col(vec_col), planes)
    )
    if multiprobe:
        probes = F.array(
            F.col("_sig"),
            *[F.col("_sig").bitwiseXOR(F.lit(1 << p)) for p in range(n_planes)],
        )
    else:
        probes = F.array(F.col("_sig"))
    qp = q.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        F.col("_norm").alias("_qn"),
        F.explode(probes).alias("bucket"),
    )
    sim = _dot(F.col("_qv"), F.col("_cv")) / (F.col("_qn") * F.col("_cn"))
    scored = (
        c.join(F.broadcast(qp) if broadcast_queries else qp, "bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", sim.alias("sim"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", F.round("sim", 6).alias("sim"))
    )


def cosine_pairs(
    emb: DataFrame,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, exact: (a, b, sim) for every
    id pair a < b with cosine >= threshold, sim rounded to 6dp.

    All-pairs O(n^2) by construction — the oracle baseline for the dedup
    tier (same role ``jaccard_pairs`` plays for text); the scale path is
    :func:`cosine_pairs_lsh`."""
    n = with_norm(emb, vec_col)
    a = n.select(
        F.col(id_col).alias("a"), F.col(vec_col).alias("_av"),
        F.col("_norm").alias("_an"),
    )
    b = n.select(
        F.col(id_col).alias("b"), F.col(vec_col).alias("_bv"),
        F.col("_norm").alias("_bn"),
    )
    sim = _dot(F.col("_av"), F.col("_bv")) / (F.col("_an") * F.col("_bn"))
    return (
        a.join(b, F.col("a") < F.col("b"))
        .select("a", "b", F.round(sim, 6).alias("sim"))
        .where(F.col("sim") >= threshold)
    )


def cosine_pairs_lsh(
    emb: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 16,
    bands: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int | None = None,
    max_bucket: int = 10_000,
) -> DataFrame:
    """Embedding-cosine near-dup pairs, LSH-bucketed (the scale path).

    Random-hyperplane signature split into ``bands`` bands; a pair is a
    candidate iff it collides in at least one band (sign-LSH collision
    probability per bit is 1 - angle/pi, so near-identical vectors collide
    in some band with high probability). Candidates come from a per-band
    self-join on the band value — linear in corpus size times bucket
    occupancy, never all-pairs — then exact cosine verification filters to
    >= threshold, so precision is exact and only recall is approximate
    (measured in tests).

    ``max_bucket``: bands whose bucket exceeds this are dropped (a
    degenerate band value — e.g. a zero-vector cluster — would otherwise
    re-create the quadratic blowup; the cap bounds any bucket's join
    contribution, the same guard ``minhash_lsh_pairs`` uses)."""
    if dim is None:
        dim = len(emb.select(vec_col).first()[0])
    planes = hyperplanes(dim, n_planes)
    bits_per = n_planes // bands

    n = with_norm(emb, vec_col).select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("_v"),
        F.col("_norm").alias("_n"),
        signature(F.col(vec_col), planes).alias("_sig"),
    )
    mask = (1 << bits_per) - 1
    banded = n.select(
        "id", "_v", "_n",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(bi).alias("band"),
                    F.shiftright("_sig", bi * bits_per).bitwiseAND(
                        F.lit(mask)
                    ).alias("val"),
                )
                for bi in range(bands)
            ])
        ).alias("bk"),
    ).select("id", "_v", "_n", F.col("bk.band").alias("band"), F.col("bk.val").alias("val"))
    counts = banded.groupBy("band", "val").agg(F.count(F.lit(1)).alias("_bc"))
    banded = banded.join(
        counts.where(F.col("_bc") <= max_bucket).select("band", "val"),
        ["band", "val"],
    )
    left = banded.select("band", "val", F.col("id").alias("a"),
                         F.col("_v").alias("_av"), F.col("_n").alias("_an"))
    right = banded.select("band", "val", F.col("id").alias("b"),
                          F.col("_v").alias("_bv"), F.col("_n").alias("_bn"))
    cand = (
        left.join(right, ["band", "val"])
        .where(F.col("a") < F.col("b"))
        .dropDuplicates(["a", "b"])
    )
    sim = _dot(F.col("_av"), F.col("_bv")) / (F.col("_an") * F.col("_bn"))
    return cand.select("a", "b", F.round(sim, 6).alias("sim")).where(
        F.col("sim") >= threshold
    )


def ivf_centroids(
    emb: DataFrame,
    n_cells: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    lloyd_iters: int = 1,
) -> list[list[float]]:
    """Deterministic IVF coarse quantizer: seed centroids are an evenly-
    strided id sample (reproducible, no RNG), optionally refined by a few
    Lloyd iterations computed as Spark aggregations (assignment via the
    JVM-side argmin below; means via groupBy(cell).avg over the unrolled
    components). Returns a driver-side list (tiny: n_cells × dim).

    The stride rank comes from ``contiguous_rank`` (range repartition +
    per-partition offsets — graph/build.py), NOT a global unpartitioned
    Window: training must never funnel the whole corpus through one task.
    """
    from peregrine_spark.graph.build import contiguous_rank

    n = emb.count()
    stride = max(1, n // n_cells)
    # rank ids ONLY (the checkpointed ranking must not carry the vectors —
    # O(corpus·dim) executor storage); join the vectors back for just the
    # n_cells selected seed rows, then release the ranking blocks
    ranked = contiguous_rank(emb.select(id_col), [F.col(id_col).asc()], "_rk")
    seeds = (
        ranked.where(
            ((F.col("_rk") - 1) % stride == 0) & (F.col("_rk") <= stride * n_cells)
        )
        .join(emb.select(id_col, vec_col), id_col)
        .select("_rk", vec_col)
        .collect()
    )
    release_checkpoint(ranked)
    seeds.sort(key=lambda r: r["_rk"])  # collect order is partition order
    cents = [list(map(float, r[1])) for r in seeds]
    for _ in range(lloyd_iters):
        assigned = emb.select(
            _nearest_cell(F.col(vec_col), cents).alias("cell"),
            F.col(vec_col).alias("_v"),
        )
        dim = len(cents[0])
        means = assigned.groupBy("cell").agg(
            *[F.avg(F.col("_v")[i]).alias(f"c{i}") for i in range(dim)],
            F.count(F.lit(1)).alias("_n"),
        ).collect()
        by_cell = {r["cell"]: [r[f"c{i}"] for i in range(dim)] for r in means}
        cents = [by_cell.get(i, c) for i, c in enumerate(cents)]
    return cents


def _nearest_cell(vec: Column, cents: list[list[float]]) -> Column:
    """Argmax cosine over the centroid list as a pure column expression.
    Built as sort_array over (−sim, id) structs so each dot product appears
    exactly once in the expression tree — a chained when/otherwise argmax
    would nest its accumulator twice per step and blow up exponentially."""
    return _cell_ranking(vec, cents, 1)[0]


def _cell_ranking(vec: Column, cents: list[list[float]], nprobe: int) -> Column:
    """Array of the nprobe nearest centroid ids (by cosine), as a sorted
    slice of (sim, id) structs — JVM-side, no Python."""
    entries = []
    for i, c in enumerate(cents):
        arr = F.array(*[F.lit(float(w)) for w in c])
        s = _dot(vec, arr) / (F.lit(_py_norm(c)) * _norm(vec))
        entries.append(F.struct((-s).alias("d"), F.lit(i).alias("cell")))
    ranked = F.sort_array(F.array(*entries))
    return F.slice(ranked, 1, nprobe).getField("cell")


def _py_norm(v: list[float]) -> float:
    return math.sqrt(sum(x * x for x in v)) or 1.0


def cosine_topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: list[list[float]] | None = None,
    broadcast_queries: bool = True,
) -> DataFrame:
    """Approximate top-k via an IVF coarse quantizer: corpus vectors are
    assigned to their nearest centroid cell once; each query probes its
    ``nprobe`` nearest cells (explode → cell equi-join) and exact cosine
    re-ranks inside them. Output schema matches ``cosine_topk``.

    The trained-quantizer counterpart of ``cosine_topk_lsh``: cells adapt
    to the data distribution (balanced occupancy on clustered corpora,
    where fixed hyperplane buckets skew). At scale the corpus is
    partitioned/bucketed by cell, so a probe touches nprobe partitions —
    classic IVF partition pruning. Pass ``centroids`` to reuse a trained
    quantizer (recommended: train once, persist with the table).

    ``broadcast_queries``: as in ``cosine_topk_lsh`` — the exploded probe
    side is |Q| × nprobe rows; pass False for large query sets."""
    cents = centroids or ivf_centroids(corpus, n_cells, vec_col, id_col)
    c = with_norm(corpus, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cv"),
        F.col("_norm").alias("_cn"),
        _nearest_cell(F.col(vec_col), cents).alias("cell"),
    )
    qp = with_norm(queries, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        F.col("_norm").alias("_qn"),
        F.explode(_cell_ranking(F.col(vec_col), cents, nprobe)).alias("cell"),
    )
    sim = _dot(F.col("_qv"), F.col("_cv")) / (F.col("_qn") * F.col("_cn"))
    scored = (
        c.join(F.broadcast(qp) if broadcast_queries else qp, "cell")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", sim.alias("sim"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", F.round("sim", 6).alias("sim"))
    )
