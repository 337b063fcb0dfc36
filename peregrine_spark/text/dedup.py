"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

The training-data-pipeline tier of the engine (no reference analogue — the
reference is a pure graph engine). Everything is DataFrame-native: shingle
inverted indexes are self-joins, MinHash signatures are one groupBy with
per-hash ``min`` aggregates, SimHash is one groupBy with per-bit signed
sums. No Python UDFs anywhere — every hash is ``xxhash64`` (JVM,
whole-stage codegen).

Scale notes (the part that matters at 100 TB):
* the exhaustive Jaccard pair-join is quadratic in the worst case — it is
  the *oracle-checkable baseline*; ``max_df`` caps the fan-out of frequent
  shingles (a shingle occurring in f docs contributes O(f^2) candidate
  rows, so dropping the ultra-frequent head is the standard guard);
* MinHash+LSH is the scale path: candidate generation is a groupBy on
  (band, band_hash) — linear shuffle, no quadratic blow-up outside a
  bucket; bucket skew is bounded because a bucket of b rows only produces
  pairs after an explicit per-bucket cap;
* both near-dup paths *verify* candidates with exact Jaccard before
  reporting, so precision is exact and only recall depends on the sketch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from peregrine_spark.text.analysis import tokens


def exact_dedup(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact duplicate groups by content hash: one row per distinct text —
    (keep_id = min id, n_copies). Hash-groupBy: the map-side partial agg
    means each executor ships one row per distinct text, not per doc."""
    return (
        docs.select(F.col(id_col), F.md5(F.col(text_col)).alias("_h"))
        .groupBy("_h")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .select("keep_id", "n_copies")
    )


def shingle_table(
    docs: DataFrame, k: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, sh) — distinct k-token shingles per document, via posexplode of
    the token array (pure column expressions)."""
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    # guard: F.sequence(1, stop) DESCENDS when stop < 1 — short docs must
    # yield an empty shingle list, not a bogus [1, 0] index sequence
    sh = F.when(n >= k, F.transform(
        F.sequence(F.lit(1), n - (k - 1)),
        lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
    )).otherwise(F.array().cast("array<string>"))
    return (
        docs.select(F.col(id_col).alias("id"), F.explode(sh).alias("sh"))
        .dropDuplicates(["id", "sh"])
    )


def _jaccard_from_counts(inter, na, nb):
    return inter.cast("double") / (na + nb - inter).cast("double")


def jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_df: int | None = None,
) -> DataFrame:
    """Exhaustive n-gram Jaccard near-dup pairs: (a, b, jaccard) with
    a < b and jaccard >= threshold, jaccard rounded to 6dp.

    Candidate generation is the shingle inverted index self-joined on the
    shingle — every pair sharing >= 1 shingle is scored, so recall is exact
    (any pair with jaccard > 0 shares a shingle). ``max_df`` drops shingles
    occurring in more than max_df docs before the join (recall then exact
    only for pairs sharing at least one rare shingle — the standard
    frequent-shingle guard at scale)."""
    sh = shingle_table(docs, k, text_col, id_col)
    if max_df is not None:
        rare = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("_df"))
        sh = sh.join(rare.where(F.col("_df") <= max_df).select("sh"), "sh")
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.select(F.col("id").alias("a"), "sh")
    b = sh.select(F.col("id").alias("b"), "sh")
    inter = (
        a.join(b, "sh")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    na = sizes.select(F.col("id").alias("a"), F.col("n").alias("na"))
    nb = sizes.select(F.col("id").alias("b"), F.col("n").alias("nb"))
    jac = _jaccard_from_counts(F.col("i"), F.col("na"), F.col("nb"))
    return (
        inter.join(na, "a")
        .join(nb, "b")
        .where(jac >= F.lit(threshold))
        .select("a", "b", F.round(jac, 6).alias("jaccard"))
    )


def minhash_signatures(
    sh: DataFrame, num_hashes: int = 64, seed: int = 7
) -> DataFrame:
    """(id, mh_0..mh_{H-1}) — MinHash signature per doc: one groupBy with H
    ``min(xxhash64(sh, i))`` aggregates (single pass, map-side combined)."""
    aggs = [
        F.min(F.xxhash64("sh", F.lit(seed), F.lit(i))).alias(f"mh_{i}")
        for i in range(num_hashes)
    ]
    return sh.groupBy("id").agg(*aggs)


def minhash_lsh_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    k: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_bucket: int = 10_000,
) -> DataFrame:
    """MinHash+LSH near-dup pairs, exact-Jaccard verified.

    shingle → minhash (H hashes, ``bands`` bands of H/bands rows) → band
    bucket join → exact Jaccard on the candidates → (a, b, jaccard >=
    threshold). With H=64, bands=16 (r=4), a pair at jaccard 0.5 collides
    with prob 1-(1-0.5^4)^16 ≈ 0.64 per the S-curve; at 0.8 ≈ 0.9996.
    Buckets larger than ``max_bucket`` docs are dropped (skew guard: a
    degenerate bucket must not produce O(b^2) pairs)."""
    if num_hashes % bands:
        raise ValueError("bands must divide num_hashes")
    r = num_hashes // bands
    sh = shingle_table(docs, k, text_col, id_col).persist()
    sig = minhash_signatures(sh, num_hashes)
    band_rows = sig.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[F.col(f"mh_{b * r + j}") for j in range(r)]
                        ).alias("bh"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh"))

    sizes_b = band_rows.groupBy("band", "bh").agg(F.count(F.lit(1)).alias("_n"))
    band_rows = band_rows.join(
        sizes_b.where(F.col("_n") <= max_bucket).select("band", "bh"), ["band", "bh"]
    )
    cand = (
        band_rows.alias("x")
        .join(band_rows.alias("y"), ["band", "bh"])
        .where(F.col("x.id") < F.col("y.id"))
        .select(F.col("x.id").alias("a"), F.col("y.id").alias("b"))
        .dropDuplicates(["a", "b"])
    )

    # exact-Jaccard verification of candidates only
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    a_sh = sh.select(F.col("id").alias("a"), "sh")
    b_sh = sh.select(F.col("id").alias("b"), "sh")
    inter = (
        cand.join(a_sh, "a")
        .join(b_sh, ["b", "sh"])
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    jac = _jaccard_from_counts(F.col("i"), F.col("na"), F.col("nb"))
    out = (
        inter.join(sizes.select(F.col("id").alias("a"), F.col("n").alias("na")), "a")
        .join(sizes.select(F.col("id").alias("b"), F.col("n").alias("nb")), "b")
        .where(jac >= F.lit(threshold))
        .select("a", "b", F.round(jac, 6).alias("jaccard"))
    )
    # Materialize the (small) verified-pair result, then release the shingle
    # cache — otherwise repeated calls in a long-lived session leak cached
    # blocks (the shingle table is the big intermediate here).
    out = out.localCheckpoint(eager=True)
    sh.unpersist()
    return out


SIMHASH_BITS = {"xxhash64": 64, "md5_32": 32}


def simhash(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 11,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(id, simhash) — SimHash of the token multiset: per bit, the signed
    sum of token-hash bits; bit set iff the sum is positive. One explode +
    one groupBy with one conditional-sum aggregate per bit.

    ``hash_fn``:
    * ``"xxhash64"`` (default) — 64-bit JVM hash, whole-stage codegen; the
      scale path.
    * ``"md5_32"`` — 32-bit hash from the first 8 hex chars of md5(token).
      Both md5 and hex→int are expressible in ANSI SQL, so this variant is
      bit-for-bit reproducible in DuckDB — it backs the value-oracled entry
      query (``seed`` is ignored; md5 is unseeded in both engines).
    """
    n_bits = SIMHASH_BITS[hash_fn]
    tok = docs.select(
        F.col(id_col).alias("id"),
        F.explode(tokens(F.col(text_col))).alias("t"),
    )
    if hash_fn == "md5_32":
        h = F.conv(F.substring(F.md5("t"), 1, 8), 16, 10).cast("long")
    else:
        h = F.xxhash64("t", F.lit(seed))
    tok = tok.withColumn("h", h)

    # bit 63 of a signed long is the sign bit: its mask literal is the
    # negative two's-complement value (1 << 63 overflows LongType)
    def mask(b: int) -> int:
        return (1 << b) if b < 63 else -(1 << 63)

    bit_sums = [
        F.sum(
            F.when(F.col("h").bitwiseAND(F.lit(mask(b))) != 0, F.lit(1)).otherwise(
                F.lit(-1)
            )
        ).alias(f"s_{b}")
        for b in range(n_bits)
    ]
    sums = tok.groupBy("id").agg(*bit_sums)
    acc = F.lit(0).cast("long")
    for b in range(n_bits):
        acc = acc + F.when(
            F.col(f"s_{b}") > 0, F.lit(mask(b)).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return sums.select("id", acc.alias("simhash"))


def simhash_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    bands: int = 4,
    max_bucket: int = 10_000,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """SimHash near-dup pairs: (a, b, hamming <= max_hamming).

    Banding over the hash (width = n_bits/bands): any pair within hamming
    distance < bands must agree on >= 1 band (pigeonhole), so candidate
    generation is again a linear bucket groupBy; verification is
    ``bit_count(a XOR b)``. Exact for max_hamming <= bands - 1.
    ``hash_fn="md5_32"`` selects the ANSI-SQL-reproducible 32-bit simhash
    (see :func:`simhash`) — same pigeonhole exactness, oracle-checkable."""
    width = SIMHASH_BITS[hash_fn] // bands
    sig = simhash(docs, text_col, id_col, hash_fn=hash_fn)
    parts = sig.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned("simhash", b * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("bh"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "simhash", F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh"))
    sizes_b = parts.groupBy("band", "bh").agg(F.count(F.lit(1)).alias("_n"))
    parts = parts.join(
        sizes_b.where(F.col("_n") <= max_bucket).select("band", "bh"), ["band", "bh"]
    )
    ham = F.bit_count(F.col("x.simhash").bitwiseXOR(F.col("y.simhash")))
    return (
        parts.alias("x")
        .join(parts.alias("y"), ["band", "bh"])
        .where(F.col("x.id") < F.col("y.id"))
        .select(
            F.col("x.id").alias("a"),
            F.col("y.id").alias("b"),
            ham.cast("int").alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .dropDuplicates(["a", "b"])
    )
