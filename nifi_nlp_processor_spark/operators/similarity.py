"""Embedding similarity search (approximate nearest neighbor).

The reference has no vector operations; its nearest analogue is the fuzzy
Lucene membership probe (PontusLuceneIndexReaderProcessor.java:129-135,
``~%s`` query format).  A training-data pipeline needs ANN over an
``array<float>`` embedding column; two flavors, both pure DataFrame plans:

``cosine_topk``     — exact brute-force top-k: broadcast the (small) query
                      set against the (huge) corpus, score with
                      ``zip_with``/``aggregate`` expressions entirely inside
                      whole-stage codegen, rank per query. The corpus is
                      never shuffled — the only movement is the broadcast of
                      queries and the per-query top-k aggregation, which is
                      partial+final (each partition keeps ≤ k candidates
                      before the final merge... expressed as a window over a
                      pre-filtered candidate set).
``lsh_topk``        — random-hyperplane LSH (signed projections) bucketed
                      search: corpus hashed once to sign-bit buckets, each
                      query probes only its own bucket (plus optional
                      multi-probe neighbors), then exact re-rank inside the
                      bucket. Hyperplanes are derived deterministically from
                      a seed with xxhash64 — no Python RNG, identical on any
                      cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def with_cosine(df: DataFrame, a_col: str, b_col: str, out: str = "score") -> DataFrame:
    """Adds cosine(a, b) computed in double precision, sequential fold —
    deterministic and engine-portable (matches an in-order SQL fold)."""
    a = F.transform(F.col(a_col), lambda x: x.cast("double"))
    b = F.transform(F.col(b_col), lambda x: x.cast("double"))
    return df.withColumn(out, _dot(a, b) / (_norm(a) * _norm(b)))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int | None = 4,
) -> DataFrame:
    """Exact top-k by cosine: (query_id, neighbor_id, rank, score).

    queries must be the small side — it is broadcast, so the corpus scan is
    shuffle-free; the only wide op is the per-query rank, whose input was
    already cut to |queries| × |corpus| scored rows and is partitioned by
    query_id (|queries| tasks, each a linear top-k).
    Scores are rounded before ranking so rank boundaries are stable across
    engines/summation orders; ties break by neighbor id (deterministic).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv")
    )
    scored = with_cosine(c.crossJoin(F.broadcast(q)), "_qv", "_cv")
    scored = scored.where(F.col("query_id") != F.col("neighbor_id"))
    if round_digits is not None:
        scored = scored.withColumn("score", F.round("score", round_digits))
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "score")
    )


def hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (driver-side, tiny).

    Components are derived from a splitmix-style integer mix of
    (seed, plane, dim) — reproducible anywhere, no RNG state."""
    def mix(a: int) -> int:
        a = (a ^ (a >> 30)) * 0xBF58476D1CE4E5B9 % (1 << 64)
        a = (a ^ (a >> 27)) * 0x94D049BB133111EB % (1 << 64)
        return a ^ (a >> 31)

    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            h = mix(seed * 0x9E3779B97F4A7C15 + p * 1_000_003 + d)
            row.append((h % 2_000_001) / 1_000_000.0 - 1.0)  # uniform [-1, 1]
        planes.append(row)
    return planes


def lsh_bucket(df: DataFrame, planes: list[list[float]], vec_col: str = "embedding") -> DataFrame:
    """Adds integer ``bucket``: sign-bit signature of the vector against
    each hyperplane (random-hyperplane LSH for cosine). Pure expressions:
    per plane a zip_with dot product against a literal array."""
    sig = F.lit(0)
    for i, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(float(x)) for x in plane])
        d = _dot(F.transform(F.col(vec_col), lambda x: x.cast("double")), lit_plane)
        sig = sig + F.when(d > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return df.withColumn("bucket", sig.cast("int"))


def embedding_near_pairs(
    corpus: DataFrame,
    threshold: float = 0.9,
    n_planes: int = 12,
    n_bands: int = 3,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    round_digits: int | None = 6,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a, id_b, score) with
    id_a < id_b and cosine ≥ threshold, candidates from banded
    random-hyperplane LSH.

    The all-pairs form is O(n²) and impossible at corpus scale; banding
    the sign-bit signature (n_bands bands of n_planes/n_bands bits, the
    cosine analogue of MinHash-LSH banding in
    ``doc_dedup.lsh_candidate_pairs``) shuffles the corpus n_bands times
    on (band, bucket) and self-joins only within a bucket — expected
    in-bucket size is n / 2^(planes/band). Two vectors that disagree on
    every band are never compared (recall < 1 by design; more bands with
    fewer bits each raise recall). Exact cosine then verifies every
    candidate, so precision is 1 at the stated threshold.

    All arithmetic is double precision with sequential folds and the
    hyperplanes are deterministic literals, so the identical plan is
    expressible in a SQL oracle. Pairs found by several bands are deduped
    BEFORE scoring (one cosine per candidate pair).
    """
    per_band = n_planes // n_bands
    planes = hyperplanes(dim, n_planes, seed)
    c = corpus.select(
        F.col(id_col).alias("id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("_v"),
    )
    bands = []
    for b in range(n_bands):
        sig = F.lit(0)
        for i in range(per_band):
            plane = planes[b * per_band + i]
            lit_plane = F.array(*[F.lit(float(x)) for x in plane])
            sig = sig + F.when(_dot(F.col("_v"), lit_plane) > 0, F.lit(1 << i)).otherwise(F.lit(0))
        bands.append(F.struct(F.lit(b).alias("band"), sig.cast("int").alias("bucket")))
    hashed = c.select("id", "_v", F.explode(F.array(*bands)).alias("_bb")).select(
        "id", "_v", F.col("_bb.band").alias("band"), F.col("_bb.bucket").alias("bucket")
    )
    a = hashed.select("band", "bucket", F.col("id").alias("id_a"), F.col("_v").alias("_va"))
    b_ = hashed.select("band", "bucket", F.col("id").alias("id_b"), F.col("_v").alias("_vb"))
    cand = (
        a.join(b_, ["band", "bucket"])
        .where(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    scored = with_cosine(cand, "_va", "_vb")
    if round_digits is not None:
        scored = scored.withColumn("score", F.round("score", round_digits))
    return scored.where(F.col("score") >= threshold).select("id_a", "id_b", "score")


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    round_digits: int | None = 4,
) -> DataFrame:
    """Bucketed ANN: hash corpus + queries to hyperplane sign buckets, score
    only within the query's bucket, exact re-rank. Recall < 1 by design;
    the scale win is that each query scores |corpus| / 2^planes candidates.
    The corpus-side bucket column is computable once and persisted in a real
    deployment (hidden-partition by bucket ⇒ partition pruning per query).
    Scores are rounded BEFORE ranking (like ``cosine_topk``) so rank
    boundaries are stable across engines/summation orders; ties break by
    neighbor id.
    """
    planes = hyperplanes(dim, n_planes, seed)
    c = lsh_bucket(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv")),
        planes,
        "_cv",
    )
    q = lsh_bucket(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")),
        planes,
        "_qv",
    )
    joined = c.join(F.broadcast(q), "bucket")
    scored = with_cosine(joined, "_qv", "_cv").where(
        F.col("query_id") != F.col("neighbor_id")
    )
    if round_digits is not None:
        scored = scored.withColumn("score", F.round("score", round_digits))
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "score")
    )
