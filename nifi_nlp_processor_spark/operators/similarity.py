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
``ivf_topk``        — inverted-file (IVF) cell-probed ANN: the corpus is
                      assigned once to its nearest centroid cell by a pure
                      codegen expression over broadcast centroid literals
                      (zero shuffle on the corpus), each query probes its
                      ``nprobe`` nearest cells, and exact cosine re-ranks
                      inside the probed cells only. Centroids are a model
                      artifact: any trained list plugs in; the default
                      seeding is deterministic so tests and the SQL oracle
                      reproduce the identical partition of the corpus.
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


def seed_centroids(
    corpus: DataFrame,
    n_cells: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[tuple[int, list[float]]]:
    """Deterministic centroid seeds: the ``n_cells`` lowest-id corpus
    vectors, as (cid, vector) pairs. In production IVF the centroids are a
    k-means artifact trained offline on a sample; this seam accepts any
    such list — the physical plan downstream is identical. The lowest-id
    seeding exists so tests and the SQL oracle can re-derive the exact
    same cell partition with no RNG and no training step. The collect is
    bounded by ``n_cells`` (the model size), never by the corpus."""
    rows = (
        corpus.select(F.col(id_col), F.col(vec_col))
        .orderBy(id_col)
        .limit(n_cells)
        .collect()
    )
    return [(int(r[0]), [float(x) for x in r[1]]) for r in rows]


def _cell_scores(vec_col, centroids, round_digits: int = 6):
    """Array of struct(d, cid) — rounded cosine distance to every centroid.
    Struct ordering is lexicographic, so array_min / array_sort rank by
    (distance, cid): rounding makes the boundary stable across engines and
    the cid component breaks exact ties deterministically."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    vn = _norm(v)
    scores = []
    for cid, cv in centroids:
        lit = F.array(*[F.lit(float(x)) for x in cv])
        cn = sum(x * x for x in cv) ** 0.5
        d = F.round(F.lit(1.0) - _dot(v, lit) / (vn * F.lit(cn)), round_digits)
        scores.append(F.struct(d.alias("d"), F.lit(cid).alias("cid")))
    return F.array(*scores)


def ivf_assign(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    vec_col: str = "embedding",
    out: str = "cell",
) -> DataFrame:
    """Adds the IVF cell id: nearest centroid by rounded cosine distance,
    ties to the lowest cid. Pure codegen over centroid literals — the
    corpus is scanned once with NO shuffle; on a real lake the cell becomes
    a hidden partition column so probes prune at the file level.

    The literal expression is O(n_cells × dim) leaves — ideal for small
    registries, but Catalyst chokes on a 4k-cells × 1k-dim tree. Above
    ``IVF_LITERAL_MAX_TERMS`` use :func:`ivf_assign_join` instead (same
    (distance, cid) semantics, broadcast-join physical shape)."""
    return df.withColumn(
        out, F.array_min(_cell_scores(vec_col, centroids)).getField("cid")
    )


# literal-expression ceiling: n_cells × dim leaves beyond this and the
# centroid registry stops being inlined into the plan (codegen/analysis
# cost grows superlinearly in expression size) and becomes a broadcast
# DataFrame side instead.
IVF_LITERAL_MAX_TERMS = 2048


def centroids_df(spark, centroids: list[tuple[int, list[float]]]) -> DataFrame:
    """The centroid registry as a tiny DataFrame — the broadcast side of
    the join-based scoring path for registries too large to inline."""
    return spark.createDataFrame(
        [(int(cid), [float(x) for x in cv]) for cid, cv in centroids],
        "cid int, _cent array<double>",
    )


def _join_distance(vec_col: str, round_digits: int = 6):
    """Rounded cosine distance between a row vector and the joined
    ``_cent`` column — numerically identical to ``_cell_scores``: the dot
    and norms are the same sequential double folds, and the centroid norm
    (a sequential sum of squares then one IEEE sqrt) matches the
    driver-side ``sum(x*x) ** 0.5`` of the literal path bit-for-bit."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    c = F.col("_cent")
    return F.round(F.lit(1.0) - _dot(v, c) / (_norm(v) * _norm(c)), round_digits)


def ivf_assign_join(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    id_col: str,
    vec_col: str = "embedding",
    out: str = "cell",
) -> DataFrame:
    """Join-based IVF assignment for LARGE centroid registries: centroids
    broadcast as a DataFrame, distance scored per (row × centroid) pair
    inside codegen, argmin via ``min(struct(d, cid, payload))`` — the
    identical (distance, cid) ordering the literal path's ``array_min``
    uses, so both paths assign every vector to the same cell bit-for-bit.

    Physical shape: one BroadcastNestedLoopJoin (corpus never moves for
    scoring) + ONE hash aggregate keyed by ``id_col`` (partial min per
    partition, then final — the only shuffle, and its width is one struct
    per row, not n_cells). Returns ``(id_col, vec_col, out)``: the vector
    rides through the aggregate as struct payload — no join-back to df.

    CONTRACT: ``id_col`` must be row-unique. The literal path is
    row-preserving while this groupBy-argmin collapses duplicate ids to
    one row (and the query-side probe shares one row_number window per
    query id) — with duplicate ids the two physical paths would silently
    diverge once the registry size crosses ``IVF_LITERAL_MAX_TERMS``.
    Every in-repo caller keys by a primary key (doc_id / query_id);
    tests/test_similarity_ann.py pins bit-identity under that contract.
    """
    cent = F.broadcast(centroids_df(df.sparkSession, centroids))
    j = df.select(F.col(id_col), F.col(vec_col)).crossJoin(cent)
    d = _join_distance(vec_col)
    best = j.groupBy(id_col).agg(
        F.min(F.struct(d.alias("d"), F.col("cid"), F.col(vec_col).alias("_v"))).alias("_m")
    )
    return best.select(
        F.col(id_col),
        F.col("_m._v").alias(vec_col),
        F.col("_m.cid").alias(out),
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    n_cells: int = 8,
    nprobe: int = 2,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[tuple[int, list[float]]] | None = None,
    round_digits: int | None = 4,
    max_literal_terms: int = IVF_LITERAL_MAX_TERMS,
) -> DataFrame:
    """IVF-probed ANN: (query_id, neighbor_id, rank, score).

    The scale shape: corpus→cell assignment is shuffle-free codegen over
    centroid literals when the registry is small (``n_cells × dim ≤
    max_literal_terms``) and a broadcast-join argmin (one aggregate
    shuffle, no expression blowup) when it is large — both paths score
    with the identical sequential folds and (distance, cid) tie order, so
    the assignment is bit-identical either way; each query explodes to its
    ``nprobe`` nearest cells and the exploded probe set is broadcast, so
    the only wide operation is the per-query rank over candidates already
    cut to ~``nprobe``/``n_cells`` of the corpus. Recall < 1 by design (a
    true neighbor in an unprobed cell is missed — raise nprobe for
    recall); precision is exact within probed cells. Scores are rounded
    before ranking, ties break by neighbor id (stable across engines)."""
    if centroids is None:
        centroids = seed_centroids(corpus, n_cells, id_col, vec_col)
    dim = len(centroids[0][1]) if centroids else 0
    use_join = len(centroids) * dim > max_literal_terms
    cproj = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv")
    )
    if use_join:
        c = ivf_assign_join(cproj, centroids, "neighbor_id", "_cv")
        qj = queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
        ).crossJoin(F.broadcast(centroids_df(queries.sparkSession, centroids)))
        pw = Window.partitionBy("query_id").orderBy(
            _join_distance("_qv"), F.col("cid").asc()
        )
        q = (
            qj.withColumn("_rn", F.row_number().over(pw))
            .where(F.col("_rn") <= nprobe)
            .select("query_id", "_qv", F.col("cid").alias("cell"))
        )
    else:
        c = ivf_assign(cproj, centroids, "_cv")
        q = queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("_qv"),
            F.explode(
                F.slice(F.array_sort(_cell_scores(vec_col, centroids)), 1, nprobe)
            ).alias("_probe"),
        ).select("query_id", "_qv", F.col("_probe.cid").alias("cell"))
    scored = with_cosine(c.join(F.broadcast(q), "cell"), "_qv", "_cv").where(
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


def label_centroids(
    emb: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Per-label mean vector: ``(label, n_vectors, centroid)``.

    The mean is ``dim`` scalar ``avg`` aggregates reassembled into an
    array — one partial+final HashAggregate whose state is ``dim`` doubles
    per label, entirely whole-stage codegen. That is the shape that
    survives 10^10 vectors: no explode (which would shuffle ``n×dim``
    rows), no collect, no UDF. ``dim`` defaults from a 1-row bounded peek.
    """
    if dim is None:
        dim = len(emb.select(vec_col).first()[0])
    aggs = [
        F.avg(F.col(vec_col)[i].cast("double")).alias(f"_c{i}") for i in range(dim)
    ]
    g = emb.groupBy(label_col).agg(F.count(F.lit(1)).alias("n_vectors"), *aggs)
    return g.select(
        label_col,
        "n_vectors",
        F.array(*[F.col(f"_c{i}") for i in range(dim)]).alias("centroid"),
    )


def nearest_centroid_eval(
    emb: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_digits: int = 4,
) -> DataFrame:
    """Nearest-centroid classification eval — the embedding-quality rollup
    of a labeled corpus: assign every vector to its highest-cosine label
    centroid and report per-label ``(n_vectors, n_correct, accuracy,
    mean_self_cosine)``.

    Two aggregations and one broadcast: centroids (tiny: one row per
    label) broadcast against the corpus, cosine in codegen, per-vector
    argmax via ``max_by`` struct ordering (score desc, centroid label asc
    on ties — deterministic across engines), then a per-label rollup.
    The corpus is scanned twice (centroid pass + assign pass) and never
    shuffled except for the two label-keyed partial+final aggregates.

    Determinism: per-vector scores round to 4 digits (the proven ANN
    convention — stable across summation orders), and the per-label mean
    is an EXACT integer sum of score×10⁴ divided once at the end, so no
    float aggregate ever sits on a rounding boundary: identical longs
    divide identically under IEEE-754 on any engine."""
    cents = label_centroids(emb, label_col, vec_col).select(
        F.col(label_col).alias("_clabel"), F.col("centroid").alias("_cv")
    )
    scored = with_cosine(
        emb.select(
            F.col(id_col),
            F.col(label_col).alias("_true"),
            F.col(vec_col).alias("_qv"),
        ).crossJoin(F.broadcast(cents)),
        "_qv",
        "_cv",
    ).withColumn("score", F.round("score", round_digits))
    # per-vector winner: highest score, smallest centroid label on ties
    assign = scored.groupBy(id_col, "_true").agg(
        F.max_by(
            F.col("_clabel"), F.struct(F.col("score"), -F.col("_clabel"))
        ).alias("_pred"),
        F.max(
            F.when(F.col("_clabel") == F.col("_true"), F.col("score"))
        ).alias("_self"),
    )
    scale = float(10 ** round_digits)
    return (
        assign.groupBy(F.col("_true").alias(label_col))
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.sum((F.col("_pred") == F.col("_true")).cast("long")).alias("n_correct"),
            # exact long sum of score×10^d — order-independent, no float agg
            F.sum(F.round(F.col("_self") * scale).cast("long")).alias("_self_e"),
        )
        .select(
            label_col,
            "n_vectors",
            "n_correct",
            (F.col("_self_e") / (F.col("n_vectors") * scale)).alias("mean_self_cosine"),
            (F.col("n_correct") / F.col("n_vectors")).alias("accuracy"),
        )
    )
