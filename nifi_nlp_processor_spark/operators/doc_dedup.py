"""Document deduplication operators for the training-data pipeline.

The reference's only dedup primitive is set-union idempotency
(PontusProcessorBase.java:303-327: re-adding a value to a result set is a
no-op) and Lucene-index membership (PontusLuceneIndexReaderProcessor.java:
129-135).  A 100 TB training-data pipeline needs document-level dedup; these
operators supply it Spark-first, all as declarative DataFrame plans
(no per-row Python anywhere):

``exact_dedup``         — hash-groupBy on a content fingerprint (md5 of
                          normalized text). Partial+final hash aggregation;
                          one shuffle on the fingerprint, never on the text.
``shingles``            — distinct k-gram word shingles per doc via
                          posexplode + window lead (stays in codegen).
``minhash_signatures``  — per-doc MinHash signature. ``hash_fn='md5'`` is the
                          portable flavor (bit-identical in any engine, used
                          for oracle parity); ``'xxhash64'`` is the fast JVM
                          path for scale.
``lsh_candidate_pairs`` — MinHash-LSH: band the signature, shuffle on
                          (band, bucket) only — candidate generation cost is
                          O(docs × bands), never O(docs²).
``jaccard_pairs``       — exact n-gram Jaccard via a shingle inverted-index
                          self-join: only docs sharing ≥1 shingle meet, so
                          the join output is bounded by co-occurrence, not
                          |docs|².  Used standalone at small scale and as the
                          verifier behind LSH candidates at large scale.
``simhash``             — SimHash fingerprint per doc (64-bit xxhash64
                          scale flavor; 32-bit md5_32 for oracle parity),
                          computed with bit-parallel integer aggregation
                          (sum of masked hash bits), zero UDFs.
``simhash_near_pairs``  — near-dup pairs by Hamming distance over same-band
                          SimHash buckets.
``connected_components`` — resolve any pair set (LSH/SimHash/embedding
                          near-dups) into clusters by min-label propagation
                          with pointer jumping: the canonical keeper per
                          near-dup cluster is the component minimum.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """One row per distinct normalized text: (fingerprint, keeper_id,
    n_copies). Keeper = min id (deterministic). The groupBy key is the
    16-byte fingerprint, so the shuffle moves hashes, not documents."""
    return (
        docs.select(
            F.md5(F.lower(F.col(text_col))).alias("fingerprint"),
            F.col(id_col),
        )
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def shingles(
    docs: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Distinct k-gram word shingles: (id, shingle). posexplode + lead
    window per doc; the window partitions by doc id so shingle construction
    never crosses documents (and AQE can split a skewed mega-doc only at
    the downstream joins, where it matters)."""
    tok = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "w"),
    )
    win = Window.partitionBy(id_col).orderBy("pos")
    parts = [F.col("w")] + [F.lead("w", i).over(win) for i in range(1, k)]
    # lead(w, k-1) null ⇒ the window ran off the end (shorter leads are null
    # too); keep only full-width shingles.
    return (
        tok.select(F.col(id_col), F.concat_ws(" ", *parts).alias("shingle"),
                   parts[-1].alias("_last"))
        .where(F.col("_last").isNotNull())
        .select(id_col, "shingle")
        .distinct()
    )


def minhash_signatures(
    doc_shingles: DataFrame,
    num_hashes: int = 16,
    id_col: str = "doc_id",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Per-doc MinHash signature: (id, h0..h{n-1}).

    One aggregation: num_hashes min() columns over the shingle set —
    partial+final hash agg, map-side combine absorbs big docs before the
    shuffle. 'xxhash64' keeps everything in whole-stage codegen (the scale
    path); 'md5' salts the shingle with the hash index and takes the min
    hex digest — slower but engine-portable (the oracle-parity path)."""
    if hash_fn == "xxhash64":
        aggs = [
            F.min(F.xxhash64(F.col("shingle"), F.lit(i))).alias(f"h{i}")
            for i in range(num_hashes)
        ]
    elif hash_fn == "md5":
        aggs = [
            F.min(F.md5(F.concat(F.lit(f"{i}|"), F.col("shingle")))).alias(f"h{i}")
            for i in range(num_hashes)
        ]
    else:
        raise ValueError(f"unknown hash_fn {hash_fn!r}")
    return doc_shingles.groupBy(id_col).agg(*aggs)


def lsh_buckets(
    signatures: DataFrame,
    bands: int = 4,
    id_col: str = "doc_id",
    bucket_fn: str = "xxhash64",
) -> DataFrame:
    """LSH banding of MinHash signatures → (id, band, bucket), one row per
    (doc, band). This is the *bucket relation* — the persistable half of
    LSH that the incremental index stores between batches; pairing small
    vs big buckets is layered on top (``lsh_candidate_pairs``). Pure
    column expressions, no shuffle of its own."""
    hcols = [c for c in signatures.columns if c != id_col]
    per_band = len(hcols) // bands
    assert per_band >= 1, "more bands than hashes"
    banded = None
    for b in range(bands):
        cols = hcols[b * per_band : (b + 1) * per_band]
        if bucket_fn == "xxhash64":
            bucket = F.xxhash64(*[F.col(c) for c in cols])
        elif bucket_fn == "concat":
            bucket = F.concat_ws("|", *[F.col(c).cast("string") for c in cols])
        else:
            raise ValueError(f"unknown bucket_fn {bucket_fn!r}")
        part = signatures.select(
            F.col(id_col), F.lit(b).alias("band"), bucket.alias("bucket")
        )
        banded = part if banded is None else banded.unionByName(part)
    return banded


def lsh_candidate_pairs(
    signatures: DataFrame,
    bands: int = 4,
    id_col: str = "doc_id",
    bucket_fn: str = "xxhash64",
    max_bucket: int = 1024,
    n_hubs: int = 1,
) -> DataFrame:
    """MinHash-LSH banding: docs agreeing on every hash of ≥1 band become a
    candidate pair (a_id < b_id). The only shuffle is groupBy(band, bucket).

    ``bucket_fn``: 'xxhash64' keys buckets on a codegen'd 64-bit hash (the
    scale path); 'concat' keys on the concatenated band hashes — engine-
    portable, so DuckDB can reproduce the banding for oracle parity.

    **Mega-bucket handling** (the web-scale case: a giant duplicate
    cluster lands every copy in one bucket). Buckets with ≤ ``max_bucket``
    members expand to all C(b,2) pairs via in-bucket expansion; larger
    buckets switch to STAR expansion — every member pairs with the
    bucket's minimum id only (b-1 pairs, computed by an aggregate + join,
    no driver-side or single-task array of the bucket). Nothing is
    dropped *at candidate time*: every member still appears in ≥1
    candidate pair, and the full cluster is recoverable downstream by
    transitive closure (union-find over pairs), which is how near-dup
    clusters are consumed anyway. Output is linear in bucket size instead
    of quadratic, so one hot bucket cannot OOM an executor or emit 10^11
    rows.

    Recall caveat AFTER exact verification: star pairs all route through
    the hub (min id), so in a *heterogeneous* mega-bucket two members that
    are near-dups of each other but both dissimilar to the hub lose their
    only candidate link once the verifier rejects the hub pairs. This is
    the deliberate trade: a bucket only exceeds ``max_bucket`` when ≥
    ``max_bucket`` docs agree on a whole MinHash band, which at sane band
    widths means a near-identical cluster, not a grab-bag — and the
    alternative (full expansion) is the n² blowup this guard exists to
    prevent. ``n_hubs > 1`` buys back recall inside heterogeneous
    mega-buckets at linear cost: every member pairs with each of the k
    smallest ids (deterministic, no RNG), so a near-dup pair survives the
    verifier if EITHER endpoint resembles ANY hub — k×(b-1) pairs instead
    of b-1. The k-smallest ranking sorts only mega-bucket member ids
    (8-byte rows, spillable window sort), never signatures or text."""
    banded = lsh_buckets(signatures, bands=bands, id_col=id_col, bucket_fn=bucket_fn)

    stats = banded.groupBy("band", "bucket").agg(
        F.count(F.lit(1)).alias("_n"), F.min(id_col).alias("_min_id")
    ).where(F.col("_n") > 1)

    small = stats.where(F.col("_n") <= max_bucket).drop("_n", "_min_id")
    grouped = (
        banded.join(small, ["band", "bucket"], "left_semi")
        .groupBy("band", "bucket")
        .agg(F.sort_array(F.collect_set(id_col)).alias("ids"))
    )
    small_pairs = grouped.select(
        F.explode(
            F.expr(
                "flatten(transform(ids, (x, i) -> "
                "transform(slice(ids, i + 2, size(ids)), y -> struct(x as a_id, y as b_id))))"
            )
        ).alias("p")
    ).select("p.a_id", "p.b_id")

    big = stats.where(F.col("_n") > max_bucket).select("band", "bucket", "_min_id")
    if n_hubs <= 1:
        big_pairs = (
            banded.join(big, ["band", "bucket"])
            .where(F.col(id_col) != F.col("_min_id"))
            .select(F.col("_min_id").alias("a_id"), F.col(id_col).alias("b_id"))
        )
    else:
        members = banded.join(big.select("band", "bucket"), ["band", "bucket"])
        w = Window.partitionBy("band", "bucket").orderBy(id_col)
        hubs = (
            members.withColumn("_rk", F.row_number().over(w))
            .where(F.col("_rk") <= n_hubs)
            .select("band", "bucket", F.col(id_col).alias("_hub"))
        )
        big_pairs = (
            members.join(hubs, ["band", "bucket"])
            .where(F.col(id_col) != F.col("_hub"))
            .select(
                F.least(F.col(id_col), F.col("_hub")).alias("a_id"),
                F.greatest(F.col(id_col), F.col("_hub")).alias("b_id"),
            )
        )
    return small_pairs.unionByName(big_pairs).distinct()


def df_capped_shingles(
    doc_shingles: DataFrame,
    max_doc_freq: int,
    df_observation=None,
) -> DataFrame:
    """The 100 TB stop-shingle guard, standalone: drop shingles whose
    document frequency exceeds ``max_doc_freq`` (web boilerplate — headers,
    licenses, navigation — lands in every crawl document and would
    contribute df² rows to any inverted-index join and drag every MinHash
    bucket together). Run it ONCE, up front, and feed the capped set to
    both the signature and the verify stages; ``jaccard_pairs`` also
    accepts ``max_doc_freq`` directly for standalone use. Pass an
    ``Observation`` to record the number of dropped shingles
    (``dropped_shingles``) — capping is never silent."""
    freq = doc_shingles.groupBy("shingle").agg(F.count(F.lit(1)).alias("_df"))
    if df_observation is not None:
        freq = freq.observe(
            df_observation,
            F.sum((F.col("_df") > max_doc_freq).cast("long")).alias("dropped_shingles"),
        )
    kept = freq.where(F.col("_df") <= max_doc_freq).select("shingle")
    return doc_shingles.join(kept, "shingle", "left_semi")


def jaccard_pairs(
    doc_shingles: DataFrame,
    min_jaccard: float = 0.5,
    id_col: str = "doc_id",
    candidates: DataFrame | None = None,
    max_doc_freq: int | None = None,
    df_observation=None,
) -> DataFrame:
    """Exact shingle-set Jaccard for pairs sharing ≥1 shingle:
    (a_id, b_id, jaccard). Inverted-index self-join on the shingle — the
    physical plan is: shuffle both sides on `shingle` (sort-merge or, after
    AQE stats, broadcast), count co-occurrences per pair, then join two
    tiny size relations. With ``candidates`` (e.g. LSH output) the shingle
    relation is first semi-joined down to the doc ids that appear in any
    candidate pair — BELOW the inverted-index self-join — so the
    co-occurrence work is O(|candidate docs|' shingles), not O(Σ df²) over
    the whole corpus; a second semi-join above the aggregate then drops
    coincidental non-candidate pairs among candidate docs. (Restricting
    the ids does not change any surviving pair's jaccard: a doc's own
    shingle set and size are id-local.) This ordering is what makes LSH
    actually pay off at 100 TB — the exact pass never scores, or even
    shuffles, shingles of non-candidate documents.

    ``max_doc_freq``: the 100 TB guard. A stop-shingle shared by n docs
    contributes n² rows to the self-join — one shingle appearing in 1M
    docs is 10^12 join rows. Setting ``max_doc_freq`` drops shingles whose
    document frequency exceeds it BEFORE the join (the standard DF-cap of
    web-scale dedup); per-doc sizes are recomputed over the filtered
    shingle space, so the result is exactly jaccard-over-non-stop-shingles
    — deterministic and oracle-expressible, not a silent approximation of
    the uncapped number. Pass an ``Observation`` as ``df_observation`` to
    record how many distinct shingles the cap dropped
    (``dropped_shingles`` metric) — capping is never silent."""
    if max_doc_freq is not None:
        doc_shingles = df_capped_shingles(doc_shingles, max_doc_freq, df_observation)
    if candidates is not None:
        # restrict to candidate doc ids BEFORE the self-join (the DF cap
        # above stays corpus-global: stop-shingles are a property of the
        # whole corpus, not of the candidate subset).
        # The candidate relation feeds THREE consumers (both id-set arms
        # and the post-aggregate semi-join) and the restricted shingle
        # relation three more (sizes + both join sides) — without pinning
        # them, every consumer re-runs the entire upstream LSH pipeline.
        # Both are small by construction (pairs that survived banding, and
        # candidate docs' shingles), so MEMORY_AND_DISK persist is the
        # right trade at any scale; Spark evicts LRU if pressure hits.
        candidates = candidates.persist(StorageLevel.MEMORY_AND_DISK)
        cand_ids = (
            candidates.select(F.col("a_id").alias(id_col))
            .unionByName(candidates.select(F.col("b_id").alias(id_col)))
            .distinct()
        )
        doc_shingles = doc_shingles.join(cand_ids, id_col, "left_semi").persist(
            StorageLevel.MEMORY_AND_DISK
        )
    sizes = doc_shingles.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    a = doc_shingles.select(F.col(id_col).alias("a_id"), "shingle")
    b = doc_shingles.select(F.col(id_col).alias("b_id"), "shingle")
    co = (
        a.join(b, "shingle")
        .where(F.col("a_id") < F.col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(F.count(F.lit(1)).alias("overlap"))
    )
    if candidates is not None:
        co = co.join(candidates, ["a_id", "b_id"], "left_semi")
    na = sizes.select(F.col(id_col).alias("a_id"), F.col("n").alias("na"))
    nb = sizes.select(F.col(id_col).alias("b_id"), F.col("n").alias("nb"))
    out = (
        co.join(F.broadcast(na), "a_id")
        .join(F.broadcast(nb), "b_id")
        .select(
            "a_id",
            "b_id",
            (F.col("overlap") / (F.col("na") + F.col("nb") - F.col("overlap"))).alias("jaccard"),
        )
    )
    return out.where(F.col("jaccard") >= min_jaccard)


def connected_components(
    pairs: DataFrame,
    a_col: str = "a_id",
    b_col: str = "b_id",
    max_iter: int = 50,
) -> DataFrame:
    """Connected components over a near-dup pair set: (id, component) for
    every id appearing in ≥1 pair, component = the minimum id reachable —
    i.e. the canonical keeper of each near-dup cluster (the transitive
    closure the star-expansion docstring above promises downstream).

    Algorithm: min-label propagation with pointer jumping. Each iteration
    (a) lowers every node's label to the min over its neighbors' labels
    (one groupBy over the edge relation — partial aggregation combines
    map-side) and (b) jumps each label to its label's label (one join on
    the label relation), so label distances roughly halve per round:
    convergence in O(log diameter) iterations, not O(diameter). Near-dup
    graphs are shallow by construction (LSH star expansion routes
    mega-buckets through a hub ⇒ diameter ≤ 2 per bucket), so 2–3 rounds
    are typical at any scale. Each iteration materializes the label
    relation with ``localCheckpoint`` — O(|V|) rows — which truncates the
    iterative lineage (without it the plan doubles per round); the only
    driver-side action per round is the changed-label count on the
    checkpointed relation. Deterministic: min() everywhere, no RNG."""
    e = pairs.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
    # checkpoint the symmetric edge relation FIRST: the upstream pair
    # pipeline (LSH + verify) can be expensive, and both the label init and
    # every iteration read edges — one materialization, not two
    edges = e.unionByName(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).distinct().localCheckpoint()
    labels = (
        edges.select(F.col("u").alias("id")).distinct()
        .withColumn("comp", F.col("id"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        nbr = (
            edges.join(
                labels.select(F.col("id").alias("v"), F.col("comp").alias("vc")), "v"
            )
            .groupBy("u")
            .agg(F.min("vc").alias("nc"))
            .select(F.col("u").alias("id"), "nc")
        )
        prop = labels.join(nbr, "id", "left").select(
            "id", "comp", F.least("comp", F.coalesce("nc", "comp")).alias("c1")
        )
        jump = prop.select(F.col("id").alias("jid"), F.col("c1").alias("jc"))
        merged = (
            prop.join(jump, prop["c1"] == jump["jid"], "left")
            .select(
                "id", "comp",
                F.least("c1", F.coalesce("jc", "c1")).alias("new_comp"),
            )
            .localCheckpoint()
        )
        changed = merged.where(F.col("new_comp") < F.col("comp")).count()
        labels = merged.select("id", F.col("new_comp").alias("comp"))
        if changed == 0:
            break
    return labels.select(F.col("id"), F.col("comp").alias("component"))


def simhash(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int | None = None,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """SimHash fingerprint per doc: (id, simhash). Token-hash bit votes
    are summed bit-parallel: explode tokens → hash → per bit b an integer
    aggregate sum(±1 by bit b) → sign → fingerprint. All codegen'd integer
    expressions; the single shuffle is the groupBy(id) with map-side
    partial aggregation.

    ``hash_fn``: 'xxhash64' stays fully in codegen and is **64-bit by
    default** — the scale flavor. 32 bits is too narrow for a web-scale
    corpus: at ≳10^5 docs, random 32-bit fingerprints within Hamming ≤ 3
    collide constantly (birthday pressure on 2^32) and 8-bit band slices
    give only 256 buckets per band. 'md5_32' takes the first 8 hex digits
    of md5 as an unsigned 32-bit int — engine-portable (DuckDB:
    ``CAST('0x'||substr(md5(w),1,8) AS BIGINT)``), kept ONLY for oracle
    parity at test scale.

    ``bits`` defaults per flavor (64 for xxhash64, 32 for md5_32); the
    fingerprint is assembled with ``bitwiseOR`` of single-bit terms, so
    bit 63 (the sign bit of LongType) is safe under ANSI arithmetic."""
    if bits is None:
        bits = 64 if hash_fn == "xxhash64" else 32
    if hash_fn == "xxhash64":
        h = F.xxhash64("w")
    elif hash_fn == "md5_32":
        if bits > 32:
            raise ValueError("md5_32 provides only 32 hash bits")
        h = F.conv(F.substring(F.md5("w"), 1, 8), 16, 10).cast("long")
    else:
        raise ValueError(f"unknown hash_fn {hash_fn!r}")
    tok = docs.select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), " ")).alias("w"),
    ).select(F.col(id_col), h.alias("h"))
    one = F.lit(1).cast("long")
    votes = [
        F.sum(
            F.when(F.col("h").bitwiseAND(F.shiftleft(one, b)) != 0, 1).otherwise(-1)
        ).alias(f"b{b}")
        for b in range(bits)
    ]
    agg = tok.groupBy(id_col).agg(*votes)
    fp = F.lit(0).cast("long")
    for b in range(bits):
        term = F.when(F.col(f"b{b}") > 0, F.shiftleft(one, b)).otherwise(F.lit(0).cast("long"))
        fp = fp.bitwiseOR(term)
    return agg.select(F.col(id_col), fp.alias("simhash"))


def _popcount32(col):
    """Hamming weight of a value's low 32 bits via SWAR expressions (no
    UDF). Operands stay well inside 56 bits, so the multiply is safe under
    ANSI long arithmetic."""
    x = col.bitwiseAND(F.lit(0xFFFFFFFF))
    x = x - F.shiftright(x, 1).bitwiseAND(F.lit(0x55555555))
    x = x.bitwiseAND(F.lit(0x33333333)) + F.shiftright(x, 2).bitwiseAND(F.lit(0x33333333))
    x = (x + F.shiftright(x, 4)).bitwiseAND(F.lit(0x0F0F0F0F))
    return F.shiftright(x * F.lit(0x01010101), 24).bitwiseAND(F.lit(0xFF))


def _popcount64(col):
    """64-bit Hamming weight as the sum of the two 32-bit halves — avoids
    the classic 64-bit SWAR multiply, which wraps (and under ANSI mode
    would throw) on LongType."""
    return _popcount32(col) + _popcount32(F.shiftrightunsigned(col, 32))


def simhash_near_pairs(
    fingerprints: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    bands: int = 4,
    bits: int = 32,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ max_hamming.

    Pigeonhole banding: split the ``bits``-wide fingerprint into ``bands``
    slices; any pair within distance < bands agrees exactly on ≥1 slice,
    so the candidate join shuffles on (band, slice_value) only. Exact
    Hamming is then verified with a SWAR popcount expression.

    At corpus scale use ``bits=64`` (the xxhash64 simhash flavor): 4×16-bit
    slices give 65,536 buckets per band where 4×8-bit slices give only 256
    — the candidate join is O(n²/2^16) instead of O(n²/2^8), and the wider
    fingerprint keeps false candidates (random pairs within Hamming ≤ 3)
    negligible at ≳10^5 docs. The 32-bit default exists for the md5_32
    oracle-parity flavor only."""
    width = bits // bands
    mask = (1 << width) - 1
    banded = None
    for b in range(bands):
        part = fingerprints.select(
            F.col(id_col),
            F.col("simhash"),
            F.lit(b).alias("band"),
            F.shiftrightunsigned(F.col("simhash"), b * width)
            .bitwiseAND(F.lit(mask))
            .alias("slice"),
        )
        banded = part if banded is None else banded.unionByName(part)
    a = banded.select(F.col(id_col).alias("a_id"), F.col("simhash").alias("sh_a"), "band", "slice")
    b_ = banded.select(F.col(id_col).alias("b_id"), F.col("simhash").alias("sh_b"), "band", "slice")
    cand = (
        a.join(b_, ["band", "slice"])
        .where(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", "sh_a", "sh_b")
        .distinct()
    )
    pop = _popcount64 if bits > 32 else _popcount32
    ham = pop(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        cand.withColumn("hamming", ham.cast("int"))
        .where(F.col("hamming") <= max_hamming)
        .select("a_id", "b_id", "hamming")
    )


def winnow_fingerprints(
    docs: DataFrame,
    k: int = 8,
    window: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_fn: str = "md5_32",
) -> DataFrame:
    """Winnowing document sketches (Schleimer/Wilkerson/Aiken, SIGMOD'03 —
    the MOSS fingerprinter): hash every character k-gram of the lowercased
    text, then select the minimum hash of every run of ``window``
    consecutive positions; the distinct selections are the sketch.
    Coverage guarantee: any substring of length ≥ k + window - 1 shared by
    two documents contributes at least one shared fingerprint — so this
    detects PARTIAL overlap (a copied passage inside otherwise-different
    documents), which whole-document MinHash/SimHash sketches dilute away.
    Sketch density is ~2/(window+1) of all k-grams, position-independent.

    Scale shape: one projection per document — transform/slice/array_min
    over per-row arrays, no UDF, no shuffle, no explode (O(n·window) work
    per doc, arrays never leave the row). The classic rolling-hash
    O(1)-update trick is a sequential-CPU optimization; each k-gram hash
    here is an independent vectorized expression over the substring.

    Both the lowered text and the k-gram hash array are LET-BOUND via
    single-element ``transform(array(expensive), x -> ...)`` so each is
    evaluated once per row. Naming them with ``withColumn`` instead lets
    CollapseProject inline the full hash-array expression into every
    window-min lambda — O(len²) md5 calls per doc (measured ~400 s for
    600 docs at sf0.001; the let-bound form is <2 s).

    ``md5_32`` reproduces bit-for-bit in the DuckDB oracle (same pattern
    as ``simhash``'s oracle flavor); ``xxhash64`` is the 64-bit scale
    flavor (no 32-bit birthday collisions at corpus size)."""
    hash_sub = {
        "md5_32": f"cast(conv(substr(md5(substring(t, i + 1, {k})), 1, 8), 16, 10) as bigint)",
        "xxhash64": f"xxhash64(substring(t, i + 1, {k}))",
    }[hash_fn]
    min_len = k + window - 1
    empty = "cast(array() as array<bigint>)"
    # guards: sequence(0, negative) would count DOWN — a doc shorter than
    # k + window - 1 has no complete winnowing window and sketches empty
    sketch = f"""
    transform(array(lower(coalesce({text_col}, ''))), t ->
      transform(array(CASE WHEN length(t) >= {min_len}
                      THEN transform(sequence(0, length(t) - {k}), i -> {hash_sub})
                      ELSE {empty} END), hs ->
        CASE WHEN size(hs) >= {window}
        THEN array_distinct(transform(sequence(0, size(hs) - {window}),
                                      w -> array_min(slice(hs, w + 1, {window}))))
        ELSE {empty} END
      )[0]
    )[0]
    """
    return docs.select(
        F.col(id_col),
        F.expr(sketch).alias("fingerprints"),
    ).select(
        F.col(id_col),
        F.col("fingerprints"),
        F.size("fingerprints").alias("sketch_size"),
    )


def winnow_overlap_pairs(
    sketches: DataFrame,
    min_shared: int = 2,
    max_doc_freq: int | None = None,
    id_col: str = "doc_id",
    df_observation=None,
) -> DataFrame:
    """Partial-overlap candidate pairs from winnowing sketches: explode
    the (small) sketches into an inverted fingerprint index, self-join,
    and keep pairs sharing ≥ ``min_shared`` fingerprints. The join ships
    (id, 8-byte fingerprint) rows — never text — and the shuffle is sized
    by sketch density (~2/(window+1) of k-grams), not document length.

    ``max_doc_freq`` is the same stop-fingerprint guard as the shingle
    DF-cap (boilerplate passages land in every crawl document and would
    contribute df² join rows); drops are Observation-logged, never
    silent.

    The exploded index is persisted (memory-with-disk-spill) before use:
    it has up to four consumers (both self-join sides × the DF-frequency
    branch under each) and without persistence every one replays the full
    sketch computation from the raw text scan — at corpus scale that is
    sketching the corpus 4×. The persisted index is (id, 8-byte
    fingerprint) rows — a small fraction of text size."""
    sel = sketches.select(
        F.col(id_col), F.explode("fingerprints").alias("fp")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    if max_doc_freq is not None:
        freq = sel.groupBy("fp").agg(F.count(F.lit(1)).alias("_df"))
        if df_observation is not None:
            freq = freq.observe(
                df_observation,
                F.sum((F.col("_df") > max_doc_freq).cast("long")).alias(
                    "dropped_fingerprints"
                ),
            )
        kept = freq.where(F.col("_df") <= max_doc_freq).select("fp")
        sel = sel.join(kept, "fp", "left_semi")
    a = sel.select(F.col(id_col).alias("a_id"), "fp")
    b = sel.select(F.col(id_col).alias("b_id"), "fp")
    return (
        a.join(b, "fp")
        .where(F.col("a_id") < F.col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )
