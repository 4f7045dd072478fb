"""Scale-proofing tests for the near-dup path (VERDICT round-1 #7):

* the xxhash64 scale flavors agree with the oracle-verified md5 flavors,
* a pathological mega-bucket (1k identical docs) expands linearly (star
  expansion), not quadratically, and loses no member,
* the shingle document-frequency cap bounds the inverted-index join and
  reports what it dropped.
"""

from __future__ import annotations

from pyspark.sql import Observation
from pyspark.sql import functions as F

from nifi_nlp_processor_spark.operators.doc_dedup import (
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_signatures,
    shingles,
    simhash,
    simhash_near_pairs,
)


def _docs(spark, n=40, dup_every=4):
    """Deterministic corpus: n docs of distinct token streams; every
    ``dup_every``-th doc gets a near-identical twin (one appended token)."""
    base = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            *[
                F.concat(F.lit(f"w{j}_"), (F.col("id") * 37 + j * 11).cast("string"))
                for j in range(30)
            ],
        ).alias("text"),
    )
    twins = base.where(F.col("doc_id") % dup_every == 0).select(
        (F.col("doc_id") + 10000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" tail")).alias("text"),
    )
    return base.unionByName(twins)


def test_lsh_flavors_agree(spark):
    """xxhash64 banding (scale path) and concat/md5 banding (oracle path)
    must produce the same verified near-dup pairs on the twin corpus —
    both catch every planted twin."""
    docs = _docs(spark)
    sh = shingles(docs, k=3)
    planted = {(i, i + 10000) for i in range(0, 40, 4)}

    sig_md5 = minhash_signatures(sh, num_hashes=8, hash_fn="md5")
    cand_md5 = lsh_candidate_pairs(sig_md5, bands=4, bucket_fn="concat")
    got_md5 = {
        (r.a_id, r.b_id)
        for r in jaccard_pairs(sh, min_jaccard=0.5, candidates=cand_md5).collect()
    }

    sig_xx = minhash_signatures(sh, num_hashes=8, hash_fn="xxhash64")
    cand_xx = lsh_candidate_pairs(sig_xx, bands=4, bucket_fn="xxhash64")
    got_xx = {
        (r.a_id, r.b_id)
        for r in jaccard_pairs(sh, min_jaccard=0.5, candidates=cand_xx).collect()
    }

    assert planted <= got_md5
    assert planted <= got_xx
    assert got_md5 == got_xx


def test_simhash_near_pairs_pigeonhole_complete(spark):
    """Both hash flavors at their native widths — md5_32 at 32 bits
    (4×8-bit slices) and xxhash64 at 64 bits (4×16-bit slices, the corpus-
    scale flavor): banding must surface EVERY pair whose true Hamming
    distance is ≤ max_hamming (the pigeonhole guarantee — with 4 bands any
    pair within distance 3 agrees exactly on ≥1 slice), and nothing
    farther. Cross-checked against a driver-side popcount over all
    C(50,2) fingerprint pairs."""
    docs = _docs(spark)
    for flavor, bits in (("xxhash64", 64), ("md5_32", 32)):
        mask = (1 << bits) - 1
        fps = sorted(
            (r.doc_id, r.simhash) for r in simhash(docs, hash_fn=flavor).collect()
        )
        expected = {
            (a, b)
            for i, (a, fa) in enumerate(fps)
            for b, fb in fps[i + 1 :]
            if bin((fa ^ fb) & mask).count("1") <= 3
        }
        got = {
            (r.a_id, r.b_id)
            for r in simhash_near_pairs(
                simhash(docs, hash_fn=flavor), max_hamming=3, bands=4, bits=bits
            ).collect()
        }
        assert got == expected, flavor
        assert expected, f"{flavor}: vacuous (no near pairs in fixture)"


def test_simhash_64bit_finds_planted_twins(spark):
    """The 64-bit xxhash64 scale flavor on near-identical long docs: one
    extra token on a 200-token doc flips only the tie-margin bits, so
    twins land within the pigeonhole bound (≤3) and the 4×16-bit banding
    surfaces them; distinct-content docs stay far apart. Verified against
    a driver-side popcount (got == expected), with non-vacuity asserts:
    twins are found, no false pair at this corpus size, and the
    fingerprints actually use the high 32 bits (64-bit isn't silently
    truncated)."""
    base = spark.range(30).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            *[
                F.concat(F.lit(f"w{j}_"), (F.col("id") * 37 + j * 11).cast("string"))
                for j in range(200)
            ],
        ).alias("text"),
    )
    twins = base.where(F.col("doc_id") % 4 == 0).select(
        (F.col("doc_id") + 10000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" tail")).alias("text"),
    )
    docs = base.unionByName(twins)
    fps = sorted(
        (r.doc_id, r.simhash)
        for r in simhash(docs, hash_fn="xxhash64").collect()  # bits → 64
    )
    assert any((f & ((1 << 64) - 1)) > 0xFFFFFFFF for _, f in fps), "high 32 bits unused"
    expected = {
        (a, b)
        for i, (a, fa) in enumerate(fps)
        for b, fb in fps[i + 1 :]
        if bin((fa ^ fb) & ((1 << 64) - 1)).count("1") <= 3
    }
    got = {
        (r.a_id, r.b_id)
        for r in simhash_near_pairs(
            simhash(docs, hash_fn="xxhash64"), max_hamming=3, bands=4, bits=64
        ).collect()
    }
    assert got == expected
    planted = {(i, i + 10000) for i in range(0, 30, 4)}
    assert got & planted, "vacuous: no twin within Hamming 3"
    assert got <= planted, f"false near-pairs at 64 bits: {sorted(got - planted)[:5]}"


def test_mega_bucket_star_expansion(spark):
    """1k identical docs land in one LSH bucket per band. With
    max_bucket=100 the expansion must be linear (star): every member
    appears, pair count is n-1 per component — not C(1000,2)=499500."""
    n = 1000
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit("the same exact document body repeated many many times over").alias("text"),
    )
    sh = shingles(docs, k=3)
    sig = minhash_signatures(sh, num_hashes=8)
    pairs = lsh_candidate_pairs(sig, bands=4, max_bucket=100)
    rows = pairs.collect()
    # star expansion: hub = min id (0), exactly n-1 pairs, nobody dropped
    assert len(rows) == n - 1
    members = {r.a_id for r in rows} | {r.b_id for r in rows}
    assert members == set(range(n))
    assert all(r.a_id == 0 for r in rows)


def test_small_buckets_unaffected_by_cap(spark):
    """Buckets under the cap still get full C(b,2) expansion."""
    docs = _docs(spark)
    sh = shingles(docs, k=3)
    sig = minhash_signatures(sh, num_hashes=8)
    uncapped = {
        (r.a_id, r.b_id)
        for r in lsh_candidate_pairs(sig, bands=4, max_bucket=1 << 30).collect()
    }
    capped = {
        (r.a_id, r.b_id)
        for r in lsh_candidate_pairs(sig, bands=4, max_bucket=100).collect()
    }
    assert uncapped == capped


def test_jaccard_doc_freq_cap(spark):
    """A stop-shingle present in every doc is dropped by the DF cap; the
    drop is observable, jaccard is computed over the filtered space, and
    twin pairs survive."""
    docs = _docs(spark).withColumn(
        "text", F.concat(F.lit("common stop words "), F.col("text"))
    )
    sh = shingles(docs, k=3)
    obs = Observation("dfcap")
    out = jaccard_pairs(sh, min_jaccard=0.5, max_doc_freq=10, df_observation=obs)
    got = {(r.a_id, r.b_id) for r in out.collect()}
    planted = {(i, i + 10000) for i in range(0, 40, 4)}
    assert planted <= got
    # 'common stop words' (and the two bridge shingles into each doc's
    # unique stream are per-doc-unique, so exactly one shingle is global)
    assert obs.get["dropped_shingles"] >= 1


def test_jaccard_verify_restricted_to_candidate_docs(spark):
    """VERDICT r2 #1: with ``candidates`` given, the exact-verify must
    restrict the shingle relation to candidate doc ids BELOW the
    inverted-index self-join — O(|candidate docs|), not O(Σ df²) over the
    corpus — plus a pair-level semi-join above the aggregate. Two checks:

    1. plan structure: in the optimized logical plan, the self-join on
       ``shingle`` has a LeftSemi join among its descendants (the id
       restriction sits under it, not only above the aggregate);
    2. semantics: results equal the unrestricted run filtered to the
       candidate pairs (restriction changes cost, never values), and a
       non-candidate pair sharing shingles does NOT appear."""
    docs = _docs(spark)
    sh = shingles(docs, k=3)
    sig = minhash_signatures(sh, num_hashes=8)
    cand = lsh_candidate_pairs(sig, bands=4)
    out = jaccard_pairs(sh, min_jaccard=0.5, candidates=cand)

    plan = out._jdf.queryExecution().optimizedPlan().toString()
    lines = plan.splitlines()

    def depth(line: str) -> int:
        return len(line) - len(line.lstrip(" :+-"))

    join_idx = next(
        i for i, l in enumerate(lines) if "Join Inner" in l and "shingle" in l
    )
    d0 = depth(lines[join_idx])
    subtree = []
    for l in lines[join_idx + 1 :]:
        if depth(l) <= d0:
            break
        subtree.append(l)
    assert any("LeftSemi" in l for l in subtree), (
        "no LeftSemi below the shingle self-join — the verify still scans "
        "non-candidate docs:\n" + plan
    )

    got = {(r.a_id, r.b_id, round(r.jaccard, 6)) for r in out.collect()}
    cand_set = {(r.a_id, r.b_id) for r in cand.collect()}
    unrestricted = {
        (r.a_id, r.b_id, round(r.jaccard, 6))
        for r in jaccard_pairs(sh, min_jaccard=0.5).collect()
        if (r.a_id, r.b_id) in cand_set
    }
    assert got == unrestricted
    assert got, "vacuous: no verified candidate pairs"


def test_embedding_near_pairs_recall_and_precision(spark):
    """Banded-LSH cosine near-dup: candidates verified by exact cosine, so
    precision is 1 at the threshold by construction; with 3 bands x 4 bits
    the planted +0.4-bump pairs (cosine 0.92-0.94) are all recalled. The
    result must equal brute force exactly here (recall 1.0 at this
    banding), and contain nothing but the 15 planted pairs (natural max
    pairwise cosine in this corpus is ~0.51)."""
    from nifi_nlp_processor_spark.operators.similarity import (
        embedding_near_pairs,
        with_cosine,
    )
    from nifi_nlp_processor_spark.queries import _embeddings_with_near_dups

    corpus = _embeddings_with_near_dups(spark, "/root/testdata/sf0.001")
    got = {
        (r.id_a, r.id_b)
        for r in embedding_near_pairs(corpus, threshold=0.9).collect()
    }
    assert got == {(i, i + 100000) for i in range(15)}

    # brute-force cross-check (small corpus): every pair >= threshold is
    # found by the banding, none below it survives the verify
    a = corpus.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("_va"))
    b = corpus.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("_vb"))
    brute = (
        with_cosine(a.crossJoin(b).where(F.col("id_a") < F.col("id_b")), "_va", "_vb")
        .where(F.round("score", 6) >= 0.9)
    )
    assert {(r.id_a, r.id_b) for r in brute.collect()} == got


def test_connected_components_chain_and_islands(spark):
    """Cluster resolution over a worst-case shape for label propagation: a
    64-node path graph (diameter 63 — plain propagation would need 63
    rounds; pointer jumping must converge in far fewer than max_iter), two
    disjoint triangles, and an isolated pair. Every node must resolve to
    its component's minimum id."""
    from nifi_nlp_processor_spark.operators.doc_dedup import connected_components

    chain = [(i, i + 1) for i in range(100, 163)]          # path 100..163
    tri1 = [(0, 1), (1, 2), (0, 2)]
    tri2 = [(10, 11), (11, 12), (10, 12)]
    pair = [(50, 51)]
    edges = spark.createDataFrame(chain + tri1 + tri2 + pair, "a_id long, b_id long")
    got = {
        (r.id, r.component)
        for r in connected_components(edges, max_iter=12).collect()
    }
    want = (
        {(i, 100) for i in range(100, 164)}
        | {(i, 0) for i in (0, 1, 2)}
        | {(i, 10) for i in (10, 11, 12)}
        | {(50, 50), (51, 50)}
    )
    assert got == want


def test_connected_components_empty_and_star(spark):
    """Empty pair set → empty result; a star (the LSH mega-bucket expansion
    shape) converges in one round to the hub."""
    from nifi_nlp_processor_spark.operators.doc_dedup import connected_components

    empty = spark.createDataFrame([], "a_id long, b_id long")
    assert connected_components(empty).count() == 0

    star = spark.createDataFrame([(5, i) for i in range(6, 30)], "a_id long, b_id long")
    got = {(r.id, r.component) for r in connected_components(star).collect()}
    assert got == {(i, 5) for i in range(5, 30)}


def test_mega_bucket_multi_hub_expansion(spark):
    """n_hubs=k: every mega-bucket member pairs with each of the k
    smallest ids — still linear (k*(n-1)-ish, not C(n,2)) — so a near-dup
    pair inside a heterogeneous mega-bucket survives exact verification
    when EITHER endpoint resembles ANY hub, not only the single min-id."""
    n = 500
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit("the same exact document body repeated many many times over").alias("text"),
    )
    sh = shingles(docs, k=3)
    sig = minhash_signatures(sh, num_hashes=8)
    pairs = {
        (r.a_id, r.b_id)
        for r in lsh_candidate_pairs(sig, bands=4, max_bucket=100, n_hubs=3).collect()
    }
    # hubs are ids 0,1,2: every other member pairs with all three
    for hub in (0, 1, 2):
        others = set(range(n)) - {hub}
        assert all((min(hub, o), max(hub, o)) in pairs for o in others)
    # linear, not quadratic: 3*(n-1) distinct hub pairs minus the 3
    # double-counted hub-hub pairs
    assert len(pairs) == 3 * (n - 1) - 3
    # the single-hub default is unchanged
    single = lsh_candidate_pairs(sig, bands=4, max_bucket=100).collect()
    assert len(single) == n - 1
