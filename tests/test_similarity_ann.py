"""ANN property tests (operators/similarity.py).

The registry oracle (queries.py `ann_*`) already pins each flavor against
DuckDB SQL; these tests pin the SEMANTICS independently:

* IVF with every cell probed degenerates to exact brute-force top-k
  (recall exactly 1 — the operator's candidate restriction is its ONLY
  approximation).
* IVF at partial nprobe equals a from-scratch pure-Python reference
  (assignment, probing, scoring, ranking all re-derived outside Spark).
* Recall against exact top-k is monotone non-decreasing in nprobe.
* Cell assignment breaks exact distance ties to the lowest cid.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from nifi_nlp_processor_spark.operators.similarity import (
    cosine_topk,
    ivf_assign,
    ivf_topk,
    seed_centroids,
)
from nifi_nlp_processor_spark.queries import _embeddings_with_near_dups

SF = "/root/testdata/sf0.001"
N_CELLS = 8
K = 5


def _rows(df):
    return {(r.query_id, r.neighbor_id, r.rank, r.score) for r in df.collect()}


def _cosine(a, b):
    # sequential left fold in double precision — the same order the Spark
    # expressions use (F.aggregate), so scores agree to the last bit
    dot = 0.0
    na = 0.0
    nb = 0.0
    for x, y in zip(a, b):
        dot += float(x) * float(y)
    for x in a:
        na += float(x) * float(x)
    for y in b:
        nb += float(y) * float(y)
    return dot / (na ** 0.5 * nb ** 0.5)


def _py_ivf_topk(corpus, queries, n_cells, nprobe, k):
    """From-scratch IVF reference: lowest-id centroids, rounded-distance
    assignment with lowest-cid ties, nprobe nearest cells per query, exact
    cosine rounded to 4 digits, rank by (score desc, neighbor asc)."""
    cents = sorted(corpus)[:n_cells]
    cent_vecs = {cid: corpus[cid] for cid in cents}

    def cell_order(v):
        return sorted(
            (round(1.0 - _cosine(v, cv), 6), cid) for cid, cv in cent_vecs.items()
        )

    assign = {vid: cell_order(v)[0][1] for vid, v in corpus.items()}
    out = set()
    for qid, qv in queries.items():
        probed = {cid for _, cid in cell_order(qv)[:nprobe]}
        cands = [
            (round(_cosine(qv, nv), 4), nid)
            for nid, nv in corpus.items()
            if nid != qid and assign[nid] in probed
        ]
        cands.sort(key=lambda t: (-t[0], t[1]))
        for rank, (score, nid) in enumerate(cands[:k], start=1):
            out.add((qid, nid, rank, score))
    return out


def _corpus_dict(df):
    return {int(r.vec_id): list(r.embedding) for r in df.collect()}


def test_ivf_full_probe_equals_brute_force(spark):
    corpus = _embeddings_with_near_dups(spark, SF)
    queries = corpus.where(F.col("vec_id") < 8)
    exact = cosine_topk(corpus, queries, k=K)
    full = ivf_topk(corpus, queries, n_cells=N_CELLS, nprobe=N_CELLS, k=K)
    assert _rows(full) == _rows(exact)


def test_ivf_matches_pure_python_reference(spark):
    corpus_df = _embeddings_with_near_dups(spark, SF)
    queries_df = corpus_df.where(F.col("vec_id") < 8)
    got = _rows(ivf_topk(corpus_df, queries_df, n_cells=N_CELLS, nprobe=2, k=K))
    corpus = _corpus_dict(corpus_df)
    queries = {vid: v for vid, v in corpus.items() if vid < 8}
    assert got == _py_ivf_topk(corpus, queries, N_CELLS, nprobe=2, k=K)


def test_ivf_recall_monotone_in_nprobe(spark):
    corpus = _embeddings_with_near_dups(spark, SF)
    queries = corpus.where(F.col("vec_id") < 8)
    exact = {(q, n) for q, n, _, _ in _rows(cosine_topk(corpus, queries, k=K))}
    recalls = []
    for nprobe in (1, 2, 4, N_CELLS):
        got = {
            (q, n)
            for q, n, _, _ in _rows(
                ivf_topk(corpus, queries, n_cells=N_CELLS, nprobe=nprobe, k=K)
            )
        }
        recalls.append(len(got & exact) / len(exact))
    assert recalls == sorted(recalls), recalls
    assert recalls[-1] == 1.0


def test_ivf_assign_tie_breaks_lowest_cid(spark):
    df = spark.createDataFrame(
        [(10, [1.0, 0.0]), (11, [0.0, 1.0])], "vec_id long, embedding array<double>"
    )
    # two identical centroids: every vector is equidistant — cid 0 must win
    cents = [(0, [0.5, 0.5]), (1, [0.5, 0.5])]
    got = {(r.vec_id, r.cell) for r in ivf_assign(df, cents).collect()}
    assert got == {(10, 0), (11, 0)}


def test_seed_centroids_bounded_and_deterministic(spark):
    corpus = _embeddings_with_near_dups(spark, SF)
    a = seed_centroids(corpus, N_CELLS)
    b = seed_centroids(corpus, N_CELLS)
    assert a == b
    ids = [cid for cid, _ in a]
    assert ids == sorted(ids) and len(ids) == N_CELLS


def _py_lsh_topk(corpus, queries, planes, k):
    """From-scratch hyperplane-LSH reference: sign-bit bucket, in-bucket
    exact cosine (rounded to 4), rank by (score desc, neighbor asc)."""
    def bucket(v):
        sig = 0
        for i, p in enumerate(planes):
            d = 0.0
            for x, y in zip(v, p):
                d += float(x) * float(y)
            if d > 0:
                sig |= 1 << i
        return sig

    cb = {vid: bucket(v) for vid, v in corpus.items()}
    out = set()
    for qid, qv in queries.items():
        qb = bucket(qv)
        cands = [
            (round(_cosine(qv, nv), 4), nid)
            for nid, nv in corpus.items()
            if nid != qid and cb[nid] == qb
        ]
        cands.sort(key=lambda t: (-t[0], t[1]))
        for rank, (score, nid) in enumerate(cands[:k], start=1):
            out.add((qid, nid, rank, score))
    return out


def test_ivf_join_path_bit_identical_to_literal_path(spark):
    # max_literal_terms=0 forces the broadcast-join argmin; both physical
    # shapes must produce the same rows bit-for-bit (same folds, same
    # (distance, cid) ordering) at every nprobe
    corpus = _embeddings_with_near_dups(spark, SF)
    queries = corpus.where(F.col("vec_id") < 8)
    for nprobe in (1, 2, N_CELLS):
        lit = ivf_topk(corpus, queries, n_cells=N_CELLS, nprobe=nprobe, k=K)
        join = ivf_topk(
            corpus, queries, n_cells=N_CELLS, nprobe=nprobe, k=K,
            max_literal_terms=0,
        )
        assert _rows(join) == _rows(lit), f"nprobe={nprobe}"


def test_ivf_join_assign_matches_literal_assign(spark):
    from nifi_nlp_processor_spark.operators.similarity import ivf_assign_join

    corpus = _embeddings_with_near_dups(spark, SF).select(
        "vec_id", F.col("embedding").alias("_cv")
    )
    cents = seed_centroids(corpus, N_CELLS, vec_col="_cv")
    lit = {(r.vec_id, r.cell) for r in ivf_assign(corpus, cents, "_cv").collect()}
    jn = {
        (r.vec_id, r.cell)
        for r in ivf_assign_join(corpus, cents, "vec_id", "_cv").collect()
    }
    assert jn == lit
    # the bit-identity above holds only under ivf_assign_join's documented
    # row-unique-id contract (the literal path is row-preserving, the join
    # path groupBy-argmins on the id) — pin that the fixture honors it
    n, nd = corpus.agg(
        F.count(F.lit(1)), F.countDistinct("vec_id")
    ).collect()[0]
    assert n == nd, "ivf id contract: vec_id must be row-unique"


def test_ivf_join_path_no_expression_blowup_at_4k_cells(spark):
    # 4096 cells × 8 dims = 32k literal terms — far past the inline
    # ceiling. The join path must plan AND execute: the registry rides as
    # a 4096-row broadcast DataFrame, never as an expression tree.
    import time

    from nifi_nlp_processor_spark.operators.similarity import IVF_LITERAL_MAX_TERMS

    dim = 8
    cents = [
        (cid, [float((cid * 7 + d * 13) % 17) - 8.0 for d in range(dim)])
        for cid in range(4096)
    ]
    assert 4096 * dim > IVF_LITERAL_MAX_TERMS
    corpus = spark.createDataFrame(
        [(i, [float((i * 3 + d) % 11) - 5.0 for d in range(dim)]) for i in range(40)],
        "vec_id long, embedding array<double>",
    )
    queries = corpus.where(F.col("vec_id") < 3)
    t0 = time.time()
    out = ivf_topk(corpus, queries, nprobe=4096, k=3, centroids=cents)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert len(plan) < 2_000_000  # an inlined registry would be tens of MB
    got = _rows(out)
    assert time.time() - t0 < 120
    # full probe over every cell degenerates to exact brute force
    assert got == _rows(cosine_topk(corpus, queries, k=3))


def test_lsh_matches_pure_python_reference(spark):
    from nifi_nlp_processor_spark.operators.similarity import hyperplanes, lsh_topk

    corpus_df = _embeddings_with_near_dups(spark, SF)
    queries_df = corpus_df.where(F.col("vec_id") < 8)
    got = _rows(lsh_topk(corpus_df, queries_df, k=K, n_planes=6))
    corpus = _corpus_dict(corpus_df)
    queries = {vid: v for vid, v in corpus.items() if vid < 8}
    planes = hyperplanes(dim=64, n_planes=6, seed=42)
    assert got == _py_lsh_topk(corpus, queries, planes, k=K)
