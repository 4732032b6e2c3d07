"""LLM-pipeline operator tests beyond the oracle: LSH recall vs brute
force, MinHash-vs-Jaccard consistency, multimodal plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sparkstreamingproject_spark.llm.dedup import (
    exact_dedup, jaccard_pairs, lsh_candidate_pairs, simhash,
)
from sparkstreamingproject_spark.llm.multimodal import (
    FEATURE_DIM, attach_payload, extract_features,
)
from sparkstreamingproject_spark.llm.similarity import (
    brute_force_topk, lsh_bucket, lsh_topk,
)


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_minhash_lsh_finds_high_jaccard_pairs(spark, sf_dir):
    """Every pair with Jaccard ≥ 0.9 must appear among LSH candidates
    (with 4 bands × 2 rows, P[miss] = (1-s²)⁴ ≈ 0.1% at s=0.9)."""
    docs = _docs(spark, sf_dir)
    truth = {(r["id_a"], r["id_b"])
             for r in jaccard_pairs(docs, threshold=0.9).collect()}
    cand = {(r["id_a"], r["id_b"])
            for r in lsh_candidate_pairs(docs).collect()}
    assert truth, "fixture should contain planted near-duplicates"
    missed = truth - cand
    assert len(missed) <= max(1, len(truth) // 10), f"LSH missed {missed}"


def test_exact_dedup_keeps_min_id(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    dup = docs.union(docs.limit(5))  # plant 5 exact duplicates
    res = exact_dedup(dup)
    assert res.filter(F.col("n_copies") == 2).count() == 5
    assert res.count() == docs.count()


def test_simhash_similar_docs_close(spark, sf_dir):
    """Near-identical docs (Jaccard ≥ 0.95) should have SimHash hamming
    distance well below random (~8 for 16 bits)."""
    docs = _docs(spark, sf_dir)
    pairs = jaccard_pairs(docs, threshold=0.95).limit(20)
    sh = simhash(docs)
    a = sh.select(F.col("doc_id").alias("id_a"), F.col("simhash").alias("ha"))
    b = sh.select(F.col("doc_id").alias("id_b"), F.col("simhash").alias("hb"))
    joined = pairs.join(a, "id_a").join(b, "id_b").select(
        F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).alias("hamming"))
    rows = joined.collect()
    if rows:
        avg = sum(r["hamming"] for r in rows) / len(rows)
        assert avg <= 4, f"avg hamming {avg} too high for near-dups"


def test_lsh_topk_recall_vs_bruteforce(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 10)
    exact = brute_force_topk(emb, queries, k=5)
    approx = lsh_topk(emb, queries, k=5)
    # ANN results must be a subset of the candidate space and
    # well-formed; recall vs exact is data-dependent — require > 0
    exact_set = {(r["query_id"], r["cand_id"]) for r in exact.collect()}
    approx_set = {(r["query_id"], r["cand_id"]) for r in approx.collect()}
    assert approx_set, "LSH top-k returned nothing"
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall > 0.05, f"recall {recall} suspiciously low"


def test_lsh_bucket_deterministic(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    b1 = {r["vec_id"]: r["bucket"] for r in lsh_bucket(emb).select("vec_id", "bucket").collect()}
    b2 = {r["vec_id"]: r["bucket"] for r in lsh_bucket(emb).select("vec_id", "bucket").collect()}
    assert b1 == b2
    assert all(len(v) == 8 and set(v) <= {"0", "1"} for v in b1.values())


def test_multimodal_feature_extraction_plumbing(spark, sf_dir):
    """binary → mapInPandas → typed feature vectors: schema, batch
    shape, determinism (decode itself is the documented stub)."""
    docs = _docs(spark, sf_dir).limit(50)
    media = attach_payload(docs)
    assert dict(media.dtypes)["payload"] == "binary"
    feats = extract_features(media)
    rows = feats.collect()
    assert len(rows) == 50
    assert all(len(r["feature"]) == FEATURE_DIM for r in rows)
    assert all(r["byte_len"] > 0 for r in rows)
    # deterministic across runs
    again = {r["doc_id"]: r["feature"] for r in extract_features(media).collect()}
    assert all(again[r["doc_id"]] == r["feature"] for r in rows)


def test_payload_pruned_from_metadata_query(spark, sf_dir):
    """Metadata queries must not read the heavy binary column — the
    whole point of the multimodal column layout."""
    docs = _docs(spark, sf_dir)
    media = attach_payload(docs)
    meta_only = media.select("doc_id", "media_type")
    from sparkstreamingproject_spark.plans.inspect import scan_columns
    cols = scan_columns(meta_only)
    assert "text" not in cols or cols == []  # payload derives from text


def test_ivf_topk_recall(spark, sf_dir):
    from sparkstreamingproject_spark.llm.similarity import ivf_topk
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id").between(10, 19))
    exact = brute_force_topk(emb, queries, k=5)
    approx = ivf_topk(emb, queries, k=5, nprobe=2)
    exact_set = {(r["query_id"], r["cand_id"]) for r in exact.collect()}
    approx_set = {(r["query_id"], r["cand_id"]) for r in approx.collect()}
    assert approx_set
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.3, f"IVF nprobe=2 recall {recall} too low"


def test_connected_components_fixpoint_and_transitivity(spark):
    from sparkstreamingproject_spark.llm.dedup import connected_components
    # two chains and a singleton pair: {1,2,3,4}, {10,11}, {20,21}
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21)], ["id_a", "id_b"])
    cc = {r.u: r.label for r in connected_components(edges).collect()}
    assert cc == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20}


def test_near_dup_bucketed_path_no_collect(spark, sf_dir):
    """Forcing the size guard to 0 bytes must route near-dup pairs
    through the distributed LSH-bucketed kernel: every emitted pair is
    exact-precision (same cosine, 4dp) and a subset of the broadcast
    kernel's output, with usable recall on this data."""
    from sparkstreamingproject_spark.llm.similarity import (
        embedding_near_dup_pairs)
    emb = _emb(spark, sf_dir)
    exact = {(r["id_a"], r["id_b"]): r["cosine"]
             for r in embedding_near_dup_pairs(emb, threshold=0.3).collect()}
    bucketed = {(r["id_a"], r["id_b"]): r["cosine"]
                for r in embedding_near_dup_pairs(
                    emb, threshold=0.3, broadcast_max_bytes=0).collect()}
    assert bucketed, "bucketed kernel returned nothing"
    assert set(bucketed) <= set(exact), "bucketed emitted a non-exact pair"
    for k, v in bucketed.items():
        assert abs(v - exact[k]) < 1e-9, f"cosine mismatch on {k}"
    recall = len(bucketed) / len(exact)
    assert recall >= 0.3, f"bucketed recall {recall:.2f} too low"


def test_lsh_or_amplification_improves_recall(spark, sf_dir):
    """OR-ing independent tables must find at least every pair a single
    table finds, and (on this data) strictly more."""
    from sparkstreamingproject_spark.llm.similarity import (
        LSH_TABLE_PLANES, lsh_multi_table_pairs)
    emb = _emb(spark, sf_dir)
    one = {tuple(r) for r in
           lsh_multi_table_pairs(emb, n_tables=1,
                                 planes_per_table=LSH_TABLE_PLANES).collect()}
    three = {tuple(r) for r in
             lsh_multi_table_pairs(emb, n_tables=3,
                                   planes_per_table=LSH_TABLE_PLANES).collect()}
    assert one <= three
    assert len(three) > len(one)


def test_decontaminate_planted_overlap(spark):
    """A test doc copied verbatim from train must report contamination
    ratio 1.0; a vocabulary-disjoint doc must not appear at all."""
    from sparkstreamingproject_spark.llm.curation import decontaminate
    train = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"),
         (2, "one two three four five six")], ["doc_id", "text"])
    test = spark.createDataFrame(
        [(10, "alpha beta gamma delta epsilon zeta"),   # verbatim copy
         (11, "totally novel words here nothing shared"),
         (12, "zzz one two three four qqq")],           # partial overlap
        ["doc_id", "text"])
    got = {r["test_id"]: r for r in decontaminate(train, test).collect()}
    assert got[10]["contamination_ratio"] == 1.0
    assert 11 not in got
    assert 0 < got[12]["contamination_ratio"] < 1.0


def test_incremental_dedup_drops_exact_and_near(spark):
    from sparkstreamingproject_spark.llm.curation import incremental_dedup
    base = "the quick brown fox jumps over the lazy dog again and again"
    existing = spark.createDataFrame([(1, base)], ["doc_id", "text"])
    incoming = spark.createDataFrame(
        [(10, base),                                   # exact dup
         (11, base.replace("dog", "cat")),             # near dup (1 word)
         (12, "completely different content with no shared shingles at all")],
        ["doc_id", "text"])
    kept = {r["doc_id"] for r in
            incremental_dedup(existing, incoming).collect()}
    assert 10 not in kept, "exact duplicate survived"
    assert 11 not in kept, "near duplicate survived (band collision expected)"
    assert 12 in kept, "novel document was dropped"


def test_pii_scrub_replaces_all_occurrences(spark):
    from sparkstreamingproject_spark.llm.curation import pii_scrub
    df = spark.createDataFrame(
        [(1, "mail a@b.com and c@d.org plus 555-1234 then 555-9999")],
        ["doc_id", "text"])
    r = pii_scrub(df).collect()[0]
    assert r["n_emails"] == 2 and r["n_phones"] == 2
    import hashlib
    expect = hashlib.md5(
        b"mail <EMAIL> and <EMAIL> plus <PHONE> then <PHONE>").hexdigest()
    assert r["scrubbed_md5"] == expect


def test_repetition_stats_flags_degenerate_doc(spark):
    from sparkstreamingproject_spark.llm.curation import repetition_stats
    df = spark.createDataFrame(
        [(1, "spam spam spam spam spam"),
         (2, "all words here are unique tokens")], ["doc_id", "text"])
    got = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    assert got[1]["top_word_frac"] == 1.0 and got[1]["dup_word_ratio"] == 0.8
    assert got[2]["dup_word_ratio"] == 0.0


def test_kmeans_improves_mean_similarity(spark, sf_dir):
    """Two Lloyd iterations must not worsen the mean point-to-centroid
    cosine vs the first-N-ids init (k-means monotonicity, up to the
    6dp rounding)."""
    from sparkstreamingproject_spark.llm.similarity import (
        kmeans_assign, kmeans_centroids)
    emb = _emb(spark, sf_dir)
    pts = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    init = kmeans_centroids(emb, n_iter=0)
    trained = kmeans_centroids(emb, n_iter=2)

    from sparkstreamingproject_spark.functions.vector import cosine_similarity

    def mean_sim(cents):
        a = kmeans_assign(pts, cents).join(cents, "cell")
        return (a.select(cosine_similarity("v", "cv").alias("s"))
                .agg(F.avg("s")).collect()[0][0])

    m0, m2 = mean_sim(init), mean_sim(trained)
    assert m2 >= m0 - 1e-6, f"k-means regressed: {m0} -> {m2}"
    assert m2 > m0, "expected strict improvement on this data"


def test_pack_sequences_contiguity(spark, sf_dir):
    """Packing invariants: offsets stay inside the window; within a
    bucket, consecutive docs' (bin, offset) positions are contiguous
    (each doc starts exactly where the previous ended, mod window)."""
    from sparkstreamingproject_spark.llm.curation import pack_sequences
    W = 128
    got = pack_sequences(_docs(spark, sf_dir), window_tokens=W).collect()
    assert all(0 <= r["bin_offset"] < W for r in got)
    by_bucket = {}
    for r in sorted(got, key=lambda r: (r["bucket"], r["doc_id"])):
        prev = by_bucket.get(r["bucket"], 0)
        assert r["bin_id"] * W + r["bin_offset"] == prev, \
            f"gap in bucket {r['bucket']} at doc {r['doc_id']}"
        by_bucket[r["bucket"]] = prev + r["n_tokens"]


def test_int8_rerank_recall_vs_bruteforce(spark, sf_dir):
    """int8 quantization error is tiny at dim 64, so a 20-deep pool
    re-ranked exactly should recover nearly all of the exact top-5."""
    from sparkstreamingproject_spark.llm.similarity import int8_rerank_topk
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 10)
    exact = brute_force_topk(emb, queries, k=5)
    approx = int8_rerank_topk(emb, queries, k=5, pool=20)
    exact_set = {(r["query_id"], r["cand_id"]) for r in exact.collect()}
    approx_set = {(r["query_id"], r["cand_id"]) for r in approx.collect()}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.8, f"int8-rerank recall {recall} too low"
    # ranks well-formed: exactly 5 per query, 1..5
    per_q = {}
    for r in approx.collect():
        per_q.setdefault(r["query_id"], []).append(r["rank"])
    assert all(sorted(v) == [1, 2, 3, 4, 5] for v in per_q.values())


def test_bigram_lm_score_orders_by_typicality(spark):
    """A doc made of the corpus's dominant bigram scores higher than a
    doc of one-off transitions; single-token docs drop out."""
    from sparkstreamingproject_spark.llm.textstats import bigram_lm_score
    rows = [(0, "a b a b a b a b"),        # dominant transition
            (1, "q w e r t y u i"),        # all unique transitions
            (2, "solo")]                   # no bigrams
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in bigram_lm_score(df).collect()}
    assert 2 not in out
    assert out[0]["avg_logprob"] > out[1]["avg_logprob"]
    assert out[0]["n_bigrams"] == 7 and out[1]["n_bigrams"] == 7


def test_lsh_verified_subset_of_exact_jaccard(spark, sf_dir):
    """Verified pairs must be exactly the exact-Jaccard >= t pairs that
    LSH candidates contain: no false positives survive verification,
    and misses are only LSH false negatives (absent from candidates)."""
    from sparkstreamingproject_spark.llm.dedup import (
        jaccard_pairs, lsh_candidate_pairs, lsh_verified_pairs)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    verified = {(r["id_a"], r["id_b"])
                for r in lsh_verified_pairs(docs, threshold=0.8).collect()}
    exact = {(r["id_a"], r["id_b"])
             for r in jaccard_pairs(docs, threshold=0.8).collect()}
    cands = {(r["id_a"], r["id_b"])
             for r in lsh_candidate_pairs(docs).collect()}
    assert verified == (exact & cands)
    assert verified, "fixtures plant near-dups; verification found none"


def test_pca_project_matches_numpy(spark, sf_dir):
    """Distributed PCA (partial-Gram covariance + driver eigh +
    broadcast projection) == plain numpy PCA on the collected matrix,
    up to the shared sign canonicalization; projected variance per
    component equals the eigenvalue."""
    import numpy as np
    from sparkstreamingproject_spark.llm.features import pca_project

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    got = pca_project(emb, k=2).toPandas().sort_values("vec_id")

    pdf = emb.select("vec_id", "embedding").toPandas().sort_values("vec_id")
    X = np.asarray([np.asarray(v, dtype=np.float64)
                    for v in pdf["embedding"]])
    C = np.cov(X, rowvar=False, ddof=1)
    vals, vecs = np.linalg.eigh(C)
    W = vecs[:, ::-1][:, :2]
    for c in range(2):
        m = np.argmax(np.abs(W[:, c]))
        if W[m, c] < 0:
            W[:, c] = -W[:, c]
    expect = X @ W
    np.testing.assert_allclose(
        got[["pc1", "pc2"]].to_numpy(), np.round(expect, 4), atol=2e-4)
    # projected sample variance tracks the top eigenvalues
    pv = got[["pc1", "pc2"]].to_numpy().var(axis=0, ddof=1)
    np.testing.assert_allclose(pv, vals[::-1][:2], rtol=1e-3)


def test_resize_stub_executes_plan_extents(spark, sf_dir):
    """Resize plan + stub executor: the 'resized' payload is exactly
    the concatenation of the planned source-row extents, and its
    length equals the plan's total extent length per doc."""
    from sparkstreamingproject_spark.llm.multimodal import (
        attach_payload, image_resize_plan, resize_stub,
    )
    media = attach_payload(_docs(spark, sf_dir).limit(30))
    plan = image_resize_plan(media)
    joined = plan.join(media.select("doc_id", "payload"), "doc_id")
    out = {r["doc_id"]: r for r in resize_stub(joined).collect()}
    want = {r["doc_id"]: r for r in
            (plan.groupBy("doc_id")
             .agg(F.sum(F.col("byte_end") - F.col("byte_start"))
                  .alias("total")).collect())}
    assert set(out) == set(want)
    for doc_id, r in out.items():
        assert r["resized_len"] == want[doc_id]["total"]
        assert len(r["resized"]) == r["resized_len"]
    # output dims respect the target max dimension
    dims = plan.select("doc_id", "out_w", "out_h").distinct().collect()
    assert all(1 <= d["out_w"] <= 16 and d["out_h"] >= 1 for d in dims)
    assert all(max(d["out_w"], d["out_h"]) <= 8 or d["out_w"] == 1
               for d in dims)


def test_containment_dominates_jaccard(spark, sf_dir):
    """Invariant: for any pair, containment = i/min(|A|,|B|) ≥
    jaccard = i/(|A|+|B|-i), and both lie in (0, 1]. Checked over the
    real corpus with thresholds disabled."""
    from sparkstreamingproject_spark.llm.dedup import (
        containment_pairs, jaccard_pairs,
    )
    docs = _docs(spark, sf_dir).limit(200)
    c = {(r.id_a, r.id_b): r.containment
         for r in containment_pairs(docs, threshold=0.0,
                                    max_postings=50).collect()}
    j = {(r.id_a, r.id_b): r.jaccard
         for r in jaccard_pairs(docs, threshold=0.0,
                                max_postings=50).collect()}
    assert set(c) == set(j) and len(c) > 0
    for pair, cv in c.items():
        assert 0 < j[pair] <= cv <= 1.0 + 1e-9, (pair, cv, j[pair])


def test_pq_encode_and_adc_invariants(spark, sf_dir):
    """PQ: every (vector, subspace) gets exactly one code in [0, k);
    a training vector (vec_id < k) quantizes to itself with zero error
    in every subspace; ADC distance of any result is >= 0 and ranks
    are dense 1..k per query."""
    from pyspark.sql import functions as F

    from sparkstreamingproject_spark.llm.similarity import (
        pq_adc_topk, pq_codebook, pq_encode)
    from sparkstreamingproject_spark.queries.base import table

    emb = table(spark, sf_dir, "embeddings")
    cb = pq_codebook(emb, m_sub=8, k=16)
    codes = pq_encode(emb, cb, m_sub=8)

    n_vec = emb.count()
    assert codes.count() == n_vec * 8  # one code per (vector, subspace)
    bad = codes.filter((F.col("code") < 0) | (F.col("code") >= 16)).count()
    assert bad == 0
    # training vectors are their own nearest centroid, exactly
    self_rows = codes.filter(F.col("vec_id") < 16)
    assert self_rows.filter(F.col("dist_sq") != 0).count() == 0
    assert self_rows.filter(F.col("code") != F.col("vec_id")).count() == 0

    queries = emb.filter(F.col("vec_id") < 4)
    top = pq_adc_topk(codes, cb, queries, k=3, m_sub=8).collect()
    assert top and all(r["adc_dist"] >= 0 for r in top)
    by_q = {}
    for r in top:
        by_q.setdefault(r["q_id"], []).append(r["rank"])
    for ranks in by_q.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_dbscan_lsh_invariants(spark, sf_dir):
    """DBSCAN: roles partition the point set; every core/border point
    carries a cluster label, noise never does; cluster labels are core
    point ids; border points never label a cluster no core belongs to."""
    from pyspark.sql import functions as F

    from sparkstreamingproject_spark.llm.similarity import dbscan_lsh
    from sparkstreamingproject_spark.queries.base import table

    emb = table(spark, sf_dir, "embeddings")
    out = dbscan_lsh(emb, eps2_scaled=1_690_000_000_000, min_pts=4)
    n = emb.count()
    assert out.count() == n
    assert out.select("vec_id").distinct().count() == n
    assert out.filter((F.col("role") == "noise")
                      & F.col("cluster").isNotNull()).count() == 0
    assert out.filter(F.col("role").isin("core", "border")
                      & F.col("cluster").isNull()).count() == 0
    core_clusters = {r["cluster"] for r in
                     out.filter(F.col("role") == "core")
                     .select("cluster").distinct().collect()}
    border_clusters = {r["cluster"] for r in
                       out.filter(F.col("role") == "border")
                       .select("cluster").distinct().collect()}
    assert border_clusters <= core_clusters


def test_map_in_arrow_features_match_pandas_path(spark, sf_dir):
    """The mapInArrow decode path must produce byte-identical features
    to the mapInPandas path — the zero-copy RecordBatch boundary is a
    transport change, not a semantic one. Checked under a hostile
    Arrow batch size so batch boundaries differ between runs too."""
    from sparkstreamingproject_spark.llm.multimodal import (
        attach_payload, extract_features, extract_features_arrow)
    from sparkstreamingproject_spark.queries.base import table

    media = attach_payload(table(spark, sf_dir, "documents"))
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "37")
    try:
        a = {r.doc_id: (r.byte_len, tuple(r.feature))
             for r in extract_features_arrow(media).collect()}
        p = {r.doc_id: (r.byte_len, tuple(r.feature))
             for r in extract_features(media).collect()}
    finally:
        spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
    assert a == p and len(a) == media.count()


def test_top_eigvec_power_matches_numpy_replication(spark, sf_dir):
    """Third-implementation check for embedding_top_eigvec_power: a
    numpy replication of the same quantized algebra (integer Gram
    covariance -> BIGINT matrix -> 3 max-normalized integer power
    steps) must produce the EXACT same integer ppm vector — and the
    result must align with numpy's true top eigenvector direction."""
    import numpy as np

    from sparkstreamingproject_spark.queries import REGISTRY
    from sparkstreamingproject_spark.queries.base import table

    def rha(x):  # round half AWAY from zero — the engines' round(),
        # NOT numpy's banker's rounding (half-to-even)
        return (np.sign(x) * np.floor(np.abs(x) + 0.5))

    emb = table(spark, sf_dir, "embeddings")
    M = np.array([r["embedding"] for r in
                  emb.select("embedding").collect()], dtype=np.float64)
    q = rha(M * 1e6).astype(np.int64)
    n, d = q.shape
    s = q.sum(axis=0, dtype=object)
    g = (q.astype(object).T @ q.astype(object))
    cov = np.empty((d, d))
    for i in range(d):
        for j in range(d):
            cov[i, j] = (float(g[i, j])
                         - float(s[i]) * float(s[j]) / n) / (n - 1)
    # same TWO-STEP quantization as both engines: round real-units cov
    # to 6dp first, then scale to an integer
    cq = rha(rha(cov / 1e12 * 1e6) / 1e6 * 1e6).astype(np.int64)
    v = np.full(d, 1_000_000, dtype=np.int64)
    for _ in range(3):
        raw = cq @ v
        v = rha(raw.astype(np.float64) * 1e6
                / np.abs(raw).max()).astype(np.int64)

    got = {r["dim"]: r["eigvec_ppm"] for r in
           REGISTRY["embedding_top_eigvec_power"]
           .fn(spark, sf_dir).collect()}
    assert got == {i: int(v[i]) for i in range(d)}

    # power iteration on a PSD matrix monotonically improves the
    # Rayleigh quotient; with this data's tiny eigengap 3 steps don't
    # CONVERGE (more iterations would), but they must move toward the
    # dominant subspace
    C = cov / 1e12

    def rq(x):
        x = x / np.linalg.norm(x)
        return float(x @ C @ x)

    v0 = np.full(d, 1.0)
    assert rq(v.astype(np.float64)) > rq(v0)
    w, _ = np.linalg.eigh(C)
    assert rq(v.astype(np.float64)) <= float(w.max()) + 1e-9


def test_repeated_substring_span_semantics(spark, tmp_path):
    """Pin the maximal-span merge rules of ``dedup_repeated_substring``
    on a constructed corpus: cross-doc repeats, within-doc repeats,
    full-doc identity, the gap == K adjacent-merge boundary, and the
    gap > K split boundary; unique and sub-K docs are absent."""
    import pandas as pd
    from sparkstreamingproject_spark.queries import REGISTRY

    docs = [
        # 0/1: two shared 5-grams, starts 6 resp. 7 apart -> two spans
        (0, "a b c d e X f g h i j"),
        (1, "a b c d e Y Z f g h i j"),
        # 2/3: identical docs -> one full-coverage span each
        (2, "p q r s t u v w"),
        (3, "p q r s t u v w"),
        # 4: all shingles unique -> no output row
        (4, "k1 k2 k3 k4 k5 k6 k7 k8 k9"),
        # 5: shorter than K tokens -> no shingles at all
        (5, "x y"),
        # 6: WITHIN-doc repeat of one 5-gram, starts 7 apart -> split
        (6, "m n o p q g1 g2 m n o p q"),
        # 7: two dup shingles with starts exactly K apart -> contiguous
        #    coverage, MERGED into one 10-token span
        (7, "c1 c2 c3 c4 c5 d1 d2 d3 d4 d5 t1"),
        (8, "z1 z2 c1 c2 c3 c4 c5 z3 z4 z5"),
        (9, "d1 d2 d3 d4 d5 w1 w2 w3 w4"),
    ]
    pd.DataFrame(docs, columns=["doc_id", "text"]).to_parquet(
        str(tmp_path / "documents.parquet"))
    out = {r["doc_id"]: r for r in
           REGISTRY["dedup_repeated_substring"]
           .fn(spark, str(tmp_path)).collect()}

    assert set(out) == {0, 1, 2, 3, 6, 7, 8, 9}
    def spans(r):
        return (r["n_spans"], r["dup_tokens"], r["longest_span"],
                r["n_tokens"])
    assert spans(out[0]) == (2, 10, 5, 11)
    assert spans(out[1]) == (2, 10, 5, 12)
    assert spans(out[2]) == (1, 8, 8, 8)   # whole doc covered
    assert out[2]["dup_frac"] == 1.0
    assert spans(out[3]) == (1, 8, 8, 8)
    assert spans(out[6]) == (2, 10, 5, 12)  # within-doc repeat splits
    assert spans(out[7]) == (1, 10, 10, 11)  # gap == K merges
    assert spans(out[8]) == (1, 5, 5, 10)
    assert spans(out[9]) == (1, 5, 5, 9)


def test_nprobe_recall_sweep_monotone(spark, sf_dir):
    """Probing more IVF cells can only widen the candidate set, so
    recall@k must be non-decreasing in nprobe, and hits can never
    exceed the ground-truth size."""
    from sparkstreamingproject_spark.queries import REGISTRY
    rows = sorted((r.nprobe, r.n_hits, r.n_queries, r.recall)
                  for r in REGISTRY["sim_ann_nprobe_recall_sweep"]
                  .fn(spark, sf_dir).collect())
    assert [p for p, *_ in rows] == [1, 2, 4]
    hits = [h for _, h, *_ in rows]
    assert hits == sorted(hits)
    for _, h, nq, rec in rows:
        assert 0 <= h <= nq * 10
        assert rec == round(h / (nq * 10), 6)


def test_blocklist_filter_categories_and_gate(spark, tmp_path):
    """Pin the blocklist gate on a constructed corpus: category hit
    counts are per-occurrence (not per-doc), clean docs count toward
    n_docs with zero hits, and only docs STRICTLY over the hit budget
    are blocked."""
    import pandas as pd
    from sparkstreamingproject_spark.queries import REGISTRY
    from sparkstreamingproject_spark.queries.llm9 import _BLOCK_MAX_HITS

    spam = " ".join(["slow"] * (_BLOCK_MAX_HITS + 1))   # blocked
    edge = " ".join(["join"] * _BLOCK_MAX_HITS)          # == budget: kept
    docs = [
        (0, "clean words only here", "sA"),
        (1, "slow spark join day", "sA"),    # one hit per category
        (2, spam, "sA"),
        (3, edge, "sB"),
    ]
    pd.DataFrame(docs, columns=["doc_id", "text", "source"]).to_parquet(
        str(tmp_path / "documents.parquet"))
    got = {r["source"]: r for r in
           REGISTRY["curation_blocklist_filter"]
           .fn(spark, str(tmp_path)).collect()}
    a, b = got["sA"], got["sB"]
    assert (a.n_docs, a.n_blocked) == (3, 1)
    assert a.hits_quality == 1 + (_BLOCK_MAX_HITS + 1)  # doc1 + doc2
    assert a.hits_vendor == 1 and a.hits_sqlterm == 1
    assert (b.n_docs, b.n_blocked) == (1, 0)            # == budget survives
    assert b.hits_sqlterm == _BLOCK_MAX_HITS


def test_caption_align_jaccard_pairs(spark, tmp_path):
    """Pin the pair scoring: an identical media/caption pair scores
    10000 bp (kept), a disjoint pair 0 bp (dropped), and the last doc
    (no next-doc caption) forms no pair."""
    import pandas as pd
    from sparkstreamingproject_spark.queries import REGISTRY

    docs = [
        (0, "alpha beta gamma", "s0"),   # pair with 1: identical
        (1, "alpha beta gamma", "s0"),   # pair with 2: disjoint
        (2, "delta epsilon", "s0"),      # pair with 3: half overlap
        (3, "delta zeta", "s0"),         # last: no caption
    ]
    pd.DataFrame(docs, columns=["doc_id", "text", "source"]).to_parquet(
        str(tmp_path / "documents.parquet"))
    got = REGISTRY["multimodal_caption_align_filter"] \
        .fn(spark, str(tmp_path)).collect()
    assert len(got) == 1
    r = got[0]
    assert r.n_pairs == 3
    # pair scores: 10000, 0, 1*10000//(2+2-1)=3333
    assert r.sum_score_bp == 10000 + 0 + 3333
    assert r.n_kept == 1                 # only the identical pair


def test_shard_by_weight_bytes_serial_order(spark):
    """The byte-weighted generalization must equal the serial
    cumulative sum over (md5(id), id) order — same contract the token
    path pins in test_classify."""
    import hashlib

    from sparkstreamingproject_spark.llm.curation import shard_by_weight

    rows = [(i, 100 + (i * 37) % 211) for i in range(80)]
    df = spark.createDataFrame(rows, "doc_id long, byte_len long")
    budget = 1000
    got = {r["doc_id"]: r for r in
           shard_by_weight(df, "byte_len", budget).collect()}
    serial = sorted((hashlib.md5(str(i).encode()).hexdigest(), i, w)
                    for i, w in rows)
    cum = 0
    for _h, i, w in serial:
        assert got[i]["byte_len"] == w
        assert got[i]["shard"] == cum // budget, f"doc {i}"
        cum += w
    assert len(got) == 80


def test_rq_refinement_and_adc_decomposition(spark, sf_dir):
    """Two RQ invariants on real embeddings: (1) per-vector two-level
    reconstruction error never exceeds the level-1 error — guaranteed
    by the reserved all-zero centroid at code2 = k2 ("leave the
    residual uncorrected" is always an available code), verified both
    per-row and against a DIRECT Python recomputation from the
    collected codebooks; (2) every ADC total equals
    ||q - cv1(c1) - cv2(c2)||^2 recomputed in Python from the
    collected codebooks — the three-LUT decomposition is exact."""
    from sparkstreamingproject_spark.llm.similarity import (
        rq_adc_topk, rq_codebooks, rq_encode,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(200)
    cb1, cb2 = rq_codebooks(emb)
    codes = rq_encode(emb, cb1, cb2)

    c1v = {r.code1: r.cv1 for r in cb1.collect()}
    c2v = {r.code2: r.cv2 for r in cb2.collect()}
    qint = {r.vec_id: [round(x * 1e6) for x in r.embedding]
            for r in emb.select("vec_id", "embedding").collect()}

    rows = codes.collect()
    assert len(rows) == len(qint)
    for r in rows:
        v, y, z = qint[r.vec_id], c1v[r.c1], c2v[r.c2]
        d1 = sum((a - b) ** 2 for a, b in zip(v, y))
        d2 = sum((a - b - c) ** 2 for a, b, c in zip(v, y, z))
        assert r.d1_int == d1
        assert r.recon_int == d2
        # monotone refinement: the zero code makes this unconditional
        assert r.recon_int <= r.d1_int
        # level-1 assignment is the argmin over cb1
        assert d1 == min(sum((a - b) ** 2 for a, b in zip(v, yy))
                         for yy in c1v.values())

    # mean refinement: residual level must reduce total error
    tot1 = sum(r.d1_int for r in rows)
    tot2 = sum(r.recon_int for r in rows)
    assert tot2 < tot1

    queries = emb.filter(F.col("vec_id") < 3)
    got = rq_adc_topk(codes, cb1, cb2, queries, k=4).collect()
    code_of = {r.vec_id: (r.c1, r.c2) for r in rows}
    for r in got:
        q = qint[r.q_id]
        c1, c2 = code_of[r.vec_id]
        y, z = c1v[c1], c2v[c2]
        direct = sum((a - b - c) ** 2 for a, b, c in zip(q, y, z))
        assert r.rq_dist == round(direct / 1e12, 6), (r.q_id, r.vec_id)


def test_real_decoder_roundtrips_an_image(spark, monkeypatch):
    """VERDICT r07 §next 7: the feature-flagged real decoder. Skips
    cleanly where pillow is absent (this container); where it exists,
    a synthetic PNG round-trips through the SAME extract_features
    pipeline (env-flag routed) and the band means match an independent
    numpy recompute."""
    import io

    PIL_Image = pytest.importorskip("PIL.Image")
    import numpy as np

    from sparkstreamingproject_spark.llm.multimodal import (
        FEATURE_DIM, REAL_DECODE_ENV, extract_features)

    # 8x8 grayscale gradient PNG, one distinct mean per band row-group
    px = np.arange(64, dtype=np.uint8).reshape(8, 8)
    buf = io.BytesIO()
    PIL_Image.fromarray(px, mode="L").save(buf, format="PNG")
    png = buf.getvalue()

    media = spark.createDataFrame(
        [(1, bytearray(png), "image/png")],
        "doc_id long, payload binary, media_type string")
    monkeypatch.setenv(REAL_DECODE_ENV, "1")
    row = extract_features(media).collect()[0]
    assert row.byte_len == len(png)
    bands = np.array_split(px.astype(np.float64), FEATURE_DIM, axis=0)
    exp = [b.mean() / 255.0 for b in bands]
    assert row.feature == pytest.approx(exp, abs=1e-6)


def test_real_decoder_flag_off_keeps_stub_path(spark, monkeypatch):
    """With the flag unset, extract_features must produce the stub
    features even for an image-typed payload — no accidental codec
    dependency in the default path."""
    from sparkstreamingproject_spark.llm.multimodal import (
        REAL_DECODE_ENV, attach_payload, extract_features)

    monkeypatch.delenv(REAL_DECODE_ENV, raising=False)
    docs = spark.createDataFrame([(1, "hello media")],
                                 "doc_id long, text string")
    media = attach_payload(docs).withColumn(
        "media_type", F.lit("image/png"))
    rows = extract_features(media).collect()
    assert len(rows) == 1 and len(rows[0].feature) > 0


def test_knn_descent_improves_recall(spark, sf_dir):
    """One NN-descent round must not lose recall vs the LSH-seeded kNN
    graph, measured against exact brute-force top-k ground truth
    (the seed edges stay in the candidate set, so per-vertex results
    can only get closer to the true neighbors), and should strictly
    add at least one true neighbor somewhere on this data."""
    import numpy as np

    from sparkstreamingproject_spark.queries.llm12 import (
        _KNN_K, embedding_knn_descent_round, embedding_knn_graph,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    ids = np.array([r["vec_id"] for r in emb], dtype=np.int64)
    mat = np.array([[float(v) for v in r["embedding"]] for r in emb])
    q = np.round(mat * 1_000_000.0)  # the queries' quantization
    d2 = ((q[:, None, :] - q[None, :, :]) ** 2).sum(axis=2)
    np.fill_diagonal(d2, np.inf)
    truth = {}
    for i, vid in enumerate(ids):
        # ties broken by neighbor id, like the queries
        order = np.lexsort((ids, d2[i]))
        truth[int(vid)] = {int(ids[j]) for j in order[:_KNN_K]}

    def recall(df):
        got = {}
        for r in df.collect():
            got.setdefault(int(r["src"]), set()).add(int(r["dst"]))
        hits = sum(len(got.get(v, set()) & t) for v, t in truth.items())
        return hits / (len(truth) * _KNN_K)

    r_seed = recall(embedding_knn_graph(spark, sf_dir))
    r_desc = recall(embedding_knn_descent_round(spark, sf_dir))
    assert r_desc >= r_seed, (r_seed, r_desc)
    assert r_desc > r_seed, (r_seed, r_desc)  # strict lift on testdata


def test_hilbert_walk_is_a_bijection(spark):
    """The generated Hilbert stage expressions must map the full
    2^n x 2^n grid one-to-one onto [0, 4^n) — the property that makes
    the key a valid clustering order (any collision or gap breaks
    range pruning). Checked on the full 256x256 grid via the same
    shared SQL text the query runs."""
    from sparkstreamingproject_spark.queries.llm13 import (
        _HB_ORDER, _hilbert_stage_exprs,
    )

    n = 1 << _HB_ORDER
    grid = spark.range(n * n).selectExpr(
        "id AS pk", "CAST(0 AS BIGINT) AS d",
        f"CAST(id div {n} AS BIGINT) AS x",
        f"CAST(id % {n} AS BIGINT) AS y")
    cur = grid
    for _s, dd, xx, yy in _hilbert_stage_exprs():
        cur = cur.selectExpr("pk", f"({dd}) AS d", f"({xx}) AS x",
                             f"({yy}) AS y")
    stats = cur.agg(
        F.countDistinct("d").alias("nd"),
        F.min("d").alias("lo"), F.max("d").alias("hi")).collect()[0]
    assert stats["nd"] == n * n and stats["lo"] == 0 \
        and stats["hi"] == n * n - 1, stats


def test_lsh_ensemble_containment_recall_and_envelope(spark, sf_dir):
    """VERDICT r09 §next 3 gates: (a) on the fixture the ensemble's
    pairs are a superset of the capped exact query's pairs (the cap
    drops hot-shingle pairs; the ensemble must not lose any of the
    pairs the exact query DID keep), (b) every reported containment is
    exact (matches the uncapped containment_pairs value — precision 1),
    (c) a planted near-subset pair across a large size gap (within the
    16x envelope) is caught."""
    from sparkstreamingproject_spark.llm.dedup import (
        containment_pairs, lsh_ensemble_containment_pairs,
    )
    docs = _docs(spark, sf_dir)
    ens = {(r.id_a, r.id_b): r.containment
           for r in lsh_ensemble_containment_pairs(docs).collect()}
    capped = {(r.id_a, r.id_b)
              for r in containment_pairs(docs, threshold=0.9,
                                         max_postings=50).collect()}
    assert capped <= set(ens), sorted(capped - set(ens))[:5]
    exact = {(r.id_a, r.id_b): r.containment
             for r in containment_pairs(docs, threshold=0.9,
                                        max_postings=None).collect()}
    for pair, cv in ens.items():
        assert exact.get(pair) == cv, (pair, cv, exact.get(pair))

    # planted: a 12-shingle snippet verbatim inside a ~160-shingle doc
    # (size ratio ~13x -> partition gap 3, inside the envelope)
    words = [f"w{i}" for i in range(160)]
    big = " ".join(words)
    small = " ".join(words[40:54])  # 14 words -> 12 distinct shingles
    planted = spark.createDataFrame(
        [(900001, big), (900002, small)], "doc_id long, text string")
    got = {(r.id_a, r.id_b): r.containment
           for r in lsh_ensemble_containment_pairs(planted).collect()}
    assert got == {(900001, 900002): 1.0}, got


def test_dsir_single_word_and_empty_docs_do_not_crash(spark):
    """Regression (r10 review): Spark's sequence(1, 0) is DESCENDING,
    so an unguarded bigram transform indexes element_at(ws, 0) and
    throws on single-word docs — which reach dsir_doc_buckets through
    the streaming fold with arbitrary content."""
    from sparkstreamingproject_spark.queries.llm14 import (
        dsir_bucket_stats, dsir_doc_buckets,
    )
    docs = spark.createDataFrame(
        [(1, "en", "word"), (2, "en", ""), (3, "de", "two words"),
         (4, "en", "a b c")],
        "doc_id long, lang string, text string")
    db = dsir_doc_buckets(docs).collect()
    assert {r.doc_id for r in db} == {3, 4}  # no-bigram docs drop out
    stats = dsir_bucket_stats(dsir_doc_buckets(docs)).collect()
    assert sum(r.c_raw for r in stats) == 3  # 1 + 2 bigrams


def test_semantic_cells_within_cell_recall_and_keep_rule(spark, sf_dir):
    """SemDeDup envelope (VERDICT r10 §next 4): the per-cell pair
    stage must find EVERY near-dup pair whose members share a cell
    (within-cell recall = 1, precision = 1 — each emitted cosine is
    exact), and the miss set must be EXACTLY the cross-cell pairs —
    the paper's documented trade, bought for an n²→Σ|cell|² reduction.
    Planted exact dups (identical vectors, fresh ids) must always be
    found: cosine-identical vectors can never be split across cells
    by the deterministic argmax assignment. The keep rule holds one
    keeper per component — the member farthest from its centroid."""
    from sparkstreamingproject_spark.llm.similarity import (
        embedding_near_dup_pairs, kmeans_assign, kmeans_centroids,
    )
    from sparkstreamingproject_spark.queries.llm15 import (
        SEM_THRESHOLD, dedup_semantic_cells, semantic_cell_pairs,
    )

    emb = _emb(spark, sf_dir)
    pts = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v"))
    cents = kmeans_centroids(emb, n_iter=2)
    assigned = kmeans_assign(pts, cents)
    cell_of = {r.vec_id: r.cell for r in assigned.collect()}

    got = {(r.id_a, r.id_b)
           for r in semantic_cell_pairs(assigned).collect()}
    truth = {(r.id_a, r.id_b)
             for r in embedding_near_dup_pairs(
                 emb, threshold=SEM_THRESHOLD).collect()}
    within = {p for p in truth if cell_of[p[0]] == cell_of[p[1]]}
    assert got == within, (sorted(got ^ within)[:5],
                           "per-cell pairs must equal the same-cell "
                           "slice of the global truth")
    # the documented envelope: misses are exactly the cross-cell pairs
    assert truth - got == {p for p in truth
                           if cell_of[p[0]] != cell_of[p[1]]}

    # planted exact dups: copies of two existing vectors under new ids
    two = emb.select("vec_id", "embedding").orderBy("vec_id") \
        .limit(2).collect()
    planted = spark.createDataFrame(
        [(900001 + i, r.embedding) for i, r in enumerate(two)],
        "vec_id long, embedding array<float>")
    emb = emb.select("vec_id", "embedding")
    aug = emb.unionByName(planted)
    cents2 = kmeans_centroids(aug, n_iter=2)
    a2 = kmeans_assign(
        aug.select("vec_id",
                   F.col("embedding").cast("array<double>").alias("v")),
        cents2)
    got2 = {(r.id_a, r.id_b) for r in semantic_cell_pairs(a2).collect()}
    for i, r in enumerate(two):
        assert (r.vec_id, 900001 + i) in got2, (
            "identical planted vector must pair with its source")

    # keep rule: exactly one keeper per component, and it is the
    # member with the minimum centroid similarity (ties to min id)
    rows = dedup_semantic_cells(spark, sf_dir).collect()
    by_comp: dict = {}
    for r in rows:
        by_comp.setdefault(r.component, []).append(r)
    for comp, members in by_comp.items():
        keepers = [m for m in members if m.is_kept]
        assert len(keepers) == 1, comp
        best = min(members, key=lambda m: (m.centroid_sim, m.vec_id))
        assert keepers[0].vec_id == best.vec_id, comp


def test_semantic_cells_scaled_bounds_cell_quadratic(spark, sf_dir):
    """The k ∝ n variant (VERDICT r11 §next 2) must hold the MEAN cell
    size at SEM_TARGET: k = max(SEM_K, ⌈n/TARGET⌉) distinct-cells-wise,
    so Σ|cell|² — the pair-stage work — stays ~n·TARGET (linear in n),
    not (n/8)² like the pinned-k oracle anchor. Keep-rule invariants
    carry over unchanged from the shared core."""
    from sparkstreamingproject_spark.queries.llm15 import (
        SEM_K, SEM_TARGET, dedup_semantic_cells_scaled,
    )
    emb = _emb(spark, sf_dir)
    n = emb.count()
    k_exp = max(SEM_K, -(-n // SEM_TARGET))
    rows = dedup_semantic_cells_scaled(spark, sf_dir).collect()
    assert len(rows) == n
    cells: dict = {}
    for r in rows:
        cells[r.cell] = cells.get(r.cell, 0) + 1
    # Lloyd can empty a cell but never invent one; with dense ids the
    # init seeds exactly k_exp cells
    assert 0 < len(cells) <= k_exp
    assert n / len(cells) <= 4 * SEM_TARGET, (
        "mean cell size must stay near TARGET — the linearity claim")
    # pair-stage work actually bounded: sum of squared cell sizes must
    # be far under the pinned-k quadratic (n/SEM_K)²·SEM_K at this n
    work = sum(c * c for c in cells.values())
    assert work < (n * n) / SEM_K, (work, n)
    # one keeper per component, farthest-from-centroid rule
    by_comp: dict = {}
    for r in rows:
        by_comp.setdefault(r.component, []).append(r)
    for comp, members in by_comp.items():
        keepers = [m for m in members if m.is_kept]
        assert len(keepers) == 1, comp
        best = min(members, key=lambda m: (m.centroid_sim, m.vec_id))
        assert keepers[0].vec_id == best.vec_id, comp


def test_semantic_multiprobe_recovers_boundary_pairs(spark, sf_dir):
    """Multi-probe envelope: the top-2-cell pair set must (a) contain
    every single-assignment pair (probing only ADDS cells), (b) mark
    as cross_cell exactly the pairs whose primary cells differ — the
    ones `dedup_semantic_cells`' pair stage misses by design — and
    (c) stay within the global truth (probing never invents a pair:
    every emitted cosine is exact and ≥ threshold)."""
    from sparkstreamingproject_spark.llm.similarity import (
        embedding_near_dup_pairs, kmeans_assign, kmeans_centroids,
    )
    from sparkstreamingproject_spark.queries.llm15 import (
        SEM_THRESHOLD, semantic_cell_pairs,
    )
    from sparkstreamingproject_spark.queries.llm19 import (
        dedup_semantic_multiprobe,
    )
    emb = _emb(spark, sf_dir)
    pts = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v"))
    cents = kmeans_centroids(emb, n_iter=2)
    assigned = kmeans_assign(pts, cents)
    single = {(r.id_a, r.id_b)
              for r in semantic_cell_pairs(assigned).collect()}
    rows = dedup_semantic_multiprobe(spark, sf_dir).collect()
    probed = {(r.id_a, r.id_b) for r in rows}
    cross = {(r.id_a, r.id_b) for r in rows if r.cross_cell}
    truth = {(r.id_a, r.id_b)
             for r in embedding_near_dup_pairs(
                 emb, threshold=SEM_THRESHOLD).collect()}
    assert single <= probed, "probing must never lose a pair"
    assert probed <= truth, "probing must never invent a pair"
    assert cross == probed - single, (
        "cross_cell must mark exactly the recovered boundary pairs")
