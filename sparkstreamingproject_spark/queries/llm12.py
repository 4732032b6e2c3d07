"""Round-8 additions, wave 2: blocking-quality evaluation — the
methodology metric every entity-resolution / near-dedup pipeline needs
before trusting its blocker at scale.

A blocker (here: the registry's MinHash-LSH banding) is judged on two
axes: PAIRS COMPLETENESS (what fraction of truly-similar pairs does it
surface — recall of the candidate set) and REDUCTION RATIO (what
fraction of the all-pairs quadratic did it avoid). Ground truth is the
capped exact n-gram Jaccard at a LOWER threshold (0.5) than the dedup
gate, so the metric sees the borderline pairs where blockers actually
fail. All counts are exact integers; the two ratios are terminal
6dp rounds on identical integer inputs.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..llm import dedup as D
from .base import register, table
from .llm import MINHASH_CTE, _BAND_SELECTS

_BQ_TAU = 0.5
_BQ_CAP = 50


@register(
    "er_blocking_quality",
    oracle=f"""
    WITH {MINHASH_CTE},
    bands AS (
{_BAND_SELECTS}),
    cands AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key
                               AND a.doc_id < b.doc_id),
    capped AS (
      SELECT shingle FROM shingles GROUP BY shingle
      HAVING count(*) <= {_BQ_CAP}),
    sh AS (SELECT s.doc_id, s.shingle FROM shingles s
           JOIN capped USING (shingle)),
    counts AS (SELECT doc_id, count(*) AS c FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
      FROM sh a JOIN sh b
        ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
    truth AS (
      SELECT id_a, id_b FROM inter
      JOIN counts ca ON ca.doc_id = id_a
      JOIN counts cb ON cb.doc_id = id_b
      WHERE round(i * 1.0 / (ca.c + cb.c - i), 6) >= {_BQ_TAU}),
    m AS (SELECT
            (SELECT count(*) FROM truth) AS n_truth,
            (SELECT count(*) FROM cands) AS n_candidates,
            (SELECT count(*) FROM truth t JOIN cands c
             ON c.id_a = t.id_a AND c.id_b = t.id_b) AS n_caught,
            (SELECT count(*) FROM documents) AS nd)
    SELECT n_truth, n_candidates, n_caught,
           CASE WHEN n_truth > 0
                THEN round(n_caught * 1.0 / n_truth, 6) END
             AS pairs_completeness,
           CAST(nd * (nd - 1) / 2 AS BIGINT) AS n_total_pairs,
           round(1.0 - n_candidates * 1.0 / (nd * (nd - 1) / 2), 6)
             AS reduction_ratio
    FROM m
    """,
    tags=("llm", "dedup", "er"),
)
def er_blocking_quality(spark, sf_dir):
    """Blocking-quality report of the MinHash-LSH blocker against
    capped exact-Jaccard ground truth at tau=0.5: pairs completeness
    (candidate-set recall over truly-similar pairs) and reduction
    ratio (fraction of the N(N-1)/2 all-pairs avoided) — the two
    numbers that decide whether a blocker is safe to deploy before
    any 100 TB run commits to it.

    Scale shape: candidates come from per-bucket posting lists (the
    registry's LSH path — never all-pairs); ground truth reuses the
    capped prefix-filtered Jaccard machinery, whose candidate volume
    is bounded by the stop-shingle cap. The truth∩candidates overlap
    is one keyed semi-join on (id_a, id_b); every metric is a 1-row
    aggregate crossJoined at the end. At corpus scale the ground
    truth would be estimated on a document SAMPLE (same query over a
    hash-bucketed slice) — the metric algebra is unchanged."""
    docs = table(spark, sf_dir, "documents")
    cands = D.lsh_candidate_pairs(docs)
    truth = D.jaccard_pairs(docs, threshold=_BQ_TAU,
                            max_postings=_BQ_CAP).select("id_a", "id_b")
    caught = truth.join(cands, ["id_a", "id_b"], "left_semi")
    m = (truth.agg(F.count("*").alias("n_truth"))
         .crossJoin(cands.agg(F.count("*").alias("n_candidates")))
         .crossJoin(caught.agg(F.count("*").alias("n_caught")))
         .crossJoin(docs.agg(F.count("*").alias("nd"))))
    total = (F.col("nd") * (F.col("nd") - 1) / 2).cast("long")
    return m.select(
        "n_truth", "n_candidates", "n_caught",
        F.when(F.col("n_truth") > 0,
               F.round(F.col("n_caught") / F.col("n_truth"), 6))
        .alias("pairs_completeness"),
        total.alias("n_total_pairs"),
        F.round(F.lit(1.0) - F.col("n_candidates") / total, 6)
        .alias("reduction_ratio"))


# ------------------------------------------------ LSH-bounded kNN graph

_KNN_K = 3


def _knn_base_ctes() -> str:
    """Shared WITH-clauses: LSH candidates → exact-integer d2 → ranked
    seed kNN edges (CTE ``knn``). Used by both the seed-graph oracle
    and the NN-descent-round oracle so the two stay term-identical."""
    from ..llm import similarity as S
    selects = []
    for t in range(S.LSH_TABLES):
        planes = S.hyperplanes(S.LSH_TABLE_PLANES, seed=S.LSH_SEED + t)
        bits = " || ".join(
            "(CASE WHEN list_dot_product(CAST(embedding AS DOUBLE[]), "
            f"{p!r}::DOUBLE[]) >= 0 THEN '1' ELSE '0' END)"
            for p in planes)
        selects.append(
            f"SELECT vec_id, {t} AS tbl, {bits} AS bucket FROM embeddings")
    union = "\n      UNION ALL\n".join(selects)
    return f"""
    WITH b AS ({union}),
    cand AS (
      SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
      FROM b x JOIN b y
        ON x.tbl = y.tbl AND x.bucket = y.bucket AND x.vec_id < y.vec_id),
    sym AS (SELECT id_a AS src, id_b AS dst FROM cand
            UNION ALL SELECT id_b, id_a FROM cand),
    pts AS MATERIALIZED (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    el AS MATERIALIZED (
      SELECT vec_id, CAST(i AS INT) AS pos,
             CAST(round(v[i] * 1000000) AS BIGINT) AS x
      FROM pts, unnest(range(1, len(v) + 1)) AS g(i)),
    d2 AS (
      SELECT s.src, s.dst, sum((a.x - e2.x) * (a.x - e2.x)) AS d2
      FROM sym s
      JOIN el a ON a.vec_id = s.src
      JOIN el e2 ON e2.vec_id = s.dst AND e2.pos = a.pos
      GROUP BY 1, 2),
    knn AS MATERIALIZED (
      SELECT src, dst, d2, rank
      FROM (SELECT src, dst, d2,
                   row_number() OVER (PARTITION BY src
                                      ORDER BY d2, dst) AS rank
            FROM d2)
      WHERE rank <= {_KNN_K})"""


def _knn_oracle() -> str:
    return f"""{_knn_base_ctes()}
    SELECT src, dst, round(CAST(d2 AS DOUBLE) / 1e12, 6) AS dist_sq,
           CAST(rank AS INT) AS rank
    FROM knn
    """


def _knn_descent_oracle() -> str:
    return f"""{_knn_base_ctes()},
    gsym AS (SELECT src AS a, dst AS b FROM knn
             UNION SELECT dst, src FROM knn),
    cand2 AS (
      SELECT p.a AS src, q.b AS dst
      FROM gsym p JOIN gsym q ON p.b = q.a AND p.a <> q.b
      UNION
      SELECT a, b FROM gsym),
    d2b AS (
      SELECT c.src, c.dst, sum((a.x - e2.x) * (a.x - e2.x)) AS d2
      FROM cand2 c
      JOIN el a ON a.vec_id = c.src
      JOIN el e2 ON e2.vec_id = c.dst AND e2.pos = a.pos
      GROUP BY 1, 2)
    SELECT src, dst, round(CAST(d2 AS DOUBLE) / 1e12, 6) AS dist_sq,
           CAST(rank AS INT) AS rank
    FROM (SELECT src, dst, d2,
                 row_number() OVER (PARTITION BY src
                                    ORDER BY d2, dst) AS rank
          FROM d2b)
    WHERE rank <= {_KNN_K}
    """


@register("embedding_knn_graph", oracle=_knn_oracle(),
          tags=("llm", "similarity", "graph"))
def embedding_knn_graph(spark, sf_dir):
    """Approximate kNN GRAPH construction — the primitive under
    dedup clustering, diversity sampling, and graph-based ANN
    (HNSW/NN-descent seeds): every vector's top-3 neighbors, with
    candidates bounded by OR-amplified multi-table hyperplane LSH
    (never all-pairs) and ranked by EXACT integer squared L2 over the
    once-quantized elements, ties broken by neighbor id.

    Scale shape: candidates come from per-bucket posting lists (3
    tables × 2^10 buckets — the recall/bucket-size knob documented in
    llm/similarity.py:lsh_multi_table_pairs); the exact rerank touches
    candidate pairs × d rows through two keyed joins; the final top-k
    is a per-src window over candidate-bounded rows. A node whose
    buckets are all singletons simply emits no edges — at corpus scale
    that is the signal to add tables, not to widen to brute force."""
    emb = table(spark, sf_dir, "embeddings")
    return _format_knn(_knn_seed_edges(emb))


def _quantized_elements(emb):
    """(vec_id, pos, x): embeddings exploded to once-quantized integer
    elements — the exact-rerank relation both kNN queries join on."""
    return emb.select(
        "vec_id",
        F.posexplode(F.expr(
            "transform(embedding, v -> "
            "CAST(round(CAST(v AS DOUBLE) * 1000000, 0) AS BIGINT))"
        )).alias("pos", "x"))


def _exact_d2(pairs, el):
    """Exact integer squared L2 for each (src, dst) pair via two keyed
    joins against the element relation — cost |pairs|·d, never N².
    Used by the greedy-search queries, which checkpoint ``el`` once
    and probe it across iterations; the one-shot seed/descent passes
    use ``_exact_d2_arrays`` below instead (r16)."""
    return (pairs
            .join(el.select(F.col("vec_id").alias("src"), "pos",
                            F.col("x").alias("xa")), "src")
            .join(el.select(F.col("vec_id").alias("dst"),
                            F.col("pos").alias("pos"),
                            F.col("x").alias("xb")), ["dst", "pos"])
            .groupBy("src", "dst")
            .agg(F.sum((F.col("xa") - F.col("xb"))
                       * (F.col("xa") - F.col("xb"))).alias("d2")))


def _quantized_pts(emb):
    """(vec_id, qv array<bigint>): embeddings once-quantized to
    integers but kept as ARRAYS — the r16 rerank relation (n rows
    instead of the element explode's n·d)."""
    return emb.select(
        "vec_id",
        F.expr("transform(embedding, v -> "
               "CAST(round(CAST(v AS DOUBLE) * 1000000, 0) AS BIGINT))"
               ).alias("qv"))


def _exact_d2_arrays(pairs, ptsq):
    """Exact integer squared L2 per (src, dst) pair via two id-keyed
    joins of the n-row quantized-ARRAY relation + one zip_with fold
    (the ``dbscan_lsh`` idiom; exact same integer sum as the
    element-join formulation — a fold over d longs, order-fixed,
    no float).

    r16 (guide §2.3/§2.4; VERDICT r15 §next 7): ``_exact_d2`` joined
    the n·d element explode on BOTH legs — the explode subtree ran
    twice (the two legs prune/alias differently, so no reuse), the
    (dst, pos) leg exchanged n·d rows, and the intersect aggregate
    hashed |pairs|·d rows. Here the vectors move as single array rows
    (n rows per leg, |pairs| rows through the fold) and the per-pair
    aggregate disappears into a JVM HOF — the d-factor leaves every
    exchange and the GROUP BY entirely."""
    from ..llm.similarity import _sq_l2_int
    return (pairs
            .join(ptsq.select(F.col("vec_id").alias("src"),
                              F.col("qv").alias("qa")), "src")
            .join(ptsq.select(F.col("vec_id").alias("dst"),
                              F.col("qv").alias("qb")), "dst")
            .select("src", "dst",
                    _sq_l2_int(F.col("qa"), F.col("qb")).alias("d2")))


def _topk_per_src(d2, k=_KNN_K):
    from pyspark.sql import Window
    w = Window.partitionBy("src").orderBy("d2", "dst")
    return (d2.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def _knn_seed_edges(emb):
    """Ranked seed kNN edges (src, dst, d2, rank≤k) from OR-amplified
    LSH candidates + exact integer rerank."""
    from ..llm.similarity import lsh_multi_table_pairs
    cand = lsh_multi_table_pairs(emb)
    sym = (cand.select(F.col("id_a").alias("src"),
                       F.col("id_b").alias("dst"))
           .unionByName(cand.select(F.col("id_b").alias("src"),
                                    F.col("id_a").alias("dst"))))
    return _topk_per_src(_exact_d2_arrays(sym, _quantized_pts(emb)))


def _format_knn(ranked):
    return ranked.select(
        "src", "dst",
        F.round(F.col("d2").cast("double") / F.lit(1e12), 6)
        .alias("dist_sq"),
        F.col("rank").cast("int").alias("rank"))


@register("embedding_knn_descent_round", oracle=_knn_descent_oracle(),
          tags=("llm", "similarity", "graph"))
def embedding_knn_descent_round(spark, sf_dir):
    """ONE NN-descent refinement round over the LSH-seeded kNN graph
    (VERDICT r08 §next 5) — the standard recall lift (Dong et al.,
    WWW'11) that turns a seeded graph into a usable ANN index: a
    vector's true neighbors are usually neighbors of its current
    neighbors, so each round re-ranks every vertex against its
    2-hop candidates. Candidates = symmetrized seed edges ∪
    neighbor-of-neighbor pairs; all candidates are re-scored by the
    SAME exact integer squared-L2 and the top-3 kept (ties by id) —
    so a round can only improve recall (the seed edges stay in the
    candidate set; see test_knn_descent_improves_recall).

    Scale shape: the seed graph has ≤ k·N edges, so the symmetrized
    relation is ≤ 2kN and the 2-hop self-join emits ≤ (2k)²·N
    directed candidates — linear in N with a k² constant, never N²;
    the re-score touches candidates×d through the same two keyed
    joins as the seed pass, and the final top-k is a per-src window
    over a k²-bounded group. Each extra descent round is the same
    bounded shape (converged graphs stop producing new candidates)."""
    emb = table(spark, sf_dir, "embeddings")
    seed = _knn_seed_edges(emb).select("src", "dst")
    # localCheckpoint: the seed edges feed BOTH sides of the 2-hop
    # self-join and the candidate union — cut the LSH+rerank lineage
    # so it computes once, exactly like the iterative graph kernels
    seed = seed.localCheckpoint()
    gsym = (seed.select(F.col("src").alias("a"), F.col("dst").alias("b"))
            .unionByName(seed.select(F.col("dst").alias("a"),
                                     F.col("src").alias("b")))
            .distinct())
    non = (gsym.alias("p")
           .join(gsym.alias("q"), F.col("p.b") == F.col("q.a"))
           .filter(F.col("p.a") != F.col("q.b"))
           .select(F.col("p.a").alias("src"), F.col("q.b").alias("dst")))
    cand2 = (non.unionByName(gsym.select(F.col("a").alias("src"),
                                         F.col("b").alias("dst")))
             .distinct())
    d2 = _exact_d2_arrays(cand2, _quantized_pts(emb))
    return _format_knn(_topk_per_src(d2))


# ------------------------------------------------ Heaps' law growth

_HEAPS_FRACS = (8, 4, 2, 1)  # checkpoints at N/8, N/4, N/2, N


@register(
    "text_heaps_law",
    oracle="""
    WITH d AS MATERIALIZED (
      SELECT doc_id, string_split(text, ' ') AS ws,
             row_number() OVER (ORDER BY doc_id) AS rnk
      FROM documents),
    n AS (SELECT count(*) AS nd FROM d),
    cps AS (SELECT DISTINCT CAST(ceil(nd / f) AS BIGINT) AS cp
            FROM n, (VALUES (8.0), (4.0), (2.0), (1.0)) AS t(f)),
    tok AS (SELECT rnk, CAST(len(ws) AS BIGINT) AS n_tok FROM d),
    first_seen AS (
      SELECT w, min(rnk) AS fr
      FROM (SELECT rnk, unnest(ws) AS w FROM d) GROUP BY w),
    per_cp AS (
      SELECT cp,
             (SELECT CAST(sum(n_tok) AS BIGINT) FROM tok
              WHERE rnk <= cp) AS n_tokens,
             (SELECT count(*) FROM first_seen WHERE fr <= cp) AS n_vocab
      FROM cps),
    fit AS (
      SELECT count(*) AS m,
             sum(ln(CAST(n_tokens AS DOUBLE))) AS sx,
             sum(ln(CAST(n_vocab AS DOUBLE))) AS sy,
             sum(ln(CAST(n_tokens AS DOUBLE))
                 * ln(CAST(n_vocab AS DOUBLE))) AS sxy,
             sum(ln(CAST(n_tokens AS DOUBLE))
                 * ln(CAST(n_tokens AS DOUBLE))) AS sxx
      FROM per_cp)
    SELECT p.cp AS checkpoint_docs, p.n_tokens, p.n_vocab,
           round((f.m * f.sxy - f.sx * f.sy)
                 / (f.m * f.sxx - f.sx * f.sx), 6) + 0.0 AS heaps_beta
    FROM per_cp p, fit f
    """,
    tags=("llm", "text", "stats"),
)
def text_heaps_law(spark, sf_dir):
    """Vocabulary-growth (Heaps'-law) profile of the corpus: distinct
    vocabulary vs cumulative tokens at doc-order checkpoints N/8, N/4,
    N/2, N, plus the fitted Heaps exponent beta (V = K·T^beta, the
    log-log OLS slope over the checkpoints — ~0.4-0.6 for natural
    text; materially lower signals duplication, higher signals noise/
    IDs). The curve is THE quick corpus-health read before tokenizer
    and dedup decisions.

    Exactness: the growth curve needs each word's FIRST occurrence,
    not a cumulative distinct per prefix — first_seen = min(doc rank)
    per word turns an O(N·V) running-distinct into one explode +
    groupBy; vocab(cp) is then a count over first_seen ≤ cp. Tokens
    and vocab are exact integers; the slope is a closed form over four
    identical doubles. Scale: one corpus explode with map-side
    combine; checkpoints are a 4-row broadcast."""
    from pyspark.sql import Window
    d = (table(spark, sf_dir, "documents")
         .select("doc_id", F.split("text", " ").alias("ws"))
         .withColumn("rnk", F.row_number().over(
             Window.orderBy("doc_id"))))
    nd = d.agg(F.count("*").alias("nd"))
    cps = None
    for f in _HEAPS_FRACS:
        c = nd.select(F.ceil(F.col("nd") / F.lit(float(f)))
                      .cast("long").alias("cp"))
        cps = c if cps is None else cps.unionByName(c)
    cps = cps.distinct()
    tok = d.select("rnk", F.size("ws").cast("long").alias("n_tok"))
    first_seen = (d.select("rnk", F.explode("ws").alias("w"))
                  .groupBy("w").agg(F.min("rnk").alias("fr")))
    per_cp = (cps.join(tok, tok.rnk <= cps.cp)
              .groupBy("cp").agg(F.sum("n_tok").alias("n_tokens"))
              .join(cps.join(first_seen, first_seen.fr <= cps.cp)
                    .groupBy("cp").agg(F.count("*").alias("n_vocab")),
                    "cp"))
    lx = F.log(F.col("n_tokens").cast("double"))
    ly = F.log(F.col("n_vocab").cast("double"))
    fit = per_cp.agg(
        F.count("*").alias("m"), F.sum(lx).alias("sx"),
        F.sum(ly).alias("sy"), F.sum(lx * ly).alias("sxy"),
        F.sum(lx * lx).alias("sxx"))
    # + 0.0 canonicalizes IEEE -0.0 (a saturated-vocab corpus fits a
    # flat line; DuckDB's native round keeps the sign of -0.0 — the
    # r04 signed-zero class)
    beta = F.round((F.col("m") * F.col("sxy") - F.col("sx") * F.col("sy"))
                   / (F.col("m") * F.col("sxx")
                      - F.col("sx") * F.col("sx")), 6) + F.lit(0.0)
    return (per_cp.crossJoin(F.broadcast(fit))
            .select(F.col("cp").alias("checkpoint_docs"),
                    "n_tokens", "n_vocab", beta.alias("heaps_beta")))


# ------------------------------------------------ VAD-style segments

_VAD_MEAN_CODE = 96  # mean char code >= this => "voiced" window


@register(
    "multimodal_vad_segments",
    oracle=f"""
    WITH media AS (
      SELECT doc_id, text, CAST(length(text) AS BIGINT) AS byte_len
      FROM documents),
    win AS (
      SELECT doc_id, text, byte_len,
             CAST(unnest(range(0, CAST(ceil(byte_len / 16.0) AS BIGINT)))
                  AS BIGINT) AS window_idx
      FROM media WHERE byte_len > 0),
    ext AS (
      SELECT doc_id, window_idx,
             window_idx * 16 AS s,
             least(window_idx * 16 + 40, byte_len) AS e, text
      FROM win),
    energy AS (
      SELECT doc_id, window_idx, s, e,
             CAST(list_sum(list_transform(range(CAST(s + 1 AS BIGINT),
                                                CAST(e + 1 AS BIGINT)),
                           i -> ascii(substr(text, CAST(i AS INT), 1))))
                  AS BIGINT) AS en
      FROM ext),
    active AS (
      SELECT doc_id, window_idx, s, e,
             window_idx - row_number() OVER (PARTITION BY doc_id
                                             ORDER BY window_idx) AS grp
      FROM energy
      WHERE en >= {_VAD_MEAN_CODE} * (e - s)),
    seg AS (
      SELECT doc_id, min(s) AS seg_start, max(e) AS seg_end,
             count(*) AS n_windows
      FROM active GROUP BY doc_id, grp)
    SELECT doc_id, seg_start, seg_end, n_windows FROM seg
    """,
    tags=("llm", "multimodal"),
)
def multimodal_vad_segments(spark, sf_dir):
    """Voice-activity-detection plumbing over the multimodal window
    plan: overlapping windows (40-unit span, 16-unit hop — the
    ``audio_window_plan`` schedule) are scored by REAL content energy
    (sum of character codes over the window extent — the text corpus
    stands in for PCM; a mean code >= 96 means letter-dense, the
    speech of this stand-in), then adjacent active windows merge into
    segments by the gaps-and-islands idiom — exactly how VAD output
    becomes clip boundaries for a speech-training shard.

    Exactness: energies and thresholds are exact integer sums and
    products; segment bounds are min/max of exact offsets. Scale: the
    window plan is metadata arithmetic (map-only explode); the energy
    join touches each document's chars once (Σ byte_len rows); the
    merge is one window partitioning per doc. With a real codec the
    energy column would come from the Arrow-batched decode kernel
    (``decode_real``) — every operator downstream of the energy column
    is unchanged."""
    from ..llm.multimodal import audio_window_plan
    from pyspark.sql import Window
    docs = table(spark, sf_dir, "documents")
    media = docs.select("doc_id",
                        F.length("text").cast("long").alias("byte_len"))
    win = audio_window_plan(media)  # doc_id, window_idx, byte_start/end
    ext = (win.join(docs.select("doc_id", "text"), "doc_id")
           .select("doc_id", "window_idx",
                   F.col("byte_start").alias("s"),
                   F.col("byte_end").alias("e"), "text"))
    en = ext.withColumn(
        "en", F.expr("aggregate(transform(sequence(s + 1, e), "
                     "i -> CAST(ascii(substr(text, CAST(i AS INT), 1)) "
                     "AS BIGINT)), 0L, (a, x) -> a + x)"))
    active = (en.filter(F.col("en")
                        >= F.lit(_VAD_MEAN_CODE) * (F.col("e") - F.col("s")))
              .withColumn("grp", F.col("window_idx") - F.row_number()
                          .over(Window.partitionBy("doc_id")
                                .orderBy("window_idx"))))
    return (active.groupBy("doc_id", "grp")
            .agg(F.min("s").alias("seg_start"),
                 F.max("e").alias("seg_end"),
                 F.count("*").alias("n_windows"))
            .select("doc_id", "seg_start", "seg_end", "n_windows"))


# ------------------------------------------------ phrase proximity

_PROX_SLOP = 3


@register(
    "text_phrase_proximity",
    oracle=f"""
    WITH d AS MATERIALIZED (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    pos AS MATERIALIZED (
      SELECT doc_id, ws[i] AS w, CAST(i AS BIGINT) AS i
      FROM d, unnest(range(1, len(ws) + 1)) AS g(i)),
    freq AS (SELECT w, count(*) AS c FROM pos GROUP BY w),
    t1 AS (SELECT w AS w1 FROM freq ORDER BY c DESC, w LIMIT 1),
    t2 AS (SELECT w AS w2 FROM (SELECT w, c FROM freq
                                ORDER BY c DESC, w LIMIT 2)
           ORDER BY c, w DESC LIMIT 1),
    p1 AS (SELECT doc_id, i FROM pos, t1 WHERE w = w1),
    p2 AS (SELECT doc_id, i FROM pos, t2 WHERE w = w2)
    SELECT p1.doc_id, t1.w1, t2.w2,
           min(abs(p1.i - p2.i)) AS min_dist,
           count(*) AS n_pairs
    FROM p1 JOIN p2 ON p2.doc_id = p1.doc_id, t1, t2
    WHERE abs(p1.i - p2.i) <= {_PROX_SLOP}
    GROUP BY 1, 2, 3
    """,
    tags=("llm", "text", "search"),
)
def text_phrase_proximity(spark, sf_dir):
    """Proximity (match_phrase-with-slop) search — the Elasticsearch
    surface the reference depends on (pom.xml: elasticsearch deps)
    beyond the registry's BM25 relevance: documents where the corpus's
    two most frequent words co-occur within 3
    positions, with the minimum distance and the count of qualifying
    position pairs. Positional postings are what phrase queries read;
    this is the join they run.

    Scale shape: ONE corpus explode builds the positional posting list
    (doc_id, word, position) — the same relation an inverted index
    stores partitioned by word; the query terms' postings are then two
    keyed selections joined per doc (postings-sized, not corpus-sized
    work). Term selection (top-2 by frequency) is a heap TakeOrdered,
    broadcast into the posting filter. All integers exact."""
    docs = table(spark, sf_dir, "documents")
    pos = (docs.select(
        "doc_id",
        F.posexplode(F.split("text", " ")).alias("i0", "w"))
        .select("doc_id", "w", (F.col("i0") + 1).cast("long").alias("i")))
    freq = pos.groupBy("w").agg(F.count("*").alias("c"))
    top2 = freq.orderBy(F.desc("c"), "w").limit(2)
    t1 = top2.orderBy(F.desc("c"), "w").limit(1).select(
        F.col("w").alias("w1"))
    t2 = (top2.orderBy("c", F.desc("w")).limit(1)
          .select(F.col("w").alias("w2")))
    p1 = (pos.crossJoin(F.broadcast(t1)).filter(F.col("w") == F.col("w1"))
          .select("doc_id", F.col("i").alias("i1"), "w1"))
    p2 = (pos.crossJoin(F.broadcast(t2)).filter(F.col("w") == F.col("w2"))
          .select("doc_id", F.col("i").alias("i2"), "w2"))
    return (p1.join(p2, "doc_id")
            .filter(F.abs(F.col("i1") - F.col("i2")) <= _PROX_SLOP)
            .groupBy("doc_id", "w1", "w2")
            .agg(F.min(F.abs(F.col("i1") - F.col("i2"))).alias("min_dist"),
                 F.count("*").alias("n_pairs")))


# ------------------------------------------------ code-vs-prose score


@register(
    "text_code_prose_score",
    oracle="""
    WITH f AS (
      SELECT doc_id,
             CAST(length(text) AS BIGINT) AS n_chars,
             CAST(length(text)
                  - length(regexp_replace(text, '[0-9]', '', 'g'))
                  AS BIGINT) AS n_digits,
             CAST(length(text)
                  - length(regexp_replace(text,
                           '[{};()\\[\\]=<>|&_]', '', 'g'))
                  AS BIGINT) AS n_symbols,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents)
    SELECT doc_id, n_chars, n_digits, n_symbols,
           round(n_digits * 1.0 / n_chars, 6) AS digit_ratio,
           round(n_symbols * 1.0 / n_chars, 6) AS symbol_ratio,
           round((n_chars - n_tokens + 1) * 1.0 / n_tokens, 6)
             AS avg_token_len,
           CASE WHEN n_symbols * 20 >= n_chars THEN 'code'
                WHEN n_digits * 5 >= n_chars THEN 'data'
                ELSE 'prose' END AS content_class
    FROM f
    """,
    tags=("llm", "text", "curation"),
)
def text_code_prose_score(spark, sf_dir):
    """Code/data/prose classification by character-class density — the
    curation gate that routes code into code-training shards and drops
    log/ID spam from prose corpora (a standard pretraining mixture
    step next to `text_quality_score`'s lexical gates): per document,
    digit and code-symbol densities, average token length, and a
    threshold class (symbols >= 5% → code, digits >= 20% → data, else
    prose). Thresholds are INTEGER cross-multiplications (n*20 >=
    n_chars), so classification is exact; ratios are terminal rounds.

    Scale: pure per-row character counting via regexp_replace length
    deltas — map-only, whole-stage codegen, no explode, no shuffle;
    the cheapest possible corpus pass."""
    d = table(spark, sf_dir, "documents")
    n_chars = F.length("text").cast("long")
    n_digits = (F.length("text")
                - F.length(F.regexp_replace("text", "[0-9]", ""))
                ).cast("long")
    n_symbols = (F.length("text")
                 - F.length(F.regexp_replace(
                     "text", r"[{};()\[\]=<>|&_]", ""))).cast("long")
    n_tokens = F.size(F.split("text", " ")).cast("long")
    f = d.select("doc_id", n_chars.alias("n_chars"),
                 n_digits.alias("n_digits"),
                 n_symbols.alias("n_symbols"),
                 n_tokens.alias("n_tokens"))
    return f.select(
        "doc_id", "n_chars", "n_digits", "n_symbols",
        F.round(F.col("n_digits") / F.col("n_chars"), 6)
        .alias("digit_ratio"),
        F.round(F.col("n_symbols") / F.col("n_chars"), 6)
        .alias("symbol_ratio"),
        F.round((F.col("n_chars") - F.col("n_tokens") + 1)
                / F.col("n_tokens"), 6).alias("avg_token_len"),
        F.when(F.col("n_symbols") * 20 >= F.col("n_chars"), "code")
        .when(F.col("n_digits") * 5 >= F.col("n_chars"), "data")
        .otherwise("prose").alias("content_class"))


# ------------------------------------------------ hybrid RRF fusion

_RRF_K = 60
_RRF_TOP = 20
_RRF_OUT = 10
_RRF_QDOC = 0


@register(
    "sim_hybrid_rrf_fusion",
    oracle=f"""
    WITH pts AS MATERIALIZED (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    el AS MATERIALIZED (
      SELECT vec_id, CAST(i AS INT) AS pos,
             CAST(round(v[i] * 1000000) AS BIGINT) AS x
      FROM pts, unnest(range(1, len(v) + 1)) AS g(i)),
    qv AS (SELECT pos, x FROM el WHERE vec_id = {_RRF_QDOC}),
    sem AS (
      SELECT e.vec_id AS doc_id, sum((e.x - q.x) * (e.x - q.x)) AS d2
      FROM el e JOIN qv q ON q.pos = e.pos
      WHERE e.vec_id <> {_RRF_QDOC}
      GROUP BY 1),
    sem_rank AS (
      SELECT doc_id, rank FROM (
        SELECT doc_id, row_number() OVER (ORDER BY d2, doc_id) AS rank
        FROM sem) WHERE rank <= {_RRF_TOP}),
    words AS MATERIALIZED (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    sh AS MATERIALIZED (
      SELECT DISTINCT doc_id,
             ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS shingle
      FROM words, unnest(range(1, greatest(len(ws) - 1, 1))) AS g(i)),
    qs AS (SELECT shingle FROM sh WHERE doc_id = {_RRF_QDOC}),
    lex AS (
      SELECT s.doc_id, count(*) AS overlap
      FROM sh s JOIN qs ON qs.shingle = s.shingle
      WHERE s.doc_id <> {_RRF_QDOC}
      GROUP BY 1),
    lex_rank AS (
      SELECT doc_id, rank FROM (
        SELECT doc_id, row_number() OVER (ORDER BY overlap DESC, doc_id)
               AS rank FROM lex) WHERE rank <= {_RRF_TOP})
    SELECT doc_id, sem_rank, lex_rank, rrf FROM (
      SELECT coalesce(s.doc_id, l.doc_id) AS doc_id,
             s.rank AS sem_rank, l.rank AS lex_rank,
             round(coalesce(1.0 / ({_RRF_K} + s.rank), 0.0)
                   + coalesce(1.0 / ({_RRF_K} + l.rank), 0.0), 6) AS rrf,
             row_number() OVER (
               ORDER BY coalesce(1.0 / ({_RRF_K} + s.rank), 0.0)
                        + coalesce(1.0 / ({_RRF_K} + l.rank), 0.0) DESC,
                        coalesce(s.doc_id, l.doc_id)) AS rn
      FROM sem_rank s FULL OUTER JOIN lex_rank l ON l.doc_id = s.doc_id)
    WHERE rn <= {_RRF_OUT}
    """,
    tags=("llm", "similarity", "search"),
)
def sim_hybrid_rrf_fusion(spark, sf_dir):
    """Hybrid retrieval with reciprocal-rank fusion — the pattern
    modern search stacks run (lexical + vector, fused by RRF, k=60):
    for query document 0, a SEMANTIC ranking (exact integer L2 over
    the quantized embeddings — the brute-force baseline; IVF/LSH drop
    in unchanged) and a LEXICAL ranking (3-shingle overlap with the
    query doc) each produce a top-20; fusion scores
    1/(60+rank_sem) + 1/(60+rank_lex) and keeps the top-10. Documents
    found by only one modality still fuse (outer join, missing term
    contributes 0) — the property that makes RRF robust to modality
    gaps.

    Exactness: both ranks come from exact-integer orderings with id
    tie-breaks; the fused score is a fixed two-term rational on small
    integers — identical in both engines. Scale: each modality is a
    keyed candidate ranking (embeddings: one pass vs the broadcast
    query vector; lexical: postings join on the query doc's
    shingles); fusion joins two 20-row relations."""
    from pyspark.sql import Window
    emb = table(spark, sf_dir, "embeddings")
    docs = table(spark, sf_dir, "documents")
    el = emb.select(
        "vec_id",
        F.posexplode(F.expr(
            "transform(embedding, v -> "
            "CAST(round(CAST(v AS DOUBLE) * 1000000, 0) AS BIGINT))"
        )).alias("pos", "x"))
    qv = (el.filter(F.col("vec_id") == _RRF_QDOC)
          .select("pos", F.col("x").alias("qx")))
    sem = (el.filter(F.col("vec_id") != _RRF_QDOC)
           .join(F.broadcast(qv), "pos")
           .groupBy(F.col("vec_id").alias("doc_id"))
           .agg(F.sum((F.col("x") - F.col("qx"))
                      * (F.col("x") - F.col("qx"))).alias("d2")))
    sem_rank = (sem.withColumn(
        "sem_rank", F.row_number().over(Window.orderBy("d2", "doc_id")))
        .filter(F.col("sem_rank") <= _RRF_TOP)
        .select("doc_id", "sem_rank"))
    from ..llm.dedup import word_shingles
    sh = word_shingles(docs, distinct=True)
    qs = (sh.filter(F.col("doc_id") == _RRF_QDOC)
          .select("shingle"))
    lex = (sh.filter(F.col("doc_id") != _RRF_QDOC)
           .join(F.broadcast(qs), "shingle")
           .groupBy("doc_id").agg(F.count("*").alias("overlap")))
    lex_rank = (lex.withColumn(
        "lex_rank", F.row_number().over(
            Window.orderBy(F.desc("overlap"), "doc_id")))
        .filter(F.col("lex_rank") <= _RRF_TOP)
        .select("doc_id", "lex_rank"))
    fused = (sem_rank.join(lex_rank, "doc_id", "full_outer")
             .withColumn("score",
                         F.coalesce(F.lit(1.0)
                                    / (_RRF_K + F.col("sem_rank")),
                                    F.lit(0.0))
                         + F.coalesce(F.lit(1.0)
                                      / (_RRF_K + F.col("lex_rank")),
                                      F.lit(0.0))))
    w = Window.orderBy(F.desc("score"), "doc_id")
    return (fused.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= _RRF_OUT)
            .select("doc_id", "sem_rank", "lex_rank",
                    F.round("score", 6).alias("rrf")))


# ------------------------------------------------ Kneser-Ney bigram LM

_KN_D_NUM = 3  # discount d = 3/4, kept rational for exact algebra
_KN_D_DEN = 4
_KN_TOP = 20


@register(
    "text_kneser_ney_bigram",
    oracle=f"""
    WITH toks AS MATERIALIZED (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    big AS MATERIALIZED (
      SELECT t[i] AS w1, t[i+1] AS w2
      FROM toks, unnest(range(1, len(t))) AS g(i)),
    bc AS MATERIALIZED (
      SELECT w1, w2, CAST(count(*) AS BIGINT) AS c2
      FROM big GROUP BY 1, 2),
    uc AS (SELECT w1, CAST(sum(c2) AS BIGINT) AS c1,
                  CAST(count(*) AS BIGINT) AS fanout
           FROM bc GROUP BY 1),
    cont AS (SELECT w2, CAST(count(*) AS BIGINT) AS n_left
             FROM bc GROUP BY 1),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n_bigram_types FROM bc)
    SELECT w1, w2, c2,
           round((CAST(greatest(4 * c2 - 3, 0) AS DOUBLE)
                  / (4 * uc.c1))
                 + (3.0 * uc.fanout / (4 * uc.c1))
                   * (CAST(cont.n_left AS DOUBLE) / tot.n_bigram_types),
                 6) AS p_kn
    FROM bc JOIN uc USING (w1) JOIN cont USING (w2), tot
    ORDER BY c2 DESC, w1, w2 LIMIT {_KN_TOP}
    """,
    tags=("llm", "text"),
)
def text_kneser_ney_bigram(spark, sf_dir):
    """Kneser-Ney smoothed bigram probabilities — the LM smoothing
    KenLM-style quality filters actually use, beside the registry's
    add-one `text_bigram_lm_score`: absolute discount d=3/4 on the
    bigram count, with the stolen mass re-distributed by CONTINUATION
    probability (how many distinct left-contexts a word follows — the
    insight that makes KN the strongest n-gram smoother). Top-20
    bigrams by raw count with their P_KN.

    Exactness: d=3/4 stays RATIONAL — max(4*c2-3, 0)/(4*c1) keeps the
    discounted term an exact-integer ratio; continuation and fanout
    counts are exact; the final expression is one shared float tree.
    Scale: two map-side-combinable aggregates over the bigram explode
    (the same relation the add-one LM builds) + two small dimension
    joins."""
    d = table(spark, sf_dir, "documents")
    toks = d.select(F.split("text", " ").alias("t"))
    big = (toks.select(F.explode(F.expr(
        "transform(slice(t, 1, greatest(size(t) - 1, 0)), "
        "(w, i) -> struct(w AS w1, element_at(t, i + 2) AS w2))"
    )).alias("bg")).select("bg.w1", "bg.w2"))
    bc = big.groupBy("w1", "w2").agg(F.count("*").cast("long").alias("c2"))
    uc = bc.groupBy("w1").agg(F.sum("c2").cast("long").alias("c1"),
                              F.count("*").cast("long").alias("fanout"))
    cont = bc.groupBy("w2").agg(F.count("*").cast("long").alias("n_left"))
    tot = bc.agg(F.count("*").cast("long").alias("n_bigram_types"))
    p_kn = F.round(
        (F.greatest(4 * F.col("c2") - 3, F.lit(0)).cast("double")
         / (4 * F.col("c1")))
        + (F.lit(3.0) * F.col("fanout") / (4 * F.col("c1")))
        * (F.col("n_left").cast("double") / F.col("n_bigram_types")), 6)
    return (bc.join(uc, "w1").join(cont, "w2")
            .crossJoin(F.broadcast(tot))
            .select("w1", "w2", "c2", p_kn.alias("p_kn"))
            .orderBy(F.desc("c2"), "w1", "w2").limit(_KN_TOP))


# ------------------------------------------------ perceptual aHash dedup

_AH_CELLS = 32          # 32-bit average hash (8x4 grid)
_AH_HAM = 4             # near-dup if hamming <= 4
# pigeonhole bands for hamming<=4 candidates: 5 bands of <=7 bits —
# any pair within hamming 4 agrees exactly on >= 1 band
_AH_BANDS = [(0, 7), (7, 7), (14, 7), (21, 6), (27, 5)]


def _ahash_oracle() -> str:
    band_selects = " UNION ALL ".join(
        f"""SELECT doc_id, {bi} AS band,
                   (ahash >> {off}) & {(1 << width) - 1} AS key
            FROM ah"""
        for bi, (off, width) in enumerate(_AH_BANDS))
    return f"""
    WITH d AS MATERIALIZED (
      SELECT doc_id, text, CAST(length(text) AS BIGINT) AS n
      FROM documents WHERE length(text) >= {_AH_CELLS}),
    g AS (SELECT doc_id, n, CAST(n // {_AH_CELLS} AS BIGINT) AS cw,
                 text FROM d),
    ch AS (
      SELECT doc_id, cw,
             CAST((i - 1) // cw AS BIGINT) AS cell,
             ascii(substr(text, CAST(i AS INT), 1)) AS code
      FROM g, unnest(range(1, CAST({_AH_CELLS} * cw + 1 AS BIGINT)))
           AS t(i)),
    cells AS (
      SELECT doc_id, cell, CAST(sum(code) AS BIGINT) AS s
      FROM ch GROUP BY 1, 2),
    tot AS (SELECT doc_id, CAST(sum(s) AS BIGINT) AS t
            FROM cells GROUP BY 1),
    ah AS MATERIALIZED (
      SELECT c.doc_id,
             CAST(sum(CASE WHEN {_AH_CELLS} * c.s > tot.t
                           THEN 1::BIGINT << CAST(c.cell AS INT)
                           ELSE 0 END) AS BIGINT) AS ahash
      FROM cells c JOIN tot ON tot.doc_id = c.doc_id
      GROUP BY c.doc_id),
    bands AS ({band_selects}),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id)
    SELECT c.id_a, c.id_b,
           CAST(bit_count(xor(x.ahash, y.ahash)) AS BIGINT) AS hamming
    FROM cand c
    JOIN ah x ON x.doc_id = c.id_a
    JOIN ah y ON y.doc_id = c.id_b
    WHERE bit_count(xor(x.ahash, y.ahash)) <= {_AH_HAM}
    """


@register("multimodal_ahash_dedup", oracle=_ahash_oracle(),
          tags=("llm", "multimodal", "dedup"))
def multimodal_ahash_dedup(spark, sf_dir):
    """Perceptual average-hash (aHash) near-duplicate detection — the
    imagededup-style visual dedup, run on the text-as-raster stand-in
    (char codes over a {_AH_CELLS}-cell grid; a real image pipeline
    feeds pixel blocks from the Arrow decode kernel into the SAME
    hash/band/join chain): each cell's bit is `cell mean > global
    mean` as an exact integer cross-multiplication, pairs within
    hamming <= 4 are found by PIGEONHOLE BANDING (5 bands of <= 7
    bits — a pair within hamming 4 must agree exactly on at least one
    band), then verified by bit_count(xor).

    Scale: hashing is one bounded explode (32·cell-width chars per
    doc) + two map-side-combinable aggregates; candidates come from
    per-band posting lists — never an all-pairs hash comparison;
    verification is a 2-column join on the candidate set. The same
    banding discipline as MinHash-LSH, applied to a Hamming metric."""
    from pyspark.sql import functions as F2
    d = (table(spark, sf_dir, "documents")
         .filter(F.length("text") >= _AH_CELLS)
         .select("doc_id", "text",
                 (F.length("text").cast("long") / _AH_CELLS)
                 .cast("long").alias("cw")))
    ch = d.select(
        "doc_id", "cw",
        F.posexplode(F.expr(
            f"transform(sequence(1, {_AH_CELLS} * cw), "
            "i -> ascii(substr(text, CAST(i AS INT), 1)))"
        )).alias("i0", "code")).select(
        "doc_id",
        (F.col("i0") / F.col("cw")).cast("long").alias("cell"),
        "code")
    cells = (ch.groupBy("doc_id", "cell")
             .agg(F.sum("code").cast("long").alias("s")))
    tot = cells.groupBy("doc_id").agg(F.sum("s").cast("long").alias("t"))
    ah = (cells.join(tot, "doc_id")
          .groupBy("doc_id")
          .agg(F.sum(F.when(_AH_CELLS * F.col("s") > F.col("t"),
                            F.expr("shiftleft(CAST(1 AS BIGINT), "
                                   "CAST(cell AS INT))"))
                     .otherwise(0)).cast("long").alias("ahash"))
          .localCheckpoint())
    bands = None
    for bi, (off, width) in enumerate(_AH_BANDS):
        b = ah.select("doc_id", F.lit(bi).alias("band"),
                      (F.shiftright(F.col("ahash"), off)
                       .bitwiseAND((1 << width) - 1)).alias("key"))
        bands = b if bands is None else bands.unionByName(b)
    cand = (bands.alias("a").join(
        bands.alias("b"),
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.key") == F.col("b.key"))
        & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("id_a"),
                F.col("b.doc_id").alias("id_b")).distinct())
    ham = F2.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return (cand
            .join(ah.select(F.col("doc_id").alias("id_a"),
                            F.col("ahash").alias("ha")), "id_a")
            .join(ah.select(F.col("doc_id").alias("id_b"),
                            F.col("ahash").alias("hb")), "id_b")
            .filter(ham <= _AH_HAM)
            .select("id_a", "id_b", ham.cast("long").alias("hamming")))


# --------------------------------------- Mahalanobis outliers (diag)

_MAH_TOP = 20


@register(
    "embedding_outlier_mahalanobis_diag",
    oracle=f"""
    WITH pts AS MATERIALIZED (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    el AS MATERIALIZED (
      SELECT vec_id, CAST(i AS INT) AS pos,
             CAST(round(v[i] * 1000000) AS BIGINT) AS q
      FROM pts, unnest(range(1, len(v) + 1)) AS g(i)),
    m AS MATERIALIZED (
      SELECT pos, CAST(sum(CAST(q AS DECIMAL(38,0))) AS DECIMAL(38,0))
               AS s,
             CAST(sum(CAST(q AS DECIMAL(38,0)) * q) AS DECIMAL(38,0))
               AS ss,
             CAST(count(*) AS BIGINT) AS n
      FROM el GROUP BY pos),
    score AS (
      SELECT e.vec_id,
             sum(
               (e.q - CAST(m.s AS DOUBLE) / m.n)
               * (e.q - CAST(m.s AS DOUBLE) / m.n)
               / ((CAST(m.ss AS DOUBLE)
                   - CAST(m.s AS DOUBLE) * CAST(m.s AS DOUBLE) / m.n)
                  / (m.n - 1))) AS d2
      FROM el e JOIN m ON m.pos = e.pos
      GROUP BY e.vec_id)
    SELECT vec_id, round(d2, 4) AS mahalanobis_sq, rank
    FROM (SELECT vec_id, d2,
                 CAST(row_number() OVER (ORDER BY round(d2, 4) DESC,
                                         vec_id) AS INT) AS rank
          FROM score)
    WHERE rank <= {_MAH_TOP}
    """,
    tags=("llm", "embedding", "dq"),
)
def embedding_outlier_mahalanobis_diag(spark, sf_dir):
    """Embedding outlier detection by diagonal Mahalanobis distance —
    the corpus-QA filter that flags corrupt / out-of-distribution
    vectors before they poison a training mix: per-dimension means and
    sample variances from EXACT integer partials (the quantize-once
    Gram discipline: q, Σq, Σq² as DECIMAL(38,0) — order-free), then
    each vector's variance-normalized squared distance summed over
    dimensions. Top-20 by score. The full-covariance form composes
    `embedding_covariance` with a solve; the diagonal form is the
    standard first-pass screen and needs no matrix inverse.

    Determinism: the per-dimension float expression runs on identical
    exact integers in both engines; per-vector d2 is a sum of exactly
    d=64 doubles computed in the SAME grouping (one group per vector —
    partition-order independent because addition order within a
    64-element group is engine-defined... so the SCORE is rounded to
    4dp before ranking, placing the tie-break three orders of
    magnitude above any association drift, the
    `pandas_grouped_zscore` recipe). Scale: one stats pass (dimension-
    cardinality output) + one scoring pass with the 64-row stats
    broadcast."""
    emb = table(spark, sf_dir, "embeddings")
    el = emb.select(
        "vec_id",
        F.posexplode(F.expr(
            "transform(embedding, v -> "
            "CAST(round(CAST(v AS DOUBLE) * 1000000, 0) AS BIGINT))"
        )).alias("pos", "q"))
    dec = "decimal(38,0)"
    m = (el.groupBy("pos")
         .agg(F.sum(F.col("q").cast(dec)).cast(dec).alias("s"),
              F.sum(F.col("q").cast(dec) * F.col("q")).cast(dec)
              .alias("ss"),
              F.count("*").cast("long").alias("n")))
    mu = F.col("s").cast("double") / F.col("n")
    var = ((F.col("ss").cast("double")
            - F.col("s").cast("double") * F.col("s").cast("double")
            / F.col("n")) / (F.col("n") - 1))
    score = (el.join(F.broadcast(m), "pos")
             .groupBy("vec_id")
             .agg(F.sum((F.col("q") - mu) * (F.col("q") - mu) / var)
                  .alias("d2")))
    from pyspark.sql import Window
    w = Window.orderBy(F.round(F.col("d2"), 4).desc(), "vec_id")
    return (score.withColumn("rank", F.row_number().over(w).cast("int"))
            .filter(F.col("rank") <= _MAH_TOP)
            .select("vec_id", F.round("d2", 4).alias("mahalanobis_sq"),
                    "rank"))


# --------------------------------------- MMR diverse selection

_MMR_QDOC = 0
_MMR_CANDS = 12
_MMR_K = 4


def _mmr_oracle() -> str:
    steps = []
    sel_union = "SELECT vec_id, 1 AS step FROM s1"
    for t in range(2, _MMR_K + 1):
        steps.append(f""",
    sel{t - 1} AS ({sel_union}),
    s{t} AS (
      SELECT c.vec_id, c.d2q FROM cand c
      JOIN pairs p ON p.a = c.vec_id
      JOIN sel{t - 1} s ON s.vec_id = p.b
      WHERE c.vec_id NOT IN (SELECT vec_id FROM sel{t - 1})
      GROUP BY c.vec_id, c.d2q
      ORDER BY min(p.d2) - c.d2q DESC, c.vec_id LIMIT 1)""")
        sel_union += f" UNION ALL SELECT vec_id, {t} FROM s{t}"
    return f"""
    WITH pts AS MATERIALIZED (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    el AS MATERIALIZED (
      SELECT vec_id, CAST(i AS INT) AS pos,
             CAST(round(v[i] * 1000000) AS BIGINT) AS x
      FROM pts, unnest(range(1, len(v) + 1)) AS g(i)),
    qv AS (SELECT pos, x FROM el WHERE vec_id = {_MMR_QDOC}),
    d2q_all AS (
      SELECT e.vec_id, sum((e.x - q.x) * (e.x - q.x)) AS d2q
      FROM el e JOIN qv q ON q.pos = e.pos
      WHERE e.vec_id <> {_MMR_QDOC} GROUP BY 1),
    cand AS MATERIALIZED (
      SELECT vec_id, CAST(d2q AS BIGINT) AS d2q FROM d2q_all
      ORDER BY d2q, vec_id LIMIT {_MMR_CANDS}),
    pairs AS MATERIALIZED (
      SELECT a.vec_id AS a, b.vec_id AS b,
             CAST(sum((ea.x - eb.x) * (ea.x - eb.x)) AS BIGINT) AS d2
      FROM cand a JOIN cand b ON a.vec_id <> b.vec_id
      JOIN el ea ON ea.vec_id = a.vec_id
      JOIN el eb ON eb.vec_id = b.vec_id AND eb.pos = ea.pos
      GROUP BY 1, 2),
    s1 AS (SELECT vec_id, d2q FROM cand ORDER BY d2q, vec_id LIMIT 1)
    {"".join(steps)},
    sel AS ({sel_union})
    SELECT s.step, s.vec_id,
           round(CAST(c.d2q AS DOUBLE) / 1e12, 6) AS dist_to_query
    FROM sel s JOIN cand c ON c.vec_id = s.vec_id
    """


@register("curation_mmr_diverse_select", oracle=_mmr_oracle(),
          tags=("llm", "curation", "similarity"))
def curation_mmr_diverse_select(spark, sf_dir):
    """Maximal-marginal-relevance diversity selection — the greedy
    pick that balances 'close to the query' against 'far from what's
    already selected' (Carbonell-Goldstein MMR with lambda=1/2, the
    dedup-aware sampler of retrieval-augmented and few-shot example
    pipelines): from the top-12 relevance candidates, pick 4 — first
    the nearest, then repeatedly argmax(min distance to selected -
    distance to query), ties to the smaller id. All distances are
    exact integer squared L2 over the once-quantized elements, so the
    greedy trajectory is bit-deterministic.

    Scale: relevance top-k bounds the candidate set (one pass vs the
    broadcast query vector — or any ANN index in the registry); the
    pairwise matrix and every greedy step then run on candidate-
    cardinality relations (12 rows). The sequential dependency is
    inherent to MMR — each round is a tiny argmax, pipelined on
    driver-side loop structure but never driver-side DATA."""
    from pyspark.sql import Window
    emb = table(spark, sf_dir, "embeddings")
    el = emb.select(
        "vec_id",
        F.posexplode(F.expr(
            "transform(embedding, v -> "
            "CAST(round(CAST(v AS DOUBLE) * 1000000, 0) AS BIGINT))"
        )).alias("pos", "x"))
    qv = (el.filter(F.col("vec_id") == _MMR_QDOC)
          .select("pos", F.col("x").alias("qx")))
    d2q = (el.filter(F.col("vec_id") != _MMR_QDOC)
           .join(F.broadcast(qv), "pos")
           .groupBy("vec_id")
           .agg(F.sum((F.col("x") - F.col("qx"))
                      * (F.col("x") - F.col("qx"))).cast("long")
                .alias("d2q")))
    cand = (d2q.orderBy("d2q", "vec_id").limit(_MMR_CANDS)
            .localCheckpoint())
    cel = el.join(cand.select("vec_id"), "vec_id", "left_semi")
    pairs = (cel.alias("a").join(
        cel.alias("b"),
        (F.col("a.pos") == F.col("b.pos"))
        & (F.col("a.vec_id") != F.col("b.vec_id")))
        .groupBy(F.col("a.vec_id").alias("a"),
                 F.col("b.vec_id").alias("b"))
        .agg(F.sum((F.col("a.x") - F.col("b.x"))
                   * (F.col("a.x") - F.col("b.x"))).cast("long")
             .alias("d2")).localCheckpoint())
    sel = (cand.orderBy("d2q", "vec_id").limit(1)
           .select("vec_id", F.lit(1).alias("step")))
    for t in range(2, _MMR_K + 1):
        remaining = cand.join(sel.select("vec_id"), "vec_id",
                              "left_anti")
        scored = (remaining
                  .join(pairs, remaining.vec_id == pairs.a)
                  .join(sel.select(F.col("vec_id").alias("b")), "b",
                        "left_semi")
                  .groupBy(remaining.vec_id, "d2q")
                  .agg(F.min("d2").alias("min_sel")))
        pick = (scored
                .orderBy((F.col("min_sel") - F.col("d2q")).desc(),
                         "vec_id").limit(1)
                .select("vec_id", F.lit(t).alias("step")))
        sel = sel.unionByName(pick).localCheckpoint()
    return (sel.join(cand, "vec_id")
            .select("step", "vec_id",
                    F.round(F.col("d2q").cast("double") / F.lit(1e12), 6)
                    .alias("dist_to_query")))


# ------------------------------------------------ greedy graph search

_GS_HOPS = 3
_GS_NQ = 5  # query vectors: vec_id < 5


def _greedy_search_oracle() -> str:
    hops = []
    for h in range(_GS_HOPS):
        hops.append(f""",
    cand{h} AS (
      SELECT DISTINCT c.qid, g.b AS node
      FROM cur{h} c JOIN gsym g ON g.a = c.node
      WHERE g.b <> c.qid),
    cd{h} AS (
      SELECT p.qid, p.node,
             sum((ea.x - eb.x) * (ea.x - eb.x)) AS d2
      FROM cand{h} p
      JOIN el ea ON ea.vec_id = p.qid
      JOIN el eb ON eb.vec_id = p.node AND eb.pos = ea.pos
      GROUP BY 1, 2),
    best{h} AS (
      SELECT qid, node, d2
      FROM (SELECT qid, node, d2,
                   row_number() OVER (PARTITION BY qid
                                      ORDER BY d2, node) AS rn
            FROM cd{h})
      WHERE rn = 1),
    cur{h + 1} AS MATERIALIZED (
      SELECT c.qid,
             CASE WHEN b.d2 IS NOT NULL AND b.d2 < c.d2
                  THEN b.node ELSE c.node END AS node,
             CASE WHEN b.d2 IS NOT NULL AND b.d2 < c.d2
                  THEN b.d2 ELSE c.d2 END AS d2
      FROM cur{h} c LEFT JOIN best{h} b ON b.qid = c.qid)""")
    return f"""{_knn_base_ctes()},
    gsym AS (SELECT src AS a, dst AS b FROM knn
             UNION SELECT dst, src FROM knn),
    qs AS (SELECT vec_id AS qid FROM embeddings
           WHERE vec_id < {_GS_NQ}),
    ent AS (
      SELECT qs.qid, min(g.a) AS node
      FROM qs JOIN gsym g ON g.a <> qs.qid
      GROUP BY qs.qid),
    cur0 AS MATERIALIZED (
      SELECT e.qid, e.node,
             sum((ea.x - eb.x) * (ea.x - eb.x)) AS d2
      FROM ent e
      JOIN el ea ON ea.vec_id = e.qid
      JOIN el eb ON eb.vec_id = e.node AND eb.pos = ea.pos
      GROUP BY 1, 2){"".join(hops)}
    SELECT qid AS query_id, node AS found_id,
           round(CAST(d2 AS DOUBLE) / 1e12, 6) AS dist_sq
    FROM cur{_GS_HOPS}
    """


@register("sim_knn_graph_greedy_search", oracle=_greedy_search_oracle(),
          tags=("llm", "similarity", "graph"))
def sim_knn_graph_greedy_search(spark, sf_dir):
    """Greedy best-first routing on the LSH-seeded kNN graph — the
    NSW/HNSW query primitive that completes the graph-ANN story
    (build `embedding_knn_graph` → refine
    `embedding_knn_descent_round` → SEARCH): from a fixed entry
    vertex (smallest non-self node id), each hop moves to the
    neighbor closest to the query iff it is STRICTLY closer,
    {_GS_HOPS} unrolled hops, exact integer squared-L2 throughout,
    ties to the lowest neighbor id. Monotone by construction (moves
    only downhill), so both engines walk identical paths.

    Scale shape: per hop, candidates = the current vertices' ≤2k
    graph neighbors per query — |Q|·2k rows, never corpus-sized; the
    distance rerank joins the element relation on the candidate set
    only. At index scale this is the navigable-small-world query
    loop: O(hops·degree) distance evaluations per query, with the
    entry fixed (HNSW's upper layers replace the fixed entry with a
    coarse-to-fine one; the hop loop is unchanged)."""
    emb = table(spark, sf_dir, "embeddings")
    el = _quantized_elements(emb).localCheckpoint()
    seed = _knn_seed_edges(emb).select("src", "dst").localCheckpoint()
    gsym = (seed.select(F.col("src").alias("a"), F.col("dst").alias("b"))
            .unionByName(seed.select(F.col("dst").alias("a"),
                                     F.col("src").alias("b")))
            .distinct()
            .localCheckpoint())
    qs = emb.filter(F.col("vec_id") < _GS_NQ) \
        .select(F.col("vec_id").alias("qid"))
    ent = (qs.join(gsym, gsym["a"] != qs["qid"])
           .groupBy("qid").agg(F.min("a").alias("node")))

    def dist(pairs):
        # exact integer L2 between (qid, node) via the element relation
        d = _exact_d2(pairs.select(F.col("qid").alias("src"),
                                   F.col("node").alias("dst")), el)
        return d.select(F.col("src").alias("qid"),
                        F.col("dst").alias("node"), "d2")

    cur = dist(ent).localCheckpoint()
    from pyspark.sql import Window
    for _ in range(_GS_HOPS):
        cand = (cur.join(gsym, cur["node"] == gsym["a"])
                .filter(F.col("b") != F.col("qid"))
                .select("qid", F.col("b").alias("node")).distinct())
        cd = dist(cand)
        wq = Window.partitionBy("qid").orderBy("d2", "node")
        best = (cd.withColumn("rn", F.row_number().over(wq))
                .filter(F.col("rn") == 1)
                .select("qid", F.col("node").alias("b_node"),
                        F.col("d2").alias("b_d2")))
        better = F.col("b_d2").isNotNull() & (F.col("b_d2") < F.col("d2"))
        cur = (cur.join(best, "qid", "left")
               .select("qid",
                       F.when(better, F.col("b_node"))
                       .otherwise(F.col("node")).alias("node"),
                       F.when(better, F.col("b_d2"))
                       .otherwise(F.col("d2")).alias("d2"))
               .localCheckpoint())
    return cur.select(
        F.col("qid").alias("query_id"),
        F.col("node").alias("found_id"),
        F.round(F.col("d2").cast("double") / F.lit(1e12), 6)
        .alias("dist_sq"))


# ------------------------------------------------ two-layer search

_HN_MOD = 4       # layer-1 membership: vec_id % 4 == 0 (deterministic)
_HN_HOPS = 2      # greedy hops per layer


def _hop_ctes(layer: str, start: int, hops: int) -> str:
    """Unrolled greedy hops cur{start}..cur{start+hops} over graph
    CTE ``{layer}`` — same shape as the flat greedy walk."""
    out = []
    for h in range(start, start + hops):
        out.append(f""",
    cand{h} AS (
      SELECT DISTINCT c.qid, g.b AS node
      FROM cur{h} c JOIN {layer} g ON g.a = c.node
      WHERE g.b <> c.qid),
    cd{h} AS (
      SELECT p.qid, p.node,
             sum((ea.x - eb.x) * (ea.x - eb.x)) AS d2
      FROM cand{h} p
      JOIN el ea ON ea.vec_id = p.qid
      JOIN el eb ON eb.vec_id = p.node AND eb.pos = ea.pos
      GROUP BY 1, 2),
    best{h} AS (
      SELECT qid, node, d2
      FROM (SELECT qid, node, d2,
                   row_number() OVER (PARTITION BY qid
                                      ORDER BY d2, node) AS rn
            FROM cd{h})
      WHERE rn = 1),
    cur{h + 1} AS MATERIALIZED (
      SELECT c.qid,
             CASE WHEN b.d2 IS NOT NULL AND b.d2 < c.d2
                  THEN b.node ELSE c.node END AS node,
             CASE WHEN b.d2 IS NOT NULL AND b.d2 < c.d2
                  THEN b.d2 ELSE c.d2 END AS d2
      FROM cur{h} c LEFT JOIN best{h} b ON b.qid = c.qid)""")
    return "".join(out)


def _two_layer_oracle() -> str:
    k = _KNN_K
    return f"""{_knn_base_ctes()},
    knn1 AS MATERIALIZED (
      SELECT src, dst, d2, rank
      FROM (SELECT src, dst, d2,
                   row_number() OVER (PARTITION BY src
                                      ORDER BY d2, dst) AS rank
            FROM d2
            WHERE src % {_HN_MOD} = 0 AND dst % {_HN_MOD} = 0)
      WHERE rank <= {k}),
    g1 AS (SELECT src AS a, dst AS b FROM knn1
           UNION SELECT dst, src FROM knn1),
    g0 AS (SELECT src AS a, dst AS b FROM knn
           UNION SELECT dst, src FROM knn),
    qs AS (SELECT vec_id AS qid FROM embeddings
           WHERE vec_id < {_GS_NQ}),
    ent AS (
      SELECT qs.qid, min(g.a) AS node
      FROM qs JOIN g1 g ON g.a <> qs.qid
      GROUP BY qs.qid),
    cur0 AS MATERIALIZED (
      SELECT e.qid, e.node,
             sum((ea.x - eb.x) * (ea.x - eb.x)) AS d2
      FROM ent e
      JOIN el ea ON ea.vec_id = e.qid
      JOIN el eb ON eb.vec_id = e.node AND eb.pos = ea.pos
      GROUP BY 1, 2){_hop_ctes("g1", 0, _HN_HOPS)}{
        _hop_ctes("g0", _HN_HOPS, _HN_HOPS)}
    SELECT qid AS query_id, node AS found_id,
           round(CAST(d2 AS DOUBLE) / 1e12, 6) AS dist_sq
    FROM cur{2 * _HN_HOPS}
    """


@register("sim_ann_two_layer_search", oracle=_two_layer_oracle(),
          tags=("llm", "similarity", "graph"))
def sim_ann_two_layer_search(spark, sf_dir):
    """Hierarchical (HNSW-style) two-layer graph search: a COARSE
    layer-1 graph over the deterministic 1/{_HN_MOD} node subset
    (hash-style membership replaces HNSW's random level draw — same
    expected layer sizes, reproducible) routes {_HN_HOPS} greedy hops
    to a good REGION, then the full layer-0 kNN graph refines with
    {_HN_HOPS} more hops. This is exactly why HNSW beats flat NSW:
    the coarse layer crosses the space in few hops (its edges are
    long), so layer-0 starts near the target instead of at a fixed
    global entry (`sim_knn_graph_greedy_search` is the flat
    baseline).

    Both layers re-rank with the SAME exact integer squared-L2 and
    (d2, node) tiebreaks; monotone downhill moves only — identical
    walks in both engines. The layer-1 kNN graph costs nothing
    extra: it re-ranks the ALREADY-COMPUTED LSH candidate distances
    restricted to layer-1 pairs.

    Scale: per hop |Q|·degree distance evaluations (the NSW loop);
    layer-1 has ~1/{_HN_MOD} the nodes so its graph build is a
    filter + window over the shared candidate distances, no second
    LSH pass."""
    emb = table(spark, sf_dir, "embeddings")
    el = _quantized_elements(emb).localCheckpoint()
    from ..llm.similarity import lsh_multi_table_pairs
    cand = lsh_multi_table_pairs(emb)
    sym = (cand.select(F.col("id_a").alias("src"),
                       F.col("id_b").alias("dst"))
           .unionByName(cand.select(F.col("id_b").alias("src"),
                                    F.col("id_a").alias("dst"))))
    d2 = _exact_d2(sym, el).localCheckpoint()
    knn0 = _topk_per_src(d2).select("src", "dst")
    knn1 = _topk_per_src(
        d2.filter((F.col("src") % _HN_MOD == 0)
                  & (F.col("dst") % _HN_MOD == 0))).select("src", "dst")

    def symg(edges):
        return (edges.select(F.col("src").alias("a"),
                             F.col("dst").alias("b"))
                .unionByName(edges.select(F.col("dst").alias("a"),
                                          F.col("src").alias("b")))
                .distinct().localCheckpoint())

    g0, g1 = symg(knn0), symg(knn1)
    qs = emb.filter(F.col("vec_id") < _GS_NQ) \
        .select(F.col("vec_id").alias("qid"))
    ent = (qs.join(g1, g1["a"] != qs["qid"])
           .groupBy("qid").agg(F.min("a").alias("node")))

    def dist(pairs):
        d = _exact_d2(pairs.select(F.col("qid").alias("src"),
                                   F.col("node").alias("dst")), el)
        return d.select(F.col("src").alias("qid"),
                        F.col("dst").alias("node"), "d2")

    from pyspark.sql import Window

    def hops(cur, gsym, n):
        for _ in range(n):
            cand_h = (cur.join(gsym, cur["node"] == gsym["a"])
                      .filter(F.col("b") != F.col("qid"))
                      .select("qid", F.col("b").alias("node"))
                      .distinct())
            cd = dist(cand_h)
            wq = Window.partitionBy("qid").orderBy("d2", "node")
            best = (cd.withColumn("rn", F.row_number().over(wq))
                    .filter(F.col("rn") == 1)
                    .select("qid", F.col("node").alias("b_node"),
                            F.col("d2").alias("b_d2")))
            better = (F.col("b_d2").isNotNull()
                      & (F.col("b_d2") < F.col("d2")))
            cur = (cur.join(best, "qid", "left")
                   .select("qid",
                           F.when(better, F.col("b_node"))
                           .otherwise(F.col("node")).alias("node"),
                           F.when(better, F.col("b_d2"))
                           .otherwise(F.col("d2")).alias("d2"))
                   .localCheckpoint())
        return cur

    cur = dist(ent).localCheckpoint()
    cur = hops(cur, g1, _HN_HOPS)   # coarse layer crosses the space
    cur = hops(cur, g0, _HN_HOPS)   # full layer refines locally
    return cur.select(
        F.col("qid").alias("query_id"),
        F.col("node").alias("found_id"),
        F.round(F.col("d2").cast("double") / F.lit(1e12), 6)
        .alias("dist_sq"))
