"""Round-4 continuation, wave 3 (round-5 driver-window candidates):
BPE merge learning and the Poisson bootstrap — two training-pipeline
primitives built on the registry's exact-algebra discipline.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from .base import register, table

# ------------------------------------------------ BPE merge learning

_BPE_ITERS = 3


def _bpe_oracle_chain() -> str:
    """The unrolled K-iteration CTE chain up to seg{K} (no final
    SELECT) — shared by the learn oracle and the encode oracle."""
    parts = ["""
    WITH words AS (
      SELECT w, count(*) AS freq FROM (
        SELECT unnest(string_split(text, ' ')) AS w FROM documents)
      WHERE w <> '' GROUP BY w),
    seg0 AS (
      SELECT w, freq,
             '·' || array_to_string(
               list_transform(range(1, length(w) + 1), i -> w[i]),
               '·') || '·' AS s
      FROM words)"""]
    for k in range(1, _BPE_ITERS + 1):
        parts.append(f""",
    pairs{k} AS (
      SELECT syms[i] AS l, syms[i + 1] AS r,
             CAST(sum(freq) AS BIGINT) AS cnt
      FROM (SELECT freq, string_split(trim(s, '·'), '·')
                     AS syms
            FROM seg{k - 1}) t,
           unnest(range(1, len(t.syms))) AS g(i)
      GROUP BY 1, 2),
    top{k} AS (SELECT l, r, cnt FROM pairs{k}
               ORDER BY cnt DESC, l, r LIMIT 1),
    seg{k} AS (
      SELECT w, freq,
             replace(s, '·' || t.l || '·' || t.r || '·',
                     '·' || t.l || t.r || '·') AS s
      FROM seg{k - 1}, top{k} t)""")
    return "".join(parts)


def _bpe_oracle() -> str:
    """Unrolled K-iteration BPE oracle (same technique as the k-means
    and PageRank oracles — the loop runs at SQL-generation time)."""
    finals = " UNION ALL ".join(
        f"SELECT CAST({k} AS INT) AS iteration, l, r, cnt FROM top{k}"
        for k in range(1, _BPE_ITERS + 1))
    return f"{_bpe_oracle_chain()}\n    {finals}"


@register(
    "bpe_learn_merges",
    oracle=_bpe_oracle(),
    tags=("llm", "text", "iterative"),
)
def bpe_learn_merges(spark, sf_dir):
    """Byte-pair-encoding merge learning — the first K=3 merge rules
    of a BPE tokenizer trained on the corpus: count adjacent symbol
    pairs weighted by word frequency, merge the most frequent pair
    everywhere, repeat. THE vocabulary-construction algorithm behind
    GPT/Llama-style tokenizers.

    Shape at scale: real BPE trainers never iterate over the corpus —
    they iterate over the WORD-FREQUENCY table (bounded by vocabulary,
    not corpus bytes), which is exactly this plan: one corpus scan
    builds (word, freq), then each merge round is a pair-explode +
    hash-agg over the vocab-sized relation with the single winning
    pair broadcast back. K driver rounds, no growing lineage risk at
    K=3.

    Determinism: pair counts are integer sums; the winner takes a
    total-order tiebreak (cnt DESC, l, r); merge application is
    literal `replace` — both engines replace non-overlapping matches
    left-to-right in one pass (verified: '·a·a·a·' → '·aa·a·' in
    both), so the shared-boundary variant is identically defined.
    Symbols are '·'-delimited, a character absent from the corpus."""
    merges, _ = _bpe_run(spark, sf_dir)
    return merges


def _bpe_run(spark, sf_dir):
    """The K-round merge loop; returns (merges relation, final
    segmentation relation) — learn returns the first, encode consumes
    the second."""
    docs = table(spark, sf_dir, "documents")
    words = (docs.select(F.explode(F.split("text", " ")).alias("w"))
             .filter(F.col("w") != "")
             .groupBy("w").agg(F.count("*").alias("freq")))
    seg = words.select(
        "w", "freq",
        F.expr("'·' || concat_ws('·', transform(sequence(1, "
               "length(w)), i -> substr(w, i, 1))) || '·'")
        .alias("s"))
    merges = None
    for it in range(1, _BPE_ITERS + 1):
        tmp = seg.withColumn(
            "syms", F.expr("slice(split(s, '·'), 2, "
                           "greatest(size(split(s, '·')) - 2, 0))"))
        pr = (tmp.filter(F.expr("size(syms) >= 2"))
              .select("freq", F.explode(F.expr(
                  "transform(sequence(1, size(syms) - 1), i -> "
                  "struct(element_at(syms, i) AS l, "
                  "element_at(syms, i + 1) AS r))")).alias("p"))
              .groupBy("p.l", "p.r").agg(F.sum("freq").alias("cnt")))
        top = (pr.orderBy(F.desc("cnt"), "l", "r").limit(1)
               .select(F.lit(it).cast("int").alias("iteration"),
                       "l", "r", F.col("cnt").cast("long").alias("cnt")))
        merges = top if merges is None else merges.unionAll(top)
        seg = (seg.crossJoin(F.broadcast(
            top.select(F.col("l").alias("ml"), F.col("r").alias("mr"))))
            .withColumn("s", F.expr(
                "replace(s, '·' || ml || '·' || mr || '·',"
                " '·' || ml || mr || '·')"))
            .drop("ml", "mr"))
    return merges, seg


@register(
    "bpe_encode_apply",
    oracle=f"""
    {_bpe_oracle_chain()},
    dw AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS w
      FROM documents),
    enc AS (
      SELECT d.doc_id,
             len(string_split(trim(s.s, '·'), '·')) AS n_tok,
             length(d.w) AS n_chars
      FROM dw d JOIN seg{_BPE_ITERS} s ON d.w = s.w
      WHERE d.w <> '')
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(n_tok) AS BIGINT) AS n_bpe_tokens,
           round(CAST(sum(n_tok) AS DOUBLE) / count(*), 4)
             AS tokens_per_word,
           round(CAST(sum(n_chars) AS DOUBLE) / sum(n_tok), 4)
             AS chars_per_token
    FROM enc GROUP BY doc_id
    """,
    tags=("llm", "tokenize"),
)
def bpe_encode_apply(spark, sf_dir):
    """Apply the learned BPE merges to encode the corpus — the
    tokenize step that follows `bpe_learn_merges` (together they are
    the train/apply pair of a GPT-style tokenizer; `tokenize_with_vocab`
    is the id-mapping sibling). The final word→segmentation relation is
    vocabulary-sized and BROADCASTS; encoding the corpus is a map-side
    join of exploded words against it — the corpus text itself is
    never re-segmented per document. Per-doc outputs (token counts,
    tokens/word, chars/token fertility) are the metrics a tokenizer
    eval reports. All counts integer; two terminal ratio divides."""
    docs = table(spark, sf_dir, "documents")
    _, seg = _bpe_run(spark, sf_dir)
    seg_tok = seg.select(
        "w", F.expr("size(split(trim(BOTH '·' FROM s), '·'))").alias("n_tok"))
    dw = (docs.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
          .filter(F.col("w") != ""))
    enc = (dw.join(F.broadcast(seg_tok), "w")
           .select("doc_id", "n_tok", F.length("w").alias("n_chars")))
    return (enc.groupBy("doc_id")
            .agg(F.count("*").cast("long").alias("n_words"),
                 F.sum("n_tok").cast("long").alias("n_bpe_tokens"),
                 F.round(F.sum("n_tok").cast("double") / F.count("*"), 4)
                 .alias("tokens_per_word"),
                 F.round(F.sum("n_chars").cast("double") / F.sum("n_tok"), 4)
                 .alias("chars_per_token")))


# ------------------------------------------------ Poisson bootstrap

_BOOT_B = 32
_HEX15_INT = 16 ** 15
# Poisson(1) inverse-CDF thresholds scaled to the 60-bit hash space —
# exact integer literals, identical in both engines
_POIS_CUM = []
_acc = 0.0
for _k in range(5):
    _acc += math.exp(-1.0) / math.factorial(_k)
    _POIS_CUM.append(int(_acc * _HEX15_INT))

_W_CASE = ("CASE " + " ".join(
    f"WHEN h < {c} THEN {i}" for i, c in enumerate(_POIS_CUM))
    + " ELSE 5 END")


@register(
    "sample_poisson_bootstrap",
    oracle=f"""
    WITH base AS (
      SELECT o_orderkey,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders),
    rep AS (
      SELECT b.i AS b, base.cents,
             CAST(('0x' || substr(md5(CAST(base.o_orderkey AS VARCHAR)
                                       || '_' || CAST(b.i AS VARCHAR)),
                                  1, 15)) AS BIGINT) AS h
      FROM base, unnest(range(0, {_BOOT_B})) AS b(i)),
    w AS (SELECT b, cents, {_W_CASE} AS wt FROM rep),
    means AS (
      SELECT b,
             CAST(sum(wt * cents) AS BIGINT) * 1.0
               / CAST(sum(wt) AS BIGINT) / 100.0 AS m
      FROM w GROUP BY b),
    ranked AS (
      SELECT m, row_number() OVER (ORDER BY m, b) AS rn FROM means),
    pt AS (
      SELECT count(*) AS n,
             CAST(sum(cents) AS BIGINT) AS total FROM base)
    SELECT pt.n AS n_rows,
           round(pt.total * 1.0 / pt.n / 100.0, 4) AS mean,
           round((SELECT m FROM ranked WHERE rn = 2), 4) AS ci_lo,
           round((SELECT m FROM ranked WHERE rn = {_BOOT_B - 1}), 4)
             AS ci_hi
    FROM pt
    """,
    tags=("stats", "sampling", "scale"),
)
def sample_poisson_bootstrap(spark, sf_dir):
    """Poisson bootstrap confidence interval for mean order value —
    THE distributed bootstrap: instead of resampling n rows with
    replacement (which needs global coordination), each row
    independently receives a Poisson(1) replication weight per
    replicate, which converges to the multinomial bootstrap and
    needs only a map-side weight draw.

    B=32 replicates explode map-side and collapse IMMEDIATELY into
    per-replicate partial sums (32 keys — the combiner reduces the
    shuffle to 32×partitions rows, so the ×B blowup never hits the
    exchange). Weights come from an exact integer md5 draw against
    precomputed Poisson(1) CDF thresholds — no RNG, reproducible
    across engines and runs. Replicate means are single divisions of
    exact integer sums; the 90% CI takes order statistics 2 and 31
    with a (m, b) total-order tiebreak."""
    base = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"))
    rep = (base.select(
        "cents",
        F.explode(F.sequence(F.lit(0), F.lit(_BOOT_B - 1))).alias("b"),
        F.col("o_orderkey"))
        .withColumn("h", F.conv(F.substring(F.md5(
            F.concat_ws("_", F.col("o_orderkey"), F.col("b"))), 1, 15),
            16, 10).cast("long")))
    w = rep.select("b", "cents", F.expr(_W_CASE).alias("wt"))
    means = (w.groupBy("b")
             .agg((F.sum(F.col("wt") * F.col("cents")) * 1.0
                   / F.sum("wt") / 100.0).alias("m")))
    from pyspark.sql import Window
    ranked = means.select(
        "m", F.row_number().over(Window.orderBy("m", "b")).alias("rn"))
    lo = ranked.filter(F.col("rn") == 2).select(
        F.round("m", 4).alias("ci_lo"))
    hi = ranked.filter(F.col("rn") == _BOOT_B - 1).select(
        F.round("m", 4).alias("ci_hi"))
    pt = base.agg(F.count("*").alias("n_rows"),
                  F.sum("cents").alias("total"))
    return (pt.crossJoin(F.broadcast(lo)).crossJoin(F.broadcast(hi))
            .select(F.col("n_rows").cast("long"),
                    F.round(F.col("total") * 1.0 / F.col("n_rows")
                            / 100.0, 4).alias("mean"),
                    "ci_lo", "ci_hi"))


# ------------------------------------------- multimodal frame dedup

_FD_BYTES = 40  # llm/multimodal.py:FRAME_BYTES


@register(
    "multimodal_frame_dedup",
    oracle=f"""
    WITH media AS (
      SELECT doc_id, text, length(text) AS byte_len FROM documents),
    fr AS (
      SELECT doc_id,
             md5(substr(text, CAST(i * {_FD_BYTES} + 1 AS INT),
                        {_FD_BYTES})) AS fh
      FROM media,
           unnest(range(0, byte_len // {_FD_BYTES})) AS g(i)),
    d AS (SELECT DISTINCT doc_id, fh FROM fr),
    df AS (SELECT fh, count(*) AS ndocs FROM d GROUP BY fh)
    SELECT d.doc_id,
           count(*) AS n_frames,
           CAST(sum(CASE WHEN df.ndocs >= 2 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_dup,
           round(sum(CASE WHEN df.ndocs >= 2 THEN 1 ELSE 0 END) * 1.0
                 / count(*), 6) AS dup_frac
    FROM d JOIN df ON d.fh = df.fh
    GROUP BY d.doc_id
    """,
    tags=("llm", "multimodal", "dedup"),
)
def multimodal_frame_dedup(spark, sf_dir):
    """Cross-media frame deduplication: fixed-size frames hashed from
    each binary payload, flagged when the same frame bytes appear in
    ≥ 2 media objects — the video/image dedup primitive (intro
    sequences, watermarked stock footage) at the payload level, the
    binary sibling of `corpus_boilerplate_shingles`.

    The Spark side runs on the REAL multimodal plumbing: payloads are
    opaque binary (`attach_payload`), frames are binary slices, and
    md5 hashes the bytes — on 100 TB of video only the 16-byte hashes
    ever reach a shuffle (posting-list discipline, never media×media).
    The oracle hashes the same windows through the text form — byte ≡
    char for the ASCII testdata, which is exactly what the stand-in
    payload guarantees (multimodal.py:attach_payload)."""
    from ..llm.multimodal import attach_payload
    media = attach_payload(table(spark, sf_dir, "documents"))
    nf = (F.col("byte_len") / _FD_BYTES).cast("long")
    fr = (media.filter(nf >= 1)
          .select("doc_id", "payload",
                  F.explode(F.sequence(F.lit(0), nf - 1)).alias("i"))
          .select("doc_id", F.md5(F.expr(
              f"substr(payload, i * {_FD_BYTES} + 1, {_FD_BYTES})"))
              .alias("fh")))
    d = fr.distinct()
    df_ = d.groupBy("fh").agg(F.count("*").alias("ndocs"))
    dup = F.sum(F.when(F.col("ndocs") >= 2, 1).otherwise(0))
    return (d.join(df_, "fh")
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_frames"),
                 dup.alias("n_dup"),
                 F.round(dup * 1.0 / F.count("*"), 6).alias("dup_frac")))


# --------------------------------------------- ANN recall@k evaluation

_EVAL_K = 10
_EVAL_MOD = 499  # vec_id % mod == 0 -> deterministic query subset


def _recall_oracle() -> str:
    from ..llm import similarity as S
    planes = S.hyperplanes(4)
    bits = " || ".join(
        "(CASE WHEN list_dot_product(CAST(embedding AS DOUBLE[]), "
        f"{plane!r}::DOUBLE[]) >= 0 THEN '1' ELSE '0' END)"
        for plane in planes)
    return f"""
    WITH b AS (SELECT vec_id, embedding, {bits} AS bucket
               FROM embeddings),
    q AS (SELECT * FROM b WHERE vec_id % {_EVAL_MOD} = 0),
    gt AS (
      SELECT query_id, cand_id FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
               row_number() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY round(list_cosine_similarity(
                            CAST(q.embedding AS DOUBLE[]),
                            CAST(c.embedding AS DOUBLE[])), 6) DESC,
                          c.vec_id) AS rank
        FROM q JOIN b c ON c.vec_id != q.vec_id)
      WHERE rank <= {_EVAL_K}),
    ann AS (
      SELECT query_id, cand_id FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
               row_number() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY round(list_cosine_similarity(
                            CAST(q.embedding AS DOUBLE[]),
                            CAST(c.embedding AS DOUBLE[])), 6) DESC,
                          c.vec_id) AS rank
        FROM q JOIN b c ON c.bucket = q.bucket
                       AND c.vec_id != q.vec_id)
      WHERE rank <= {_EVAL_K}),
    cn AS (
      SELECT q.vec_id AS query_id, count(c.vec_id) AS n_candidates
      FROM q LEFT JOIN b c ON c.bucket = q.bucket
                          AND c.vec_id != q.vec_id
      GROUP BY 1),
    hits AS (
      SELECT g.query_id, count(a.cand_id) AS n_hits
      FROM gt g LEFT JOIN ann a
        ON g.query_id = a.query_id AND g.cand_id = a.cand_id
      GROUP BY 1)
    SELECT cn.query_id, CAST(cn.n_candidates AS BIGINT) AS n_candidates,
           CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
           round(coalesce(h.n_hits, 0) / {float(_EVAL_K)!r}, 4) AS recall
    FROM cn LEFT JOIN hits h ON cn.query_id = h.query_id
    """


@register(
    "sim_recall_at_k_eval",
    oracle=_recall_oracle(),
    tags=("llm", "similarity", "eval"),
)
def sim_recall_at_k_eval(spark, sf_dir):
    """In-engine ANN quality evaluation: recall@10 of the LSH-bucketed
    index against exact brute-force ground truth, per query — the eval
    harness a production vector pipeline runs after (re)building an
    index, expressed as one query instead of an offline script.

    Both arms share the scale discipline of their production
    counterparts: ground truth broadcasts only the FIXED query subset
    (vec_id % 499 — a handful of vectors) against the corpus, the ANN
    arm joins on the bucket key, and the recall join touches q×k rows.
    Evaluation cost therefore scales with |queries|·N, never N² — the
    standard sampled-recall protocol. Counts integer; recall is one
    terminal division.

    On this testdata the measured recall is LOW (~0.0-0.1): the
    synthetic embeddings are near-uniform on the sphere, the regime
    where single-table sign-LSH provably cannot separate neighbors —
    which is precisely the failure mode this evaluation exists to
    expose (the fix is OR-amplification across independent tables:
    `sim_ann_lsh_or_pairs`, whose (b,T) closed form targets a chosen
    recall)."""
    from ..llm import similarity as S
    emb = table(spark, sf_dir, "embeddings")
    planes = S.hyperplanes(4)
    q = emb.filter(F.col("vec_id") % _EVAL_MOD == 0)
    gt = S.brute_force_topk(emb, q, k=_EVAL_K).select(
        "query_id", "cand_id")
    ann = S.lsh_topk(emb, q, k=_EVAL_K, planes=planes).select(
        "query_id", "cand_id")
    cb = S.lsh_bucket(emb, planes=planes).select(
        F.col("vec_id").alias("cand_id"), "bucket")
    qb = S.lsh_bucket(q, planes=planes).select(
        F.col("vec_id").alias("query_id"), "bucket")
    cn = (qb.join(cb, "bucket", "left")
          .filter(F.col("cand_id").isNull()
                  | (F.col("cand_id") != F.col("query_id")))
          .groupBy("query_id")
          .agg(F.count("cand_id").alias("n_candidates")))
    hits = (gt.join(ann.withColumn("hit", F.lit(1)),
                    ["query_id", "cand_id"], "left")
            .groupBy("query_id").agg(F.count("hit").alias("n_hits")))
    return (cn.join(hits, "query_id", "left")
            .select("query_id",
                    F.col("n_candidates").cast("long"),
                    F.coalesce("n_hits", F.lit(0)).cast("long")
                    .alias("n_hits"),
                    F.round(F.coalesce("n_hits", F.lit(0))
                            / float(_EVAL_K), 4).alias("recall")))


# ------------------------------------------------ SimHash Hamming join

_SH_BITS = 60          # 4 bands x 15 bits; fits a signed 64-bit long
_SH_BANDS = 4
_SH_BAND_BITS = _SH_BITS // _SH_BANDS
_SH_HAM_MAX = 3        # pigeonhole: <=3 flipped bits => >=1 clean band


def _simhash_hamming_oracle() -> str:
    sums = ",\n             ".join(
        f"sum(2 * ((hv >> {b}) & 1) - 1) AS s{b}" for b in range(_SH_BITS))
    fp = " + ".join(f"(CASE WHEN s{b} > 0 THEN {1 << b} ELSE 0 END)"
                    for b in range(_SH_BITS))
    mask = (1 << _SH_BAND_BITS) - 1
    bands = ", ".join(f"({b})" for b in range(_SH_BANDS))
    return f"""
    WITH w AS (
      SELECT doc_id,
             CAST('0x' || substr(md5(unnest(string_split(text, ' '))), 1,
                                 {_SH_BITS // 4}) AS BIGINT) AS hv
      FROM documents),
    sums AS (
      SELECT doc_id,
             {sums}
      FROM w GROUP BY doc_id),
    fp AS (SELECT doc_id, CAST({fp} AS BIGINT) AS simhash FROM sums),
    bands AS (
      SELECT doc_id, (simhash >> ({_SH_BAND_BITS} * b.b)) & {mask} AS val,
             b.b AS band
      FROM fp, (VALUES {bands}) AS b(b)),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
      FROM bands a JOIN bands c
        ON a.band = c.band AND a.val = c.val AND a.doc_id < c.doc_id)
    SELECT cand.id_a, cand.id_b,
           CAST(bit_count(xor(fa.simhash, fb.simhash)) AS INT) AS hamming
    FROM cand
    JOIN fp fa ON cand.id_a = fa.doc_id
    JOIN fp fb ON cand.id_b = fb.doc_id
    WHERE bit_count(xor(fa.simhash, fb.simhash)) <= {_SH_HAM_MAX}
    """


@register(
    "dedup_simhash_hamming",
    oracle=_simhash_hamming_oracle(),
    tags=("llm", "dedup"),
)
def dedup_simhash_hamming(spark, sf_dir):
    """SimHash Hamming-ball near-dup JOIN — the missing half of
    `dedup_simhash` (which only emits fingerprints): find all document
    pairs within Hamming distance 3 of each other on a 60-bit SimHash,
    using the pigeonhole banding of Manku et al. (WWW'07, the Google
    near-dup crawler design): split the fingerprint into 4 bands of 15
    bits; <=3 flipped bits leave at least one band intact, so an
    equi-join per band finds every qualifying pair — never all-pairs.
    Exact popcount(xor) <= 3 verification runs only on band-collision
    candidates.

    Scale shape: identical to the MinHash-LSH posting pattern — band
    join keyed on (band, 15-bit value), candidate set bounded by band
    collisions (2^15 buckets per band), verify is bit arithmetic in
    codegen. 60 bits (not the demo 16) keeps bands selective at corpus
    size; everything stays in one signed long. All integers."""
    from ..llm import dedup as D
    fp = D.simhash(table(spark, sf_dir, "documents"), bits=_SH_BITS)
    mask = (1 << _SH_BAND_BITS) - 1
    band_arr = F.array(*[
        F.struct(F.lit(b).alias("band"),
                 F.shiftright("simhash", _SH_BAND_BITS * b)
                 .bitwiseAND(F.lit(mask)).alias("val"))
        for b in range(_SH_BANDS)])
    bands = (fp.select("doc_id", F.explode(band_arr).alias("bv"))
             .select("doc_id", F.col("bv.band").alias("band"),
                     F.col("bv.val").alias("val")))
    a = bands.select(F.col("doc_id").alias("id_a"), "band", "val")
    c = bands.select(F.col("doc_id").alias("id_b"), "band", "val")
    cand = (a.join(c, ["band", "val"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b").distinct())
    fa = fp.select(F.col("doc_id").alias("id_a"),
                   F.col("simhash").alias("sh_a"))
    fb = fp.select(F.col("doc_id").alias("id_b"),
                   F.col("simhash").alias("sh_b"))
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (cand.join(fa, "id_a").join(fb, "id_b")
            .filter(ham <= _SH_HAM_MAX)
            .select("id_a", "id_b", ham.cast("int").alias("hamming")))
