"""Property-based spot checks (SURVEY.md §5.4) with hypothesis."""

from __future__ import annotations

import json

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from sparkstreamingproject_spark.operators.flatten import (
    explode_displays, pack_json, parse_log_envelope,
)
from sparkstreamingproject_spark.schemas import LOG_ENVELOPE_SCHEMA

word = st.text(alphabet="abcdefghij", min_size=1, max_size=8)


@st.composite
def envelope(draw):
    n_disp = draw(st.integers(0, 4))
    has_page = draw(st.booleans())
    return {
        "common": {k: draw(word) for k in
                   ["ar", "ba", "ch", "is_new", "md", "mid", "os", "uid", "vc"]},
        "page": ({"during_time": draw(st.integers(0, 10**6)),
                  "item": draw(word), "item_type": draw(word),
                  "last_page_id": draw(st.none() | word),
                  "page_id": draw(word), "source_type": draw(st.none() | word)}
                 if has_page else None),
        "displays": ([{"display_type": draw(word), "item": draw(word),
                       "item_type": draw(word), "order": str(i),
                       "pos_id": draw(word)} for i in range(n_disp)]
                     if has_page and n_disp else None),
        "actions": None,
        "start": None,
        "err": draw(st.none() | st.just('{"code":1}')),
        "ts": draw(st.integers(10**12, 2 * 10**12)),
    }


@settings(max_examples=10, deadline=None)
@given(st.lists(envelope(), min_size=1, max_size=8))
def test_roundtrip_and_explode_invariant(spark, rows):
    env = spark.createDataFrame(rows, LOG_ENVELOPE_SCHEMA)
    # to_json ∘ from_json = id on the envelope's parsed fields
    packed = env.select(F.to_json(F.struct(*env.columns)).alias("value"))
    reparsed = parse_log_envelope(packed)
    assert reparsed.count() == env.count()
    orig_mids = sorted(r["mid"] for r in env.select("common.mid").collect())
    rt_mids = sorted(r["mid"] for r in reparsed.select("common.mid").collect())
    assert orig_mids == rt_mids
    # explode child count == sum of array sizes over non-err
    # page-bearing rows (err routes exclusively to the error stream)
    expected = sum(len(r["displays"] or [])
                   for r in rows
                   if r["page"] is not None and r["err"] is None)
    assert explode_displays(env).count() == expected
    # pack_json emits one JSON line per input row
    assert pack_json(env.select("ts", "err")).count() == len(rows)


@settings(max_examples=10, deadline=None)
@given(
    events=st.lists(st.tuples(st.integers(0, 3), st.integers(0, 200)),
                    min_size=1, max_size=25),
    cuts=st.lists(st.integers(0, 200), min_size=0, max_size=2),
)
def test_sessionize_fold_matches_pure_python(spark, tmp_path_factory,
                                             events, cuts):
    """Property: folding ANY time-ordered chunking of ANY event set
    through the incremental sessionize state equals an independent
    pure-Python gaps-and-islands sessionizer (strict-gap rule) —
    not just the fixed examples the unit tests pin. Chunks are split
    on global event-time cuts (the module's per-user ordering
    contract); empty chunks are legal micro-batches."""
    from sparkstreamingproject_spark.streaming.manifest_commit import (
        read_state)
    from sparkstreamingproject_spark.streaming.sessionize_maintain import (
        GAP_US, merge_sessions, session_summary)

    MIN = 60_000_000
    gap_min = GAP_US // MIN
    state = str(tmp_path_factory.mktemp("sess_prop") / "state")
    schema = "user_id long, event_id long, us long"
    rows = [(u, i, m * MIN) for i, (u, m) in enumerate(events)]

    bounds = sorted(set(cuts))
    chunks = []
    lo = None
    for b in bounds + [None]:
        chunks.append([r for r in rows
                       if (lo is None or r[2] >= lo * MIN)
                       and (b is None or r[2] < b * MIN)])
        lo = b
    assert sum(len(c) for c in chunks) == len(rows)
    for c in chunks:
        merge_sessions(spark.createDataFrame(c, schema), state)

    got = {r.user_id: (r.n_sessions, r.n_events, r.max_session_events)
           for r in session_summary(
               read_state(spark, state)).collect()}

    exp = {}
    for u in {u for u, _ in events}:
        times = sorted(m for uu, m in events if uu == u)
        counts = [1]
        for prev, cur in zip(times, times[1:]):
            if cur - prev > gap_min:
                counts.append(1)
            else:
                counts[-1] += 1
        exp[u] = (len(counts), sum(counts), max(counts))
    assert got == exp


@settings(max_examples=8, deadline=None)
@given(
    vals=st.lists(st.tuples(st.sampled_from(["a", "b", "c"]),
                            st.integers(1, 50)),
                  min_size=1, max_size=12),
    cuts=st.lists(st.integers(0, 11), min_size=0, max_size=3),
    crash_round=st.integers(0, 3),
)
def test_manifest_fold_random_chunks_and_crashes_converge(
        spark, tmp_path_factory, vals, cuts, crash_round):
    """Property: folding ANY chunking of ANY value set through the
    manifest-committed rollup, with a crash injected at ANY commit
    point (manifest rename dies, batch replays — exactly the engine's
    at-least-once contract), converges to the crash-free batch answer.
    Generalizes the fixed-point crash drills the same way the
    sessionize property generalizes its unit tests."""
    from sparkstreamingproject_spark.streaming import manifest_commit
    from sparkstreamingproject_spark.streaming.manifest_commit import (
        manifest_foreach_batch, read_state)
    from sparkstreamingproject_spark.streaming.rollup_maintain import (
        merge_rollup)

    sch = "o_orderdate string, o_totalprice double"
    rows = [(f"1995-01-{ord(d) - 96:02d}", float(v)) for d, v in vals]
    bounds = sorted({c for c in cuts if c < len(rows)})
    chunks, lo = [], 0
    for b in bounds + [len(rows)]:
        chunks.append(rows[lo:b])
        lo = b
    chunks = [c for c in chunks if c] or [rows]

    table = str(tmp_path_factory.mktemp("mprop") / "rollup")
    fold = manifest_foreach_batch(
        lambda df, i: merge_rollup(df, table, batch_id=i), table)
    # patch by hand (not the monkeypatch fixture — function-scoped
    # fixtures don't reset between hypothesis examples)
    real_replace = manifest_commit.os.replace
    try:
        for i, chunk in enumerate(chunks):
            df = spark.createDataFrame(chunk, sch)
            if i == crash_round % len(chunks):
                def crashing(src, dst):
                    raise OSError("property crash")
                manifest_commit.os.replace = crashing
                try:
                    fold(df, i)
                except OSError:
                    pass
                manifest_commit.os.replace = real_replace
            fold(df, i)  # the engine's replay (or first delivery)
    finally:
        manifest_commit.os.replace = real_replace

    got = {str(r.day): (r.cents, r.n)
           for r in read_state(spark, table).collect()}
    exp: dict[str, tuple[int, int]] = {}
    for day, v in rows:
        cents, n = exp.get(day, (0, 0))
        exp[day] = (cents + round(v * 100), n + 1)
    assert got == exp


_CDC_TABLES = ["order_info", "user_info", "base_province"]


def _cdc_expected(chunks, facts_cfg, dims_cfg):
    """Pure-Python oracle of the committed CDC view after folding
    ``chunks``: the router's semantics re-derived independently —
    Maxwell I/U mapping (delete/ddl drop), dynamic topic
    ``UPPER(table)_op`` with the batch id attached, per-dim-table
    last-write-wins on the version column ts."""
    op_map = {"insert": "I", "bootstrap-insert": "I", "update": "U"}
    facts, dims = [], {}
    for bid, chunk in enumerate(chunks):
        for r in chunk:
            op = op_map.get(r["type"])
            if op is None:
                continue
            payload = tuple(sorted(r["data"].items()))
            if r["table"] in facts_cfg:
                facts.append((f"{r['table'].upper()}_{op}", payload, bid))
            if r["table"] in dims_cfg:
                per = dims.setdefault(r["table"], {})
                k = r["data"]["id"]
                if k not in per or r["ts"] > per[k][0]:
                    per[k] = (r["ts"], payload)
    return (sorted(facts),
            {t: {k: v for k, (_, v) in per.items()}
             for t, per in dims.items() if per})


def _cdc_observed(spark, out, dims_cfg):
    """The committed CDC view through the real readers, normalized to
    the oracle's shape (JSON payloads parsed — map key order is a
    serialization detail, not a semantic one)."""
    from sparkstreamingproject_spark.streaming.manifest_commit import (
        read_cdc_dim, read_cdc_facts)
    facts = sorted(
        (r.topic, tuple(sorted(json.loads(r.value).items())), r.batch_id)
        for r in read_cdc_facts(spark, out).collect())
    dims = {}
    for t in dims_cfg:
        snap = read_cdc_dim(spark, out, t)
        if snap is None:
            continue
        got = {r.id: tuple(sorted(json.loads(r.value).items()))
               for r in snap.collect()}
        if got:
            dims[t] = got
    return facts, dims


@settings(max_examples=6, deadline=None)
@given(
    rows=st.lists(st.tuples(st.sampled_from(_CDC_TABLES),
                            st.integers(1, 6),
                            st.sampled_from(["insert", "update",
                                             "bootstrap-insert", "delete",
                                             "ddl"]),
                            st.integers(1, 99)),
                  min_size=1, max_size=18),
    cuts=st.lists(st.integers(0, 17), min_size=0, max_size=3),
    fact_mask=st.integers(0, 7),
    crash_batch=st.integers(0, 3),
)
def test_cdc_commit_random_interleavings_and_crashes_converge(
        spark, tmp_path_factory, rows, cuts, fact_mask, crash_batch):
    """Property over the multi-directory CDC commit (VERDICT r13 §next
    4, generalizing the deterministic every-commit-point sweep): ANY
    fact/dim interleaving, ANY routing-config split, ANY chunking, with
    the manifest rename crashed at ANY batch — the crash window is
    reader-INVISIBLE (committed view == pure-Python oracle of the
    batches before it) and the engine's replay CONVERGES to the oracle
    of the full row set."""
    from sparkstreamingproject_spark.schemas import CDC_ENVELOPE_SCHEMA
    from sparkstreamingproject_spark.streaming import manifest_commit
    from sparkstreamingproject_spark.streaming.cdc_router import (
        route_cdc_batch)
    from sparkstreamingproject_spark.streaming.manifest_commit import (
        cdc_foreach_batch, cdc_manifest_info)

    facts_cfg = [t for i, t in enumerate(_CDC_TABLES) if fact_mask >> i & 1]
    dims_cfg = [t for t in _CDC_TABLES if t not in facts_cfg]
    base = tmp_path_factory.mktemp("cdcprop")
    cfg = base / "routing.json"
    cfg.write_text(json.dumps({"fact_tables": facts_cfg,
                               "dim_tables": dims_cfg}))

    env = [{"database": "gmall", "table": t, "type": op,
            "ts": 1_600_000_000 + i,
            "data": {"id": str(k), "name": f"r{i}", "amount": str(v)}}
           for i, (t, k, op, v) in enumerate(rows)]
    bounds = sorted({c for c in cuts if c < len(env)})
    chunks, lo = [], 0
    for b in bounds + [len(env)]:
        chunks.append(env[lo:b])
        lo = b
    chunks = [c for c in chunks if c] or [env]

    out = str(base / "routed")
    fold = cdc_foreach_batch(
        lambda b, i: route_cdc_batch(b, i, out, str(cfg)), root=out)
    crash_at = crash_batch % len(chunks)
    real_replace = manifest_commit.os.replace
    try:
        for i, chunk in enumerate(chunks):
            df = spark.createDataFrame(chunk, CDC_ENVELOPE_SCHEMA)
            if i == crash_at:
                def crashing(src, dst):
                    raise OSError("property crash")
                manifest_commit.os.replace = crashing
                try:
                    fold(df, i)
                except OSError:
                    pass
                manifest_commit.os.replace = real_replace
                # in-window invisibility: the crashed batch's staging
                # dirs are on disk but the committed view is exactly
                # the pre-crash oracle, watermark included
                assert cdc_manifest_info(out)["batch_id"] == i - 1
                assert _cdc_observed(spark, out, dims_cfg) == \
                    _cdc_expected(chunks[:i], facts_cfg, dims_cfg)
            fold(df, i)  # the engine's replay (or first delivery)
    finally:
        manifest_commit.os.replace = real_replace

    assert _cdc_observed(spark, out, dims_cfg) == \
        _cdc_expected(chunks, facts_cfg, dims_cfg)


@settings(max_examples=6, deadline=None)
@given(
    texts=st.lists(st.lists(st.sampled_from(["aa", "bb", "cc", "dd"]),
                            min_size=1, max_size=9),
                   min_size=1, max_size=10),
    assign=st.lists(st.integers(0, 2), min_size=10, max_size=10),
)
def test_paragraph_fold_out_of_order_is_valid_dedup(
        spark, tmp_path_factory, texts, assign):
    """Property for fold #16's docstring claim: OUT-OF-ORDER ingest
    (docs scattered across batches with no doc_id ordering) still
    yields a VALID first-seen dedup — every distinct chunk survives in
    EXACTLY one (doc_id, cidx) position, per-doc chunk totals match
    the chunking, each survivor is genuinely that document's chunk at
    that position, and reconstruction concatenates survivors in
    position order. Only WHICH copy survives may differ from the
    batch keep-first rule (that equality is the ordered-ingest
    drill)."""
    from sparkstreamingproject_spark.streaming.paragraph_maintain import (
        fold_paragraphs, paragraph_dedup_from_state)

    W = 3
    docs = [(i, " ".join(ws)) for i, ws in enumerate(texts)]
    chunks = {}  # (doc_id, cidx) -> chunk string (pure-python oracle)
    for i, ws in enumerate(texts):
        for c in range((len(ws) + W - 1) // W):
            chunks[(i, c)] = " ".join(ws[c * W:(c + 1) * W])

    st_dir = str(tmp_path_factory.mktemp("para_ooo") / "state")
    batches = [[d for j, d in enumerate(docs) if assign[j] == b]
               for b in range(3)]
    batches = [c for c in batches if c] or [docs]
    for i, chunk in enumerate(batches):
        fold_paragraphs(
            spark.createDataFrame(chunk, "doc_id long, text string"),
            st_dir, w=W, batch_id=i)

    rows = paragraph_dedup_from_state(spark, st_dir).collect()
    assert {r.doc_id for r in rows} == {d for d, _ in docs}
    surv = spark.read.parquet(f"{st_dir}/chunks").collect()
    # one survivor per distinct chunk content, and the full content set
    by_content = {}
    for r in surv:
        by_content.setdefault(r.chunk, []).append((r.doc_id, r.cidx))
    assert all(len(v) == 1 for v in by_content.values()), by_content
    assert set(by_content) == set(chunks.values())
    # every survivor is that document's chunk at that position
    for chunk_text, [(d, c)] in by_content.items():
        assert chunks[(d, c)] == chunk_text
    # totals + reconstruction in position order
    surv_by_doc = {}
    for r in surv:
        surv_by_doc.setdefault(r.doc_id, []).append((r.cidx, r.chunk))
    for r in rows:
        n_chunks = len([1 for (d, _) in chunks if d == r.doc_id])
        assert r.n_chunks == n_chunks
        mine = sorted(surv_by_doc.get(r.doc_id, []))
        assert r.n_kept == len(mine)
        assert r.dedup_text == " ".join(c for _, c in mine)
