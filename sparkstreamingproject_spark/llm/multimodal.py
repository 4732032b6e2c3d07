"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The Spark-side mechanics are real and tested — schema, partitioning,
Arrow batch shape, UDF signatures. The default decode is a STUB
(no image/audio libraries in this container): ``decode_stub_features``
produces a deterministic fake feature vector derived from the bytes, so
the pipeline shape (binary → mapInPandas → feature column) is
exercised end-to-end. Where pillow/soundfile exist, exporting
``SPARK_GRAFT_REAL_DECODE=1`` routes the SAME pipeline through
``decode_real`` (lazy imports; per-media-type dispatch).

Design for 100 TB of media:
- media bytes travel in their own column; metadata queries never touch
  them (column pruning skips the heavy column entirely).
- decode runs in ``mapInPandas`` — Arrow-batched, one Python worker per
  partition, batch size bounded by ``maxRecordsPerBatch`` so a batch of
  4K images fits in worker memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, FloatType, LongType, StructField, StructType,
)

FEATURE_DIM = 8

FEATURE_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("byte_len", LongType()),
    StructField("feature", ArrayType(FloatType())),
])


def attach_payload(df: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Derive an opaque binary payload column + typed metadata (the
    testdata has no real media; UTF-8 bytes stand in — the plumbing is
    identical for JPEG/WAV bytes)."""
    payload = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col(id_col),
        payload.alias("payload"),
        F.lit("text/plain").alias("media_type"),
        F.length(payload).cast("long").alias("byte_len"),
    )


def decode_stub_features(batch: pd.DataFrame) -> pd.DataFrame:
    """STUB decoder: deterministic fake features from the raw bytes.
    A real implementation would decode the media here (PIL/librosa/
    ffmpeg) — same signature, same batch shape.
    """
    feats, lens = [], []
    for payload in batch["payload"]:
        b = bytes(payload) if payload is not None else b""
        lens.append(len(b))
        feats.append(_stub_feature_bytes(b))
    return pd.DataFrame({
        "doc_id": batch["doc_id"],
        "byte_len": pd.Series(lens, dtype="int64"),
        "feature": feats,
    })


#: env flag that routes ``extract_features`` through ``decode_real``
#: (pillow/soundfile) instead of the stub. Off by default — the
#: container ships no codecs; where the libraries exist, set
#: SPARK_GRAFT_REAL_DECODE=1 and the same pipeline decodes real media.
REAL_DECODE_ENV = "SPARK_GRAFT_REAL_DECODE"


def extract_features(media: DataFrame,
                     decoder=None) -> DataFrame:
    """binary → feature vectors via Arrow-batched mapInPandas.

    ``decoder`` defaults to the stub; exporting
    ``SPARK_GRAFT_REAL_DECODE=1`` (read at plan-build time, on the
    driver) selects ``decode_real`` — same signature, same Arrow batch
    shape, so the flag changes ONLY the per-batch kernel."""
    import os
    if decoder is None:
        decoder = (decode_real if os.environ.get(REAL_DECODE_ENV) == "1"
                   else decode_stub_features)
    cols = ["doc_id", "payload"] + (
        ["media_type"] if "media_type" in media.columns else [])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            yield decoder(batch)

    return media.select(*cols).mapInPandas(run, FEATURE_SCHEMA)


def _image_features(data: bytes) -> list[float]:
    """FEATURE_DIM grayscale band means of the decoded image, in
    [0, 1] — the smallest real feature a codec can produce, and easy
    to recompute independently in a test."""
    import io

    import numpy as np
    from PIL import Image

    img = Image.open(io.BytesIO(data)).convert("L")
    px = np.asarray(img, dtype=np.float64)
    bands = np.array_split(px, FEATURE_DIM, axis=0)
    return [float(b.mean() / 255.0) if b.size else 0.0 for b in bands]


def _audio_features(data: bytes) -> list[float]:
    """FEATURE_DIM per-band RMS of the decoded waveform."""
    import io

    import numpy as np
    import soundfile as sf

    wav, _sr = sf.read(io.BytesIO(data), dtype="float64", always_2d=True)
    mono = wav.mean(axis=1)
    bands = np.array_split(mono, FEATURE_DIM)
    return [float(np.sqrt((b * b).mean())) if b.size else 0.0
            for b in bands]


def decode_real(batch: pd.DataFrame) -> pd.DataFrame:
    """Real decoder behind ``REAL_DECODE_ENV`` (VERDICT r07 §next 7):
    pillow for ``image/*`` payloads, soundfile for ``audio/*`` —
    imported lazily so the module (and the default stub path) works in
    codec-less containers. Unknown media types fall back to the stub
    features, keeping mixed-modality batches total. Identical batch
    contract to ``decode_stub_features``: in (doc_id, payload[,
    media_type]), out FEATURE_SCHEMA."""
    mts = (batch["media_type"] if "media_type" in batch.columns
           else pd.Series(["application/octet-stream"] * len(batch)))
    feats, lens = [], []
    for payload, mt in zip(batch["payload"], mts):
        b = bytes(payload) if payload is not None else b""
        lens.append(len(b))
        mt = mt or ""
        if mt.startswith("image/"):
            feats.append(_image_features(b))
        elif mt.startswith("audio/"):
            feats.append(_audio_features(b))
        else:
            feats.append(_stub_feature_bytes(b))
    return pd.DataFrame({
        "doc_id": batch["doc_id"],
        "byte_len": pd.Series(lens, dtype="int64"),
        "feature": feats,
    })


FRAME_BYTES = 40   # stand-in frame size (bytes per "frame" of payload)
FRAME_STRIDE = 4   # sample every 4th frame


def frame_sample_plan(df: DataFrame, id_col: str = "doc_id",
                      frame_bytes: int = FRAME_BYTES,
                      stride: int = FRAME_STRIDE) -> DataFrame:
    """Video-style frame sampling *plan*: from each media payload's
    length, emit the (frame_idx, byte_offset) rows a decoder would
    fetch — every ``stride``-th frame. The plan is pure integer
    arithmetic on metadata (map-only explode; the payload column is
    never read — column pruning drops it), which is exactly how a
    100 TB video corpus schedules decode work without touching bytes:
    the decode itself happens downstream in mapInPandas
    (``decode_stub_features``) only for the planned offsets.
    """
    nf = (F.col("byte_len") / frame_bytes).cast("long")
    idx = F.when(nf > 0,
                 F.sequence(F.lit(0), ((nf - 1) / stride).cast("long"))
                 ).otherwise(F.array().cast("array<long>"))
    return (df.select(F.col(id_col), F.col("byte_len"), nf.alias("n_frames"),
                      F.explode(idx).alias("i"))
            .select(id_col, "n_frames",
                    (F.col("i") * stride).alias("frame_idx"),
                    (F.col("i") * stride * frame_bytes).alias("byte_offset")))


TILE_W = 16  # stand-in tile width (bytes per row-of-tile)
TILE_H = 4   # rows per tile


def image_tile_plan(df: DataFrame, id_col: str = "doc_id",
                    row_bytes: int = TILE_W, rows_per_tile: int = TILE_H
                    ) -> DataFrame:
    """Image-tiling *plan* (ViT-style patch schedule): treat each
    payload as a row_bytes-wide raster and emit one row per
    rows_per_tile×row_bytes tile with its byte extent. Like
    ``frame_sample_plan``, pure integer metadata arithmetic — the
    payload column is pruned from the scan; tiles are fetched/decoded
    downstream only where the plan says. Short tail rows form a final
    partial tile (ceil division), so extents cover every byte exactly
    once.
    """
    n_rows = F.ceil(F.col("byte_len") / row_bytes).cast("long")
    n_tiles = F.ceil(n_rows / rows_per_tile).cast("long")
    idx = F.when(n_tiles > 0, F.sequence(F.lit(0), n_tiles - 1)
                 ).otherwise(F.array().cast("array<long>"))
    tile_bytes = row_bytes * rows_per_tile
    start = F.col("t") * tile_bytes
    return (df.select(F.col(id_col), F.col("byte_len"),
                      n_tiles.alias("n_tiles"), F.explode(idx).alias("t"))
            .select(id_col, "n_tiles", F.col("t").alias("tile_idx"),
                    start.alias("byte_start"),
                    F.least(start + tile_bytes, F.col("byte_len"))
                    .alias("byte_end")))


RESIZE_TARGET = 8  # target max dimension (rows/row-bytes) after resize


def image_resize_plan(df: DataFrame, id_col: str = "doc_id",
                      row_bytes: int = TILE_W,
                      target: int = RESIZE_TARGET) -> DataFrame:
    """Image-resize *plan* (nearest-neighbor): treat each payload as a
    ``row_bytes``-wide raster, compute the aspect-preserving output
    dims for a ``target`` max dimension, and emit one row per OUTPUT
    row with the SOURCE row's byte extent a resizer would fetch. All
    integer metadata arithmetic (floor divisions match DuckDB's ``//``
    exactly) — the payload column is pruned from the scan, and the
    actual pixel work happens downstream in mapInPandas against the
    planned extents (``resize_stub``), which is how a 100 TB image
    corpus schedules resize without reading bytes it will drop.
    """
    src_h = F.ceil(F.col("byte_len") / row_bytes).cast("long")
    m = F.greatest(src_h, F.lit(row_bytes))
    out_h = F.greatest(F.lit(1), F.floor(src_h * target / m).cast("long"))
    out_w = F.greatest(F.lit(1),
                       F.floor(F.lit(row_bytes * target) / m).cast("long"))
    idx = F.when(src_h > 0, F.sequence(F.lit(0), out_h - 1)
                 ).otherwise(F.array().cast("array<long>"))
    d = df.select(F.col(id_col), F.col("byte_len"), src_h.alias("src_h"),
                  out_h.alias("out_h"), out_w.alias("out_w"),
                  F.explode(idx).alias("y"))
    src_row = F.floor(F.col("y") * F.col("src_h") / F.col("out_h")).cast("long")
    return d.select(
        id_col, "out_w", "out_h", F.col("y").alias("out_row"),
        src_row.alias("src_row"),
        (src_row * row_bytes).alias("byte_start"),
        F.least(src_row * row_bytes + row_bytes, F.col("byte_len"))
        .alias("byte_end"))


def resize_stub(media_with_plan: DataFrame) -> DataFrame:
    """STUB resize executor: concatenates each doc's planned source-row
    extents into the 'resized' payload (a real implementation would
    decode + interpolate pixels here — same batch shape, same
    signature). Input: plan rows joined back to the payload column.
    """
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for (doc_id, payload), grp in batch.groupby(["doc_id", "payload"],
                                                        sort=False):
                buf = b"".join(
                    bytes(payload)[int(s):int(e)]
                    for s, e in zip(grp["byte_start"], grp["byte_end"]))
                rows.append((doc_id, buf, len(buf)))
            yield pd.DataFrame(rows,
                               columns=["doc_id", "resized", "resized_len"])

    return media_with_plan.mapInPandas(
        run, "doc_id long, resized binary, resized_len long")


AUDIO_SR = 8          # stand-in "sample rate": bytes per second
AUDIO_WIN_S = 5       # window seconds
AUDIO_HOP_S = 2       # hop seconds


def audio_window_plan(df: DataFrame, id_col: str = "doc_id",
                      sr: int = AUDIO_SR, win_s: int = AUDIO_WIN_S,
                      hop_s: int = AUDIO_HOP_S) -> DataFrame:
    """Audio STFT-style windowing *plan*: overlapping [start, end) byte
    extents at a hop interval — the schedule a feature extractor (MFCC/
    fbank) consumes. Windows start while at least one full hop remains
    in range; the final window truncates at the payload end. Metadata
    only, map-side explode, payload pruned.
    """
    win_b, hop_b = sr * win_s, sr * hop_s
    n_win = F.when(F.col("byte_len") > 0,
                   F.ceil(F.col("byte_len") / hop_b).cast("long")
                   ).otherwise(F.lit(0))
    idx = F.when(n_win > 0, F.sequence(F.lit(0), n_win - 1)
                 ).otherwise(F.array().cast("array<long>"))
    start = F.col("w") * hop_b
    return (df.select(F.col(id_col), F.col("byte_len"),
                      n_win.alias("n_windows"), F.explode(idx).alias("w"))
            .select(id_col, "n_windows", F.col("w").alias("window_idx"),
                    start.alias("byte_start"),
                    F.least(start + win_b, F.col("byte_len"))
                    .alias("byte_end")))


def extract_features_arrow(media: DataFrame) -> DataFrame:
    """`mapInArrow` variant of ``extract_features``: the decode loop
    receives raw ``pyarrow.RecordBatch`` objects — no Arrow→pandas
    conversion at the boundary, which matters when the heavy payload
    column would otherwise be copied into pandas object cells (binary
    columns are the worst case for that copy). Produces byte-identical
    features to the pandas path (pinned by test); a real decoder that
    consumes buffers (libjpeg/ffmpeg via pyarrow buffers) plugs into
    this form with zero-copy access.

    This is the fifth extension surface in the repo's inventory:
    JVM HOFs / mapInPandas / SQL UDTF / Python DataSource / mapInArrow.
    """
    import pyarrow as pa

    def run(batches):
        for rb in batches:
            tbl = pa.table(rb)
            ids = tbl.column("doc_id").to_pylist()
            payloads = tbl.column("payload").to_pylist()
            feats, lens = [], []
            for b in payloads:
                b = b or b""
                lens.append(len(b))
                feats.append(_stub_feature_bytes(b))
            yield pa.record_batch(
                [pa.array(ids, pa.int64()),
                 pa.array(lens, pa.int64()),
                 pa.array(feats, pa.list_(pa.float32()))],
                names=["doc_id", "byte_len", "feature"])

    return media.select("doc_id", "payload").mapInArrow(
        run, FEATURE_SCHEMA)


def _stub_feature_bytes(b: bytes) -> list[float]:
    """The same deterministic stand-in feature as
    ``decode_stub_features`` — the two decode paths must produce
    byte-identical output (pinned by test)."""
    return [float(sum(b[i::FEATURE_DIM]) % 997) for i in range(FEATURE_DIM)]


LANDMARK_MIN_AMP = 100  # peak admission threshold
LANDMARK_FAN = 8        # target-zone width (steps ahead)


def landmark_postings(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """Shazam-style landmark postings (id, lhash) from the
    text-as-waveform stand-in: strict local maxima above
    ``LANDMARK_MIN_AMP`` become peaks; each anchor pairs with every
    peak within ``LANDMARK_FAN`` steps ahead into
    lhash = f1·2^16 + f2·2^8 + Δt. Shared by the batch fingerprint
    query (``queries/llm13.py:multimodal_audio_landmarks``) and the
    streaming catalog-match ingest (``streaming/landmark_ingest``) —
    one definition, one hash space. All integer; a real audio
    pipeline feeds spectrogram-bin peaks from the Arrow decode
    kernel into this same chain."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    sig = (df.filter(F.length(text_col) >= 3)
           .select(id_col, F.posexplode(F.expr(
               f"transform(sequence(1, length({text_col})), "
               f"i -> ascii(substr({text_col}, CAST(i AS INT), 1)))"
           )).alias("i0", "amp"))
           .select(id_col, (F.col("i0") + 1).alias("t"), "amp"))
    w = Window.partitionBy(id_col).orderBy("t")
    pk = (sig.select(id_col, "t", "amp",
                     F.lag("amp").over(w).alias("la"),
                     F.lead("amp").over(w).alias("lb"))
          .filter((F.col("amp") > LANDMARK_MIN_AMP)
                  & F.col("la").isNotNull() & F.col("lb").isNotNull()
                  & (F.col("amp") > F.col("la"))
                  & (F.col("amp") > F.col("lb")))
          .select(id_col, "t", "amp"))
    a, b = pk.alias("a"), pk.alias("b")
    return (a.join(b, (F.col(f"b.{id_col}") == F.col(f"a.{id_col}"))
                   & (F.col("b.t") > F.col("a.t"))
                   & (F.col("b.t") - F.col("a.t") <= LANDMARK_FAN))
            .select(F.col(f"a.{id_col}").alias(id_col),
                    (F.col("a.amp") * 65536 + F.col("b.amp") * 256
                     + (F.col("b.t") - F.col("a.t"))).alias("lhash")))
