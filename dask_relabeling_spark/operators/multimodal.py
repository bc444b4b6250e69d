"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

Media (image/audio/video) ride Spark as ``BinaryType`` columns next to a
metadata struct; decode / feature-extract / resize / frame-sample are
Arrow-batched ``mapInPandas`` stages.  Decode modes:

* ``decode='fake'`` — deterministic synthetic decode from the payload
  bytes (exercises schema, batching, partitioning end-to-end);
* ``decode='real'`` — an ACTUAL decode for the formats a pure-NumPy
  codec can handle: binary PGM/PPM payloads (``P5``/``P6`` magic)
  decode for real via ``kernels/codecs.py``; any other magic raises
  ``NotImplementedError`` at the clearly marked PIL/ffmpeg integration
  point (those libraries are not available in this environment).

Scale: payload bytes never leave the executor (no collect); per-batch
memory is bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``; the
decode stage is a narrow map that pipelines with the scan.
"""
from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),       # image|audio|video
    T.StructField("payload", T.BinaryType(), False),    # opaque encoded bytes
    T.StructField("meta", T.StructType([
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
    ]), True),
])

def _loud(media_id, fn):
    """Per-item loud-failure contract: run ``fn()`` and re-raise any
    decode error with the offending ``media_id`` prepended.  On a 100 TB
    corpus a corrupt payload kills its task; an anonymous
    ``ValueError("truncated PNM raster")`` from one of a billion items
    is undebuggable — the id makes the failure actionable (mirrors the
    reference's per-chunk failure posture, where chunkops kernels
    propagate exceptions with the chunk's coordinates attached)."""
    try:
        return fn()
    except Exception as exc:  # noqa: BLE001 — context, then re-raise
        msg = f"media_id={media_id}: {exc}"
        # Construct the contextualized twin FIRST, raise it outside the
        # fallback: raising type(exc)(msg) inside the try let a decode
        # error that was itself a TypeError get caught by its own
        # constructor fallback and come out retyped as ValueError — the
        # fallback must fire only when the constructor rejects a single
        # message arg (multi-arg exception classes).
        try:
            new = type(exc)(msg)
        except TypeError:
            new = ValueError(msg)
        raise new from exc


FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),
    T.StructField("n_bytes", T.IntegerType(), False),
    T.StructField("feature", T.ArrayType(T.DoubleType(), False), False),
])


# The synthesized-payload substrate: every adapter below slices text
# by CHARACTER (substring/repeat/ascii are code-point functions on
# both engines) but emits BYTES (encode utf-8), so the "raster is
# exactly w*h bytes, every byte SQL-replayable via ascii(substr(...))"
# contract only holds when 1 char == 1 byte.  Projecting each
# non-printable-ASCII code point to '?' (length-preserving on both
# engines: one code point -> one char, incl. astral emoji and
# combining marks) makes the adapters total over ANY unicode corpus —
# a multibyte document used to emit an oversized raster whose bytes
# matched neither the oracle's ascii() replay nor, for Y4M, the
# codec's frame-size check (found by the unicode profile of
# tools/null_parity_sweep.py).  Real corpora carry real media bytes;
# this projection only defines the SANDBOX substrate, and does so
# identically in Spark (java.util.regex) and DuckDB (RE2): both treat
# [^\\x20-\\x7E] as a per-code-point class.
_NON_ASCII = "[^\\x20-\\x7E]"


def _ascii_substrate(df: DataFrame) -> DataFrame:
    return df.withColumn(
        "text", F.regexp_replace(F.col("text"), _NON_ASCII, "?"))


def documents_as_media(df: DataFrame) -> DataFrame:
    """Adapter: treat document text bytes as an opaque media payload —
    gives the media pipeline a deterministic substrate in this container.

    NULL text is excluded (a failed scrape has no payload): the media
    contract is payload NOT NULL — the real-codec adapters below
    already enforce it via their ``length(text) > 0`` cycling guard,
    and without it here a single NULL document crashes the whole
    ``decode_and_featurize`` stage (``bytes(None)``) instead of being
    skipped — found by tools/null_parity_sweep.py."""
    df = _ascii_substrate(df)
    return df.filter(F.col("text").isNotNull()).select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(F.lit(64).alias("width"), F.lit(64).alias("height"),
                 F.lit(None).cast("int").alias("sample_rate"),
                 F.lit(None).cast("int").alias("n_frames")).alias("meta"),
    )


def documents_as_pgm_media(df: DataFrame, w: int = 16, h: int = 16
                           ) -> DataFrame:
    """Synthesize REAL binary PGM (``P5``) payloads from document text:
    the raster is the text's bytes cycled to ``w*h`` after a standard
    netpbm header — so ``decode='real'`` exercises an actual format
    parse, while every raster byte stays SQL-replayable
    (``ascii(substr(text, ((i-1) % len)+1, 1))``).  Header and raster
    are concatenated JVM-side (one narrow projection, no Python)."""
    df = _ascii_substrate(df)
    n = w * h
    cycled = F.expr(
        f"substring(repeat(text, CAST(ceil({n} / length(text)) AS INT)),"
        f" 1, {n})")
    header = F.lit(f"P5\n{w} {h}\n255\n".encode())
    return df.filter(F.length("text") > 0).select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.concat(header, F.encode(cycled, "utf-8")).alias("payload"),
        F.struct(F.lit(w).alias("width"), F.lit(h).alias("height"),
                 F.lit(None).cast("int").alias("sample_rate"),
                 F.lit(None).cast("int").alias("n_frames")).alias("meta"))


def documents_as_wav_media(df: DataFrame, n_samples: int = 128,
                           sample_rate: int = 8000) -> DataFrame:
    """Synthesize REAL mono PCM-16 WAV payloads from document text:
    the data chunk is the text's bytes cycled to ``2*n_samples``
    (little-endian int16 sample i = byte(2i) + 256*byte(2i+1), signed)
    after a standard 44-byte RIFF header — ``decode='real'`` exercises
    an actual RIFF chunk walk while every sample stays SQL-replayable.
    Header and data are concatenated JVM-side (narrow projection)."""
    from ..kernels.codecs import encode_wav_pcm16
    df = _ascii_substrate(df)
    n = 2 * n_samples
    # fixed data length -> the whole header is one constant byte string
    header = encode_wav_pcm16(np.zeros(n_samples, dtype=np.int16),
                              sample_rate)[:44]
    cycled = F.expr(
        f"substring(repeat(text, CAST(ceil({n} / length(text)) AS INT)),"
        f" 1, {n})")
    return df.filter(F.length("text") > 0).select(
        F.col("doc_id").alias("media_id"),
        F.lit("audio").alias("kind"),
        F.concat(F.lit(header), F.encode(cycled, "utf-8")).alias("payload"),
        F.struct(F.lit(None).cast("int").alias("width"),
                 F.lit(None).cast("int").alias("height"),
                 F.lit(sample_rate).alias("sample_rate"),
                 F.lit(None).cast("int").alias("n_frames")).alias("meta"))


def documents_as_y4m_media(df: DataFrame, w: int = 16, h: int = 16,
                           n_frames: int = 8) -> DataFrame:
    """Synthesize REAL YUV4MPEG2 (Cmono) payloads from document text:
    frame ``fi``'s luma plane is bytes ``fi*w*h .. (fi+1)*w*h`` of the
    text cycled to ``n_frames*w*h`` — so ``decode='real'`` exercises an
    actual multi-frame container parse while every frame byte stays
    SQL-replayable.  Built JVM-side as one concat (header + FRAME
    markers + raster slices), no Python."""
    df = _ascii_substrate(df)
    fsz = w * h
    total = n_frames * fsz
    header = F.lit(f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 Cmono\n".encode())
    cycled = F.expr(
        f"substring(repeat(text, CAST(ceil({total} / length(text)) "
        f"AS INT)), 1, {total})")
    parts = [header]
    for fi in range(n_frames):
        parts.append(F.lit(b"FRAME\n"))
        parts.append(F.encode(
            F.substring(cycled, fi * fsz + 1, fsz), "utf-8"))
    return df.filter(F.length("text") > 0).select(
        F.col("doc_id").alias("media_id"),
        F.lit("video").alias("kind"),
        F.concat(*parts).alias("payload"),
        F.struct(F.lit(w).alias("width"), F.lit(h).alias("height"),
                 F.lit(None).cast("int").alias("sample_rate"),
                 F.lit(n_frames).alias("n_frames")).alias("meta"))


def decode_and_featurize(df: DataFrame, decode: str = "fake",
                         feature_dim: int = 8) -> DataFrame:
    """Decode payloads and emit a fixed-width feature vector per item.

    ``decode='real'`` decodes PGM/PPM payloads with the pure-NumPy
    netpbm codec (feature arithmetic then runs on the true raster);
    other formats raise at the PIL/torchaudio/ffmpeg integration
    point.  ``decode='fake'`` derives the "pixels" deterministically
    from the payload bytes, so every downstream contract (schema,
    batch shape, feature arithmetic) is exercised for real.
    """
    if decode not in ("fake", "real"):
        raise ValueError(decode)
    from ..kernels.codecs import decode_pnm, decode_wav

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for media_id, kind, payload in zip(
                    pdf["media_id"], pdf["kind"], pdf["payload"]):
                if payload is None:
                    # adapter contract violated — fail with the id
                    # instead of an anonymous bytes(None) TypeError
                    raise ValueError(
                        f"NULL payload for media_id={media_id}: media "
                        "adapters exclude payload-less rows; filter "
                        "payload IS NOT NULL upstream")
                payload = bytes(payload)
                if decode == "real":
                    def _decode(payload=payload):
                        if payload[:2] in (b"P5", b"P6"):
                            return decode_pnm(payload).ravel()
                        if payload[:4] == b"RIFF":
                            return decode_wav(payload)[0]
                        raise NotImplementedError(
                            "only PGM/PPM/PCM-WAV decode without "
                            "external codecs; plug PIL/ffmpeg here for "
                            f"{payload[:4]!r}")
                    px = _loud(media_id, _decode)
                else:
                    # deterministic fake decode: bytes -> uint8 "pixels"
                    px = np.frombuffer(payload, dtype=np.uint8)
                if len(px) == 0:
                    px = np.zeros(1, dtype=np.uint8)
                # bucket-mean feature: split pixels into feature_dim chunks
                chunks = np.array_split(px.astype(np.float64), feature_dim)
                feat = [float(np.round(c.mean(), 6)) if len(c) else 0.0
                        for c in chunks]
                recs.append({"media_id": int(media_id),
                             "kind": kind,
                             "n_bytes": len(payload),
                             "feature": feat})
            yield pd.DataFrame.from_records(
                recs, columns=["media_id", "kind", "n_bytes", "feature"])

    return df.mapInPandas(gen, FEATURE_SCHEMA)


def media_metadata(df: DataFrame) -> DataFrame:
    """Pure-SQL metadata projection (no decode): byte sizes per item —
    pushdown-friendly (only payload length and key columns are read)."""
    return df.select(
        "media_id", "kind",
        F.octet_length("payload").alias("n_bytes"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
    )


RESIZED_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),
    T.StructField("payload", T.BinaryType(), False),
    T.StructField("meta", MEDIA_SCHEMA["meta"].dataType, True),
])

FRAME_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("frame_idx", T.IntegerType(), False),
    T.StructField("frame", T.BinaryType(), False),
])


def resize_media(df: DataFrame, out_w: int = 16, out_h: int = 16,
                 decode: str = "fake") -> DataFrame:
    """Resize stage: decode -> resample to (out_w, out_h) -> re-encode,
    meta updated to the new dimensions.  Narrow ``mapInPandas`` that
    pipelines with the scan; output payloads are fixed-size so the
    downstream batch memory footprint is exactly predictable.

    ``decode='real'`` decodes PGM/PPM payloads for real (pure-NumPy
    netpbm codec), nearest-neighbor-resamples the true raster, and
    re-encodes PGM/PPM; other magics raise at the PIL/cv2 integration
    point.  ``decode='fake'`` treats the payload as a row-major uint8
    image of ``meta.width x meta.height`` (padded/truncated), resampled
    by nearest-neighbor index arithmetic — deterministic, so the
    contract is testable end-to-end.
    """
    if decode not in ("fake", "real"):
        raise ValueError(decode)
    from ..kernels.codecs import decode_pnm, encode_pgm, encode_ppm

    def gen(batches):
        for pdf in batches:
            recs = []
            for media_id, kind, raw, meta in zip(
                    pdf["media_id"], pdf["kind"], pdf["payload"],
                    pdf["meta"]):
                # meta is a NULLABLE struct (MEDIA_SCHEMA): a row
                # without metadata is legal — the real path reads dims
                # from the payload itself, the fake path falls back to
                # its defaults (round-13 corrupt-payload fuzz: a NULL
                # meta crashed the whole batch with an anonymous
                # 'NoneType' TypeError)
                meta = meta if meta is not None else {}
                if decode == "real":
                    payload = bytes(raw)

                    def _decode(payload=payload):
                        if payload[:2] not in (b"P5", b"P6"):
                            raise NotImplementedError(
                                "only PGM/PPM resize without external "
                                "codecs; plug PIL/cv2 here for "
                                f"{payload[:2]!r}")
                        return decode_pnm(payload)
                    img = _loud(media_id, _decode)
                    h, w = img.shape[:2]
                    ys = (np.arange(out_h) * h) // out_h
                    xs = (np.arange(out_w) * w) // out_w
                    out = img[np.ix_(ys, xs)]
                    out_payload = (encode_pgm(out) if out.ndim == 2
                                   else encode_ppm(out))
                else:
                    w = int(meta.get("width") or 8)
                    h = int(meta.get("height") or 8)
                    px = np.frombuffer(bytes(raw), dtype=np.uint8)
                    img = np.resize(px, (h, w))  # pad/cycle to dims
                    ys = (np.arange(out_h) * h) // out_h
                    xs = (np.arange(out_w) * w) // out_w
                    out_payload = img[np.ix_(ys, xs)].tobytes()
                recs.append({
                    "media_id": int(media_id), "kind": kind,
                    "payload": out_payload,
                    "meta": {"width": out_w, "height": out_h,
                             "sample_rate": meta.get("sample_rate"),
                             "n_frames": meta.get("n_frames")}})
            yield pd.DataFrame.from_records(
                recs, columns=["media_id", "kind", "payload", "meta"])

    return df.mapInPandas(gen, RESIZED_SCHEMA)


def sample_frames(df: DataFrame, every_k: int = 4,
                  decode: str = "fake") -> DataFrame:
    """Frame sampling: one output row per kept frame (every ``every_k``-th,
    always including frame 0).  The fan-out ``mapInPandas`` shape of a
    video pipeline — per-item output count is n_frames/k, payload bytes
    stay executor-side throughout.

    ``decode='real'`` parses YUV4MPEG2 payloads with the pure-NumPy
    Y4M codec — frames come from ACTUAL container frame boundaries,
    and ``meta.n_frames`` is ignored in favor of the container's own
    count; other magics raise at the ffmpeg/pyav integration point.
    The fake substrate splits the payload into ``meta.n_frames`` equal
    byte slices (last frame keeps the remainder).
    """
    if decode not in ("fake", "real"):
        raise ValueError(decode)
    from ..kernels.codecs import decode_y4m

    def gen(batches):
        for pdf in batches:
            recs = []
            for media_id, raw, meta in zip(
                    pdf["media_id"], pdf["payload"], pdf["meta"]):
                # NULL meta struct is legal (MEDIA_SCHEMA) — same guard
                # as resize_media; without it the fake path's
                # meta.get('n_frames') kills the whole batch with an
                # anonymous 'NoneType' AttributeError
                meta = meta if meta is not None else {}
                payload = bytes(raw)
                if decode == "real":
                    def _decode(payload=payload):
                        if not payload.startswith(b"YUV4MPEG2"):
                            raise NotImplementedError(
                                "only YUV4MPEG2 frame extraction "
                                "without external codecs; plug "
                                f"ffmpeg/pyav here for {payload[:4]!r}")
                        return decode_y4m(payload)
                    frames = _loud(media_id, _decode)
                    for fi in range(0, len(frames), every_k):
                        recs.append({"media_id": int(media_id),
                                     "frame_idx": fi,
                                     "frame": frames[fi].tobytes()})
                    continue
                n = int(meta.get("n_frames") or 1)
                n = max(n, 1)
                step = max(len(payload) // n, 1)
                for fi in range(0, n, every_k):
                    lo = fi * step
                    hi = len(payload) if fi == n - 1 else (fi + 1) * step
                    recs.append({"media_id": int(media_id),
                                 "frame_idx": fi,
                                 "frame": payload[lo:hi]})
            yield pd.DataFrame.from_records(
                recs, columns=["media_id", "frame_idx", "frame"])

    return df.mapInPandas(gen, FRAME_SCHEMA)
