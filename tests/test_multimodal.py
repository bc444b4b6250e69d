"""Multimodal column plumbing: binary payloads, metadata projection, and
the (stubbed) decode/featurize stage."""
import numpy as np
import pytest

from dask_relabeling_spark.operators.multimodal import (
    decode_and_featurize, documents_as_media, media_metadata)
from dask_relabeling_spark.plans.relational import t

SF_DIR = "/root/testdata/sf0.001"


def test_media_roundtrip_and_metadata(spark):
    docs = t(spark, SF_DIR, "documents").limit(20)
    media = documents_as_media(docs)
    meta = {r.media_id: r for r in media_metadata(media).collect()}
    for r in docs.collect():
        m = meta[r.doc_id]
        assert m.n_bytes == len(r.text.encode("utf-8"))
        assert m.kind == "image" and m.width == 64


def test_fake_decode_featurize_deterministic(spark):
    docs = t(spark, SF_DIR, "documents").limit(10)
    media = documents_as_media(docs)
    feats = decode_and_featurize(media, decode="fake", feature_dim=8)
    rows = {r.media_id: r for r in feats.collect()}
    for r in docs.collect():
        payload = r.text.encode("utf-8")
        px = np.frombuffer(payload, dtype=np.uint8)
        chunks = np.array_split(px.astype(np.float64), 8)
        expected = [float(np.round(c.mean(), 6)) for c in chunks]
        assert rows[r.doc_id].n_bytes == len(payload)
        assert rows[r.doc_id].feature == expected


def test_real_decode_is_marked_stub(spark):
    docs = t(spark, SF_DIR, "documents").limit(2)
    media = documents_as_media(docs)
    with pytest.raises(Exception) as exc_info:
        decode_and_featurize(media, decode="real").collect()
    assert "NotImplementedError" in str(exc_info.value) or \
        isinstance(exc_info.value, NotImplementedError)


def test_resize_media_fixed_output(spark):
    from dask_relabeling_spark.operators.multimodal import resize_media
    docs = t(spark, SF_DIR, "documents").limit(10)
    media = documents_as_media(docs)
    out = {r.media_id: r for r in
           resize_media(media, out_w=16, out_h=12).collect()}
    src = {r.doc_id: r.text.encode("utf-8") for r in docs.collect()}
    assert set(out) == set(src)
    for mid, r in out.items():
        assert len(bytes(r.payload)) == 16 * 12
        assert (r.meta.width, r.meta.height) == (16, 12)
        # nearest-neighbor replay (declared dims are 64x64)
        px = np.frombuffer(src[mid], dtype=np.uint8)
        img = np.resize(px, (64, 64))
        ys = (np.arange(12) * 64) // 12
        xs = (np.arange(16) * 64) // 16
        assert bytes(r.payload) == img[np.ix_(ys, xs)].tobytes()


def test_sample_frames_fanout(spark):
    from dask_relabeling_spark.operators.multimodal import sample_frames
    import pyspark.sql.functions as F
    docs = t(spark, SF_DIR, "documents").limit(6)
    media = (documents_as_media(docs)
             .withColumn("kind", F.lit("video"))
             .withColumn("meta", F.struct(
                 F.col("meta.width"), F.col("meta.height"),
                 F.col("meta.sample_rate"),
                 F.lit(10).alias("n_frames"))))
    rows = sample_frames(media, every_k=4).collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r.media_id, []).append(r)
    src = {r.doc_id: r.text.encode("utf-8") for r in docs.collect()}
    for mid, frames in by_id.items():
        assert sorted(f.frame_idx for f in frames) == [0, 4, 8]
        step = max(len(src[mid]) // 10, 1)
        for f in frames:
            lo = f.frame_idx * step
            hi = len(src[mid]) if f.frame_idx == 9 else lo + step
            assert bytes(f.frame) == src[mid][lo:hi]
    assert set(by_id) == set(src)


def test_corpus_pure_ascii_for_fake_decode_oracle(spark):
    """multimodal_features' DuckDB oracle maps payload bytes via
    ascii(substr(text, i, 1)) — valid only while utf-8 bytes == code
    points, i.e. the corpus is pure ASCII.  A testdata regeneration
    that introduces multi-byte characters must fail HERE (named
    contract), not as an opaque driver hash mismatch."""
    from pyspark.sql import functions as F
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        d = spark.read.parquet(f"{sf}/documents.parquet")
        bad = d.filter(F.octet_length(F.encode("text", "utf-8"))
                       != F.length("text")).count()
        assert bad == 0, f"non-ASCII text in {sf}"


def test_pnm_codec_roundtrip():
    """encode -> decode is identity for PGM and PPM, including a header
    comment and a non-square raster."""
    import numpy as np
    from dask_relabeling_spark.kernels.codecs import (decode_pnm,
                                                      encode_pgm,
                                                      encode_ppm)
    g = (np.arange(6 * 4, dtype=np.uint8).reshape(6, 4) * 7) % 256
    assert (decode_pnm(encode_pgm(g)) == g).all()
    c = (np.arange(3 * 5 * 3, dtype=np.uint8).reshape(3, 5, 3) * 11) % 256
    assert (decode_pnm(encode_ppm(c)) == c).all()
    # netpbm comments anywhere in the header
    commented = b"P5\n# a comment\n4 2\n# another\n255\n" + bytes(8)
    assert decode_pnm(commented).shape == (2, 4)


def test_pnm_codec_rejects_garbage():
    import pytest as _pytest
    from dask_relabeling_spark.kernels.codecs import decode_pnm
    with _pytest.raises(ValueError):
        decode_pnm(b"JFIF....")            # wrong magic
    with _pytest.raises(ValueError):
        decode_pnm(b"P5\n4 2\n255\n" + bytes(3))   # truncated raster


def test_real_decode_pgm_payloads(spark):
    """decode='real' actually parses the synthesized PGM payloads:
    n_bytes includes the header, and the feature arithmetic runs on
    the decoded raster (byte-checkable against the source text)."""
    import numpy as np
    from dask_relabeling_spark.operators.multimodal import (
        decode_and_featurize, documents_as_pgm_media)
    docs = t(spark, SF_DIR, "documents").limit(3)
    src = {r["doc_id"]: r["text"] for r in docs.collect()}
    media = documents_as_pgm_media(docs)
    feats = {r["media_id"]: r for r in
             decode_and_featurize(media, decode="real").collect()}
    for mid, text in src.items():
        row = feats[mid]
        assert row["n_bytes"] == 13 + 256
        raster = np.frombuffer(
            (text.encode() * (256 // len(text) + 1))[:256], np.uint8)
        expect = float(np.round(raster[:32].astype(float).mean(), 6))
        assert row["feature"][0] == expect


def test_real_resize_pgm_roundtrip(spark):
    """resize decode='real': decode PGM -> nearest-neighbor resample ->
    re-encode PGM; the output payload decodes to the expected pixels."""
    import numpy as np
    from dask_relabeling_spark.kernels.codecs import decode_pnm
    from dask_relabeling_spark.operators.multimodal import (
        documents_as_pgm_media, resize_media)
    docs = t(spark, SF_DIR, "documents").limit(2)
    src = {r["doc_id"]: r["text"] for r in docs.collect()}
    media = documents_as_pgm_media(docs)
    out = {r["media_id"]: r for r in
           resize_media(media, out_w=4, out_h=4,
                        decode="real").collect()}
    for mid, text in src.items():
        img = np.frombuffer(
            (text.encode() * (256 // len(text) + 1))[:256],
            np.uint8).reshape(16, 16)
        ys = (np.arange(4) * 16) // 4
        xs = (np.arange(4) * 16) // 4
        got = decode_pnm(bytes(out[mid]["payload"]))
        assert (got == img[np.ix_(ys, xs)]).all()
        assert out[mid]["meta"]["width"] == 4


def test_wav_codec_roundtrip_and_chunk_walk():
    """encode -> decode is identity; unknown chunks (with odd-size
    padding, per RIFF) are skipped during the walk."""
    import numpy as np
    from dask_relabeling_spark.kernels.codecs import (decode_wav,
                                                      encode_wav_pcm16)
    s = (np.arange(100, dtype=np.int64) * 997 - 40000).astype(np.int16)
    payload = encode_wav_pcm16(s, sample_rate=16000)
    got, rate = decode_wav(payload)
    assert rate == 16000 and (got == s).all()
    # inject an unknown odd-sized chunk between fmt and data
    fmt_end = 12 + 8 + 16
    junk = b"LIST" + (3).to_bytes(4, "little") + b"abc" + b"\x00"
    spliced = payload[:fmt_end] + junk + payload[fmt_end:]
    got2, _ = decode_wav(spliced)
    assert (got2 == s).all()


def test_wav_codec_rejects_non_pcm16_mono():
    import pytest as _pytest
    import numpy as np
    from dask_relabeling_spark.kernels.codecs import (decode_wav,
                                                      encode_wav_pcm16)
    with _pytest.raises(ValueError):
        decode_wav(b"OggS....")
    payload = bytearray(encode_wav_pcm16(np.zeros(4, np.int16)))
    payload[22] = 2                       # channels = 2
    with _pytest.raises(ValueError):
        decode_wav(bytes(payload))


def test_real_decode_wav_payloads(spark):
    """decode='real' walks the RIFF chunks of the synthesized WAVs and
    features run on the true int16 samples."""
    import numpy as np
    from dask_relabeling_spark.operators.multimodal import (
        decode_and_featurize, documents_as_wav_media)
    docs = t(spark, SF_DIR, "documents").limit(3)
    src = {r["doc_id"]: r["text"] for r in docs.collect()}
    media = documents_as_wav_media(docs)
    feats = {r["media_id"]: r for r in
             decode_and_featurize(media, decode="real").collect()}
    for mid, text in src.items():
        row = feats[mid]
        assert row["n_bytes"] == 44 + 256
        raw = (text.encode() * (256 // len(text) + 1))[:256]
        samples = np.frombuffer(raw, "<i2")
        expect = float(np.round(samples[:16].astype(float).mean(), 6))
        assert row["feature"][0] == expect


def test_y4m_codec_roundtrip_and_variants():
    """encode -> decode identity for Cmono; C444 reshapes to
    (n, h, w, 3); frame parameter tags are ignored; subsampled chroma
    rejects."""
    import numpy as np
    import pytest as _pytest
    from dask_relabeling_spark.kernels.codecs import (decode_y4m,
                                                      encode_y4m_mono)
    fr = (np.arange(3 * 4 * 5, dtype=np.int64) * 13 % 256) \
        .astype(np.uint8).reshape(3, 4, 5)
    assert (decode_y4m(encode_y4m_mono(fr)) == fr).all()
    # frame parameter tags after the FRAME marker are legal and skipped
    tagged = encode_y4m_mono(fr).replace(b"FRAME\n", b"FRAME Xtag\n", 1)
    assert (decode_y4m(tagged) == fr).all()
    # C444: 3 full planes -> (n, h, w, 3)
    hdr = b"YUV4MPEG2 W2 H2 F25:1 C444\n"
    body = b"FRAME\n" + bytes(range(12))
    got = decode_y4m(hdr + body)
    assert got.shape == (1, 2, 2, 3)
    with _pytest.raises(ValueError):
        decode_y4m(b"YUV4MPEG2 W2 H2 C420jpeg\nFRAME\n" + bytes(6))


def test_real_sample_frames_y4m(spark):
    """sample_frames decode='real' walks actual container frame
    boundaries: kept frames are the exact luma planes of the
    synthesized stream."""
    from dask_relabeling_spark.operators.multimodal import (
        documents_as_y4m_media, sample_frames)
    docs = t(spark, SF_DIR, "documents").limit(2)
    src = {r["doc_id"]: r["text"] for r in docs.collect()}
    media = documents_as_y4m_media(docs, w=16, h=16, n_frames=8)
    out = {}
    for r in sample_frames(media, every_k=4, decode="real").collect():
        out.setdefault(r["media_id"], {})[r["frame_idx"]] = \
            bytes(r["frame"])
    for mid, text in src.items():
        cycled = (text.encode() * (2048 // len(text) + 1))[:2048]
        assert set(out[mid]) == {0, 4}
        for fi in (0, 4):
            assert out[mid][fi] == cycled[fi * 256:(fi + 1) * 256]


def test_codecs_reject_structurally_invalid_headers():
    """The round-13 corrupt-payload fuzz classes: degenerate headers
    and size-lying chunks must fail LOUDLY, not decode silently
    (kernels/codecs.py hardening; tools/dirty_fuzz.py media arm)."""
    import pytest as _pytest
    import numpy as np
    from dask_relabeling_spark.kernels.codecs import (
        decode_pnm, decode_wav, decode_y4m, encode_wav_pcm16,
        encode_y4m_mono)
    # zero / negative PNM dimensions: previously a silent (0, 0) raster
    with _pytest.raises(ValueError, match="non-positive"):
        decode_pnm(b"P5\n0 0\n255\n")
    with _pytest.raises(ValueError, match="non-positive"):
        decode_pnm(b"P5\n-4 2\n255\n" + bytes(8))
    # truncated RIFF chunk: declared size running past the payload
    # previously decoded to silently fewer samples when int16-aligned
    wav = encode_wav_pcm16(np.zeros(8, np.int16))
    with _pytest.raises(ValueError, match="truncated RIFF chunk"):
        decode_wav(wav[:-4])
    with _pytest.raises(ValueError, match="fmt chunk too short"):
        decode_wav(wav[:12] + b"fmt \x02\x00\x00\x00\x01\x00"
                   + wav[12 + 8 + 16:])
    # zero-dimension Y4M: previously an endless run of empty frames
    y4m = encode_y4m_mono(np.zeros((2, 4, 4), np.uint8))
    with _pytest.raises(ValueError, match="non-positive"):
        decode_y4m(y4m.replace(b" W4 ", b" W0 ", 1))


def test_decode_errors_name_the_offending_media_id(spark):
    """Per-item loud-failure contract (operators/multimodal._loud): a
    corrupt payload's task failure must identify the row — on a real
    corpus an anonymous ValueError from one of a billion items is
    undebuggable."""
    import pytest as _pytest
    from dask_relabeling_spark.operators.multimodal import (
        MEDIA_SCHEMA, decode_and_featurize, resize_media, sample_frames)
    df = spark.createDataFrame(
        [(424242, "image", b"P5\n4 2\n255\n" + bytes(3), None)],
        MEDIA_SCHEMA)
    with _pytest.raises(Exception, match="media_id=424242"):
        decode_and_featurize(df, decode="real").collect()
    with _pytest.raises(Exception, match="media_id=424242"):
        resize_media(df, out_w=2, out_h=2, decode="real").collect()
    vdf = spark.createDataFrame(
        [(424243, "video", b"YUV4MPEG2 W4 H4 Cmono\nFRAMX\n", None)],
        MEDIA_SCHEMA)
    with _pytest.raises(Exception, match="media_id=424243"):
        sample_frames(vdf, every_k=2, decode="real").collect()
