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
