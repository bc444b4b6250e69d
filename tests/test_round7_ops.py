"""Round-7 operator tests: the blocked fuzzy-match value path (driven
with synthetic near-duplicates, since the TPC-H-ish part names only
exercise it sparsely) and the real-codec resize round-trip."""
import numpy as np
from pyspark.sql import functions as F

from dask_relabeling_spark.kernels.codecs import decode_pnm, encode_pgm
from dask_relabeling_spark.operators.multimodal import resize_media


def _fuzzy_pairs(spark, names):
    """The exact blocked-join shape of ``parts_fuzzy_name_pairs``
    (plans/llm.py): block on first letter + length window 3, verify
    levenshtein <= 3 inside blocks."""
    df = spark.createDataFrame([(n,) for n in names], "p_name string")
    names_df = (df.select("p_name").distinct()
                .select("p_name", F.length("p_name").alias("ln"),
                        F.substring("p_name", 1, 1).alias("blk")))
    a, b = names_df.alias("a"), names_df.alias("b")
    lev = F.levenshtein(F.col("a.p_name"), F.col("b.p_name"))
    return (a.join(b, (F.col("a.blk") == F.col("b.blk")) &
                   (F.abs(F.col("a.ln") - F.col("b.ln")) <= 3) &
                   (F.col("a.p_name") < F.col("b.p_name")))
            .filter(lev <= 3)
            .select(F.col("a.p_name").alias("name_a"),
                    F.col("b.p_name").alias("name_b"),
                    lev.cast("int").alias("dist")))


def test_fuzzy_pairs_hit_and_distance(spark):
    """In-block near-duplicates within the distance threshold are
    emitted with the right edit distance."""
    rows = _fuzzy_pairs(spark, [
        "red widget", "red wodget",          # dist 1, same block
        "small gizmo", "small gizmos",       # dist 1, same block
        "blue bolt", "blue boltzzz",         # dist 3, same block
    ]).collect()
    got = {(r.name_a, r.name_b): r.dist for r in rows}
    assert got == {
        ("red widget", "red wodget"): 1,
        ("small gizmo", "small gizmos"): 1,
        ("blue bolt", "blue boltzzz"): 3,
    }


def test_fuzzy_pairs_cross_block_miss(spark):
    """A distance-1 pair in different first-letter blocks is NOT
    emitted — the documented blocking recall trade."""
    rows = _fuzzy_pairs(spark, ["hot gear", "not gear"]).collect()
    assert rows == []


def test_fuzzy_pairs_length_window_miss(spark):
    """Same block but lengths differing by more than the window is
    pruned before the levenshtein verify."""
    rows = _fuzzy_pairs(spark, ["red pin", "red pin deluxe"]).collect()
    assert rows == []


def test_fuzzy_pairs_over_threshold_miss(spark):
    """In-block, in-window, but distance > 3 is rejected by the
    verify step (the block conditions are necessary, not sufficient)."""
    rows = _fuzzy_pairs(spark, ["red pin", "red XYZW"]).collect()
    assert rows == []


def test_resize_media_real_roundtrip(spark):
    """decode='real': a known 4x4 PGM resized to 2x2 must contain
    exactly the nearest-neighbor pixels (src = (i * h) // out_h) and
    re-encode as a well-formed PGM the codec can parse back."""
    img = np.arange(16, dtype=np.uint8).reshape(4, 4) * 10
    payload = encode_pgm(img)
    df = spark.createDataFrame(
        [(1, "image", bytearray(payload), (4, 4, None, None))],
        "media_id long, kind string, payload binary, "
        "meta struct<width:int,height:int,sample_rate:int,n_frames:int>")
    out = resize_media(df, out_w=2, out_h=2, decode="real").collect()
    assert len(out) == 1
    row = out[0]
    assert (row.meta.width, row.meta.height) == (2, 2)
    resized = decode_pnm(bytes(row.payload))
    # ys = xs = (arange(2) * 4) // 2 = [0, 2]
    assert resized.tolist() == img[np.ix_([0, 2], [0, 2])].tolist()
