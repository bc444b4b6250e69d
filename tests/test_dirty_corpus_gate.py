"""Standing dirty-corpus cross-engine gate (r10 verdict item 2).

tools/null_parity_sweep.py found 13 real silent divergences in round
10 and one more class (NaN-component embeddings) in round 12 — but as
a manual tool nothing re-ran it when a new query landed.  This test
makes the cheap core of that sweep part of ``pytest tests/``: the
COMBINED profile (null + edge + unicode + ties rows merged, including the
NaN-component embedding) injected into the sf0.001 tables, over a
fixed panel of the cheapest queries that actually read the injected
tables, one panel member per operator family.  Any query/oracle
divergence over the dirty corpus fails the build.

The full sweep (every registered query x every profile in isolation)
stays the manual/per-round tool: ``python tools/null_parity_sweep.py``.
"""
import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tools"))

import null_parity_sweep as NPS  # noqa: E402

# One per family, cheapest member, all touching documents / embeddings
# / events (the tables the profiles inject into).
GATE_PANEL = [
    # text analysis / curation signals
    "text_quality", "text_langid", "text_token_stats",
    "text_repetition", "text_fingerprint", "doc_chunks",
    "docs_curation_pipeline",
    # dedup
    "dedup_exact", "dedup_minhash_signatures",
    # similarity / embeddings
    "ann_cosine_topk", "embedding_neardup_pairs", "embedding_kmeans",
    "embedding_label_centroids", "embedding_dim_stats",
    # events / quantile / anomaly paths
    "events_value_winsorize_counts", "events_anomaly_mad",
    "events_value_anomalies", "events_incremental_rollup",
    # half-cent DOUBLE-round divergence class (fuzz seed 131): the
    # value-sum rollups round exact DECIMALs now; the promoted
    # half-cent trigger rows keep the class pinned here
    "events_hourly_gapfill", "events_rollup_cascade",
    # scale-4 tie class (round-15 tie-injection audit: a 5-decimal
    # dirty value splits round(double, 4) at true halves — window
    # sums and lag deltas now ride DECIMALs too; the "ties" profile
    # rows keep the class pinned; hourly_windows/lead_lag_deltas
    # already sit in the panel above)
    "events_sliding_windows", "events_rolling_hour_stats",
    # time-ordered events paths (round-12 fuzz: NULL ts/value/user_id
    # divergence class — one member per sub-family: tumbling window,
    # sessionize, as-of join, offset windows, distribution windows)
    "events_hourly_windows", "events_sessionize",
    "events_asof_last_click", "events_lead_lag_deltas",
    "events_value_percentiles",
    # malformed-JSON props (fuzz seed 103: oracle needs json_valid)
    "events_props_extract",
    # multimodal adapters + nested JSON; the four real-codec decode
    # queries joined in round 13 so dirty DOCUMENT rows (NULL/empty/
    # unicode text) keep flowing through payload synthesis + actual
    # PGM/WAV/Y4M parses under the gate
    "multimodal_metadata", "multimodal_pgm_decode",
    "multimodal_wav_decode", "multimodal_y4m_frames",
    "multimodal_resize", "nested_json_docs",
]


def test_dirty_corpus_parity_panel(spark):
    import __spark_entry__ as E
    missing = set(GATE_PANEL) - set(E.queries())
    assert not missing, f"gate panel names drifted: {missing}"
    bad, loud, n_run = NPS.run_profile(
        spark, "combined", only=set(GATE_PANEL), quiet=True)
    assert n_run == len(GATE_PANEL)
    # loud (both engines refuse the dirty input) is acceptable; a
    # silent one-engine-only divergence is the bug class this pins
    assert not bad, bad


def test_media_corruption_panel(spark):
    """Corrupt-payload gate (round-13 fuzz arm): structurally invalid
    PGM/WAV/Y4M payloads must fail LOUDLY with the offending media_id;
    spec-legal mutations (header comments, unknown RIFF chunks, FRAME
    params, trailing sub-header junk) must decode byte-identically to
    their pristine twin; mixed batches must not silently drop rows.
    Seed 0 is the promoted permanent panel — the classes the round-13
    fuzz found live (silent zero-dim PGM/Y4M decodes, silent truncated
    RIFF chunks, NULL-meta batch crashes, anonymous decode errors)."""
    import random

    import dirty_fuzz as DF
    bad, n_loud, n_run = DF.run_media_fuzz(spark, random.Random(0))
    # 47 corruption-case stage runs + batch accounting + the two
    # fake-path NULL-meta probes (r14: the r13 ADVICE found
    # sample_frames' fake path missing resize_media's NULL-meta guard)
    assert n_run == 50, n_run
    assert not bad, bad


def test_tile_corruption_panel(spark):
    """Malformed-tile gate (round-14 fuzz arm): structurally invalid
    tile TABLE rows — payload length != h*w, zero/negative/NULL dims,
    NULL payloads/keys, out-of-grid locations, duplicated chunk keys,
    missing chunks, one-sided NULL nclasses/classes — must fail LOUDLY
    with chunk-coordinate context through the REAL pipelines
    (image2labels, labels2geojson); a row-order permutation must
    reproduce the pristine output byte-identically.  The reference
    gets this for free from dask's shape bookkeeping
    (chunkops.py:19-32); a Spark tile table has to enforce it
    (sources/tiles.py checks + operators/halo._chunk_loud).  Seed 0 is
    the promoted permanent panel — pre-round-14, a -1 dim was INFERRED
    by np.reshape, a zero-dim tile vanished, a duplicate chunk key was
    last-row-wins nondeterministic ownership, and a one-sided NULL
    nclasses silently dropped the classes plane."""
    import random

    import dirty_fuzz as DF
    bad, n_loud, n_run = DF.run_tile_fuzz(spark, random.Random(0))
    # 18 cases x 2 pipeline stages
    assert n_run == 36, n_run
    assert not bad, bad


def test_source_corruption_panel(spark):
    """Ingestion-sources gate (round-15 fuzz arm): dirty BYTES through
    sources/formats.py — RFC-4180 csv and JSONL edge content must parse
    identically in Spark and DuckDB under the same explicit schema;
    files with malformed records must read with zero silent drops and
    every bad record flagged in the corrupt-record column (FAILFAST
    loud); write_any -> read_any preserves the row multiset per format;
    compact_parquet / write_zordered preserve the multiset; the pinned
    source postures (csv '' -> NULL, JSON duplicate-key last-wins,
    zero-length files yield NO row from text/binaryFile) hold.  Seed 0
    is the promoted permanent panel — the arm's first run found
    read_any's CSV quoting was NOT the RFC-4180 its docstring claimed
    (Spark's backslash escape mis-parses doubled quotes vs DuckDB) and
    Spark's CSV WRITER silently trimming leading/trailing whitespace
    out of string data (both fixed in sources/formats.py)."""
    import random

    import dirty_fuzz as DF
    bad, n_loud, n_run = DF.run_source_fuzz(spark, random.Random(0))
    assert n_run == 21, n_run
    assert n_loud == 2, n_loud   # both FAILFAST probes must be loud
    assert not bad, bad
