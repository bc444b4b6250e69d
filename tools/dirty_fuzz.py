"""Seeded randomized dirty-corpus differential fuzz.

The fixed profiles in ``null_parity_sweep.py`` pin the dirty-row
classes we already know about; this tool searches for the ones we
don't.  Each seed generates a random batch of documents / embeddings /
events rows — including NULL keys, NULL timestamps, NULL/NaN/Inf
components and values, empty strings, duplicated text, ties, and
extreme magnitudes — injects them into the sf0.001 tables, and runs
every registered query against its DuckDB oracle through the sweep's
own ``run_profile`` machinery (same normalization as the driver gate).

Round-12 origin: seed 101 found SEVEN silently diverging queries in
one run — the NULL-ts/NULL-value/NULL-user_id divergence class across
the time-ordered event plans (engines' opposite window NULL ordering,
``F.window``'s NULL-ts drop, an incremental split predicate losing
NULL ts, DuckDB ASOF matching NULL-ts left rows).  All fixed with
explicit both-engine conventions; the trigger rows were then
promoted into the sweep's permanent null profile.

Usage:  python tools/dirty_fuzz.py [seed ...]    (default: 101)
Exit 1 if any seed produced a silent divergence.

MUST be run from the repo root (Spark's Python workers resolve
``dask_relabeling_spark`` via the working directory; run from
anywhere else and every Python-kernel query fails with a spurious
ModuleNotFoundError on the executor side).
"""
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import null_parity_sweep as NPS  # noqa: E402

from dask_relabeling_spark.session import get_spark  # noqa: E402

WORDS = ["the", "data", "spark", "engine", "tile", "label", "dedup",
         "corpus", "token", "quality", "straße", "İstanbul", "ΣΟΦΟΣ",
         "中文", "naïve", "", "a", "zzz"]
LANGS = ["en", "de", "tr", "el", "zh", None, ""]
SOURCES = ["web", "books", "code", None, ""]
ETYPES = ["view", "click", "purchase", None, ""]


def _sql_str(s):
    return "NULL" if s is None else "'" + s.replace("'", "''") + "'"


# Fuzz ids start here — far above both the base key range (max 999 at
# sf0.001) and the fixed profiles' 9000001+ rows, so injected batches
# never collide with either.
BASE_ID = 91000000


def gen_profile(rng: random.Random) -> dict:
    """Random dirty rows for the three injectable tables.  Ids start at
    ``BASE_ID`` (91000000, above the fixed profiles' 9000001+ range)."""
    docs, embs, evts = [], [], []
    for i in range(12):
        if rng.random() < 0.15:
            text = None
        else:
            text = " ".join(rng.choice(WORDS)
                            for _ in range(rng.randint(0, 30)))
            if rng.random() < 0.2:
                text = text + "  " + text  # duplication pressure
        nch = "NULL" if text is None else str(len(text))
        docs.append(f"({BASE_ID + i}, {_sql_str(text)}, "
                    f"{_sql_str(rng.choice(LANGS))}, "
                    f"{_sql_str(rng.choice(SOURCES))}, {nch})")
    for i in range(8):
        kind = rng.random()
        if kind < 0.15:
            vec = "NULL"
        else:
            comps = []
            for _ in range(64):
                r = rng.random()
                if r < 0.02:
                    comps.append("NULL")
                elif r < 0.04:
                    comps.append("'NaN'::FLOAT")
                elif r < 0.05:
                    comps.append("'Infinity'::FLOAT")
                elif r < 0.15:
                    comps.append("0.0")  # tie / zero-norm pressure
                else:
                    comps.append(f"{rng.uniform(-2, 2):.6f}")
            vec = "[" + ", ".join(comps) + "]::FLOAT[]"
        lab = "NULL" if rng.random() < 0.2 else str(rng.randint(0, 4))
        embs.append(f"({BASE_ID + i}, {vec}, {lab})")
    for i in range(12):
        ts = ("NULL" if rng.random() < 0.1 else
              f"TIMESTAMP '2024-01-0{rng.randint(1, 9)} "
              f"{rng.randint(0, 23):02d}:{rng.randint(0, 59):02d}:00'")
        uid = "NULL" if rng.random() < 0.15 else str(rng.randint(1, 5))
        r = rng.random()
        if r < 0.1:
            val = "NULL"
        elif r < 0.2:
            val = "0.0"
        elif r < 0.3:
            val = str(rng.choice([-1e9, 1e9, 1e-12, -0.0]))
        else:
            val = f"{rng.uniform(-100, 100):.4f}"
        props = rng.choice(['\'{"k": 1}\'', "'{}'", "NULL", "'[]'",
                            '\'{"k": null}\'', "'not json'"])
        evts.append(f"({BASE_ID + i}, {ts}, {uid}, "
                    f"{_sql_str(rng.choice(ETYPES))}, {val}, {props})")
    return {"documents": docs, "embeddings": embs, "events": evts}


# ---------------------------------------------------------------------------
# Media-payload arm (round 13): corrupt/truncated PGM/WAV/Y4M bytes.
#
# The table arm above reaches the multimodal queries only through their
# documents-synthesized payloads, which are well-formed by construction
# — so the decode kernels had never been fed a corrupt payload under a
# gate.  This arm builds VALID payloads with the repo's own encoders,
# applies per-format structural corruptions, and pins the reference's
# robustness posture (chunkops kernels fail loudly per chunk):
#
#   expect "loud"  — the stage must RAISE, and the error must name the
#                    offending media_id (operators/multimodal._loud);
#                    silent acceptance of a structurally invalid
#                    payload is a divergence.
#   expect "valid" — the mutation is legal per the format spec
#                    (comments, unknown RIFF chunks, FRAME params,
#                    trailing sub-header junk): the stage must succeed
#                    AND decode byte-identically to the pristine twin.
#   expect "either"— ambiguous-per-spec inputs: loud (with media_id)
#                    or success both acceptable; never compared.
#
# First run (round 13) found silent decodes of zero-dimension PGM/Y4M
# headers and size-lying RIFF chunks, plus anonymous errors from every
# kernel — fixed in kernels/codecs.py + operators/multimodal._loud;
# the classes are pinned by tests/test_dirty_corpus_gate.py's media
# panel (seed 0 of gen_media_cases).
# ---------------------------------------------------------------------------

MEDIA_STAGES = {"pgm": ("feat", "resize"), "wav": ("feat",),
                "y4m": ("frames",)}
_MEDIA_KIND = {"pgm": "image", "wav": "audio", "y4m": "video"}


def gen_media_cases(rng: random.Random):
    """Returns ``(pristine, cases)``: one valid payload per format and
    the corruption cases derived from it (tag, payload, expect)."""
    import numpy as np
    from dask_relabeling_spark.kernels import codecs as C

    img = np.frombuffer(rng.randbytes(64), dtype=np.uint8).reshape(8, 8)
    wav_s = np.frombuffer(rng.randbytes(64), dtype="<i2")
    vid = np.frombuffer(rng.randbytes(48), dtype=np.uint8).reshape(3, 4, 4)
    P = C.encode_pgm(img)
    W = C.encode_wav_pcm16(wav_s, 8000)
    Y = C.encode_y4m_mono(vid)
    pristine = {"pgm": P, "wav": W, "y4m": Y}
    raster = P[P.index(b"255\n") + 4:]
    cases = [
        ("pgm", "truncate-raster", P[:-rng.randint(1, 63)], "loud"),
        ("pgm", "truncate-header", P[:rng.randint(1, 10)], "loud"),
        ("pgm", "empty", b"", "loud"),
        ("pgm", "wrong-magic", b"\x89PNG\r\n" + P[2:], "loud"),
        ("pgm", "bad-maxval", b"P5\n8 8\n65535\n" + raster, "loud"),
        ("pgm", "zero-dims", b"P5\n0 0\n255\n", "loud"),
        ("pgm", "negative-dim", b"P5\n-8 8\n255\n" + raster, "loud"),
        ("pgm", "nonnumeric-dim", b"P5\nx 8\n255\n" + raster, "loud"),
        ("pgm", "comment-header", b"P5\n# a comment\n8 8\n255\n" + raster,
         "valid"),
        ("pgm", "trailing-bytes", P + rng.randbytes(5), "valid"),
        ("pgm", "random-blob", rng.randbytes(40), "either"),
        ("wav", "truncate-data", W[:-rng.randint(1, 63)], "loud"),
        ("wav", "empty", b"", "loud"),
        ("wav", "wrong-magic", b"RIFX" + W[4:], "loud"),
        ("wav", "not-wave", W[:8] + b"AVI " + W[12:], "loud"),
        ("wav", "non-pcm", W[:20] + (2).to_bytes(2, "little") + W[22:],
         "loud"),
        ("wav", "stereo", W[:22] + (2).to_bytes(2, "little") + W[24:],
         "loud"),
        ("wav", "8bit", W[:34] + (8).to_bytes(2, "little") + W[36:],
         "loud"),
        ("wav", "missing-data", W[:36] + b"datx" + W[40:], "loud"),
        # size-field lies SMALLER: declared-size-authoritative parsing
        # of a shorter data chunk is correct RIFF behavior
        ("wav", "lying-size-small",
         W[:40] + (len(W) - 48).to_bytes(4, "little") + W[44:], "either"),
        ("wav", "extra-chunk",
         W[:36] + b"LIST\x04\x00\x00\x00ABCD" + W[36:], "valid"),
        ("wav", "odd-chunk",
         W[:36] + b"JUNK\x03\x00\x00\x00abc\x00" + W[36:], "valid"),
        ("wav", "trailing-junk", W + rng.randbytes(5), "valid"),
        ("wav", "random-blob", rng.randbytes(60), "either"),
        ("y4m", "truncate-frame", Y[:-rng.randint(1, 15)], "loud"),
        ("y4m", "empty", b"", "loud"),
        ("y4m", "wrong-magic", b"XUV4MPEG2" + Y[9:], "loud"),
        ("y4m", "zero-dims", Y.replace(b" W4 ", b" W0 ", 1), "loud"),
        ("y4m", "negative-dim", Y.replace(b" H4 ", b" H-4 ", 1), "loud"),
        ("y4m", "missing-wh",
         b"YUV4MPEG2 F25:1 Cmono" + Y[Y.index(b"\n"):], "loud"),
        ("y4m", "subsampled", Y.replace(b"Cmono", b"C420jpeg", 1),
         "loud"),
        ("y4m", "bad-marker",
         Y[:Y.index(b"FRAME", 40)] + b"FRAMX"
         + Y[Y.index(b"FRAME", 40) + 5:], "loud"),
        ("y4m", "marker-eof", Y + b"FRAME", "loud"),
        ("y4m", "frame-params",
         Y.replace(b"FRAME\n", b"FRAME Xtag\n", 1), "valid"),
        ("y4m", "trailing-junk", Y + b"JUNK", "loud"),
        ("y4m", "random-blob", rng.randbytes(50), "either"),
    ]
    return pristine, cases


def _run_media_stage(spark, stage, kind, payload, media_id):
    """Execute one decode stage over a single-row media DataFrame and
    return a comparable value; decode errors propagate to the caller."""
    from dask_relabeling_spark.operators import multimodal as MM
    df = spark.createDataFrame(
        [(media_id, _MEDIA_KIND[kind], payload, None)], MM.MEDIA_SCHEMA)
    if stage == "feat":
        rows = MM.decode_and_featurize(df, decode="real").collect()
        return [tuple(r["feature"]) for r in rows]
    if stage == "resize":
        out = MM.decode_and_featurize(
            MM.resize_media(df, out_w=4, out_h=4, decode="real"),
            decode="real", feature_dim=2)
        return [tuple(r["feature"]) for r in out.collect()]
    rows = MM.sample_frames(df, every_k=2, decode="real").collect()
    return sorted((r["frame_idx"], bytes(r["frame"])) for r in rows)


def run_media_fuzz(spark, rng: random.Random, quiet: bool = True):
    """Gate the corruption cases; returns (bad, n_loud, n_run)."""
    pristine, cases = gen_media_cases(rng)
    bad, n_loud, n_run = [], 0, 0
    base = {}

    def outcome(stage, kind, payload, mid):
        try:
            return ("ok", _run_media_stage(spark, stage, kind, payload,
                                           mid))
        except Exception as exc:  # noqa: BLE001 — classified below
            return ("err", str(exc))

    for kind, stages in MEDIA_STAGES.items():
        for stage in stages:
            base[kind, stage] = outcome(stage, kind, pristine[kind], 1)
            if base[kind, stage][0] != "ok":
                bad.append((f"{kind}/pristine/{stage}",
                            "pristine payload failed to decode: "
                            + base[kind, stage][1][:160]))
    for i, (kind, tag, payload, expect) in enumerate(cases):
        mid = 777001 + i
        for stage in MEDIA_STAGES[kind]:
            n_run += 1
            name = f"{kind}/{tag}/{stage}"
            st, val = outcome(stage, kind, payload, mid)
            if st == "err":
                n_loud += 1
                if expect == "valid":
                    bad.append((name, f"legal mutation refused: "
                                f"{val[:160]}"))
                elif f"media_id={mid}" not in val:
                    bad.append((name, "anonymous decode error (no "
                                f"media_id context): {val[:160]}"))
                elif not quiet:
                    print(f"loud   {name}")
            else:
                if expect == "loud":
                    bad.append((name, "structurally invalid payload "
                                "decoded silently"))
                elif expect == "valid" and val != base[kind, stage][1]:
                    bad.append((name, "legal mutation decoded "
                                "differently from pristine twin"))
                elif not quiet:
                    print(f"ok     {name}")
    # batch accounting: dirty-adjacent rows must not silently drop
    from dask_relabeling_spark.operators import multimodal as MM
    commented = [p for k, t, p, _ in cases
                 if k == "pgm" and t == "comment-header"][0]
    batch = spark.createDataFrame(
        [(1, "image", pristine["pgm"], None),
         (2, "image", commented, None),
         (3, "audio", pristine["wav"], None)], MM.MEDIA_SCHEMA)
    n_run += 1
    if MM.decode_and_featurize(batch, decode="real").count() != 3:
        bad.append(("batch/accounting", "row silently dropped in a "
                    "mixed valid batch"))
    return bad, n_loud, n_run


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--media"]
    media = "--media" in sys.argv[1:]
    seeds = [int(s) for s in args] or [101]
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    any_bad = False
    for seed in seeds:
        if media:
            bad, n_loud, n_run = run_media_fuzz(
                spark, random.Random(seed))
            print(f"media seed {seed}: {len(bad)} divergences, "
                  f"{n_loud} loud / {n_run} run")
        else:
            NPS._PROFILES["fuzz"] = gen_profile(random.Random(seed))
            bad, loud, n_run = NPS.run_profile(spark, "fuzz", quiet=True)
            print(f"seed {seed}: {len(bad)} divergences, {len(loud)} "
                  f"loud / {n_run} run")
            for name, se, oe in loud:
                print(f"  LOUD    {name}: spark: {str(se)[:80]} | "
                      f"oracle: {str(oe)[:80]}")
        for name, why in bad:
            any_bad = True
            print(f"  DIVERGE {name}: {why}")
    return 1 if any_bad else 0


if __name__ == "__main__":
    sys.exit(main())
