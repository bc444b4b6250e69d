"""Losslessness of the PPJoin candidate filters across thresholds.

``prefix_filtered_jaccard_pairs`` now stacks THREE candidate filters
(prefix, length, positional).  The positional bound's correctness
argument is subtle — it is exact only at a pair's first collision and
its minimum-overlap arithmetic ``ceil(num*(sa+sb)/(num+den))`` is easy
to get off by one — so this pins exact equality against a pure-python
brute-force Jaccard oracle on a seeded random corpus with planted
near-duplicates, at several threshold fractions (including ones whose
rounding behaves differently from the registered 4/5).
"""
import numpy as np
import pytest
from pyspark.sql import Row

from dask_relabeling_spark.operators.dedup import (
    prefix_filtered_jaccard_pairs)
from dask_relabeling_spark.session import release_persists

VOCAB = [f"w{i}" for i in range(30)]


def _corpus(seed: int = 0, n_base: int = 24):
    """Random docs + mutated copies so pairs straddle every threshold."""
    rng = np.random.RandomState(seed)
    docs = []
    did = 0
    for _ in range(n_base):
        length = int(rng.randint(3, 28))
        toks = [VOCAB[i] for i in rng.randint(0, len(VOCAB), length)]
        docs.append((did, " ".join(toks)))
        did += 1
        if rng.rand() < 0.6:  # mutated near-copy: tweak a few tokens
            mut = list(toks)
            for _ in range(int(rng.randint(0, 4))):
                mut[int(rng.randint(0, len(mut)))] = \
                    VOCAB[int(rng.randint(0, len(VOCAB)))]
            docs.append((did, " ".join(mut)))
            did += 1
    return docs


def _shingles(text: str, n: int = 3) -> frozenset:
    toks = [t for t in text.split(" ") if t]
    return frozenset(" ".join(toks[i:i + n])
                     for i in range(len(toks) - n + 1))


def _brute_pairs(docs, num: int, den: int):
    sets = {i: _shingles(t) for i, t in docs}
    out = set()
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            sa, sb = sets[a], sets[b]
            if not sa or not sb:
                continue
            inter = len(sa & sb)
            union = len(sa) + len(sb) - inter
            if inter * den >= union * num:
                out.add((a, b, inter, union))
    return out


@pytest.mark.parametrize("num,den", [(1, 2), (2, 3), (3, 4), (4, 5),
                                     (9, 10)])
def test_positional_filter_lossless_random_corpus(spark, num, den):
    docs = _corpus()
    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in docs])
    got = {(r.id_a, r.id_b, r.inter, r.union_sz) for r in
           prefix_filtered_jaccard_pairs(
               df, threshold_num=num, threshold_den=den).collect()}
    want = _brute_pairs(docs, num, den)
    assert got == want
    assert want, f"vacuous corpus at {num}/{den}"  # pairs must exist
    release_persists()
