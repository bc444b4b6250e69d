"""The remaining Python-UDF API surfaces: scalar Arrow ``pandas_udf``
and a Python UDTF.

The engine's rule (README, SCALE.md) is JVM-built-ins first; grouped
``applyInPandas`` / ``mapInPandas`` where kernels need ndarrays; and the
two forms here ONLY when per-row Python is genuinely unavoidable:

- ``cosine_to_query`` — scalar Arrow-vectorized pandas_udf computing
  cosine similarity of an ``array<float>`` column against a closure
  query vector.  The JVM expression path (``F.aggregate``/``zip_with``,
  see ``operators/similarity.py``) is the hot path; this exists for
  models that need NumPy/BLAS semantics (and is still ~batch-vectorized,
  never per-row Python).
- ``SplitSentences`` — a Python UDTF (Spark 4 ``@udtf``) fanning a text
  row out to (pos, sentence) rows.  ``posexplode(split(...))`` is the
  hot path for this exact job; the UDTF form is for imperative per-row
  expansion logic that has no expression equivalent.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udtf


def cosine_to_query(query_vec) -> "callable":
    """Returns a scalar pandas_udf: cosine(embedding, query_vec) as
    double.  Arrow ships each batch as one pandas Series; the math runs
    on a dense (batch x dim) matrix — one BLAS call per batch."""
    q = np.asarray(query_vec, dtype=np.float64)
    qn = np.linalg.norm(q)

    @pandas_udf("double")
    def _cos(emb: pd.Series) -> pd.Series:
        m = np.vstack(emb.to_numpy())
        num = m @ q
        den = np.linalg.norm(m, axis=1) * qn
        with np.errstate(divide="ignore", invalid="ignore"):
            out = np.where(den > 0, num / den, 0.0)
        return pd.Series(out)

    return _cos


@udtf(returnType="pos int, sentence string")
class SplitSentences:
    """UDTF: one (pos, sentence) row per '.'-delimited sentence."""

    def eval(self, text: str):
        if text is None:
            return
        for i, s in enumerate(t.strip() for t in text.split(".")):
            if s:
                yield i, s
