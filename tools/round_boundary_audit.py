"""Round-half boundary audit for the DuckDB oracle suite.

The round-2 driver exposed a determinism failure mode:
``round(avg(double), 3)`` where the true mean sits ON a half boundary
of the rounding grid — Spark's double aggregation accumulates in
shuffle-fetch order, so reruns flip the rounded digit
(``embedding_label_centroids``, fixed by an exact decimal sum).  Any
other rounded-double oracle column could harbor the same latent bug and
stay green until a shuffle reorders.

This audit rewrites every ``round(X, k)`` site in every oracle SQL into
the value's DISTANCE FROM the nearest round-half boundary
(``abs(abs(X) * 10^k mod 1 - 0.5)``, doubles only — decimal/integer
rounding is exact in both engines and cannot flip), re-runs the
rewritten query, and reports the minimum margin per query.  A margin
within ~1e-6 of zero means float-accumulation nondeterminism can change
the hash — fix that query like the centroids fix, don't widen the
tolerance.
"""
from __future__ import annotations

import re
from typing import Dict, List, Optional, Tuple

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _find_round_sites(sql: str) -> List[Tuple[int, int, str, str]]:
    """All ``round(X, k)`` call sites as (start, end_exclusive, X, k);
    sites with a non-literal or missing scale are skipped."""
    sites = []
    for m in re.finditer(r"\bround\s*\(", sql, flags=re.I):
        depth, i = 1, m.end()
        top_comma = None
        while i < len(sql) and depth:
            c = sql[i]
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            elif c == "," and depth == 1 and top_comma is None:
                top_comma = i
            i += 1
        if depth or top_comma is None:
            continue
        x = sql[m.end():top_comma].strip()
        k = sql[top_comma + 1:i - 1].strip()
        if re.fullmatch(r"-?\d+", k):
            sites.append((m.start(), i, x, k))
    return sites


def _margin_expr(x: str, k: str) -> str:
    scale = 10 ** int(k)
    return (f"(CASE WHEN typeof({x}) IN ('DOUBLE', 'FLOAT') THEN "
            f"abs(abs(CAST(({x}) AS DOUBLE)) * {scale} % 1.0 - 0.5) "
            f"ELSE 0.5 END)")


def rewrite_rounds_to_margins(sql: str) -> Optional[str]:
    """Replace every round(X, k) with its boundary-margin expression;
    None when the query has no rewritable round sites."""
    sites = _find_round_sites(sql)
    if not sites:
        return None
    out, pos = [], 0
    for start, end, x, k in sites:
        out.append(sql[pos:start])
        out.append(_margin_expr(x, k))
        pos = end
    out.append(sql[pos:])
    return "".join(out)


def audit(sf_dir: str, oracles: Dict[str, str]) -> Dict[str, float]:
    """Minimum boundary margin per rounded-double oracle at ``sf_dir``."""
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"'{sf_dir}/{t}.parquet'")
    margins: Dict[str, float] = {}
    for name, sql in sorted(oracles.items()):
        rewritten = rewrite_rounds_to_margins(sql)
        if rewritten is None:
            continue
        res = con.execute(rewritten)
        cols = [d[0] for d in res.description]
        rows = res.fetchall()
        worst = 0.5
        for r in rows:
            for i, _ in enumerate(cols):
                v = r[i]
                if isinstance(v, float) and 0.0 <= v <= 0.5:
                    worst = min(worst, v)
        margins[name] = worst
    return margins


if __name__ == "__main__":
    import sys

    sys.path.insert(0, ".")
    import __spark_entry__ as entry

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    for name, margin in sorted(audit(sf, entry.oracle_sql()).items(),
                               key=lambda kv: kv[1]):
        print(f"{margin:.3e}  {name}")
