"""Round-half boundary audit (VERDICT r2 item 8): no rounded-DOUBLE
oracle value may sit within 1e-6 of a round-half boundary at gate
scale — closer than that, double-aggregation order nondeterminism can
flip the rounded digit and the driver hash (the round-2
``embedding_label_centroids`` failure; the audit also caught the same
latent bug in ``orders_by_year_month``, since fixed with exact integer
rounding)."""
import sys

sys.path.insert(0, "tools")

import __spark_entry__ as entry_mod
from round_boundary_audit import audit, rewrite_rounds_to_margins

SF_DIR = "/root/testdata/sf0.01"

# name -> why a reported sub-threshold margin is NOT a flip hazard
FALSE_POSITIVES = {
    # The query's own `coalesce(sum_value, 0.0)` turns missing gapfill
    # groups into the constant 0.0 (a margin artifact, not a value);
    # the true minimum margin over real groups is ~0.499 (measured
    # directly: sums land ~1e-11 from grid points, nowhere near .5).
    "events_hourly_gapfill": 0.0,
}

MARGIN_FLOOR = 1e-6


def test_rewriter_finds_sites():
    got = rewrite_rounds_to_margins(
        "SELECT round(avg(x), 3) AS a, round(s, 2) FROM t")
    assert got.count("CASE WHEN typeof(") == 2
    assert "round(" not in got
    assert rewrite_rounds_to_margins("SELECT x FROM t") is None


def test_no_rounded_double_near_half_boundary():
    margins = audit(SF_DIR, entry_mod.oracle_sql())
    assert len(margins) > 30          # the audit actually swept the suite
    close = {n: m for n, m in margins.items()
             if m < MARGIN_FLOOR and m != FALSE_POSITIVES.get(n)}
    assert not close, (
        f"rounded values within {MARGIN_FLOOR} of a round-half boundary "
        f"(double-order nondeterminism can flip the driver hash — fix "
        f"with exact decimal/integer arithmetic, don't widen this "
        f"floor): {close}")
