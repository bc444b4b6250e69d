"""The registry's evidence-rotation fold is generated, not hand-kept.

The driver checks the first ~50 registry entries each round, so the
ordering IS the evidence-refresh policy.  These tests pin the fold's
contract against the committed CORRECTNESS_r0*.json artifacts so a
future round cannot silently regress into replaying fresh evidence
while stale entries starve (the round-6 failure mode).
"""
import pytest

from dask_relabeling_spark.plans import (  # noqa: F401
    REGISTRY, _CHANGED, _front, _is_green, _latest_green,
)

BUDGET = 50  # the driver's per-round correctness budget


def test_latest_green_folds_driver_artifacts():
    latest = _latest_green()
    # Every committed round contributes; the fold must know at least
    # the round-1..6 artifacts that are in the repo today.
    assert latest, "no CORRECTNESS artifacts folded"
    assert max(latest.values()) >= 6
    # Only registry-known names matter for ordering, but the fold must
    # cover the overwhelming majority of the registry (the driver has
    # checked every entry at least once by round 6).
    known = set(latest) & set(REGISTRY)
    assert len(known) >= 0.9 * len(REGISTRY)


def test_rotation_is_stalest_first():
    latest = _latest_green()
    names = list(REGISTRY)
    head = _front(latest)
    tail = [n for n in names if n not in head]
    # The tail must be ordered by non-decreasing latest-green round.
    rounds = [latest[n] for n in tail]
    assert rounds == sorted(rounds), (
        "registry tail is not stalest-first: %r" % list(zip(tail, rounds))[:10]
    )
    # And the head (changed + new + flagship) must come first verbatim.
    assert names[: len(head)] == head


def test_changed_entries_self_expire():
    """A changed entry leaves the priority head as soon as a committed
    driver artifact from its change round (or later) shows it green —
    no hand-cleaning between rounds (the round-5/6 failure mode)."""
    if not _CHANGED:
        pytest.skip("no changed entries flagged")
    name, rnd = _CHANGED[0]
    # Evidence older than the change: stays at the head.
    assert name in _front({name: rnd - 1})
    # Evidence from the change round or newer: expires from the head
    # (everything else in the registry becomes "never checked" in this
    # synthetic latest map, so only membership for `name` is asserted).
    assert name not in _front({n: rnd for n in REGISTRY})


def test_rows_only_green_counts_as_evidence():
    """The driver records ``hash_match: null`` for entries without an
    ``oracle_sql`` (the weaker rows-only check).  Such a row must still
    count as green evidence — otherwise an oracle-less entry reads as
    never-checked and pins itself to the front of the budget forever,
    starving the rotation (round-7 ADVICE)."""
    rows_only = {"rows_match": True, "schema_match": True,
                 "hash_match": None, "spark_rows": 5, "oracle_rows": None,
                 "err": None}
    assert _is_green(rows_only)
    assert _is_green({"rows_match": True, "hash_match": True, "err": None})
    # ... but a failed, errored, or hash-mismatched row never does.
    assert not _is_green({"rows_match": False, "hash_match": None,
                          "err": None})
    assert not _is_green({"rows_match": True, "hash_match": None,
                          "err": "boom"})
    assert not _is_green({"rows_match": True, "hash_match": False,
                          "err": None})


def test_stalest_entries_fit_driver_budget():
    """Every entry tied for the stalest evidence lands inside the
    driver's budget — EXCEPT the overflow the budget itself forces:
    changed-entry flags and never-green entries legitimately rank
    ahead of the stale tail (they need fresh evidence more urgently),
    so when front + stalest > budget, up to that difference may wait
    one round.  What must NEVER happen is an entry with FRESHER
    evidence occupying a budget slot while a stalest entry waits —
    that is the round-6 starvation bug this test exists to catch."""
    latest = _latest_green()
    tail = {n: r for n, r in latest.items() if n in REGISTRY}
    if not tail:
        pytest.skip("no folded evidence")
    stalest_round = min(tail.values())
    stalest = [n for n, r in tail.items() if r == stalest_round]
    top = list(REGISTRY)[:BUDGET]
    missing = [n for n in stalest if n not in set(top)]
    head = _front(latest)
    # union, not sum: a flagged entry that is ALSO tied for stalest
    # occupies one slot, not two — summing would inflate the allowed
    # overflow and weaken the starvation assertion (r12 ADVICE)
    forced = max(0, len(set(head) | set(stalest)) - BUDGET)
    assert len(missing) <= forced, (
        "stalest entries starved by the rotation beyond budget "
        "pressure (%d forced): %r" % (forced, missing)
    )
    # no queue-jumping: every budget slot not taken by the policy head
    # (flags / never-green / flagship) holds stalest-round evidence
    # whenever any stalest entry is still waiting
    if missing:
        fresher = [n for n in top
                   if n not in head and latest.get(n, -1) > stalest_round]
        assert not fresher, (
            "entries with fresher evidence jumped the stale queue: %r"
            % fresher)
