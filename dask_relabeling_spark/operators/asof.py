"""As-of (point-in-time) join.

For every left row, attach the most recent right row with the same key and
``right_ts <= left_ts`` (direction="backward"; "forward" mirrors it;
"nearest" takes whichever side is closer in absolute time, ties to the
backward match — the pandas ``merge_asof`` direction set).

Scalable formulation — the union + ordered-window trick, NOT a range join:
union both sides with a side marker, sort each key's rows once by
(ts, side), and carry the latest right payload forward with
``last(..., ignorenulls=True)``.  Cost is ONE shuffle on the key and a
linear pass per key — a naive ``l.ts >= r.ts`` range join is O(|L|x|R|)
per key and explodes long histories; at 100 TB the window formulation is
the only one that survives.  (Same idiom Flink calls a temporal join and
DuckDB/Pandas call ASOF JOIN.)

Reference parity note: the reference library has no relational joins at
all (SURVEY.md §2.2); this operator belongs to the training-data-pipeline
extension surface (feature attribution at event time).
"""
from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)


def _c(name: str):
    """Column reference by exact name — backtick-quoted so names with
    dots/spaces resolve as one identifier, not a nested-field path."""
    return F.col("`" + name.replace("`", "``") + "`")


def asof_join(left: DataFrame, right: DataFrame, on: List[str],
              left_ts: str, right_ts: str,
              right_id: Optional[str] = None,
              suffix: str = "_r",
              direction: str = "backward",
              tolerance_seconds: Optional[int] = None) -> DataFrame:
    """Left as-of join.  Every left row is kept; matched right columns are
    appended with ``suffix`` (NULL when no right row precedes).

    ``right_id``: unique right column used to break ties when several
    right rows share one (key, ts) — the highest id wins, keeping the
    result deterministic on both engines.  Must be an integer column
    (a silent cast of e.g. a UUID string would NULL every tiebreak).

    ``tolerance_seconds``: like pandas ``merge_asof(tolerance=...)`` —
    a match farther than this from the left timestamp is discarded
    (columns NULL).  Applied as a post-filter on the carried match, so
    the plan shape (one shuffle, linear pass) is unchanged.

    NULL semantics follow SQL comparison rules — ``l.ts >= r.ts`` and
    ``l.key = r.key`` are never true through a NULL — made EXPLICIT
    here because the window formulation would otherwise invent its
    own: ``partitionBy`` groups NULL keys into one partition (so
    NULL-key rows would match each other, which no equi-join does),
    and a NULL timestamp's sort position depends on direction (Spark
    asc puts NULLs first, desc last) while DuckDB's ASOF sorts them
    last either way.  So right rows with a NULL key or NULL ``right_ts``
    are dropped (they can never be a match), and a left row with a NULL
    ``left_ts`` is kept but never matched (found by the round-12
    randomized dirty-corpus fuzz: DuckDB's ASOF matched a NULL-ts
    purchase to the user's last click, this operator did not).  Left
    rows with a NULL key or NULL ``left_ts`` additionally bypass the
    shuffle entirely (r12 ADVICE): ``partitionBy`` would hash every
    NULL-key row into one straggler partition to compute a match that
    is NULL by definition.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest: {direction}")
    if right_ts in on and (tolerance_seconds is not None
                           or direction == "nearest"):
        # both features read the matched row's timestamp back out of the
        # right-payload struct; a key column is not in that struct and
        # would fail later with an opaque unresolved-field error
        raise ValueError(
            f"direction='nearest' and tolerance require right_ts "
            f"('{right_ts}') as a payload column, not a join key")
    if tolerance_seconds is not None:
        lt, rt = left.schema[left_ts].dataType, right.schema[right_ts].dataType
        if lt != rt:
            # a mixed NTZ / tz-aware pair would make the gap depend on
            # the session timezone's offset at each wall clock
            raise TypeError(
                f"tolerance requires matching timestamp types, got "
                f"{lt.simpleString()} vs {rt.simpleString()}")
    if right_id is not None:
        id_type = right.schema[right_id].dataType
        if not isinstance(id_type, _NUMERIC):
            raise TypeError(
                f"right_id column '{right_id}' must be integral, got "
                f"{id_type.simpleString()} (a non-numeric tiebreak would "
                f"cast to NULL and silently lose determinism)")

    # a right row with a NULL join key or NULL timestamp can never be
    # an as-of match under SQL comparison semantics; drop before the
    # union so it cannot be carried by the window (see docstring)
    never_match = _c(right_ts).isNull()
    for k in on:
        never_match = never_match | _c(k).isNull()
    right = right.filter(~never_match)

    # symmetrically, a LEFT row with a NULL key or NULL left_ts is kept
    # but can never match — and without a split it still pays for the
    # shuffle, where ``partitionBy`` hashes every NULL-key row into ONE
    # partition: on a dirty corpus a heavily NULL-keyed left side
    # becomes a single straggler doing useless window work (r12
    # ADVICE).  Route those rows around the window entirely and union
    # them back with NULL match columns at the end — the window path
    # below then only ever sees non-NULL keys and timestamps.
    l_bypass = _c(left_ts).isNull()
    for k in on:
        l_bypass = l_bypass | _c(k).isNull()
    left_null = left.filter(l_bypass)
    left = left.filter(~l_bypass)

    r_payload = [c for c in right.columns if c not in on]
    r_struct = F.struct(*[_c(c).alias(c) for c in r_payload])
    r_struct_type = right.select(r_struct.alias("_r")).schema["_r"].dataType

    ts_order = F.col("_ts")
    if direction == "forward":
        # mirror time: the next right row at/after left_ts is the "last
        # seen" row in reversed order
        ts_order = F.col("_ts").desc()

    l2 = left.select(
        *[_c(c).alias(c) for c in on],
        _c(left_ts).alias("_ts"),
        F.lit(None).cast("long").alias("_tb"),
        F.struct(*[_c(c).alias(c) for c in left.columns]).alias("_l"),
        F.lit(None).cast(r_struct_type).alias("_r"))
    # NULL ids (if any) coalesce to long-min: they lose every tie
    # deterministically instead of mixing with the left rows' NULL marker
    r_tb = (F.coalesce(_c(right_id).cast("long"),
                       F.lit(-(1 << 63)))
            if right_id else F.lit(0))
    r2 = right.select(
        *[_c(c).alias(c) for c in on],
        _c(right_ts).alias("_ts"),
        r_tb.alias("_tb"),
        F.lit(None).cast(l2.schema["_l"].dataType).alias("_l"),
        r_struct.alias("_r"))

    # left rows carry a NULL tiebreak and sort with asc_nulls_last, so
    # they always come AFTER right rows at an equal timestamp (an
    # equal-ts right row is a valid match in either direction) — robust
    # for any right id magnitude, no sentinel value to collide with
    u = l2.unionByName(r2)
    if direction == "nearest":
        # both arms over ONE shuffle on the key: the backward frame sorts
        # (ts asc), the forward frame (ts desc) — a second in-partition
        # sort, no second exchange.  Equal-|gap| ties prefer the backward
        # match (documented; at gap 0 both arms resolve to the same row,
        # the highest right id at that timestamp).
        wb = (Window.partitionBy(*[_c(c) for c in on])
              .orderBy(F.col("_ts"), F.col("_tb").asc_nulls_last())
              .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        wf = (Window.partitionBy(*[_c(c) for c in on])
              .orderBy(F.col("_ts").desc(), F.col("_tb").asc_nulls_last())
              .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        both = (u.withColumn("_mb", F.last("_r", ignorenulls=True).over(wb))
                .withColumn("_mf", F.last("_r", ignorenulls=True).over(wf))
                .filter(F.col("_l").isNotNull()))
        rts_q = "`" + right_ts.replace("`", "``") + "`"
        gb = F.abs(F.expr(f"timestampdiff(MICROSECOND, _ts, _mb.{rts_q})"))
        gf = F.abs(F.expr(f"timestampdiff(MICROSECOND, _ts, _mf.{rts_q})"))
        matched = (both.withColumn(
            "_m", F.when(F.col("_mb").isNull(), F.col("_mf"))
                   .when(F.col("_mf").isNull(), F.col("_mb"))
                   .when(gb <= gf, F.col("_mb")).otherwise(F.col("_mf")))
            .drop("_mb", "_mf"))
    else:
        w = (Window.partitionBy(*[_c(c) for c in on]).orderBy(ts_order,
                                             F.col("_tb").asc_nulls_last())
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        matched = (u.withColumn("_m", F.last("_r", ignorenulls=True).over(w))
                   .filter(F.col("_l").isNotNull()))
    # NULL-left_ts rows were split into the bypass branch above, so
    # every row reaching this point has a real timestamp; the guard
    # stays as defense in depth (it is what enforced the convention
    # before the bypass existed, and a future edit that weakens the
    # split must not silently re-open the forward-direction hole where
    # desc ordering sorts NULL ts last, AFTER every right row)
    matched = matched.withColumn(
        "_m", F.when(F.col("_ts").isNotNull(), F.col("_m")))
    if tolerance_seconds is not None:
        # timestampdiff works natively on TIMESTAMP and TIMESTAMP_NTZ
        # alike with no session-timezone interpretation — a cast through
        # TIMESTAMP would make an NTZ gap depend on the session tz (off
        # by up to 3600s when the two wall clocks straddle a DST
        # transition).  Same-type operands are guaranteed: both sides
        # were renamed to `_ts` and unioned above, so a type mismatch
        # already failed loudly at unionByName.
        rts_q = "`" + right_ts.replace("`", "``") + "`"
        gap = F.abs(F.expr(
            f"timestampdiff(MICROSECOND, _ts, _m.{rts_q})"))
        matched = matched.withColumn(
            "_m", F.when(gap <= float(tolerance_seconds) * 1e6,
                         F.col("_m")))
    # getField, not "_l.{c}" string paths: safe for any column name
    out_cols = ([F.col("_l").getField(c).alias(c) for c in left.columns]
                + [F.col("_m").getField(c).alias(c + suffix)
                   for c in r_payload])
    out = matched.select(*out_cols)
    # re-attach the bypassed never-match left rows (NULL match columns,
    # same types as the window path's getField projections)
    null_out = left_null.select(
        *[_c(c).alias(c) for c in left.columns],
        *[F.lit(None).cast(r_struct_type[c].dataType).alias(c + suffix)
          for c in r_payload])
    return out.unionByName(null_out)
