"""Scalable dense-id assignment.

``dense_rank() OVER (ORDER BY v)`` funnels every row through ONE partition
— fine at test scale, a wall at 100 TB.  ``dense_ids`` is the scale path:
range-partition the distinct values (so partitions are globally ordered),
then a classic two-pass index assignment — per-partition counts (tiny, one
int per partition, to the driver), prefix-sum offsets back out, positions
assigned partition-locally.  This is the one operator family where the RDD
layer is genuinely the right tool (per-partition imperative indexing);
``zipWithIndex`` implements exactly this two-pass internally.

`sort_label_indices` (the golden-parity operator) uses a driver-collected
dictionary because segmentation label counts are small; this function is
the drop-in replacement once the distinct set itself is too large to
collect.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dense_ids(df: DataFrame, col: str, num_partitions: int = None,
              start: int = 0) -> DataFrame:
    """Map each distinct value of ``col`` to a dense id (``start`` + rank
    in ascending order).  Returns a DataFrame (col, id) usable as a
    broadcast/shuffle join dictionary.  Never single-partitions the data.
    """
    distinct = df.select(col).distinct()
    if num_partitions:
        distinct = distinct.repartitionByRange(num_partitions, F.col(col))
    else:
        distinct = distinct.repartitionByRange(F.col(col))
    ordered = distinct.sortWithinPartitions(col)

    out_rdd = (ordered.rdd
               .map(lambda row: row[0])
               .zipWithIndex()
               .map(lambda vi: (vi[0], vi[1] + start)))
    return out_rdd.toDF([col, "id"])


def exclusive_prefix_sum(df: DataFrame, key_col: str, val_col: str,
                         out_col: str = "offset",
                         num_partitions: int = None,
                         group_col: str = None) -> DataFrame:
    """Adds ``out_col`` = sum of ``val_col`` over all rows with a smaller
    ``key_col`` (exclusive running total in global key order) — without
    ever funnelling the data through one partition.  With ``group_col``,
    the running total restarts per group (so ``val_col = 1`` yields a
    scalable per-group ``row_number() - 1``) and no single group ever
    occupies one partition either: groups may span range partitions.

    Same two-phase shape as ``dense_ids``: range-partition on
    (group, key) so partitions are globally ordered, per-partition window
    cumsum (fully parallel), then a partition-totals table — one row per
    (partition, group-in-partition), still tiny — prefix-summed per group
    on the small side of a broadcast join.  The repartitioned frame is
    pinned with a LAZY ``localCheckpoint`` so both phases see the SAME
    sampled range boundaries (recomputation could legally re-sample
    them).  localCheckpoint, not ``persist()``: a persisted plan can be
    evicted under memory pressure and silently recomputed (breaking the
    same-boundaries invariant), and its CacheManager entry lives for the
    whole session — repeated invocations (this routine is on the bench
    path via ntile/pack/shuffle) would accumulate executor storage.
    Checkpoint blocks spill to disk instead of evicting and are
    GC-cleaned once the result frame goes out of scope.  (Cluster
    caveat, as for ``connected_components``: localCheckpoint data does
    not survive executor loss — point ``setCheckpointDir`` at durable
    storage and use ``checkpoint()`` for fault-tolerant runs.)
    """
    from pyspark.sql import Window

    grp = [group_col] if group_col else []
    keys = [F.col(c) for c in grp + [key_col]]
    part = (df.repartitionByRange(num_partitions, *keys)
            if num_partitions else df.repartitionByRange(*keys))
    with_pid = (part.withColumn("_pid", F.spark_partition_id())
                .localCheckpoint(eager=False))

    w = (Window.partitionBy("_pid", *grp).orderBy(key_col)
         .rowsBetween(Window.unboundedPreceding, -1))
    local = with_pid.withColumn(
        "_local_off", F.coalesce(F.sum(val_col).over(w), F.lit(0)))

    wp = (Window.partitionBy(*grp).orderBy("_pid")
          .rowsBetween(Window.unboundedPreceding, -1))
    prefix = (with_pid.groupBy("_pid", *grp).agg(F.sum(val_col).alias("_t"))
              .withColumn("_poff",
                          F.coalesce(F.sum("_t").over(wp), F.lit(0)))
              .drop("_t"))

    # the group-key join must be NULL-SAFE: SQL GROUP BY / window
    # PARTITION BY treat NULL as a regular group, but a name-list
    # equi-join never matches NULL keys, so every NULL-group ROW was
    # silently dropped from the output (a NULL-source document simply
    # vanished from docs_weighted_interleave's training mix — found by
    # tools/null_parity_sweep.py).  _pid is never null; only the group
    # columns need eqNullSafe.
    pref = prefix.select(
        F.col("_pid").alias("_ppid"), "_poff",
        *[F.col(g).alias(f"_pg{i}") for i, g in enumerate(grp)])
    cond = F.col("_pid") == F.col("_ppid")
    for i, g in enumerate(grp):
        cond = cond & F.col(g).eqNullSafe(F.col(f"_pg{i}"))
    return (local.join(F.broadcast(pref), cond)
            .withColumn(out_col, (F.col("_local_off")
                                  + F.col("_poff")).cast("long"))
            .drop("_pid", "_ppid", "_local_off", "_poff",
                  *[f"_pg{i}" for i in range(len(grp))]))


def zorder_key(x, y, bits: int = 4):
    """Morton (z-order) interleave of two small non-negative integer
    columns into one locality key: bit i of x lands at position 2i, bit
    i of y at 2i+1.

    This is the data-layout primitive behind Delta/Iceberg Z-ORDER
    clustering: range-partitioning and sorting files by the interleaved
    key keeps rows that are close in BOTH dimensions in the same files,
    so min/max file statistics prune scans for predicates on either
    column.  Pure integer bit arithmetic — identical on any engine.

    PRECONDITION: inputs must already lie in ``[0, 2^bits)`` — callers
    quantize first (``docs_zorder_layout`` buckets each dimension into
    2^bits ranks).  Bits above ``bits`` are FOLDED IN with xor rather
    than silently discarded, so out-of-range values still spread across
    the key space instead of aliasing onto the low cells and defeating
    file pruning (round-3 ADVICE) — but fold collisions make the key
    non-monotone in each dimension, so treat quantization as required,
    not optional.
    """
    from pyspark.sql import functions as F
    x, y = F.col(x) if isinstance(x, str) else x, \
        F.col(y) if isinstance(y, str) else y
    # xor-fold ALL high bits down into the low `bits` window (doubling
    # shifts, so every input bit influences the key); a no-op for
    # in-range inputs.  Inputs are widened to long FIRST — Java shift
    # counts wrap mod the operand width, so shiftright(int, 32) is the
    # identity, not zero.
    x, y = x.cast("long"), y.cast("long")
    s = bits
    while s < 64:
        x = x.bitwiseXOR(F.shiftright(x, s))
        y = y.bitwiseXOR(F.shiftright(y, s))
        s *= 2
    parts = []
    for i in range(bits):
        parts.append(F.shiftleft(F.shiftright(x, i).bitwiseAND(1), 2 * i))
        parts.append(F.shiftleft(F.shiftright(y, i).bitwiseAND(1),
                                 2 * i + 1))
    out = parts[0]
    for p in parts[1:]:
        out = out.bitwiseOR(p)
    return out.cast("long")
