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
