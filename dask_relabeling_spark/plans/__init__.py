"""Query registry: importing this package registers every named query.

``REGISTRY`` maps query name -> (builder(spark, sf_dir) -> DataFrame,
oracle SQL string or None for non-SQL-expressible operators).
"""
from .relational import REGISTRY  # noqa: F401  (base registry)
from . import llm  # noqa: F401  (registers dedup/similarity/text/events)
from . import tile_query  # noqa: F401  (registers the tile pipeline)

__all__ = ["REGISTRY"]
