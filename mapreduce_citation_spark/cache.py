"""Corpus-sized cache policy, in one place.

The r6-measured rule (CLAUDE.md): a CORPUS-sized reuse table is cached
with ``persist(MEMORY_AND_DISK)`` — columnar, evictable, spills under
pressure — never ``localCheckpoint``, which pins deserialized rows in
the block manager (r12 verdict #3 found two corpus-sized violations).
``localCheckpoint`` remains the right tool for TINY tables referenced
from multiple plan branches (it deduplicates the subtree outright) and
for per-iteration lineage truncation in iterative operators.

Centralizing the choice also gives the same-session A/B harness
(``tools/ab_cache_r13.py``) a seam to interleave both strategies in
one process without shipping env-var scaffolding in operator code.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame


def cache_corpus(df: DataFrame) -> DataFrame:
    """Cache a corpus-sized reuse table: evictable columnar storage."""
    return df.persist(StorageLevel.MEMORY_AND_DISK)
