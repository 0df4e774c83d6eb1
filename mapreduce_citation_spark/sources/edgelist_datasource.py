"""Custom Python DataSource for the reference's edge-list text format
(pyspark 4 ``pyspark.sql.datasource`` API).

This makes SURVEY.md §2 op #5 — INPUT RANGE PARTITIONING, the piece
the reference's master hand-schedules (``master/master.py:91-127``
assigns byte ranges to mappers) — explicit on Spark's public
connector API instead of relying on the built-in FileScan: the
reader splits each file into byte ranges at plan time and each task
reads exactly the lines whose FIRST byte falls inside its range
(Hadoop's LineRecordReader rule: seek to ``start-1``, discard the
line containing that byte, then read lines while the line's first
byte is before ``end`` — the final line may extend past ``end``; no
line is lost or duplicated whatever the boundaries cut through;
property-tested across adversarial split layouts in
``tests/test_sources_sinks.py``).

Parsing applies the reference's scan semantics (ops #1-4): trim,
drop blank lines and ``#`` comments, split on the separator, drop
rows without exactly two non-empty fields (the ``malformed="drop"``
policy of ``readers.read_edges_text``).
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class EdgeRangePartition(InputPartition):
    def __init__(self, path: str, start: int, end: int):
        self.path = path
        self.start = start
        self.end = end


class EdgeListReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("edgelist source requires a path")
        self.sep = options.get("sep", "\t")
        self.comment = options.get("comment", "#")
        self.splits = int(options.get("splits", "8"))

    def _files(self) -> list[str]:
        if os.path.isdir(self.path):
            return sorted(
                os.path.join(self.path, f)
                for f in os.listdir(self.path)
                if not f.startswith((".", "_"))
            )
        return [self.path]

    def partitions(self):
        parts = []
        for path in self._files():
            size = os.path.getsize(path)
            if size == 0:
                continue
            n = min(self.splits, size)
            step = size // n
            bounds = [i * step for i in range(n)] + [size]
            parts.extend(
                EdgeRangePartition(path, bounds[i], bounds[i + 1])
                for i in range(n)
            )
        return parts or [EdgeRangePartition(self._files()[0], 0, 0)]

    def read(self, partition: EdgeRangePartition):
        sep, comment = self.sep, self.comment
        with open(partition.path, "rb") as f:
            if partition.start > 0:
                f.seek(partition.start - 1)
                f.readline()  # owned by the previous range
            while True:
                pos = f.tell()
                if pos >= partition.end:
                    break
                raw = f.readline()
                if not raw:
                    break
                line = raw.decode("utf-8", errors="replace").strip()
                if not line or line.startswith(comment):
                    continue
                fields = line.split(sep)
                if len(fields) != 2 or not fields[0] or not fields[1]:
                    continue  # malformed="drop" (reference mapper.py:74-80)
                yield (fields[0], fields[1])


class EdgeListDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "edgelist"

    def schema(self) -> str:
        return "from_paper string, to_paper string"

    def reader(self, schema) -> EdgeListReader:
        return EdgeListReader(self.options)


def register_edgelist_source(spark) -> None:
    """Idempotently register the ``edgelist`` format on a session."""
    try:
        spark.dataSource.register(EdgeListDataSource)
    except Exception as e:  # already registered in this session
        if "already" not in str(e).lower():
            raise
