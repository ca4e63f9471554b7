"""Custom Python Data Source (Spark 4 Python Data Source API).

Reference parity: the FLIP-27 unified ``Source`` interface
(flink-core/.../api/connector/source/Source.java) — pluggable sources with
splits (→ ``partitions()``), bounded/unbounded modes (→ batch
``DataSourceReader`` / ``DataSourceStreamReader``), and per-reader state
(→ offsets). The reference's datagen connector
(DataGenTableSourceFactory.java:45) is the modeled source: deterministic
synthetic rows at a configurable rate.

Determinism contract: row ``i`` is always
  (id=i, ts='2024-01-01' + i minutes, key='k' || (i % 7),
   value=(i * 7 % 1000) / 10.0)
— pure arithmetic, so an external oracle (DuckDB generate_series) can
reproduce the full output exactly.

Scale notes: batch reads split into ``numPartitions`` row ranges (splits are
independent — executors generate their slice without coordination);
``pushFilters`` prunes whole partitions for ``id``-range predicates before
any row is generated (the DSv2 SupportsFilterPushDown contract,
SupportsFilterPushDown.java:63). The stream reader advances a row-count
offset per micro-batch — a replayable, checkpointable source (offsets are
the FLIP-27 split state).
"""

from __future__ import annotations

import datetime
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)

_EPOCH = datetime.datetime(2024, 1, 1)
_SCHEMA = "id bigint, ts timestamp, key string, value double"


def _row(i: int):
    return (
        i,
        _EPOCH + datetime.timedelta(minutes=i),
        f"k{i % 7}",
        (i * 7 % 1000) / 10.0,
    )


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class PyDatagenBatchReader(DataSourceReader):
    """Bounded datagen: ``n`` rows in ``numPartitions`` independent splits."""

    def __init__(self, options):
        self.n = int(options.get("n", 1000))
        self.num_partitions = int(options.get("numPartitions", 4))
        self.lo = 0  # inclusive id lower bound after pushdown
        self.hi = self.n  # exclusive upper bound after pushdown

    def pushFilters(self, filters: Sequence[Filter]) -> Iterator[Filter]:
        """Absorb id-range predicates into the generation bounds (DSv2
        SupportsFilterPushDown); everything else is returned for Spark to
        evaluate post-scan."""
        for f in filters:
            col = f.attribute[0] if len(f.attribute) == 1 else None
            if col == "id" and isinstance(getattr(f, "value", None), int):
                if isinstance(f, GreaterThan):
                    self.lo = max(self.lo, f.value + 1)
                    continue
                if isinstance(f, GreaterThanOrEqual):
                    self.lo = max(self.lo, f.value)
                    continue
                if isinstance(f, LessThan):
                    self.hi = min(self.hi, f.value)
                    continue
                if isinstance(f, LessThanOrEqual):
                    self.hi = min(self.hi, f.value + 1)
                    continue
                if isinstance(f, EqualTo):
                    self.lo = max(self.lo, f.value)
                    self.hi = min(self.hi, f.value + 1)
                    continue
            yield f  # unsupported → Spark evaluates it

    def partitions(self):
        lo, hi = self.lo, max(self.lo, self.hi)
        total = hi - lo
        if total == 0:
            return [_RangePartition(lo, lo)]
        per = max(1, total // self.num_partitions)
        parts = []
        s = lo
        while s < hi:
            e = min(hi, s + per)
            parts.append(_RangePartition(s, e))
            s = e
        return parts

    def read(self, partition: _RangePartition):
        for i in range(partition.start, partition.end):
            yield _row(i)


class PyDatagenStreamReader(DataSourceStreamReader):
    """Unbounded datagen: a row-count offset advances ``rowsPerBatch`` per
    micro-batch up to ``n`` (so bounded tests terminate); offsets make the
    source replayable from a checkpoint."""

    def __init__(self, options):
        self.n = int(options.get("n", 1000))
        # rowsPerBatch > 0 rate-limits processing-time triggers; the default
        # (0 = everything available) is what AvailableNow needs — it
        # snapshots the FIRST latestOffset and never asks again, so a
        # rate-limited source would silently truncate the replay
        self.rows_per_batch = int(options.get("rowsPerBatch", 0))
        self._pos = 0

    def initialOffset(self):
        return {"pos": 0}

    def latestOffset(self):
        # rate limit lives HERE (stateful advance), never in partitions():
        # whatever offset range the engine commits must be read in full, or
        # rows silently vanish when the offset outruns the clamp
        if self.rows_per_batch <= 0:
            return {"pos": self.n}
        self._pos = min(self.n, self._pos + self.rows_per_batch)
        return {"pos": self._pos}

    def partitions(self, start: dict, end: dict):
        # one split per micro-batch is enough for the fixture scale; a
        # production source would subdivide [start, end) like the batch side
        return [_RangePartition(start["pos"], max(start["pos"], end["pos"]))]

    def read(self, partition: _RangePartition):
        for i in range(partition.start, partition.end):
            yield _row(i)

    def commit(self, end: dict) -> None:
        pass  # nothing to clean up: generation is stateless

    def stop(self) -> None:
        pass


class PyDatagenSource(DataSource):
    """`format("pydatagen")` — options: n, numPartitions, rowsPerBatch."""

    @classmethod
    def name(cls) -> str:
        return "pydatagen"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return PyDatagenBatchReader(self.options)

    def streamReader(self, schema) -> DataSourceStreamReader:
        return PyDatagenStreamReader(self.options)


def register_python_sources(spark) -> None:
    """Register the custom Python data sources on a session."""
    spark.dataSource.register(PyDatagenSource)
