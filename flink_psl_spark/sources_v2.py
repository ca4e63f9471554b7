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
    DataSourceStreamWriter,
    DataSourceWriter,
    WriterCommitMessage,
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
        self.spec = _field_spec(options)

    def pushFilters(self, filters: Sequence[Filter]) -> Iterator[Filter]:
        """Absorb id-range predicates into the generation bounds (DSv2
        SupportsFilterPushDown); everything else is returned for Spark to
        evaluate post-scan."""
        for f in filters:
            col = f.attribute[0] if len(f.attribute) == 1 else None
            # id-range absorption assumes id == row index — true only for
            # the fixed default schema (a custom sequence may offset it)
            if (
                self.spec is None
                and col == "id"
                and isinstance(getattr(f, "value", None), int)
            ):
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
        if self.spec is not None:
            for i in range(partition.start, partition.end):
                yield tuple(
                    _gen_value(n, t, o, i) for n, t, o in self.spec
                )
            return
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
        self.spec = _field_spec(options)

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
        # on restart from a checkpoint this instance is fresh (_pos = 0)
        # while the engine resumes from the committed offset: fast-forward
        # the rate-limit cursor so latestOffset never regresses behind the
        # restart point (pacing correctness; data was never at risk — the
        # clamp below already forces end >= start)
        self._pos = max(self._pos, start["pos"])
        s, e = start["pos"], max(start["pos"], end["pos"])
        if s >= e:
            return [_RangePartition(s, s)]
        chunk = max(1, (e - s) // 8)
        parts = []
        while s < e:
            parts.append(_RangePartition(s, min(e, s + chunk)))
            s += chunk
        return parts

    def read(self, partition: _RangePartition):
        if self.spec is not None:
            for i in range(partition.start, partition.end):
                yield tuple(
                    _gen_value(n, t, o, i) for n, t, o in self.spec
                )
            return
        for i in range(partition.start, partition.end):
            yield _row(i)

    def commit(self, end: dict) -> None:
        pass  # nothing to clean up: generation is stateless

    def stop(self) -> None:
        pass


def _field_spec(options) -> list[tuple[str, str, dict]] | None:
    """Parse the reference datagen's per-field options into
    [(name, sql_type, kind_opts)], or None for the fixed default schema.

    Options (keys arrive lowercased from Spark):
      schema = "a bigint, b double, c string"
      fields.<f>.kind = sequence | random      (default: sequence for
                                                bigint, random otherwise)
      fields.<f>.start = <int>                 (sequence)
      fields.<f>.min / fields.<f>.max = <num>  (random numeric)
      fields.<f>.length = <int>                (random string length)
    Reference: DataGenTableSourceFactory options FIELDS_KIND/START/END/
    MIN/MAX/LENGTH (datagen connector).
    """
    schema = options.get("schema")
    if not schema:
        return None
    out = []
    for part in schema.split(","):
        name, typ = part.strip().split()
        name = name.lower()
        kind = options.get(
            f"fields.{name}.kind",
            "sequence" if typ.lower() == "bigint" else "random",
        )
        out.append((name, typ.lower(), {
            "kind": kind,
            "start": int(options.get(f"fields.{name}.start", 0)),
            "min": float(options.get(f"fields.{name}.min", 0.0)),
            "max": float(options.get(f"fields.{name}.max", 100.0)),
            "length": int(options.get(f"fields.{name}.length", 8)),
        }))
    return out


def _gen_value(name: str, typ: str, opts: dict, i: int):
    """Deterministic field synthesis; 'random' is an md5-derived uniform —
    replayable and reproducible in any engine with md5 (the sampling-
    module convention), unlike the reference's seeded RandomGenerator
    which is JVM-private."""
    import hashlib

    if opts["kind"] == "sequence":
        base = opts["start"] + i
        return float(base) if typ == "double" else base
    h = int(
        hashlib.md5(f"{name}|{i}".encode()).hexdigest()[:6], 16
    )  # uniform in [0, 16^6)
    if typ == "string":
        return f"{name}_{h % (10 ** min(opts['length'], 6))}"
    u = h / 16**6
    v = opts["min"] + u * (opts["max"] - opts["min"])
    return int(v) if typ == "bigint" else v


class PyDatagenSource(DataSource):
    """`format("pydatagen")` — options: n, numPartitions, rowsPerBatch,
    and the reference datagen's schema + fields.<f>.kind family
    (sequence/random per field; see _field_spec)."""

    @classmethod
    def name(cls) -> str:
        return "pydatagen"

    def schema(self) -> str:
        spec = _field_spec(self.options)
        if spec is None:
            return _SCHEMA
        return ", ".join(f"{n} {t}" for n, t, _ in spec)

    def reader(self, schema) -> DataSourceReader:
        return PyDatagenBatchReader(self.options)

    def streamReader(self, schema) -> DataSourceStreamReader:
        return PyDatagenStreamReader(self.options)


def register_python_sources(spark) -> None:
    """Register the custom Python data sources on a session."""
    spark.dataSource.register(PyDatagenSource)
    spark.dataSource.register(PyJsonlSink)


# ---------------------------------------------------------------------------
# Two-phase-commit sink (reference: Sink API with TwoPhaseCommittingSink /
# exactly-once file sinks, flink-connector-files FileSink): tasks write
# side files and report them in commit messages; the driver's commit()
# atomically publishes, abort() discards — no partial output ever visible.
#
# SCOPE: driver and executors must share one filesystem (local mode, or a
# mounted NFS/FUSE path). Tasks write via open()/os.makedirs on executors
# and the driver renames the same paths — on a multi-node cluster with
# node-local disks, commit would FileNotFoundError. The multi-node
# equivalent routes these paths through a shared object store / HDFS client;
# the protocol (side files + rename publish + per-epoch idempotence) is
# unchanged.
# ---------------------------------------------------------------------------


class _FileCommit(WriterCommitMessage):
    def __init__(self, tmp_path: str, rows: int):
        self.tmp_path = tmp_path
        self.rows = rows


class PyJsonlTpcWriter(DataSourceWriter):
    """Batch writer: each task streams rows to a ``.inprogress`` JSONL side
    file; driver commit renames all of them into place plus a _SUCCESS
    manifest (the classic two-phase publish)."""

    def __init__(self, options, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("pyjsonl sink requires a path option")
        self.overwrite = overwrite

    def write(self, rows) -> _FileCommit:
        import json as _json
        import os
        import uuid as _uuid

        from pyspark import TaskContext

        os.makedirs(self.path, exist_ok=True)
        pid = TaskContext.get().partitionId()
        tmp = os.path.join(
            self.path, f".part-{pid:05d}-{_uuid.uuid4().hex}.inprogress"
        )
        n = 0
        with open(tmp, "w") as f:
            for row in rows:
                f.write(_json.dumps(row.asDict(), default=str) + "\n")
                n += 1
        return _FileCommit(tmp, n)

    def commit(self, messages) -> None:
        import glob as _glob
        import json as _json
        import os

        if self.overwrite:
            # two-phase overwrite: old part files stay visible until every
            # new side file is safely on disk, then vanish in commit —
            # readers never see the directory half-written
            for old in _glob.glob(os.path.join(self.path, "*.jsonl")):
                os.remove(old)
            success = os.path.join(self.path, "_SUCCESS")
            if os.path.exists(success):
                os.remove(success)
        total = 0
        for m in messages:
            final = os.path.join(
                os.path.dirname(m.tmp_path),
                os.path.basename(m.tmp_path)[1:].replace(".inprogress", ".jsonl"),
            )
            os.rename(m.tmp_path, final)
            total += m.rows
        with open(os.path.join(self.path, "_SUCCESS"), "w") as f:
            f.write(_json.dumps({"rows": total}))

    def abort(self, messages) -> None:
        import os

        for m in messages:
            if m is not None and os.path.exists(m.tmp_path):
                os.remove(m.tmp_path)


class PyJsonlStreamWriter(DataSourceStreamWriter):
    """Streaming writer: same side-file protocol, committed per epoch —
    batchId goes into the published filename, so replaying an epoch after a
    failure overwrites (idempotent rename) instead of duplicating: the
    exactly-once contract of the reference's streaming FileSink."""

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("pyjsonl sink requires a path option")

    def write(self, iterator) -> _FileCommit:
        import json as _json
        import os
        import uuid as _uuid

        from pyspark import TaskContext

        os.makedirs(self.path, exist_ok=True)
        pid = TaskContext.get().partitionId()
        tmp = os.path.join(
            self.path, f".part-{pid:05d}-{_uuid.uuid4().hex}.inprogress"
        )
        n = 0
        with open(tmp, "w") as f:
            for row in iterator:
                f.write(_json.dumps(row.asDict(), default=str) + "\n")
                n += 1
        return _FileCommit(tmp, n)

    def commit(self, messages, batchId: int) -> None:
        import os

        for i, m in enumerate(messages):
            if m is None:
                continue
            final = os.path.join(
                self.path, f"epoch-{batchId:010d}-part-{i:05d}.jsonl"
            )
            os.replace(m.tmp_path, final)

    def abort(self, messages, batchId: int) -> None:
        import os

        for m in messages:
            if m is not None and os.path.exists(m.tmp_path):
                os.remove(m.tmp_path)


class PyJsonlSink(DataSource):
    """`format("pyjsonl")` two-phase-commit JSONL directory sink."""

    @classmethod
    def name(cls) -> str:
        return "pyjsonl"

    def writer(self, schema, overwrite: bool) -> DataSourceWriter:
        return PyJsonlTpcWriter(self.options, overwrite)

    def streamWriter(self, schema, overwrite: bool) -> DataSourceStreamWriter:
        return PyJsonlStreamWriter(self.options)
