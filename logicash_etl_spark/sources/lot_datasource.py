"""Custom Python DataSource (Spark 4 DataSource API): the reference's
``_READY``-flag lot protocol as a first-class readable format.

The reference's ingestion contract (data_gen/generator.py:177-192 +
main.tf:821-842): a producer drops CSV files into a lot directory and
writes a ``_READY`` flag LAST; consumers must only ever read lots whose
flag exists (files-without-flag are mid-upload). The engine already
exposes this as a file-stream (streaming/sources.py); this module makes
it a batch *format*:

    spark.dataSource.register(LotDataSource)
    spark.read.format("logicash_lot").schema(sch) \
        .option("path", root).load()

- lot discovery and the READY gate run on the driver (a listing, not
  data); each data FILE becomes an ``InputPartition``, so a 1000-file
  lot fans out across the cluster like any native scan;
- rows are parsed per the USER-declared schema (the API requires an
  explicit schema — same posture as the engine's CSV readers:
  production scans never infer);
- unflagged lots are skipped silently by contract (they will be read
  once their flag lands — exactly the EventBridge semantics).

This is the extension point for sources Spark has no connector for
(internal wire formats, ticket APIs, ...): the plumbing — partition
planning on the driver, per-partition iterators on executors — is the
same for any of them.
"""

from __future__ import annotations

import csv
import os
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    IsNotNull,
    LessThan,
    LessThanOrEqual,
)
from pyspark.sql import types as T


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


def _ready_lot_files(root: str) -> list[str]:
    """Data files of every READY lot under ``root``.

    Layout: root/<lot>/_READY gates root/<lot>/<table_or_file>/...;
    a bare root/_READY gates root itself. Only ``.csv`` parts are
    data (Spark's _SUCCESS etc. are ignored).
    """
    lots: list[str] = []
    if os.path.exists(os.path.join(root, "_READY")):
        lots.append(root)
    else:
        for name in sorted(os.listdir(root)):
            lot = os.path.join(root, name)
            if os.path.isdir(lot) and os.path.exists(os.path.join(lot, "_READY")):
                lots.append(lot)
    files: list[str] = []
    for lot in lots:
        for dirpath, _dirnames, filenames in os.walk(lot):
            for fn in sorted(filenames):
                if fn.endswith(".csv"):
                    files.append(os.path.join(dirpath, fn))
    return files


def _cast(value: str, dtype: T.DataType):
    if value == "" or value is None:
        return None
    if isinstance(dtype, (T.IntegerType, T.LongType, T.ShortType)):
        return int(value)
    if isinstance(dtype, (T.DoubleType, T.FloatType)):
        return float(value)
    if isinstance(dtype, T.BooleanType):
        return value.lower() in ("true", "1", "t")
    return value  # strings (timestamps ride as strings; cast in SQL)


class _LotReader(DataSourceReader):
    def __init__(self, schema: T.StructType, options: dict):
        self._schema = schema
        self._root = options.get("path")
        if not self._root:
            raise ValueError("logicash_lot: option 'path' is required")
        self._header = options.get("header", "true").lower() == "true"
        self._preds: list = []

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Spark 4 filter pushdown for python sources: comparison and
        null-check predicates on top-level columns are evaluated
        DURING the parse (rows are dropped before they reach the JVM
        — at 100 TB that's the difference between shipping a lot and
        shipping a predicate's survivors). Anything else is handed
        back for Spark to evaluate."""
        import operator as op

        ops = {
            EqualTo: op.eq,
            GreaterThan: op.gt,
            GreaterThanOrEqual: op.ge,
            LessThan: op.lt,
            LessThanOrEqual: op.le,
        }
        names = [f.name for f in self._schema.fields]
        for f in filters:
            kind = type(f)
            col = f.attribute[0] if len(f.attribute) == 1 else None
            if col in names and kind in ops:
                self._preds.append((names.index(col), ops[kind], f.value))
            elif col in names and kind is IsNotNull:
                self._preds.append((names.index(col), None, None))
            else:
                yield f  # unsupported: Spark evaluates it post-scan

    def _keep(self, row: tuple) -> bool:
        for i, fn, v in self._preds:
            x = row[i]
            if x is None or (fn is not None and not fn(x, v)):
                return False
        return True

    def partitions(self) -> Sequence[InputPartition]:
        # driver-side planning: a listing, never data; one partition
        # per data file so executors parse in parallel. No READY lot
        # -> one empty sentinel (the API requires >= 1 partition).
        files = _ready_lot_files(self._root)
        return [_FilePartition(p) for p in files] or [_FilePartition("")]

    def read(self, partition: _FilePartition) -> Iterator[tuple]:
        if not getattr(partition, "path", ""):
            return
        fields = self._schema.fields
        with open(partition.path, newline="") as fh:
            reader = csv.reader(fh)
            if self._header:
                next(reader, None)
            for row in reader:
                parsed = tuple(
                    _cast(row[i] if i < len(row) else None, f.dataType)
                    for i, f in enumerate(fields)
                )
                if self._keep(parsed):
                    yield parsed


class LotDataSource(DataSource):
    """``format("logicash_lot")`` — READY-gated CSV lot directories."""

    @classmethod
    def name(cls) -> str:
        return "logicash_lot"

    def schema(self) -> str:
        raise NotImplementedError(
            "logicash_lot requires an explicit .schema(...) — production "
            "scans never infer (engine CSV-reader posture)"
        )

    def reader(self, schema: T.StructType) -> DataSourceReader:
        return _LotReader(schema, self.options)

    def writer(self, schema: T.StructType, overwrite: bool):
        return _LotWriter(schema, self.options, overwrite)

    def simpleStreamReader(self, schema: T.StructType):
        return _LotStreamReader(schema, self.options)


def register_lot_source(spark) -> None:
    """Idempotent registration of the lot format on a session.

    Also enables python-source filter pushdown (runtime-settable SQL
    conf): a reader that implements ``pushFilters`` raises at init
    when the conf is off, so registration owns it — vanilla sessions
    (the driver's posture) work without the engine's session factory.
    """
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(LotDataSource)


# ---------------------------------------------------------------- writer

from dataclasses import dataclass  # noqa: E402

from pyspark.sql.datasource import (  # noqa: E402
    DataSourceWriter,
    WriterCommitMessage,
)


@dataclass
class _PartMessage(WriterCommitMessage):
    path: str
    rows: int


class _LotWriter(DataSourceWriter):
    """Two-phase lot write = the reference's producer contract made
    structural: executors write part files (phase 1), and the _READY
    flag is written by ``commit()`` on the driver ONLY after every
    partition reported success — files first, flag last, so a
    concurrent lot reader can never observe a partial lot. ``abort()``
    removes written parts and leaves no flag."""

    def __init__(self, schema: T.StructType, options: dict, overwrite: bool):
        self._schema = schema
        root = options.get("path")
        if not root:
            raise ValueError("logicash_lot: option 'path' is required")
        self._root = root
        self._overwrite = overwrite

    def write(self, iterator: Iterator) -> _PartMessage:
        # executor side: one part file per partition, named by task
        # partition id (re-tries overwrite the same name — idempotent)
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        d = os.path.join(self._root, "data")
        os.makedirs(d, exist_ok=True)
        path = os.path.join(d, f"part-{pid:05d}.csv")
        n = 0
        with open(path, "w", newline="") as fh:
            w = csv.writer(fh)
            w.writerow([f.name for f in self._schema.fields])
            for row in iterator:
                w.writerow(["" if v is None else v for v in row])
                n += 1
        return _PartMessage(path=path, rows=n)

    def commit(self, messages: Sequence[_PartMessage]) -> None:
        # driver side, after ALL partitions succeeded: flag lands LAST
        with open(os.path.join(self._root, "_READY"), "w") as fh:
            fh.write(f"rows={sum(m.rows for m in messages)}\n")

    def abort(self, messages: Sequence[_PartMessage]) -> None:
        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)
        # no flag: the lot stays invisible to every reader by contract


# ---------------------------------------------------------- stream reader

from pyspark.sql.datasource import SimpleDataSourceStreamReader  # noqa: E402


class _LotStreamReader(SimpleDataSourceStreamReader):
    """Streaming over the lot protocol: each micro-batch consumes the
    READY lots that appeared since the last offset — the EventBridge
    flag-trigger loop (main.tf:821-842) as a structured-streaming
    source. The offset is the count of consumed lots over the sorted
    lot listing (lots are append-only by contract: a producer never
    renames or deletes a flagged lot), so replay between offsets is
    exact and exactly-once delivery falls out of the checkpoint."""

    def __init__(self, schema: T.StructType, options: dict):
        self._schema = schema
        self._root = options.get("path")
        if not self._root:
            raise ValueError("logicash_lot: option 'path' is required")
        self._header = options.get("header", "true").lower() == "true"

    def _ready_lots(self) -> list[str]:
        if not os.path.isdir(self._root):
            return []
        out = []
        for name in sorted(os.listdir(self._root)):
            lot = os.path.join(self._root, name)
            if os.path.isdir(lot) and os.path.exists(os.path.join(lot, "_READY")):
                out.append(lot)
        return out

    def initialOffset(self) -> dict:
        return {"n_lots": 0}

    def _rows_of(self, lots: list[str]) -> Iterator[tuple]:
        fields = self._schema.fields
        for lot in lots:
            for dirpath, _d, filenames in os.walk(lot):
                for fn in sorted(filenames):
                    if not fn.endswith(".csv"):
                        continue
                    with open(os.path.join(dirpath, fn), newline="") as fh:
                        r = csv.reader(fh)
                        if self._header:
                            next(r, None)
                        for row in r:
                            yield tuple(
                                _cast(row[i] if i < len(row) else None, f.dataType)
                                for i, f in enumerate(fields)
                            )

    def read(self, start: dict) -> tuple[list[tuple], dict]:
        # materialized list, not a generator: the simple-reader harness
        # pickles the batch for prefetch/replay caching
        lots = self._ready_lots()
        new = lots[start["n_lots"]:]
        return list(self._rows_of(new)), {"n_lots": len(lots)}

    def readBetweenOffsets(self, start: dict, end: dict) -> list[tuple]:
        # deterministic replay for recovery: the sorted listing is
        # stable because flagged lots are immutable by contract
        lots = self._ready_lots()
        return list(self._rows_of(lots[start["n_lots"]:end["n_lots"]]))
