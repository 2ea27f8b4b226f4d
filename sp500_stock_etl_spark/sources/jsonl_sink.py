"""Custom JSONL sink via Spark 4's Python Data Source WRITE API — the
sink-side twin of ``quote_feed`` (which demonstrates the read path
with pushdown). The reference's only custom sink is a driver-side
pandas ``to_csv`` + upload (K1/K2, ``dags/sp500_dag.py.py:229-302``);
this is what that becomes when the data no longer fits one machine:
every TASK serializes its own partition, and a two-phase COMMIT
PROTOCOL makes the job atomic — the failure-isolation property the
reference gets from Airflow retries at whole-task granularity, done
at file granularity instead.

Protocol (the same shape as Hadoop's FileOutputCommitter v2 /
Spark's own file sinks):

1. each task streams its rows to ``<path>/_tmp/<uuid>.jsonl`` and
   returns a commit message (tmp name, row count) — executor-side,
   parallel, no driver involvement;
2. ``commit(messages)`` (driver, runs once, only if EVERY task
   succeeded) renames tmp files to ``part-NNNNN.jsonl`` and writes a
   ``_SUCCESS`` manifest (file list + row counts + total) LAST, so a
   reader that requires the manifest never observes a partial job;
3. ``abort()`` removes the tmp directory — failed jobs leave no
   visible output.

Values are serialized with date/timestamp → ISO strings and floats
via ``repr`` (shortest round-trip form), so a schema-first
``spark.read.json`` reproduces the frame exactly — the registry
query ``jsonl_sink_roundtrip_agg`` pins that cycle against an oracle
on the ORIGINAL table. Paths are local-fs in the sandbox; on a
cluster the same code targets any fuse/NFS-mounted shared store, or
the write()/commit() pair swaps in an object-store client (multipart
upload + completion marker — the identical two-phase shape).
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from dataclasses import dataclass
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceStreamWriter,
    WriterCommitMessage,
)
from pyspark.sql.types import Row, StructType


@dataclass
class _FileCommit(WriterCommitMessage):
    tmp_name: str
    n_rows: int


def _jsonable(v):
    import datetime as _dt
    import decimal as _dec

    if isinstance(v, _dt.datetime):
        # Arrow batches carry session-timezone-aware datetimes; strip
        # the tzinfo so the serialized wall-clock string is the
        # session-local form spark.read.json parses back identically.
        return v.replace(tzinfo=None).isoformat(sep=" ")
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, _dec.Decimal):
        return str(v)
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, Row):
        return {k: _jsonable(x) for k, x in v.asDict().items()}
    if isinstance(v, (list, tuple)):
        return [_jsonable(x) for x in v]
    if isinstance(v, dict):
        return {k: _jsonable(x) for k, x in v.items()}
    return v


def _field_serializer(dtype):
    """Per-FIELD JSON serializer compiled once from the schema (r14
    optimization, guide §4.2: move per-row interpreter work out of the
    hot loop). Returns ``fn(value) -> json fragment str`` emitting the
    IDENTICAL characters ``json.dumps(_jsonable(value))`` would for
    that type, or None for types the fast path doesn't cover (caller
    falls back to the generic row path). repr() of int/float is
    exactly what json.dumps emits for them (shortest round-trip form
    for floats), so read-back values are bit-identical."""
    from pyspark.sql import types as T

    if isinstance(dtype, T.BooleanType):
        return lambda v: "null" if v is None else ("true" if v else "false")
    if isinstance(
        dtype, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
    ):
        return lambda v: "null" if v is None else repr(v)
    if isinstance(dtype, (T.FloatType, T.DoubleType)):
        inf = float("inf")

        def _float(v):
            if v is None:
                return "null"
            if v == v and v != inf and v != -inf:
                return repr(v)
            # Mirror json.dumps' (non-standard) spellings exactly.
            return "NaN" if v != v else ("Infinity" if v > 0 else "-Infinity")

        return _float
    if isinstance(dtype, T.TimestampType):
        return (
            lambda v: "null"
            if v is None
            else '"' + v.replace(tzinfo=None).isoformat(sep=" ") + '"'
        )
    if isinstance(dtype, T.DateType):
        return lambda v: "null" if v is None else '"' + v.isoformat() + '"'
    if isinstance(dtype, T.StringType):
        return lambda v: "null" if v is None else json.dumps(v)
    return None


def _line_builder(schema: StructType):
    """``fn(values_in_field_order) -> one JSONL line`` for flat
    primitive schemas, or None when any field needs the generic
    ``_jsonable`` walk (nested/decimal/binary)."""
    sers = [_field_serializer(f.dataType) for f in schema.fields]
    if any(s is None for s in sers):
        return None
    keys = [json.dumps(f.name) + ": " for f in schema.fields]

    def build(values) -> str:
        return (
            "{"
            + ", ".join(k + s(v) for k, s, v in zip(keys, sers, values))
            + "}\n"
        )

    return build


class JsonlSinkWriter(DataSourceArrowWriter):
    """Arrow-batched task writer: Spark ships each partition as
    ``pyarrow.RecordBatch`` (columnar, zero pickle row objects — the
    row-iterator writer variant measured ~2x slower on the same
    data). Serialization walks the batch COLUMN-WISE through the
    precompiled per-field serializers (r14, guide §4.2) — no per-row
    dict, no per-row json.dumps; the generic pylist-of-dicts path
    remains as the fallback for nested schemas."""

    def __init__(self, options: dict, schema: StructType, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_sink requires a 'path' option")
        self.fields = [f.name for f in schema.fields]
        self.schema = schema
        self.overwrite = overwrite

    # -- executor side ---------------------------------------------------
    def write(self, batches) -> _FileCommit:
        tmp_dir = os.path.join(self.path, "_tmp")
        os.makedirs(tmp_dir, exist_ok=True)
        name = f"{uuid.uuid4().hex}.jsonl"
        build = _line_builder(self.schema)
        n = 0
        with open(os.path.join(tmp_dir, name), "w") as f:
            for batch in batches:
                if build is not None:
                    # Fast path: one to_pylist per COLUMN (C loop), one
                    # precompiled format call per row.
                    idx = [
                        batch.schema.get_field_index(k) for k in self.fields
                    ]
                    cols = [batch.column(i).to_pylist() for i in idx]
                    f.writelines(map(build, zip(*cols)))
                    n += batch.num_rows
                else:
                    for rec in batch.to_pylist():
                        f.write(
                            json.dumps(
                                {k: _jsonable(rec[k]) for k in self.fields}
                            )
                            + "\n"
                        )
                        n += 1
        return _FileCommit(tmp_name=name, n_rows=n)

    # -- driver side, exactly once ---------------------------------------
    def commit(self, messages: list[_FileCommit]) -> None:
        tmp_dir = os.path.join(self.path, "_tmp")
        if self.overwrite:
            for entry in os.listdir(self.path):
                if entry == "_tmp":
                    continue
                full = os.path.join(self.path, entry)
                shutil.rmtree(full) if os.path.isdir(full) else os.remove(full)
        manifest = {"files": [], "total_rows": 0}
        for i, m in enumerate(messages):
            final = f"part-{i:05d}.jsonl"
            os.replace(
                os.path.join(tmp_dir, m.tmp_name),
                os.path.join(self.path, final),
            )
            manifest["files"].append({"name": final, "rows": m.n_rows})
            manifest["total_rows"] += m.n_rows
        shutil.rmtree(tmp_dir, ignore_errors=True)
        # Manifest LAST: its presence certifies a complete job.
        with open(os.path.join(self.path, "_SUCCESS"), "w") as f:
            json.dump(manifest, f)

    def abort(self, messages: list[_FileCommit]) -> None:
        shutil.rmtree(os.path.join(self.path, "_tmp"), ignore_errors=True)


class JsonlSinkDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "jsonl_sink"

    def schema(self) -> str:
        # Write-only source: schema comes from the frame being written.
        raise NotImplementedError("jsonl_sink is write-only")

    def writer(self, schema: StructType, overwrite: bool) -> JsonlSinkWriter:
        return JsonlSinkWriter(self.options, schema, overwrite)

    def streamWriter(self, schema: StructType, overwrite: bool):
        return JsonlSinkStreamWriter(self.options, schema)


def register_jsonl_sink(spark) -> None:
    spark.dataSource.register(JsonlSinkDataSource)


class JsonlSinkStreamWriter(DataSourceStreamWriter):
    """Streaming twin of the batch writer: the same tmp-file + rename
    protocol, committed PER MICROBATCH with epoch-tagged file names
    and an idempotence guard — if a batch id already appears in the
    manifest (a retried epoch after a driver restart replays the same
    batchId), commit drops the replayed files instead of appending
    duplicates. That is the checkpoint + idempotent-sink contract
    that makes file sinks exactly-once in Structured Streaming."""

    def __init__(self, options: dict, schema: StructType):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_sink requires a 'path' option")
        self.fields = [f.name for f in schema.fields]
        self.schema = schema

    def write(self, rows: Iterator[Row]) -> _FileCommit:
        tmp_dir = os.path.join(self.path, "_tmp")
        os.makedirs(tmp_dir, exist_ok=True)
        name = f"{uuid.uuid4().hex}.jsonl"
        build = _line_builder(self.schema)  # r14: precompiled per-field
        # serializers replace the per-row dict + json.dumps (guide §4.2);
        # Row iterates values in schema order, so build(row) matches the
        # old zip(self.fields, row) pairing exactly.
        n = 0
        with open(os.path.join(tmp_dir, name), "w") as f:
            if build is not None:
                for row in rows:
                    f.write(build(row))
                    n += 1
            else:
                for row in rows:
                    rec = {k: _jsonable(v) for k, v in zip(self.fields, row)}
                    f.write(json.dumps(rec) + "\n")
                    n += 1
        return _FileCommit(tmp_name=name, n_rows=n)

    def _manifest_path(self) -> str:
        return os.path.join(self.path, "_SUCCESS")

    def _load_manifest(self) -> dict:
        try:
            with open(self._manifest_path()) as f:
                return json.load(f)
        except FileNotFoundError:
            return {"files": [], "total_rows": 0, "epochs": []}

    def commit(self, messages, batchId: int) -> None:
        tmp_dir = os.path.join(self.path, "_tmp")
        manifest = self._load_manifest()
        # A _SUCCESS written by the BATCH writer has no 'epochs' key;
        # mixing a batch write and a streaming write on one directory
        # must not crash the stream commit (r6 advice item 1).
        manifest.setdefault("epochs", [])
        manifest.setdefault("files", [])
        manifest.setdefault("total_rows", 0)
        if batchId in manifest["epochs"]:
            # Replayed epoch: the previous attempt committed; drop the
            # replay's tmp files so retries never duplicate output.
            for m in messages:
                if m is not None:
                    try:
                        os.remove(os.path.join(tmp_dir, m.tmp_name))
                    except FileNotFoundError:
                        pass
            return
        for i, m in enumerate(messages):
            if m is None:
                continue
            final = f"part-e{batchId:05d}-{i:05d}.jsonl"
            os.replace(
                os.path.join(tmp_dir, m.tmp_name),
                os.path.join(self.path, final),
            )
            manifest["files"].append({"name": final, "rows": m.n_rows})
            manifest["total_rows"] += m.n_rows
        manifest["epochs"].append(batchId)
        tmp_manifest = self._manifest_path() + ".tmp"
        with open(tmp_manifest, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp_manifest, self._manifest_path())

    def abort(self, messages, batchId: int) -> None:
        tmp_dir = os.path.join(self.path, "_tmp")
        for m in messages:
            if m is not None:
                try:
                    os.remove(os.path.join(tmp_dir, m.tmp_name))
                except FileNotFoundError:
                    pass
