"""Custom connector via the Python DataSource API (Spark 4,
`pyspark.sql.datasource`) — the extension point for sources Spark has no
built-in reader for (internal REST services, bespoke binary formats,
feature stores). The reference's only ingestion path is files staged onto a
shared EFS mount (`tools/gridmr_submit.py` scp + `ControlServiceImpl`
chunking); a pluggable reader API is the Spark-native superset of that.

The demo source below is a deterministic synthetic-log generator:
- `partitions()` returns P independent row-range splits, so the scan is
  parallel and arbitrarily scalable (each executor materializes only its
  slice — nothing is staged centrally, unlike the reference's EFS copy).
- `read(partition)` yields plain tuples; all derived columns are modular
  arithmetic on the row id, so a SQL oracle (DuckDB generate_series) can
  re-derive every value exactly — the connector plumbing is what's under
  test, not randomness.

The full DataSource surface is implemented: batch reader, micro-batch
STREAM reader (row-id offsets checkpointed by the engine; partitions() per
micro-batch, so stream-scan parallelism is a source property), and both
writer sides — a JSON-lines sink whose files become visible only through
per-commit manifests (keyed by batchId on the streaming side), the
idempotence contract that yields exactly-once visibility under engine
retries. The sink paths use the local filesystem; on a real cluster the
same staging/manifest protocol targets a shared store (object storage) —
only the open/rename primitives change.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)


class _RangeSplit(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SynthLogReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("rows", 1000))
        if self.n_rows < 0:
            raise ValueError(f"synthlog: rows must be >= 0, got {self.n_rows}")
        # Clamp, don't raise: partitions is a parallelism hint, and 0 would
        # otherwise ZeroDivisionError in the ceil below.
        self.n_parts = max(1, int(options.get("partitions", 8)))

    def partitions(self):
        per = max(1, -(-self.n_rows // self.n_parts))  # ceil
        return [
            _RangeSplit(lo, min(lo + per, self.n_rows))
            for lo in range(0, self.n_rows, per)
        ]

    def read(self, partition):
        # service = i % 97, level = levels[(i*7) % 4], latency exact in double
        return _emit_rows(partition.start, partition.end)


def _emit_rows(start: int, end: int):
    """The shared deterministic row generator (batch scan, stream batches)."""
    levels = ("debug", "info", "warn", "error")
    for i in range(start, end):
        yield (
            i,
            i % 97,
            levels[(i * 7) % 4],
            float((i * i) % 1000) / 10.0,
        )


class SynthLogStreamReader(DataSourceStreamReader):
    """Micro-batch stream over the same synthetic log: the offset is the
    row id high-watermark (a JSON dict, checkpointed by the engine).
    ``latestOffset`` exposes everything up to ``rows`` — finite-snapshot
    semantics, like a static log directory — so each run drains the
    remaining range in one micro-batch and a restarted query resumes from
    the CHECKPOINTED offset, emitting only rows it has not yet committed
    (exactly-once across restarts; tests grow ``rows`` between runs to
    force multi-batch progressions). ``partitions(start, end)`` splits
    every micro-batch into independent row-range splits, so stream-scan
    parallelism is a source property exactly as in the batch reader."""

    def __init__(self, options):
        self.n_rows = int(options.get("rows", 1000))
        if self.n_rows < 0:
            raise ValueError(f"synthlog: rows must be >= 0, got {self.n_rows}")
        self.n_parts = max(1, int(options.get("partitions", 8)))

    def initialOffset(self):
        return {"offset": 0}

    def latestOffset(self):
        return {"offset": self.n_rows}

    def partitions(self, start, end):
        lo, hi = int(start["offset"]), int(end["offset"])
        if hi <= lo:
            return [_RangeSplit(lo, lo)]
        per = max(1, -(-(hi - lo) // self.n_parts))  # ceil
        return [_RangeSplit(a, min(a + per, hi)) for a in range(lo, hi, per)]

    def read(self, partition):
        return _emit_rows(partition.start, partition.end)

    def commit(self, end):
        pass  # nothing external to clean up: the source is deterministic


class _FileCommit(WriterCommitMessage):
    """Per-task commit message: the staged file (or None for empty tasks)."""

    def __init__(self, filename, n_rows):
        self.filename = filename
        self.n_rows = n_rows


class _JsonTaskWriter:
    """Task-side half of the sink, shared by batch and streaming writers:
    stage a JSON-lines file under <path>/data and report it for the driver
    to commit. Files are invisible to readers until a manifest lists them."""

    def __init__(self, path: str, schema):
        self.path = path
        self.fields = [f.name for f in schema.fields]

    def write(self, iterator):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId() if TaskContext.get() else 0
        fname = f"part-{pid:05d}-{uuid.uuid4().hex}.json"
        full = os.path.join(self.path, "data", fname)
        os.makedirs(os.path.dirname(full), exist_ok=True)
        n = 0
        with open(full, "w") as fh:
            for row in iterator:
                fh.write(json.dumps(dict(zip(self.fields, row))) + "\n")
                n += 1
        if n == 0:
            os.remove(full)
            return _FileCommit(None, 0)
        return _FileCommit(fname, n)


def _write_manifest(path: str, commit_id: str, messages, supersedes=None) -> bool:
    """Driver-side atomic commit: a manifest under <path>/_commits names the
    batch's files. Idempotent — a replayed commit (same id) is a no-op, which
    is what makes the sink exactly-once under engine retries. Returns True
    if this call created the manifest. ``supersedes`` (overwrite mode) lists
    earlier manifest names this commit replaces: readers skip superseded
    manifests, so the overwrite becomes visible atomically with THIS file's
    link — no delete-then-write window where the table reads empty."""
    files = [m.filename for m in messages if m is not None and m.filename]
    cdir = os.path.join(path, "_commits")
    os.makedirs(cdir, exist_ok=True)
    final = os.path.join(cdir, commit_id)
    if os.path.exists(final):
        return False
    tmp = os.path.join(cdir, f".{commit_id}.{uuid.uuid4().hex}.tmp")
    with open(tmp, "w") as fh:
        json.dump({"files": files, "supersedes": sorted(supersedes or [])}, fh)
    try:
        # On POSIX link+unlink refuses to clobber an existing manifest, so
        # concurrent duplicate commits resolve to exactly one winner.
        os.link(tmp, final)
    except FileExistsError:
        return False
    finally:
        os.remove(tmp)
    return True


def _abort_staged(path: str, messages) -> None:
    for m in messages:
        if m is not None and m.filename:
            try:
                os.remove(os.path.join(path, "data", m.filename))
            except FileNotFoundError:
                pass


class SynthLogBatchWriter(DataSourceWriter):
    def __init__(self, options, schema, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("synthlog sink requires a path (save(path) or option('path'))")
        self.task = _JsonTaskWriter(self.path, schema)
        self.overwrite = overwrite

    def write(self, iterator):
        return self.task.write(iterator)

    def commit(self, messages):
        if self.overwrite:
            # Atomic overwrite: the NEW manifest lists the manifests it
            # supersedes and lands first (link = the visibility flip), THEN
            # the superseded manifests and their now-invisible data files
            # are removed as best-effort cleanup. A crash at any point
            # leaves readers seeing either the old table or the new one,
            # never an empty or doubled one.
            cdir = os.path.join(self.path, "_commits")
            old_manifests = (
                sorted(f for f in os.listdir(cdir) if not f.startswith("."))
                if os.path.isdir(cdir)
                else []
            )
            # Deletable files come from EVERY manifest being removed —
            # including ones an earlier (crashed) overwrite already
            # superseded. committed_files() skips superseded manifests by
            # design (reader view), so using it here would leak the crashed
            # generation's data files in data/ forever.
            old_files = []
            for c in old_manifests:
                try:
                    with open(os.path.join(cdir, c)) as fh:
                        m = json.load(fh)
                except (FileNotFoundError, json.JSONDecodeError):
                    continue
                old_files.extend(
                    os.path.join(self.path, "data", f) for f in m["files"]
                )
            _write_manifest(
                self.path, f"batch-{uuid.uuid4().hex}", messages,
                supersedes=old_manifests,
            )
            for f in old_manifests:
                try:
                    os.remove(os.path.join(cdir, f))
                except FileNotFoundError:
                    pass
            for full in old_files:
                try:
                    os.remove(full)
                except FileNotFoundError:
                    pass
        else:
            _write_manifest(self.path, f"batch-{uuid.uuid4().hex}", messages)

    def abort(self, messages):
        _abort_staged(self.path, messages)


class SynthLogStreamWriter(DataSourceStreamWriter):
    """Streaming half of the sink: one manifest per micro-batch, keyed by
    batchId — the engine may retry a batch after failure, and the keyed
    idempotent manifest is exactly the contract that turns at-least-once
    delivery into exactly-once visibility."""

    def __init__(self, options, schema):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("synthlog sink requires a path (option('path'))")
        self.task = _JsonTaskWriter(self.path, schema)

    def write(self, iterator):
        return self.task.write(iterator)

    def commit(self, messages, batchId):
        _write_manifest(self.path, f"streambatch-{batchId}", messages)

    def abort(self, messages, batchId):
        _abort_staged(self.path, messages)


def committed_files(path: str) -> list[str]:
    """All data files named by any committed manifest (reader's view),
    skipping manifests an overwrite commit superseded — those may coexist
    with their replacement for the instant before cleanup (or forever, if
    the writer died mid-cleanup) without doubling the table."""
    cdir = os.path.join(path, "_commits")
    if not os.path.isdir(cdir):
        return []
    manifests = {}
    superseded: set[str] = set()
    for c in sorted(os.listdir(cdir)):
        if c.startswith("."):
            continue
        try:
            with open(os.path.join(cdir, c)) as fh:
                m = json.load(fh)
        except FileNotFoundError:
            # A concurrent overwrite commit deletes superseded manifests
            # right after linking its replacement; a manifest that vanished
            # between listdir and open is by construction superseded, so
            # skipping it preserves "readers see old or new, never an error".
            continue
        manifests[c] = m["files"]
        superseded.update(m.get("supersedes", []))
    out: list[str] = []
    for c in sorted(manifests):
        if c not in superseded:
            out.extend(manifests[c])
    return [os.path.join(path, "data", f) for f in out]


def read_committed(spark, path: str, schema: str):
    """Read back ONLY manifest-committed files (uncommitted staged files are
    invisible — the sink's atomicity contract)."""
    files = committed_files(path)
    if not files:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).json(files)


class SynthLogDataSource(DataSource):
    """spark.read.format("synthlog").option("rows", N) — register with
    spark.dataSource.register(SynthLogDataSource). Also serves
    readStream (micro-batch offsets over the same generator) and both
    writer sides (a manifest-committed JSON-lines sink)."""

    @classmethod
    def name(cls):
        return "synthlog"

    def schema(self):
        return "row_id bigint, service int, level string, latency_ms double"

    def reader(self, schema):
        return SynthLogReader(self.options)

    def streamReader(self, schema):
        return SynthLogStreamReader(self.options)

    def writer(self, schema, overwrite):
        return SynthLogBatchWriter(self.options, schema, overwrite)

    def streamWriter(self, schema, overwrite):
        return SynthLogStreamWriter(self.options, schema)


def register(spark) -> None:
    """Idempotent registration of the synthlog format on a session."""
    spark.dataSource.register(SynthLogDataSource)
