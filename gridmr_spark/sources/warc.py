"""WARC (ISO 28500) ingestion — the de-facto LLM-pipeline ingest format
(Common Crawl ships WARC), as a Python DataSource: ``format("warc")`` with
RECORD-BOUNDARY-SAFE byte-range partitioning, plus a writer so round-trip
fidelity is testable end to end.

This generalizes the reference's only ingest path — whole text files staged
onto a shared mount and split at line boundaries
(cpp/worker/src/common/fs.cc:28-53, tools/gridmr_submit.py:22-54) — to a
structured record format with the same split contract Spark's own
LineRecordReader uses:

- ``partitions()`` cuts every plain ``.warc`` file into ~``chunk_mb``
  byte ranges [lo, hi). A record belongs to the split containing its FIRST
  byte; a split may read payload bytes past its ``hi`` to finish its last
  record, and a split whose range begins mid-record skips forward to the
  next record start. Every record is read exactly once, for any chunk
  size — asserted by tests/test_warc.py over boundary-straddling records.
- Mid-range sync scans for ``\\r\\n\\r\\nWARC/1.0\\r\\n`` and VALIDATES the
  candidate by parsing its header block (version line + Content-Length);
  an unlucky payload containing the delimiter is rejected by validation
  and scanning continues. (Uncompressed WARC has no escaping, so sync is
  necessarily heuristic — the same trade every Hadoop WARC reader makes;
  Common Crawl's per-record-gzip-member layout exists precisely so that
  splitters can use member boundaries instead.)
- ``.warc.gz`` files larger than one chunk are split by GZIP MEMBER
  boundaries (Common Crawl compresses each record as its own member for
  exactly this reason): compressed byte ranges [lo, hi) sync forward to
  the first gzip magic that VALIDATES (decompresses to a well-formed WARC
  header — the same scan-plus-validate trade as the plain-file sync), and
  a member belongs to the split containing its first compressed byte. A
  split keeps decompressing across member boundaries until its last
  record completes, and stops when a record would begin exactly at a
  member starting at-or-past ``hi`` — so archives whose members straddle
  records, and even single-member streams (no internal sync points:
  split 0 reads everything, the rest sync to nothing), parse exactly
  once at ANY chunk size (asserted by tests/test_warc.py). For gz
  records, ``offset`` is the COMPRESSED offset of the record's member —
  the locator a ranged re-fetch needs.

Reader schema (all splits)::

    record_id string, warc_type string, target_uri string, warc_date string,
    content_type string, content_length long, payload binary,
    file string, offset long

The writer (``df.write.format("warc").mode(...).save(path)``) emits one
``part-*.warc`` file per task with standard WARC/1.0 response records;
required input columns ``target_uri`` (string) and ``payload`` (binary),
optional ``record_id``/``warc_type``/``warc_date``/``content_type``
override the deterministic defaults. Files stage dot-prefixed and rename
into place on task success; readers ignore dotfiles, so partially-written
tasks are never visible.
"""

from __future__ import annotations

import glob as _glob
import gzip
import hashlib
import os
import time
import uuid
import zlib

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

_MAGIC = b"WARC/1.0\r\n"
_SEP = b"\r\n\r\n"
_SCHEMA = (
    "record_id string, warc_type string, target_uri string, warc_date string, "
    "content_type string, content_length long, payload binary, "
    "file string, offset long"
)
_MAX_HEADER = 64 * 1024  # spec headers are tiny; 64 KB is a hard sanity cap


class _WarcSplit(InputPartition):
    def __init__(self, path: str, start: int, end: int | None, gz: bool = False):
        self.path = path
        self.start = start
        self.end = end  # None => gzip stream, parse to EOF
        self.gz = gz  # True => [start, end) is a COMPRESSED member range


def _list_warc_files(path: str, missing_ok: bool = False) -> list[str]:
    """Expand a file, directory, or glob into the sorted file list,
    skipping in-flight dot-prefixed staging files. With ``missing_ok``
    (the streaming path), a not-yet-created directory is simply an empty
    listing — a stream started before its producer must idle at the empty
    offset, not crash; the batch reader keeps the loud error."""
    if os.path.isdir(path):
        names = [
            os.path.join(path, f)
            for f in os.listdir(path)
            if not f.startswith(".") and (f.endswith(".warc") or f.endswith(".warc.gz"))
        ]
    elif os.path.isfile(path):
        names = [path]
    else:
        names = [
            f for f in _glob.glob(path) if not os.path.basename(f).startswith(".")
        ]
    if not names and not os.path.isdir(path) and not missing_ok:
        raise FileNotFoundError(f"warc: no input files at {path!r}")
    return sorted(names)


def _parse_header_block(buf: bytes):
    """Parse one record's header block from ``buf`` starting at offset 0.
    Returns (headers dict, header_block_len incl. terminating CRLFCRLF) or
    None if ``buf`` does not start a well-formed WARC/1.0 record."""
    if not buf.startswith(b"WARC/"):
        return None
    hend = buf.find(_SEP, 0, _MAX_HEADER)
    if hend < 0:
        return None
    headers: dict[str, str] = {}
    lines = buf[:hend].split(b"\r\n")
    for line in lines[1:]:  # lines[0] is the version line
        k, sep, v = line.partition(b":")
        if not sep:
            return None
        try:
            headers[k.strip().decode("utf-8").lower()] = v.strip().decode("utf-8")
        except UnicodeDecodeError:
            return None
    if "content-length" not in headers or not headers["content-length"].isdigit():
        return None
    return headers, hend + len(_SEP)


def _parse_records(produce, fname: str, start_pos: int, stop_before=None,
                   offset_for=None, loc=None):
    """The single WARC record-parse state machine, shared by the plain and
    gzip readers (one definition: a header-handling fix cannot drift
    between them). ``produce()`` returns the next raw chunk (b'' at end of
    input); ``stop_before(pos)`` is consulted once per record start, after
    the parser is byte-aligned there, and ends the split; ``offset_for``
    maps the parse position to the emitted offset column (plain: the byte
    position itself; gz: the record's member compressed offset); ``loc``
    renders positions in error messages."""
    pos = start_pos
    buf = b""
    exhausted = False
    offset_for = offset_for or (lambda p: p)
    loc = loc or (lambda p: f"{fname}:{p}")
    while True:
        # top up the buffer until the header block is complete
        while _SEP not in buf[: _MAX_HEADER + len(_SEP)] and not exhausted:
            chunk = produce()
            if not chunk:
                exhausted = True
                break
            buf += chunk
        if not buf:
            return
        if stop_before is not None and stop_before(pos):
            return
        parsed = _parse_header_block(buf)
        if parsed is None:
            raise ValueError(
                f"warc: malformed record at {loc(pos)} (bytes: {buf[:40]!r})"
            )
        headers, hlen = parsed
        clen = int(headers["content-length"])
        need = hlen + clen + len(_SEP)
        while len(buf) < need and not exhausted:
            chunk = produce()
            if not chunk:
                exhausted = True
                break
            buf += chunk
        payload = buf[hlen : hlen + clen]
        if len(payload) < clen:
            raise ValueError(f"warc: truncated payload at {loc(pos)}")
        yield (
            headers.get("warc-record-id"),
            headers.get("warc-type"),
            headers.get("warc-target-uri"),
            headers.get("warc-date"),
            headers.get("content-type"),
            clen,
            payload,
            fname,
            offset_for(pos),
        )
        # spec: every record is followed by CRLFCRLF; tolerate EOF instead
        tail = buf[hlen + clen : need]
        if tail not in (_SEP, _SEP[: len(tail)]):
            raise ValueError(f"warc: missing record separator at {loc(pos)}")
        buf = buf[need:]
        pos += need


def _read_records(fh, base_offset: int, end: int | None, fname: str):
    """Yield schema rows for records starting at stream offsets in
    [base_offset, end) (end=None: to EOF). ``fh`` must be positioned at
    ``base_offset``, which must be a record start. Reads sequentially —
    no seeks."""
    return _parse_records(
        lambda: fh.read(1 << 20),
        fname,
        base_offset,
        stop_before=(None if end is None else (lambda p: p >= end)),
    )


class _MemberWalker:
    """Sequential decompressor over a CONCATENATED-gzip stream starting at
    a member boundary, tracking every member transition as
    ``(decomp_pos, comp_pos)`` — the bookkeeping the split stop-rule and
    the per-record member ``offset`` need. Invariant: every compressed
    byte read from ``fh`` is either consumed by the current decompressor
    or sitting in ``self.pending``, so the next member's compressed
    offset is always ``comp_read - len(pending)``."""

    def __init__(self, fh, comp_start: int):
        fh.seek(comp_start)
        self.fh = fh
        self.d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        self.comp_read = comp_start
        self.pending = b""
        self.decomp_total = 0
        self.boundaries: list[tuple[int, int]] = []  # upcoming member starts

    def produce(self) -> bytes:
        """Next chunk of decompressed bytes; b'' at end of file."""
        while True:
            if self.d.eof:
                self.pending = self.d.unused_data + self.pending
                if not self.pending:
                    chunk = self.fh.read(1 << 20)
                    if not chunk:
                        return b""
                    self.comp_read += len(chunk)
                    self.pending = chunk
                next_comp = self.comp_read - len(self.pending)
                self.boundaries.append((self.decomp_total, next_comp))
                self.d = zlib.decompressobj(16 + zlib.MAX_WBITS)
            if not self.pending:
                chunk = self.fh.read(1 << 20)
                if not chunk:
                    raise ValueError("warc: truncated gzip member")
                self.comp_read += len(chunk)
                self.pending = chunk
            out = self.d.decompress(self.pending)
            self.pending = b""
            if out:
                self.decomp_total += len(out)
                return out


def _gz_records(path: str, start: int, hi: int | None, fname: str):
    """Yield records from a concatenated-gzip WARC, beginning at member
    offset ``start`` (must be a validated member start, or 0). Stops when
    a record would BEGIN exactly at a member boundary whose compressed
    offset is >= ``hi`` — that member is the next split's sync anchor, so
    together the splits parse every record exactly once, including
    records that straddle member boundaries (this split finishes them;
    the next split's sync skips the non-record-aligned member).
    ``hi=None``: parse to EOF. Record ``offset`` = compressed offset of
    the record's member."""
    with open(path, "rb") as fh:
        w = _MemberWalker(fh, start)
        # member containing the next record's first byte, advanced by the
        # stop-rule hook (which runs once per record start, byte-aligned)
        state = {"member_comp": start}

        def stop_before(pos: int) -> bool:
            boundary_here = None
            while w.boundaries and w.boundaries[0][0] <= pos:
                dpos, cpos = w.boundaries.pop(0)
                state["member_comp"] = cpos
                boundary_here = (dpos, cpos)
            return (
                hi is not None
                and boundary_here is not None
                and boundary_here[0] == pos
                and boundary_here[1] >= hi
            )

        yield from _parse_records(
            w.produce,
            fname,
            0,  # decompressed offset, anchor-relative
            stop_before=stop_before,
            offset_for=lambda p: state["member_comp"],
            loc=lambda p: f"{fname}:gz+{p}",
        )


_GZ_MAGIC = b"\x1f\x8b\x08"


def _probe_warc_member(fh, cand: int) -> bytes | None:
    """Decompress up to one header block's worth of bytes starting at
    candidate member offset ``cand``, CROSSING member boundaries. The
    crossing matters for the split-handoff symmetry: a record-aligned
    member can be SMALLER than its record's header block (an archiver
    that flushes members at arbitrary byte counts), and the previous
    split's stop rule hands over at that boundary — so the validator must
    see the header the way the reader will, by continuing into the
    following members. Returns decompressed bytes (possibly short at
    EOF), or None when ``cand`` does not start a gzip member."""
    save = fh.tell()
    fh.seek(cand)
    need = _MAX_HEADER + len(_SEP)
    out = b""
    d = zlib.decompressobj(16 + zlib.MAX_WBITS)
    pending = b""
    try:
        while len(out) < need:
            if d.eof:
                pending = d.unused_data + pending
                d = zlib.decompressobj(16 + zlib.MAX_WBITS)
            if not pending:
                chunk = fh.read(1 << 18)
                if not chunk:
                    break
                pending = chunk
            out += d.decompress(pending)
            pending = b""
    except zlib.error:
        # error before ANY output: not a member start. Error after some
        # output (e.g. trailing junk in a later member): validate what we
        # have — a false candidate won't parse as a WARC header anyway.
        if not out:
            out = None
    fh.seek(save)
    return out


def _sync_to_gz_member(fh, start: int, hi: int) -> int | None:
    """First VALIDATED gzip member start in [start, hi): scan the
    compressed bytes for the gzip magic and accept a candidate only if a
    probe decompression (member-crossing — see ``_probe_warc_member``)
    yields a well-formed WARC header (same scan-plus-validate heuristic
    as ``_sync_to_record``; a false magic inside compressed data fails
    the probe and scanning continues). Returns None when the range holds
    no member start — which is exactly what makes single-member streams
    safe: every split but the first syncs to nothing, and split 0 reads
    to EOF."""
    if start == 0:
        return 0
    fh.seek(start)
    window = b""
    wbase = start
    while wbase < hi:
        chunk = fh.read(1 << 20)
        window += chunk
        at = 0
        while True:
            hit = window.find(_GZ_MAGIC, at)
            if hit < 0 or wbase + hit >= hi:
                break
            cand = wbase + hit
            probe = _probe_warc_member(fh, cand)
            if (
                probe
                and probe.startswith(b"WARC/")
                and _parse_header_block(probe) is not None
            ):
                return cand
            at = hit + 1
        if not chunk:
            return None
        keep = len(_GZ_MAGIC) - 1
        if len(window) > keep:
            wbase += len(window) - keep
            window = window[-keep:]
    return None


def _sync_to_record(fh, start: int, fsize: int) -> int | None:
    """First record start at-or-after ``start`` in a plain file, validated
    by a header parse; None when the range holds no record start. Scans
    from start - len(SEP) so a record beginning exactly AT ``start`` (whose
    preceding separator lies before the range) is found."""
    if start == 0:
        return 0
    pat = _SEP + _MAGIC
    scan_from = max(0, start - len(_SEP))
    fh.seek(scan_from)
    window = b""
    wbase = scan_from
    while True:
        chunk = fh.read(1 << 20)
        window += chunk
        at = 0
        while True:
            hit = window.find(pat, at)
            if hit < 0:
                break
            cand = wbase + hit + len(_SEP)
            if cand >= start:
                # validate: the candidate must parse as a record header
                save = fh.tell()
                fh.seek(cand)
                probe = fh.read(_MAX_HEADER + len(_SEP))
                fh.seek(save)
                if _parse_header_block(probe) is not None:
                    return cand
            at = hit + 1
        if not chunk:
            return None
        # keep only a seam's worth of residue to bound memory
        keep = len(pat) - 1
        if len(window) > keep:
            wbase += len(window) - keep
            window = window[-keep:]


def _file_splits(f: str, chunk: int) -> list[_WarcSplit]:
    """Byte-range splits for ONE file — the single definition of the
    split contract, shared by the batch reader, the stream reader, and
    the Arrow scan (a contract change lands in exactly one place).
    Gzip archives bigger than one chunk split on COMPRESSED member
    ranges (sync + stop rule in ``_gz_records``); smaller ones — and
    therefore also single-member streams below the chunk size — stay one
    whole-stream split."""
    size = os.path.getsize(f)
    if f.endswith(".gz"):
        if size <= chunk:
            return [_WarcSplit(f, 0, None)]
        return [
            _WarcSplit(f, lo, min(lo + chunk, size), gz=True)
            for lo in range(0, size, chunk)
        ]
    return [
        _WarcSplit(f, lo, min(lo + chunk, size))
        for lo in range(0, max(size, 1), chunk)
    ]


class WarcReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("warc source requires a path (load(path) or option('path'))")
        chunk_mb = float(options.get("chunk_mb", 64))
        # floor of 4 KB keeps degenerate options from exploding the split
        # count; tests use small chunks to force boundary straddling
        self.chunk = max(4096, int(chunk_mb * 1024 * 1024))

    def partitions(self):
        splits: list[_WarcSplit] = []
        for f in _list_warc_files(self.path):
            splits.extend(_file_splits(f, self.chunk))
        return splits or [_WarcSplit("", 0, 0)]

    def read(self, split):
        if not split.path:
            return
        fname = os.path.basename(split.path)
        if split.end is None:
            # whole gzip stream: same member walker as ranged splits, so
            # `offset` (member compressed offset) is consistent either way
            yield from _gz_records(split.path, 0, None, fname)
            return
        if getattr(split, "gz", False):
            with open(split.path, "rb") as fh:
                first = _sync_to_gz_member(fh, split.start, split.end)
            if first is None:
                return
            yield from _gz_records(split.path, first, split.end, fname)
            return
        with open(split.path, "rb") as fh:
            fsize = os.path.getsize(split.path)
            first = _sync_to_record(fh, split.start, fsize)
            if first is None or first >= split.end:
                return
            fh.seek(first)
            yield from _read_records(fh, first, split.end, fname)


def format_record(
    target_uri: str,
    payload: bytes,
    record_id: str | None = None,
    warc_type: str = "response",
    warc_date: str = "2026-01-01T00:00:00Z",
    content_type: str = "text/plain",
) -> bytes:
    """One standard WARC/1.0 record. The default record id is deterministic
    (md5 of uri+payload as a urn:uuid) so round-trip fixtures are stable."""
    if record_id is None:
        h = hashlib.md5(target_uri.encode() + b"\x00" + payload).hexdigest()
        record_id = f"<urn:uuid:{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:32]}>"
    head = (
        f"WARC/1.0\r\n"
        f"WARC-Type: {warc_type}\r\n"
        f"WARC-Record-ID: {record_id}\r\n"
        f"WARC-Date: {warc_date}\r\n"
        f"WARC-Target-URI: {target_uri}\r\n"
        f"Content-Type: {content_type}\r\n"
        f"Content-Length: {len(payload)}\r\n"
        f"\r\n"
    ).encode("utf-8")
    return head + payload + _SEP


class _WarcCommit(WriterCommitMessage):
    def __init__(self, filename):
        self.filename = filename


class WarcWriter(DataSourceWriter):
    def __init__(self, options, schema: StructType, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("warc sink requires a path (save(path))")
        self.overwrite = overwrite
        names = [f.name for f in schema.fields]
        for req in ("target_uri", "payload"):
            if req not in names:
                raise ValueError(f"warc sink input must have a {req!r} column")
        self.idx = {n: i for i, n in enumerate(names)}
        # Per-job prefix, stamped once on the DRIVER and pickled into every
        # task: lets commit() reconcile THIS job's files against its commit
        # messages in append mode too, so a duplicated task attempt
        # (speculation / retry where both attempts rename their
        # uniquely-named part files) can't leave an orphan .warc that
        # readers would see as duplicate records.
        # Monotonic prefix (zero-padded epoch-millis + random tail): the
        # stream reader's offset is the lexicographic max file name, so a
        # later append job's files MUST sort after every existing file —
        # a purely random prefix would land below the checkpointed
        # high-water ~50% of the time and the stream would silently skip
        # the whole job. 15 digits of millis keeps the ordering until year
        # ~33658; the uuid tail disambiguates two jobs in the same ms.
        self.job_prefix = (
            f"job-{int(time.time() * 1000):015d}-{uuid.uuid4().hex[:8]}"
        )

    def write(self, iterator):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId() if TaskContext.get() else 0
        os.makedirs(self.path, exist_ok=True)
        fname = f"{self.job_prefix}-part-{pid:05d}-{uuid.uuid4().hex}.warc"
        tmp = os.path.join(self.path, f".{fname}")
        idx = self.idx
        n = 0

        def opt(row, col):
            return row[idx[col]] if col in idx and row[idx[col]] is not None else None

        with open(tmp, "wb") as fh:
            for row in iterator:
                payload = row[idx["payload"]]
                kwargs = {}
                for col in ("record_id", "warc_type", "warc_date", "content_type"):
                    v = opt(row, col)
                    if v is not None:
                        kwargs[col] = v
                fh.write(
                    format_record(row[idx["target_uri"]], bytes(payload), **kwargs)
                )
                n += 1
        if n == 0:
            os.remove(tmp)
            return _WarcCommit(None)
        os.rename(tmp, os.path.join(self.path, fname))  # task-level atomicity
        return _WarcCommit(fname)

    def commit(self, messages):
        new = {m.filename for m in messages if m is not None and m.filename}
        for f in os.listdir(self.path):
            if f.startswith(".") or not f.endswith(".warc") or f in new:
                continue
            mine = f.startswith(self.job_prefix + "-")
            # Overwrite replaces the directory: drop every uncommitted file.
            # Append keeps other jobs' output but still reconciles THIS
            # job's files against its commit messages (duplicate-attempt
            # orphans carry our prefix and are not in `new`).
            if self.overwrite or mine:
                os.remove(os.path.join(self.path, f))

    def abort(self, messages):
        for m in messages:
            if m is not None and m.filename:
                try:
                    os.remove(os.path.join(self.path, m.filename))
                except FileNotFoundError:
                    pass


class WarcStreamReader(DataSourceStreamReader):
    """Micro-batch ingestion of ARRIVING crawl segments: each offset is the
    lexicographic high-water file name under the directory, so a restart
    resumes from the checkpointed name and every record is delivered
    exactly once (Common Crawl segment names — and this writer's part
    names — sort monotonically; a producer with non-monotone names needs a
    manifest, which is what sources/pyds.py demonstrates). Every new file
    is chunked with the SAME byte-range splits as the batch reader, so
    stream-scan parallelism per micro-batch matches batch-scan
    parallelism."""

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("warc stream requires a directory path")
        chunk_mb = float(options.get("chunk_mb", 64))
        self.chunk = max(4096, int(chunk_mb * 1024 * 1024))

    def initialOffset(self):
        return {"upto": ""}

    def latestOffset(self):
        files = [
            os.path.basename(f)
            for f in _list_warc_files(self.path, missing_ok=True)
        ]
        return {"upto": max(files) if files else ""}

    def partitions(self, start, end):
        lo, hi = start["upto"], end["upto"]
        splits: list[_WarcSplit] = []
        for f in _list_warc_files(self.path, missing_ok=True):
            name = os.path.basename(f)
            if not (lo < name <= hi):
                continue
            splits.extend(_file_splits(f, self.chunk))
        return splits or [_WarcSplit("", 0, 0)]

    def read(self, partition):
        return WarcReader.read(self, partition)  # identical record parse

    def commit(self, end):
        pass  # nothing external to clean up


class WarcDataSource(DataSource):
    """spark.read.format("warc").option("chunk_mb", 64).load(path) /
    spark.readStream.format("warc") over a growing directory /
    df.write.format("warc").save(path) — register with
    spark.dataSource.register(WarcDataSource)."""

    @classmethod
    def name(cls):
        return "warc"

    def schema(self):
        return _SCHEMA

    def reader(self, schema):
        return WarcReader(self.options)

    def streamReader(self, schema):
        return WarcStreamReader(self.options)

    def writer(self, schema, overwrite: bool):
        return WarcWriter(self.options, schema, overwrite)


def register(spark) -> None:
    """Idempotent registration of the warc format on a session."""
    spark.dataSource.register(WarcDataSource)


# ---------------------------------------------------------------------------
# Arrow-batched batch scan: same split contract, columnar record transfer
# ---------------------------------------------------------------------------


def _plan_splits(path: str, chunk: int) -> list[tuple[str, int, int, bool]]:
    """The batch reader's split plan as plain rows (end=-1 marks a gzip
    stream parsed to EOF; gz=True a compressed member range) — the same
    ``_file_splits`` contract the DataSource readers use, flattened for
    shipping in a DataFrame."""
    return [
        (s.path, s.start, -1 if s.end is None else s.end, s.gz)
        for f in _list_warc_files(path)
        for s in _file_splits(f, chunk)
    ]


def read_warc_arrow(spark, path: str, chunk_mb: float = 64):
    """Batch WARC scan with COLUMNAR record transfer: splits are planned on
    the driver (identical byte-range/record-boundary contract as
    ``format("warc")`` — same ``_sync_to_record``/``_read_records`` parse),
    shipped as a one-row-per-split DataFrame, and each split is parsed
    inside ``mapInArrow``, accumulating records into pyarrow RecordBatches.

    Why next to the DataSource reader, and MEASURED honestly: the
    hypothesis was that the DataSource API's per-record iterator protocol
    dominates at scale and columnar accumulation would cut it ~10×. It
    does not — pyspark 4's Python DataSource worker already batches the
    yielded tuples into Arrow internally, so at 400k records the two paths
    time within 3% of each other (and at 5k records the Arrow path's
    fixed task-planning overhead makes it slightly SLOWER). This function
    stays because (a) it proves the equivalence claim with a test rather
    than an assumption, (b) it is the seam a true JVM-side reader would
    plug into (plan splits → JVM parse), and (c) mapInArrow gives callers
    a place to fuse per-record work (e.g. gunzip+extract) into the scan
    without a second Python hop. The registered queries keep the
    DataSource path — same speed, plus streaming/checkpoint support.
    Schema and record semantics are byte-identical — asserted by
    tests/test_warc.py.
    """
    import pyarrow as pa

    chunk = max(4096, int(chunk_mb * 1024 * 1024))
    splits = _plan_splits(path, chunk)
    if not splits:
        raise FileNotFoundError(f"warc: no input files at {path!r}")
    # one split per partition WITHOUT a shuffle: parallelize with exact
    # slice count (a repartition here would add a whole exchange stage
    # just to spread a few-KB task list)
    sdf = spark.createDataFrame(
        spark.sparkContext.parallelize(splits, len(splits)),
        "path string, start long, end long, gz boolean",
    )

    arrow_schema = pa.schema(
        [
            ("record_id", pa.string()),
            ("warc_type", pa.string()),
            ("target_uri", pa.string()),
            ("warc_date", pa.string()),
            ("content_type", pa.string()),
            ("content_length", pa.int64()),
            ("payload", pa.binary()),
            ("file", pa.string()),
            ("offset", pa.int64()),
        ]
    )
    # flush thresholds: bound worker memory regardless of payload sizes
    max_rows, max_bytes = 4096, 32 * 1024 * 1024

    def parse(batches):
        def flush(cols):
            return pa.RecordBatch.from_arrays(
                [pa.array(c, type=f.type) for c, f in zip(cols, arrow_schema)],
                schema=arrow_schema,
            )

        for batch in batches:
            for task in batch.to_pylist():
                fpath, start, end = task["path"], task["start"], task["end"]
                fname = os.path.basename(fpath)
                cols = [[] for _ in range(9)]
                nbytes = 0
                fh = None
                if end == -1:
                    records = _gz_records(fpath, 0, None, fname)
                elif task["gz"]:
                    with open(fpath, "rb") as sfh:
                        first = _sync_to_gz_member(sfh, start, end)
                    if first is None:
                        continue
                    records = _gz_records(fpath, first, end, fname)
                else:
                    fh = open(fpath, "rb")
                    first = _sync_to_record(fh, start, os.path.getsize(fpath))
                    if first is None or first >= end:
                        fh.close()
                        continue
                    fh.seek(first)
                    records = _read_records(fh, first, end, fname)
                try:
                    for rec in records:
                        for c, v in zip(cols, rec):
                            c.append(v)
                        nbytes += rec[5]
                        if len(cols[0]) >= max_rows or nbytes >= max_bytes:
                            yield flush(cols)
                            cols = [[] for _ in range(9)]
                            nbytes = 0
                finally:
                    if fh is not None:
                        fh.close()
                if cols[0]:
                    yield flush(cols)

    return sdf.mapInArrow(parse, _SCHEMA)
