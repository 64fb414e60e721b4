"""Minimal manifest-committed table format: snapshots, time travel,
incremental reads.

The Iceberg/Delta core contract, reduced to the piece a query engine needs
and nothing else: a table is a directory whose STATE is defined solely by
the latest manifest file — an atomically-published JSON listing every data
file in the snapshot. That single indirection buys the three guarantees a
100 TB pipeline actually relies on:

- **Snapshot isolation / time travel**: readers resolve a manifest once and
  read exactly its file list; a concurrent commit cannot change or tear the
  set mid-scan, and any historical version stays readable forever (until
  expired) because manifests are immutable.
- **Atomic commits with optimistic concurrency**: data files are written
  first into a uniquely-suffixed directory (invisible — no manifest
  references them), then the manifest is published via EXCLUSIVE-create
  (``os.link`` of a fully-written temp file — atomic on POSIX and it FAILS
  if the version already exists). Two writers racing to commit the same
  version therefore produce exactly one winner; the loser raises
  :class:`ConcurrentCommitError` (the Delta/Iceberg optimistic-concurrency
  contract) and its data directory becomes an orphan no reader ever sees,
  reclaimed by ``vacuum_orphans``. A crash between data write and manifest
  publish leaves the same kind of orphan — and because every write attempt
  gets a fresh directory, the RETRIED commit succeeds rather than
  colliding with the torn leftovers.
- **Incremental reads**: version N's manifest records which files it ADDED,
  so "what changed between v_from and v_to" is a file-list difference — the
  O(delta) input that feeds `agg_incremental_merge` / `incremental_join_view`
  style maintenance instead of a full-table rescan.

Also in scope (grown over round 8): idempotent commits (exactly-once
streaming sink), ``replace`` (streaming materialized views), copy-on-write
``delete_where``, ``compact`` + ``expire`` + ``vacuum_orphans``
maintenance, a changelog STREAMING SOURCE over the version log, and
schema-evolution reads (``read(merge_schema=True)``).

Manifests are TWO-LEVEL (round 10, Iceberg's shape): the published
per-version snapshot manifest is a small MANIFEST LIST — one entry per
immutable FILE-GROUP manifest (``_manifests/groups/g-*.json``), each
carrying a file count and a per-column [min, max] SUMMARY envelope — and
the group manifests hold the actual file paths + per-file stats. This is
what keeps metadata O(right thing) at 100 TB:

- a commit writes ONE group manifest for its delta plus a snapshot
  manifest of size O(#groups) — the full cumulative file list is never
  rewritten (the single-level format paid O(#files) JSON per commit,
  which is the classic metadata scale-killer);
- ``pruned_files`` checks predicates against the GROUP summaries first
  and opens only the group manifests whose envelope intersects — a
  point/range probe on a clustered table touches O(matching groups)
  metadata, not O(#files);
- groups are immutable and shared across snapshots (restore/clone are
  pure manifest-list writes; stats ride with the group, so nothing needs
  wholesale stats-carrying anymore).

Single-level (format-1) manifests remain readable for old tables.

Deliberately out of scope (documented, not half-built): merge-on-read
delete vectors (COW is the honest choice at this complexity budget).

Reference parity: SebasUr/GridMR's data plane is bare files on a shared FS
(cpp/worker/src/common/fs.cc) with no versioning; this module is part of
the §2.D storage surface built beyond it.
"""

from __future__ import annotations

import glob
import json
import os
import re
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession

from gridmr_spark.functions.localdata import local_df


class PublishBackend:
    """Storage-backend seam for the format's ONE publish discipline
    (snapshot manifests, branch/tag refs, and the cross-table catalog all
    publish through it — see ``_exclusive_publish_json``).

    Contract — ``create_exclusive(path, data)``:

    * Atomically create the object at ``path`` with exactly ``data`` IFF
      no object exists there; return True.
    * If an object already exists, create NOTHING and return False.
      Losing must be side-effect-free: a reader listing or opening
      ``path`` at any instant sees either no object or one complete
      winning payload — never a torn or losing write.
    * "Exists" races resolve to exactly one winner among concurrent
      callers (this is what makes version numbers a total order).

    Implementations:

    * :class:`PosixLinkBackend` (default) — write a uniquely-named temp
      file, ``os.link`` to the final name (atomic + EEXIST-failing on
      POSIX, including NFS). Right for local/NFS/HDFS-mounted roots.
    * An S3-class object store implements the same contract with ONE
      conditional PUT: ``PUT path`` with ``If-None-Match: *`` (S3,
      GCS ``x-goog-if-generation-match: 0``, Azure ``If-None-Match: *``)
      — 2xx -> True, 412 Precondition Failed -> False. No temp object is
      needed: a conditional PUT is already all-or-nothing. Not bundled
      here (no cloud SDKs in this environment); swap via
      :func:`set_publish_backend`.
    """

    def create_exclusive(self, path: str, data: bytes) -> bool:  # pragma: no cover - interface
        raise NotImplementedError


class PosixLinkBackend(PublishBackend):
    """Default backend: temp file + ``os.link`` exclusive-create. The
    temp file is always removed; stale temps from crashes match the
    ``.*.tmp`` vacuum glob."""

    def create_exclusive(self, path: str, data: bytes) -> bool:
        dirpath = os.path.dirname(path)
        os.makedirs(dirpath, exist_ok=True)
        tmp = os.path.join(
            dirpath, f".{os.path.basename(path)}.{uuid.uuid4().hex[:8]}.tmp"
        )
        with open(tmp, "wb") as f:
            f.write(data)
        try:
            os.link(tmp, path)
            return True
        except FileExistsError:
            return False
        finally:
            os.unlink(tmp)


_PUBLISH_BACKEND: PublishBackend = PosixLinkBackend()


def set_publish_backend(backend: PublishBackend) -> PublishBackend:
    """Swap the process-wide publish backend (e.g. for an object-store
    implementation, or a fake in tests); returns the previous backend so
    callers can restore it."""
    global _PUBLISH_BACKEND
    prev, _PUBLISH_BACKEND = _PUBLISH_BACKEND, backend
    return prev


def _exclusive_publish_json(dirpath: str, final_name: str, payload: dict, on_exists) -> None:
    """The format's one publish discipline, shared by snapshot manifests,
    tags, and the cross-table catalog (catalog_txn.py): serialize the full
    payload, then hand the bytes to the configured :class:`PublishBackend`
    for an atomic exclusive create. When another writer already published
    the name, ``on_exists()`` is called (it must raise)."""
    data = json.dumps(payload, indent=1).encode("utf-8")
    if not _PUBLISH_BACKEND.create_exclusive(
        os.path.join(dirpath, final_name), data
    ):
        on_exists()


def _uri_to_path(u: str) -> str:
    """A scan-provenance file URI (possibly file:// + percent-encoded)
    back to a filesystem path — the single normalizer every DV/provenance
    consumer shares (materialize_dv, _compact_dv, _match_manifest_files,
    _stream_dv_map); keep in sync with how _metadata.file_path spells
    paths."""
    from urllib.parse import unquote, urlparse

    return unquote(urlparse(u).path) if u.startswith("file:") else u


def _norm(p: str) -> str:
    """Canonical spelling for path liveness tests: manifests record paths
    as they were spelled at commit time (absolute, but possibly through a
    symlink or a different CWD-relative root), while maintenance ops glob
    the filesystem — realpath both sides so GC never mistakes a live file
    for garbage over a spelling difference."""
    return os.path.realpath(p)


def _file_column_stats(path: str) -> dict:
    """Per-column [min, max] from a parquet file's FOOTER (no data read):
    aggregated across row groups, kept only for JSON-representable scalar
    types (int/float/str/bool) with complete statistics — absent stats
    mean "unknown", which readers treat as unprunable, never as empty.
    NaN floats poison min/max ordering and are skipped wholesale.

    String stats are safe to prune on even when the writer truncates
    them: parquet-mr's statistics truncator is bound-preserving by
    contract (truncated min is a prefix of — hence <= — the true min;
    truncated max has its last byte incremented so it stays an upper
    bound), so an intersect test against [min, max] can only KEEP extra
    files, never skip a matching one."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    out: dict[str, list] = {}
    for j in range(md.num_columns):
        name = md.schema.column(j).name
        if "." in name:  # nested field paths: out of scope, unprunable
            continue
        mins: list = []
        maxs: list = []
        ok = True
        for i in range(md.num_row_groups):
            st = md.row_group(i).column(j).statistics
            if st is None or not st.has_min_max:
                ok = False
                break
            try:
                # pyarrow can't decode min/max for some physical types
                # (e.g. decimals) — "unknown", hence unprunable, NOT fatal
                mins.append(st.min)
                maxs.append(st.max)
            except Exception:
                ok = False
                break
        if not (ok and mins):
            continue
        lo, hi = min(mins), max(maxs)
        if not all(isinstance(x, (int, float, str)) for x in (lo, hi)):
            continue
        if any(isinstance(x, float) and x != x for x in (lo, hi)):
            continue
        out[name] = [lo, hi]
    return out


_BLOOM_K = 7           # hash count — ~1% FP at 16 bits/key
_BLOOM_MAX_BITS = 1 << 23  # 1 MiB bitset cap per (file, column)


def _bloom_hashes(value, m: int) -> list[int]:
    """k deterministic bit positions for a value. int and str only — the
    two types a point lookup keys on; floats are rejected (repr-canonical
    hashing across writers is not a contract worth keeping for a type
    nobody equality-probes)."""
    import hashlib

    if isinstance(value, bool) or not isinstance(value, (int, str)):
        raise TypeError(
            f"bloom index supports int/str point values, got {type(value).__name__}"
        )
    raw = (("i:" + str(value)) if isinstance(value, int) else ("s:" + value)).encode()
    out = []
    for i in range(_BLOOM_K):
        h = hashlib.md5(raw + bytes([i])).digest()
        out.append(int.from_bytes(h[:8], "big") % m)
    return out


def _file_bloom(path: str, col: str) -> dict | None:
    """Build a per-file bloom over a column's distinct values, sized at
    ~16 bits per distinct key (FP ~1% at k=7). Returns None when the
    column is absent or all-null (no bloom = conservatively unprunable).
    NULLs are excluded: a point probe is an equality on a value, and SQL
    equality never matches NULL.

    Executed EXECUTOR-SIDE: commits run this (with the footer stats and
    row-count reads) inside one Spark job over the delta — one task per
    written file (``_build_file_meta``) — so a 100-TB commit's column
    reads parallelize across the cluster and only the encoded bitsets
    (capped at _BLOOM_MAX_BITS/8 bytes per (file, column)) plus scalar
    stats travel to the driver-side manifest writer. The probe-side
    contract is independent of where the build runs."""
    import base64

    import pyarrow.parquet as pq

    pf = pq.ParquetFile(path)
    if col not in pf.schema_arrow.names:
        return None
    vals = {v for v in pf.read(columns=[col]).column(col).to_pylist() if v is not None}
    if not vals:
        return None
    m = 1024
    while m < 16 * len(vals) and m < _BLOOM_MAX_BITS:
        m <<= 1
    bits = bytearray(m // 8)
    for v in vals:
        for h in _bloom_hashes(v, m):
            bits[h >> 3] |= 1 << (h & 7)
    return {"m": m, "k": _BLOOM_K, "b64": base64.b64encode(bytes(bits)).decode()}


def _build_file_meta(task: tuple[str, list[str]]) -> tuple[str, dict]:
    """Executor-side metadata build for ONE just-written delta file:
    footer min/max stats + row count (metadata-only reads) and a bloom
    bitset per requested column (one column read). Runs as a Spark task
    (``_write_data`` maps it over the delta, one task per file), so the
    only bytes that reach the driver are the JSON-ready stats scalars and
    the base64 bitsets — never column data. The file path must be
    resolvable from executors, which holds for any shared-storage table
    (and trivially in local mode)."""
    path, bloom_cols = task
    import pyarrow.parquet as pq

    blooms = {c: b for c in bloom_cols if (b := _file_bloom(path, c)) is not None}
    return path, {
        "stats": _file_column_stats(path),
        "rows": pq.ParquetFile(path).metadata.num_rows,
        "blooms": blooms,
    }


def _bloom_may_contain(bloom: dict, value) -> bool:
    import base64

    bits = base64.b64decode(bloom["b64"])
    return all(
        bits[h >> 3] & (1 << (h & 7)) for h in _bloom_hashes(value, bloom["m"])
    )


class ConcurrentCommitError(RuntimeError):
    """Another writer committed the same version first. The losing commit
    wrote NO visible state (its data directory is an unreferenced orphan);
    re-read the table and retry the operation against the new snapshot —
    the same contract as Delta's ConcurrentModificationException."""


class ConstraintViolation(ValueError):
    """A commit's data failed the table's CHECK constraint or schema
    contract; nothing was published (the attempt's data directory, if
    written, is an orphan for vacuum)."""


class ManifestTable:
    """A directory-backed versioned parquet table.

    Layout::

        <root>/data/v00001-<token>/part-*.parquet  (immutable once committed)
        <root>/_manifests/v00001.json              (snapshot = manifest LIST)
        <root>/_manifests/groups/g-<token>.json    (file-group manifest)

    Versions are 1-based and dense. A snapshot manifest (format 2) lists
    GROUP entries ``{path, n_files, summary}`` plus ``added_groups`` (the
    commit's delta groups); each group manifest holds ``{files, stats}``.
    ``_manifest(version)`` resolves that to the flat legacy shape
    (``files`` cumulative, ``added`` delta) so readers and tests see one
    contract regardless of on-disk format. The per-attempt ``<token>``
    suffix keeps concurrent or retried writers from ever colliding on a
    data directory or group file — only the snapshot-manifest publish
    (exclusive create) decides the winner.
    """

    def __init__(self, root: str, _branch: str | None = None) -> None:
        self.root = root
        #: None for the main table; the branch name for a branch HANDLE
        #: (returned by :meth:`branch` / :meth:`create_branch`). A branch
        #: shares the main table's data and group-manifest planes and keeps
        #: only its own snapshot-manifest namespace.
        self.branch_name = _branch
        main_mdir = os.path.join(root, "_manifests")
        self._mdir = (
            main_mdir
            if _branch is None
            else os.path.join(main_mdir, "branches", _branch)
        )
        self._bdir = os.path.join(main_mdir, "branches")
        self._tdir = os.path.join(main_mdir, "tags")
        self._gdir = os.path.join(main_mdir, "groups")
        # Manifests are immutable once published, so a parsed manifest can
        # be cached for the instance's lifetime — a long-running streaming
        # sink's idempotency scan then reads each manifest file once ever,
        # not once per micro-batch (O(new versions), not O(all versions)).
        self._mcache: dict[int, dict] = {}   # version -> RESOLVED (flat)
        self._rawcache: dict[int, dict] = {}  # version -> raw snapshot JSON
        self._gcache: dict[str, dict] = {}    # group path -> parsed group
        # Observability for the scale argument: disk reads of group
        # manifests (cache misses). pruned_files' whole point is keeping
        # this O(matching groups); tests and SCALING.md measure it.
        self.group_opens = 0

    # -- catalog ------------------------------------------------------------

    def versions(self) -> list[int]:
        if not os.path.isdir(self._mdir):
            return []
        out = []
        for name in os.listdir(self._mdir):
            if name.startswith("v") and name.endswith(".json"):
                out.append(int(name[1:-5]))
        return sorted(out)

    def current_version(self) -> int | None:
        vs = self.versions()
        return vs[-1] if vs else None

    def _raw(self, version: int) -> dict:
        """The snapshot manifest AS STORED (format 2: a manifest list with
        group refs; format 1: flat). Catalog operations (idempotency scan,
        timestamp travel, history, pruning) work from this so they never
        pay group resolution for versions they only need metadata of."""
        cached = self._rawcache.get(version)
        if cached is not None:
            return cached
        path = os.path.join(self._mdir, f"v{version:05d}.json")
        if not os.path.exists(path):
            raise ValueError(f"no such snapshot: version {version} in {self.root}")
        with open(path, encoding="utf-8") as f:
            m = json.load(f)
        self._rawcache[version] = m
        return m

    def _load_group(self, path: str) -> dict:
        """A file-group manifest ``{files: [...], stats: {file: {col:
        [min, max]}}}`` — immutable, cached per instance; the counter
        records real disk reads only."""
        cached = self._gcache.get(path)
        if cached is not None:
            return cached
        with open(path, encoding="utf-8") as f:
            g = json.load(f)
        self.group_opens += 1
        self._gcache[path] = g
        return g

    def _manifest(self, version: int) -> dict:
        """The snapshot resolved to the FLAT contract every reader uses:
        ``files`` (cumulative, group order = commit order), ``added``
        (this version's delta). Format-1 manifests already have it."""
        cached = self._mcache.get(version)
        if cached is not None:
            return cached
        raw = self._raw(version)
        if "groups" not in raw:
            m = raw
        else:
            files: list[str] = []
            for g in raw["groups"]:
                files.extend(self._load_group(g["path"])["files"])
            added: list[str] = []
            for p in raw.get("added_groups", []):
                added.extend(self._load_group(p)["files"])
            m = {k: v for k, v in raw.items() if k not in ("groups", "added_groups")}
            m["files"] = files
            m["added"] = added
        self._mcache[version] = m
        return m

    def _added_files(self, version: int) -> list[str]:
        """Just the version's DELTA file list — for format-2 manifests
        this loads only the added groups' manifests, never the full
        snapshot resolution (the O(delta) metadata read incremental
        consumers are promised)."""
        raw = self._raw(version)
        if "groups" not in raw:
            return list(raw.get("added", []))
        out: list[str] = []
        for p in raw.get("added_groups", []):
            out.extend(self._load_group(p)["files"])
        return out

    def _find_idempotent(self, idempotency_key: str | None) -> int | None:
        if idempotency_key is None:
            return None
        for v in self.versions():
            if self._raw(v).get("key") == idempotency_key:
                return v
        return None

    # -- writes -------------------------------------------------------------

    def commit(
        self,
        df: DataFrame,
        idempotency_key: str | None = None,
        check: str | None = None,
        enforce_schema: bool = False,
        bloom_cols: list[str] | None = None,
        parent_version: int | None = None,
        partition_by: str | None = None,
        partition_splits: int = 1,
        field_ids: bool = False,
    ) -> int:
        """Append ``df`` as a new snapshot; returns the new version.

        ``field_ids=True`` (FIRST commit only) makes this a FIELD-IDS
        table: every written column carries a stable ``PARQUET:field_id``
        and the manifest tracks the id<->name mapping, which is what
        turns :meth:`rename_column` into a metadata operation. Later
        commits continue automatically (new columns get fresh ids);
        enabling after the first commit raises — earlier files would lack
        ids and a rename could never resolve them.

        Data first, manifest last, manifest publish atomic+exclusive: a reader
        resolving the table at ANY instant sees either the old complete
        snapshot or the new complete snapshot, never a torn one.

        ``idempotency_key`` makes retried commits exactly-once: if a
        manifest already carries the key (e.g. ``batch-<id>`` from a
        foreachBatch sink replaying after a failure), the existing version
        is returned and nothing is written — the contract that turns this
        table into a safe Structured Streaming sink.

        ``check`` is a SQL boolean expression every committed row must
        satisfy (Delta's CHECK constraint). Validation runs on the
        WRITTEN files, after the data write and before the manifest
        publish: a violation raises :class:`ConstraintViolation` and no
        manifest ever references the attempt (its data directory is an
        invisible orphan for vacuum). Validating the materialized rows —
        not the incoming plan — is what makes the guarantee hold for
        non-deterministic inputs (a plan re-evaluated for the write could
        otherwise produce rows the pre-write count never saw), and it
        costs one scan of the DELTA, not a second scan of the input.
        ``bloom_cols`` builds a per-file BLOOM index over each named
        column's distinct values (~16 bits/key, FP ~1%), stored in the
        group manifest: point lookups through ``pruned_files(point=...)``
        then skip files whose bloom excludes the value — the pruning
        min/max stats cannot do when a high-cardinality key is randomly
        distributed (every file spans the full range). Commit-time cost is
        one column read of the DELTA per indexed column, executed
        executor-side (one task per written file, ``_build_file_meta``)
        alongside the footer stats/row-count reads; rewrite
        operations (compact/merge/delete/replace) do not carry blooms
        forward — re-commit with ``bloom_cols`` where the index matters.
        ``enforce_schema=True`` additionally rejects appends whose
        (name, type) column set differs from the current snapshot's
        merged schema — the writer-side guard for pipelines where drift
        is a bug; leave False (default) for tables that evolve additively
        and read with ``merge_schema=True``.
        ``partition_by`` is a SQL TRANSFORM expression (Iceberg hidden
        partitioning): ``"month(o_orderdate)"``, ``"o_orderkey % 16"``,
        ``"date_trunc('DAY', ts)"`` — the delta is written one file set
        per transform VALUE, the value is recorded per file as a
        ``__pt`` [v, v] stat in the group manifest, and
        ``pruned_files(preds={"__pt": (lo, hi)})`` /
        ``read_pruned(...)`` prune partitions at the GROUP-SUMMARY level
        before any group manifest or file stat is consulted. Source
        columns stay in the data files (reads never depend on hive
        discovery), so the residual predicate still applies exactly.
        ``partition_splits=K`` splits each partition value across K files
        (deterministic row-hash salt) — size K ~= value_bytes /
        target_file_bytes so a 100-TB month never becomes one multi-TB
        file; pruning is unaffected (every split carries the same __pt).

        Raises :class:`ConcurrentCommitError` if another writer publishes
        the same version first; the caller re-reads and retries.
        """
        found = self._find_idempotent(idempotency_key)
        if found is not None:
            return found
        prev = self.current_version()
        if field_ids:
            if prev is not None and self.column_ids(prev) is None:
                raise ValueError(
                    f"commit to {self.root}: field_ids=True is a FIRST-"
                    "commit choice — earlier snapshots' files carry no "
                    "field ids, so renames could never resolve them"
                )
            self._enable_field_ids = True
        # parent_version: append onto a PINNED snapshot instead of the
        # head — the cross-table transaction's staging contract
        # (catalog_txn.py): a staged-but-never-published version left by
        # an abandoned transaction must not leak into later commits that
        # pinned the published base. The new version number stays dense
        # (head + 1); only its CONTENT parents differ.
        base = prev if parent_version is None else parent_version
        if enforce_schema and base is not None:
            # merged schema: on an additively-evolved table the current
            # shape is the UNION of file schemas, not whichever single
            # footer a plain read happens to sample
            cur_schema = {
                (f.name, f.dataType.simpleString())
                for f in self.read(df.sparkSession, base, merge_schema=True).schema.fields
            }
            new_schema = {
                (f.name, f.dataType.simpleString()) for f in df.schema.fields
            }
            if cur_schema != new_schema:
                raise ConstraintViolation(
                    f"commit to {self.root} rejected: schema drift under "
                    f"enforce_schema — incoming {sorted(new_schema)} vs "
                    f"current {sorted(cur_schema)}"
                )
        v = (prev or 0) + 1
        # table-level spec semantics: None inherits the base snapshot's
        # spec (a partitioned table STAYS partitioned across plain
        # appends); pass "" to explicitly write this delta unpartitioned
        if partition_by is None and base:
            partition_by = self.partition_spec(base)
        partition_by = partition_by or None
        added = self._write_data(
            df, v, bloom_cols,
            partition_by=partition_by, partition_splits=partition_splits,
        )
        if check is not None:
            from pyspark.sql import functions as _F

            bad = (
                df.sparkSession.read.parquet(*added)
                .where(~_F.expr(check))
                .count()
            )
            if bad:
                raise ConstraintViolation(
                    f"commit to {self.root} rejected: {bad} written row(s) "
                    f"violate CHECK ({check}); no manifest was published — "
                    "the attempt's files are orphans for vacuum_orphans()"
                )
        blooms = None
        if bloom_cols:
            pending = getattr(self, "_pending_blooms", {})
            blooms = {f: pending.get(f, {}) for f in added}
        entry = self._write_group(
            added, self._stats_for(added), blooms, self._rows_for(added),
            spec=partition_by,
        )
        groups = (self._groups_of(base) if base else []) + [entry]
        dv = self._dv(base) if base else {}
        extra = self._dv_extra(dv)
        if partition_by is not None:
            # record the spec for discoverability/audit; pruning itself
            # rides the per-file __pt stats, so mixed histories (some
            # commits partitioned, some not) stay conservative-correct
            extra["partition_by"] = partition_by
        self._publish(
            v, "append", idempotency_key, groups, [entry["path"]], extra or None,
        )
        return v

    def compact(
        self,
        spark: SparkSession,
        target_partitions: int = 1,
        zorder_by: tuple[str, str] | None = None,
        zorder_bits: int = 10,
        partition_by: str | None = None,
        partition_splits: int = 1,
    ) -> int:
        """Rewrite the CURRENT snapshot into ``target_partitions`` files —
        the small-file maintenance op (same motivation as
        ``layout_compact_files``, but transactional: readers of any version
        keep their file list; only the NEW manifest points at the rewritten
        files, and the originals become unreferenced garbage for
        ``expire``). The manifest records operation='compact' so
        incremental readers know the added files are REWRITES, not new
        rows — ``diff`` refuses to cross it.

        ``partition_by=<SQL transform>`` makes the rewrite establish (or
        re-establish) a HIDDEN PARTITION SPEC over the whole table — the
        way an unpartitioned table converts to date-partitioned, or a
        table whose partial rewrites shed __pt values gets its spec back:
        the full snapshot rewrites one file set per transform value with
        per-file __pt stats, in one transactional 'compact' snapshot.
        Mutually exclusive with zorder_by (different physical layouts).

        ``zorder_by=(x, y)`` makes the rewrite an OPTIMIZE ZORDER: rows
        are range-partitioned and sorted on the Morton interleave of the
        two columns (bucketed mod 2**zorder_bits — coarse wrap keeps the
        key small; file STATS always come from actual values, so pruning
        stays correct regardless), giving every rewritten file partially
        tight min/max on BOTH dimensions. Composed with the manifest's
        per-file column stats, ``read_pruned`` then skips files on either
        (or both) filter columns — Delta's OPTIMIZE ZORDER semantics on
        this format, in one transactional snapshot.
        """
        from pyspark.sql import functions as _F

        cur = self.current_version()
        if cur is None:
            raise ValueError(f"nothing to compact in {self.root}")
        # merge_schema: a full rewrite must carry the UNION of the
        # snapshot's file schemas (the footer sweep is noise next to the
        # full data read a compact performs anyway)
        snap = self.read(spark, cur, merge_schema=True)
        if partition_by is not None and zorder_by is not None:
            raise ValueError(
                "compact: partition_by and zorder_by are mutually exclusive"
            )
        if partition_by is not None:
            v = cur + 1
            added = self._write_data(
                snap, v,
                partition_by=partition_by, partition_splits=partition_splits,
            )
            entry = self._write_group(
                added, self._stats_for(added), rows=self._rows_for(added),
                spec=partition_by,
            )
            self._publish(
                v, "compact", None, [entry], [entry["path"]],
                {"partition_by": partition_by, **self._rewrite_reset(cur)},
            )
            return v
        if zorder_by is not None:
            from gridmr_spark.operators.layout import morton_key

            x, y = zorder_by
            if "_z" in snap.columns:
                raise ValueError(
                    "compact(zorder_by=...): input column '_z' collides "
                    "with the internal morton working column — rename it "
                    "before compacting (an unguarded withColumn would "
                    "silently REPLACE and then drop the user column)"
                )
            mask = (1 << zorder_bits) - 1
            key = morton_key(
                _F.col(x).bitwiseAND(_F.lit(mask)),
                _F.col(y).bitwiseAND(_F.lit(mask)),
                zorder_bits,
            )
            snap = (
                snap.withColumn("_z", key)
                .repartitionByRange(target_partitions, "_z")
                .sortWithinPartitions("_z")
                .drop("_z")
            )
        else:
            snap = snap.repartition(target_partitions)
        v = cur + 1
        added = self._write_data(snap, v)
        entry = self._write_group(added, self._stats_for(added), rows=self._rows_for(added))
        self._publish(
            v, "compact", None, [entry], [entry["path"]],
            self._rewrite_reset(cur) or None,
        )
        return v

    def compact_small(
        self, spark: SparkSession, small_mb: float = 32, target_mb: float = 128
    ) -> int:
        """BIN-PACKING compaction: rewrite ONLY files smaller than
        ``small_mb`` into ~``target_mb`` outputs; every file already at
        healthy size carries forward by manifest reference (zero reads,
        zero writes for it). This is the maintenance op a streaming-
        ingest table actually needs — a nightly pass pays O(the day's
        micro-batch small-file debt), never O(table): Iceberg's
        rewrite_data_files(MIN_INPUT_FILES/target-size) semantics on this
        format. Selection is metadata-only (manifest file sizes); the
        rewrite reads just the selected files. Published as
        operation='compact', so ``diff`` refuses to cross it (the same
        rewrites-not-new-rows contract as full compact); when no file is
        small the version is a pure metadata snapshot.

        For global clustering (z-order) or exact file-count control use
        :meth:`compact` — full rewrite is the point there."""
        cur = self.current_version()
        if cur is None:
            raise ValueError(f"nothing to compact in {self.root}")
        files = self._manifest(cur)["files"]
        sizes = {f: os.path.getsize(f) for f in files}
        small = [f for f in files if sizes[f] < small_mb * (1 << 20)]
        v = cur + 1
        groups = self._carry_groups(cur, set(small))
        carried = [f for f in files if f not in set(small)]
        dv = self._compact_dv(spark, self._dv(cur), carried)
        if small:
            total = sum(sizes[f] for f in small)
            nparts = max(1, -(-total // int(target_mb * (1 << 20))))
            # union schema: micro-batch slivers may straddle an additive
            # OR widening schema change; packing must carry the UNION of
            # their columns at the WIDEST type (footer reads of the small
            # set only — cheap).
            # DV-applied: packing materializes the packed files' deletes.
            packed = self._apply_dv(
                spark,
                self._union_read(spark, small, cur),
                self._dv(cur),
            ).repartition(int(nparts))
            added = self._nonempty(
                self._write_data(packed, v, partition_by=self.partition_spec(cur))
            )
            if added:
                entry = self._write_group(
                    added, self._stats_for(added), rows=self._rows_for(added),
                    spec=self.partition_spec(cur),
                )
                groups.append(entry)
        extra = self._dv_extra(dv)
        if self.partition_spec(cur):
            extra["partition_by"] = self.partition_spec(cur)
        self._publish(v, "compact", None, groups, [], extra or None)
        return v

    def add_files(
        self,
        spark: SparkSession,
        paths: list[str],
        idempotency_key: str | None = None,
    ) -> int:
        """ADOPT existing parquet files into the table BY REFERENCE —
        Iceberg's ``add_files``/migrate path: ZERO COPY at any size, one
        'append' snapshot whose group manifest references the external
        paths with footer-derived stats and row counts (one metadata
        read per file, executor-side for large adopts — the same build
        as a commit, minus the data write). Incremental readers see the
        adopted rows as an ordinary append; time travel, pruning, and
        every rewrite verb treat the files like any other.

        OWNERSHIP: adopted files stay EXTERNAL. The maintenance
        ownership guard (``expire``/``vacuum_orphans`` only ever delete
        under ``<root>/data`` — the shallow-clone contract) means the
        table will never reclaim them; their lifecycle remains the
        caller's. A later ``compact()`` rewrites their rows into
        table-owned files, completing a migration.

        Guards: refuses paths already referenced by the current snapshot
        (double-adoption would duplicate rows), unreadable/non-parquet
        files (the footer probe raises), and FIELD-IDS tables (external
        footers carry no — or worse, foreign — field ids; a rename could
        then mis-resolve them). On a partitioned table the adopted files
        carry no ``__pt``: partition reads stay EXACT through the
        computed residual; schema differences align through the same
        additive/widening union as any evolved cohort."""
        found = self._find_idempotent(idempotency_key)
        if found is not None:
            return found
        if not paths:
            raise ValueError("add_files: no paths given")
        cur = self.current_version()
        if cur and self.column_ids(cur) is not None:
            raise ValueError(
                f"add_files into {self.root}: field-ids tables cannot "
                "adopt external files (their footers carry no — or "
                "foreign — PARQUET:field_id values, which a later rename "
                "would mis-resolve); copy the data in with commit()"
            )
        paths = [os.path.abspath(p) for p in paths]
        if len(set(map(_norm, paths))) != len(paths):
            raise ValueError("add_files: duplicate paths in the adopt set")
        if cur:
            live = {_norm(f) for f in self._manifest(cur)["files"]}
            clash = [p for p in paths if _norm(p) in live]
            if clash:
                raise ValueError(
                    f"add_files: {len(clash)} path(s) already referenced "
                    f"by v{cur} (e.g. {clash[0]}) — double adoption would "
                    "duplicate their rows"
                )
        # footer metadata build: same executor-side fan-out rule as a
        # commit's (_write_data) — driver fast path for small adopts
        small = sum(os.path.getsize(p) for p in paths) < (256 << 20)
        if small:
            meta = dict(_build_file_meta((p, [])) for p in paths)
        else:
            sc = spark.sparkContext
            tasks = [(p, []) for p in paths]
            meta = dict(
                sc.parallelize(tasks, len(tasks)).map(_build_file_meta).collect()
            )
        stats = {p: meta[p]["stats"] for p in paths}
        rows = {p: meta[p]["rows"] for p in paths if meta[p].get("rows") is not None}
        v = (cur or 0) + 1
        entry = self._write_group(stats=stats, files=paths, rows=rows or None, cols=None)
        groups = (self._groups_of(cur) if cur else []) + [entry]
        extra = self._dv_extra(self._dv(cur)) if cur else {}
        if cur:
            extra = self._spec_extra(cur, extra)
        self._publish(
            v, "append", idempotency_key, groups, [entry["path"]], extra or None,
        )
        return v

    def replace(self, df: DataFrame, idempotency_key: str | None = None) -> int:
        """Replace the table's ENTIRE logical content with ``df`` in one
        'overwrite' snapshot — the write mode a streaming materialized view
        refreshes with (foreachBatch: merge batch into current state,
        replace). Same atomicity and idempotency contracts as commit();
        history stays readable until expired."""
        found = self._find_idempotent(idempotency_key)
        if found is not None:
            return found
        v = (self.current_version() or 0) + 1
        added = self._write_data(df, v)
        entry = self._write_group(added, self._stats_for(added), rows=self._rows_for(added))
        self._publish(
            v, "overwrite", idempotency_key, [entry], [entry["path"]],
            self._rewrite_reset(v - 1) or None,
        )
        return v

    def merge_by_key(
        self,
        spark: SparkSession,
        updates: DataFrame,
        key: str,
        idempotency_key: str | None = None,
        base_version: int | None = None,
    ) -> int:
        """MERGE INTO by key (update-wins + insert-unmatched), as one
        atomic 'overwrite' snapshot: rows of ``updates`` replace
        same-keyed current rows; unmatched keys insert; untouched rows
        carry over. The `merge_upsert_cdc` anti-join + union algebra with
        the table format's transactional guarantees on top — together with
        commit/replace/delete_where this completes the CRUD verbs.

        Copy-on-write like delete_where, and like it PARTIAL — but
        planned from METADATA, not a scan: candidate files are the ones
        whose manifest key min/max stats overlap the updates' key range
        (files without key stats are conservatively candidates). Only
        candidates are rewritten (minus matched rows, plus ALL update
        rows); every other file carries forward by manifest reference.
        On a key-clustered table (z-ordered, partitioned, bucketed — the
        production shape for mergeable tables) that bounds write
        amplification to the merge's true footprint with ZERO planning
        scan; on an unclustered key the candidate set degenerates to
        every file and the verb costs exactly the old single full
        read+write.

        Schema contract: ``updates`` aligns by NAME and must cover every
        column of the rewritten candidate set; NEW columns in ``updates``
        are allowed (additive evolution — Delta's MERGE WITH SCHEMA
        EVOLUTION), with typed-null backfill for the kept rows. An
        ``updates`` frame MISSING a table column raises instead of
        silently nulling that column on every updated/inserted row (the
        old failure mode of a misspelled column)."""
        cur = self.current_version()
        if cur is None:
            raise ValueError(f"nothing to merge into in {self.root}")
        found = self._find_idempotent(idempotency_key)
        if found is not None:
            return found
        base = cur if base_version is None else base_version
        keys = updates.select(key).distinct()
        from pyspark.sql import functions as _F

        lo, hi = updates.agg(_F.min(key), _F.max(key)).first()
        affected = self._stats_candidate_files(base, key, lo, hi)
        if affected:
            # mergeSchema over the AFFECTED set only (bounded by the
            # merge's footprint): a candidate set straddling an additive
            # schema change rewrites with the UNION of its columns
            # instead of silently dropping the added ones; updates align
            # by NAME with typed-null fill in either direction (Delta's
            # MERGE WITH SCHEMA EVOLUTION shape)
            kept = self._apply_dv(
                spark,
                self._union_read(spark, affected, base),
                self._dv(base),
            ).join(keys, key, "left_anti")
            # additive-only guard: updates may ADD columns (kept rows get
            # typed nulls), but a table column absent from updates means
            # every updated AND inserted row would silently null it —
            # almost always a misspelling, so fail loudly instead
            missing = [c for c in kept.columns if c not in set(updates.columns)]
            if missing:
                raise ValueError(
                    f"merge_by_key: updates frame is missing table column(s) "
                    f"{missing} — MERGE replaces whole rows, so an absent "
                    "column would be null-filled on every updated/inserted "
                    "row; select the full row (extras beyond the table "
                    "schema are allowed and backfill as typed nulls)"
                )
            merged = kept.unionByName(updates, allowMissingColumns=True)
        else:
            merged = updates
        v = cur + 1
        added = self._nonempty(
            self._write_data(merged, v, partition_by=self.partition_spec(base))
        )
        groups = self._carry_groups(base, set(affected))
        carried = [f for f in self._manifest(base)["files"] if f not in set(affected)]
        dv = self._compact_dv(spark, self._dv(base), carried)
        added_groups: list[str] = []
        if added:
            entry = self._write_group(
                added, self._stats_for(added), rows=self._rows_for(added),
                spec=self.partition_spec(base),
            )
            groups.append(entry)
            added_groups = [entry["path"]]
        extra = self._dv_extra(dv)
        if self.partition_spec(base):
            extra["partition_by"] = self.partition_spec(base)
        self._publish(
            v, "overwrite", idempotency_key, groups, added_groups, extra or None,
        )
        return v

    def delete_where(
        self,
        spark: SparkSession,
        condition,
        base_version: int | None = None,
        mode: str = "cow",
    ) -> int:
        """Row-level delete (copy-on-write): rewrite the current snapshot
        WITHOUT the rows matching ``condition`` (a Column or SQL string) as
        an 'overwrite' snapshot. The right-to-be-forgotten operation a
        training-data store needs: deleted rows vanish from the new version
        while historical snapshots keep them until ``expire`` reclaims the
        old files — deletion becomes PHYSICAL exactly when retention says
        so, and the two-step is auditable in the manifest log.

        Two modes, the same pair Iceberg v2 and Delta expose:

        - ``mode="cow"`` (default) — PARTIAL copy-on-write: one
          predicate-pushed scan tags matching rows with their source file
          (``input_file_name``), only files that actually contain a match
          are rewritten, and every untouched file carries forward BY
          MANIFEST REFERENCE (zero data movement), so write amplification
          is the delete's true footprint, not the table size. Reads stay
          plain parquet scans with zero merge cost. File-level lineage
          falls out for free: the snapshot-to-snapshot file delta IS the
          rewrite's footprint, which is what bounds :meth:`changefeed` on
          ranges crossing this verb.
        - ``mode="dv"`` — MERGE-ON-READ deletion vectors
          (:meth:`_delete_where_dv`): record (file, row position) of the
          matched rows, write no data files at all. The right verb when
          COW is worst — a low-selectivity delete on an unclustered key
          (GDPR erasure by id) that would otherwise rewrite every file.
          Reads pay one broadcast anti-join until a rewrite/compact
          materializes the DV set.
        """
        from pyspark.sql import functions as _F

        cur = self.current_version()
        if cur is None:
            raise ValueError(f"nothing to delete from in {self.root}")
        cond = _F.expr(condition) if isinstance(condition, str) else condition
        base = cur if base_version is None else base_version
        if mode == "dv":
            return self._delete_where_dv(spark, cond, base, cur)
        if mode != "cow":
            raise ValueError(f"delete_where: mode must be cow|dv, got {mode!r}")
        if not self._manifest(base)["files"]:
            raise ValueError(
                f"snapshot v{base} of {self.root} is empty — nothing to delete"
            )
        # file provenance captured at scan time; DV-subtracted so a row
        # already deleted by a deletion vector can't mark its file
        hit_files = {
            r[0]
            for r in self._scan_with_provenance(
                spark, self._manifest(base)["files"], self._dv(base), base
            )
            .where(cond)
            .select("__mt_fp")
            .distinct()
            .collect()
        }
        affected = self._match_manifest_files(base, hit_files)
        v = cur + 1
        groups = self._carry_groups(base, set(affected))
        carried = [f for f in self._manifest(base)["files"] if f not in set(affected)]
        dv = self._compact_dv(spark, self._dv(base), carried)
        if affected:
            # keep rows where the condition is NOT TRUE (SQL DELETE
            # semantics): a NULL-valued condition must keep the row, and
            # plain ~cond would drop it from rewritten files while files
            # with no TRUE match carry it forward — making the result
            # depend on physical layout and diverge from DV mode's
            # where(cond) hit test
            # union schema over the AFFECTED set only: rewriting files
            # that straddle an additive/widening schema change must carry
            # the union of their columns, not one arbitrary file's shape
            kept = self._apply_dv(
                spark,
                self._union_read(spark, affected, base),
                self._dv(base),
            ).where(~_F.coalesce(cond, _F.lit(False)))
            added = self._nonempty(
                self._write_data(kept, v, partition_by=self.partition_spec(base))
            )
            if added:
                entry = self._write_group(
                    added, self._stats_for(added), rows=self._rows_for(added),
                    spec=self.partition_spec(base),
                )
                groups.append(entry)
                self._publish(
                    v, "overwrite", None, groups, [entry["path"]],
                    self._spec_extra(base, self._dv_extra(dv)) or None,
                )
                return v
        self._publish(
            v, "overwrite", None, groups, [],
            self._spec_extra(base, self._dv_extra(dv)) or None,
        )
        return v

    def _delete_where_dv(self, spark: SparkSession, cond, base: int, cur: int) -> int:
        """MERGE-ON-READ delete: record the matching rows' (file, row
        position) in a deletion-vector parquet under ``<root>/_deletes``
        and publish a metadata snapshot carrying the grown DV set — ZERO
        data files read beyond the predicate scan, zero written. The
        complement of copy-on-write for the case COW handles worst: a
        low-selectivity delete on an unclustered key (GDPR erasure by id)
        touches every file under COW but costs O(matched rows) here.
        Reads apply the DV set as a broadcast anti-join on scan
        provenance (``_apply_dv``); rewrite verbs compact the DV set to
        surviving files and ``compact()``/``replace()`` materialize it
        away. Iceberg v2 / Delta deletion-vector semantics on this
        format.

        DV-AWARE STATS (round 13): the SAME scan that writes the DV also
        observes the DELETED rows' per-column min/max envelope (a free
        ``observe`` on the write action — zero extra I/O) and stores it
        in the manifest's dv dict (``del_env``). ``metadata_agg`` then
        keeps a column's live MIN/MAX EXACT whenever the deleted
        envelope is strictly inside the table's — i.e. no deleted row
        can sit at an extreme — instead of going conservatively unknown
        on every DV delete."""
        from pyspark.sql import Observation
        from pyspark.sql import functions as _F

        if not self._manifest(base)["files"]:
            raise ValueError(
                f"snapshot v{base} of {self.root} is empty — nothing to delete"
            )
        dv0 = self._dv(base)
        tagged = self._scan_with_provenance(
            spark, self._manifest(base)["files"], dv0, base
        )
        env_cols = [
            f.name
            for f in tagged.schema.fields
            if f.name not in ("__mt_fp", "__mt_ri")
            and f.dataType.simpleString()
            in ("tinyint", "smallint", "int", "bigint", "float", "double",
                "string", "boolean")
        ]
        obs = Observation()
        matched = tagged.where(cond)
        if env_cols:
            aggs = []
            for c in env_cols:
                aggs.append(_F.min(c).alias(f"lo::{c}"))
                aggs.append(_F.max(c).alias(f"hi::{c}"))
            matched = matched.observe(obs, *aggs)
        hits = matched.select(
            _F.col("__mt_fp").alias("file"), _F.col("__mt_ri").alias("pos")
        )
        v = cur + 1
        ddir = os.path.join(self.root, "_deletes")
        os.makedirs(ddir, exist_ok=True)
        out = os.path.join(ddir, f"dv-v{v:05d}-{uuid.uuid4().hex[:8]}")
        hits.write.mode("error").parquet(out)
        observed = obs.get if env_cols else {}
        new_files = sorted(glob.glob(os.path.join(out, "*.parquet")))
        import pyarrow.parquet as pq

        counted = [
            (f, pq.ParquetFile(f).metadata.num_rows) for f in new_files
        ]
        new_files = [f for f, n in counted if n > 0]
        n_new = sum(n for _, n in counted)
        # reclaim zero-row part files (and writer markers) NOW: they are
        # never referenced by any manifest, so expire()'s dropped-manifest
        # rule could never reach them and they'd sit until the whole DV
        # directory dies; a fully-empty write (no matches) leaves no
        # directory at all
        for f, n in counted:
            if n == 0:
                os.remove(f)
        for junk in glob.glob(os.path.join(out, "_SUCCESS*")) + glob.glob(
            os.path.join(out, ".*.crc")
        ):
            os.remove(junk)
        if not new_files:
            shutil.rmtree(out, ignore_errors=True)
        dv1 = {"files": dv0["files"] + new_files, "rows": dv0["rows"] + n_new}
        # merge this delete's observed deleted-row envelope into the DV
        # set's cumulative del_env. Contract per column: [lo, hi] = the
        # envelope of every DV-deleted row; None = all deleted values
        # were NULL (harmless for MIN/MAX); ABSENT = unknown (stats stay
        # conservative). A pre-round-13 DV set has no del_env at all —
        # every column reads as unknown, the old behavior.
        if n_new == 0:
            env1 = dv0.get("del_env") if dv0["files"] else {}
        else:
            prior_files = bool(dv0["files"])
            prior = dv0.get("del_env") or {}
            env1 = {}
            for c in env_cols:
                lo, hi = observed.get(f"lo::{c}"), observed.get(f"hi::{c}")
                if lo != lo or hi != hi:  # NaN poisons ordering
                    continue
                mine = None if lo is None else [lo, hi]
                if not prior_files:
                    env1[c] = mine
                elif c in prior:
                    p = prior[c]
                    if p is None:
                        env1[c] = mine
                    elif mine is None:
                        env1[c] = p
                    else:
                        env1[c] = [min(p[0], mine[0]), max(p[1], mine[1])]
                # else: prior deletes exist but their envelope for c is
                # unknown -> stays unknown (absent)
        if env1:
            dv1["del_env"] = env1
        self._publish(
            v, "delete_dv", None, self._groups_of(base), [],
            self._spec_extra(base, self._dv_extra(dv1)) or None,
        )
        # GROWTH DISCIPLINE (round 13): the DV set is applied at read time
        # as a broadcast anti-join, so its size is a hard read-path
        # ceiling. Past `dv_max_rows` live positions, automatically
        # materialize the heaviest-hit files down to half the ceiling —
        # read cost stays independent of accumulated delete history, and
        # a GDPR trickle of small deletes can no longer grow driver/
        # executor broadcast state until an OOM. The materialize is its
        # own auditable snapshot (Delta's OPTIMIZE-after-DV shape).
        if dv1["rows"] > self.dv_max_rows:
            return self.materialize_dv(spark, self.dv_max_rows // 2) or v
        return v

    #: Ceiling on live deletion-vector positions before a DV delete
    #: auto-materializes the heaviest-hit files (down to half this value).
    #: Sizing: the DV broadcast holds one (file-path string, int64) row
    #: per deleted row — ~120 B hashed — so the default 1M rows is a
    #: ~100 MB broadcast, comfortably inside executor memory while far
    #: above any sane merge-on-read backlog. Per-table override by
    #: assignment; 0 forces materialize-on-every-DV-delete.
    dv_max_rows: int = 1_000_000

    def materialize_dv(
        self,
        spark: SparkSession,
        target_rows: int = 0,
        base_version: int | None = None,
    ) -> int | None:
        """Targeted merge-on-read → copy-on-write conversion: rewrite ONLY
        the files carrying the most deletion-vector positions — greedily,
        heaviest first — until the surviving DV set holds at most
        ``target_rows`` live positions, and publish ONE ``overwrite``
        snapshot in which the rewritten files' DV entries are gone and
        every other file (including lightly-hit ones, which keep their
        DVs) carries forward by manifest reference. Write amplification
        is proportional to the deletes being retired, never to table
        size; ``compact()`` remains the full-materialize verb.

        Returns the new version, or ``None`` when the DV set is already
        at or under ``target_rows`` (nothing to do). Called automatically
        by DV deletes that cross :attr:`dv_max_rows`; also a first-class
        maintenance verb (run it off-peak at ``target_rows=0`` to clear
        merge-on-read debt entirely).

        Scale shape: per-file DV counts come from the DV parquet
        (bounded at ``dv_max_rows`` by this very mechanism); the rewrite
        reads only the selected files; the surviving DV set is rewritten
        by :meth:`_compact_dv`. Changefeed/CDC readers see a normal
        partial rewrite — file-set delta with DV positions excluded —
        so incremental consumers stay exact across it."""
        import pyarrow.parquet as pq

        cur = self.current_version()
        if cur is None:
            raise ValueError(f"nothing to materialize in {self.root}")
        base = cur if base_version is None else base_version
        dv = self._dv(base)
        target = max(int(target_rows), 0)
        if not dv["files"] or dv["rows"] <= target:
            return None
        counts: dict[str, int] = {}
        for path in dv["files"]:
            col = pq.read_table(path, columns=["file"]).column("file")
            for u in col.to_pylist():
                n = _norm(_uri_to_path(u))
                counts[n] = counts.get(n, 0) + 1
        manifest_files = self._manifest(base)["files"]
        by_norm = {_norm(f): f for f in manifest_files}
        remaining = dv["rows"]
        selected: list[str] = []
        for n, c in sorted(counts.items(), key=lambda kv: (-kv[1], kv[0])):
            if remaining <= target:
                break
            f = by_norm.get(n)
            if f is None:
                continue  # stale spelling; _compact_dv keeps these out
            selected.append(f)
            remaining -= c
        if not selected:
            return None
        v = cur + 1
        # union schema over the SELECTED set: a rewrite straddling an
        # additive/widening schema change must carry the union of its
        # columns (same rule as every other rewrite verb)
        kept = self._apply_dv(
            spark,
            self._union_read(spark, selected, base),
            dv,
        )
        added = self._nonempty(
            self._write_data(kept, v, partition_by=self.partition_spec(base))
        )
        groups = self._carry_groups(base, set(selected))
        carried = [f for f in manifest_files if f not in set(selected)]
        dv1 = self._compact_dv(spark, dv, carried)
        added_groups: list[str] = []
        if added:
            entry = self._write_group(
                added, self._stats_for(added), rows=self._rows_for(added),
                spec=self.partition_spec(base),
            )
            groups.append(entry)
            added_groups = [entry["path"]]
        self._publish(
            v, "overwrite", None, groups, added_groups,
            self._spec_extra(base, self._dv_extra(dv1)) or None,
        )
        return v

    def _scan_with_provenance(
        self,
        spark: SparkSession,
        files: list[str],
        dv: dict,
        version: int | None = None,
    ) -> DataFrame:
        """Raw scan of ``files`` with scan-time provenance retained as
        ``__mt_fp``/``__mt_ri`` columns and the DV set already
        subtracted — the shared front half of the DV delete and the
        partial-COW provenance scan (``input_file_name()`` cannot be
        used once the DV anti-join makes the plan multi-source; the
        ``_metadata`` columns are bound at the scan and survive it)."""
        from pyspark.sql import functions as _F

        # union schema: the predicate may reference a column added by a
        # later commit; pre-evolution files null-fill, a widening commit
        # reads at the widest type, and a renamed table resolves by field
        # id (footer merge cost is negligible next to the predicate scan
        # that follows)
        tagged = (
            self._union_read(spark, files, version)
            .select(
                "*",
                _F.col("_metadata.file_path").alias("__mt_fp"),
                _F.col("_metadata.row_index").alias("__mt_ri"),
            )
        )
        if dv and dv.get("files"):
            dvdf = spark.read.parquet(*dv["files"]).select(
                _F.col("file").alias("__dv_fp"), _F.col("pos").alias("__dv_ri")
            )
            tagged = tagged.join(
                _F.broadcast(dvdf),
                (_F.col("__mt_fp") == _F.col("__dv_fp"))
                & (_F.col("__mt_ri") == _F.col("__dv_ri")),
                "left_anti",
            )
        return tagged

    def _compact_dv(self, spark: SparkSession, dv: dict, carried: list[str]) -> dict:
        """Rewrite a DV set down to entries whose target file survives in
        ``carried`` — called by every partial rewrite so the manifest's
        ``dv.rows`` stays the EXACT live deleted-row count (stale entries
        would be read-harmless but poison metadata COUNT). Driver-side
        over the DV parquet: a DV set is O(rows deleted since the last
        materialize) by contract — when that outgrows the driver, the
        same filter is one executor-side job (the commit-metadata
        precedent, `_build_file_meta`)."""
        if not dv or not dv["files"]:
            return {"files": [], "rows": 0}
        import pyarrow as pa
        import pyarrow.parquet as pq

        carried_norm = {_norm(f) for f in carried}

        def live(u: str) -> bool:
            return _norm(_uri_to_path(u)) in carried_norm

        keep_f: list[str] = []
        keep_p: list[int] = []
        for path in dv["files"]:
            t = pq.read_table(path)
            for f, pos in zip(t.column("file").to_pylist(), t.column("pos").to_pylist()):
                if live(f):
                    keep_f.append(f)
                    keep_p.append(pos)
        if not keep_f:
            return {"files": [], "rows": 0}
        ddir = os.path.join(self.root, "_deletes")
        os.makedirs(ddir, exist_ok=True)
        out = os.path.join(ddir, f"dv-c{uuid.uuid4().hex[:12]}.parquet")
        pq.write_table(
            pa.table({"file": pa.array(keep_f, pa.string()),
                      "pos": pa.array(keep_p, pa.int64())}),
            out,
        )
        compacted = {"files": [out], "rows": len(keep_f)}
        # carry the cumulative deleted-row envelope (conservative: the
        # retired entries' contribution could be pruned but never must
        # be); an emptied DV set above drops it — stats are exact again
        if dv.get("del_env"):
            compacted["del_env"] = dv["del_env"]
        return compacted

    def restore(self, version: int) -> int:
        """Roll the table back to ``version`` as a NEW snapshot (Delta's
        RESTORE): publishes a manifest whose file list is snapshot
        ``version``'s — METADATA-ONLY, zero data movement, because data
        files are immutable and shared across manifests. History is
        preserved (the bad versions stay time-travelable until expired),
        the restore itself is one more auditable commit, and incremental
        readers refuse to cross it like any other rewrite.

        With two-level manifests this carries the restored snapshot's
        GROUP LIST — per-file stats ride inside the (immutable, shared)
        group manifests, so nothing needs wholesale stats-copying and the
        restore manifest stays O(#groups) at any table size."""
        groups = self._groups_of(version)  # raises if unknown
        v = (self.current_version() or 0) + 1
        self._publish(
            v, "restore", None, groups, [],
            self._spec_extra(
                version, {"restored_from": version, **self._dv_extra(self._dv(version))}
            ),
        )
        return v

    def clone_to(self, dest_root: str, version: int | None = None) -> "ManifestTable":
        """SHALLOW CLONE: a new table at ``dest_root`` whose v1 manifest
        references THIS table's snapshot files — metadata-only, zero
        copy, instant at any size (Delta's CLONE). The clone is
        independent for writes (its commits add its own files) but shares
        the source's data files for the cloned snapshot, so expiring or
        vacuuming the SOURCE below the cloned version breaks the clone —
        the standard shallow-clone contract; callers who need isolation
        compact the clone (which rewrites into its own files)."""
        if version is None:
            version = self.current_version()
            if version is None:
                raise ValueError(f"nothing to clone in {self.root}")
        dest = ManifestTable(dest_root)
        if dest.current_version() is not None:
            raise ValueError(f"clone destination {dest_root} is not empty")
        raw = self._raw(version)
        if "groups" in raw:
            groups = list(raw["groups"])
        else:
            # format-1 source: materialize the upgrade group under the
            # DEST's own groups dir — only dest's manifest will reference
            # it, and a group file in the SOURCE's dir that no source
            # manifest references would be reclaimed by the source's
            # routine vacuum_orphans, silently bricking the clone
            groups = [
                dest._write_group(
                    raw["files"], self.snapshot_stats(version),
                    spec=self.partition_spec(version),
                    cols=self.column_ids(version),
                )
            ]
        # group entries reference the SOURCE's group files by absolute
        # path (like data files) — stats ride with the groups, so the
        # clone prunes exactly as well as the source did, at zero copy
        # deletion vectors ride the clone like data files: referenced
        # from the source's _deletes dir by absolute path, so the clone
        # reads the same live rows (and a clone-side compact materializes
        # into clone-owned files, detaching from them)
        dest._publish(
            1, "clone", None, groups, [],
            # the SOURCE snapshot's partition spec rides the clone (it is
            # the layout the cloned files actually carry) — without it the
            # clone's partitioned reads break and its own appends would
            # silently write unpartitioned
            self._spec_extra(version, {
                "cloned_from": {"root": self.root, "version": version},
                **self._dv_extra(self._dv(version)),
            }),
        )
        return dest

    # -- branches & tags ----------------------------------------------------

    _REF_NAME_OK = staticmethod(
        # at least one alphanumeric: all-punctuation names like "." and
        # ".." would resolve INTO or ABOVE the refs directory
        lambda n: bool(n)
        and all(c.isalnum() or c in "_-." for c in n)
        and any(c.isalnum() for c in n)
    )

    def _require_main(self, op: str) -> None:
        if self.branch_name is not None:
            raise ValueError(
                f"{op} must run on the MAIN table, not branch "
                f"{self.branch_name!r} of {self.root} — branches share the "
                "main table's data plane, so ref/maintenance operations are "
                "main-table responsibilities"
            )

    def branches(self) -> list[str]:
        """Names of existing branches (refs with at least one snapshot)."""
        if not os.path.isdir(self._bdir):
            return []
        out = []
        for name in sorted(os.listdir(self._bdir)):
            if glob.glob(os.path.join(self._bdir, name, "v*.json")):
                out.append(name)
        return out

    def branch(self, name: str) -> "ManifestTable":
        """A handle on an EXISTING branch: a ManifestTable whose snapshot
        namespace is the branch's, sharing this table's data files and
        group manifests. Commit/merge/delete/read/time-travel all work on
        the handle; maintenance (expire/vacuum) and ref operations refuse
        and must run on the main table."""
        self._require_main("branch()")
        # validate on EVERY verb that resolves a ref name into a path, not
        # only create: '..' resolves the "branch" namespace to the main
        # _manifests dir itself
        if not ManifestTable._REF_NAME_OK(name):
            raise ValueError(f"invalid ref name {name!r} (alnum/_-. only)")
        b = ManifestTable(self.root, _branch=name)
        if b.current_version() is None:
            raise ValueError(f"no such branch {name!r} in {self.root}")
        return b

    def create_branch(
        self, name: str, version: int | None = None
    ) -> "ManifestTable":
        """Create branch ``name`` from snapshot ``version`` (default:
        current) and return its handle — the write-audit-publish (WAP)
        entry point, Iceberg's ``CREATE BRANCH``. Metadata-only: branch v1
        is a snapshot manifest referencing the source version's (immutable,
        shared) group manifests; zero data movement at any table size.

        The branch records its fork point (``branched_from``); that base is
        what :meth:`publish_branch` checks its fast-forward condition
        against. Creation is exclusive (the branch's v1 manifest publish):
        two racing creators get exactly one winner."""
        self._require_main("create_branch")
        if not ManifestTable._REF_NAME_OK(name):
            raise ValueError(f"invalid ref name {name!r} (alnum/_-. only)")
        if version is None:
            version = self.current_version()
            if version is None:
                raise ValueError(f"nothing to branch in {self.root}")
        groups = self._groups_of(version)  # raises if unknown
        b = ManifestTable(self.root, _branch=name)
        b._publish(
            1, "branch", None, groups, [],
            # inherit the fork version's partition spec so branch commits
            # keep writing __pt stats — a WAP cycle must not silently drop
            # the table's layout (the spec is table-level by contract)
            self._spec_extra(
                version,
                {"branched_from": version, **self._dv_extra(self._dv(version))},
            ),
        )
        return b

    def drop_branch(self, name: str) -> None:
        """Delete branch ``name``'s snapshot namespace. Data files only the
        branch referenced become unreferenced orphans that the main table's
        age-gated ``vacuum_orphans`` reclaims — same two-step as every
        other delete in this format."""
        self._require_main("drop_branch")
        # name validation is load-bearing here: '..' would resolve d to the
        # main _manifests dir, whose v*.json snapshots match the existence
        # glob — rmtree would then destroy every manifest the table has
        if not ManifestTable._REF_NAME_OK(name):
            raise ValueError(f"invalid ref name {name!r} (alnum/_-. only)")
        d = os.path.join(self._bdir, name)
        if not glob.glob(os.path.join(d, "v*.json")):
            raise ValueError(f"no such branch {name!r} in {self.root}")
        shutil.rmtree(d)

    def publish_branch(self, name: str) -> int:
        """Fast-forward MAIN to branch ``name``'s head — the PUBLISH step
        of write-audit-publish: stage commits on the branch, audit the
        branch read, then make the audited state visible to main-table
        readers in ONE atomic snapshot.

        Fast-forward condition: main's current version must still be the
        branch's fork point. If main advanced since the branch was cut,
        raises :class:`ConcurrentCommitError` — the caller re-branches from
        the new head and replays (the same optimistic-concurrency contract
        as racing commits; silently merging diverged states would forfeit
        the audit).

        The published snapshot is metadata-only (branch head's group list).
        If every branch commit after the fork was an append, the publish is
        recorded as an ``append`` whose delta is the branch's cumulative
        delta — incremental readers (``diff``, the changelog stream) see
        the audited rows as one ordinary append. Any rewrite on the branch
        (merge/delete/compact) makes the publish non-crossable
        (``publish``), exactly like the underlying operation would have
        been on main."""
        self._require_main("publish_branch")
        b = self.branch(name)
        bv = b.current_version()
        base = b._raw(1).get("branched_from")
        cur = self.current_version()
        if cur != base:
            raise ConcurrentCommitError(
                f"publish of branch {name!r} into {self.root} is not a "
                f"fast-forward: branched from v{base} but main is at "
                f"v{cur} — re-branch from the current head and replay"
            )
        ops = [b._raw(v).get("operation", "append") for v in range(2, bv + 1)]
        appends_only = all(op in ("append", "rewrite_manifests") for op in ops)
        added: list[str] = []
        if appends_only:
            for v in range(2, bv + 1):
                if b._raw(v).get("operation", "append") == "append":
                    added.extend(b._raw(v).get("added_groups", []))
        self._publish(
            (cur or 0) + 1,
            "append" if appends_only else "publish",
            None,
            b._groups_of(bv),
            added,
            # the published snapshot carries the BRANCH HEAD's spec — the
            # audited state includes its layout, and main's next appends
            # must keep writing __pt stats after a WAP cycle
            b._spec_extra(bv, {
                "published_from": {"branch": name, "version": bv, "base": base},
                **self._dv_extra(b._dv(bv)),
            }),
        )
        return (cur or 0) + 1

    def tags(self) -> dict[str, int]:
        """name -> pinned version for every tag."""
        if not os.path.isdir(self._tdir):
            return {}
        out: dict[str, int] = {}
        for f in sorted(glob.glob(os.path.join(self._tdir, "*.json"))):
            with open(f, encoding="utf-8") as fh:
                out[os.path.basename(f)[:-5]] = json.load(fh)["version"]
        return out

    def create_tag(self, name: str, version: int | None = None) -> int:
        """Pin ``version`` (default: current) under an immutable name —
        Iceberg's ``CREATE TAG``, the audit/release marker. A tagged
        snapshot survives ``expire`` regardless of ``keep_last`` until the
        tag is dropped. Exclusive create: re-tagging an existing name
        raises (tags are immutable by contract — drop and re-create to
        move one, leaving an auditable gap)."""
        self._require_main("create_tag")
        if not ManifestTable._REF_NAME_OK(name):
            raise ValueError(f"invalid ref name {name!r} (alnum/_-. only)")
        if version is None:
            version = self.current_version()
            if version is None:
                raise ValueError(f"nothing to tag in {self.root}")
        self._raw(version)  # raises if unknown
        import time as _time

        def on_exists():
            raise ValueError(
                f"tag {name!r} already exists in {self.root} (tags are "
                "immutable; drop_tag first to move it)"
            ) from None

        _exclusive_publish_json(
            self._tdir,
            f"{name}.json",
            {"version": version, "ts": _time.time()},
            on_exists,
        )
        return version

    def drop_tag(self, name: str) -> None:
        self._require_main("drop_tag")
        # same traversal hazard as drop_branch: '../v00001' would name a
        # SNAPSHOT manifest, and deleting it through the tag verb would
        # break the immutable-history contract
        if not ManifestTable._REF_NAME_OK(name):
            raise ValueError(f"invalid ref name {name!r} (alnum/_-. only)")
        f = os.path.join(self._tdir, f"{name}.json")
        if not os.path.exists(f):
            raise ValueError(f"no such tag {name!r} in {self.root}")
        os.remove(f)

    def read_tag(self, spark: SparkSession, name: str) -> DataFrame:
        """``read`` at the tagged version (VERSION AS OF a name)."""
        tags = self.tags()
        if name not in tags:
            raise ValueError(f"no such tag {name!r} in {self.root}")
        return self.read(spark, tags[name])

    def expire(self, keep_last: int = 1) -> list[str]:
        """Drop all but the last ``keep_last`` snapshots and DELETE data
        files no surviving manifest references. Returns the deleted file
        paths. Time travel to expired versions stops working (by design);
        surviving snapshots are byte-identical to before.

        OWNERSHIP GUARD: only files under THIS table's ``<root>/data``
        are ever deleted. A shallow clone's manifests reference the
        SOURCE table's files by absolute path; expiring the clone must
        drop its manifests without reaching into the source — Delta's
        shallow-clone contract (maintenance on the clone never deletes
        source data).

        REF GUARDS: tagged versions survive regardless of ``keep_last``
        (their manifests are not dropped, their files not reclaimed), and
        files/groups referenced by any BRANCH snapshot are kept — a branch
        shares the main table's data plane, so main-table maintenance must
        see branch references or it would destroy staged WAP state. Runs
        on the main table only (branch handles raise): a branch's expiry
        is ``drop_branch``."""
        self._require_main("expire")
        vs = self.versions()
        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        tagged = set(self.tags().values())
        keep = [v for v in vs if v in tagged or v in set(vs[-keep_last:])]
        drop = [v for v in vs if v not in set(keep)]
        # Every membership/prefix test below runs on realpath-normalized
        # spellings: a table opened via a relative path, a different CWD, or
        # a symlinked mount must never mistake a LIVE file for garbage just
        # because the manifest recorded a different spelling of it.
        referenced: set[str] = set()
        kept_groups: set[str] = set()
        for v in keep:
            referenced.update(_norm(f) for f in self._manifest(v)["files"])
            kept_groups.update(
                _norm(g["path"]) for g in self._raw(v).get("groups", [])
            )
        for bname in self.branches():
            bt = ManifestTable(self.root, _branch=bname)
            for v in bt.versions():
                referenced.update(_norm(f) for f in bt._manifest(v)["files"])
                kept_groups.update(
                    _norm(g["path"]) for g in bt._raw(v).get("groups", [])
                )
        own_prefix = _norm(os.path.join(self.root, "data")) + os.sep
        removed: list[str] = []
        dropped_groups: set[str] = set()
        dropped_dv: set[str] = set()
        for v in drop:
            for f in self._manifest(v)["files"]:
                nf = _norm(f)
                if (
                    nf.startswith(own_prefix)
                    and nf not in referenced
                    and os.path.exists(f)
                ):
                    os.remove(f)
                    removed.append(f)
            dropped_groups.update(
                _norm(g["path"]) for g in self._raw(v).get("groups", [])
            )
            dropped_dv.update(_norm(p) for p in self._dv(v)["files"])
            os.remove(os.path.join(self._mdir, f"v{v:05d}.json"))
            self._mcache.pop(v, None)
            self._rawcache.pop(v, None)
        # group manifests no surviving snapshot references are garbage too
        # (returned list stays data-files-only: the caller-facing contract
        # is "which DATA was physically deleted"); same ownership guard —
        # a clone's manifests reference the SOURCE's group files, which
        # expire-on-the-clone must never delete
        own_groups = _norm(self._gdir) + os.sep
        for g in sorted(dropped_groups - kept_groups):
            if g.startswith(own_groups) and os.path.exists(g):
                os.remove(g)
                self._gcache.pop(g, None)
        # deletion-vector files referenced by DROPPED manifests (and by no
        # survivor) are garbage too — the kept set spans main + branch
        # namespaces. The sweep mirrors the data-file rule EXACTLY: only
        # files a dropped manifest referenced are reclaimed. A dv-* file
        # on disk but in no manifest may be an IN-FLIGHT delete_where(dv)
        # / _compact_dv write racing this expire (DV parquet lands before
        # its manifest publishes); deleting it would let the publish
        # succeed against missing files. Such orphans are vacuum_orphans'
        # job, behind its min-age guard.
        kept_dv: set[str] = set()
        for ns in [self] + [ManifestTable(self.root, _branch=b) for b in self.branches()]:
            for v in ns.versions():
                kept_dv.update(_norm(p) for p in ns._dv(v)["files"])
        own_dv = _norm(os.path.join(self.root, "_deletes")) + os.sep
        for p in sorted(glob.glob(os.path.join(self.root, "_deletes", "dv-*"))):
            np_ = _norm(p)
            if not np_.startswith(own_dv) or np_ in kept_dv:
                continue
            # dv-delete versions write DIRECTORIES of parquet parts;
            # compactions write single files — reclaim whichever form,
            # but only when every part was referenced by a dropped
            # manifest and none by a surviving one
            if os.path.isdir(p):
                parts = {_norm(x) for x in glob.glob(os.path.join(p, "*.parquet"))}
                if parts and parts.isdisjoint(kept_dv) and parts <= dropped_dv:
                    shutil.rmtree(p)
            elif np_ in dropped_dv:
                os.remove(p)
        return removed

    def rewrite_manifests(self, target_groups: int = 1) -> int:
        """Metadata-only manifest compaction (Iceberg's
        ``rewrite_manifests``): merge the current snapshot's group
        manifests into ``target_groups`` balanced groups and publish the
        result as a new snapshot — ZERO data movement, the logical file
        set is byte-identical. This is the maintenance op that keeps the
        manifest LIST itself O(small) on long-lived tables: after 10k
        commits a snapshot carries 10k group entries (and a point probe
        pays 10k summary checks); one rewrite collapses that to a handful
        of balanced groups with freshly-computed summary envelopes, and
        routine ``expire`` reclaims the superseded group files once no
        surviving snapshot references them.

        Because the FILE SET is unchanged and nothing was added,
        incremental readers may safely CROSS this snapshot (unlike
        compact/overwrite/restore, whose files are rewrites) — ``diff``
        and the changelog stream treat it as contributing zero rows.

        File order is preserved within each SPEC COHORT (groups are
        repacked per partition-spec stamp — mixing cohorts would destroy
        per-cohort pruning after a spec evolution); on a single-spec
        table, the common case, that degenerates to cumulative commit
        order and resolved ``files`` lists stay byte-stable."""
        cur = self.current_version()
        if cur is None:
            raise ValueError(f"nothing to rewrite in {self.root}")
        if target_groups < 1:
            raise ValueError("target_groups must be >= 1")
        # regroup PER COHORT: a group's spec stamp is what lets each
        # cohort prune under its own partition transform after a spec
        # evolution, and its cols stamp is what translates renamed-column
        # predicates to write-time stats keys — packing cohorts with
        # different stamps into one group would destroy both. Cohorts in
        # first-seen order; file order preserved within.
        by_cohort: dict = {}
        stamps: dict = {}
        stats: dict[str, dict] = {}
        blooms: dict[str, dict] = {}
        rows: dict[str, int] = {}
        total = 0
        for g in self._groups_of(cur):
            grp = self._load_group(g["path"])
            gcols = g.get("cols")
            key = (g.get("spec"), tuple(sorted(gcols.items())) if gcols else None)
            by_cohort.setdefault(key, []).extend(grp["files"])
            stamps[key] = (g.get("spec"), gcols)
            total += len(grp["files"])
            stats.update(grp["stats"])
            blooms.update(grp.get("blooms", {}))
            rows.update(grp.get("rows", {}))
        if not total:
            raise ValueError(
                f"snapshot v{cur} of {self.root} is empty — nothing to rewrite"
            )
        per = -(-total // target_groups)
        entries = [
            self._write_group(
                files[i : i + per], stats, blooms or None, rows or None,
                spec=stamps[key][0], cols=stamps[key][1],
            )
            for key, files in by_cohort.items()
            for i in range(0, len(files), per)
        ]
        v = cur + 1
        self._publish(
            v, "rewrite_manifests", None, entries, [],
            self._spec_extra(cur, self._dv_extra(self._dv(cur))) or None,
        )
        return v

    def vacuum_orphans(self, min_age_seconds: float = 3600.0) -> list[str]:
        """Delete whole data directories under ``<root>/data`` that NO
        manifest references — the leftovers of commits that crashed between
        the data write and the manifest publish, and of commits that LOST a
        concurrent-writer race (plus stale ``.tmp`` manifests). Removing
        the directory (not just ``*.parquet``) matters: it also clears
        ``_SUCCESS`` markers so the version directory namespace is fully
        reclaimed. Returns every reclaimed path: deleted data files,
        stale tmp manifests, and orphaned group manifests (groups no
        snapshot references — the leftovers of the same torn/lost
        commits). ``expire``'s return, by contrast, stays
        data-files-only (its documented caller contract).

        ``min_age_seconds`` is the retention window that makes vacuum safe
        under CONCURRENT writers: a commit in flight right now has written
        its data directory but not yet published its manifest — without an
        age guard, vacuum would reclaim that directory and the subsequent
        manifest publish would point at deleted files (the exact hazard
        Delta's VACUUM retention hours exist for). Only directories whose
        mtime is older than the window are touched; pass 0 ONLY when no
        writer can be active (tests, single-process maintenance).

        Branch snapshots count as references (shared data plane — see
        ``expire``); runs on the main table only."""
        import time as _time

        self._require_main("vacuum_orphans")
        # glob()'d paths and manifest-recorded paths can spell the same
        # file differently (relative root, symlinked mount, '..' segments);
        # realpath-normalize BOTH sides of every liveness test or a live
        # group/data dir gets reclaimed — destroying file lists and stats
        # for every snapshot that references it.
        referenced: set[str] = set()
        referenced_groups: set[str] = set()
        namespaces = [self] + [
            ManifestTable(self.root, _branch=b) for b in self.branches()
        ]
        for ns in namespaces:
            for v in ns.versions():
                referenced.update(_norm(f) for f in ns._manifest(v)["files"])
                referenced_groups.update(
                    _norm(g["path"]) for g in ns._raw(v).get("groups", [])
                )
        # every ANCESTOR directory of a referenced file (up to data/) is
        # live: a hidden-partitioned commit's files sit one level deeper
        # (data/vNNN-token/__mt_pt=value/part.parquet), and marking only
        # the immediate parent would let the sweep below rmtree the LIVE
        # version directory itself
        data_root = os.path.join(self.root, "data")
        droot = _norm(data_root)
        live_dirs: set[str] = set()
        for f in referenced:
            d = os.path.dirname(f)
            while d.startswith(droot + os.sep):
                live_dirs.add(d)
                d = os.path.dirname(d)
        cutoff = _time.time() - min_age_seconds
        removed: list[str] = []
        if os.path.isdir(data_root):
            for d in sorted(glob.glob(os.path.join(data_root, "*"))):
                if (
                    os.path.isdir(d)
                    and _norm(d) not in live_dirs
                    and os.path.getmtime(d) <= cutoff
                ):
                    removed.extend(
                        sorted(
                            glob.glob(
                                os.path.join(d, "**", "*.parquet"), recursive=True
                            )
                        )
                    )
                    shutil.rmtree(d)
        for ns in namespaces:
            if os.path.isdir(ns._mdir):
                for f in sorted(glob.glob(os.path.join(ns._mdir, ".*.tmp"))):
                    if os.path.getmtime(f) <= cutoff:
                        os.remove(f)
                        removed.append(f)
        # orphan DELETION-VECTOR artifacts: a delete_where(mode='dv') or
        # _compact_dv that crashed (or lost the publish race) leaves its
        # dv-* parquet referenced by no manifest; expire() deliberately
        # refuses them (they are indistinguishable from an IN-FLIGHT
        # write), so this age-guarded sweep is their only reclaimer —
        # mirroring the data-directory rule exactly.
        kept_dv: set[str] = set()
        for ns in namespaces:
            for v in ns.versions():
                kept_dv.update(_norm(x) for x in ns._dv(v)["files"])
        for p in sorted(glob.glob(os.path.join(self.root, "_deletes", "dv-*"))):
            if os.path.getmtime(p) > cutoff:
                continue
            if os.path.isdir(p):
                parts = {_norm(x) for x in glob.glob(os.path.join(p, "*.parquet"))}
                if parts.isdisjoint(kept_dv):
                    removed.extend(sorted(parts))
                    shutil.rmtree(p)
            elif _norm(p) not in kept_dv:
                os.remove(p)
                removed.append(p)
        # orphan GROUP manifests: written by commits that crashed or lost
        # the OCC race before their snapshot publish (plus stale group
        # tmp files). Same retention window: an in-flight commit has
        # written its group but not yet its snapshot manifest.
        if os.path.isdir(self._gdir):
            for f in sorted(glob.glob(os.path.join(self._gdir, ".*.tmp"))):
                if os.path.getmtime(f) <= cutoff:
                    os.remove(f)
                    removed.append(f)
            for g in sorted(glob.glob(os.path.join(self._gdir, "g-*.json"))):
                if _norm(g) not in referenced_groups and os.path.getmtime(g) <= cutoff:
                    os.remove(g)
                    self._gcache.pop(g, None)
                    removed.append(g)
        return removed

    def _write_data(
        self,
        df: DataFrame,
        v: int,
        bloom_cols: list[str] | None = None,
        partition_by: str | None = None,
        partition_splits: int = 1,
    ) -> list[str]:
        # FIELD IDS: on a field-ids table every written column carries
        # its stable ``PARQUET:field_id`` (new names extend the mapping
        # with fresh ids; the extended mapping is stashed for _publish).
        # This is what later makes RENAME metadata-only — see
        # ``rename_column``. Enabled at table birth via
        # commit(field_ids=True); retired names are never reassigned.
        # Pop first: a PRIOR aborted attempt (CHECK violation between
        # write and publish) must not leak its extension into this one.
        self.__dict__.pop("_pending_columns", None)
        cur = self.current_version()
        ids = self.column_ids(cur) if cur else None
        if ids is None and getattr(self, "_enable_field_ids", False):
            ids = {}
        if ids is not None:
            from pyspark.sql import functions as _F

            raw_cur = self._raw(cur) if cur else {}
            retired = set(raw_cur.get("retired_columns", []))
            # A retired name that is LIVE in the current mapping is not a
            # recycled name: RESTORE to a pre-rename/pre-drop snapshot
            # resurrects the column under its ORIGINAL field id (the
            # restored manifest carries that snapshot's columns mapping),
            # so its stats translate correctly. Only a retired name that
            # would be assigned a FRESH id is the stale-stats hazard.
            clash = [c for c in df.columns if c in retired and c not in ids]
            if clash:
                raise ValueError(
                    f"commit to {self.root}: column name(s) {clash} are "
                    "RETIRED (used before a rename/drop) — recycled names "
                    "could match stale pre-rename stats; pick different names"
                )
            # fresh ids must clear DROPPED ids too: reusing a dropped id
            # would resolve old files' dropped column as the new one
            nxt = max(
                [*ids.values(), *raw_cur.get("dropped_ids", [])], default=0
            ) + 1
            for c in df.columns:
                if c not in ids:
                    ids[c] = nxt
                    nxt += 1
            self._pending_columns = [
                {"id": i, "name": n} for n, i in ids.items()
            ]
            df.sparkSession.conf.set(
                "spark.sql.parquet.fieldId.write.enabled", "true"
            )
            df = df.select(
                *[
                    _F.col(c).alias(c, metadata={"parquet.field.id": ids[c]})
                    for c in df.columns
                ]
            )
        # Unique suffix per write ATTEMPT: a concurrent writer racing to
        # the same version, or a retry after a torn (crashed) commit, never
        # collides with leftover data directories — losers/leftovers are
        # unreferenced orphans that vacuum_orphans() reclaims.
        token = uuid.uuid4().hex[:8]
        data_dir = os.path.join(self.root, "data", f"v{v:05d}-{token}")
        pt_values: dict[str, object] = {}
        if partition_by is None:
            df.write.mode("error").parquet(data_dir)
            files = sorted(glob.glob(os.path.join(data_dir, "*.parquet")))
        else:
            # HIDDEN PARTITIONING (Iceberg's spec-transform shape): the
            # partition value is the TRANSFORM EXPRESSION's result, hoisted
            # into the directory layout so every data file holds exactly
            # one partition value — the source columns stay in the data
            # (reads never depend on hive discovery; the file list IS the
            # table). The value is recorded per file as a [v, v] stat under
            # the reserved __pt column, so partition pruning rides the
            # SAME two-level group-summary -> file metadata pass as
            # zone-map pruning, with zero new read-side machinery.
            from pyspark.sql import functions as _F

            if "__mt_pt" in df.columns:
                raise ValueError(
                    "commit(partition_by=...): input column '__mt_pt' "
                    "collides with the internal partition working column"
                )
            pt = _F.expr(partition_by)
            staged = df.withColumn("__mt_pt", pt)
            if partition_splits > 1:
                # WITHIN-VALUE file splitting: one file per partition
                # value is a multi-TB file on a 100-TB month — salt the
                # distribution so each value lands in `partition_splits`
                # writer tasks (deterministic: row-hash mod splits).
                # Size splits ~= value_bytes / target_file_bytes.
                hashable = [
                    f.name
                    for f in df.schema.fields
                    # xxhash64 rejects MapType anywhere in the type tree —
                    # a map nested inside a struct/array fails at analysis
                    # time just like a top-level one, so check the whole
                    # simpleString, not only its prefix
                    if "map<" not in f.dataType.simpleString()
                ] or None
                salt = (
                    _F.pmod(
                        _F.xxhash64(*[_F.col(c) for c in hashable]),
                        _F.lit(partition_splits),
                    )
                    if hashable
                    else _F.spark_partition_id() % partition_splits
                )
                # explicit partition count: AQE would otherwise coalesce
                # the salted shuffle back into one task per value. Hash
                # collisions of (value, salt) combos can only MERGE
                # splits, never exceed them: files per value is in
                # [1, partition_splits].
                staged = staged.repartition(
                    max(64, partition_splits * 16), _F.col("__mt_pt"), salt
                )
            else:
                staged = staged.repartition(pt)  # one task per value
            (
                staged.write.mode("error")
                .partitionBy("__mt_pt")
                .parquet(data_dir)
            )
            from urllib.parse import unquote

            files = sorted(
                glob.glob(os.path.join(data_dir, "__mt_pt=*", "*.parquet"))
            )
            # parse directory values by the TRANSFORM'S OWN Spark type —
            # never by guessing from the text: a STRING transform value
            # "1" must stay the string "1" (coercing it to int 1 would
            # collide with value "01" and leak rows through the
            # residual-less partition read), while an int transform's "7"
            # must become int 7 so range predicates order numerically
            pt_type = staged.schema["__mt_pt"].dataType.simpleString()
            if pt_type in ("tinyint", "smallint", "int", "bigint"):
                parse = int
            elif pt_type in ("float", "double"):
                parse = float
            elif pt_type == "boolean":
                parse = lambda r: r == "true"  # noqa: E731
            else:  # string / date / timestamp: ISO text orders correctly
                parse = lambda r: r  # noqa: E731
            for f in files:
                raw = unquote(os.path.basename(os.path.dirname(f))[len("__mt_pt=") :])
                if raw == "__HIVE_DEFAULT_PARTITION__":
                    continue  # NULL partition value: unprunable, no stat
                pt_values[f] = parse(raw)
        # Per-file commit metadata (footer stats, row counts, bloom
        # bitsets) is built EXECUTOR-SIDE in one job — one task per
        # written file — whenever the build must read column data
        # (bloom_cols) or the delta is wide, so a large commit's reads
        # parallelize across the cluster and only encoded bytes come
        # back. Small bloom-less deltas (< 256 MiB total) skip the job:
        # their build is footer-only metadata reads, cheaper on the
        # driver than a scheduler round-trip — any real cluster-scale
        # commit clears the threshold.
        meta: dict[str, dict] = {}
        small = sum(os.path.getsize(f) for f in files) < (256 << 20)
        if files and (bloom_cols or not small):
            tasks = [(f, list(bloom_cols or [])) for f in files]
            sc = df.sparkSession.sparkContext
            meta = dict(
                sc.parallelize(tasks, len(tasks)).map(_build_file_meta).collect()
            )
        elif files:
            meta = dict(_build_file_meta((f, [])) for f in files)
        self._pending_stats = {f: meta[f]["stats"] for f in files}
        self._pending_rows = {f: meta[f]["rows"] for f in files}
        self._pending_blooms = {f: meta[f]["blooms"] for f in files}
        for f, val in pt_values.items():
            self._pending_stats[f]["__pt"] = [val, val]
        return files

    def _stats_for(self, added: list[str]) -> dict:
        """Column min/max stats for the files just written by _write_data
        (computed from their parquet footers at write time — the manifest
        is the stats store, so readers never open a footer to prune)."""
        pending = getattr(self, "_pending_stats", {})
        return {f: pending.get(f, {}) for f in added}

    def _rows_for(self, added: list[str]) -> dict:
        """Per-file row counts for the files just written (footer
        metadata, captured in _write_data) — the manifest-level term that
        makes COUNT(*) a metadata read."""
        pending = getattr(self, "_pending_rows", {})
        return {f: pending[f] for f in added if f in pending}

    @staticmethod
    def _summarize(files: list[str], stats: dict) -> dict:
        """The group's per-column [min, max] ENVELOPE, kept only for
        columns EVERY member file has stats for — a file without stats is
        unprunable, so its group must stay unprunable on that column
        (absent summary = always open the group; conservative, never
        wrong). Uncomparable stat types (mixed) drop the column."""
        common: set | None = None
        for f in files:
            ks = set(stats.get(f) or {})
            common = ks if common is None else common & ks
        out: dict[str, list] = {}
        for c in sorted(common or ()):
            try:
                lo = min(stats[f][c][0] for f in files)
                hi = max(stats[f][c][1] for f in files)
            except TypeError:
                continue
            out[c] = [lo, hi]
        return out

    def _nonempty(self, added: list[str]) -> list[str]:
        """Drop 0-row part files from a just-written delta (Spark emits
        them for empty partitions). They carry no rows and no row-group
        stats, and an all-unknown-stats member silently erases a column
        from its group's prunable summary — filtering them keeps the
        partial-COW rewrite groups stats-complete. Row counts were
        captured from the footers in _write_data."""
        pending = getattr(self, "_pending_rows", {})
        return [f for f in added if pending.get(f, 0) > 0]

    def _stats_candidate_files(self, version: int, col: str, lo, hi) -> list[str]:
        """Files of snapshot ``version`` that MAY hold a row with ``col``
        in [lo, hi], decided purely from the manifest's per-file min/max
        stats — the metadata-only rewrite planner behind merge_by_key.
        Conservative by construction: a file without stats for ``col`` is
        always a candidate; only a proven-disjoint range is skipped.
        ``lo``/``hi`` of None (empty or all-null update keys) means no
        row can match — empty candidate set."""
        if lo is None or hi is None:
            return []
        out: list[str] = []
        for entry in self._groups_of(version):
            g = self._load_group(entry["path"])
            stats = g.get("stats") or {}
            for f in g["files"]:
                st = (stats.get(f) or {}).get(col)
                if st is None or not (st[1] < lo or st[0] > hi):
                    out.append(f)
        return out

    def _match_manifest_files(self, version: int, uris: set[str]) -> list[str]:
        """Resolve ``input_file_name()`` URIs (``file:///...``, possibly
        percent-encoded) back to the manifest's own file spellings for
        snapshot ``version`` — the join between a scan's provenance and
        the manifest, used by the partial-COW verbs to pick their rewrite
        set. Manifest order is preserved."""
        norm_hits = {_norm(_uri_to_path(u)) for u in uris}
        return [
            f for f in self._manifest(version)["files"] if _norm(f) in norm_hits
        ]

    def _carry_groups(self, version: int, dropped: set[str]) -> list[dict]:
        """Snapshot ``version``'s group entries with ``dropped`` files
        removed — the carry-forward half of a partial copy-on-write
        rewrite. Groups containing no dropped file are carried VERBATIM
        (same immutable group manifest, zero writes); groups losing some
        files get one new subset group reusing the surviving files'
        existing stats/blooms/row counts."""
        out: list[dict] = []
        for entry in self._groups_of(version):
            g = self._load_group(entry["path"])
            survivors = [f for f in g["files"] if f not in dropped]
            if len(survivors) == len(g["files"]):
                out.append(entry)
            elif survivors:
                out.append(
                    self._write_group(
                        survivors,
                        g.get("stats", {}),
                        g.get("blooms"),
                        g.get("rows"),
                        # surviving files keep their original __pt values
                        # and write-time names, so the subset group keeps
                        # the cohort's spec AND cols stamps
                        spec=entry.get("spec"),
                        cols=entry.get("cols"),
                    )
                )
        return out

    _COLS_AUTO = object()  # sentinel: derive the group's cols stamp

    def _write_group(
        self,
        files: list[str],
        stats: dict,
        blooms: dict | None = None,
        rows: dict | None = None,
        spec: str | None = None,
        cols=_COLS_AUTO,
    ) -> dict:
        """Write an immutable file-group manifest and return its snapshot
        entry ``{path, n_files, summary[, spec]}``. Unique name per write
        attempt (same reasoning as data dirs): a group whose snapshot
        publish loses the OCC race or crashes is an orphan
        ``vacuum_orphans`` reclaims — group files need no OCC of their own.

        ``spec`` records the PARTITION SPEC the group's files were written
        under (their ``__pt`` values' transform) — the per-cohort half of
        Iceberg-style partition-spec evolution: when ``commit(partition_by=
        new)`` changes the table spec, old cohorts keep pruning under their
        own stamped spec while new data prunes under the new one
        (``pruned_files(pt_preds=...)``), at O(new data) cost instead of a
        full rewrite. Groups without a stamp (pre-evolution history) read
        as the snapshot-level spec, which is exactly what they were
        written under when spec changes were impossible.

        ``cols`` records the WRITE-TIME {name: field id} mapping of a
        field-ids table's group — the translation key that keeps STATS
        PRUNING exact across renames: a predicate on the current name
        resolves, per group, to the name the column was WRITTEN under
        (same id), so pre-rename cohorts keep skipping files instead of
        degrading to conservative. Default (the sentinel) derives it
        from the write that just ran (``_pending_columns``); callers
        carrying an EXISTING group's files pass that group's own stamp
        (or None for unstamped legacy groups) explicitly."""
        if cols is ManifestTable._COLS_AUTO:
            pend = self.__dict__.get("_pending_columns")
            cols = {c["name"]: c["id"] for c in pend} if pend else None
        os.makedirs(self._gdir, exist_ok=True)
        path = os.path.join(self._gdir, f"g-{uuid.uuid4().hex[:12]}.json")
        tmp = os.path.join(self._gdir, f".{os.path.basename(path)}.tmp")
        payload = {"files": files, "stats": {f2: stats.get(f2, {}) for f2 in files}}
        if blooms:
            payload["blooms"] = {f2: blooms.get(f2, {}) for f2 in files}
        if rows:
            payload["rows"] = {f2: rows[f2] for f2 in files if f2 in rows}
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(payload, f, indent=1)
        os.replace(tmp, path)
        entry = {
            "path": path,
            "n_files": len(files),
            "summary": self._summarize(files, stats),
        }
        if spec:
            entry["spec"] = spec
        if cols:
            entry["cols"] = cols
        # entry-level row total only when EVERY member file's count is
        # known — a partial sum would read as an exact answer
        if rows and all(f2 in rows for f2 in files):
            entry["n_rows"] = sum(rows[f2] for f2 in files)
        return entry

    def _groups_of(self, version: int) -> list[dict]:
        """The snapshot's group entries. A format-1 (flat) snapshot is
        upgraded on the fly by materializing ONE group from its inline
        file list + stats — called only from write paths, so the side
        effect (one new group file) rides an operation that writes
        manifests anyway."""
        raw = self._raw(version)
        if "groups" in raw:
            return list(raw["groups"])
        files = raw["files"]
        return [
            self._write_group(
                files, self.snapshot_stats(version),
                spec=self.partition_spec(version),
                cols=self.column_ids(version),
            )
        ]

    def _publish(
        self,
        version: int,
        operation: str,
        key: str | None,
        groups: list[dict],
        added_groups: list[str],
        extra: dict | None = None,
    ) -> None:
        """Compose and exclusively publish a format-2 snapshot manifest:
        O(#groups) metadata regardless of how many files the table holds."""
        manifest: dict = {
            "version": version,
            "operation": operation,
            "key": key,
            "format": 2,
            "groups": groups,
            "added_groups": added_groups,
        }
        if extra:
            manifest.update(extra)
        # column-id mapping rides EVERY snapshot of a field-ids table:
        # a write that extended it stashes the new mapping
        # (_pending_columns, set by _write_data); anything else inherits
        # the previous version's verbatim — renames stay versioned, so
        # time travel reads pre-rename names.
        pending = self.__dict__.pop("_pending_columns", None)
        if pending is not None and "columns" not in manifest:
            manifest["columns"] = pending
        if version > 1:
            try:
                prev = self._raw(version - 1)
            except ValueError:
                prev = {}
            for k in ("columns", "retired_columns", "renamed_ever", "dropped_ids"):
                if k in prev and k not in manifest:
                    manifest[k] = prev[k]
        self._write_manifest(manifest)

    def _write_manifest(self, manifest: dict) -> None:
        """Publish a manifest by EXCLUSIVE create (the shared
        ``_exclusive_publish_json`` discipline): readers see either
        nothing or the complete manifest, and two racing writers get
        exactly one winner (→ ConcurrentCommitError).

        Commit timestamps are made STRICTLY increasing within a
        namespace: a coarse or quantized clock can stamp two successive
        commits with the same ``time.time()``, which would make
        TIMESTAMP AS OF ambiguous between them (version_at keeps the
        LAST version at-or-before the probe) — nudging by 1 µs keeps
        every probe strictly between two distinct instants."""
        import time as _time

        v = manifest["version"]
        if "ts" not in manifest:
            now = _time.time()
            if v > 1:
                try:
                    prev_ts = self._raw(v - 1).get("ts")
                except ValueError:
                    prev_ts = None
                if prev_ts is not None and now <= prev_ts:
                    now = prev_ts + 1e-6
            manifest["ts"] = now

        def on_exists():
            raise ConcurrentCommitError(
                f"version {v} of {self.root} was committed by another writer; "
                "re-read the table and retry (this attempt's data files are "
                "orphans — vacuum_orphans() reclaims them)"
            ) from None

        _exclusive_publish_json(self._mdir, f"v{v:05d}.json", manifest, on_exists)

    # -- reads --------------------------------------------------------------

    def read(
        self,
        spark: SparkSession,
        version: int | None = None,
        merge_schema: bool = False,
    ) -> DataFrame:
        """The snapshot as of ``version`` (default: latest).

        ``merge_schema=True`` unions the schemas of all snapshot files:
        columns added by later commits surface with NULL backfill for
        older files (the `source_schema_evolution` semantics applied to
        the versioned table), and a SAFE TYPE WIDENING across commits
        (int->long, float->double, decimal precision increase — the
        Iceberg promotion matrix) reads at the widest type with narrower
        cohorts up-cast in place at the scan (round 14,
        `_widened_struct`). Off by default: schema merging reads every
        footer up front, which a 100 TB table pays in listing latency.
        """
        if version is None:
            version = self.current_version()
            if version is None:
                raise ValueError(f"table {self.root} has no committed snapshot")
        files = self._manifest(version)["files"]
        if not files:
            raise ValueError(f"snapshot v{version} of {self.root} is empty")
        if self._raw(version).get("renamed_ever"):
            # a renamed table's cohorts may disagree on NAMES; only the
            # by-ID union read is correct, for plain and merged reads alike
            df = self._union_read(spark, files, version)
        elif merge_schema:
            df = _merged_read(spark, files)
        else:
            df = spark.read.parquet(*files)
        return self._apply_dv(spark, df, self._dv(version))

    def _union_read(
        self,
        spark: SparkSession,
        files: list,
        version: int | None,
        merged: bool = True,
    ) -> DataFrame:
        """Scan ``files`` under the snapshot's UNION schema across every
        evolution kind this format supports: additive null-fill, safe
        type widening, and — on a table that has RENAMED — by-field-ID
        column resolution under the current names. Tables that never
        renamed take `_merged_read`'s distributed mergeSchema fast path;
        renamed tables pay one footer sweep over the files actually read
        (the by-ID target schema) and still scan ONCE — Spark's fieldId
        readers up-cast and re-name in place. Every verb that reads data
        files of a possibly-evolved snapshot routes through here."""
        if version is None:
            version = self.current_version()
        raw = self._raw(version) if version else {}
        ids = self.column_ids(version) if version else None
        if ids and raw.get("renamed_ever"):
            spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
            target = _widened_struct(
                spark, files, id_names=ids,
                dropped_ids=set(raw.get("dropped_ids", [])),
            )
            return spark.read.schema(target).parquet(*files)
        # `merged=False`: the caller wants the historical plain-scan plan
        # (e.g. read_pruned, whose kept sets are single-schema in the
        # common case) — only a renamed table forces the union machinery
        return _merged_read(spark, files) if merged else spark.read.parquet(*files)

    # -- merge-on-read deletion vectors ---------------------------------------

    def _rewrite_reset(self, base: int | None) -> dict:
        """Publish extras for a FULL rewrite (compact/replace): every
        surviving file was just written under the CURRENT names, so the
        by-ID read path (``renamed_ever``) can switch back off — plain
        scans are correct again and skip the footer sweep. The retired
        names and dropped ids stay carried (the never-recycle discipline
        outlives the files that motivated it)."""
        if base and self._raw(base).get("renamed_ever"):
            return {"renamed_ever": False}
        return {}

    def _spec_extra(self, base: int, extra: dict) -> dict:
        """Fold the base snapshot's partition spec AND column-id mapping
        into a publish extra — the carry half of table-level spec/schema
        semantics for the flows (_publish can't inherit across: branch
        v1, publish, clone, restore). setdefault: a verb that already
        changed the mapping (rename) wins."""
        spec = self.partition_spec(base)
        extra = dict(extra)
        if spec:
            extra.setdefault("partition_by", spec)
        braw = self._raw(base)
        for k in ("columns", "retired_columns", "renamed_ever", "dropped_ids"):
            if k in braw:
                extra.setdefault(k, braw[k])
        return extra

    def partition_spec(self, version: int | None = None) -> str | None:
        """The snapshot's hidden-partition transform (``partition_by``),
        or None for an unpartitioned snapshot. Table-level semantics:
        once established (by a partitioned commit or
        ``compact(partition_by=...)``), every write verb INHERITS it —
        appends, partial-COW deletes, merges, bin-packing, DV
        materialization — so the layout survives maintenance, exactly as
        an Iceberg spec does. Dropped by plain ``compact()``/``replace``
        (full rewrites to an explicit layout) or by committing with
        ``partition_by=""``."""
        if version is None:
            version = self.current_version()
            if version is None:
                return None
        return self._raw(version).get("partition_by") or None

    # -- field-id schema (column rename as metadata) --------------------------

    def column_ids(self, version: int | None = None) -> dict | None:
        """The snapshot's column-id mapping as an ORDERED ``{name: id}``
        dict (insertion order = canonical column order), or None for a
        table without field IDs. Stable IDs are what make RENAME a
        metadata operation: data files carry ``PARQUET:field_id`` per
        column, so a read under the current names resolves every cohort
        by ID regardless of what the column was called when the file was
        written (Iceberg's name-mapping contract, via Spark's
        ``spark.sql.parquet.fieldId.read.enabled`` readers)."""
        if version is None:
            version = self.current_version()
            if version is None:
                return None
        cols = self._raw(version).get("columns")
        if not cols:
            return None
        return {c["name"]: c["id"] for c in cols}

    def rename_column(self, old: str, new: str) -> int:
        """RENAME a column — METADATA-ONLY, zero data movement at any
        table size: publishes one ``rename_column`` snapshot whose
        column-id mapping carries the same IDs under the new name. Data
        files are untouched; reads resolve old cohorts by field ID.
        History stays honest: time travel to a pre-rename version reads
        the OLD name.

        Requires a field-ids table (first commit made with
        ``field_ids=True`` — every data file must carry IDs, which only
        birth-time enablement guarantees). Refuses:

        - renaming a column the current PARTITION SPEC references (later
          partitioned writes would evaluate a stale transform);
        - reusing a RETIRED name (``old`` joins the retired set forever:
          a recycled name could match a pre-rename cohort's stale column
          stats and silently mis-prune);
        - internal names (``__pt``/``__mt_*``).

        Incremental readers may CROSS a rename (zero rows, like
        ``rewrite_manifests``); the changelog stream keeps emitting under
        its DECLARED schema, resolving each file by ID. STATS stay
        first-class: group manifests stamp their write-time name<->id
        mapping (``cols``), so pruning and ``metadata_agg`` translate a
        current-name predicate to each cohort's as-written stats key —
        pre-rename cohorts keep SKIPPING files exactly (the never-recycle
        rule is what makes the translation collision-free)."""
        cur = self.current_version()
        if cur is None:
            raise ValueError(f"nothing to rename in {self.root}")
        raw = self._raw(cur)
        cols = raw.get("columns")
        if not cols:
            raise ValueError(
                f"rename_column: {self.root} is not a field-ids table — "
                "renames need per-file field IDs, enabled by the FIRST "
                "commit (commit(df, field_ids=True))"
            )
        names = [c["name"] for c in cols]
        retired = list(raw.get("retired_columns", []))
        if old not in names:
            raise ValueError(f"rename_column: no column {old!r} (have {names})")
        if new in names or new in retired:
            raise ValueError(
                f"rename_column: name {new!r} is already "
                f"{'in use' if new in names else 'RETIRED'} — names are "
                "never recycled (a recycled name could match a pre-rename "
                "cohort's stale stats and mis-prune)"
            )
        if new.startswith("__mt_") or new == "__pt":
            raise ValueError(f"rename_column: {new!r} is a reserved internal name")
        spec = self.partition_spec(cur)
        if spec and re.search(rf"\b{re.escape(old)}\b", spec):
            raise ValueError(
                f"rename_column: column {old!r} is referenced by the "
                f"current partition spec {spec!r} — re-establish the spec "
                "first (compact(partition_by=...) with the new name)"
            )
        newcols = [
            {"id": c["id"], "name": new if c["name"] == old else c["name"]}
            for c in cols
        ]
        v = cur + 1
        self._publish(
            v, "rename_column", None, self._groups_of(cur), [],
            self._spec_extra(cur, {
                "columns": newcols,
                "retired_columns": retired + [old],
                "renamed_ever": True,
                "renamed": {"from": old, "to": new},
                **self._dv_extra(self._dv(cur)),
            }),
        )
        return v

    def drop_column(self, name: str) -> int:
        """DROP a column — METADATA-ONLY, zero data movement: publishes
        one ``drop_column`` snapshot whose mapping no longer carries the
        name; the column's FIELD ID joins the dropped set, so every read
        (which resolves field-ids tables by ID) simply stops projecting
        it — the bytes stay in existing files until a rewrite touches
        them, exactly Iceberg's DROP COLUMN semantics. Time travel to a
        pre-drop version still reads the column. The name is RETIRED
        (never recycled — same discipline as rename, and for the same
        stats reason). Refuses: non-field-ids tables, the last remaining
        column, and a column the current partition spec references.

        Incremental readers may CROSS a drop (zero rows of its own);
        subsequent feed/stream rows simply lack the column. GDPR note:
        the drop is LOGICAL — physical erasure is ``compact()`` (rewrites
        every file without the column) followed by ``expire``+``vacuum``,
        the same two-step as row deletes."""
        cur = self.current_version()
        if cur is None:
            raise ValueError(f"nothing to drop in {self.root}")
        raw = self._raw(cur)
        cols = raw.get("columns")
        if not cols:
            raise ValueError(
                f"drop_column: {self.root} is not a field-ids table — "
                "metadata drops need per-file field IDs (commit(df, "
                "field_ids=True) on the first commit)"
            )
        names = [c["name"] for c in cols]
        if name not in names:
            raise ValueError(f"drop_column: no column {name!r} (have {names})")
        if len(cols) == 1:
            raise ValueError("drop_column: cannot drop the last column")
        spec = self.partition_spec(cur)
        if spec and re.search(rf"\b{re.escape(name)}\b", spec):
            raise ValueError(
                f"drop_column: column {name!r} is referenced by the "
                f"current partition spec {spec!r} — change the spec first"
            )
        dropped_id = next(c["id"] for c in cols if c["name"] == name)
        v = cur + 1
        self._publish(
            v, "drop_column", None, self._groups_of(cur), [],
            self._spec_extra(cur, {
                "columns": [c for c in cols if c["name"] != name],
                "retired_columns": list(raw.get("retired_columns", [])) + [name],
                "dropped_ids": list(raw.get("dropped_ids", [])) + [dropped_id],
                # reads must resolve by id from here on (pre-drop files
                # still carry the column) — same trigger as rename
                "renamed_ever": True,
                "dropped": {"name": name, "id": dropped_id},
                **self._dv_extra(self._dv(cur)),
            }),
        )
        return v

    def _dv(self, version: int) -> dict:
        """The snapshot's active DELETION-VECTOR set: ``{"files": [dv
        parquet paths], "rows": exact live deleted-row count}``. Empty for
        snapshots without DVs (every pre-DV manifest)."""
        dv = self._raw(version).get("dv")
        return dict(dv) if dv else {"files": [], "rows": 0}

    @staticmethod
    def _dv_extra(dv: dict) -> dict:
        return {"dv": dv} if dv and dv.get("files") else {}

    @staticmethod
    def _apply_dv(spark: SparkSession, df: DataFrame, dv: dict) -> DataFrame:
        """Subtract a deletion-vector set from a raw file scan: anti-join
        on the scan's own (``_metadata.file_path``, ``_metadata.row_index``)
        provenance — the merge-on-read half of DV deletes. The DV side is
        broadcast (it holds one row per DELETED row, the quantity a DV
        delete was chosen to keep small; growth is ENFORCED bounded — a
        DV delete that leaves more than :attr:`dv_max_rows` live
        positions auto-runs :meth:`materialize_dv`, so the broadcast can
        never silently outgrow executor memory). Entries whose
        file is no longer in the scanned set match nothing — stale
        entries after a partial rewrite are harmless by construction."""
        if not dv or not dv.get("files"):
            return df
        from pyspark.sql import functions as _F

        for guard in ("__mt_fp", "__mt_ri"):
            if guard in df.columns:
                raise ValueError(
                    f"column {guard!r} collides with the DV reader's "
                    "provenance columns — rename it"
                )
        dvdf = (
            spark.read.parquet(*dv["files"])
            .select(_F.col("file").alias("__dv_fp"), _F.col("pos").alias("__dv_ri"))
        )
        tagged = df.select(
            "*",
            _F.col("_metadata.file_path").alias("__mt_fp"),
            _F.col("_metadata.row_index").alias("__mt_ri"),
        )
        return (
            tagged.join(
                _F.broadcast(dvdf),
                (_F.col("__mt_fp") == _F.col("__dv_fp"))
                & (_F.col("__mt_ri") == _F.col("__dv_ri")),
                "left_anti",
            )
            .drop("__mt_fp", "__mt_ri")
        )

    def version_at(self, ts: float) -> int:
        """The snapshot that was current at wall-clock time ``ts`` — the
        largest version whose commit timestamp is <= ts (Delta's
        TIMESTAMP AS OF resolution). Raises if the table did not exist
        yet, or if the relevant manifests predate timestamps/are expired.
        Commit timestamps are non-decreasing for a single writer; under
        clock skew between concurrent writers the VERSION order is
        authoritative (as in Delta), so resolution scans in version
        order and keeps the last one at-or-before ts."""
        best = None
        for v in self.versions():
            t = self._raw(v).get("ts")
            if t is not None and t <= ts:
                best = v
        if best is None:
            raise ValueError(
                f"table {self.root} has no snapshot at or before ts={ts}"
            )
        return best

    def history(self, spark: SparkSession) -> DataFrame:
        """The commit log as a DataFrame — DESCRIBE HISTORY: one row per
        surviving version with its operation, commit timestamp,
        idempotency key, and file/delta counts. Reads only SNAPSHOT
        manifests (cached) — file counts come from the group entries'
        ``n_files``, so history never opens a group manifest, let alone a
        data file."""
        rows = []
        for v in self.versions():
            m = self._raw(v)
            if "groups" in m:
                by_path = {g["path"]: g["n_files"] for g in m["groups"]}
                n_files = sum(by_path.values())
                n_added = sum(by_path.get(p, 0) for p in m.get("added_groups", []))
            else:
                n_files = len(m["files"])
                n_added = len(m.get("added", []))
            rows.append(
                (
                    v,
                    m.get("operation", "append"),
                    float(m["ts"]) if m.get("ts") is not None else None,
                    m.get("key"),
                    n_files,
                    n_added,
                )
            )
        return local_df(
            spark,
            rows,
            "version long, operation string, ts double, "
            "idempotency_key string, n_files long, n_added long",
        )

    def snapshot_stats(self, version: int | None = None) -> dict:
        """file -> {col: [min, max]} for every file in the snapshot,
        collected from the manifests that ADDED each file (the manifest is
        the stats store — pruning never opens a parquet footer). Files
        whose adding manifest predates stats (older tables) map to {}."""
        if version is None:
            version = self.current_version()
            if version is None:
                raise ValueError(f"table {self.root} has no committed snapshot")
        raw = self._raw(version)
        if "groups" in raw:
            # stats ride WITH the groups the snapshot references — no
            # version-log scan, and expiry can never strand them
            out: dict[str, dict] = {}
            for g in raw["groups"]:
                grp = self._load_group(g["path"])
                for f in grp["files"]:
                    out[f] = grp["stats"].get(f, {})
            return out
        # format-1 fallback: each manifest only carried its own added
        # files' stats, so walk the version log
        stats: dict[str, dict] = {}
        for v in range(1, version + 1):
            try:
                m = self._manifest(v)
            except ValueError:
                continue  # expired version; its files are not in the snapshot
            stats.update(m.get("stats", {}))
        files = self._manifest(version)["files"]
        return {f: stats.get(f, {}) for f in files}

    def metadata_agg(self, version: int | None = None) -> dict:
        """COUNT(*)/MIN/MAX answered from METADATA alone — the snapshot
        manifest's group entries carry per-group row totals and column
        summary envelopes, so this reads O(#groups) JSON and touches no
        group manifest, no footer, no data (``group_opens`` unchanged;
        the `table_metadata_agg` oracle proves the numbers). On 100 TB
        this is the difference between a millisecond catalog answer and
        a full scan for `SELECT COUNT(*)`.

        Returns ``{"n_rows": int | None, "columns": {col: [min, max]}}``.
        ``n_rows`` is None when any group predates per-file row counts
        (a partial sum must not read as exact); a column appears only
        when EVERY group carries its envelope (same conservatism as
        pruning). MIN/MAX are exact for the snapshot: data files are
        immutable and copy-on-write rewrites re-derive their stats."""
        if version is None:
            version = self.current_version()
            if version is None:
                raise ValueError(f"table {self.root} has no committed snapshot")
        raw = self._raw(version)
        if "groups" not in raw:
            raise ValueError(
                "metadata_agg needs a format-2 snapshot (group entries); "
                f"v{version} of {self.root} is format-1 — rewrite_manifests() "
                "upgrades it"
            )
        groups = raw["groups"]
        cur_ids = self.column_ids(version)
        id_to_cur = {i: n for n, i in (cur_ids or {}).items()}
        n_rows: int | None = 0
        cols: dict[str, list] | None = None
        for g in groups:
            if n_rows is not None and "n_rows" in g:
                n_rows += g["n_rows"]
            else:
                n_rows = None
            summary = g.get("summary", {})
            # rename translation: surface each group's envelope under the
            # CURRENT names (shared field id), so a renamed column keeps
            # its exact metadata MIN/MAX; dropped/unknown ids keep their
            # write-time key and fall out of the cross-group intersection
            gcols = g.get("cols")
            if gcols and id_to_cur:
                summary = {
                    id_to_cur.get(gcols[c], c) if c in gcols else c: v
                    for c, v in summary.items()
                }
            if cols is None:
                cols = {c: list(v) for c, v in summary.items()}
            else:
                for c in list(cols):
                    if c not in summary:
                        del cols[c]
                    else:
                        cols[c][0] = min(cols[c][0], summary[c][0])
                        cols[c][1] = max(cols[c][1], summary[c][1])
        dv = self._dv(version)
        if dv["rows"]:
            # deletion vectors: COUNT stays exact (the manifest carries
            # the exact live deleted-row count, maintained by DV
            # compaction at every rewrite). MIN/MAX stay EXACT for any
            # column whose cumulative DELETED-row envelope (del_env,
            # observed for free on the delete's own scan) is STRICTLY
            # inside the table envelope — no deleted row can occupy an
            # extreme, so the extreme is still attained by a live row.
            # A column with a deleted value AT an extreme (or with no
            # recorded envelope) is omitted rather than served stale;
            # compact()/materialize_dv() restore it.
            if n_rows is not None:
                n_rows -= dv["rows"]
            de = dv.get("del_env") or {}
            keep: dict[str, list] = {}
            for c, (lo, hi) in (cols or {}).items():
                if c not in de:
                    continue
                ent = de[c]
                if ent is None:  # only NULLs were deleted: harmless
                    keep[c] = [lo, hi]
                    continue
                try:
                    if ent[0] > lo and ent[1] < hi:
                        keep[c] = [lo, hi]
                except TypeError:
                    pass  # uncomparable encodings: stay conservative
            cols = keep
        return {"n_rows": n_rows, "columns": cols or {}}

    def pruned_files(
        self,
        col: str | None = None,
        lo=None,
        hi=None,
        version: int | None = None,
        preds: dict | None = None,
        point: dict | None = None,
        pt_preds: dict | None = None,
        _split: bool = False,
    ):
        """The snapshot's files whose [min, max] INTERSECTS every range
        predicate — files with no stats for a column are conservatively
        kept for that predicate. Single-column form: ``(col, lo, hi)``;
        multi-column form: ``preds={col: (lo, hi), ...}`` (ANDed — the
        shape a Z-ordered table prunes on BOTH dimensions with). None =
        unbounded on that side. This is manifest-level zone-map skipping,
        the scan-side half of what makes a 100 TB table cheap to query.

        ``point={col: value}`` adds per-file BLOOM checks (for files
        committed with ``bloom_cols``): a file whose bloom excludes the
        value is skipped even when its [min, max] covers it — the case
        of a randomly-distributed high-cardinality key, where every file
        spans the full range and zone maps prune nothing. Each point
        equality also tightens the range predicates (lo = hi = value), so
        key-clustered tables still prune at the GROUP level first; bloom
        checks themselves are file-level (the group manifest is opened),
        which is the honest trade — a group-level bloom union over
        unclustered keys saturates and prunes nothing. Files without a
        bloom for the column are conservatively kept.

        Two-level resolution order: predicates are tested against each
        GROUP's summary envelope first, and only intersecting groups'
        manifests are opened for per-file checks — a selective probe on a
        clustered table reads O(matching groups) metadata no matter how
        many files the table holds (``group_opens`` counts it).

        PARTITION-SPEC EVOLUTION (round 14): a ``__pt`` entry in ``preds``
        is interpreted under the SNAPSHOT's current spec, and applies only
        to cohorts stamped with (or defaulting to) that spec. The general
        form is ``pt_preds={spec_string: (lo, hi), ...}`` — each cohort
        prunes under ITS OWN stamped spec's range (Iceberg's per-spec file
        pruning), and cohorts whose spec has no entry are conservatively
        KEPT (``read_pruned`` applies the spec residual to exactly those).
        All ``pt_preds`` entries must describe the SAME logical row
        predicate in their own transform space (e.g. months 4..6 and
        quarter 2..2 of one date interval) — they select files, and
        every kept file's rows flow into one result.

        ``_split=True`` returns ``(exact_files, residual_files)`` instead
        of one list: residual files are kept files whose partition
        qualification is NOT proven by metadata (uncovered spec, no
        stamp + no snapshot spec match, or a missing __pt stat such as a
        NULL-partition file) — the set ``read_pruned`` must filter
        row-wise."""
        if preds is None:
            preds = {col: (lo, hi)} if col is not None else {}
        preds = dict(preds)
        if point:
            for c, v in point.items():
                preds.setdefault(c, (v, v))
        if version is None:
            version = self.current_version()
            if version is None:
                raise ValueError(f"table {self.root} has no committed snapshot")
        snap_spec = self.partition_spec(version)
        ptp = dict(pt_preds or {})
        if "__pt" in preds:
            # sugar: a bare __pt range means "under the snapshot's spec".
            # On a snapshot with NO current spec (dropped by an explicit
            # unpartitioned write), it keys None: the pre-evolution
            # "blind" semantics — the range applies to every cohort's
            # __pt stats, the caller asserting a single-spec history.
            ptp.setdefault(snap_spec, preds.pop("__pt"))
        blind = ptp.get(None)
        raw = self._raw(version)
        cur_ids = self.column_ids(version)
        keep: list[str] = []
        resid: list[str] = []
        if "groups" in raw:
            for g in raw["groups"]:
                # unstamped groups were written under the snapshot-level
                # spec (stamps postdate spec evolution; before it, specs
                # could not differ within a snapshot)
                g_spec = g.get("spec") or snap_spec
                gpreds = dict(preds)
                covered = ptp and g_spec is not None and g_spec in ptp
                if covered:
                    gpreds["__pt"] = ptp[g_spec]
                elif blind is not None:
                    gpreds["__pt"] = blind
                # RENAME translation: this group's stats are keyed by its
                # WRITE-TIME names; a predicate on the current name
                # resolves through the shared field id to that name, so
                # pre-rename cohorts keep pruning exactly (never-recycled
                # names make a same-name different-id collision impossible)
                gcols = g.get("cols")
                if gcols and cur_ids:
                    by_id = {i: n for n, i in gcols.items()}

                    def _k(c, _b=by_id, _cur=cur_ids):
                        if c == "__pt" or c not in _cur:
                            return c
                        return _b.get(_cur[c], c)
                else:
                    def _k(c):
                        return c
                summary = g.get("summary", {})
                if any(
                    self._disjoint(summary.get(_k(c)), p_lo, p_hi, c)
                    for c, (p_lo, p_hi) in gpreds.items()
                ):
                    continue  # whole group out of range: manifest never opened
                grp = self._load_group(g["path"])
                for f in grp["files"]:
                    st = grp["stats"].get(f, {})
                    if any(
                        self._disjoint(st.get(_k(c)), p_lo, p_hi, c)
                        for c, (p_lo, p_hi) in gpreds.items()
                    ):
                        continue
                    if point:
                        fb = grp.get("blooms", {}).get(f, {})
                        if any(
                            _k(c) in fb
                            and not _bloom_may_contain(fb[_k(c)], v)
                            for c, v in point.items()
                        ):
                            continue
                    if ptp and not (
                        (covered or blind is not None) and "__pt" in st
                    ):
                        resid.append(f)
                    else:
                        keep.append(f)
            return (keep, resid) if _split else keep + resid
        for f, st in self.snapshot_stats(version).items():
            gpreds = dict(preds)
            covered = ptp and snap_spec is not None and snap_spec in ptp
            if covered:
                gpreds["__pt"] = ptp[snap_spec]
            elif blind is not None:
                gpreds["__pt"] = blind
            if not any(
                self._disjoint(st.get(c), p_lo, p_hi, c)
                for c, (p_lo, p_hi) in gpreds.items()
            ):
                if ptp and not (
                    (covered or blind is not None) and "__pt" in st
                ):
                    resid.append(f)
                else:
                    keep.append(f)
        return (keep, resid) if _split else keep + resid

    @staticmethod
    def _disjoint(mm, p_lo, p_hi, c: str) -> bool:
        """True iff recorded [min, max] ``mm`` provably misses the range —
        missing stats (None) are unprunable, i.e. never disjoint."""
        if mm is None:
            return False
        fmin, fmax = mm
        try:
            return (p_lo is not None and fmax < p_lo) or (
                p_hi is not None and fmin > p_hi
            )
        except TypeError:
            raise ValueError(
                f"pruned_files: bounds for column {c!r} "
                f"({type(p_lo).__name__}/{type(p_hi).__name__}) are not "
                f"comparable with its recorded stats "
                f"({type(fmin).__name__}) — wrong column or bound type"
            ) from None

    def read_pruned(
        self,
        spark: SparkSession,
        col: str | None = None,
        lo=None,
        hi=None,
        version: int | None = None,
        preds: dict | None = None,
        point: dict | None = None,
        partition_exact: bool = True,
        pt_preds: dict | None = None,
    ) -> DataFrame:
        """Exactly ``read(version).where(<all range predicates>)``, but
        scanning only the stats-overlapping files: the residual predicates
        are still applied (file ranges overlap the query range without
        every row matching), so results are identical to the unpruned
        read — proven by the driver oracles of ``table_stats_pruned_read``
        and ``table_zorder_pruned`` — while the scan skips
        non-overlapping files entirely.

        PARTITION PREDICATES. A ``__pt`` entry in ``preds`` filters on the
        snapshot's current partition transform; the general form
        ``pt_preds={spec: (lo, hi), ...}`` gives each spec cohort its OWN
        range (partition-spec evolution — see ``pruned_files``). Files
        whose qualification is proven by metadata (stamped spec covered by
        ``pt_preds`` + a ``__pt`` stat) are read with NO residual — exact
        by construction. Files kept conservatively (uncovered spec,
        unpartitioned commit in a mixed history, NULL partition value)
        get, under ``partition_exact=True`` (default), the COMPUTED
        residual — every ``pt_preds`` transform expression evaluated over
        their rows and range-checked — so the result is exact even across
        spec changes and NULL partitions (a NULL transform value is not in
        any range, per partition-predicate semantics). If a residual
        cannot be built (no spec anywhere to evaluate), it raises.
        ``partition_exact=False`` keeps those files wholesale with NO
        residual: the conservative superset, caller's own filter
        governs."""
        from pyspark.sql import functions as _F

        if preds is None:
            preds = {col: (lo, hi)} if col is not None else {}
        preds = dict(preds)
        v = version if version is not None else self.current_version()
        exact_files, resid_files = self.pruned_files(
            version=version, preds=preds, point=point, pt_preds=pt_preds,
            _split=True,
        )
        ptp = dict(pt_preds or {})
        if "__pt" in preds:
            ptp.setdefault(self.partition_spec(v), preds.pop("__pt"))
        if not (exact_files or resid_files):
            # no file can match: an empty frame with the snapshot's schema
            return self.read(spark, version).where(_F.lit(False))
        dv = self._dv(v)
        if resid_files and ptp and partition_exact:
            residual = None
            for spec, (p_lo, p_hi) in ptp.items():
                if spec is None:
                    raise ValueError(
                        "read_pruned: kept file(s) need a partition "
                        "residual but the predicate's spec is None (bare "
                        "__pt on a snapshot with no current spec) — pass "
                        "pt_preds={<spec>: (lo, hi)} or "
                        "partition_exact=False for the superset"
                    )
                term = _F.lit(True)
                if p_lo is not None:
                    term = term & (_F.expr(spec) >= _F.lit(p_lo))
                if p_hi is not None:
                    term = term & (_F.expr(spec) <= _F.lit(p_hi))
                residual = term if residual is None else (residual & term)
            parts = []
            if exact_files:
                parts.append(
                    self._apply_dv(
                        spark, self._union_read(spark, exact_files, v, merged=False), dv
                    )
                )
            resid_df = self._apply_dv(
                spark, self._union_read(spark, resid_files, v, merged=False), dv
            )
            if residual is not None:
                resid_df = resid_df.where(residual)
            parts.append(resid_df)
            df = parts[0]
            for p in parts[1:]:
                df = df.unionByName(p, allowMissingColumns=True)
        else:
            df = self._apply_dv(
                spark,
                self._union_read(spark, exact_files + resid_files, v, merged=False),
                dv,
            )
        # __pt was folded into ptp above; what remains are ordinary
        # source-column ranges, whose residuals re-apply row-wise
        for c, (p_lo, p_hi) in preds.items():
            if p_lo is not None:
                df = df.where(_F.col(c) >= _F.lit(p_lo))
            if p_hi is not None:
                df = df.where(_F.col(c) <= _F.lit(p_hi))
        for c, v in (point or {}).items():
            df = df.where(_F.col(c) == _F.lit(v))
        return df

    def sql_view(
        self,
        spark: SparkSession,
        name: str,
        version: int | None = None,
        at_ts: float | None = None,
        preds: dict | None = None,
        tag: str | None = None,
        branch: str | None = None,
    ) -> str:
        """Register one snapshot as a temp view so ``spark.sql`` can query
        it — the SQL half of time travel: ``version=`` pins a VERSION AS OF
        read, ``at_ts=`` a TIMESTAMP AS OF read (resolved through
        ``version_at``, version order authoritative under clock skew).
        The view is the NATIVE parquet scan over the snapshot's manifest
        file list — full predicate pushdown, column pruning, and
        whole-stage codegen apply, which is why this is a view helper and
        not a Python DataSource (batch rows through Python workers would
        forfeit the JVM vectorized reader at 100 TB). ``preds={col: (lo,
        hi)}`` additionally applies manifest-stats FILE pruning before the
        view is built (same contract as ``read_pruned``: residual
        predicates re-applied, results identical to the unpruned read).

        ``tag=`` resolves a tagged version (VERSION AS OF a name);
        ``branch=`` reads the branch head — the SQL spelling of the WAP
        staging read. version/at_ts/tag/branch are mutually exclusive.

        The file list is resolved NOW: the view is a stable snapshot
        (SQL readers get snapshot isolation for free); re-register to see
        later commits. Returns ``name``."""
        pinned = [x for x in (version, at_ts, tag, branch) if x is not None]
        if len(pinned) > 1:
            raise ValueError(
                "sql_view: pass at most ONE of version/at_ts/tag/branch"
            )
        if at_ts is not None:
            version = self.version_at(at_ts)
        if tag is not None:
            tags = self.tags()
            if tag not in tags:
                raise ValueError(f"no such tag {tag!r} in {self.root}")
            version = tags[tag]
        src: "ManifestTable" = self if branch is None else self.branch(branch)
        if preds is not None:
            df = src.read_pruned(spark, version=version, preds=preds)
        else:
            df = src.read(spark, version)
        df.createOrReplaceTempView(name)
        return name

    def register_sql(
        self, spark: SparkSession, name: str, versions: bool = True
    ) -> list[str]:
        """Register the table's whole SQL read surface under ``name``:

        - ``<name>``          — the current snapshot
        - ``<name>_v{N}``     — every surviving version (``versions=True``),
          the VERSION AS OF spelling (Spark temp-view identifiers reject
          Iceberg's ``@``/``$`` characters, hence the underscore convention)
        - ``<name>_history``  — the commit log (DESCRIBE HISTORY)
        - ``<name>_files``    — current snapshot's data files with their
          per-column min/max stats envelope (Iceberg's ``files`` metadata
          table), for SQL-side scan planning / debugging

        Every data view is a lazy native parquet plan over a manifest file
        list — registration reads NO data, costs O(#versions) manifest
        fetches, and later commits never mutate a registered view (snapshot
        isolation; re-register to advance). Returns the registered names."""
        out = [self.sql_view(spark, name)]
        if versions:
            for v in self.versions():
                out.append(self.sql_view(spark, f"{name}_v{v}", version=v))
        # refs: tags pin versions (`<name>_tag_<t>`), branches read their
        # head (`<name>_branch_<b>` — the SQL spelling of the WAP staging
        # read); ref-name chars outside [alnum] map to '_' for view-name
        # validity (ref names are validated to alnum/_-. at creation)
        for tname, tv in self.tags().items():
            safe = "".join(c if c.isalnum() else "_" for c in tname)
            out.append(self.sql_view(spark, f"{name}_tag_{safe}", version=tv))
        for bname in self.branches():
            safe = "".join(c if c.isalnum() else "_" for c in bname)
            out.append(self.sql_view(spark, f"{name}_branch_{safe}", branch=bname))
        self.history(spark).createOrReplaceTempView(f"{name}_history")
        out.append(f"{name}_history")
        stats = self.snapshot_stats()
        files_rows = [(f, json.dumps(st, sort_keys=True)) for f, st in stats.items()]
        local_df(
            spark, files_rows, "file_path string, column_stats string"
        ).createOrReplaceTempView(f"{name}_files")
        out.append(f"{name}_files")
        return out

    def diff(self, spark: SparkSession, v_from: int, v_to: int) -> DataFrame:
        """Rows ADDED strictly after ``v_from`` up to and including
        ``v_to`` — the O(delta) incremental-read input."""
        if not 0 <= v_from < v_to:
            raise ValueError(f"need 0 <= v_from < v_to, got {v_from}..{v_to}")
        added: list[str] = []
        crossed_rewrite = False
        for v in range(v_from + 1, v_to + 1):
            # operation comes from the RAW manifest (O(1), cached) so a
            # metadata-only snapshot is skipped without resolving the
            # table's full file list; appends load only their DELTA groups
            op = self._raw(v).get("operation", "append")
            if op in ("rewrite_manifests", "rename_column", "drop_column"):
                # metadata-only: identical rows, zero new files — a rename
                # or drop is crossable; the delta reads under v_to's shape
                crossed_rewrite = True
                continue
            if op != "append":
                raise ValueError(
                    f"incremental read v{v_from}..v{v_to} crosses a "
                    f"{op!r} snapshot at v{v}: its files are "
                    "rewrites, not new rows — read from the snapshot instead"
                )
            added.extend(self._added_files(v))
        if not added:
            if crossed_rewrite:
                # a range of pure manifest rewrites legitimately adds
                # nothing: the crossability contract means EMPTY, not error
                from pyspark.sql import functions as _F

                return self.read(spark, v_to).where(_F.lit(False))
            raise ValueError(f"no files added in {self.root} v{v_from}..v{v_to}")
        # union schema over the DELTA only: appends straddling an additive
        # (or widening) schema change surface the union shape with
        # typed-null fill / widest-type up-cast
        return self._union_read(spark, added, v_to)

    def changefeed(self, spark: SparkSession, v_from: int, v_to: int) -> DataFrame:
        """ROW-LEVEL change feed between ANY two snapshots — Delta's CDF /
        Iceberg's changelog, for the version ranges ``diff`` refuses:
        rewrites (merge/delete/compact/restore/publish) change the file
        set without the files being pure additions, so the row delta must
        be computed, not listed. Output is the two snapshots' multiset
        difference with an ``_op`` column — ``'I'`` rows appear in v_to
        but not v_from, ``'D'`` the reverse; an update surfaces as its
        retract+insert pair. That is exactly the encoding
        ``operators/incremental.cdc_partial_aggs`` consumes, so a
        downstream aggregate view maintains through arbitrary table
        rewrites by reading the feed (proven hash-exact by the
        ``table_changefeed_agg`` driver oracle).

        Cost — FILE-LEVEL LINEAGE: data files are immutable, so any file
        present in BOTH snapshots contributes identical rows to each side
        and cancels out of the multiset difference exactly
        ((S+A) \\ (S+R) == A \\ R for multisets). The compare therefore
        reads only the range's file-set delta — files added to v_to and
        files removed from v_from — bounding the exceptAll passes by the
        REWRITES' footprint, not the table size: a compaction that
        rewrote 1% of a 100-TB table diffs that 1%. An appends-only range
        degenerates to reading just the delta (``diff``'s fast path, all
        ``_op = 'I'``). Duplicate-row multiplicity is preserved
        (exceptAll, not except), so signed counts stay correct. The
        delta-file reads are pinned to one TARGET schema.

        SCHEMA EVOLUTION (Delta-CDF semantics, round 13): a range that
        crosses an ADDITIVE schema change (add-column) is aligned, not
        refused — the target schema is the footer-union of the files the
        feed actually reads (the file-set delta plus one v_to anchor, so
        the probe cost is bounded by the feed's own footprint, never the
        table), every field forced nullable, and rows from files lacking
        a column surface with typed NULLs. An update that populates a
        new column therefore reads as its exact retract+insert pair
        ``D(k, NULL) / I(k, x)``. A SAFE TYPE WIDENING (int->long,
        float->double, decimal precision increase — Iceberg's promotion
        matrix, round 14) is likewise aligned: the target schema carries
        the widest type and narrower cohorts up-cast at the scan
        (`_widened_struct`). Only genuinely incompatible changes refuse
        (int vs string, decimal scale change, nested shape change)."""
        from pyspark.sql import functions as _F
        from pyspark.sql.types import StructField, StructType

        if not 0 <= v_from < v_to:
            raise ValueError(f"need 0 <= v_from < v_to, got {v_from}..{v_to}")
        # file lists come straight from the manifests (NOT read(): a
        # fully-deleted snapshot is EMPTY but remains a legal feed
        # endpoint — every prior row surfaces as 'D')
        to_files = self._manifest(v_to)["files"]
        from_files = [] if v_from == 0 else self._manifest(v_from)["files"]
        if not (to_files or from_files):
            raise ValueError(
                f"changefeed v{v_from}..v{v_to} of {self.root}: both "
                "snapshots are empty — no schema to derive a feed from"
            )
        fset, tset = set(from_files), set(to_files)
        added = [f for f in to_files if f not in fset]
        removed = [f for f in from_files if f not in tset]
        # target schema: footer-union over the delta set + a v_to anchor
        # (the anchor keeps v_to's column order when the delta is empty
        # or one-sided) + any SHARED files the DV-position deltas name
        # (a DV-only change on a post-evolution file must not be read
        # with a pre-evolution anchor schema); bounded by the feed
        # footprint + 1 footer + the (dv_max_rows-capped) DV file sets
        dv_named: list[str] = []
        dv_from_probe = self._dv(v_from) if v_from > 0 else {"files": []}
        dv_to_probe = self._dv(v_to)
        if dv_from_probe.get("files") or dv_to_probe.get("files"):
            import pyarrow.parquet as _pq

            named_norm: set[str] = set()
            for p_ in dv_from_probe.get("files", []) + dv_to_probe.get("files", []):
                for u in _pq.read_table(p_, columns=["file"]).column("file").to_pylist():
                    named_norm.add(_norm(_uri_to_path(u)))
            shared_set = tset & fset
            dv_named = [f for f in to_files if f in shared_set and _norm(f) in named_norm]
        probe = (
            list(dict.fromkeys(to_files[:1] + added + removed + dv_named))
            or from_files[:1]
        )
        try:
            merged = self._union_read(spark, probe, v_to).schema
        except ValueError as exc:
            raise ValueError(
                f"changefeed v{v_from}..v{v_to} of {self.root} crosses an "
                f"INCOMPATIBLE schema change ({exc}); additive add-column "
                "evolution aligns with typed NULLs and safe type widening "
                "up-casts, but an unsafe type change or rename needs a "
                "snapshot read"
            ) from None
        # nullable throughout: a file missing an added column yields NULLs
        # (field metadata KEPT: parquet.field.id stamps are what resolve a
        # renamed table's old cohorts by id)
        target = StructType(
            [StructField(f.name, f.dataType, True, f.metadata) for f in merged.fields]
        )
        dv_from = self._dv(v_from) if v_from > 0 else {"files": [], "rows": 0}
        dv_to = self._dv(v_to)
        empty = spark.createDataFrame([], target)
        new_part = (
            self._apply_dv(spark, spark.read.schema(target).parquet(*added), dv_to)
            if added
            else empty
        )
        old_part = (
            self._apply_dv(
                spark, spark.read.schema(target).parquet(*removed), dv_from
            )
            if removed
            else empty
        )
        if dv_from["files"] or dv_to["files"]:
            # DV deltas on SHARED files fold into the compare sides:
            # (S - a) \ (S - b) == rows at positions (b \ a) for unique
            # (file, pos), so v_to-only DV positions join the OLD side
            # (they were live at v_from) and v_from-only positions join
            # the NEW side (a restore un-deleted them). Cost is bounded
            # by the DV deltas' file footprint.
            def dv_df(dv):
                if dv["files"]:
                    return spark.read.parquet(*dv["files"]).select("file", "pos")
                return spark.createDataFrame([], "file string, pos long")

            f_df, t_df = dv_df(dv_from), dv_df(dv_to)
            shared = [f for f in to_files if f in fset]
            old_part = old_part.unionByName(
                self._rows_at(spark, target, shared, t_df.exceptAll(f_df))
            )
            new_part = new_part.unionByName(
                self._rows_at(spark, target, shared, f_df.exceptAll(t_df))
            )
        inserts = new_part.exceptAll(old_part).withColumn("_op", _F.lit("I"))
        deletes = old_part.exceptAll(new_part).withColumn("_op", _F.lit("D"))
        return inserts.unionByName(deletes)

    def _rows_at(self, spark: SparkSession, schema, files: list[str], delta) -> DataFrame:
        """The rows of ``files`` sitting at the (file, pos) coordinates in
        ``delta`` — reads only the files the delta actually names."""
        from urllib.parse import unquote, urlparse

        from pyspark.sql import functions as _F

        uris = [r[0] for r in delta.select("file").distinct().collect()]
        wanted = {
            _norm(unquote(urlparse(u).path) if u.startswith("file:") else u)
            for u in uris
        }
        hit = [f for f in files if _norm(f) in wanted]
        base = spark.createDataFrame([], schema) if not hit else None
        if base is not None:
            return base
        tagged = spark.read.schema(schema).parquet(*hit).select(
            "*",
            _F.col("_metadata.file_path").alias("__mt_fp"),
            _F.col("_metadata.row_index").alias("__mt_ri"),
        )
        return (
            tagged.join(
                _F.broadcast(
                    delta.select(
                        _F.col("file").alias("__dv_fp"), _F.col("pos").alias("__dv_ri")
                    )
                ),
                (_F.col("__mt_fp") == _F.col("__dv_fp"))
                & (_F.col("__mt_ri") == _F.col("__dv_ri")),
                "left_semi",
            )
            .drop("__mt_fp", "__mt_ri")
        )


# ---------------------------------------------------------------------------
# Type-widening schema evolution (Iceberg's safe-promotion matrix)
# ---------------------------------------------------------------------------
# A long-lived table's schema changes are not all additive: int columns
# outgrow into long, float into double, decimal precision widens. Iceberg
# and Delta treat these as COMPATIBLE promotions readable without a
# rewrite; Spark 4's parquet readers support exactly that (SPARK-40876:
# an explicit wider read schema up-casts narrower file columns in place),
# but `mergeSchema` still refuses the footer merge. These helpers fold
# per-file schemas under the promotion matrix so every read/rewrite seam
# that used mergeSchema survives a widening commit with ONE scan.

_INT_CHAIN = ("tinyint", "smallint", "int", "bigint")


def _widen_type(a, b):
    """The wider of two Spark DataTypes under the safe-promotion matrix
    (integral chain, float->double, decimal precision increase at equal
    scale); None when the pair is genuinely incompatible. Complex types
    must match exactly (compared shape-wise, ignoring nullability)."""
    from pyspark.sql.types import (
        ByteType, DecimalType, DoubleType, FloatType, IntegerType, LongType,
        ShortType,
    )

    if a.simpleString() == b.simpleString():
        return a
    ints = (ByteType, ShortType, IntegerType, LongType)
    if isinstance(a, ints) and isinstance(b, ints):
        return a if ints.index(type(a)) >= ints.index(type(b)) else b
    floats = (FloatType, DoubleType)
    if isinstance(a, floats) and isinstance(b, floats):
        return DoubleType()
    if (
        isinstance(a, DecimalType)
        and isinstance(b, DecimalType)
        and a.scale == b.scale
    ):
        return a if a.precision >= b.precision else b
    return None


def _widen_ddl(a: str, b: str) -> str | None:
    """`_widen_type` on DDL type strings — the stream-schema variant."""
    if a == b:
        return a
    if a in _INT_CHAIN and b in _INT_CHAIN:
        return a if _INT_CHAIN.index(a) >= _INT_CHAIN.index(b) else b
    if {a, b} <= {"float", "double"}:
        return "double"
    ma = re.fullmatch(r"decimal\((\d+),(\d+)\)", a)
    mb = re.fullmatch(r"decimal\((\d+),(\d+)\)", b)
    if ma and mb and ma.group(2) == mb.group(2):
        return a if int(ma.group(1)) >= int(mb.group(1)) else b
    return None


def _widened_struct(
    spark: SparkSession,
    files: list,
    id_names: dict | None = None,
    dropped_ids: set | None = None,
):
    """Target read schema for a file set that crossed a TYPE-WIDENING
    evolution: per-cohort footer schemas folded under the promotion
    matrix, every field nullable (additive columns null-fill), column
    order first-seen. Cohort discovery is one pyarrow footer sweep —
    driver-side O(#files) METADATA, the same cost class as the
    distributed footer merge that just refused, and only paid on that
    refusal — then ONE Spark footer inference per DISTINCT schema.
    Raises ValueError on a genuinely incompatible conflict (int vs
    string, decimal scale change, nested shape change).

    ``id_names`` ({current name: field id}, insertion-ordered) switches
    to BY-ID resolution — the rename half of schema evolution: columns
    whose footers carry ``PARQUET:field_id`` fold by ID regardless of
    their as-written name, and surface under the CURRENT name (fields
    stamped with the id metadata so Spark's fieldId readers match old
    cohorts by ID). ID-less columns in the same files fold by name as
    usual."""
    import pyarrow.parquet as pq
    from pyspark.sql.types import StructField, StructType

    anchors: dict = {}  # footer-schema fingerprint -> one anchor file
    for f in files:
        anchors.setdefault(str(pq.read_schema(f)), f)
    types: dict = {}   # key -> folded DataType; key = field id | ("n", name)
    order: list = []
    for anchor in anchors.values():
        pa_fields = list(pq.read_schema(anchor))
        sp_fields = spark.read.parquet(anchor).schema.fields
        for pa_f, sp_f in zip(pa_fields, sp_fields):
            key = None
            if id_names is not None:
                fid = (pa_f.metadata or {}).get(b"PARQUET:field_id")
                if fid is not None:
                    key = int(fid)
            if key is None:
                key = ("n", sp_f.name)
            if key not in types:
                types[key] = sp_f.dataType
                order.append(key)
                continue
            w = _widen_type(types[key], sp_f.dataType)
            if w is None:
                raise ValueError(
                    f"column {sp_f.name!r} has incompatible types across "
                    f"files ({types[key].simpleString()} vs "
                    f"{sp_f.dataType.simpleString()}) — safe promotions are "
                    "int-chain widening, float->double, and decimal "
                    "precision increase at equal scale"
                )
            types[key] = w
    if id_names is None:
        return StructType([StructField(k[1], types[k], True) for k in order])
    known = set(id_names.values()) | set(dropped_ids or ())
    stray = [k for k in order if not isinstance(k, tuple) and k not in known]
    if stray:
        raise ValueError(
            f"files carry field id(s) {stray} absent from the table's "
            "column mapping — manifest/file mismatch (corruption?)"
        )
    fields = [
        StructField(n, types[i], True, {"parquet.field.id": i})
        for n, i in id_names.items()
        if i in types
    ]
    fields += [
        StructField(k[1], types[k], True) for k in order if isinstance(k, tuple)
    ]
    return StructType(fields)


def _merged_read(spark: SparkSession, files: list) -> DataFrame:
    """Read ``files`` under their UNION schema across both evolution
    kinds: Spark's distributed `mergeSchema` handles the additive case;
    when it refuses (a widening commit in the set), fall back to an
    explicit `_widened_struct` schema — Spark 4's parquet readers up-cast
    the narrower cohorts in place, so the result is still one scan.
    Every read/rewrite seam that must survive schema evolution goes
    through here."""
    try:
        return spark.read.option("mergeSchema", "true").parquet(*files)
    except Exception:
        return spark.read.schema(_widened_struct(spark, files)).parquet(*files)


# ---------------------------------------------------------------------------
# Changelog streaming SOURCE: the version log as a micro-batch stream
# ---------------------------------------------------------------------------

# Arrow physical type -> Spark DDL, for the subset the manifest tables in
# this repo produce. Extend as needed; unknown types raise loudly rather
# than guessing.
_ARROW_TO_DDL = {
    "int8": "tinyint", "int16": "smallint", "int32": "int", "int64": "bigint",
    "float": "float", "double": "double", "bool": "boolean",
    "string": "string", "large_string": "string", "binary": "binary",
    "timestamp[us]": "timestamp", "timestamp[ns]": "timestamp",
    "date32[day]": "date",
}


def _stream_dv_map(t: "ManifestTable", version: int) -> dict:
    """version's DV set as {normalized file path: set(pos)}, loaded
    driver-side — a DV set is O(rows deleted since the last materialize)
    by contract (enforced by ``dv_max_rows``)."""
    from urllib.parse import unquote, urlparse

    dv = t._dv(version) if version > 0 else {"files": [], "rows": 0}
    if not dv["files"]:
        return {}
    import pyarrow.parquet as pq

    out: dict = {}
    for p in dv["files"]:
        tb = pq.read_table(p)
        for f, pos in zip(
            tb.column("file").to_pylist(), tb.column("pos").to_pylist()
        ):
            fp = unquote(urlparse(f).path) if f.startswith("file:") else f
            out.setdefault(_norm(fp), set()).add(pos)
    return out


def _changelog_classes():
    """The DataSource API classes, imported lazily so this module stays
    importable without pyspark.sql.datasource (e.g. doc tooling)."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceStreamReader,
        InputPartition,
    )

    class _FileSplit(InputPartition):
        """One changelog partition: a data file, the sign its rows carry,
        and optional POSITION sets — ``skip`` (deletion-vector positions
        to omit from a whole-file emission) or ``take`` (emit ONLY these
        positions: the DV-delta rows of a delete_dv/restore version)."""

        def __init__(
            self,
            path: str,
            op: str = "I",
            skip: tuple = (),
            take: tuple | None = None,
        ):
            self.path = path
            self.op = op
            self.skip = skip
            self.take = take

    class MTableStreamReader(DataSourceStreamReader):
        """Micro-batch stream over a ManifestTable's APPEND log: the offset
        is the table VERSION (checkpointed by the engine), each batch is
        the files added by versions (start, end], each file is one input
        partition. Exactly the contract Delta's table-as-a-stream exposes,
        reduced to this format: appends stream; a 'compact'/'overwrite'
        snapshot either fails the stream (default: its files are
        rewrites, not new rows), is skipped wholesale (on_rewrite=skip,
        for consumers that only want net-new appends and accept missing
        rows deleted later), or streams as SIGNED CHANGE ROWS
        (on_rewrite=cdc: the declared schema must end with an
        ``_op string`` column; each version emits its FILE-SET delta vs
        the previous version — added files as 'I' rows, removed files as
        'D' — which with partial-COW verbs is bounded by the rewrite's
        true footprint). The cdc feed is net-exact, not minimal: a row
        rewritten unchanged surfaces as a D+I pair that cancels under the
        Z-set signed algebra (`cdc_partial_aggs`), so downstream
        incremental views maintain exactly through arbitrary rewrites;
        use batch ``changefeed()`` where a minimal feed matters."""

        def __init__(self, options, field_names):
            self.root = options.get("path")
            if not self.root:
                raise ValueError("mtable_changelog: option 'path' is required")
            self.on_rewrite = options.get("on_rewrite", "error")
            if self.on_rewrite not in ("error", "skip", "cdc"):
                raise ValueError(
                    f"mtable_changelog: on_rewrite must be error|skip|cdc, got {self.on_rewrite!r}"
                )
            if self.on_rewrite == "cdc" and field_names[-1:] != ["_op"]:
                raise ValueError(
                    "mtable_changelog: on_rewrite=cdc requires the declared "
                    "schema to END with an `_op string` column (got "
                    f"{list(field_names)})"
                )
            # The declared stream schema's column ORDER, so read() can
            # select by NAME: on a schema-evolved table older files may
            # store the same columns in a different physical order, and a
            # positional zip would silently misassign same-typed columns.
            self._names = list(field_names)
            # RENAMED tables: pre-rename files store columns under their
            # as-written names; read() resolves each declared name to the
            # file's column by FIELD ID through this mapping.
            t = ManifestTable(self.root)
            cur = t.current_version()
            self._ids = (
                t.column_ids(cur)
                if cur and t._raw(cur).get("renamed_ever")
                else None
            )

        def initialOffset(self):
            return {"version": 0}

        def latestOffset(self):
            return {"version": ManifestTable(self.root).current_version() or 0}

        def partitions(self, start, end):
            lo, hi = int(start["version"]), int(end["version"])
            t = ManifestTable(self.root)
            splits: list[_FileSplit] = []
            for v in range(lo + 1, hi + 1):
                # raw operation first (O(1)): a metadata-only snapshot
                # must not cost a full file-list resolve to skip
                op = t._raw(v).get("operation", "append")
                if op in ("rewrite_manifests", "rename_column", "drop_column"):
                    continue  # metadata-only: identical rows at any setting
                if op == "append":
                    # appends carry the prior DV set unchanged and new
                    # files can hold no DV entries — whole-file 'I' rows
                    splits.extend(_FileSplit(f, "I") for f in t._added_files(v))
                    continue
                if self.on_rewrite == "skip":
                    continue
                if self.on_rewrite != "cdc":
                    raise ValueError(
                        f"mtable_changelog: v{v} is a {op!r} snapshot — its files "
                        "are rewrites, not appends; read a snapshot instead, or "
                        "set on_rewrite=skip / on_rewrite=cdc"
                    )
                # cdc: the version's row delta = its FILE-SET delta (with
                # each side's DV positions excluded) plus its DV-POSITION
                # delta on shared files — exact for partial-COW rewrites,
                # delete_dv, and restore alike.
                splits.extend(_cdc_leg_splits(t, v - 1, t, v))
            return splits or [_FileSplit("")]

        def read(self, partition):
            if not partition.path:
                return iter(())
            import pyarrow.parquet as pq

            # project at the reader (only the declared columns are ever
            # decoded — a wide table's extra columns cost zero I/O), with
            # the schema check done on the FOOTER, not the data. In cdc
            # mode the trailing _op column is the split's own sign, not a
            # stored column.
            want = [n for n in self._names if n != "_op"]
            sch = pq.read_schema(partition.path)
            # declared name -> the FILE's column name: identity for
            # name-stable tables; by FIELD ID on a renamed table, so a
            # pre-rename file's old-named column feeds the new-named
            # declared field (additive null-fill unchanged: a file
            # lacking the column/id reads as typed NULLs at zero I/O)
            colmap = {n: n for n in want if n in set(sch.names)}
            if self._ids:
                id_to_file = {}
                for fl in sch:
                    fid = (fl.metadata or {}).get(b"PARQUET:field_id")
                    if fid is not None:
                        id_to_file[int(fid)] = fl.name
                colmap = {
                    n: id_to_file[self._ids[n]]
                    for n in want
                    if n in self._ids and self._ids[n] in id_to_file
                }
            present = [n for n in want if n in colmap]
            if want and not present:
                raise ValueError(
                    f"mtable_changelog: file {partition.path} shares NO "
                    f"column with the declared stream schema {want} — a "
                    "misdeclared schema, not additive evolution"
                )
            tbl = pq.read_table(
                partition.path, columns=[colmap[n] for n in present]
            )
            if partition.take is not None:
                tbl = tbl.take(list(partition.take))
            elif partition.skip:
                skip = set(partition.skip)
                tbl = tbl.take([i for i in range(tbl.num_rows) if i not in skip])
            nulls = [None] * tbl.num_rows
            cols = [
                tbl.column(colmap[n]).to_pylist() if n in colmap else list(nulls)
                for n in want
            ]
            if "_op" in self._names:
                cols.append([partition.op] * tbl.num_rows)
            return iter(zip(*cols)) if cols else iter(())

        def commit(self, end):
            pass  # manifests are immutable; nothing to clean up

    def _footer_union_ddl(
        files: list, label: str, id_names: dict | None = None
    ) -> list:
        """Footer-UNION stream schema columns (first-seen order) for a
        snapshot's files: additive evolution surfaces every column, safe
        type conflicts resolve to the WIDER type (the `_widen_ddl`
        promotion matrix — pre-widening files' values up-convert
        losslessly at the reader), genuinely incompatible conflicts
        refuse loudly. ``id_names`` ({current name: field id}) switches
        to BY-ID folding with CURRENT names declared, for renamed tables.
        Shared by the table and catalog changelog sources."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        seen: dict = {}   # key -> ddl; key = field id | name
        order: list = []
        by_id = {i: n for n, i in (id_names or {}).items()}
        for path in files:
            for f in pq.read_schema(path):
                ddl = _ARROW_TO_DDL.get(str(f.type))
                if ddl is None and pa.types.is_decimal(f.type):
                    ddl = f"decimal({f.type.precision},{f.type.scale})"
                if ddl is None:
                    raise ValueError(
                        f"{label}: unmapped arrow type {f.type} for column {f.name!r}"
                    )
                key = f.name
                if id_names is not None:
                    fid = (f.metadata or {}).get(b"PARQUET:field_id")
                    if fid is not None:
                        if int(fid) not in by_id:
                            continue  # dropped column: not in the stream shape
                        key = int(fid)
                if key not in seen:
                    seen[key] = ddl
                    order.append(key)
                    continue
                if seen[key] != ddl:
                    wide = _widen_ddl(seen[key], ddl)
                    if wide is None:
                        raise ValueError(
                            f"{label}: column {f.name!r} has incompatible "
                            f"types across files ({seen[key]} vs {ddl}) "
                            "— additive evolution and safe widening only"
                        )
                    seen[key] = wide
        return [f"{by_id.get(k, k)} {seen[k]}" for k in order]

    class MTableChangelogSource(DataSource):
        """format('mtable_changelog').option('path', <table root>)"""

        @classmethod
        def name(cls):
            return "mtable_changelog"

        def schema(self):
            """Stream schema = the footer-UNION of the current snapshot's
            files (first-seen column order), so a table that crossed an
            additive add-column evolution streams its full current shape
            and pre-evolution files null-fill at read time; on a RENAMED
            table the union folds by FIELD ID and declares the CURRENT
            names (pre-rename files' old-named columns feed the new names
            at the reader). One footer sweep at stream DEFINITION only
            (never per batch); a table whose file count makes even that
            sweep expensive should pin the shape explicitly via
            .schema(...) on the readStream."""
            t = ManifestTable(self.options["path"])
            cur = t.current_version()
            if cur is None:
                raise ValueError(f"mtable_changelog: {t.root} has no snapshot yet")
            # a fully-deleted CURRENT snapshot has no files to derive a
            # shape from, but the feed is still meaningful (its history
            # emitted rows) — walk back to the latest files-bearing
            # snapshot
            files: list = []
            for v in range(cur, 0, -1):
                files = t._manifest(v)["files"]
                if files:
                    break
            if not files:
                raise ValueError(
                    f"mtable_changelog: no snapshot of {t.root} has data "
                    "files — no schema to derive a stream from"
                )
            ids = (
                t.column_ids(cur)
                if t._raw(cur).get("renamed_ever")
                else None
            )
            cols = _footer_union_ddl(files, "mtable_changelog", id_names=ids)
            if self.options.get("on_rewrite") == "cdc":
                cols.append("_op string")
            return ", ".join(cols)

        def streamReader(self, schema):
            return MTableStreamReader(self.options, schema.fieldNames())

    def _cdc_leg_splits(t_prev, v_prev: int, t_now, v_now: int) -> list:
        """Signed file splits for the row delta between two snapshots of
        a table (v 0 = empty): the FILE-SET delta with each side's DV
        positions excluded, plus DV-POSITION deltas on shared files —
        exact for appends, partial-COW rewrites, delete_dv, and restore,
        bounded by the delta's footprint. Shared by the per-version
        table stream and the pin-to-pin catalog stream (where one leg
        may span several table versions)."""
        prev = set(t_prev._manifest(v_prev)["files"]) if v_prev else set()
        now = set(t_now._manifest(v_now)["files"]) if v_now else set()
        dv_prev = _stream_dv_map(t_prev, v_prev)
        dv_now = _stream_dv_map(t_now, v_now)
        splits: list = []
        for f in sorted(now - prev):
            splits.append(_FileSplit(f, "I", skip=tuple(dv_now.get(_norm(f), ()))))
        for f in sorted(prev - now):
            splits.append(_FileSplit(f, "D", skip=tuple(dv_prev.get(_norm(f), ()))))
        if dv_prev or dv_now:
            for f in sorted(now & prev):
                nf = _norm(f)
                was, is_ = dv_prev.get(nf, set()), dv_now.get(nf, set())
                newly_deleted = is_ - was
                undeleted = was - is_
                if newly_deleted:
                    splits.append(
                        _FileSplit(f, "D", take=tuple(sorted(newly_deleted)))
                    )
                if undeleted:
                    splits.append(
                        _FileSplit(f, "I", take=tuple(sorted(undeleted)))
                    )
        return splits

    class MCatalogStreamReader(MTableStreamReader):
        """CATALOG-LEVEL CDC: stream ONE table's signed row deltas with
        offsets on the CATALOG version log — the multi-table savepoint
        as a stream. Each catalog version's leg for the table is the
        delta between its two PINNED table versions (possibly spanning
        several table commits, or none), so a consumer maintaining
        cross-table state subscribes to one stream per table and the
        legs ALIGN: batch N of every stream is the same catalog version,
        and the engine's offset checkpoint (catalog versions) makes the
        whole savepoint exactly-once. Cost per leg is the pin-to-pin
        file delta — a catalog flip that didn't move this table's pin
        contributes zero splits."""

        def __init__(self, options, field_names):
            root = options.get("path")
            if not root:
                raise ValueError("mcatalog_changelog: option 'path' is required")
            self.cat_root = root
            self.table_name = options.get("table")
            if not self.table_name:
                raise ValueError("mcatalog_changelog: option 'table' is required")
            if field_names[-1:] != ["_op"]:
                raise ValueError(
                    "mcatalog_changelog: schema must END with `_op string`"
                )
            self._names = list(field_names)
            self._ids = None  # renamed tables: unsupported at catalog level
            self._starting = options.get("startingversion") or options.get(
                "startingVersion"
            )

        def initialOffset(self):
            """A FRESH stream starts at the oldest RETAINED catalog
            version minus one — not the hardcoded v0, which after
            ``expire()`` dropped v1..vK no longer exists and would brick
            every new stream. The first batch is then the oldest retained
            savepoint's FULL pinned state as 'I' rows (the retained-range
            snapshot), after which legs are ordinary pin-to-pin deltas.
            ``option('startingVersion', N)`` overrides — e.g. the current
            catalog version to stream only FUTURE flips."""
            if self._starting is not None:
                return {"version": int(self._starting)}
            from gridmr_spark.sources.catalog_txn import TableCatalog

            vs = TableCatalog(self.cat_root).versions()
            return {"version": vs[0] - 1 if vs else 0}

        def latestOffset(self):
            from gridmr_spark.sources.catalog_txn import TableCatalog

            return {"version": TableCatalog(self.cat_root).current_version() or 0}

        def _pin(self, cat, cv: int) -> tuple:
            """(ManifestTable, pinned version) at catalog version cv; a
            version where the table is absent reads as (None, 0). The
            fresh-stream SEED boundary (oldest retained version - 1,
            expired or v0) also reads as (None, 0) — its leg is the
            retained snapshot's full 'I' emission; any OTHER expired
            version means the checkpoint predates retention and fails
            loudly (re-emitting a snapshot mid-stream would duplicate
            rows a signed consumer already folded)."""
            if cv < 1:
                return None, 0
            try:
                pins = cat.pins(cv)
            except ValueError:
                vs = cat.versions()
                if vs and cv == vs[0] - 1:
                    return None, 0  # seed boundary: full-snapshot 'I' leg
                raise ValueError(
                    f"mcatalog_changelog: catalog version {cv} of "
                    f"{self.cat_root} was expired — this checkpoint "
                    "predates the retained range; re-seed the stream (a "
                    "fresh stream starts at the oldest retained version)"
                ) from None
            p = pins.get(self.table_name)
            if p is None:
                return None, 0
            return ManifestTable(p["root"]), p["version"]

        def partitions(self, start, end):
            from gridmr_spark.sources.catalog_txn import TableCatalog

            lo, hi = int(start["version"]), int(end["version"])
            cat = TableCatalog(self.cat_root)
            splits: list = []
            for cv in range(lo + 1, hi + 1):
                t_prev, v_prev = self._pin(cat, cv - 1)
                t_now, v_now = self._pin(cat, cv)
                if (t_prev and t_prev.root, v_prev) == (t_now and t_now.root, v_now):
                    continue  # pin unchanged: zero splits for this table
                splits.extend(
                    _cdc_leg_splits(t_prev or t_now, v_prev, t_now or t_prev, v_now)
                )
            return splits or [_FileSplit("")]

    class MCatalogChangelogSource(DataSource):
        """format('mcatalog_changelog').option('path', <catalog root>)
        .option('table', <name>) — always a signed cdc feed."""

        @classmethod
        def name(cls):
            return "mcatalog_changelog"

        def schema(self):
            from gridmr_spark.sources.catalog_txn import TableCatalog

            cat = TableCatalog(self.options["path"])
            name = self.options.get("table")
            if not name:
                raise ValueError("mcatalog_changelog: option 'table' is required")
            # resolve at the LATEST catalog version whose pin of the
            # table has data files: a dropped table still has a valid
            # feed (its final leg is the drop's 'D' rows), and a pin
            # whose snapshot is fully-deleted carries no shape — the feed
            # history before it does
            files: list = []
            seen_pin = False
            for cv in reversed(cat.versions()):
                p = cat.pins(cv).get(name)
                if p is None:
                    continue
                seen_pin = True
                mt = ManifestTable(p["root"])
                if mt._raw(p["version"]).get("renamed_ever"):
                    raise ValueError(
                        f"mcatalog_changelog: table {name!r} has RENAMED "
                        "columns — catalog-level CDC over renamed tables is "
                        "not supported (pre-rename files would misalign); "
                        "use the table-level mtable_changelog stream"
                    )
                files = mt._manifest(p["version"])["files"]
                if files:
                    break
            if not seen_pin:
                raise ValueError(
                    f"mcatalog_changelog: no catalog version of "
                    f"{cat.root} ever pinned table {name!r}"
                )
            if not files:
                raise ValueError(
                    f"mcatalog_changelog: no pinned snapshot of {name!r} "
                    "has data files — no schema to derive a stream from"
                )
            cols = _footer_union_ddl(files, "mcatalog_changelog")
            return ", ".join(cols + ["_op string"])

        def streamReader(self, schema):
            return MCatalogStreamReader(self.options, schema.fieldNames())

    return MTableChangelogSource, MCatalogChangelogSource


def register_changelog_source(spark: SparkSession) -> None:
    """Idempotently register format('mtable_changelog') and the
    catalog-level format('mcatalog_changelog') on this session."""
    for cls in _changelog_classes():
        spark.dataSource.register(cls)
