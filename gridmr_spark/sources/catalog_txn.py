"""Multi-table transactional catalog: cross-table snapshot isolation.

A single ManifestTable gives per-table atomicity; a warehouse needs more —
a fact table and its dimension evolve TOGETHER, and a reader that joins
fact vN+1 against dim vN sees a state that never logically existed (new
orders referencing customers whose rows haven't landed). The standard fix
(Delta: one transaction log per catalog; Iceberg: catalog-level atomic
swap) is a second indirection: per-table manifests define table CONTENT,
and one catalog manifest defines which table VERSIONS are visible
together.

This module is that indirection, reusing the table format's publish
discipline end to end:

- The catalog is a directory of immutable JSON versions
  (``_catalog/v%05d.json``), each pinning ``{table: {root, version}}``.
  Publish is exclusive-create (``os.link``) — two racing transactions get
  exactly one winner, the loser raises :class:`ConcurrentCommitError`.
- A transaction stages ordinary per-table commits (data first, table
  manifests next — visible to direct table readers, but a CATALOG reader
  still resolves the pinned older versions), then publishes ONE catalog
  version flipping every pinned table at once. A crash between table
  commits and the catalog publish leaves the catalog consistent at the
  old state; the staged table versions are harmless history (same
  orphan-until-referenced posture as the table format's data files).
- Catalog versions are themselves time travel: ``read(..., at=K)`` gives
  the cross-table state as of catalog version K — a consistent
  multi-table savepoint, which single-table time travel cannot express.

Reference parity: none — GridMR's data plane is bare files (SURVEY §1.4);
this extends the §2.D storage surface the same way ManifestTable does.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

from gridmr_spark.sources.table_format import (
    ConcurrentCommitError,
    ManifestTable,
    _exclusive_publish_json,
)


class TableCatalog:
    """A versioned mapping name -> (table root, pinned version)."""

    def __init__(self, root: str) -> None:
        self.root = root
        self._cdir = os.path.join(root, "_catalog")

    # -- version log ---------------------------------------------------------

    def versions(self) -> list[int]:
        if not os.path.isdir(self._cdir):
            return []
        return sorted(
            int(n[1:-5])
            for n in os.listdir(self._cdir)
            if n.startswith("v") and n.endswith(".json")
        )

    def current_version(self) -> int | None:
        vs = self.versions()
        return vs[-1] if vs else None

    def _raw(self, version: int) -> dict:
        path = os.path.join(self._cdir, f"v{version:05d}.json")
        if not os.path.exists(path):
            raise ValueError(f"no such catalog version {version} in {self.root}")
        with open(path, encoding="utf-8") as f:
            return json.load(f)

    def _publish(self, version: int, tables: dict) -> None:
        """Exclusive-create publish — the table format's shared
        ``_exclusive_publish_json`` discipline, applied to the
        cross-table pin set."""
        import time as _time

        def on_exists():
            raise ConcurrentCommitError(
                f"catalog version {version} of {self.root} was committed by "
                "another transaction; re-read and retry (staged table "
                "versions are harmless history)"
            ) from None

        _exclusive_publish_json(
            self._cdir,
            f"v{version:05d}.json",
            {"version": version, "ts": _time.time(), "tables": tables},
            on_exists,
        )

    # -- reads ----------------------------------------------------------------

    def pins(self, at: int | None = None) -> dict:
        """name -> {"root": str, "version": int} at a catalog version."""
        if at is None:
            at = self.current_version()
            if at is None:
                raise ValueError(f"catalog {self.root} has no committed version")
        return dict(self._raw(at)["tables"])

    def version_at(self, ts: float) -> int:
        """The catalog version current at wall-clock ``ts`` — TIMESTAMP AS
        OF for the WHOLE savepoint: every table then resolves to the pins
        that were visible TOGETHER at that instant (the cross-table
        analogue of ``ManifestTable.version_at``). Version order is
        authoritative under clock skew, same as the table rule."""
        best = None
        for v in self.versions():
            t = self._raw(v).get("ts")
            if t is not None and t <= ts:
                best = v
        if best is None:
            raise ValueError(
                f"catalog {self.root} has no version at or before ts={ts}"
            )
        return best

    def table(self, name: str, at: int | None = None) -> tuple[ManifestTable, int]:
        pins = self.pins(at)
        if name not in pins:
            raise ValueError(f"no table {name!r} in catalog {self.root}")
        p = pins[name]
        return ManifestTable(p["root"]), p["version"]

    def read(self, spark: SparkSession, name: str, at: int | None = None) -> DataFrame:
        """The table's content at the CATALOG-pinned version — reads through
        the catalog never see a table version another transaction staged
        but did not publish. ``at=`` travels the whole catalog: every
        table resolves to the versions that were visible TOGETHER."""
        t, v = self.table(name, at)
        return t.read(spark, v)

    def register_sql(
        self, spark: SparkSession, at: int | None = None, prefix: str = ""
    ) -> list[str]:
        """Register the WHOLE pinned table set of catalog version ``at``
        (default: current) as SQL temp views — one view per table, each
        resolved to the version pinned by that catalog snapshot, so a SQL
        user joins a CONSISTENT multi-table savepoint (the thing
        single-table ``ManifestTable.register_sql`` cannot give: its
        views advance per table). Reuses the table format's
        ``sql_view`` — every view is a lazy parquet plan over a pinned
        manifest file list; registration reads no data and later
        commits/transactions never mutate a registered view (re-register
        to advance). ``prefix`` namespaces the views (e.g.
        ``prefix='wh_'`` -> ``wh_orders``). Returns the view names."""
        if at is None:
            at = self.current_version()
            if at is None:
                raise ValueError(f"catalog {self.root} has no committed version")
        out: list[str] = []
        for name, p in sorted(self.pins(at).items()):
            t = ManifestTable(p["root"])
            out.append(t.sql_view(spark, f"{prefix}{name}", version=p["version"]))
        return out

    # -- writes ----------------------------------------------------------------

    def expire(self, keep_last: int = 1) -> list[int]:
        """Drop all but the last ``keep_last`` CATALOG versions — the
        maintenance verb that keeps the version log O(recent) on a
        long-lived catalog (one transaction a minute is half a million
        version files a year; every ``versions()`` listing pays for
        them). Returns the dropped version numbers.

        Contract mirrors the table's ``expire``: time travel (and
        ``version_at``) to dropped versions stops working by design; a
        catalog-offset CDC stream whose checkpoint predates the retained
        range fails on restart with a re-seed error, while a FRESH stream
        auto-seeds at the oldest retained version (its first batch is the
        retained savepoint's full state as 'I' rows — see
        ``MCatalogStreamReader.initialOffset``). PIN-ONLY: this deletes
        catalog JSON —
        never a table, never a manifest, never data; per-table retention
        stays each table's own ``expire``/``vacuum_orphans`` story."""
        vs = self.versions()
        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        drop = vs[:-keep_last]
        for v in drop:
            os.remove(os.path.join(self._cdir, f"v{v:05d}.json"))
        return drop

    def vacuum_dropped(self, min_age_seconds: float = 3600.0) -> list[str]:
        """Reclaim the storage of DROPPED tables — the missing second half
        of ``drop_table`` + ``expire``: once the last catalog version
        pinning a table is expired, its data/manifest tree is unreachable
        through the catalog AND invisible to every per-table vacuum
        (nothing lists it). This verb closes the loop: any table directory
        under the CATALOG ROOT that no RETAINED catalog version pins is
        deleted wholesale. Returns the removed roots.

        Safety contract mirrors ``ManifestTable.vacuum_orphans``:

        - scope — only immediate children of the catalog root that LOOK
          like table roots (carry a ``_manifests`` dir); anything else
          (including table roots living elsewhere, which this catalog may
          not own) is never touched;
        - liveness — a root pinned by ANY retained catalog version (any
          table name, any version) is live: time travel to it must keep
          working until ``expire`` says otherwise;
        - age guard — a root with write activity newer than
          ``min_age_seconds`` survives even when unpinned: an in-flight
          ``create_table`` transaction has committed the table but not yet
          published the pin. Pass 0 only when no writer can be active."""
        import shutil
        import time as _time

        now = _time.time()
        live: set[str] = set()
        for v in self.versions():
            for p in self._raw(v)["tables"].values():
                live.add(os.path.realpath(p["root"]))
        removed: list[str] = []
        for name in sorted(os.listdir(self.root)):
            d = os.path.join(self.root, name)
            if name == "_catalog" or not os.path.isdir(d):
                continue
            if not os.path.isdir(os.path.join(d, "_manifests")):
                continue  # not a table root this catalog could own
            if os.path.realpath(d) in live:
                continue
            # newest shallow mtime: the root itself, its top-level entries,
            # and the manifest files (every commit touches _manifests, so
            # any in-flight writer shows up here)
            newest = os.path.getmtime(d)
            for sub in os.listdir(d):
                newest = max(newest, os.path.getmtime(os.path.join(d, sub)))
            mdir = os.path.join(d, "_manifests")
            for sub in os.listdir(mdir):
                newest = max(newest, os.path.getmtime(os.path.join(mdir, sub)))
            if now - newest < min_age_seconds:
                continue
            shutil.rmtree(d)
            removed.append(d)
        return removed

    def begin(self) -> "CatalogTransaction":
        return CatalogTransaction(self)

    def begin_wap(self, name: str = "wap") -> "CatalogWap":
        """Start a cross-table WRITE-AUDIT-PUBLISH flow: stage each
        table's writes on a branch forked at its catalog pin, audit the
        branch reads, then :meth:`CatalogWap.publish` flips EVERY table's
        audited state into one new catalog version. See
        :class:`CatalogWap`."""
        return CatalogWap(self, name)

    def create(self, tables: dict[str, ManifestTable]) -> int:
        """Catalog v1 pinning each table's CURRENT version."""
        if self.current_version() is not None:
            raise ValueError(f"catalog {self.root} already exists")
        pins = {}
        for name, t in tables.items():
            cur = t.current_version()
            if cur is None:
                raise ValueError(f"table {name!r} has no committed snapshot")
            pins[name] = {"root": t.root, "version": cur}
        self._publish(1, pins)
        return 1


class CatalogTransaction:
    """Stage per-table writes, publish them as ONE catalog version.

    The staged table versions are real table commits (atomic per table,
    durable, time-travelable) — what the transaction adds is the
    visibility gate: no CATALOG reader sees any of them until
    :meth:`commit` publishes the new pin set, and a crash or a lost race
    leaves the catalog exactly at its prior consistent state."""

    def __init__(self, cat: TableCatalog) -> None:
        self.cat = cat
        self.base = cat.current_version()
        if self.base is None:
            raise ValueError(f"catalog {cat.root} has no committed version")
        self._pins = cat.pins(self.base)
        self._staged: dict[str, int] = {}

    def _table(self, name: str) -> tuple[ManifestTable, int]:
        """The table handle plus this transaction's CONTENT base for it:
        the version the txn itself last staged, else the catalog pin.
        Every staging verb builds on that base — never on the table HEAD,
        which may carry versions other (possibly abandoned) transactions
        staged but never published."""
        if name not in self._pins:
            raise ValueError(f"no table {name!r} in catalog {self.cat.root}")
        base = self._staged.get(name, self._pins[name]["version"])
        return ManifestTable(self._pins[name]["root"]), base

    def commit_table(self, name: str, df: DataFrame, **kwargs) -> int:
        """Stage an append to one table (ordinary ManifestTable.commit —
        CHECK constraints, bloom_cols etc. all apply)."""
        t, base = self._table(name)
        v = t.commit(df, parent_version=base, **kwargs)
        self._staged[name] = v
        return v

    def merge_table(
        self, name: str, spark: SparkSession, updates: DataFrame, key: str
    ) -> int:
        t, base = self._table(name)
        v = t.merge_by_key(spark, updates, key, base_version=base)
        self._staged[name] = v
        return v

    def delete_where(self, name: str, spark: SparkSession, condition) -> int:
        t, base = self._table(name)
        v = t.delete_where(spark, condition, base_version=base)
        self._staged[name] = v
        return v

    def create_table(self, name: str, table: ManifestTable) -> int:
        """ADD a table to the catalog in this transaction (CREATE TABLE's
        catalog half): the pin lands atomically WITH every other staged
        write at commit(), so readers either see the whole new state —
        new table included — or none of it. The table needs a committed
        snapshot (its v-current is what gets pinned). The catalog CDC
        stream emits the new table's pinned files as the 'I' leg of the
        publishing catalog version."""
        if name in self._pins:
            raise ValueError(
                f"table {name!r} already exists in catalog {self.cat.root}"
            )
        cur = table.current_version()
        if cur is None:
            raise ValueError(f"table {name!r} has no committed snapshot")
        self._pins[name] = {"root": table.root, "version": cur}
        self._staged[name] = cur
        return cur

    def drop_table(self, name: str) -> None:
        """DROP a table from the catalog in this transaction — METADATA
        ONLY: the pin disappears from the published pin set (readers of
        older catalog versions still time-travel to it), while the
        table's own directory, manifests, and data are untouched (its
        maintenance verbs keep working; physical deletion stays the
        table's own expire/vacuum story). The catalog CDC stream emits
        the dropped pin's files as the 'D' leg of the publishing catalog
        version."""
        if name not in self._pins:
            raise ValueError(f"no table {name!r} in catalog {self.cat.root}")
        del self._pins[name]
        self._staged.pop(name, None)
        # a pure drop is a legal transaction: mark the txn dirty
        self._dropped = getattr(self, "_dropped", set())
        self._dropped.add(name)

    def commit(self) -> int:
        """Publish every staged table version in ONE catalog snapshot.

        Conflict rule: the catalog must still be at the transaction's base
        version — if another transaction published first, raises
        :class:`ConcurrentCommitError` even when the table sets are
        disjoint (serialized catalog history keeps ``at=`` time travel
        meaningful; retry is cheap — re-begin and re-stage)."""
        if not self._staged and not getattr(self, "_dropped", None):
            raise ValueError("transaction staged no table writes")
        cur = self.cat.current_version()
        if cur != self.base:
            raise ConcurrentCommitError(
                f"catalog {self.cat.root} advanced v{self.base} -> v{cur} "
                "since this transaction began; re-begin and replay"
            )
        pins = dict(self._pins)
        for name, v in self._staged.items():
            pins[name] = {"root": pins[name]["root"], "version": v}
        self.cat._publish((cur or 0) + 1, pins)
        return (cur or 0) + 1


class CatalogWap:
    """Cross-table WRITE-AUDIT-PUBLISH: the composition of the table
    format's branch refs (`ManifestTable.create_branch`,
    table_format.py) with the catalog's one-publish visibility gate.

    - **Write**: :meth:`stage` commits onto a per-table branch forked at
      the table's CATALOG PIN (unique branch name per WAP attempt, so
      abandoned attempts never collide). Branch commits carry the full
      table-commit surface (CHECK constraints, bloom_cols, ...).
    - **Audit**: :meth:`read` serves the staged state (branch head for
      staged tables, the pin for the rest) — auditors run arbitrary
      cross-table queries against the EXACT rows a publish would make
      visible, while every catalog reader still resolves the old pins.
    - **Publish**: :meth:`publish` fast-forwards each staged table's
      main to its branch head (`publish_branch` — refuses non-fast-
      forward, preserving the audit), then publishes ONE catalog version
      pinning every new table version. Readers flip atomically from the
      old cross-table state to the new one; a failed audit simply calls
      :meth:`abort` (or nothing at all) and no catalog reader ever saw a
      staged row. A crash mid-publish leaves some tables' MAIN advanced
      but the catalog unpublished — catalog readers still see the old
      pins (main advances are invisible until pinned), and the stranded
      versions are harmless history, the same orphan-until-referenced
      posture as everywhere else in the format.
    """

    def __init__(self, cat: TableCatalog, name: str = "wap") -> None:
        import uuid as _uuid

        self.cat = cat
        self.base = cat.current_version()
        if self.base is None:
            raise ValueError(f"catalog {cat.root} has no committed version")
        self._pins = cat.pins(self.base)
        self.branch_name = f"{name}-{_uuid.uuid4().hex[:8]}"
        self._branches: dict[str, ManifestTable] = {}

    def _pin(self, name: str) -> dict:
        if name not in self._pins:
            raise ValueError(f"no table {name!r} in catalog {self.cat.root}")
        return self._pins[name]

    def stage(self, name: str, df: DataFrame, **kwargs) -> int:
        """Append ``df`` to table ``name``'s WAP branch (forked lazily at
        the catalog pin); returns the branch version."""
        b = self._branches.get(name)
        if b is None:
            p = self._pin(name)
            b = ManifestTable(p["root"]).create_branch(
                self.branch_name, version=p["version"]
            )
            self._branches[name] = b
        return b.commit(df, **kwargs)

    def read(self, spark: SparkSession, name: str) -> DataFrame:
        """The AUDIT view of one table: branch head if staged, else the
        catalog pin — together, the exact cross-table state a publish
        would make visible."""
        b = self._branches.get(name)
        if b is not None:
            return b.read(spark)
        p = self._pin(name)
        return ManifestTable(p["root"]).read(spark, p["version"])

    def publish(self) -> int:
        """Fast-forward every staged table's main to its audited branch
        head, then publish ONE catalog version pinning all of them.
        Raises :class:`ConcurrentCommitError` (before any table publish)
        if the catalog advanced past this WAP's base, or (per table) if a
        table's main advanced past its fork point."""
        if not self._branches:
            raise ValueError("WAP staged no table writes")
        cur = self.cat.current_version()
        if cur != self.base:
            raise ConcurrentCommitError(
                f"catalog {self.cat.root} advanced v{self.base} -> v{cur} "
                "since this WAP began; re-begin and replay"
            )
        pins = dict(self._pins)
        for name, b in self._branches.items():
            t = ManifestTable(self._pins[name]["root"])
            new_v = t.publish_branch(self.branch_name)
            pins[name] = {"root": t.root, "version": new_v}
        self.cat._publish((cur or 0) + 1, pins)
        self._drop_branches()
        return (cur or 0) + 1

    def abort(self) -> None:
        """Drop every staged branch; the catalog was never touched."""
        self._drop_branches()

    def _drop_branches(self) -> None:
        for name in list(self._branches):
            t = ManifestTable(self._pins[name]["root"])
            t.drop_branch(self.branch_name)
            del self._branches[name]
