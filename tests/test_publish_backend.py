"""The publish-backend seam: every atomic publish (snapshot manifests,
branch/tag refs, the cross-table catalog) routes through ONE
PublishBackend.create_exclusive call, so porting the format to an
S3-class object store is a single conditional-PUT implementation swap
(contract documented on PublishBackend). Proven with an injected fake
that models a conditional-put store — including a lost race."""

from __future__ import annotations

import os

import pytest

from gridmr_spark.sources.table_format import (
    ConcurrentCommitError,
    ManifestTable,
    PublishBackend,
    set_publish_backend,
)


class FakeConditionalPutStore(PublishBackend):
    """Models an object store's conditional PUT (If-None-Match: *): one
    request, all-or-nothing, 412 -> False. Backed by the real filesystem
    so readers keep working, but the exclusivity decision is the fake's
    own (single O_EXCL create — no temp file, no link), and every call is
    recorded. ``fail_next`` simulates another writer winning the race for
    the next matching publish (the 412 path) without any second process."""

    def __init__(self):
        self.calls: list[tuple[str, bool]] = []
        self.fail_next: str | None = None

    def create_exclusive(self, path: str, data: bytes) -> bool:
        if self.fail_next is not None and os.path.basename(path) == self.fail_next:
            self.fail_next = None
            self.calls.append((path, False))
            return False
        os.makedirs(os.path.dirname(path), exist_ok=True)
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            self.calls.append((path, False))
            return False
        with os.fdopen(fd, "wb") as f:
            f.write(data)
        self.calls.append((path, True))
        return True


@pytest.fixture
def fake_store():
    store = FakeConditionalPutStore()
    prev = set_publish_backend(store)
    yield store
    set_publish_backend(prev)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, v string")


def test_all_publish_paths_route_through_backend(spark, tmp_path, fake_store):
    """Manifest publishes, refs, and the txn catalog all surface as
    backend calls — nothing bypasses the seam with a direct link/rename."""
    from gridmr_spark.sources.catalog_txn import TableCatalog

    t = ManifestTable(str(tmp_path / "tbl"))
    t.commit(_df(spark, [(1, "a")]))
    t.commit(_df(spark, [(2, "b")]))
    t.create_tag("gold", 1)
    t.create_branch("audit", 2)

    cat = TableCatalog(str(tmp_path / "cat"))
    cat.create({"events": t})
    tx = cat.begin()
    tx.commit_table("events", _df(spark, [(3, "c")]))
    tx.commit()

    won_paths = [p for p, won in fake_store.calls if won]
    names = [os.path.basename(p) for p in won_paths]
    assert "v00001.json" in names and "v00002.json" in names
    assert any("gold" in n for n in names), names
    # branch heads publish as v*.json under the branch's own namespace
    assert any(os.sep + "audit" + os.sep in p for p in won_paths), won_paths
    # the catalog's own version publish went through the same seam
    assert any(p for p, _ in fake_store.calls if "/cat/" in p or "cat" + os.sep in p)
    # and the table still reads back correctly through the fake's objects
    # (the catalog txn committed (3, "c") to this same table)
    assert sorted(r.k for r in t.read(spark).collect()) == [1, 2, 3]


def test_lost_race_surfaces_as_concurrent_commit_and_retry_wins(
    spark, tmp_path, fake_store
):
    """A 412 from the store (another writer's manifest landed first) must
    surface as ConcurrentCommitError with nothing visible from the loser,
    and a retry against the refreshed snapshot must succeed — the same
    semantics the POSIX link backend provides."""
    t = ManifestTable(str(tmp_path / "tbl"))
    t.commit(_df(spark, [(1, "a")]))

    fake_store.fail_next = "v00002.json"
    with pytest.raises(ConcurrentCommitError):
        t.commit(_df(spark, [(2, "b")]))
    assert t.current_version() == 1
    assert sorted(r.k for r in t.read(spark).collect()) == [1]

    v = t.commit(_df(spark, [(3, "c")]))
    assert v == 2
    assert sorted(r.k for r in t.read(spark).collect()) == [1, 3]


def test_posix_backend_loser_leaves_no_tmp_or_final(tmp_path):
    """The default backend's loser is side-effect-free: no final object
    clobbered, no temp residue."""
    from gridmr_spark.sources.table_format import PosixLinkBackend

    b = PosixLinkBackend()
    p = str(tmp_path / "m" / "v00001.json")
    assert b.create_exclusive(p, b"winner")
    assert not b.create_exclusive(p, b"loser")
    with open(p, "rb") as f:
        assert f.read() == b"winner"
    assert os.listdir(tmp_path / "m") == ["v00001.json"]
