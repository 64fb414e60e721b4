"""Model-based randomized check of the SCHEMA-EVOLUTION algebra on a
field-ids table (round 14): a random sequence of append / add-column /
rename / drop / COW delete / merge / compact / rewrite_manifests /
restore runs against a real ManifestTable AND an in-memory model that
tracks logical columns by stable id. After every step the merged read
must equal the model — names, null backfill, and dropped-column
exclusion included. One generator covers the interplay matrix
(rename x drop x add x rewrite x restore) far beyond the example tests
in tests/test_rename_fieldids.py."""

from __future__ import annotations

import pytest

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from gridmr_spark.sources.table_format import ManifestTable

KEYS = st.integers(min_value=0, max_value=29)

_op = st.one_of(
    st.tuples(st.just("append"), st.lists(KEYS, min_size=1, max_size=5, unique=True)),
    st.tuples(st.just("add_col"), st.lists(KEYS, min_size=1, max_size=3, unique=True)),
    st.tuples(st.just("rename"), st.integers(min_value=0, max_value=9)),
    st.tuples(st.just("drop"), st.integers(min_value=0, max_value=9)),
    st.tuples(st.just("cow_delete"), st.tuples(KEYS, KEYS)),
    st.tuples(st.just("merge"), st.lists(KEYS, min_size=1, max_size=3, unique=True)),
    st.tuples(st.just("compact"), st.just(None)),
    st.tuples(st.just("rewrite_manifests"), st.just(None)),
    st.tuples(st.just("restore"), st.integers(min_value=0, max_value=5)),
)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=st.lists(_op, min_size=3, max_size=7))
@pytest.mark.slow
def test_random_schema_evolution_matches_model(spark, tmp_path_factory, ops):
    tmp = tmp_path_factory.mktemp("schema_model")
    t = ManifestTable(str(tmp / "tbl"))

    # logical value columns tracked by stable cid; names globally unique
    # (stamp-suffixed) so retire rules can never collide
    names = {0: "c0"}          # cid -> current name (live columns)
    rows = {}                  # k -> {cid: value}
    stamp = 0

    def df_of(keys, for_stamp):
        cols = "k long, " + ", ".join(f"{names[c]} string" for c in sorted(names))
        data = [
            tuple([int(k)] + [f"{c}.{k}.{for_stamp}" for c in sorted(names)])
            for k in keys
        ]
        return spark.createDataFrame(data, cols)

    def put(keys, for_stamp):
        for k in keys:
            rows[k] = {c: f"{c}.{k}.{for_stamp}" for c in sorted(names)}

    t.commit(df_of(range(10), 0).coalesce(1), field_ids=True)
    put(range(10), 0)
    snapshots = {t.current_version(): (dict(names), {k: dict(v) for k, v in rows.items()})}

    for op, arg in ops:
        stamp += 1
        if not rows and op not in ("append", "restore"):
            continue  # verbs on an emptied table raise by contract
        if op == "append":
            keys = [k + 100 * stamp for k in arg]  # fresh keys: model is a map
            t.commit(df_of(keys, stamp))
            put(keys, stamp)
        elif op == "add_col":
            cid = max(names) + 1
            names[cid] = f"c{cid}_{stamp}"
            keys = [k + 100 * stamp for k in arg]
            t.commit(df_of(keys, stamp))  # first batch carrying the column
            put(keys, stamp)
        elif op == "rename":
            cid = sorted(names)[arg % len(names)]
            new = f"c{cid}_{stamp}"
            t.rename_column(names[cid], new)
            names[cid] = new
        elif op == "drop":
            if len(names) < 2:
                continue  # keep at least one value column live
            cid = sorted(names)[arg % len(names)]
            t.drop_column(names[cid])
            del names[cid]
            for r in rows.values():
                r.pop(cid, None)
        elif op == "cow_delete":
            lo, hi = sorted(arg)
            t.delete_where(spark, (F.col("k") % 30 >= lo) & (F.col("k") % 30 <= hi))
            rows = {k: v for k, v in rows.items() if not lo <= k % 30 <= hi}
        elif op == "merge":
            keys = [k for k in arg if k in rows] or list(rows)[:1]
            t.merge_by_key(spark, df_of(keys, stamp), "k")
            put(keys, stamp)
        elif op == "compact":
            t.compact(spark, target_partitions=2)
        elif op == "rewrite_manifests":
            t.rewrite_manifests()
        elif op == "restore":
            vs = sorted(snapshots)
            target = vs[arg % len(vs)]
            t.restore(target)
            s_names, s_rows = snapshots[target]
            names = dict(s_names)
            rows = {k: dict(v) for k, v in s_rows.items()}
        snapshots[t.current_version()] = (
            dict(names), {k: dict(v) for k, v in rows.items()}
        )

        if rows:
            df = t.read(spark, merge_schema=True)
            assert set(df.columns) == {"k"} | set(names.values()), (
                f"columns after {op}({arg})"
            )
            got = {
                r["k"]: {c: r[names[c]] for c in names}
                for r in (row.asDict() for row in df.collect())
            }
            want = {
                k: {c: v.get(c) for c in names} for k, v in rows.items()
            }
            assert got == want, f"after {op}({arg}) at v{t.current_version()}"
