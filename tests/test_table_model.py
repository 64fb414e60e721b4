"""Model-based randomized check of the manifest table's verb algebra:
apply a random sequence of verbs (append, COW delete, DV delete, merge,
restore, compact, compact_small, rewrite_manifests, materialize_dv,
repartition-by-spec — round 13) to a real ManifestTable AND to an
in-memory key->value model; after every step the
table read must equal the model, and at the end the changefeed from v1
folds to the model diff. One generator exercises the interplay matrix
(DV x partial-COW x restore x compaction) far beyond what example-based
tests enumerate."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from gridmr_spark.sources.table_format import ManifestTable

KEYS = st.integers(min_value=0, max_value=39)

_op = st.one_of(
    st.tuples(st.just("append"), st.lists(KEYS, min_size=1, max_size=6, unique=True)),
    st.tuples(st.just("cow_delete"), st.tuples(KEYS, KEYS)),
    st.tuples(st.just("dv_delete"), st.tuples(KEYS, KEYS)),
    st.tuples(st.just("merge"), st.lists(KEYS, min_size=1, max_size=4, unique=True)),
    st.tuples(st.just("restore"), st.integers(min_value=0, max_value=5)),
    st.tuples(st.just("compact"), st.just(None)),
    st.tuples(st.just("compact_small"), st.just(None)),
    st.tuples(st.just("rewrite_manifests"), st.just(None)),
    st.tuples(st.just("materialize_dv"), st.integers(min_value=0, max_value=3)),
    st.tuples(st.just("repartition_spec"), st.just(None)),
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=st.lists(_op, min_size=3, max_size=7))
@pytest.mark.slow
def test_random_verb_sequences_match_model(spark, tmp_path_factory, ops):
    tmp = tmp_path_factory.mktemp("model")
    t = ManifestTable(str(tmp / "tbl"))

    def df_of(pairs):
        return spark.createDataFrame(
            [(int(k), v) for k, v in pairs], "k long, v string"
        )

    # v1 seed — two files so partial verbs have something to carry
    seed = [(k, f"s{k}") for k in range(0, 20)]
    t.commit(df_of(seed[:10]).coalesce(1))
    t.commit(df_of(seed[10:]).coalesce(1))
    model = {k: v for k, v in seed}          # key -> value (keys unique here)
    snapshots = {t.current_version(): dict(model)}
    stamp = 0

    for op, arg in ops:
        stamp += 1
        if not model and op not in ("append", "restore"):
            continue  # verbs on a fully-emptied table raise by contract
        if op == "append":
            # fresh keys only (shift by 100*stamp) so the model stays a map
            pairs = [(k + 100 * stamp, f"a{stamp}.{k}") for k in arg]
            t.commit(df_of(pairs))
            model.update(pairs)
        elif op in ("cow_delete", "dv_delete"):
            lo, hi = sorted(arg)
            cond = (F.col("k") % 40 >= lo) & (F.col("k") % 40 <= hi)
            t.delete_where(
                spark, cond, mode="dv" if op == "dv_delete" else "cow"
            )
            model = {k: v for k, v in model.items() if not lo <= k % 40 <= hi}
        elif op == "merge":
            ups = [(k, f"m{stamp}.{k}") for k in arg]
            t.merge_by_key(spark, df_of(ups), "k")
            model.update(ups)
        elif op == "restore":
            vs = sorted(snapshots)
            target = vs[arg % len(vs)]
            t.restore(target)
            model = dict(snapshots[target])
        elif op == "compact":
            t.compact(spark, target_partitions=2)
        elif op == "compact_small":
            t.compact_small(spark, small_mb=0.002)
        elif op == "rewrite_manifests":
            t.rewrite_manifests()
        elif op == "materialize_dv":
            # metadata no-op when the DV set is already at/below target
            t.materialize_dv(spark, target_rows=arg)
        elif op == "repartition_spec":
            # establish a hidden partition spec; later appends/rewrites
            # inherit it, exercising partitioned-layout interplay with
            # every other verb in the sequence
            t.compact(spark, partition_by="k % 3")
        snapshots[t.current_version()] = dict(model)

        got = {(r.k, r.v) for r in t.read(spark).collect()} if model else set()
        want = set(model.items())
        assert got == want, f"after {op}({arg}) at v{t.current_version()}"

    # changefeed from the seed snapshot folds to the model diff
    v_last = t.current_version()
    if v_last > 2:
        feed = t.changefeed(spark, 2, v_last)
        folded: dict = {}
        for r in feed.collect():
            folded[(r.k, r.v)] = folded.get((r.k, r.v), 0) + (
                1 if r["_op"] == "I" else -1
            )
        net = {kv for kv, n in folded.items() if n > 0}
        dropped = {kv for kv, n in folded.items() if n < 0}
        base = set(snapshots[2].items())
        assert (base - dropped) | net == set(model.items())
