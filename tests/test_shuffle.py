"""Measured-shuffle assertions (plans/shuffle.py): the repo's central
"narrow shuffle" claims, enforced as numbers rather than prose.

Each test measures the shuffle volume of exactly the stages its query
ran (stage-id diff, so the shared test session doesn't pollute the
numbers) at sf0.01. Bounds are generous enough to survive partition-count
changes but tight enough that losing the property (map-side combine
disabled, digest key dropped, broadcast falling back to shuffle) fails.
"""

from __future__ import annotations

from gridmr_spark.catalog import load_table
from gridmr_spark.plans.shuffle import measure_shuffle
from gridmr_spark.queries import load_all

REG = load_all()


def test_filter_project_shuffles_nothing(spark, sf_oracle):
    """filter_project is scan->filter->project: zero exchanges in the plan,
    therefore zero bytes on the wire."""
    st = measure_shuffle(spark, REG["filter_project"].fn(spark, sf_oracle))
    assert st.write_bytes == 0 and st.read_bytes == 0


def test_wordcount_partial_aggregation(spark, sf_oracle):
    """The flagship: partial aggregation must collapse the token stream
    before the exchange — shuffled records are bounded by vocab x map
    partitions (~tens), not by token count (~tens of thousands)."""
    docs = load_table(spark, sf_oracle, "documents")
    import pyspark.sql.functions as F

    n_tokens = docs.select(
        F.sum(F.size(F.split(F.col("text"), " "))).alias("n")
    ).first()["n"]
    st = measure_shuffle(spark, REG["wordcount"].fn(spark, sf_oracle))
    assert st.write_records > 0  # the exchange exists...
    assert st.write_records < n_tokens / 10  # ...but combined map-side
    assert st.write_records < 2000


def test_digest_dedup_narrower_than_raw_text(spark, sf_oracle):
    """dedup_exact_digest's 128-bit-key claim: grouping on the digest must
    move materially fewer bytes than grouping on the raw text."""
    raw = measure_shuffle(spark, REG["dedup_exact"].fn(spark, sf_oracle))
    dig = measure_shuffle(
        spark, REG["dedup_exact_digest"].fn(spark, sf_oracle)
    )
    assert 0 < dig.write_bytes < raw.write_bytes / 2


def test_crawl_dedup_two_phase_distinct_ceiling(spark, sf_oracle):
    """crawl_url_canonical_dedup carries an exact COUNT(DISTINCT raw_url),
    which Spark executes as two exchanges: phase 1 keys on (canonical,
    raw) — at most one record per DISTINCT raw spelling, however often a
    spelling re-occurs — and phase 2 on the canonical key alone. Wire
    volume is therefore bounded by distinct spellings + group fan-in, not
    by the discovery stream."""
    n_docs = load_table(spark, sf_oracle, "documents").count()
    st = measure_shuffle(
        spark, REG["crawl_url_canonical_dedup"].fn(spark, sf_oracle)
    )
    # 500 distinct spellings + (97 groups x map partitions) headroom
    assert 0 < st.write_records <= n_docs + 33 * 97


def test_crawl_rediscovery_collapses_map_side(spark, sf_oracle):
    """The frontier claim behind the registered query: RE-DISCOVERED URLs
    (the dominant case in a crawl — every page links home) collapse
    map-side before the wire. Each URL occurs 8x co-located; shuffled
    records must stay near the distinct count, far below occurrences."""
    import pyspark.sql.functions as F

    from gridmr_spark.operators import urls as U

    docs = load_table(spark, sf_oracle, "documents").select("doc_id")
    rep = docs.select(
        "doc_id", F.explode(F.sequence(F.lit(1), F.lit(8))).alias("dup")
    )
    n_occurrences = rep.count()
    agg = (
        rep.select(U.canonical_url(U.synth_url(F.col("doc_id"))).alias("c"))
        .groupBy("c")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    st = measure_shuffle(spark, agg)
    assert 0 < st.write_records < n_occurrences / 8


def test_broadcast_star_join_shuffles_only_aggregates(spark, sf_oracle):
    """join_star_revenue broadcasts every dimension: the only wire traffic
    is the partial-aggregated fact rollup, never a join side — so shuffled
    records stay far below the fact row count."""
    n_fact = load_table(spark, sf_oracle, "lineitem").count()
    st = measure_shuffle(
        spark, REG["join_star_revenue"].fn(spark, sf_oracle)
    )
    assert st.write_records < n_fact / 20


def test_bloom_probe_shuffles_only_the_probe_groupby(spark, sf_oracle):
    """dedup_bloom_membership's claim: the history NEVER joins the probe
    batch — the filter bitmap broadcasts (<= m/32 = 64 rows), so measured
    shuffle is bounded by the bitmap build + the per-doc flag group-by,
    both tiny, never corpus x corpus."""
    st = measure_shuffle(spark, REG["dedup_bloom_membership"].fn(spark, sf_oracle))
    # 500 docs x 3 hashes = 1500 probe position rows is the natural ceiling
    # for the flag group-by; the bitmap build adds <= 64 combined rows.
    assert 0 < st.write_records < 8000


def test_countmin_build_is_geometry_bounded(spark, sf_oracle):
    """agg_countmin_freq: the sketch exchange carries at most width*depth
    combined counter rows per map partition — corpus token volume must
    not reach the wire."""
    docs = load_table(spark, sf_oracle, "documents")
    import pyspark.sql.functions as F

    n_tokens = docs.select(
        F.sum(F.size(F.split(F.col("text"), " "))).alias("n")
    ).first()["n"]
    st = measure_shuffle(spark, REG["agg_countmin_freq"].fn(spark, sf_oracle))
    assert st.write_records > 0
    assert st.write_records < n_tokens / 10  # map-side combined
