"""Differential test: every registered query with an oracle must match DuckDB
exactly at sf0.001 (the driver runs the same comparison at sf0.01)."""

from __future__ import annotations

import pytest

from flock_spark.oracle import compare
from flock_spark.registry import REGISTRY, get_queries

get_queries()  # populate registry

WITH_ORACLE = sorted(name for name, spec in REGISTRY.items() if spec.oracle)
ROWS_ONLY = sorted(name for name, spec in REGISTRY.items() if not spec.oracle)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_parity(spark, sf_dir, name):
    spec = REGISTRY[name]
    compare(spark, spec.fn, spec.oracle, sf_dir)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(spark, sf_dir, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_no_banned_oracle_output_types(sf_dir):
    """Round-3 driver finding: DuckDB promotes sum(INT/BIGINT) to HUGEINT
    (int128), which the external driver hashes differently from Spark's int64
    even when values are equal — the local multiset compare canonicalizes both
    to Python int and can never see the class. Every oracle must resolve to
    portable output types; the fix is CAST(sum(...) AS BIGINT) at the source."""
    import duckdb

    from flock_spark.catalog import TABLE_NAMES
    from flock_spark.oracle import check_oracle_types

    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
        )
    bad = []
    for name in WITH_ORACLE:
        try:
            check_oracle_types(con, REGISTRY[name].oracle)
        except AssertionError as e:
            bad.append((name, str(e).splitlines()[0]))
    con.close()
    assert not bad, f"oracles with non-portable output types: {bad}"


def test_nested_oracle_output_rejected():
    """Round-6 driver finding (third output-type hazard after r1 DECIMAL and
    r3 HUGEINT): the driver's canonicalizer cannot hash LIST/STRUCT/MAP cells
    (TypeError: unhashable type: 'list' — all 4 r6 reds). check_oracle_types
    must red-line any oracle emitting a nested column."""
    import duckdb

    from flock_spark.oracle import check_oracle_types

    con = duckdb.connect()
    for sql in (
        "SELECT [1, 2, 3] AS xs",
        "SELECT {'a': 1} AS s",
        "SELECT map([1], [2]) AS m",
    ):
        with pytest.raises(AssertionError, match="non-portable"):
            check_oracle_types(con, sql)
    # the sanctioned serialization passes
    check_oracle_types(con, "SELECT array_to_string([1, 2, 3], ',') AS xs")
    con.close()


def test_nested_spark_output_rejected(spark, sf_dir):
    """Spark-side twin of the nested-output ban: compare() must refuse an
    array-typed result column before it ever reaches the multiset diff
    (the local _canon list branch is what masked the r6 reds)."""
    import pyspark.sql.functions as F

    def fn(sp, d):
        return sp.range(1).select(F.array(F.lit(1), F.lit(2)).alias("xs"))

    with pytest.raises(AssertionError, match="nested"):
        compare(spark, fn, "SELECT array_to_string([1,2], ',') AS xs", sf_dir)


def test_line_hash_boilerplate_non_vacuous(spark, sf_dir):
    """A zero-boilerplate corpus would green-light the entry without testing
    the membership join; the synthetic corpus's near-dups must produce real
    shared blocks (cf. the text_oov_rate vacuity fix in round 3)."""
    from flock_spark.registry import REGISTRY

    rows = REGISTRY["dedup_line_hash_boilerplate"].fn(spark, sf_dir).collect()
    assert sum(r["boiler_instances"] for r in rows) > 0
    assert sum(r["docs_with_boiler"] for r in rows) > 0


def test_radius_search_non_vacuous(spark, sf_dir):
    """A threshold that nothing crosses would certify an empty result set;
    the range query must return real neighbors AND exclude real candidates
    (i.e., the threshold bites both ways). Both directions are asserted:
    results exist, and the in-bucket candidate-pair count strictly exceeds
    the returned row count (a threshold excluding nothing would tie)."""
    import pyspark.sql.functions as F

    from flock_spark.operators.similarity import (
        N_QUERIES,
        RADIUS_T,
        _bucket_spark,
        _spark_vecs,
    )
    from flock_spark.registry import REGISTRY

    rows = REGISTRY["ann_radius_search"].fn(spark, sf_dir).collect()
    assert len(rows) > 0
    assert all(r["cos_sim"] >= RADIUS_T for r in rows)

    b = _spark_vecs(spark, sf_dir).select(
        "vec_id", F.expr(f"CAST({_bucket_spark()} AS BIGINT)").alias("bucket")
    )
    q = (
        b.filter(F.col("vec_id") % 50 == 0)
        .orderBy("vec_id")
        .limit(N_QUERIES)
        .select(F.col("vec_id").alias("query_id"), "bucket")
    )
    n_candidates = (
        q.join(b, "bucket").filter(F.col("query_id") != F.col("vec_id")).count()
    )
    assert n_candidates > len(rows), (
        f"threshold excluded nothing: {n_candidates} candidates, "
        f"{len(rows)} returned"
    )


def test_log2_histogram_bins_match_bitlength(spark, sf_dir):
    """The no-libm log2 bin must equal floor(log2(micro+1)) recomputed in
    Python for every bin's min/max — pins the bit-length identity."""
    from flock_spark.registry import REGISTRY

    import math

    rows = REGISTRY["events_log2_value_histogram"].fn(spark, sf_dir).collect()
    assert len(rows) > 1
    for r in rows:
        for v in (r["min_v"], r["max_v"]):
            # half-away-from-zero, matching both engines' round(); Python's
            # built-in round() is banker's rounding and would flip a micro
            # value landing exactly on a .5 boundary
            micro = max(int(math.floor(v * 1_000_000 + 0.5)), 0) + 1
            assert micro.bit_length() - 1 == r["log2_bin"]


def test_hashed_linear_quality_all_classes_present(spark, sf_dir):
    """The ±4-per-token thresholds must actually split the corpus: all three
    quality classes populated, so the CASE branches are all exercised."""
    from flock_spark.registry import REGISTRY

    rows = REGISTRY["text_hashed_linear_quality"].fn(spark, sf_dir).collect()
    assert {r["qclass"] for r in rows} == {"good", "mid", "bad"}
