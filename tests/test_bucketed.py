"""Bucketed-table co-location: the join between two tables bucketed
on the same key with the same bucket count must plan WITHOUT an
Exchange on either side — and the same join over plain parquet must
show the Exchanges the bucketing removed (proving the pin is
load-bearing, not vacuous)."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from htmlparser_spark.operators.bucketed import bucketed_join, write_bucketed
from htmlparser_spark.plans.inspect import explain_string

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def workdir():
    d = tempfile.mkdtemp(prefix="hps_bucketed_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _force_smj(spark):
    """Disable broadcast + AQE so the executed plan exposes the
    sort-merge join's exchange requirements deterministically."""
    old = {
        "spark.sql.autoBroadcastJoinThreshold":
            spark.conf.get("spark.sql.autoBroadcastJoinThreshold"),
        "spark.sql.adaptive.enabled":
            spark.conf.get("spark.sql.adaptive.enabled"),
    }
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    return old


def _restore(spark, old):
    for k, v in old.items():
        spark.conf.set(k, v)


def test_bucketed_join_has_no_exchange(spark, workdir):
    docs = (spark.read.parquet(f"{SF}/documents.parquet")
            .select("doc_id", "text", "source"))
    stats = docs.select("doc_id",
                        F.length("text").alias("n_chars"))
    old = _force_smj(spark)
    try:
        left = write_bucketed(docs.select("doc_id", "source"),
                              "b_docs", f"{workdir}/docs", "doc_id",
                              n_buckets=8)
        right = write_bucketed(stats, "b_stats", f"{workdir}/stats",
                               "doc_id", n_buckets=8)
        joined = bucketed_join(spark, left, right)
        plan = explain_string(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        # negative control: the same join over the plain parquet
        # needs an exchange on both sides
        plain = (spark.read.parquet(f"{workdir}/docs")
                 .join(spark.read.parquet(f"{workdir}/stats"), "doc_id"))
        assert explain_string(plain).count("Exchange") >= 2
        # values equal either way
        assert sorted(map(tuple, joined.collect())) == \
            sorted(map(tuple, plain.select(*joined.columns).collect()))
    finally:
        _restore(spark, old)
        spark.sql("DROP TABLE IF EXISTS b_docs")
        spark.sql("DROP TABLE IF EXISTS b_stats")


def test_bucketed_groupby_has_no_exchange(spark, workdir):
    """Aggregation on the bucket key also reuses the bucketing —
    per-key rollups over a bucketed corpus are shuffle-free."""
    docs = (spark.read.parquet(f"{SF}/documents.parquet")
            .select("doc_id", F.length("text").alias("n")))
    old = _force_smj(spark)
    try:
        write_bucketed(docs, "b_agg", f"{workdir}/agg", "doc_id",
                       n_buckets=8)
        agg = (spark.table("b_agg").groupBy("doc_id")
               .agg(F.sum("n").alias("total")))
        assert "Exchange" not in explain_string(agg)
    finally:
        _restore(spark, old)
        spark.sql("DROP TABLE IF EXISTS b_agg")


def test_bucket_spec_mismatch_is_loud(spark, workdir):
    docs = spark.read.parquet(f"{SF}/documents.parquet") \
        .select("doc_id", "source")
    try:
        a = write_bucketed(docs, "b_a", f"{workdir}/a", "doc_id", 8)
        b = write_bucketed(docs, "b_b", f"{workdir}/b", "doc_id", 16)
        with pytest.raises(ValueError, match="bucket counts differ"):
            bucketed_join(spark, a, b)
        c = dict(b, key="source")
        with pytest.raises(ValueError, match="bucket keys differ"):
            bucketed_join(spark, a, c)
    finally:
        for t in ("b_a", "b_b"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
