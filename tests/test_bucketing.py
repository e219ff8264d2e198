"""Bucketing: the write-time layout that removes the shuffle from
large×large joins (SURVEY.md §4.3 / join_shuffle_equi's scale note).

Writes lineitem and orders bucketed by the join key, then asserts the
bucketed join plan contains NO shuffle exchange — the co-location is
real, not aspirational — and that results match the plain join."""

from __future__ import annotations

import re

import pytest

from pyspark.sql import functions as F

from agri_market_data_pipeline_spark.plans.audit import explain_str
from agri_market_data_pipeline_spark.tables import load


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir):
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS o_b")
    (
        load(spark, sf_dir, "lineitem")
        .write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .mode("overwrite")
        .saveAsTable("li_b")
    )
    (
        load(spark, sf_dir, "orders")
        .write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .mode("overwrite")
        .saveAsTable("o_b")
    )
    yield spark.table("li_b"), spark.table("o_b")
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS o_b")


def test_bucketed_join_has_no_shuffle(spark, bucketed):
    li, o = bucketed
    # Disable broadcast so the planner must co-partition — at test scale
    # Spark would otherwise just broadcast the small side and prove nothing.
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        txt = explain_str(j)
        # The join runs as SMJ directly on bucketed scans: no Exchange on
        # either join key — the shuffle happened once, at write time.
        assert "SortMergeJoin" in txt, txt[:800]
        assert not re.search(r"Exchange hashpartitioning\(l_orderkey", txt), txt[:800]
        assert not re.search(r"Exchange hashpartitioning\(o_orderkey", txt), txt[:800]
        assert "Bucketed: true" in txt
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_matches_plain_join(spark, sf_dir, bucketed):
    li_b, o_b = bucketed
    got = {
        (r.o_orderpriority, r.cnt)
        for r in li_b.join(o_b, li_b.l_orderkey == o_b.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    li, o = load(spark, sf_dir, "lineitem"), load(spark, sf_dir, "orders")
    want = {
        (r.o_orderpriority, r.cnt)
        for r in li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    assert got == want
