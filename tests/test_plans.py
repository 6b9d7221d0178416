"""Physical-plan regression guards: the benchmark pipeline must keep the
plan shape it was tuned to (broadcast equi-joins, no cartesian products,
parquet column pruning). Catching an accidental plan regression here is
cheaper than re-profiling (SURVEY.md §4)."""

import os

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def plans(spark, sf_small):
    from cloudtiff_spark.operators.meta import tile_assignments
    from cloudtiff_spark.operators.spatial import pip_join

    meta = spark.read.parquet(os.path.join(sf_small, "images_meta.parquet"))
    queries = spark.read.parquet(os.path.join(sf_small, "queries.parquet"))
    ta = tile_assignments(meta)
    pj = pip_join(ta, queries)
    return {
        "ta": ta._jdf.queryExecution().executedPlan().toString(),
        "pip": pj._jdf.queryExecution().executedPlan().toString(),
    }


class TestPlanShape:
    def test_no_cartesian_product(self, plans):
        for name, plan in plans.items():
            assert "CartesianProduct" not in plan, name
            assert "BroadcastNestedLoopJoin" not in plan, name

    def test_pip_uses_broadcast_hash_join(self, plans):
        assert "BroadcastHashJoin" in plans["pip"]

    def test_tile_assignment_is_scan_plus_generate(self, plans):
        # the assignment stage must stay shuffle-free: scan -> explodes
        assert "Exchange hashpartitioning" not in plans["ta"]
        assert "Generate explode" in plans["ta"]

    def test_column_pruning_reaches_scan(self, spark, sf_small):
        # a 2-column projection must not read the wide schema
        meta = spark.read.parquet(os.path.join(sf_small, "images_meta.parquet"))
        plan = (
            meta.select("image_id", "epsg")._jdf.queryExecution().executedPlan().toString()
        )
        assert "ReadSchema: struct<image_id:string,epsg:int>" in plan

    def test_filter_pushdown_reaches_scan(self, spark, sf_small):
        meta = spark.read.parquet(os.path.join(sf_small, "images_meta.parquet"))
        plan = (
            meta.filter(F.col("epsg") == 4326)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "PushedFilters: [IsNotNull(epsg), EqualTo(epsg,4326)]" in plan
