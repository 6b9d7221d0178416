"""Structured Streaming extension tests: the batch tile-assignment plan
runs unchanged over a stream; watermarked window agg over events."""

import os

from pyspark.sql import functions as F


class TestStreamingTileAssign:
    def test_stream_equals_batch(self, spark, sf_small, tmp_path):
        from cloudtiff_spark.operators.meta import tile_assignments
        from cloudtiff_spark.streaming import stream_tile_assignments

        import shutil

        src = os.path.join(sf_small, "images_meta.parquet")
        meta_dir = str(tmp_path / "meta_in")
        os.makedirs(meta_dir)
        shutil.copy(src, os.path.join(meta_dir, "part-0.parquet"))
        out = stream_tile_assignments(spark, meta_dir)
        q = (
            out.writeStream.format("memory")
            .queryName("ta_stream")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        q.awaitTermination(120)
        got = {
            (r.image_id, r.level, r.tile_idx, r.cell)
            for r in spark.sql("select * from ta_stream").collect()
        }
        batch = spark.read.parquet(src)
        want = {
            (r.image_id, r.level, r.tile_idx, r.cell)
            for r in tile_assignments(batch).collect()
        }
        assert got == want and len(got) > 0


class TestStreamingEvents:
    def test_windowed_counts_match_batch(self, spark, tmp_path):
        from cloudtiff_spark.streaming import stream_event_counts

        import shutil

        src = "/root/testdata/sf0.001/events.parquet"
        events_dir = str(tmp_path / "events_in")
        os.makedirs(events_dir)
        shutil.copy(src, os.path.join(events_dir, "part-0.parquet"))
        out = stream_event_counts(spark, events_dir)
        q = (
            out.writeStream.format("memory")
            .queryName("ev_stream")
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ckpt2"))
            .start()
        )
        q.awaitTermination(120)
        got = spark.sql("select sum(n) from ev_stream").first()[0] or 0
        # append mode emits only windows older than the watermark; with
        # availableNow the final watermark leaves the tail pending, so the
        # emitted count is a prefix of the batch total
        total = spark.read.parquet(src).count()
        assert 0 < got <= total


class TestStatefulSessionize:
    def test_multi_batch_state_equals_batch_query(self, spark, tmp_path):
        """Replay the events table through TWO micro-batches (state must
        carry across batches) and assert the final per-user totals equal
        the batch sessionize query's output."""
        import __spark_entry__ as E
        from cloudtiff_spark.streaming import stream_sessionize

        ev = E._t(spark, "/root/testdata/sf0.001", "events")
        # time-split into two files so each user's sequence arrives in order
        cut = ev.selectExpr("percentile(unix_micros(cast(ts as timestamp_ltz)), 0.5) p").first()["p"]
        src = tmp_path / "stream_src"
        ev.filter(F.unix_micros(F.col("ts").cast("timestamp_ltz")) <= cut).coalesce(1).write.parquet(
            str(src), mode="append"
        )
        ev.filter(F.unix_micros(F.col("ts").cast("timestamp_ltz")) > cut).coalesce(1).write.parquet(
            str(src), mode="append"
        )

        out = stream_sessionize(spark, str(src), max_files=1)
        q = (
            out.writeStream.format("memory")
            .queryName("sess_stream")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got_rows = spark.sql(
            "SELECT user_id, n_sessions, n_events FROM sess_stream"
        ).collect()
        assert q.lastProgress["batchId"] >= 1  # state really crossed batches
        # time-ordered splits => zero cross-batch late events
        assert spark.sql("SELECT sum(n_late) FROM sess_stream").first()[0] == 0
        # update mode re-emits users per batch: keep the LAST emission per
        # user = the one with the max n_events
        got = {}
        for r in got_rows:
            if r.user_id not in got or r.n_events > got[r.user_id][1]:
                got[r.user_id] = (r.n_sessions, r.n_events)
        want = {
            r.user_id: (r.n_sessions, r.n_events)
            for r in E.q_sessionize(spark, "/root/testdata/sf0.001").collect()
        }
        assert got == want and len(want) > 10

    def test_out_of_order_batches_flag_late_events(self, spark, tmp_path):
        """Feed the SECOND time half first: the in-order contract is
        violated across micro-batches and the operator must say so via the
        n_late counter (instead of silently mis-sessionizing)."""
        import __spark_entry__ as E
        from cloudtiff_spark.streaming import stream_sessionize

        ev = E._t(spark, "/root/testdata/sf0.001", "events")
        cut = ev.selectExpr(
            "percentile(unix_micros(cast(ts as timestamp_ltz)), 0.5) p"
        ).first()["p"]
        src = tmp_path / "stream_src_ooo"
        # LATE half lands first (files are picked up in discovery order;
        # name them so the late file sorts first)
        ev.filter(F.unix_micros(F.col("ts").cast("timestamp_ltz")) > cut).coalesce(
            1
        ).write.parquet(str(src / "a_late"), mode="append")
        ev.filter(F.unix_micros(F.col("ts").cast("timestamp_ltz")) <= cut).coalesce(
            1
        ).write.parquet(str(src / "b_early"), mode="append")

        out = stream_sessionize(spark, str(src) + "/*", max_files=1)
        q = (
            out.writeStream.format("memory")
            .queryName("sess_stream_ooo")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        n_late = spark.sql("SELECT sum(n_late) FROM sess_stream_ooo").first()[0]
        assert q.lastProgress["batchId"] >= 1
        assert n_late and n_late > 0
