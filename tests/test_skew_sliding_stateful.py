"""Tests for salted skew join, sliding windows, and the custom
stateful streaming operator."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from eggv_spark.operators.events import sliding_window_counts
from eggv_spark.operators.relational import salted_join


def test_salted_join_matches_plain_join(spark):
    # Pathological skew: 90% of left rows share one key.
    left = spark.range(1000).select(
        F.col("id").alias("row_id"),
        F.when(F.col("id") % 10 < 9, F.lit(1)).otherwise(F.col("id")).alias("k"),
    )
    right = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    plain = left.join(right, "k").select("row_id", "v")
    salted = salted_join(left, right, "k", n_salts=8).select("row_id", "v")
    assert salted.count() == plain.count()
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


def test_salted_join_left_outer_keeps_unmatched(spark):
    left = spark.createDataFrame([(1, "a"), (99, "b")], ["k", "tag"])
    right = spark.createDataFrame([(1, "x")], ["k", "v"])
    out = salted_join(left, right, "k", n_salts=4, how="left")
    rows = {r.tag: r.v for r in out.collect()}
    assert rows == {"a": "x", "b": None}


def test_sliding_window_double_counts(spark):
    base = dt.datetime(2024, 1, 1, 10, 15)
    df = spark.createDataFrame(
        [(1, base, 2.0), (2, base + dt.timedelta(minutes=30), 3.0)],
        ["event_id", "ts", "value"],
    )
    out = sliding_window_counts(df, "ts", "1 hour", "30 minutes")
    rows = sorted(
        (r.window_start.minute, r.n_events, r.sum_value) for r in out.collect()
    )
    # Event 1 (10:15) in windows [9:30,10:30) and [10:00,11:00);
    # event 2 (10:45) in [10:00,11:00) and [10:30,11:30).
    assert rows == [(0, 2, 5.0), (30, 1, 2.0), (30, 1, 3.0)]


def test_gapfill_hourly_fills_missing_hours(spark):
    base = dt.datetime(2024, 1, 1, 10, 0)
    df = spark.createDataFrame(
        [(1, base, 1.0), (2, base + dt.timedelta(hours=3), 2.0)],
        ["event_id", "ts", "value"],
    )
    from eggv_spark.operators.events import gapfill_hourly

    rows = sorted(
        (r.window_start.hour, r.n_events) for r in gapfill_hourly(df).collect()
    )
    # hours 10..13 present, 11 and 12 filled with zero
    assert rows == [(10, 1), (11, 0), (12, 0), (13, 1)]


def test_resize_images_shape(spark):
    from eggv_spark.operators.multimodal import resize_images, synthesize_assets

    docs = spark.createDataFrame(
        [(0, "img doc", "s", "en"), (1, "audio doc", "s", "en")],
        ["doc_id", "text", "source", "lang"],
    )
    out = resize_images(synthesize_assets(docs), width=4, height=2).collect()
    assert len(out) == 1  # only doc 0 is modality 'image'
    assert len(out[0].resized) == 4 * 2 * 3  # w*h*3 RGB bytes
    # Deterministic: same input -> same bytes.
    again = resize_images(synthesize_assets(docs), width=4, height=2).collect()
    assert out[0].resized == again[0].resized


def test_streaming_user_totals_stateful(spark, tmp_path):
    import pandas as pd

    from eggv_spark.streaming.events_stream import (
        run_available_now,
        streaming_user_totals,
    )

    # Two parquet files -> two micro-batches (maxFilesPerTrigger=1
    # analog): state must carry user 1's count across batches.
    src = tmp_path / "stream_src"
    src.mkdir()
    pd.DataFrame(
        {"user_id": [1, 1, 2], "value": [1.0, 2.0, 10.0]}
    ).to_parquet(src / "a.parquet")
    pd.DataFrame({"user_id": [1], "value": [4.0]}).to_parquet(src / "b.parquet")

    stream = (
        spark.readStream.schema("user_id long, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out = run_available_now(streaming_user_totals(stream), output_mode="update")
    # Per-user FINAL state = row with the max running count.
    final = {
        r.user_id: (r.n_events, r.sum_value)
        for r in out.groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max_by("sum_value", "n_events").alias("sum_value"),
        )
        .collect()
    }
    assert final == {1: (3, 7.0), 2: (1, 10.0)}
