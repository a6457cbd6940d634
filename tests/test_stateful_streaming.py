"""applyInPandasWithState operators: streaming dedup + sessionization."""

import pytest
from pyspark.sql import functions as F


def test_streaming_first_seen_dedup(spark, tmp_path):
    from gensim_spark.streaming.stateful import streaming_first_seen

    src = str(tmp_path / "src")
    # two files → two micro-batches; dup text across batches must be dropped
    spark.createDataFrame(
        [(0, "alpha"), (1, "beta"), (2, "alpha")], "doc_id long, text string"
    ).coalesce(1).write.mode("overwrite").parquet(src + "/f1")
    spark.createDataFrame(
        [(3, "beta"), (4, "gamma")], "doc_id long, text string"
    ).coalesce(1).write.mode("overwrite").parquet(src + "/f2")

    schema = "doc_id long, text string"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    out = streaming_first_seen(stream)
    q = (
        out.writeStream.format("memory").queryName("dedup_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from dedup_out").collect()
    by_hash = {}
    for r in rows:
        by_hash.setdefault(r["text_hash"], []).append(r["doc_id"])
    # one survivor per distinct text, and it is an actual doc of that text
    assert sorted(len(v) for v in by_hash.values()) == [1, 1, 1]
    survivors = sorted(x for v in by_hash.values() for x in v)
    assert len(survivors) == 3
    assert 4 in survivors          # gamma is unique
    assert not ({2, 3} <= set(survivors))  # later duplicates suppressed


def test_streaming_sessions(spark, tmp_path):
    import datetime as dt

    from gensim_spark.streaming.stateful import streaming_sessions

    src = str(tmp_path / "ev")
    base = dt.datetime(2025, 1, 1)
    rows = [
        # user 1: two events 10 min apart (one session), then 2h gap → new
        (1, base, 1.0),
        (1, base + dt.timedelta(minutes=10), 2.0),
        (1, base + dt.timedelta(hours=2), 5.0),
        # user 2: single event
        (2, base, 7.0),
    ]
    spark.createDataFrame(
        rows, "user_id long, ts timestamp, value double"
    ).coalesce(1).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(
        "user_id long, ts timestamp, value double"
    ).parquet(src)
    out = streaming_sessions(stream)
    q = (
        out.writeStream.format("memory").queryName("sessions_out")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from sessions_out").collect()
    # only user 1's FIRST session is closed (the second stays open in state)
    assert len(got) == 1
    r = got[0]
    assert r["user_id"] == 1 and r["n_events"] == 2 and r["total"] == 3.0
