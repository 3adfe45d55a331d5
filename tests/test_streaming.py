"""Structured Streaming ≡ batch equivalence on a bounded event stream."""

import pytest
from pyspark.sql import functions as F

from readwise_vector_db_spark.sources.tables import load_table
from readwise_vector_db_spark.streaming import windows as sw
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def event_dir(spark, tmp_path_factory):
    """events with micros timestamps, split into 3 files to force
    multiple micro-batches."""
    out = str(tmp_path_factory.mktemp("events_stream"))
    load_table(spark, SF_SMOKE, "events").repartition(3).write.mode("overwrite").parquet(out)
    return out


@pytest.fixture(scope="module")
def batch_events(spark, event_dir):
    return spark.read.schema(sw.EVENT_SCHEMA).parquet(event_dir)


def test_tumbling_stream_equals_batch(spark, event_dir, batch_events):
    stream = sw.read_event_stream(spark, event_dir, max_files=1)
    sw.run_to_memory(sw.tumbling_counts(stream), "tumbling_out")
    got = {
        (r["bucket"], r["event_type"]): r["n"]
        for r in spark.sql("SELECT * FROM tumbling_out").collect()
    }
    expect = {
        (r["bucket"], r["event_type"]): r["n"]
        for r in batch_events.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.unix_timestamp(F.col("window.start")).alias("bucket"), "event_type", "n")
        .collect()
    }
    assert got == expect


def test_sliding_windows_cover_each_event_4x(spark, event_dir, batch_events):
    stream = sw.read_event_stream(spark, event_dir, max_files=2)
    sw.run_to_memory(sw.sliding_rates(stream, "1 hour", "15 minutes"), "sliding_out")
    total = spark.sql("SELECT sum(n) AS s FROM sliding_out").first()["s"]
    # every event lands in exactly 4 overlapping 1h/15m windows
    assert total == batch_events.count() * 4


def test_session_window_stream_equals_batch_sessionizer(spark, event_dir, batch_events):
    # the fixture files are NOT time-ordered, so the watermark must exceed
    # the source's disorder (30 days) or later files are dropped as late —
    # that's the point of a watermark, asserted separately below
    stream = sw.read_event_stream(spark, event_dir, max_files=1)
    sw.run_to_memory(
        sw.session_aggregates(stream, gap="30 minutes", watermark="720 hours"),
        "session_out",
    )
    got = spark.sql("SELECT * FROM session_out")
    # session_window semantics == the batch lag+cumsum sessionizer
    from readwise_vector_db_spark.suites.relational import q_events_sessions

    batch = q_events_sessions(spark, SF_SMOKE)
    assert got.count() == batch.count()
    g = got.agg(F.sum("n_events").alias("s")).first()["s"]
    b = batch.agg(F.sum("n_events").alias("s")).first()["s"]
    assert g == b


def test_session_window_short_watermark_drops_late(spark, event_dir):
    """With a 2h watermark over a 30-day out-of-order replay, most events in
    later files arrive past the watermark and are dropped — session count
    must come out strictly lower than the full batch answer."""
    stream = sw.read_event_stream(spark, event_dir, max_files=1)
    sw.run_to_memory(
        sw.session_aggregates(stream, gap="30 minutes", watermark="2 hours"),
        "session_late_out",
    )
    from readwise_vector_db_spark.suites.relational import q_events_sessions

    n_late = spark.sql("SELECT count(*) AS n FROM session_late_out").first()["n"]
    n_full = q_events_sessions(spark, SF_SMOKE).count()
    assert n_late < n_full


def test_multimodal_plumbing(spark):
    from readwise_vector_db_spark.operators import multimodal as mm

    rows = [
        (1, "image", b"imgbytes-1", ("image/png", 64, 64, None)),
        (2, "image", b"imgbytes-1", ("image/png", 64, 64, None)),  # same payload
        (3, "video", b"vid-1", ("video/mp4", 640, 480, 3500)),
        (4, "audio", None, ("audio/wav", None, None, 2000)),
    ]
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    feats = {r["media_id"]: r for r in mm.extract_features(media).collect()}
    assert feats[1]["features"] == feats[2]["features"]  # deterministic decode
    assert feats[1]["n_bytes"] == 10
    assert feats[4]["features"] is None
    frames = mm.sample_frames(media, every_ms=1000).collect()
    assert [r["frame_ms"] for r in frames] == [0, 1000, 2000, 3000]
    with pytest.raises(NotImplementedError):
        mm.decode_stub(b"x", "image/png")


def test_stateful_running_totals(spark, event_dir, batch_events):
    """applyInPandasWithState accumulates across micro-batches; the final
    update per user must equal the batch aggregate."""
    from readwise_vector_db_spark.streaming import stateful as st

    stream = sw.read_event_stream(spark, event_dir, max_files=1)
    q = (
        st.running_user_totals(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("running_totals_out")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # update mode appends one row per (user, micro-batch); the LAST row per
    # user carries the accumulated state
    rows = spark.sql(
        """SELECT user_id, n_events, total_value FROM (
               SELECT *, row_number() OVER (
                   PARTITION BY user_id ORDER BY n_events DESC) AS rn
               FROM running_totals_out) WHERE rn = 1"""
    ).collect()
    got = {r["user_id"]: (r["n_events"], round(r["total_value"], 6)) for r in rows}
    expect = {
        r["user_id"]: (r["n"], round(r["sv"], 6))
        for r in batch_events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum(F.coalesce("value", F.lit(0.0))).alias("sv"))
        .collect()
    }
    assert got == expect


def test_streaming_sync_checkpoint_is_the_watermark(spark, tmp_path):
    """Two runs over a growing export dir: the checkpoint ensures run 2
    reads only the new file; the merge upserts by id."""
    import json

    from readwise_vector_db_spark.jobs.sync import run_streaming_sync

    export = tmp_path / "export"
    export.mkdir()
    table = str(tmp_path / "highlights")
    ckpt = str(tmp_path / "ckpt")

    def write_file(name, records):
        with open(export / name, "w") as f:
            for r in records:
                f.write(json.dumps(r) + "\n")

    write_file("page1.json", [
        {"id": 1, "text": "one", "updated_at": "2024-01-01T00:00:00Z"},
        {"id": 2, "text": "two old", "updated_at": "2024-01-01T00:00:00Z"},
        {"id": 3, "text": "   ", "updated_at": "2024-01-01T00:00:00Z"},  # skipped
    ])
    from readwise_vector_db_spark.sources.versioned import VersionedTable

    run_streaming_sync(spark, str(export), table, ckpt)
    vt = VersionedTable(table)
    t1 = {r["id"]: r["text"] for r in vt.read(spark).collect()}
    assert t1 == {"1": "one", "2": "two old"}

    write_file("page2.json", [
        {"id": 2, "text": "two NEW", "updated_at": "2024-02-01T00:00:00Z"},
        {"id": 4, "text": "four", "updated_at": "2024-02-01T00:00:00Z"},
    ])
    run_streaming_sync(spark, str(export), table, ckpt)
    t2 = {r["id"]: r["text"] for r in vt.read(spark).collect()}
    assert t2 == {"1": "one", "2": "two NEW", "4": "four"}
    rows = vt.read(spark).collect()
    assert all(len(r["embedding"]) == 64 for r in rows)


def test_watermark_drops_late_events(spark, tmp_path):
    """Append-mode tumbling counts with a 2h watermark: an event arriving
    2+ hours behind the observed max must be excluded from its window."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    d = str(tmp_path / "late_events")

    def write(name, rows):
        spark.createDataFrame(rows, sw.EVENT_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(d)

    def ev(i, hours, etype="click"):
        return (i, base + dt.timedelta(hours=hours), 1, etype, 1.0, "{}")

    # batch 1: events up to t=5h → watermark advances to 3h after the batch
    write("b1", [ev(1, 0.5), ev(2, 1.5), ev(3, 5.0)])
    stream = sw.read_event_stream(spark, d, max_files=1)
    counts = sw.tumbling_counts(stream, window="1 hour", watermark="2 hours")
    q = (
        counts.writeStream.outputMode("append")
        .format("memory")
        .queryName("late_out")
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 2: one event 3.5h late (t=1.5h < watermark 3h) → dropped;
        # one fresh event advances the stream
        write("b2", [ev(4, 1.5), ev(5, 7.0)])
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        r["bucket"]: r["n"]
        for r in spark.sql("SELECT * FROM late_out").collect()
    }
    h1 = int((base + dt.timedelta(hours=1)).timestamp())
    # the [1h,2h) window closed with ONE event — the late duplicate at
    # t=1.5h from batch 2 must not be counted
    assert got[h1] == 1


def test_streaming_dedup_suppresses_cross_batch_duplicates(spark, tmp_path):
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    d = str(tmp_path / "dup_events")

    def ev(i, minutes):
        return (i, base + dt.timedelta(minutes=minutes), 1, "click", 1.0, "{}")

    def write(rows):
        spark.createDataFrame(rows, sw.EVENT_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(d)

    write([ev(1, 0), ev(2, 1)])
    write([ev(2, 1), ev(3, 2)])  # id 2 re-arrives in a later batch
    stream = sw.read_event_stream(spark, d, max_files=1)
    q = (
        sw.streaming_dedup(stream, ["event_id"])
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    ids = [r["event_id"] for r in spark.sql("SELECT * FROM dedup_out").collect()]
    assert sorted(ids) == [1, 2, 3]  # id 2 exactly once
