"""Streaming sessionization (streaming/sessions.py): the
applyInPandasWithState operator must emit, by end of a drained stream,
exactly the sessions the batch operator (functions/sessionize.py)
computes on the same events — including out-of-order arrivals inside
the watermark delay — and never emit a session twice."""

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pyspark.sql import functions as F

from amundsendatabuilder_spark.functions.sessionize import sessionize_events
from amundsendatabuilder_spark.streaming.sessions import streaming_sessionize

GAP_MIN = 30
SENTINEL_USER = 9999


def _write_chunk(path, rows):
    """rows: list of (event_id, ts_us, user_id, value)."""
    tbl = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "value": pa.array([r[3] for r in rows], pa.float64()),
    })
    pq.write_table(tbl, path)


MIN = 60 * 1_000_000
BASE = 1_700_000_000 * 1_000_000


def _events():
    """Three users, sessions split by >30-min gaps; chunk 2 contains an
    out-of-order event that lands inside user 1's first session."""
    c1 = [
        (1, BASE + 0 * MIN, 1, 1.25),
        (2, BASE + 10 * MIN, 1, 2.50),
        (3, BASE + 5 * MIN, 2, 10.00),
    ]
    c2 = [
        (4, BASE + 20 * MIN, 1, 0.25),   # extends user1 session 1
        (5, BASE + 90 * MIN, 2, 4.75),   # new session for user2 (85-min gap)
        (6, BASE + 15 * MIN, 1, 3.00),   # OUT OF ORDER, inside session 1
    ]
    c3 = [
        (7, BASE + 120 * MIN, 1, 7.00),  # user1 session 2 (100-min gap)
        (8, BASE + 121 * MIN, 3, 0.01),
    ]
    return c1, c2, c3


@pytest.fixture()
def chunk_dir(tmp_path, spark):
    d = tmp_path / "chunks"
    d.mkdir()
    c1, c2, c3 = _events()
    _write_chunk(str(d / "c1.parquet"), c1)
    _write_chunk(str(d / "c2.parquet"), c2)
    _write_chunk(str(d / "c3.parquet"), c3)
    # two sentinel chunks push the watermark far past every real event;
    # the second one is needed because a batch's watermark is computed
    # from the PREVIOUS batch's max event time
    far = BASE + 10_000 * MIN
    _write_chunk(str(d / "c8_sentinel1.parquet"), [(100, far, SENTINEL_USER, 0.0)])
    _write_chunk(str(d / "c9_sentinel2.parquet"), [(101, far + MIN, SENTINEL_USER, 0.0)])
    return str(d)


def test_streaming_matches_batch(spark, tmp_path, chunk_dir):
    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp_ntz, user_id long, value double")
        .option("maxFilesPerTrigger", "1")
        .parquet(chunk_dir)
    )
    sessions = streaming_sessionize(stream, gap_minutes=GAP_MIN,
                                    watermark_delay="10 minutes")
    q = (
        sessions.writeStream.format("memory").queryName("sess_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = {
        (r["user_id"], r["session_seq"]):
            (r["start_us"], r["end_us"], r["n_events"], r["sum_cents"])
        for r in spark.sql(
            f"SELECT * FROM sess_out WHERE user_id != {SENTINEL_USER}"
        ).collect()
    }

    c1, c2, c3 = _events()
    batch = spark.createDataFrame(
        pd.DataFrame(c1 + c2 + c3,
                     columns=["event_id", "ts_us", "user_id", "value"])
    ).select("event_id", F.timestamp_micros(F.col("ts_us")).alias("ts"),
             "user_id", "value")
    exp = {
        (r["user_id"], r["session_seq"]):
            (r["start_us"], r["end_us"], r["n_events"],
             int(r["sum_value"] * 100))
        for r in sessionize_events(batch, gap_minutes=GAP_MIN).collect()
    }
    assert got == exp
    # sanity on the shape itself: user1 has 2 sessions, first sums to 7.00
    assert got[(1, 1)][2] == 4 and got[(1, 1)][3] == 700
    assert got[(1, 2)] == (BASE + 120 * MIN, BASE + 120 * MIN, 1, 700)


def test_streaming_emits_each_session_once(spark, tmp_path, chunk_dir):
    """Restarting the drained query from its checkpoint emits nothing new."""
    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp_ntz, user_id long, value double")
        .parquet(chunk_dir)
    )
    sessions = streaming_sessionize(stream, gap_minutes=GAP_MIN,
                                    watermark_delay="10 minutes")

    out = str(tmp_path / "sess_out")

    def run():
        q = (
            sessions.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / "ckpt2"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        return spark.read.parquet(out).count()

    n1 = run()
    n2 = run()
    assert n1 > 0 and n2 == n1
