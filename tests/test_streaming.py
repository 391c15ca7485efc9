"""Structured Streaming extraction: micro-batch ingest, exactly-once via
checkpoint, incremental pickup of new files."""
import os

from pyspark.sql import functions as F

from pdfminer_spark.spark.fixtures import build_transcripts
from pdfminer_spark.spark.streaming import extraction_query


def test_streaming_extraction_exactly_once(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    df = build_transcripts(spark, n_convs=4)
    n1 = df.count()
    df.write.mode("append").parquet(in_dir)

    q = extraction_query(spark, in_dir, out_dir, ckpt, page_numbers=[0],
                         available_now=True)
    q.awaitTermination(300)
    got = spark.read.parquet(out_dir)
    assert got.count() == n1
    assert got.filter(F.col("status") != "ok").count() == 0

    # second batch of files: only the new rows are processed
    df2 = build_transcripts(spark, n_convs=3, seed=7)
    n2 = df2.count()
    df2.write.mode("append").parquet(in_dir)
    q = extraction_query(spark, in_dir, out_dir, ckpt, page_numbers=[0],
                         available_now=True)
    q.awaitTermination(300)
    got = spark.read.parquet(out_dir)
    assert got.count() == n1 + n2
    dups = (got.groupBy("conv_id", "turn_idx", "text").count()
            .filter("count > 2").count())
    assert dups == 0


def test_dedup_stream_cross_batch(spark, tmp_path):
    """Cross-micro-batch streaming dedup: a duplicate text arriving in a
    LATER batch is dropped (state carries the seen hashes through the
    checkpoint); distinct texts all pass."""
    from pdfminer_spark.spark.streaming import dedup_stream

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    rows1 = [("c1", 0, "alpha text", "2026-01-01 10:00:00"),
             ("c1", 1, "beta text", "2026-01-01 10:01:00"),
             ("c2", 0, "alpha text", "2026-01-01 10:02:00")]  # in-batch dup
    rows2 = [("c3", 0, "beta text", "2026-01-01 10:03:00"),   # cross-batch dup
             ("c3", 1, "gamma text", "2026-01-01 10:04:00")]

    def _write(rows):
        spark.createDataFrame(
            [(c, t, "user", x, "", ts) for (c, t, x, ts) in rows],
            "conv_id string, turn_idx int, role string, text string, "
            "tool string, ts string").withColumn(
            "ts", F.col("ts").cast("timestamp")
        ).write.mode("append").parquet(in_dir)

    _write(rows1)
    q = dedup_stream(spark, in_dir, out_dir, ckpt, available_now=True)
    q.awaitTermination(300)
    _write(rows2)
    q = dedup_stream(spark, in_dir, out_dir, ckpt, available_now=True)
    q.awaitTermination(300)
    got = sorted((r["conv_id"], r["turn_idx"]) for r in
                 spark.read.parquet(out_dir).collect())
    # one survivor per distinct text: alpha survives once (either copy —
    # within-batch pick is arbitrary), beta once, gamma once
    assert len(got) == 3
    assert ("c1", 0) in got or ("c2", 0) in got   # alpha
    assert ("c1", 1) in got                       # beta, batch 1
    assert ("c3", 0) not in got                   # beta dup CROSS-batch: dropped
    assert ("c3", 1) in got                       # gamma


def test_conversation_progress_stateful(spark, tmp_path):
    """applyInPandasWithState: per-conversation running totals persist
    across micro-batches through the state store."""
    from pdfminer_spark.spark.streaming import conversation_progress_query

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def _write(rows):
        spark.createDataFrame(
            rows, "conv_id string, turn_idx int, role string, text string, "
            "tool string, ts string").withColumn(
            "ts", F.col("ts").cast("timestamp")
        ).write.mode("append").parquet(in_dir)

    _write([("c1", 0, "user", "aaaa", "", "2026-01-01 10:00:00"),
            ("c1", 1, "user", "bb", "", "2026-01-01 10:01:00"),
            ("c2", 0, "user", "ccc", "", "2026-01-01 10:02:00")])
    q = conversation_progress_query(spark, in_dir, out_dir, ckpt,
                                    available_now=True)
    q.awaitTermination(300)
    _write([("c1", 2, "user", "ddddd", "", "2026-01-01 10:03:00")])
    q = conversation_progress_query(spark, in_dir, out_dir, ckpt,
                                    available_now=True)
    q.awaitTermination(300)
    rows = spark.read.parquet(out_dir).collect()
    latest = {}
    for r in rows:
        latest[r["conv_id"]] = max(
            latest.get(r["conv_id"], (0, 0)), (r["n_turns"], r["n_bytes"]))
    assert latest["c1"] == (3, 11)  # 4 + 2 + 5 bytes over two batches
    assert latest["c2"] == (1, 3)


def test_turn_rate_watermarked_window_drops_late(spark, tmp_path):
    """Watermarked event-time aggregation: a window finalizes (and emits,
    append mode) only once the watermark passes it, and a row arriving
    after that is DROPPED — state stays bounded at 10^12-turn scale
    because closed windows never reopen."""
    import datetime as dt

    import pandas as pd

    from pdfminer_spark.spark.streaming import turn_rate_query

    (tmp_path / "in").mkdir()
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def rows(ts_list, conv="conv-a"):
        return pd.DataFrame({
            "conv_id": [conv] * len(ts_list),
            "turn_idx": list(range(len(ts_list))),
            "role": ["user"] * len(ts_list),
            "text": ["t"] * len(ts_list),
            "tool": [""] * len(ts_list),
            "ts": pd.Series([dt.datetime(2026, 1, 1) + t for t in ts_list]
                            ).astype("datetime64[us]"),
        })

    m = dt.timedelta
    # batch 1: three turns in the 10:00-10:10 window, then one at 12:00
    # that pushes the watermark (30 min) past that window's end
    rows([m(hours=10, minutes=1), m(hours=10, minutes=4),
          m(hours=10, minutes=8), m(hours=12)]).to_parquet(
        f"{in_dir}/b1.parquet")
    q = turn_rate_query(spark, in_dir, out_dir, ckpt, available_now=True)
    q.awaitTermination(300)

    # batch 2: a LATE row for the closed 10:00 window + a fresh 12:05 row
    rows([m(hours=10, minutes=5), m(hours=12, minutes=5)],
         conv="conv-a").to_parquet(f"{in_dir}/b2.parquet")
    q = turn_rate_query(spark, in_dir, out_dir, ckpt, available_now=True)
    q.awaitTermination(300)

    out = spark.read.parquet(out_dir).collect()
    by_window = {(r["window_start"].hour, r["conv_id"]): r["n_turns"]
                 for r in out}
    # the 10:00 window emitted exactly once with the ON-TIME count (3);
    # the late 10:05 row was dropped, the 12:00 window is still open
    assert by_window == {(10, "conv-a"): 3}


def test_turn_merge_stateful_segments(spark, tmp_path):
    """Streaming cues_to_turns: consecutive same-role turns merge into
    segments across micro-batch boundaries; a role change closes the
    open segment, which emits exactly once."""
    from pdfminer_spark.spark.streaming import turn_merge_query

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def _write(rows):
        spark.createDataFrame(
            rows, "conv_id string, turn_idx int, role string, text string, "
            "tool string, ts string").withColumn(
            "ts", F.col("ts").cast("timestamp")
        ).write.mode("append").parquet(in_dir)

    # batch 1: u,u,a -> the u-run closes when 'a' arrives; 'a' stays open
    _write([("c1", 0, "user", "t0", "", "2026-01-01 10:00:00"),
            ("c1", 1, "user", "t1", "", "2026-01-01 10:01:00"),
            ("c1", 2, "assistant", "t2", "", "2026-01-01 10:02:00")])
    q = turn_merge_query(spark, in_dir, out_dir, ckpt, available_now=True)
    q.awaitTermination(300)
    # batch 2: 'a' extends the open segment from state, then 'u' closes it
    _write([("c1", 3, "assistant", "t3", "", "2026-01-01 10:03:00"),
            ("c1", 4, "user", "t4", "", "2026-01-01 10:04:00")])
    q = turn_merge_query(spark, in_dir, out_dir, ckpt, available_now=True)
    q.awaitTermination(300)

    rows = sorted(spark.read.parquet(out_dir).collect(),
                  key=lambda r: r["seg_start_turn"])
    segs = [(r["seg_start_turn"], r["n_turns"], r["role"], r["text"])
            for r in rows]
    assert segs == [(0, 2, "user", "t0 t1"),
                    (2, 2, "assistant", "t2 t3")]
    # the trailing (4, user) segment is still open in state — not emitted
