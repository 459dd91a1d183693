"""Streaming equivalence (SURVEY §5.2.4): the streaming windowed
aggregation must agree with its batch twin on every window it emits."""

from __future__ import annotations

import __spark_entry__ as entrymod

QUERIES = entrymod.queries()


def test_stream_tumbling_matches_batch_twin(spark, sf_dir):
    batch = {
        (r["window_start"], r["window_end"], r["event_type"]): (
            r["n_events"],
            r["sum_value"],
        )
        for r in QUERIES["q_window_tumbling"](spark, sf_dir).collect()
    }
    streamed = QUERIES["q_stream_tumbling_watermark"](spark, sf_dir).collect()
    assert len(streamed) > 0, "append mode emitted nothing — watermark never advanced"
    for r in streamed:
        key = (r["window_start"], r["window_end"], r["event_type"])
        assert key in batch, f"streamed window {key} missing from batch result"
        assert (r["n_events"], r["sum_value"]) == batch[key], key


def test_stream_dedup_drops_all_replays(spark, sf_dir):
    rows = QUERIES["q_stream_dedup_stateful"](spark, sf_dir).collect()
    assert len(rows) > 0
    streamed_total = sum(r["n_distinct_events"] for r in rows)
    batch_days = {
        (r["window_start"], r["window_end"]): r["n_events"]
        for r in (
            QUERIES["q_window_tumbling"](spark, sf_dir)
            .groupBy("window_start", "window_end")
            .sum("n_events")
            .withColumnRenamed("sum(n_events)", "n_events")
            .collect()
        )
    }
    # every emitted day's deduped count equals the batch count for that day
    for r in rows:
        for (ws, we), n in batch_days.items():
            if ws == r["window_start"]:
                assert r["n_distinct_events"] == n, ws


def test_stream_session_matches_batch_twin(spark, sf_dir):
    """Every session the stream finalizes (append mode) must exist in
    the batch session-window result with identical bounds and aggregates
    — the merge logic is the same, only emission timing differs."""
    batch = {
        (r["user_id"], r["session_start"], r["session_end"]): (
            r["n_events"],
            r["sum_value"],
        )
        for r in QUERIES["q_window_session"](spark, sf_dir).collect()
    }
    streamed = QUERIES["q_stream_session_window"](spark, sf_dir).collect()
    assert len(streamed) > 0, "append mode emitted no closed sessions"
    for r in streamed:
        key = (r["user_id"], r["session_start"], r["session_end"])
        assert key in batch, f"streamed session {key} missing from batch result"
        assert (r["n_events"], r["sum_value"]) == batch[key], key
