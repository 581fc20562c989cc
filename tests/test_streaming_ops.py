"""Structured Streaming operators: watermarked windowed agg + custom
stateful sessionization (applyInPandasWithState)."""

import os
from datetime import datetime, timedelta

from pyspark.sql import functions as F

T0 = datetime(2024, 1, 1, 0, 0, 0)


def _write_events(spark, path, rows, mtime=None):
    """rows: (user_id, event_id, hours_offset_float, event_type) → ONE
    flat parquet file at `path` (streaming file source lists flat files;
    mtime ordering = micro-batch ordering)."""
    import glob
    import shutil
    import tempfile
    df = spark.createDataFrame(
        [(u, e, T0 + timedelta(hours=h), et, 1.0)
         for u, e, h, et in rows],
        "user_id long, event_id long, ts timestamp, event_type string, "
        "value double")
    tmp = tempfile.mkdtemp()
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmp}/d")
    part = glob.glob(f"{tmp}/d/part-*.parquet")[0]
    shutil.move(part, path)
    shutil.rmtree(tmp, ignore_errors=True)
    if mtime is not None:
        os.utime(path, (mtime, mtime))


class TestWindowedStream:
    def test_watermark_finalizes_and_drops_late(self, spark, tmp_path):
        from insurance_pdf_extractor_spark.streaming import (
            windowed_counts_stream)
        landing = str(tmp_path / "landing")
        out = str(tmp_path / "out")
        os.makedirs(landing)
        # file1: hours 0-3 (2 events in hour 0); file2: hours 4-7;
        # file3: hours 8-9 + ONE LATE event back at hour 0
        _write_events(spark, f"{landing}/f1.parquet",
                      [(1, 1, 0.1, "a"), (1, 2, 0.5, "a"), (1, 3, 1.2, "a"),
                       (1, 4, 2.2, "a"), (1, 5, 3.2, "a")],
                      mtime=1700000000)
        _write_events(spark, f"{landing}/f2.parquet",
                      [(1, 6, 4.2, "a"), (1, 7, 5.2, "a"), (1, 8, 6.2, "a"),
                       (1, 9, 7.2, "a")], mtime=1700000001)
        _write_events(spark, f"{landing}/f3.parquet",
                      [(1, 10, 8.2, "a"), (1, 11, 9.2, "a"),
                       (1, 12, 0.7, "a")],  # late: window 0 long finalized
                      mtime=1700000002)

        windowed_counts_stream(spark, landing, out, window="1 hour",
                               watermark="1 hour")
        got = {(r["win_start"], r["n"])
               for r in spark.read.parquet(f"{out}/windowed").collect()}
        e = int(T0.timestamp())
        H = 3600
        # hour-0 window finalized after batch1 with its ON-TIME count (2);
        # the late third event (file3) must NOT be counted
        assert (e, 2) in got
        # the final hour (9) can never finalize (watermark stops at 9.2-1h)
        assert all(ws < e + 9 * H for ws, _ in got)
        # every emitted row matches the on-time per-hour truth
        truth = {e + 0 * H: 2, e + 1 * H: 1, e + 2 * H: 1, e + 3 * H: 1,
                 e + 4 * H: 1, e + 5 * H: 1, e + 6 * H: 1, e + 7 * H: 1,
                 e + 8 * H: 1}
        for ws, n in got:
            assert truth[ws] == n, (ws, n)
        assert len(got) >= 5  # watermark advanced across batches

    def test_checkpoint_resume_appends_nothing(self, spark, tmp_path):
        from insurance_pdf_extractor_spark.streaming import (
            windowed_counts_stream)
        landing = str(tmp_path / "landing")
        out = str(tmp_path / "out")
        os.makedirs(landing)
        _write_events(spark, f"{landing}/f1.parquet",
                      [(1, i, 0.1 * i, "a") for i in range(40)],
                      mtime=1700000000)
        windowed_counts_stream(spark, landing, out)
        n1 = spark.read.parquet(f"{out}/windowed").count()
        windowed_counts_stream(spark, landing, out)  # same files: no-op
        assert spark.read.parquet(f"{out}/windowed").count() == n1


class TestSessionizeStream:
    def test_matches_batch_twin(self, spark, tmp_path):
        from insurance_pdf_extractor_spark.streaming import (
            sessionize_stream)
        landing = str(tmp_path / "landing")
        out = str(tmp_path / "out")
        os.makedirs(landing)
        # user 1: two sessions split by a 2 h gap, second closed by a
        # third burst; user 2: one long session then a gap + trailing
        # (open) session that must NOT be emitted
        rows_f1 = [(1, 1, 0.00, "a"), (1, 2, 0.10, "a"), (1, 3, 0.40, "a"),
                   (2, 4, 0.00, "a"), (2, 5, 0.30, "a")]
        rows_f2 = [(1, 6, 2.50, "a"), (1, 7, 2.60, "a"),
                   (1, 8, 6.00, "a"),
                   (2, 9, 0.60, "a"), (2, 10, 9.00, "a")]
        _write_events(spark, f"{landing}/f1.parquet", rows_f1,
                      mtime=1700000000)
        _write_events(spark, f"{landing}/f2.parquet", rows_f2,
                      mtime=1700000001)

        sessionize_stream(spark, landing, out, gap_s=1800)
        got = {(r["user_id"], r["session_start"], r["session_end"],
                r["n_events"])
               for r in spark.read.parquet(f"{out}/sessions").collect()}

        # batch truth: closed sessions only (a session is closed when a
        # later event of the same user sits > gap after it)
        def hours(h):
            return int((T0 + timedelta(hours=h)).timestamp())
        expected = {
            (1, hours(0.00), hours(0.40), 3),   # closed by the 2.5 h event
            (1, hours(2.50), hours(2.60), 2),   # closed by the 6.0 h event
            (2, hours(0.00), hours(0.60), 3),   # closed by the 9.0 h event
        }
        assert got == expected  # trailing open sessions never emitted


class TestSessionizeLateData:
    def test_late_event_across_batches_is_dropped(self, spark, tmp_path):
        """An event arriving in a LATER file with an EARLIER timestamp
        than the session's last_ts must not regress state (which would
        let the next on-time event falsely close the session). Policy:
        late events are dropped (ADVICE r2)."""
        from insurance_pdf_extractor_spark.streaming import (
            sessionize_stream)
        landing = str(tmp_path / "landing")
        out = str(tmp_path / "out")
        os.makedirs(landing)
        # f1: events at 1.00 h and 1.10 h; f2: LATE event at 0.20 h (must
        # be dropped, NOT open/close a phantom gap), then 1.20 h on-time,
        # then 4.00 h closes the session
        _write_events(spark, f"{landing}/f1.parquet",
                      [(1, 1, 1.00, "a"), (1, 2, 1.10, "a")],
                      mtime=1700000000)
        _write_events(spark, f"{landing}/f2.parquet",
                      [(1, 3, 0.20, "a"), (1, 4, 1.20, "a"),
                       (1, 5, 4.00, "a")],
                      mtime=1700000001)
        sessionize_stream(spark, landing, out, gap_s=1800)
        got = {(r["user_id"], r["session_start"], r["session_end"],
                r["n_events"])
               for r in spark.read.parquet(f"{out}/sessions").collect()}

        def hours(h):
            return int((T0 + timedelta(hours=h)).timestamp())
        # ONE closed session 1.00-1.20 h with 3 events (late 0.20 dropped)
        assert got == {(1, hours(1.00), hours(1.20), 3)}


class TestFoldSessionEvents:
    """Direct unit tests of the pure session fold (incl. the paths a
    streaming harness can't reach deterministically)."""

    def test_fresh_state_single_session(self):
        from insurance_pdf_extractor_spark.streaming import (
            fold_session_events)
        closed, state = fold_session_events([100, 200, 300], None, 1800)
        assert closed == [] and state == (100, 300, 3)

    def test_empty_batch_no_state(self):
        """ADVICE r3: an empty batch with no carried state must not
        crash on the ts[0] sentinel."""
        from insurance_pdf_extractor_spark.streaming import (
            fold_session_events)
        assert fold_session_events([], None, 1800) == ([], None)

    def test_empty_batch_carries_state(self):
        from insurance_pdf_extractor_spark.streaming import (
            fold_session_events)
        assert fold_session_events([], (100, 300, 3), 1800) == \
            ([], (100, 300, 3))

    def test_gap_closes_and_carries(self):
        from insurance_pdf_extractor_spark.streaming import (
            fold_session_events)
        closed, state = fold_session_events([100, 200, 5000], None, 1800)
        assert closed == [(100, 200, 2)] and state == (5000, 5000, 1)

    def test_resumed_state_continues_session(self):
        from insurance_pdf_extractor_spark.streaming import (
            fold_session_events)
        closed, state = fold_session_events([400], (100, 300, 3), 1800)
        assert closed == [] and state == (100, 400, 4)

    def test_late_event_dropped_even_with_resumed_state(self):
        from insurance_pdf_extractor_spark.streaming import (
            fold_session_events)
        # event at 50 < last_ts 300: dropped; on-time 400 extends
        closed, state = fold_session_events([50, 400], (100, 300, 3), 1800)
        assert closed == [] and state == (100, 400, 4)

    def test_multiple_sessions_one_batch(self):
        from insurance_pdf_extractor_spark.streaming import (
            fold_session_events)
        closed, state = fold_session_events(
            [0, 10, 5000, 5010, 99999], None, 1800)
        assert closed == [(0, 10, 2), (5000, 5010, 2)]
        assert state == (99999, 99999, 1)

    def test_fold_invariants(self):
        """Closed sessions are ordered, disjoint by > gap, and counts
        conserve (every non-late event lands in exactly one session)."""
        from hypothesis import given, settings, strategies as st

        from insurance_pdf_extractor_spark.streaming import (
            fold_session_events)

        @given(st.lists(st.integers(0, 100000), min_size=1, max_size=60))
        @settings(max_examples=150, deadline=None)
        def check(raw):
            ts = sorted(raw)
            gap = 500
            closed, (start, last, n) = fold_session_events(ts, None, gap)
            sessions = closed + [(start, last, n)]
            assert sum(s[2] for s in sessions) == len(ts)
            for (s1, e1, _), (s2, _, _) in zip(sessions, sessions[1:]):
                assert s1 <= e1 and s2 - e1 > gap

        check()
