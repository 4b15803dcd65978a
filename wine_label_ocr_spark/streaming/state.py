"""Stateful stream program — the turntable guidance loop re-expressed.

The reference runs a genuine per-key stateful stream program
(``Char_Count_TurnTable.py:129-361``): EMA-smoothed counter (α=0.25),
5 s sliding stats window, running peak with bump threshold, a phase
machine (SCAN → SEEK → LOCKED) with unlock margin + dwell timer, and an
exactly-once capture per lock. SURVEY.md §2.10 maps these to ST1-ST8.

Spark restatement:

* the recursive state (EMA, peak, phase) is not frame-window expressible
  (W4) → ``applyInPandasWithState`` keyed by session/user id;
* the *batch twin* (``ema_phase_batch``) runs the exact same per-key
  kernel via ``applyInPandas`` over ts-sorted groups — tests assert the
  stream and batch paths produce identical traces, which is what makes
  the stream program oracle-checkable;
* cadence (ST1) maps to ``trigger(processingTime=...)`` /
  ``availableNow``; the bounded-queue drop (ST8) maps to
  ``maxFilesPerTrigger`` backpressure;
* the exactly-once capture flag (ST7) is state-deduped: it fires on the
  SCAN/SEEK→LOCKED edge only.

Constants pinned from the reference (Char_Count_TurnTable.py:20-46).
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

ALPHA = 0.25            # EMA smoothing, Char_Count_TurnTable.py:23
WINDOW_SEC = 5.0        # stats window, :24
DROP_TO_START = 5.0     # peak→seek drop, :38
PEAK_BUMP_MIN = 1.0     # running-peak bump threshold, :40
UNLOCK_MARGIN = 3.0     # locked band margin, :41
UNLOCK_DWELL = 0.6      # seconds below band before unlock, :42

PHASES = ("SCAN", "SEEK", "LOCKED")

STATE_DDL = ("ema double, peak double, phase string, below_since double, "
             "captured boolean")
OUTPUT_DDL = ("user_id bigint, event_id bigint, ts timestamp, value double, "
              "ema double, peak double, phase string, capture boolean")


def _step(state: dict[str, Any], ts_sec: float, value: float) -> tuple[dict, bool]:
    """One event through the phase machine. Returns (new_state, capture)."""
    ema = value if state["ema"] is None else ALPHA * value + (1 - ALPHA) * state["ema"]
    peak = state["peak"]
    phase = state["phase"]
    below_since = state["below_since"]
    capture = False

    if peak is None or ema > peak + PEAK_BUMP_MIN:
        peak = ema if peak is None or ema > peak else peak
    if phase == "SCAN":
        if peak is not None and ema <= peak - DROP_TO_START:
            phase = "SEEK"
    elif phase == "SEEK":
        if peak is not None and ema >= peak - UNLOCK_MARGIN:
            phase = "LOCKED"
            below_since = None
            if not state["captured"]:
                capture = True      # ST7: once per first lock
    elif phase == "LOCKED":
        if peak is not None and ema < peak - UNLOCK_MARGIN:
            if below_since is None:
                below_since = ts_sec
            elif ts_sec - below_since >= UNLOCK_DWELL:
                phase = "SEEK"
                below_since = None
        else:
            below_since = None

    return ({"ema": ema, "peak": peak, "phase": phase,
             "below_since": below_since,
             "captured": state["captured"] or capture}, capture)


def _fresh_state() -> dict[str, Any]:
    return {"ema": None, "peak": None, "phase": "SCAN",
            "below_since": None, "captured": False}


def _run_kernel(pdf: pd.DataFrame, state: dict[str, Any]) -> tuple[pd.DataFrame, dict]:
    """Shared kernel: ts-sorted events × state → output trace + final state.

    Inner loop is ``_step`` inlined over pre-extracted numpy columns —
    float ops stay in the exact sequential order of ``_step`` (bit-identical
    results; the DuckDB EMA oracle folds the same way), but the per-row
    pandas itertuples/dict overhead is gone (~4× on the sf0.1 bench).
    """
    pdf = pdf.sort_values(["ts", "event_id"])
    ts_secs = pdf["ts"].to_numpy(dtype="datetime64[ns]").astype("int64") / 1e9
    values = pdf["value"].to_numpy(dtype="float64")
    ema, peak = state["ema"], state["peak"]
    phase, below_since = state["phase"], state["below_since"]
    captured = state["captured"]
    n = len(values)
    emas = [0.0] * n
    peaks = [0.0] * n
    phases = [""] * n
    captures = [False] * n
    for i in range(n):
        value = values[i]
        ema = value if ema is None else ALPHA * value + (1 - ALPHA) * ema
        capture = False
        if peak is None or ema > peak + PEAK_BUMP_MIN:
            if peak is None or ema > peak:
                peak = ema
        if phase == "SCAN":
            if peak is not None and ema <= peak - DROP_TO_START:
                phase = "SEEK"
        elif phase == "SEEK":
            if peak is not None and ema >= peak - UNLOCK_MARGIN:
                phase = "LOCKED"
                below_since = None
                if not captured:
                    capture = True      # ST7: once per first lock
                    captured = True
        else:  # LOCKED
            if peak is not None and ema < peak - UNLOCK_MARGIN:
                ts_sec = ts_secs[i]
                if below_since is None:
                    below_since = ts_sec
                elif ts_sec - below_since >= UNLOCK_DWELL:
                    phase = "SEEK"
                    below_since = None
            else:
                below_since = None
        emas[i] = ema
        peaks[i] = peak
        phases[i] = phase
        captures[i] = capture
    out = pd.DataFrame({
        "user_id": pdf["user_id"].to_numpy(), "event_id": pdf["event_id"].to_numpy(),
        "ts": pdf["ts"].to_numpy(), "value": values,
        "ema": emas, "peak": peaks, "phase": phases, "capture": captures})
    return out, {"ema": ema, "peak": peak, "phase": phase,
                 "below_since": below_since, "captured": captured}


def ema_phase_batch(events: DataFrame, n_partitions: int | None = None) -> DataFrame:
    """Batch twin: per-key kernel over full history via applyInPandas.

    The groupBy is fed by an EXPLICIT hash repartition on user_id: AQE's
    byte-based coalescing sees a few MB of shuffle data and merges the
    Python-kernel stage down to 1-2 tasks, serializing the CPU-bound work;
    a user-specified partition count is exempt from coalescing. groupBy on
    the same key reuses the exchange, so this adds no extra shuffle.
    """
    ev = events.select("user_id", "event_id", "ts", "value")
    n = n_partitions or max(
        events.sparkSession.sparkContext.defaultParallelism * 2, 16)
    return (ev.repartition(n, "user_id")
            .groupBy("user_id").applyInPandas(
                lambda pdf: _run_kernel(pdf, _fresh_state())[0],
                schema=OUTPUT_DDL))


def ema_final_by_key(events: DataFrame,
                     n_partitions: int | None = None) -> DataFrame:
    """Final EMA per user — the ``ema_final`` fast path.

    The EMA recursion is independent of the peak/phase state, so the
    final-value query does not need the full kernel or its per-group
    ``applyInPandas`` call overhead (~15k Python calls + pandas frames at
    sf1.0). One ``mapInPandas`` per partition: concatenate the partition's
    batches (every user's rows are co-located by the explicit hash
    repartition), sort by (user_id, ts, event_id), then fold the EMA for
    ALL users simultaneously — step j updates every group with > j rows
    via one vectorized ``0.25*x + 0.75*ema`` (two IEEE multiplies + one
    add per element, the exact op sequence of ``_run_kernel``'s scalar
    loop, so results are bit-identical — pinned by tests). Emits one row
    per user.
    """
    import numpy as np

    ev = events.select("user_id", "event_id", "ts", "value")
    n = n_partitions or max(
        events.sparkSession.sparkContext.defaultParallelism * 2, 16)

    def kernel(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        parts = [p for p in batches if len(p)]
        if not parts:
            return
        pdf = parts[0] if len(parts) == 1 else pd.concat(parts,
                                                         ignore_index=True)
        pdf = pdf.sort_values(["user_id", "ts", "event_id"])
        u = pdf["user_id"].to_numpy()
        v = pdf["value"].to_numpy(dtype="float64")
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        ends = np.r_[starts[1:], len(u)]
        lens = ends - starts
        ema = v[starts].copy()          # first event: ema = value
        # skew guard: a group far longer than the rest would turn the
        # step loop into per-row vector calls — fold those scalar instead
        # (same op order either way)
        long_cut = 512
        for gi in np.flatnonzero(lens > long_cut):
            e = v[starts[gi]]
            for x in v[starts[gi] + 1:ends[gi]]:
                e = ALPHA * x + (1 - ALPHA) * e
            ema[gi] = e
        alive = (lens > 1) & (lens <= long_cut)
        j = 1
        while alive.any():
            idx = starts[alive] + j
            ema[alive] = ALPHA * v[idx] + (1 - ALPHA) * ema[alive]
            j += 1
            alive = alive & (lens > j)
        yield pd.DataFrame({"user_id": u[starts], "ema_final": ema})

    return (ev.repartition(n, "user_id")
            .mapInPandas(kernel, schema="user_id bigint, ema_final double"))


def _stateful_fn(key: tuple, pdfs: Iterable[pd.DataFrame],
                 state: GroupState) -> Iterator[pd.DataFrame]:
    if state.exists:
        ema, peak, phase, below_since, captured = state.get
        st = {"ema": ema, "peak": peak, "phase": phase,
              "below_since": below_since, "captured": captured}
    else:
        st = _fresh_state()
    for pdf in pdfs:
        out, st = _run_kernel(pdf, st)
        yield out
    state.update((st["ema"], st["peak"], st["phase"],
                  st["below_since"], st["captured"]))


def ema_phase_stream(events_stream: DataFrame) -> DataFrame:
    """Streaming form: identical kernel under applyInPandasWithState.

    ``events_stream`` must be a streaming DataFrame with
    (user_id, event_id, ts, value). Within-batch order is handled by the
    kernel's ts sort; cross-batch order relies on source ordering per key
    (watermark + sorting sink for true event-time ordering at scale).
    """
    return (events_stream.select("user_id", "event_id", "ts", "value")
            .groupBy("user_id")
            .applyInPandasWithState(
                _stateful_fn,
                outputStructType=OUTPUT_DDL,
                stateStructType=STATE_DDL,
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout))


def synthetic_frames_stream(spark, rows_per_second: int = 30,
                            n_users: int = 4) -> DataFrame:
    """S6/S7 — device/webcam source analog: the Structured Streaming rate
    source emitting frames at a fixed FPS, standing in for the reference's
    DepthAI 30 FPS bounded-queue loop (QRCodeScanner.py:34-57) and
    cv2.VideoCapture poll (Char_Count_TurnTable.py:135-139). The rate cap
    IS the backpressure bound — frames never arrive faster than the
    configured cadence, the maxSize=4 queue-drop analog. ``value`` is a
    deterministic wave of the frame index, so the phase machine downstream
    has structure to lock onto."""
    r = (spark.readStream.format("rate")
         .option("rowsPerSecond", rows_per_second).load())
    return r.select(
        (F.col("value") % n_users).cast("bigint").alias("user_id"),
        F.col("value").alias("event_id"),
        F.col("timestamp").alias("ts"),
        (F.lit(20.0) + F.lit(10.0)
         * F.sin(F.col("value").cast("double") / 7.0)).alias("value"))


def windowed_counts_stream(events_stream: DataFrame,
                           watermark: str = "10 seconds",
                           window: str = "5 seconds") -> DataFrame:
    """ST2/ST8 — event-time sliding stats with late-data handling.

    The reference's 5 s ring buffer with eviction
    (Char_Count_TurnTable.py:82-94) + stale-frame drops
    (QRCodeScanner.py:77-78) restated as the canonical Structured
    Streaming form: watermark bounds state and drops events later than
    the watermark; windows finalize and emit once complete (append mode).
    """
    return (events_stream
            .withWatermark("ts", watermark)
            .groupBy(F.window("ts", window), F.col("user_id"))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.max("value") - F.min("value"), 6).alias("spread")))


def sliding_spread_stream(events_stream: DataFrame,
                          watermark: str = "10 seconds",
                          window: str = "5 seconds",
                          slide: str = "1 second") -> DataFrame:
    """ST2 streaming-native form — event-time SLIDING stats window with
    watermark eviction (the reference's 5 s ring buffer re-evaluated on
    every frame, Char_Count_TurnTable.py:82-94): each event lands in
    window/slide overlapping windows; a window finalizes (append mode)
    once the watermark passes its end, which is exactly the ring
    buffer's eviction horizon. ``sliding_spread_batch`` is the
    identical aggregation in batch — stream≡batch is pytest-pinned
    (the ``sessionize_stream`` pattern)."""
    return (events_stream
            .withWatermark("ts", watermark)
            .groupBy(F.window("ts", window, slide), F.col("user_id"))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.max("value") - F.min("value"), 6).alias("spread")))


def sliding_spread_batch(events: DataFrame,
                         window: str = "5 seconds",
                         slide: str = "1 second") -> DataFrame:
    """Batch twin of ``sliding_spread_stream`` — same F.window sliding
    assignment and aggregates, no watermark (batch sees everything)."""
    return (events
            .withColumn("ts", F.col("ts").cast("timestamp"))
            .groupBy(F.window("ts", window, slide), F.col("user_id"))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.max("value") - F.min("value"), 6).alias("spread")))


SESSION_STATE_DDL = "last_ts double, session_seq int"
SESSION_OUT_DDL = ("user_id bigint, event_id bigint, ts timestamp, "
                   "session_seq int")


def sessionize_stream(events_stream: DataFrame, gap_sec: float = 60.0,
                      idle_evict_sec: float = 3600.0) -> DataFrame:
    """ST6 streaming twin of ``sessionize``: per-key (last_ts, seq) state
    under applyInPandasWithState, identical gap logic to the batch window
    form (tests assert trace equality). State for users idle longer than
    ``idle_evict_sec`` of PROCESSING time is evicted via the state timeout
    — the next event simply starts a new session, which the gap rule would
    have decreed anyway, so eviction bounds state without changing
    results (for idle_evict_sec ≥ gap_sec)."""
    gap_ms = gap_sec * 1000.0

    def fn(key: tuple, pdfs: Iterable[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        last_ts, seq = state.get if state.exists else (None, 0)
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            # integer-ms truncation matches the batch twin's unix_millis
            # (a float /1e6 would carry sub-ms and flip exact-gap edges)
            ts_ms = (pdf["ts"].to_numpy(dtype="datetime64[ns]")
                     .astype("int64") // 1_000_000).astype("float64")
            seqs = [0] * len(pdf)
            for i, t in enumerate(ts_ms):
                if last_ts is None or t - last_ts > gap_ms:
                    seq += 1
                last_ts = t
                seqs[i] = seq
            yield pd.DataFrame({
                "user_id": pdf["user_id"].to_numpy(),
                "event_id": pdf["event_id"].to_numpy(),
                "ts": pdf["ts"].to_numpy(), "session_seq": seqs})
        state.update((last_ts, seq))
        state.setTimeoutDuration(int(idle_evict_sec * 1000))

    return (events_stream.select("user_id", "event_id", "ts", "value")
            .groupBy("user_id")
            .applyInPandasWithState(
                fn,
                outputStructType=SESSION_OUT_DDL,
                stateStructType=SESSION_STATE_DDL,
                outputMode="append",
                timeoutConf=GroupStateTimeout.ProcessingTimeTimeout))


def interval_join_stream(left: DataFrame, right: DataFrame,
                         key: str = "user_id", bound_sec: float = 5.0,
                         watermark: str = "30 seconds") -> DataFrame:
    """Stream-stream interval join: match left/right events of the same key
    within ±bound_sec of event time. Watermarks on BOTH sides bound the
    join state (Spark buffers only rows younger than watermark+bound);
    without them state grows forever. The streaming analog of the
    reference correlating two concurrent captures of the same object
    (Photo_Stitch front/back views) — and the batch twin is the identical
    join condition, which tests assert.
    """
    # watermarks require TIMESTAMP (not NTZ); session tz is UTC → lossless
    l = (left.withColumn("ts", F.col("ts").cast("timestamp"))
         .withWatermark("ts", watermark).alias("l"))
    r = (right.withColumn("ts", F.col("ts").cast("timestamp"))
         .withWatermark("ts", watermark).alias("r"))
    cond = ((F.col(f"l.{key}") == F.col(f"r.{key}"))
            & (F.col("r.ts") >= F.col("l.ts")
               - F.expr(f"INTERVAL {bound_sec} SECONDS"))
            & (F.col("r.ts") <= F.col("l.ts")
               + F.expr(f"INTERVAL {bound_sec} SECONDS")))
    return l.join(r, cond).select(
        F.col(f"l.{key}").alias(key),
        F.col("l.event_id").alias("left_id"),
        F.col("r.event_id").alias("right_id"),
        F.col("l.ts").alias("left_ts"),
        F.col("r.ts").alias("right_ts"))


def sessionize(events: DataFrame, gap_sec: float = 60.0) -> DataFrame:
    """ST6 — session boundaries from inactivity gaps (batch analog of the
    absent-debounce session counter, Char_Count_TurnTable.py:141-185).

    Native windows only: a new session starts where the gap to the
    previous event exceeds ``gap_sec``; session_id is the running count of
    starts. One shuffle on user_id.
    """
    from pyspark.sql import Window as W
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_millis(F.col("ts").cast("timestamp")) - F.lag(
        F.unix_millis(F.col("ts").cast("timestamp"))).over(w)
    start = F.when(gap.isNull() | (gap > gap_sec * 1000), 1).otherwise(0)
    return (events
            .withColumn("session_seq",
                        F.sum(start).over(w.rowsBetween(W.unboundedPreceding, 0))
                        .cast("int")))
