"""Event sessionization — the log-analytics primitive a training-data
pipeline runs over interaction/telemetry streams (and the canonical
stateful-streaming example: SURVEY §2.10's custom-stateful-operator
slot).

Two implementations with one contract:

* ``sessionize`` (batch): pure window functions — the 30-minute-gap
  rule as lag + cumulative sum over (user, ts). ONE exchange on
  user_id serves both windows and the final per-session aggregate
  (they partition on the same key), and sessions never span users, so
  there is no cross-partition state. SQL-expressible → value-hash
  oracle.
* ``sessionize_stream`` (streaming): the same rule as an
  ``applyInPandasWithState`` stateful operator over a micro-batched
  stream — per-user GroupState carries (open-session start, last ts,
  count, value sum) across batches; a session closes when the state
  times out or a gap-exceeding event arrives. Pytest-gated against the
  batch operator on identical data (streaming == batch is the
  correctness contract, mirroring the ingest family's merge test).

Session identity is deterministic: session_id = md5(user_id ':' first
event ts) — both engines format epoch micros identically via casting
to bigint microseconds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

GAP_SECONDS_DEFAULT = 1800


def sessionize(
    events: DataFrame,
    gap_seconds: int = GAP_SECONDS_DEFAULT,
) -> DataFrame:
    """(user_id, session_id, session_start, session_end, n_events,
    total_value): split each user's event sequence at gaps >
    ``gap_seconds``.

    Scale shape: one hash exchange on user_id; the two windows (lag,
    running sum) and the groupBy all partition on it, so Catalyst
    plans a single Exchange reused across the three operators. A
    pathological single-user firehose is bounded by the sort within
    its partition — at 100 TB, pre-bucketing the event table by
    user_id (same bucket_expr discipline as the SPO tables) makes
    this exchange-free entirely.
    """
    w_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # exact integer micros (unix_micros / DuckDB epoch_us) — a float
    # seconds round-trip differs between engines at sub-second edges
    mics = F.unix_micros(F.col("ts").cast("timestamp"))
    # events.ts is TIMESTAMP_NTZ; the session tz is pinned to UTC
    # (session.py), so this cast is the exact naive-as-UTC reading
    # DuckDB epoch_us() uses
    gap = mics - F.lag(mics).over(w_user)
    marked = events.withColumn(
        "_new_session",
        F.when(
            gap.isNull() | (gap > gap_seconds * 1_000_000), F.lit(1)
        ).otherwise(F.lit(0)),
    )
    numbered = marked.withColumn(
        "_session_no",
        F.sum("_new_session").over(
            w_user.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        numbered.groupBy("user_id", "_session_no")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select(
            "user_id",
            F.md5(
                F.concat_ws(
                    ":",
                    F.col("user_id").cast("string"),
                    # exact epoch micros (unix_micros), NOT a float
                    # round-trip — µs drift would break the md5 oracle
                    F.unix_micros(F.col("session_start").cast("timestamp")).cast("string"),
                )
            ).alias("session_id"),
            "session_start",
            "session_end",
            "n_events",
            "total_value",
        )
    )


SESSION_OUT_SCHEMA = (
    "user_id bigint, session_id string, session_start timestamp, "
    "session_end timestamp, n_events bigint, total_value double"
)
_STATE_SCHEMA = "start_us long, last_us long, n long, total double"


def sessionize_stream(
    spark,
    landing_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    gap_seconds: int = GAP_SECONDS_DEFAULT,
    max_files_per_trigger: int = 1,
) -> None:
    """The same gap rule as ``sessionize``, as an
    ``applyInPandasWithState`` stateful streaming operator: per-user
    GroupState carries the open session (start, last ts, count, sum)
    across micro-batches; a session is emitted when a gap-exceeding
    event CLOSES it, so each user's final session stays open in state
    (exactly-once emission of closed sessions). State is O(users), not
    O(events) — the property that makes an unbounded click stream
    sessionizable.

    Correctness contract: on the same data, the emitted rows must
    equal the batch ``sessionize`` output minus each user's last
    (still-open) session — pytest-gated with a two-pass replay
    (test_entry_and_streaming). Arrow-batched; the per-event Python
    loop runs on the few events of one user in one batch, never the
    corpus."""
    import hashlib

    import pandas as pd

    from openie_backend_spark.streaming.windows import EVENTS_SCHEMA

    gap_us = gap_seconds * 1_000_000

    def update(key, pdf_iter, state):
        user = key[0]
        frames = [p for p in pdf_iter if len(p)]
        if not frames:
            return
        rows = pd.concat(frames).sort_values(["ts", "event_id"])
        if state.exists:
            start_us, last_us, n, total = state.get
        else:
            start_us = last_us = None
            n, total = 0, 0.0
        closed = []
        for ts, val in zip(rows["ts"], rows["value"]):
            us = int(ts.value // 1000)
            if start_us is None:
                start_us, last_us, n, total = us, us, 1, float(val)
            elif us - last_us > gap_us:
                closed.append((start_us, last_us, n, total))
                start_us, last_us, n, total = us, us, 1, float(val)
            else:
                last_us, n, total = us, n + 1, total + float(val)
        state.update((int(start_us), int(last_us), int(n), float(total)))
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user] * len(closed),
                    "session_id": [
                        hashlib.md5(f"{user}:{s}".encode()).hexdigest()
                        for s, _, _, _ in closed
                    ],
                    "session_start": [
                        pd.Timestamp(s, unit="us") for s, _, _, _ in closed
                    ],
                    "session_end": [
                        pd.Timestamp(e, unit="us") for _, e, _, _ in closed
                    ],
                    "n_events": [c for _, _, c, _ in closed],
                    "total_value": [round(t, 6) for _, _, _, t in closed],
                }
            )

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(landing_dir)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=SESSION_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf="NoTimeout",
        )
    )
    q = (
        stream.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
