"""Arbitrary stateful streaming (SURVEY.md §2.9 row 63, streaming twin).

The batch-equivalent cumulative window lives in transforms.running_user_
counters (exact DuckDB oracle); this module is the true streaming form:
per-key mutable state under ``applyInPandasWithState`` — the engine-side
generalization of the reference's per-container in-memory state machine
(start/die lifecycle tracking in [pub:muswarmlogger/loggers/docker.py]).

Scale: state lives in the state store (one entry per user), shuffled once on
the grouping key per micro-batch; Arrow-batched transfer to Python, never
row-at-a-time.

API note: Spark 4's successor API (``transformWithStateInPandas`` +
``StatefulProcessor``) was probed and requires the ``protobuf`` Python
package for its state-server protocol, which this environment does not ship
(and installs are off-limits) — ``applyInPandasWithState`` is the supported
stateful surface here and carries identical semantics for this operator.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..core.tables import observed_time

OUTPUT_SCHEMA = (
    "event_id long, user_id long, ts timestamp, n_so_far long, value_so_far double"
)
# v2 (r11): + has_total — the hostile-replay gate caught the fold
# NaN-POISONING itself on the first NULL event value (pandas renders the
# null as NaN; `total += nan` is nan forever), where the batch twin's
# windowed SUM skips nulls and is NULL until the first observed value.
# The declared two-sided policy is SUM's: skip null values, emit NULL
# while nothing has been observed.  Schema widening invalidates v1
# checkpoints — the BURST_STATE_VERSION upgrade contract applies.
STATE_SCHEMA = "n long, total double, has_total integer"
# State-schema version for long-lived deployments (r11 ADVICE): the r11
# NaN-poisoning fix widened the state tuple 2 -> 3 fields (has_total), a
# state-store INCOMPATIBILITY under applyInPandasWithState (no migration
# hook) — a stream resumed from a v1 checkpoint dies at state restore.
# Same upgrade contract as BURST_STATE_VERSION below: the version rides
# the checkpoint path (COUNTER_CKPT_PREFIX), so an upgraded job starts a
# fresh lineage instead of dying.  Bump on ANY change to STATE_SCHEMA.
COUNTER_STATE_VERSION = 2
COUNTER_CKPT_PREFIX = f"spark_graft_counterckpt_v{COUNTER_STATE_VERSION}_"


def _accumulate(key: tuple, pdf_iter: Iterator[pd.DataFrame],
                state: GroupState) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, total, has_total = state.get if state.exists else (0, 0.0, 0)
    out: list[dict[str, Any]] = []
    # Concatenate chunks before sorting: pdf_iter may yield several Arrow
    # slices per micro-batch, and per-slice sorting would accumulate in
    # chunk order, not (ts, event_id) order (same fix as _mg_update).
    pdfs = [p for p in pdf_iter if len(p)]
    if pdfs:
        whole = pd.concat(pdfs, ignore_index=True)
        for row in whole.sort_values(["ts", "event_id"]).itertuples(
                index=False):
            n += 1
            # Measure-domain gate (class L, mirrors the batch twin's
            # measure()): a true +Inf in a parquet double is NOT NaN and
            # passes pd.notna, then `total += inf` poisons the state
            # forever — the same failure shape the r11 NULL fix closed.
            # abs(v) < 1e21 is False for NaN in Python too, so one
            # predicate covers NaN/±Inf/magnitude garbage identically
            # across Python, Spark, and DuckDB.
            if pd.notna(row.value) and abs(float(row.value)) < 1e21:
                total += float(row.value)
                has_total = 1
            out.append({
                "event_id": row.event_id, "user_id": user_id, "ts": row.ts,
                "n_so_far": n,
                "value_so_far": total if has_total else None,
            })
    state.update((n, total, has_total))
    yield pd.DataFrame(out, columns=[
        "event_id", "user_id", "ts", "n_so_far", "value_so_far",
    ])


def running_user_counters_stateful(events: DataFrame) -> DataFrame:
    """Streaming per-user running counters: emits one row per input event
    carrying the cumulative (count, value-total) at that event.  Applied to
    a batch DataFrame this degenerates to a single "micro-batch", so batch
    output == first-trigger streaming output — tests exploit that, then
    replay multi-batch and assert state carries across triggers."""
    # class I (observed-time policy, core/tables.py): a pandas fold
    # reading NaT.value gets int64-min garbage — unstamped events are
    # filtered at the operator, identically to the batch twin.
    return observed_time(events).groupBy("user_id").applyInPandasWithState(
        _accumulate,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


MG_OUT_SCHEMA = "shard long, item long, est long"
MG_STATE_SCHEMA = "items array<long>, counts array<long>"

# Sentinel item in every emitted snapshot (real items are nonnegative
# user_ids).  A batch whose fold DECREMENTS a shard's counters to empty
# would otherwise emit ZERO rows — indistinguishable downstream from "this
# batch didn't touch the shard", so the latest-snapshot consumer would
# resurrect a stale earlier snapshot (caught by round-6 code review; the
# test fixture alone never fills its counters, so replay couldn't see it).
# The sentinel makes every touched-shard snapshot non-empty; merges filter
# it out.
MG_SNAPSHOT_SENTINEL = -1


def _mg_update(key: tuple, pdf_iter: Iterator[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
    """Misra-Gries counter update for one shard across a micro-batch:
    restore the k-counter map from state, fold the batch's items in
    (ts, event_id) order, persist, emit the shard's summary snapshot
    (always ≥1 row — see MG_SNAPSHOT_SENTINEL)."""
    from ..operators.sketches import MG_COUNTERS

    (shard,) = key
    if state.exists:
        items, counts = state.get
        counters = dict(zip(list(items), list(counts)))
    else:
        counters = {}
    # Concatenate the group's Arrow chunks BEFORE sorting: pdf_iter may
    # yield several slices per micro-batch, and sorting each slice alone
    # would fold items in chunk order, not (ts, event_id) order — the MG
    # error bound would survive but the fold-order equality with the
    # batch sketch (asserted by the replay test) would not.  Memory is
    # one shard's share of one micro-batch — bounded by trigger sizing,
    # not by stream history.
    pdfs = [p for p in pdf_iter if len(p)]
    if pdfs:
        whole = pd.concat(pdfs, ignore_index=True)
        for item in whole.sort_values(["ts", "event_id"])["item"]:
            item = int(item)
            if item in counters:
                counters[item] += 1
            elif len(counters) < MG_COUNTERS:
                counters[item] = 1
            else:
                counters = {i: c - 1 for i, c in counters.items() if c > 1}
    state.update((list(counters), list(counters.values())))
    yield pd.DataFrame({
        "shard": shard,
        "item": [MG_SNAPSHOT_SENTINEL] + list(counters),
        "est": [0] + list(counters.values()),
    })


def mg_sketch_stateful(events: DataFrame) -> DataFrame:
    """Streaming sharded Misra-Gries: per-shard k-counter state carried
    across micro-batches; each batch emits the updated shards' summary
    snapshots (update semantics — downstream keeps a shard's LATEST
    snapshot).  The shard key is a DATA hash of event_id (deterministic
    under any file layout), so the state shuffle per batch moves batch
    rows once and the state store holds O(k) longs per shard — the
    sketch, not the stream, is the memory bound at any scale."""
    from pyspark.sql import functions as F

    from ..operators.sketches import MG_SHARDS

    # class G: heavy hitters over IDENTIFIED items — a NULL user_id
    # arrives in the pandas fold as NaN and crashes the integer counter
    # (and NaN != NaN would split its counts anyway).
    keyed = observed_time(events).filter(
        F.col("user_id").isNotNull()).select(  # class G + class I
        F.pmod(F.xxhash64("event_id"), F.lit(MG_SHARDS)).alias("shard"),
        "event_id", "ts", F.col("user_id").alias("item"),
    )
    return keyed.groupBy("shard").applyInPandasWithState(
        _mg_update,
        outputStructType=MG_OUT_SCHEMA,
        stateStructType=MG_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


HOLT_OUT_SCHEMA = ("event_type string, l double, b double, n_complete long, "
                   "pending_hour long, pending_n long")
HOLT_STATE_SCHEMA = ("l double, b double, n_complete long, "
                     "pending_hour long, pending_n long")
_NS_PER_HOUR = 3_600_000_000_000


def _holt_update(key: tuple, pdf_iter, state: GroupState):
    """Holt level+trend state for one event type across a micro-batch.

    The recurrence folds COMPLETE hours in event-time order, so the state
    carries the current (not yet closed) hour as (pending_hour,
    pending_n) alongside the smoothed (l, b): rows for the pending hour
    increment its count (an hour may straddle micro-batch boundaries); a
    row in a LATER hour closes the pending one — folding its count with
    the exact recurrence q_ts_holt_trend uses (Python doubles are the
    same IEEE ops, so the fold is bit-identical to the JVM/DuckDB one) —
    and opens the new hour.  Rows EARLIER than the pending hour are late
    data and are dropped, the same decision a watermarked hourly window
    would make; the replay sources here are event-time ordered, so none
    arise in tests, and at scale the stream would be watermark-sorted
    upstream.  Emits one full-state snapshot per touched type per batch
    (update semantics; downstream keeps the latest)."""
    from ..operators.timeseries import _HOLT_ALPHA as a, _HOLT_BETA as bb

    (event_type,) = key
    if state.exists:
        l, b, n_complete, pending_hour, pending_n = state.get
    else:
        l, b, n_complete, pending_hour, pending_n = 0.0, 0.0, 0, None, 0

    def close_pending():
        nonlocal l, b, n_complete
        y = float(pending_n)
        if n_complete == 0:
            l, b = y, 0.0
        else:
            nl = a * y + (1 - a) * (l + b)
            b = bb * (nl - l) + (1 - bb) * b
            l = nl
        n_complete += 1

    pdfs = [p for p in pdf_iter if len(p)]
    if pdfs:
        whole = pd.concat(pdfs, ignore_index=True)
        # Concatenate chunks before sorting (same fix as _mg_update).
        for ts in whole.sort_values(["ts", "event_id"])["ts"]:
            h = int(ts.value // _NS_PER_HOUR)
            if pending_hour is None:
                pending_hour, pending_n = h, 1
            elif h == pending_hour:
                pending_n += 1
            elif h > pending_hour:
                close_pending()
                pending_hour, pending_n = h, 1
            # else: late row (h < pending_hour) — dropped, see docstring
    # NB (class H): -1 is a REAL hour index for pre-epoch stamps; inside
    # the fold it round-trips correctly (state.exists implies a real
    # pending hour), but the OUTPUT snapshot uses -1 as the "no pending"
    # marker, so a stream whose FINAL event sits in hour -1 would lose
    # its last pending hour at the consumer.  Unreachable on any replay
    # whose max ts is post-epoch; a has_pending output column is the fix
    # if that ever changes (the _burst_update has_last precedent).
    state.update((l, b, n_complete,
                  -1 if pending_hour is None else pending_hour, pending_n))
    yield pd.DataFrame({
        "event_type": [event_type], "l": [l], "b": [b],
        "n_complete": [n_complete],
        "pending_hour": [-1 if pending_hour is None else pending_hour],
        "pending_n": [pending_n],
    })


def holt_stateful(events: DataFrame) -> DataFrame:
    """Streaming Holt smoothing: per-type (level, trend, pending-hour)
    state carried across micro-batches — O(1) state per series, one
    shuffle of each batch's rows on the type key.  The consumer takes the
    LATEST snapshot per type and closes the still-pending hour with one
    more fold step (streaming/queries.q_stream_holt), after which the
    result equals the batch q_ts_holt_trend bit-for-bit."""
    return observed_time(events).select(
        "event_type", "event_id", "ts"
    ).groupBy("event_type").applyInPandasWithState(  # class I at the feed
        _holt_update,
        outputStructType=HOLT_OUT_SCHEMA,
        stateStructType=HOLT_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


HW_OUT_SCHEMA = ("event_type string, l double, b double, s array<double>, "
                 "n_complete long, pending_day long, pending_n long")
HW_STATE_SCHEMA = ("l double, b double, s array<double>, "
                   "buf array<double>, n_complete long, "
                   "pending_day long, pending_n long")
_NS_PER_DAY = 86_400_000_000_000


def _hw_update(key: tuple, pdf_iter, state: GroupState):
    """Holt-Winters (level, trend, m=7 seasonal) state for one event type.

    Same contract as _holt_update at DAY grain, with the seasonal
    wrinkle: the recurrence needs the first 2m complete days for its
    init (week-1 mean level, week-over-week trend, week-1 seasonal
    deviations), so the state buffers day counts until 2m days have
    CLOSED, then initializes and immediately replays days m+1..2m
    through the recurrence — exactly the span the batch fold consumes
    (operators.timeseries.q_ts_holt_winters starts its fold at m+1) —
    and from then on every closing day is one O(1) recurrence step over
    the rolling 7-slot seasonal list.  Python doubles are the same IEEE
    ops as the JVM fold and the DuckDB recursive CTE, so the carried
    state is bit-identical to both."""
    from ..operators.timeseries import (
        _HW_ALPHA as a, _HW_BETA as bb, _HW_GAMMA as g, _HW_M as m)

    (event_type,) = key
    if state.exists:
        l, b, s, buf, n_complete, pending_day, pending_n = state.get
        s, buf = list(s), list(buf)
    else:
        l, b, s, buf = 0.0, 0.0, [], []
        n_complete, pending_day, pending_n = 0, None, 0
    if pending_day is not None and pending_day < 0:
        pending_day = None

    def step(y: float):
        nonlocal l, b, s
        lt = a * (y - s[0]) + (1 - a) * (l + b)
        bt = bb * (lt - l) + (1 - bb) * b
        st = g * (y - lt) + (1 - g) * s[0]
        l, b, s = lt, bt, s[1:] + [st]

    def close_pending():
        nonlocal l, b, s, buf, n_complete
        y = float(pending_n)
        n_complete += 1
        if n_complete <= 2 * m:
            buf.append(y)
            if n_complete == 2 * m:
                sum1 = 0.0
                for v in buf[:m]:
                    sum1 = sum1 + v
                sum2 = 0.0
                for v in buf[m:2 * m]:
                    sum2 = sum2 + v
                l = sum1 / float(m)
                b = (sum2 - sum1) / float(m * m)
                s = [v - sum1 / float(m) for v in buf[:m]]
                for v in buf[m:2 * m]:
                    step(v)
        else:
            step(y)

    pdfs = [p for p in pdf_iter if len(p)]
    if pdfs:
        whole = pd.concat(pdfs, ignore_index=True)
        for ts in whole.sort_values(["ts", "event_id"])["ts"]:
            d = int(ts.value // _NS_PER_DAY)
            if pending_day is None:
                pending_day, pending_n = d, 1
            elif d == pending_day:
                pending_n += 1
            elif d > pending_day:
                close_pending()
                pending_day, pending_n = d, 1
            # else: late row — dropped (the _holt_update decision)
    state.update((l, b, s, buf, n_complete,
                  -1 if pending_day is None else pending_day, pending_n))
    yield pd.DataFrame({
        "event_type": [event_type], "l": [l], "b": [b], "s": [s],
        "n_complete": [n_complete],
        "pending_day": [-1 if pending_day is None else pending_day],
        "pending_n": [pending_n],
    })


def hw_stateful(events: DataFrame) -> DataFrame:
    """Streaming Holt-Winters: per-type (l, b, 7-slot seasonal list,
    init buffer, pending-day) state across micro-batches — O(m) state
    per series, one type-keyed shuffle per batch.  The consumer keeps
    the LATEST snapshot per type and closes the pending day with one
    recurrence step (streaming/queries.q_stream_holt_winters), after
    which the result equals the batch q_ts_holt_winters bit-for-bit.
    (Package shipping rides transforms.stream_events, like every
    stateful source here.)"""
    return observed_time(events).select(
        "event_type", "event_id", "ts"
    ).groupBy("event_type").applyInPandasWithState(  # class I at the feed
        _hw_update,
        outputStructType=HW_OUT_SCHEMA,
        stateStructType=HW_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


PAT_OUT_SCHEMA = ("user_id long, lv long, lc_v long, "
                  "n_purchases long, n_matched long")
PAT_STATE_SCHEMA = ("lv long, lc_v long, n_purchases long, n_matched long")


def _pattern_update(key: tuple, pdf_iter, state: GroupState):
    """view→click→purchase pattern state for one user across a
    micro-batch: the SAME running states the batch window rewrite
    carries (latest view µs; the view-state frozen at the latest click)
    plus the two match counters — O(1) integers per user, folded in
    event-time order.  A purchase matches when the latest click's
    frozen view is within the 24 h window (operators.timeseries
    _PAT_WINDOW_US — shared constant, shared oracle)."""
    from ..operators.timeseries import _PAT_WINDOW_US

    (user_id,) = key
    if state.exists:
        lv, lc_v, n_p, n_m = state.get
        lv = None if lv < 0 else lv
        lc_v = None if lc_v < 0 else lc_v
    else:
        lv, lc_v, n_p, n_m = None, None, 0, 0

    pdfs = [p for p in pdf_iter if len(p)]
    if pdfs:
        whole = pd.concat(pdfs, ignore_index=True)
        # Timestamp.value is ns; Spark timestamps are µs-resolution, so
        # the //1000 is exact (the _holt_update ts.value discipline).
        for ts, et in (whole.sort_values(["ts", "event_id"])
                       [["ts", "event_type"]].itertuples(index=False)):
            us = ts.value // 1000
            if et == "purchase":
                n_p += 1
                if lc_v is not None and us - lc_v <= _PAT_WINDOW_US:
                    n_m += 1
            if et == "click":
                lc_v = lv
            if et == "view":
                lv = int(us)
    # NB (class H): an event at exactly -1 µs would collide with the -1
    # "no view/click yet" marker in the OUTPUT snapshot (the state fold
    # itself never re-reads these through the None mapping).  A view at
    # -1 µs can only matter if a purchase follows within the match
    # window, i.e. within microseconds of the epoch — declared out of
    # scope; the has_last flag pattern (_burst_update) is the fix if a
    # fixture ever lands there.
    state.update((-1 if lv is None else lv,
                  -1 if lc_v is None else lc_v, n_p, n_m))
    yield pd.DataFrame({
        "user_id": [user_id],
        "lv": [-1 if lv is None else lv],
        "lc_v": [-1 if lc_v is None else lc_v],
        "n_purchases": [n_p], "n_matched": [n_m],
    })


def pattern_stateful(events: DataFrame) -> DataFrame:
    """Streaming CEP: the q_ts_pattern_match running states carried
    across micro-batches per user — the always-on sequential-pattern
    detector (state is four integers per user; each batch shuffles only
    its own rows on the user key)."""
    return observed_time(events).select(
        "user_id", "event_id", "event_type", "ts"
    ).groupBy("user_id").applyInPandasWithState(  # class I at the feed
        _pattern_update,
        outputStructType=PAT_OUT_SCHEMA,
        stateStructType=PAT_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


BURST_OUT_SCHEMA = ("user_id long, last_us long, n_gaps long, "
                    "s1 long, s2 string")
BURST_STATE_SCHEMA = ("last_us long, last_eid long, n_gaps long, "
                      "s1 long, s2 string, has_last integer")
# State-schema VERSION for long-lived deployments (r10 advice): the r10
# class-H fix widened the state tuple 5 -> 6 fields (has_last), which is a
# state-store schema INCOMPATIBILITY — a stream resumed from a checkpoint
# written by the 5-field schema fails at restore.  Spark's state store has
# no migration hook for applyInPandasWithState, so the upgrade contract is
# the same as the docker mint's V3 marker: embed this version in the
# checkpoint path (as burstiness' registered query does) so an upgraded
# job STARTS FRESH instead of dying at restore; v1 (5-field) checkpoints
# must be discarded.  Bump on ANY change to BURST_STATE_SCHEMA.
BURST_STATE_VERSION = 2


def _burst_update(key: tuple, pdf_iter, state: GroupState):
    """Arrival-moment state for one user across a micro-batch: last
    event (µs, id tiebreak), gap count, Σgap (fits int64 — bounded by
    the stream's time span) and Σgap² carried as a DECIMAL STRING —
    gap² reaches ~7e24, past int64, and a float accumulator would break
    exact equivalence with the batch decimal path, so the state store
    carries the arbitrary-precision integer in its string rendering
    (Python int arithmetic is exact; the read-time merge casts the
    string to DECIMAL(38,0) and lands on the identical value the batch
    SUM produces)."""
    (user_id,) = key
    if state.exists:
        last_us, last_eid, n, s1, s2s, has_last = state.get
        s2 = int(s2s)
    else:
        last_us, last_eid, n, s1, s2, has_last = -1, -1, 0, 0, 0, 0

    pdfs = [p for p in pdf_iter if len(p)]
    if pdfs:
        whole = pd.concat(pdfs, ignore_index=True)
        for ts, eid in (whole.sort_values(["ts", "event_id"])
                        [["ts", "event_id"]].itertuples(index=False)):
            us = ts.value // 1000  # µs-exact (the _holt_update rule)
            # has_last is an EXPLICIT flag: `last_us >= 0` was the r10
            # class-H find — a pre-epoch stamp carries a NEGATIVE µs
            # value that collides with the -1 sentinel and silently
            # drops every gap that follows it.
            if has_last:
                gap = us - last_us
                n += 1
                s1 += gap
                s2 += gap * gap
            last_us, last_eid, has_last = int(us), int(eid), 1
    state.update((last_us, last_eid, n, s1, str(s2), has_last))
    yield pd.DataFrame({
        "user_id": [user_id], "last_us": [last_us],
        "n_gaps": [n], "s1": [s1], "s2": [str(s2)],
    })


def burstiness_stateful(events: DataFrame) -> DataFrame:
    """Streaming arrival-process moments per user (O(1) state: last
    event + three accumulators), shuffled once per micro-batch on the
    user key."""
    return observed_time(events).select(
        "user_id", "event_id", "ts"
    ).groupBy("user_id").applyInPandasWithState(  # class I at the feed
        _burst_update,
        outputStructType=BURST_OUT_SCHEMA,
        stateStructType=BURST_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
