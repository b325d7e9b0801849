"""Event-stream operators over the events table (ts, user_id, event_type,
value): tumbling-window aggregation and gap-based sessionization.

The reference is batch-only (SURVEY.md §2.9 — no windows/watermarks,
Index.h:44), so these are capability EXTENSIONS in the training-data-pipeline
family: the event-time operations a 100 TB log/interaction corpus needs
before it can feed a training set (windowed counts for rate features,
sessions for trajectory grouping).

Ray-Data-first shapes:
- windowed_counts: the window key is a pure per-row function of ts (epoch
  bucket) computed vectorized in map_batches, each batch PRE-AGGREGATES
  (combiner) so only (window, type) partial rows shuffle, then one small
  groupby sums partials — the map-side-combine pattern SURVEY.md §4
  prescribes for wide aggregations.
- sessionize: shuffle by user_id (groupby.map_groups), per-user vectorized
  gap detection (diff + cumsum). Sessions of one user never span tasks, so
  the partitioning assumption is explicit: user_id is the shard key.

Float discipline: `value` sums are computed in integer CENTS (the column is
2-decimal), so distributed partial-sum order cannot perturb low bits — the
DuckDB oracle compares bit-exact.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

WINDOW_US_HOUR = 3_600_000_000


def hopping_counts(
    ds: ray.data.Dataset,
    window_us: int = WINDOW_US_HOUR,
    hop_us: int = WINDOW_US_HOUR // 2,
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
) -> pa.Table:
    """HOPPING-window aggregate (overlapping windows, hop < window — the
    sliding-window cousin of windowed_counts): every event lands in
    window_us / hop_us windows; per (window_start, event_type) ->
    (n_events, sum_value_cents). The fan-out happens batch-side with a
    vectorized repeat (each event row replicated into its covering window
    starts), then the same map-side combine + small groupby as the
    tumbling path — output rows stay O(windows x types), never
    O(events x fanout), past the per-batch combine."""
    if window_us % hop_us != 0:
        raise ValueError("window_us must be a multiple of hop_us")
    fanout = window_us // hop_us

    def _partial(batch: pa.Table) -> pa.Table:
        ts = batch.column(ts_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        cents = np.round(
            batch.column(value_col).to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        # covering windows of t: starts hop-aligned in
        # (t - window_us, t] — exactly `fanout` of them
        last = (ts // hop_us) * hop_us  # latest hop-aligned start <= t
        starts = last[:, None] - np.arange(fanout, dtype=np.int64)[None, :] * hop_us
        rep = np.repeat(np.arange(len(batch), dtype=np.int64), fanout)
        t = pa.table(
            {
                "window_start": pa.array(starts.reshape(-1), type=pa.int64()),
                type_col: batch.column(type_col).take(pa.array(rep)),
                "n_events": pa.array(np.ones(len(rep), dtype=np.int64)),
                "sum_value_cents": pa.array(cents[rep], type=pa.int64()),
            }
        )
        agg = t.group_by(["window_start", type_col]).aggregate(
            [("n_events", "sum"), ("sum_value_cents", "sum")]
        )
        return pa.table(
            {
                "window_start": agg.column("window_start"),
                type_col: agg.column(type_col),
                "n_events": agg.column("n_events_sum"),
                "sum_value_cents": agg.column("sum_value_cents_sum"),
            }
        )

    partials = ds.map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True)
    agg = (
        partials.groupby(["window_start", type_col])
        .sum(["n_events", "sum_value_cents"])
    )
    t = pa.concat_tables(agg.iter_batches(batch_format="pyarrow"))
    out = pa.table(
        {
            "window_start": t.column("window_start"),
            type_col: t.column(type_col),
            "n_events": t.column("sum(n_events)"),
            "sum_value_cents": t.column("sum(sum_value_cents)"),
        }
    )
    return out.sort_by(
        [("window_start", "ascending"), (type_col, "ascending")]
    )


def windowed_counts(
    ds: ray.data.Dataset,
    window_us: int = WINDOW_US_HOUR,
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
) -> pa.Table:
    """Tumbling-window aggregate: per (window_start, event_type) ->
    (n_events, sum_value_cents). Returns a small sorted table."""

    def _partial(batch: pa.Table) -> pa.Table:
        ts = batch.column(ts_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        win = (ts // window_us) * window_us
        cents = np.round(
            batch.column(value_col).to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        t = pa.table(
            {
                "window_start": pa.array(win, type=pa.int64()),
                type_col: batch.column(type_col),
                "n_events": pa.array(np.ones(len(batch), dtype=np.int64)),
                "sum_value_cents": pa.array(cents, type=pa.int64()),
            }
        )
        # map-side combine: one row per (window, type) leaves the batch.
        # Columns selected BY NAME (pyarrow generates "<col>_sum"; key-vs-
        # aggregate ordering has changed across pyarrow releases, so a
        # positional rename would silently mislabel them)
        agg = t.group_by(["window_start", type_col]).aggregate(
            [("n_events", "sum"), ("sum_value_cents", "sum")]
        )
        return pa.table(
            {
                "window_start": agg.column("window_start"),
                type_col: agg.column(type_col),
                "n_events": agg.column("n_events_sum"),
                "sum_value_cents": agg.column("sum_value_cents_sum"),
            }
        )

    partials = ds.map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True)
    agg = (
        partials.groupby(["window_start", type_col])
        .sum(["n_events", "sum_value_cents"])
    )
    out = pa.concat_tables(agg.iter_batches(batch_format="pyarrow"))
    out = pa.table(
        {
            "window_start": out.column("window_start"),
            type_col: out.column(type_col),
            "n_events": out.column("sum(n_events)"),
            "sum_value_cents": out.column("sum(sum_value_cents)"),
        }
    )
    return out.sort_by([("window_start", "ascending"), (type_col, "ascending")])


def sessionize(
    ds: ray.data.Dataset,
    gap_us: int = 30 * 60 * 1_000_000,
    ts_col: str = "ts",
    user_col: str = "user_id",
    id_col: str = "event_id",
) -> pa.Table:
    """Assign gap-based sessions per user: a new session starts when the gap
    to the user's previous event exceeds `gap_us`. Returns (event_id,
    user_id, session_seq) with session_seq = 0-based session index within the
    user (deterministic; ties in ts break by event_id)."""

    def _per_user(group: pa.Table) -> pa.Table:
        ts = group.column(ts_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        ids = group.column(id_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, ts))
        ts_s = ts[order]
        new_sess = np.zeros(ts_s.size, dtype=np.int64)
        if ts_s.size > 1:
            new_sess[1:] = (ts_s[1:] - ts_s[:-1] > gap_us).astype(np.int64)
        seq = np.cumsum(new_sess)
        inv = np.empty_like(order)
        inv[order] = np.arange(order.size)
        return pa.table(
            {
                id_col: group.column(id_col),
                user_col: group.column(user_col),
                "session_seq": pa.array(seq[inv], type=pa.int64()),
            }
        )

    out = pa.concat_tables(
        ds.groupby(user_col)
        .map_groups(_per_user, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")
    )
    return out.sort_by([(id_col, "ascending")])
