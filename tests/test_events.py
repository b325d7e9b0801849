"""Event-stream operators (stages/events.py): tumbling-window aggregate and
gap sessionization — semantics vs hand-computed expectations, plus the
integer-cents exactness contract."""

import numpy as np
import pyarrow as pa
import pytest

US = 1_000_000
HOUR = 3_600 * US


def _events_table():
    # two users; user 1 has a >30min gap between events 2 and 3
    rows = [
        # (event_id, ts_us, user_id, event_type, value)
        (0, 10 * US, 1, "click", 1.25),
        (1, 20 * US, 1, "view", 2.50),
        (2, 100 * US, 2, "click", 0.75),
        (3, 40 * 60 * US, 1, "click", 3.00),      # 40 min after event 1 -> new session
        (4, HOUR + 5 * US, 2, "error", 10.10),    # next hour window
        (5, HOUR + 6 * US, 2, "click", 0.10),
    ]
    return pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "ts": pa.array([r[1] for r in rows], type=pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], type=pa.int64()),
            "event_type": pa.array([r[3] for r in rows], type=pa.string()),
            "value": pa.array([r[4] for r in rows], type=pa.float64()),
        }
    )


class TestWindowedCounts:
    def test_tumbling_hour_windows(self, ray_session):
        import ray.data

        from flatnav_ray.stages.events import windowed_counts

        out = windowed_counts(ray.data.from_arrow(_events_table()))
        got = {
            (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value_cents"])
            for r in out.to_pylist()
        }
        assert got[(0, "click")] == (3, 125 + 75 + 300)
        assert got[(0, "view")] == (1, 250)
        assert got[(HOUR, "error")] == (1, 1010)
        assert got[(HOUR, "click")] == (1, 10)
        assert len(got) == 4

    def test_combiner_invariant_to_batching(self, ray_session):
        """Map-side combine must not change results when batches split."""
        import ray.data

        from flatnav_ray.stages.events import windowed_counts

        t = _events_table()
        a = windowed_counts(ray.data.from_arrow(t))
        b = windowed_counts(
            ray.data.from_arrow(t).repartition(3)
        )
        assert a.equals(b)


class TestSessionize:
    def test_gap_splits_sessions(self, ray_session):
        import ray.data

        from flatnav_ray.stages.events import sessionize

        out = sessionize(ray.data.from_arrow(_events_table()))
        seq = {r["event_id"]: r["session_seq"] for r in out.to_pylist()}
        assert seq[0] == 0 and seq[1] == 0       # user 1, same session
        assert seq[3] == 1                        # 40-min gap -> new session
        assert seq[2] == 0                        # user 2 first session
        assert seq[4] == 1 and seq[5] == 1        # user 2: >30min after event 2
        assert out.column("event_id").to_pylist() == [0, 1, 2, 3, 4, 5]

    def test_session_boundary_is_strict_gap(self, ray_session):
        """Exactly gap_us apart stays in the SAME session (strict >)."""
        import ray.data

        from flatnav_ray.stages.events import sessionize

        t = pa.table(
            {
                "event_id": pa.array([0, 1], type=pa.int64()),
                "ts": pa.array([0, 30 * 60 * US], type=pa.timestamp("us")),
                "user_id": pa.array([7, 7], type=pa.int64()),
                "event_type": pa.array(["a", "a"]),
                "value": pa.array([0.0, 0.0]),
            }
        )
        out = sessionize(ray.data.from_arrow(t))
        assert out.column("session_seq").to_pylist() == [0, 0]


def test_hopping_covers_each_event_twice(ray_session):
    """Every event must appear in exactly window/hop = 2 windows: the
    hopping totals are exactly 2x the tumbling-free event count."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from flatnav_ray.stages.events import hopping_counts

    n = 500
    rng = np.random.RandomState(11)
    ts = rng.randint(0, 10 * 3600 * 1_000_000, size=n).astype("datetime64[us]")
    tbl = pa.table(
        {
            "ts": pa.array(ts),
            "event_type": pa.array(["a" if i % 2 else "b" for i in range(n)]),
            "value": pa.array(rng.uniform(0, 10, size=n)),
        }
    )
    out = hopping_counts(ray.data.from_arrow(tbl))
    assert sum(out.column("n_events").to_pylist()) == 2 * n
    # brute-force one (window, type) cell
    ws = out.column("window_start")[0].as_py()
    et = out.column("event_type")[0].as_py()
    tsi = tbl.column("ts").cast(pa.int64()).to_pylist()
    ets = tbl.column("event_type").to_pylist()
    want = sum(
        1 for t, e in zip(tsi, ets)
        if e == et and ws <= t < ws + 3600 * 1_000_000
    )
    assert out.column("n_events")[0].as_py() == want


def test_json_rollup_ragged_props(ray_session, tmp_path):
    """events_json_rollup on ragged JSON: missing field, other fields, raw
    garbage — n_missing accounts for every unextractable row and the integer
    rollups cover only extracted values (exact)."""
    import os

    import pyarrow.parquet as pq

    from flatnav_ray.pipelines.events import events_json_rollup

    tbl = pa.table(
        {
            "event_id": pa.array(range(8), type=pa.int64()),
            "ts": pa.array([0] * 8, type=pa.timestamp("us")),
            "user_id": pa.array([1] * 8, type=pa.int64()),
            "event_type": pa.array(["a", "a", "a", "b", "b", "b", "b", "a"]),
            "value": pa.array([0.0] * 8),
            "props": pa.array(
                [
                    '{"k": 5}', '{"j": 9}', '{"k": -3}',      # a: 5, miss, -3
                    '{"k": 0}', "not json", '{"k": 12}', "{}",  # b: 0, miss, 12, miss
                    '{ "k" :  7 }',                            # a: 7 (spaced)
                ]
            ),
        }
    )
    d = str(tmp_path / "ev")
    os.makedirs(d)
    pq.write_table(tbl, os.path.join(d, "events.parquet"))
    out = {r["event_type"]: r for r in events_json_rollup(d).to_pylist()}
    assert out["a"]["n_events"] == 4 and out["a"]["n_missing"] == 1
    assert out["a"]["k_sum"] == 9 and out["a"]["k_min"] == -3 and out["a"]["k_max"] == 7
    assert out["b"]["n_events"] == 4 and out["b"]["n_missing"] == 2
    assert out["b"]["k_sum"] == 12 and out["b"]["k_min"] == 0 and out["b"]["k_max"] == 12


def test_json_rollup_all_missing_group_yields_null_min_max(ray_session, tmp_path):
    """A group whose rows all lack an extractable k must report NULL
    k_min/k_max (the SQL min/max over an empty set) — not int64 iinfo
    sentinels — and k_sum 0."""
    import os

    import pyarrow.parquet as pq

    from flatnav_ray.pipelines.events import events_json_rollup

    tbl = pa.table(
        {
            "event_id": pa.array(range(4), type=pa.int64()),
            "ts": pa.array([0] * 4, type=pa.timestamp("us")),
            "user_id": pa.array([1] * 4, type=pa.int64()),
            "event_type": pa.array(["a", "a", "c", "c"]),
            "value": pa.array([0.0] * 4),
            "props": pa.array(['{"k": 2}', "{}", '{"j": 1}', "nope"]),
        }
    )
    d = str(tmp_path / "ev2")
    os.makedirs(d)
    pq.write_table(tbl, os.path.join(d, "events.parquet"))
    out = {r["event_type"]: r for r in events_json_rollup(d).to_pylist()}
    assert out["c"]["n_events"] == 2 and out["c"]["n_missing"] == 2
    assert out["c"]["k_sum"] == 0
    assert out["c"]["k_min"] is None and out["c"]["k_max"] is None
    assert out["a"]["k_min"] == 2 and out["a"]["k_max"] == 2
