"""Relational operators (stages/relational.py): as-of join (most recent prior
event) and grouped top-k — semantics vs hand-computed expectations plus an
exhaustive check against a pure-numpy reference on a seeded random table.

Reference context: the C++ reference has no joins beyond label lookup
(SURVEY.md §2.4); these extend the J/A operator families to event-time and
per-group semantics for log pipelines.
"""

import numpy as np
import pyarrow as pa

US = 1_000_000


def _events_table():
    # user 1: click@10, purchase@20 (-> 0), click@20 same-ts higher id than
    # the purchase? no: tie order is (ts, event_id), purchase id 1 < click
    # id 2, so purchase@20 sees only click id 0. purchase@30 sees click id 2.
    rows = [
        (0, 10 * US, 1, "click"),
        (1, 20 * US, 1, "purchase"),
        (2, 20 * US, 1, "click"),
        (3, 30 * US, 1, "purchase"),
        (4, 5 * US, 2, "purchase"),   # no prior click -> -1
        (5, 6 * US, 2, "view"),       # filtered out entirely
        (6, 7 * US, 2, "click"),
        (7, 8 * US, 2, "purchase"),
    ]
    return pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "ts": pa.array([r[1] for r in rows], type=pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], type=pa.int64()),
            "event_type": pa.array([r[3] for r in rows], type=pa.string()),
        }
    )


class TestAsofJoin:
    def test_hand_computed(self, ray_session):
        import ray.data

        from flatnav_ray.stages.relational import asof_join_prior

        ds = ray.data.from_arrow(_events_table())
        out = asof_join_prior(ds, left_type="purchase", right_type="click")
        got = {
            r["event_id"]: r["matched_event_id"] for r in out.to_pylist()
        }
        assert got == {1: 0, 3: 2, 4: -1, 7: 6}

    def test_vs_numpy_reference(self, ray_session):
        import ray.data

        from flatnav_ray.stages.relational import asof_join_prior

        rng = np.random.default_rng(7)
        n = 4000
        ids = np.arange(n, dtype=np.int64)
        ts = rng.integers(0, 500, n).astype(np.int64) * US
        users = rng.integers(0, 37, n).astype(np.int64)
        types = np.array(["click", "purchase", "view"])[rng.integers(0, 3, n)]
        t = pa.table(
            {
                "event_id": pa.array(ids),
                "ts": pa.array(ts, type=pa.timestamp("us")),
                "user_id": pa.array(users),
                "event_type": pa.array(types),
            }
        )
        # numpy oracle: global (ts, id) sort, per-user forward scan
        order = np.lexsort((ids, ts))
        last = {}
        expect = {}
        for j in order:
            u, ty = users[j], types[j]
            if ty == "purchase":
                expect[int(ids[j])] = last.get(u, -1)
            if ty == "click":
                last[u] = int(ids[j])
        out = asof_join_prior(
            ray.data.from_arrow(t).repartition(8),
            left_type="purchase",
            right_type="click",
        )
        got = {r["event_id"]: r["matched_event_id"] for r in out.to_pylist()}
        assert got == expect


class TestRangeJoin:
    def test_hand_computed(self, ray_session):
        import ray.data

        from flatnav_ray.stages.relational import range_join_window

        # user 1: click@10 matches purchases @10 (tie, gap 0) and @15;
        # purchase@25 is outside the 10s window. user 2: purchase before the
        # click -> no pair.
        rows = [
            (0, 10, 1, "click"),
            (1, 10, 1, "purchase"),
            (2, 15, 1, "purchase"),
            (3, 25, 1, "purchase"),
            (4, 12, 1, "click"),
            (5, 3, 2, "purchase"),
            (6, 5, 2, "click"),
        ]
        t = pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], type=pa.int64()),
                "ts": pa.array([r[1] * US for r in rows], type=pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], type=pa.int64()),
                "event_type": pa.array([r[3] for r in rows], type=pa.string()),
            }
        )
        out = range_join_window(
            ray.data.from_arrow(t), "click", "purchase", window_us=10 * US
        ).to_pylist()
        got = [(r["left_event_id"], r["right_event_id"], r["gap_us"]) for r in out]
        assert got == [(0, 1, 0), (0, 2, 5 * US), (4, 2, 3 * US)]

    def test_vs_numpy_reference(self, ray_session):
        import ray.data

        from flatnav_ray.stages.relational import range_join_window

        rng = np.random.default_rng(23)
        n = 3000
        W = 40 * US
        ids = np.arange(n, dtype=np.int64)
        ts = rng.integers(0, 2000, n).astype(np.int64) * US
        users = rng.integers(0, 29, n).astype(np.int64)
        types = np.array(["click", "purchase", "view"])[rng.integers(0, 3, n)]
        t = pa.table(
            {
                "event_id": pa.array(ids),
                "ts": pa.array(ts, type=pa.timestamp("us")),
                "user_id": pa.array(users),
                "event_type": pa.array(types),
            }
        )
        expect = set()
        for i in range(n):
            if types[i] != "click":
                continue
            for j in range(n):
                if (
                    types[j] == "purchase"
                    and users[j] == users[i]
                    and ts[i] <= ts[j] < ts[i] + W
                ):
                    expect.add((int(ids[i]), int(ids[j]), int(ts[j] - ts[i])))
        out = range_join_window(
            ray.data.from_arrow(t).repartition(8), "click", "purchase", window_us=W
        ).to_pylist()
        got = {
            (r["left_event_id"], r["right_event_id"], r["gap_us"]) for r in out
        }
        assert got == expect and len(out) == len(got)


class TestGroupedTopk:
    def test_hand_computed(self, ray_session):
        import ray.data

        from flatnav_ray.stages.relational import grouped_topk

        t = pa.table(
            {
                "lang": pa.array(["en", "en", "en", "en", "fr", "fr"]),
                "doc_id": pa.array([1, 2, 3, 4, 5, 6], type=pa.int64()),
                "n_chars": pa.array([10, 30, 30, 5, 7, 7], type=pa.int64()),
            }
        )
        out = grouped_topk(
            ray.data.from_arrow(t), group_col="lang", value_col="n_chars",
            id_col="doc_id", k=2,
        ).to_pylist()
        # ties by id ASC: en -> (30,id2),(30,id3); fr -> (7,id5),(7,id6)
        assert [(r["lang"], r["rank"], r["doc_id"], r["n_chars"]) for r in out] == [
            ("en", 0, 2, 30),
            ("en", 1, 3, 30),
            ("fr", 0, 5, 7),
            ("fr", 1, 6, 7),
        ]

    def test_map_side_bound_and_exactness(self, ray_session):
        """Many partitions: map-side per-batch top-k must still yield the
        exact global per-group top-k."""
        import ray.data

        from flatnav_ray.stages.relational import grouped_topk

        rng = np.random.default_rng(11)
        n = 5000
        t = pa.table(
            {
                "g": pa.array(np.array(["a", "b", "c", "d"])[rng.integers(0, 4, n)]),
                "id": pa.array(np.arange(n, dtype=np.int64)),
                "v": pa.array(rng.integers(0, 1000, n).astype(np.int64)),
            }
        )
        out = grouped_topk(
            ray.data.from_arrow(t).repartition(16),
            group_col="g", value_col="v", id_col="id", k=5,
        ).to_pylist()
        gs = t.column("g").to_numpy(zero_copy_only=False)
        vs = t.column("v").to_numpy(zero_copy_only=False)
        ids = t.column("id").to_numpy(zero_copy_only=False)
        for grp in "abcd":
            m = gs == grp
            order = np.lexsort((ids[m], -vs[m]))[:5]
            exp = list(zip(ids[m][order].tolist(), vs[m][order].tolist()))
            got = [
                (r["id"], r["v"]) for r in out if r["g"] == grp
            ]
            assert got == exp, grp


class TestStridedSample:
    def test_exact_membership_and_negatives(self, ray_session):
        import ray.data

        from flatnav_ray.stages.relational import strided_sample

        # include a negative and a full-width 63-bit key: numpy % must stay
        # exact where a float64 round-trip would not
        keys = np.array([-7, 0, 3, 23, 43, 2**62 + 3, 2**62 + 4], dtype=np.int64)
        t = pa.table({"doc_id": pa.array(keys)})
        out = strided_sample(ray.data.from_arrow(t), modulus=20, residue=3)
        got = sorted(r["doc_id"] for r in out.take_all())
        assert got == sorted(int(k) for k in keys if k % 20 == 3)
        assert (-7) % 20 == 13  # python-style sign: -7 excluded above

    def test_rate(self, ray_session):
        import ray.data

        from flatnav_ray.stages.relational import strided_sample

        t = pa.table({"doc_id": pa.array(np.arange(1000, dtype=np.int64))})
        out = strided_sample(ray.data.from_arrow(t).repartition(4), 10, 7)
        assert out.count() == 100
