"""Sharded shuffled export (stages/export.py): deterministic plan, write
round-trip, resume skip, plan/write order agreement."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from flatnav_ray.functions.hashes import splitmix64


def _corpus(n=200):
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64) * 7 + 3),
            "text": pa.array([f"doc number {i}" for i in range(n)], type=pa.string()),
        }
    )


class TestExportShuffled:
    def test_plan_matches_brute_force(self, ray_session):
        import ray.data

        from flatnav_ray.stages.export import export_shuffled

        tbl = _corpus()
        plan = export_shuffled(ray.data.from_arrow(tbl), None, num_shards=4, seed=9)
        ids = tbl.column("doc_id").to_numpy(zero_copy_only=False)
        h = splitmix64(ids.astype(np.uint64) ^ np.uint64(9))
        shard = (h % np.uint64(4)).astype(np.int64)
        want = {}
        for s in range(4):
            sel = shard == s
            ids_s, h_s = ids[sel], h[sel]
            order = np.lexsort((ids_s, h_s))
            for pos, i in enumerate(ids_s[order]):
                want[int(i)] = (s, pos)
        got = {
            int(d): (int(s), int(p))
            for d, s, p in zip(
                plan.column("doc_id").to_pylist(),
                plan.column("shard").to_pylist(),
                plan.column("pos").to_pylist(),
            )
        }
        assert got == want

    def test_write_roundtrip_and_resume(self, ray_session, tmp_path):
        import ray.data

        from flatnav_ray.stages.export import export_shuffled

        tbl = _corpus()
        out = str(tmp_path / "shards")
        man = export_shuffled(ray.data.from_arrow(tbl), out, num_shards=4, seed=9)
        assert man.column("rows").to_pylist() and sum(man.column("rows").to_pylist()) == len(tbl)

        # readback: every doc exactly once; per-shard order == the plan order
        plan = export_shuffled(ray.data.from_arrow(tbl), None, num_shards=4, seed=9)
        by_shard = {}
        for d, s, p in zip(
            plan.column("doc_id").to_pylist(),
            plan.column("shard").to_pylist(),
            plan.column("pos").to_pylist(),
        ):
            by_shard.setdefault(s, {})[p] = d
        seen = []
        for s in man.column("shard").to_pylist():
            f = os.path.join(out, f"shard={s:05d}", "part.parquet")
            t = pq.read_table(f)
            ids = t.column("doc_id").to_pylist()
            seen.extend(ids)
            assert ids == [by_shard[s][p] for p in range(len(ids))]
            assert "text" in t.column_names  # payload rides along
        assert sorted(seen) == sorted(tbl.column("doc_id").to_pylist())

        # resume: re-export with finished shards present must not rewrite
        mtimes = {
            s: os.path.getmtime(os.path.join(out, f"shard={s:05d}", "part.parquet"))
            for s in man.column("shard").to_pylist()
        }
        man2 = export_shuffled(ray.data.from_arrow(tbl), out, num_shards=4, seed=9)
        assert man2.column("rows").to_pylist() == man.column("rows").to_pylist()
        for s, m in mtimes.items():
            assert os.path.getmtime(os.path.join(out, f"shard={s:05d}", "part.parquet")) == m
