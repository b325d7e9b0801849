"""Token-budget mixture sampling (stages/mixture.py): two-pass histogram
cut vs a brute-force numpy replica of the prefix-cumsum semantics."""

import numpy as np
import pyarrow as pa
import pytest

from flatnav_ray.functions.hashes import splitmix64


def _brute(ids, groups, ntoks, budget):
    """Reference semantics: per group, order by (splitmix64(id), id), keep
    while the inclusive token cumsum fits the budget."""
    ids = np.asarray(ids, dtype=np.int64)
    h = splitmix64(ids.astype(np.uint64))
    keep = set()
    for g in set(groups):
        sel = np.fromiter((gg == g for gg in groups), dtype=bool, count=len(groups))
        ids_g = ids[sel]
        order = np.lexsort((ids_g, h[sel]))
        cum = np.cumsum(np.asarray(ntoks)[sel][order])
        keep.update(int(x) for x in ids_g[order][cum <= budget])
    return keep


def _run(tbl, budget):
    import ray.data

    from flatnav_ray.stages.mixture import token_budget_sample

    out = token_budget_sample(ray.data.from_arrow(tbl), budget=budget)
    batches = list(out.iter_batches(batch_format="pyarrow"))
    t = pa.concat_tables(batches) if batches else pa.table(
        {"doc_id": pa.array([], type=pa.int64())}
    )
    return set(t.column("doc_id").to_pylist())


@pytest.fixture(scope="module")
def corpus(ray_session):
    rng = np.random.RandomState(7)
    n = 400
    groups = [f"s{i % 5}" for i in range(n)]
    texts = [" ".join(["w"] * rng.randint(5, 40)) for _ in range(n)]
    ntoks = [len(t.split()) for t in texts]
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "source": pa.array(groups, type=pa.string()),
            "text": pa.array(texts, type=pa.string()),
        }
    )
    return tbl, groups, ntoks


class TestMixtureSample:
    def test_matches_brute_force(self, corpus):
        tbl, groups, ntoks = corpus
        ids = tbl.column("doc_id").to_pylist()
        for budget in (0, 37, 200, 1000):
            assert _run(tbl, budget) == _brute(ids, groups, ntoks, budget), budget

    def test_all_kept_when_budget_huge(self, corpus):
        tbl, *_ = corpus
        assert _run(tbl, 10**9) == set(tbl.column("doc_id").to_pylist())

    def test_boundary_bucket_exact(self, ray_session):
        # one group, budget cutting mid-stream: the kept set must be exactly
        # the hash-order prefix — exercises the boundary-bucket path since
        # with few docs EVERY doc lands near some bucket boundary
        n = 50
        tbl = pa.table(
            {
                "doc_id": pa.array(np.arange(n, dtype=np.int64)),
                "source": pa.array(["only"] * n, type=pa.string()),
                "text": pa.array(["a b c d e"] * n, type=pa.string()),  # 5 toks
            }
        )
        got = _run(tbl, 23)  # 4 docs of 5 tokens fit, the 5th does not
        assert len(got) == 4
        assert got == _brute(np.arange(n), ["only"] * n, [5] * n, 23)


class TestPerGroupBudgets:
    def test_dict_budget_and_unit_weights(self, corpus):
        tbl, groups, ntoks = corpus
        import ray.data

        from flatnav_ray.stages.mixture import token_budget_sample

        # unit weights: budget == exact row quota per group
        budgets = {"s0": 3, "s1": 0, "s2": 7}  # s3/s4 absent -> keep nothing
        out = token_budget_sample(
            ray.data.from_arrow(tbl), budgets, weight="ones", text_col="source"
        )
        t = pa.concat_tables(out.iter_batches(batch_format="pyarrow"))
        got = {}
        for d, g in zip(t.column("doc_id").to_pylist(), t.column("source").to_pylist()):
            got.setdefault(g, set()).add(d)
        assert len(got.get("s0", ())) == 3
        assert "s1" not in got and "s3" not in got and "s4" not in got
        assert len(got["s2"]) == 7
        # the kept rows are exactly the hash-order prefix of each group
        ids = np.asarray(tbl.column("doc_id").to_pylist())
        h = splitmix64(ids.astype(np.uint64))
        for g, quota in (("s0", 3), ("s2", 7)):
            sel = np.fromiter((gg == g for gg in groups), dtype=bool, count=len(groups))
            order = np.lexsort((ids[sel], h[sel]))
            assert got[g] == set(int(x) for x in ids[sel][order][:quota])
