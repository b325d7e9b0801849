"""Benchmark decontamination (stages/decontam.py): n-gram overlap flags,
broadcast vs shuffle-join path equality, python brute-force oracle."""

import numpy as np
import pyarrow as pa
import pytest


def _toks(t: str) -> list[str]:
    import re

    return [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]


def _grams(t: str, n: int) -> set[tuple[str, ...]]:
    w = _toks(t)
    return {tuple(w[i : i + n]) for i in range(len(w) - n + 1)}


@pytest.fixture(scope="module")
def contaminated(ray_session):
    import ray.data

    bench_texts = [
        "which planet is known as the red planet in our solar system",
        "the capital city of france is paris a major european hub",
    ]
    corpus_texts = [
        # verbatim benchmark span embedded -> contaminated
        "trivia dump: the red planet in our solar system is mars they say",
        # shares the 4-gram "capital city of france"
        "travel blog about the capital city of france and its cafes",
        # clean
        "an unrelated essay on distributed query execution over arrow batches",
        # too short for any 4-gram overlap even though words overlap
        "red planet",
    ]
    bench = pa.table(
        {
            "doc_id": pa.array([100, 101], type=pa.int64()),
            "text": pa.array(bench_texts, type=pa.string()),
        }
    )
    corpus = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], type=pa.int64()),
            "text": pa.array(corpus_texts, type=pa.string()),
        }
    )
    return (
        ray.data.from_arrow(corpus),
        ray.data.from_arrow(bench),
        corpus_texts,
        bench_texts,
    )


def _run(corpus_ds, bench_ds, mode, n=4) -> dict[int, int]:
    from flatnav_ray.stages.decontam import benchmark_overlap

    out = benchmark_overlap(corpus_ds, bench_ds, n=n, mode=mode)
    batches = list(out.iter_batches(batch_format="pyarrow"))
    t = pa.concat_tables(batches) if batches else pa.table(
        {"doc_id": pa.array([], type=pa.int64()), "n_overlap": pa.array([], type=pa.int64())}
    )
    return dict(zip(t.column("doc_id").to_pylist(), t.column("n_overlap").to_pylist()))


class TestDecontam:
    def test_matches_python_oracle(self, contaminated):
        corpus_ds, bench_ds, corpus_texts, bench_texts = contaminated
        n = 4
        pool = set().union(*(_grams(t, n) for t in bench_texts))
        expect = {}
        for i, t in enumerate(corpus_texts):
            ov = len(_grams(t, n) & pool)
            if ov:
                expect[i] = ov
        got = _run(corpus_ds, bench_ds, "broadcast", n=n)
        assert got == expect
        assert 0 in got and 1 in got  # the two planted contaminations
        assert 2 not in got and 3 not in got

    def test_shuffle_equals_broadcast(self, contaminated):
        corpus_ds, bench_ds, *_ = contaminated
        assert _run(corpus_ds, bench_ds, "shuffle") == _run(
            corpus_ds, bench_ds, "broadcast"
        )

    def test_no_overlap_empty(self, ray_session):
        import ray.data

        a = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([0], type=pa.int64()),
                    "text": pa.array(["alpha beta gamma delta epsilon zeta"], type=pa.string()),
                }
            )
        )
        b = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([1], type=pa.int64()),
                    "text": pa.array(["one two three four five six"], type=pa.string()),
                }
            )
        )
        assert _run(a, b, "broadcast") == {}
        assert _run(a, b, "shuffle") == {}
