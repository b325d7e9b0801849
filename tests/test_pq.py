"""Product quantization (graft of the reference's developmental PQ,
ProductQuantization.h): round-trip quality, ADC correctness vs explicit
reconstruction, dataset encode plumbing, IVF-PQ recall with exact re-rank."""

import numpy as np
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def emb(ray_session):
    import ray.data

    rng = np.random.default_rng(2)
    mat = rng.normal(size=(400, 32))
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(400, dtype=np.int64)),
            "embedding": pa.array([r.tolist() for r in mat], type=pa.list_(pa.float32())),
        }
    )
    return ray.data.from_arrow(t), mat


class TestProductQuantizer:
    def test_reconstruction_improves_with_m(self, emb):
        from flatnav_ray.stages.pq import ProductQuantizer

        _, mat = emb
        n = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        errs = []
        for m in (2, 8, 16):
            pq = ProductQuantizer.train_matrix(mat, m=m, n_bits=6, iters=8)
            rec = pq.decode_matrix(pq.encode_matrix(mat))
            errs.append(float(((n - rec) ** 2).sum(-1).mean()))
        assert errs[0] > errs[1] > errs[2]  # finer subspaces -> lower error
        assert errs[2] < 0.25

    def test_adc_equals_reconstructed_inner_product(self, emb):
        from flatnav_ray.stages.pq import ProductQuantizer

        _, mat = emb
        pq = ProductQuantizer.train_matrix(mat, m=8, n_bits=5)
        codes = pq.encode_matrix(mat[:50])
        q = mat[:3]
        tables = pq.adc_tables(q)
        flat = tables.reshape(3, -1)
        idx = (np.arange(pq.m) * pq.k)[None, :] + codes
        adc = flat[:, idx].sum(-1)
        qn = q / np.linalg.norm(q, axis=1, keepdims=True)
        explicit = qn @ pq.decode_matrix(codes).T
        np.testing.assert_allclose(adc, explicit, rtol=0, atol=1e-9)

    def test_dataset_encode_and_search_recall(self, emb):
        from flatnav_ray.stages.knn import brute_force_knn
        from flatnav_ray.stages.pq import ProductQuantizer, pq_search

        ds, mat = emb
        pq = ProductQuantizer.train(ds, m=16, n_bits=6)
        coded = pq.encode_dataset(ds)
        first = pa.concat_tables(coded.limit(5).iter_batches(batch_format="pyarrow"))
        assert {"pq_code", "embedding"} <= set(first.column_names)
        assert len(first.column("pq_code")[0].as_py()) == 16
        q = mat[:8]
        exact = brute_force_knn(ds, q, k=10)
        # pure ADC: decent recall; with exact re-rank: near-exact
        adc = pq_search(pq, coded, q, k=10)
        rr = pq_search(pq, coded, q, k=10, rerank=50)
        def recall(approx):
            tot = 0.0
            for qi in range(8):
                e = set(exact.filter(pa.compute.equal(exact.column("query_id"), qi)).column("vec_id").to_pylist())
                a = set(approx.filter(pa.compute.equal(approx.column("query_id"), qi)).column("vec_id").to_pylist())
                tot += len(e & a) / 10
            return tot / 8
        assert recall(adc) > 0.4
        assert recall(rr) > 0.9

    def test_ivfpq_end_to_end(self, emb):
        from flatnav_ray.stages.knn import brute_force_knn
        from flatnav_ray.stages.pq import IvfPqIndex

        ds, mat = emb
        ix, coded = IvfPqIndex.build(ds, n_centroids=8, m=16, n_bits=6)
        coded = coded.materialize()
        q = mat[:8]
        exact = brute_force_knn(ds, q, k=10)
        out = ix.search(coded, q, k=10, nprobe=8, rerank=100)  # all lists + rerank
        tot = 0.0
        for qi in range(8):
            e = set(exact.filter(pa.compute.equal(exact.column("query_id"), qi)).column("vec_id").to_pylist())
            a = set(out.filter(pa.compute.equal(out.column("query_id"), qi)).column("vec_id").to_pylist())
            tot += len(e & a) / 10
        assert tot / 8 > 0.9
        # pruned probes still return k rows per query
        pruned = ix.search(coded, q, k=10, nprobe=2)
        assert len(pruned) == 80
