"""PQ ANN, Rocchio classifier, and count-min sketch quality gates."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from xdlake_spark.operators import classify, similarity, sketch

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


class TestPQ:
    def test_codebook_shape_and_determinism(self, emb):
        b1 = similarity.pq_train(emb, m=8, n_codes=16)
        b2 = similarity.pq_train(emb, m=8, n_codes=16)
        assert b1.shape == (8, 16, 8)
        assert np.array_equal(b1, b2)

    def test_dim_not_divisible_raises(self, emb):
        with pytest.raises(ValueError, match="not divisible"):
            similarity.pq_train(emb, m=7)

    def test_adc_exact_when_vectors_are_centroids(self, spark):
        # corpus whose vectors ARE products of codebook centroids ->
        # quantization error is zero and ADC equals true sq-distance
        books = np.array([[[0.0, 0.0], [1.0, 1.0], [2.0, 0.0], [0.0, 3.0]]
                          for _ in range(2)])  # m=2, 4 codes, sub=2
        rows = []
        vid = 0
        for c0 in range(4):
            for c1 in range(4):
                rows.append((vid, [float(x) for x in
                                   list(books[0][c0]) + list(books[1][c1])]))
                vid += 1
        df = spark.createDataFrame(rows, "vec_id INT, embedding ARRAY<DOUBLE>")
        enc = similarity.pq_encode(df, books)
        q = [0.5, 0.5, 0.5, 0.5]
        got = similarity.pq_topk(enc, books, q, k=16).collect()
        truth = {r[0]: sum((a - b) ** 2 for a, b in zip(r[1], q))
                 for r in rows}
        for r in got:
            assert r.adc_dist == pytest.approx(truth[r.vec_id], abs=1e-6)

    def _exact_top10(self, emb, qv):
        qlit = F.array(*[F.lit(float(v)) for v in qv])
        d2 = F.aggregate(
            F.zip_with("embedding", qlit,
                       lambda a, b: (a.cast("double") - b)
                       * (a.cast("double") - b)),
            F.lit(0.0), lambda acc, x: acc + x)
        return [r.vec_id for r in
                emb.select("vec_id", d2.alias("d"))
                .orderBy(F.col("d").asc(), "vec_id").limit(10).collect()]

    def test_recall_vs_brute_force(self, emb):
        from xdlake_spark.queries import QUERY_VEC
        books = similarity.pq_train(emb, m=16, n_codes=16)
        enc = similarity.pq_encode(emb, books)
        exact = self._exact_top10(emb, QUERY_VEC)
        # pure ADC ranking: weak floor (quantization-limited)
        adc = [r.vec_id for r in
               similarity.pq_topk(enc, books, QUERY_VEC, k=10).collect()]
        assert len(set(exact) & set(adc)) / 10 >= 0.2
        # shortlist + exact re-rank: high recall floor
        rer = [r.vec_id for r in
               similarity.pq_topk(enc, books, QUERY_VEC, k=10,
                                  vec_col="embedding",
                                  oversample=8).collect()]
        recall = len(set(exact) & set(rer)) / 10
        assert recall >= 0.8, f"re-ranked PQ recall@10 too low: {recall}"

    def test_plan_jvm_only_and_take_ordered(self, emb):
        books = similarity.pq_train(emb, m=8, n_codes=16)
        enc = similarity.pq_encode(emb, books)
        plan = (similarity.pq_topk(enc, books, [0.0] * 64, k=10)
                ._jdf.queryExecution().executedPlan().toString())
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
        assert "TakeOrderedAndProject" in plan
        # no key shuffle: the only allowed Exchange is the round-robin
        # ensure_parallelism repartition of a tiny local relation
        assert "hashpartitioning" not in plan


class TestIVFPQ:
    """IVF-PQ (r10): inverted lists over residual product codes —
    exact-degradation differential, recall floors, code-size bound,
    determinism, and the JVM-only probe plan."""

    def _exact_top10_euclid(self, emb, q):
        pdf = emb.toPandas()
        X = np.array(pdf["embedding"].tolist(), dtype="float64")
        d2 = ((X - np.asarray(q)) ** 2).sum(axis=1)
        ids = pdf["vec_id"].to_numpy()
        return ids[np.lexsort((ids, d2))][:10].tolist()

    def test_full_probe_rerank_is_exact(self, emb):
        from xdlake_spark.queries import QUERY_VEC
        enc, cents, books = similarity.ivfpq_build(emb, n_centroids=8)
        n = emb.count()
        got = [r.vec_id for r in similarity.ivfpq_topk(
            enc, cents, books, QUERY_VEC, k=10, nprobe=8,
            vec_col="embedding", oversample=-(-n // 10)).collect()]
        assert got == self._exact_top10_euclid(emb, QUERY_VEC)

    def test_recall_floors(self, emb):
        from xdlake_spark.queries import QUERY_VEC
        enc, cents, books = similarity.ivfpq_build(emb, n_centroids=8)
        exact = set(self._exact_top10_euclid(emb, QUERY_VEC))
        rer = [r.vec_id for r in similarity.ivfpq_topk(
            enc, cents, books, QUERY_VEC, k=10, nprobe=8,
            vec_col="embedding", oversample=16).collect()]
        recall = len(exact & set(rer)) / 10
        assert recall >= 0.7, f"full-probe re-rank recall: {recall}"
        half = [r.vec_id for r in similarity.ivfpq_topk(
            enc, cents, books, QUERY_VEC, k=10, nprobe=4,
            vec_col="embedding", oversample=16).collect()]
        assert len(exact & set(half)) / 10 >= 0.3

    def test_residual_beats_nothing_codes_bounded(self, emb):
        enc, cents, books = similarity.ivfpq_build(
            emb, n_centroids=4, m=8, n_codes=16)
        rows = enc.select("codes", "__centroid").collect()
        assert all(len(r["codes"]) == 8 for r in rows)
        assert all(0 <= c < 16 for r in rows for c in r["codes"])
        assert {r["__centroid"] for r in rows} <= set(range(4))

    def test_deterministic(self, emb):
        from xdlake_spark.queries import QUERY_VEC
        out = []
        for _ in range(2):
            enc, cents, books = similarity.ivfpq_build(
                emb, n_centroids=8)
            out.append([r.vec_id for r in similarity.ivfpq_topk(
                enc, cents, books, QUERY_VEC, k=10, nprobe=4).collect()])
        assert out[0] == out[1]

    def test_probe_plan_jvm_only(self, emb):
        enc, cents, books = similarity.ivfpq_build(emb, n_centroids=8)
        plan = (similarity.ivfpq_topk(enc, cents, books, [0.0] * 64,
                                      k=10, nprobe=4)
                ._jdf.queryExecution().executedPlan().toString())
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
        assert "TakeOrderedAndProject" in plan

    def test_bad_query_dim_raises(self, emb):
        enc, cents, books = similarity.ivfpq_build(emb, n_centroids=4)
        with pytest.raises(ValueError, match="dim"):
            similarity.ivfpq_topk(enc, cents, books, [0.0] * 63)


class TestOPQ:
    """OPQ (r10): learned-rotation product quantization — orthogonal
    R, lower quantization error than plain PQ on anisotropic data,
    exact-degradation, determinism."""

    @pytest.fixture(scope="class")
    def aniso(self, spark):
        rng = np.random.RandomState(0)
        Q, _ = np.linalg.qr(rng.randn(64, 64))
        X = rng.randn(600, 64) @ (Q * np.geomspace(10, 0.1, 64))
        df = spark.createDataFrame(
            [(i, X[i].tolist()) for i in range(600)],
            "vec_id long, embedding array<double>")
        return df, X

    def test_rotation_orthogonal_and_deterministic(self, aniso):
        df, _ = aniso
        R1, b1 = similarity.opq_train(df, opq_iters=4)
        R2, b2 = similarity.opq_train(df, opq_iters=4)
        assert np.allclose(R1 @ R1.T, np.eye(64), atol=1e-8)
        assert np.array_equal(R1, R2) and np.array_equal(b1, b2)

    def test_beats_plain_pq_on_anisotropic_data(self, aniso):
        df, X = aniso
        R, obooks = similarity.opq_train(df, opq_iters=6)
        pbooks = similarity.pq_train(df)
        pe = ((similarity._pq_reconstruct(X, pbooks) - X) ** 2).sum()
        oe = ((similarity._pq_reconstruct(X @ R, obooks)
               - X @ R) ** 2).sum()
        assert oe < 0.8 * pe, (oe, pe)

    def test_full_oversample_rerank_is_exact(self, aniso):
        df, X = aniso
        R, books = similarity.opq_train(df, opq_iters=3)
        enc = similarity.opq_encode(df, R, books)
        q = (X[7] + 0.01).tolist()
        got = [r.vec_id for r in similarity.opq_topk(
            enc, R, books, q, k=10, vec_col="embedding",
            oversample=60).collect()]
        d2 = ((X - np.array(q)) ** 2).sum(axis=1)
        ids = np.arange(600)
        assert got == ids[np.lexsort((ids, d2))][:10].tolist()

    def test_encode_plan_jvm_only(self, aniso):
        df, _ = aniso
        R, books = similarity.opq_train(df, opq_iters=2)
        plan = (similarity.opq_encode(df, R, books)
                ._jdf.queryExecution().executedPlan().toString())
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan


class TestPCA:
    """Distributed PCA (r10): one moment-sketch job + driver eigh —
    numpy-twin exact, deterministic signs, JVM-only projection."""

    def _twin(self, emb, k):
        pdf = emb.orderBy("vec_id").toPandas()
        X = np.array(pdf["embedding"].tolist(), dtype="float64")
        mu = X.mean(axis=0)
        cov = (X - mu).T @ (X - mu) / len(X)
        w, V = np.linalg.eigh((cov + cov.T) / 2)
        order = np.argsort(w)[::-1][:k]
        C = V[:, order].T.copy()
        for j in range(k):
            i = int(np.argmax(np.abs(C[j])))
            if C[j, i] < 0:
                C[j] = -C[j]
        return X, mu, w[order], C

    def test_matches_numpy_twin(self, emb):
        mean, vals, comps = similarity.pca_train(emb, k=8)
        X, mu, wv, C = self._twin(emb, 8)
        assert np.allclose(mean, mu, atol=1e-9)
        assert np.allclose(vals, wv, atol=1e-9)
        assert np.allclose(comps, C, atol=1e-7)
        out = (similarity.pca_project(emb, mean, vals, comps)
               .orderBy("vec_id").toPandas())
        Y = np.array(out["pca"].tolist())
        assert np.allclose(Y, (X - mu) @ C.T, atol=1e-6)

    def test_variance_descending_and_whitening(self, emb):
        mean, vals, comps = similarity.pca_train(emb, k=10)
        assert all(vals[i] >= vals[i + 1] for i in range(9))
        out = (similarity.pca_project(emb, mean, vals, comps,
                                      whiten=True)
               .orderBy("vec_id").toPandas())
        Y = np.array(out["pca"].tolist())
        assert np.allclose(Y.var(axis=0), 1.0, atol=1e-2)

    def test_deterministic(self, emb):
        a = similarity.pca_train(emb, k=6)
        b = similarity.pca_train(emb, k=6)
        assert np.array_equal(a[0], b[0])
        assert np.array_equal(a[2], b[2])

    def test_projection_plan_jvm_only(self, emb):
        mean, vals, comps = similarity.pca_train(emb, k=4)
        plan = (similarity.pca_project(emb, mean, vals, comps)
                ._jdf.queryExecution().executedPlan().toString())
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan

    def test_uncentered_mode(self, emb):
        mean, vals, comps = similarity.pca_train(emb, k=4,
                                                 center=False)
        assert np.allclose(mean, 0.0)

    def test_bad_k_and_empty_raise(self, spark, emb):
        with pytest.raises(ValueError, match="out of range"):
            similarity.pca_train(emb, k=65)
        empty = emb.filter("vec_id < 0")
        with pytest.raises(ValueError):
            similarity.pca_train(empty, k=4)


class TestRocchio:
    def test_separable_blobs_classify_perfectly(self, spark):
        rows = []
        for i in range(30):
            rows.append((i, [10.0 + (i % 5) * 0.1, 0.0], 0))
            rows.append((100 + i, [0.0, 10.0 + (i % 5) * 0.1], 1))
        df = spark.createDataFrame(
            rows, "vec_id INT, embedding ARRAY<DOUBLE>, label INT")
        out = classify.rocchio_classify(df)
        assert out.filter(F.col("pred_label") != F.col("label")).count() == 0

    def test_tie_breaks_to_higher_label(self, spark):
        # two classes with IDENTICAL centroids -> every score ties ->
        # prediction must be the higher label on every row
        rows = [(1, [1.0, 1.0], 3), (2, [1.0, 1.0], 7),
                (3, [2.0, 0.0], 3), (4, [2.0, 0.0], 7)]
        df = spark.createDataFrame(
            rows, "vec_id INT, embedding ARRAY<DOUBLE>, label INT")
        out = classify.rocchio_classify(df)
        assert {r.pred_label for r in out.collect()} == {7}

    def test_empty_raises(self, spark):
        df = spark.createDataFrame(
            [], "vec_id INT, embedding ARRAY<DOUBLE>, label INT")
        with pytest.raises(ValueError, match="empty"):
            classify.rocchio_classify(df)

    def test_accuracy_on_real_embeddings(self, emb):
        out = classify.rocchio_classify(emb)
        n = out.count()
        ok = out.filter(F.col("pred_label") == F.col("label")).count()
        # the synthetic labels are only weakly embedding-correlated;
        # gate at 2.5x the 10-class chance rate
        assert ok / n >= 0.25, f"rocchio accuracy {ok}/{n}"


class TestCMS:
    def _items(self, spark, counts):
        rows = [(tok,) for tok, n in counts.items() for _ in range(n)]
        return spark.createDataFrame(rows, "tok STRING")

    def test_never_underestimates(self, spark):
        counts = {f"t{i}": (i % 7) + 1 for i in range(300)}
        items = self._items(spark, counts)
        sk = sketch.cms_build(items, "tok", depth=4, width=64)
        cand = items.groupBy("tok").agg(F.count(F.lit(1)).alias("exact_n"))
        est = sketch.cms_estimate(sk, cand, "tok", depth=4, width=64)
        bad = est.filter(F.col("cms_est") < F.col("exact_n")).count()
        assert bad == 0

    def test_exact_when_width_large(self, spark):
        counts = {"a": 5, "b": 3, "c": 11}
        items = self._items(spark, counts)
        sk = sketch.cms_build(items, "tok", depth=4, width=4096)
        cand = items.select("tok").distinct()
        est = {r.tok: r.cms_est for r in
               sketch.cms_estimate(sk, cand, "tok", depth=4,
                                   width=4096).collect()}
        assert est == counts

    def test_sketch_size_bounded(self, spark):
        counts = {f"t{i}": 2 for i in range(1000)}
        sk = sketch.cms_build(self._items(spark, counts), "tok",
                              depth=4, width=32)
        assert sk.count() <= 4 * 32

    def test_merge_by_cell_addition(self, spark):
        c1, c2 = {"a": 3, "b": 1}, {"a": 2, "c": 4}
        s1 = sketch.cms_build(self._items(spark, c1), "tok", width=64)
        s2 = sketch.cms_build(self._items(spark, c2), "tok", width=64)
        merged = (s1.unionByName(s2).groupBy("row_i", "bucket")
                  .agg(F.sum("cnt").alias("cnt")))
        both = self._items(spark, {"a": 5, "b": 1, "c": 4})
        direct = sketch.cms_build(both, "tok", width=64)
        assert sorted(map(tuple, merged.collect())) == \
            sorted(map(tuple, direct.collect()))

    def test_estimator_broadcasts_sketch(self, spark):
        items = self._items(spark, {"a": 2, "b": 2})
        sk = sketch.cms_build(items, "tok", width=64)
        plan = (sketch.cms_estimate(sk, items.distinct(), "tok", width=64)
                ._jdf.queryExecution().executedPlan().toString())
        assert "BroadcastHashJoin" in plan
        assert "BatchEvalPython" not in plan


class TestRRF:
    def _ranked(self, spark, pairs):
        return spark.createDataFrame(pairs, "doc_id INT, rank INT")

    def test_both_lists_beat_single_list(self, spark):
        from xdlake_spark.operators.retrieval import rrf_fuse
        a = self._ranked(spark, [(1, 1), (2, 2)])
        b = self._ranked(spark, [(1, 2), (3, 1)])
        out = rrf_fuse([a, b], top_k=3).collect()
        assert out[0].doc_id == 1 and out[0].n_lists == 2
        # doc 3 (rank 1 in one list) beats doc 2 (rank 2 in one list)
        assert [r.doc_id for r in out] == [1, 3, 2]

    def test_score_formula(self, spark):
        from xdlake_spark.operators.retrieval import rrf_fuse
        a = self._ranked(spark, [(7, 3)])
        row = rrf_fuse([a], k=60, top_k=1).collect()[0]
        assert row.rrf_score == round(1.0 / 63.0, 6)

    def test_empty_rankings_raise(self, spark):
        from xdlake_spark.operators.retrieval import rrf_fuse
        with pytest.raises(ValueError, match="at least one"):
            rrf_fuse([])
