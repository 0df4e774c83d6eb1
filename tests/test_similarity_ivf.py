"""IVF ANN: exact replay of the algorithm in numpy must produce the
same result set, and recall vs brute force must clear a floor."""

from __future__ import annotations

import numpy as np


def _numpy_ivf(V: np.ndarray, ids: np.ndarray, labels: np.ndarray, nprobe=2, k=5):
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    # r13: centroid means are integer-quantized associative sums
    # (floor to 1e-6 units, BIGINT sum, two double divisions) —
    # mirror the engine's arithmetic exactly
    cent = np.stack([
        np.floor(V[labels == l] * 1e6).sum(axis=0) / 1e6
        / (labels == l).sum()
        for l in sorted(set(labels))
    ])
    cent = cent / np.linalg.norm(cent, axis=1, keepdims=True)
    csim = Vn @ cent.T
    # assignment: best centroid, centroid-id-asc tie-break (argmax is
    # first-max — matches row_number order (csim desc, cent_id asc))
    assign = csim.argmax(axis=1)
    out = {}
    for qi in np.where(ids < 10)[0]:
        probe = np.argsort(-csim[qi], kind="stable")[:nprobe]
        cand = np.where(np.isin(assign, probe))[0]
        cand = cand[cand != qi]
        sims = Vn[cand] @ Vn[qi]
        order = sorted(zip(-sims, ids[cand]))[:k]
        out[ids[qi]] = [int(nid) for _, nid in order]
    return out


def test_ivf_matches_numpy_replay_and_recall(spark, sf_dir):
    from mapreduce_citation_spark.operators.similarity import (
        knn_brute_cosine,
        knn_ivf_ann,
    )
    from mapreduce_citation_spark.sources.readers import load_table

    e = load_table(spark, sf_dir, "embeddings").collect()
    ids = np.array([r["vec_id"] for r in e])
    V = np.array([r["embedding"] for r in e], dtype=np.float64)
    labels = np.array([r["label"] for r in e])
    want = _numpy_ivf(V, ids, labels)

    rows = knn_ivf_ann(spark, sf_dir).collect()
    got: dict[int, list[int]] = {}
    for r in sorted(rows, key=lambda r: (r["query_id"], r["rank"])):
        got.setdefault(r["query_id"], []).append(r["neighbor_id"])
    assert got == want

    brute = {}
    for r in sorted(
        knn_brute_cosine(spark, sf_dir).collect(),
        key=lambda r: (r["query_id"], r["rank"]),
    ):
        brute.setdefault(r["query_id"], []).append(r["neighbor_id"])
    hits = sum(len(set(got[q]) & set(brute[q])) for q in brute)
    total = sum(len(v) for v in brute.values())
    assert hits / total >= 0.15  # observed ~0.3 on the fixture; ANN floor


def test_pq_matches_numpy_replay(spark, sf_dir):
    """knn_pq_ann replays exactly in numpy: same sample-as-codebook
    (first 16 vectors' subvectors), same L2 assignment with
    lowest-code tie-break, same ADC tables, same top-15 shortlist,
    same exact-cosine top-5 re-rank. Also sanity: PQ top-5 overlaps
    the brute-force top-5 (recall ≥ 0.2 on the fixture)."""
    import numpy as np

    from mapreduce_citation_spark.operators.similarity import (
        knn_brute_cosine,
        knn_pq_ann,
    )
    from mapreduce_citation_spark.sources.readers import load_table

    M, K, SUB, NQ, SHORT, TOPK = 4, 16, 16, 10, 15, 5
    e = load_table(spark, sf_dir, "embeddings").orderBy("vec_id").collect()
    ids = np.array([r["vec_id"] for r in e])
    X = np.array([r["embedding"] for r in e], dtype=np.float64)
    nrm = np.sqrt((X * X).sum(axis=1))
    codebook = X[:K].reshape(K, M, SUB)  # code, m, sub
    # assignment: per vector, per subspace, argmin L2 (ties -> lowest code)
    subs = X.reshape(len(X), M, SUB)
    d2 = ((subs[:, None, :, :] - codebook[None, :, :, :]) ** 2).sum(axis=3)
    codes = d2.argmin(axis=1)  # (n, m): argmin returns lowest index on ties
    want = {}
    for qi in range(NQ):
        tables = np.einsum("ms,kms->mk", subs[qi], codebook)  # (m, k)
        approx = np.array(
            [tables[m][codes[:, m]] for m in range(M)]
        ).sum(axis=0)
        order = sorted(
            [(i, approx[i]) for i in range(len(X)) if ids[i] != ids[qi]],
            key=lambda t: (-t[1], ids[t[0]]),
        )[:SHORT]
        rescored = sorted(
            [
                (ids[i], float(X[qi] @ X[i] / (nrm[qi] * nrm[i])))
                for i, _ in order
            ],
            key=lambda t: (-t[1], t[0]),
        )[:TOPK]
        for rank, (nid, cos) in enumerate(rescored, 1):
            want[(ids[qi], rank)] = (nid, cos)
    got = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["cosine"])
        for r in knn_pq_ann(spark, sf_dir).collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0]
        assert abs(got[k][1] - want[k][1]) < 1e-12
    brute = {}
    for r in knn_brute_cosine(spark, sf_dir).collect():
        brute.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    pq = {}
    for (q, _), (n, _) in got.items():
        pq.setdefault(q, set()).add(n)
    recall = sum(len(pq[q] & brute[q]) for q in brute) / sum(
        len(brute[q]) for q in brute
    )
    assert recall >= 0.2, f"PQ recall vs brute too low: {recall:.2f}"


def test_ann_recall_report_consistent_with_member_queries(spark, sf_dir):
    """The recall report must equal recall computed directly from the
    member operators' outputs, and IVF/PQ recall must clear the
    pytest recall floors the individual variants are held to."""
    from mapreduce_citation_spark.operators.similarity import (
        knn_ann_recall_report,
        knn_brute_cosine,
        knn_ivf_ann,
        knn_pq_ann,
    )

    brute = {
        (r["query_id"], r["neighbor_id"])
        for r in knn_brute_cosine(spark, sf_dir).collect()
    }
    got = {r["method"]: r for r in knn_ann_recall_report(spark, sf_dir).collect()}
    for method, fn in (("ivf", knn_ivf_ann), ("pq", knn_pq_ann)):
        ann = {(r["query_id"], r["neighbor_id"]) for r in fn(spark, sf_dir).collect()}
        r = got[method]
        assert r["n_true"] == len(brute)
        assert r["n_hit"] == len(ann & brute)
        assert abs(r["recall_at_5"] - len(ann & brute) / len(brute)) < 1e-15
        # 4-byte PQ codes on 64-dim synthetic data are lossy at this
        # corpus size; the floor documents sanity, not quality
        assert r["recall_at_5"] >= 0.3
