"""Fixed-point k-means: a pure-python/numpy replay of the quantized
Lloyd loop must reproduce the Spark result exactly, and the clustering
must be sane (all points assigned, inertia non-increasing across
iterations by Lloyd's monotonicity on the un-quantized update — here
checked as: final inertia no worse than the init-assignment inertia)."""

from __future__ import annotations

import numpy as np


def _trunc_div(a: int, b: int) -> int:
    """Truncate-toward-zero integer division (Spark ``div`` ≡ DuckDB
    ``//``); python's ``//`` floors, so negatives need the fix-up."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _replay(V: np.ndarray, ids: np.ndarray, k=8, iters=3, scale=1 << 20):
    Xq = np.floor(V.astype(np.float64) * scale).astype(np.int64)
    order = np.argsort(ids)
    cent = {c: Xq[order[c]].copy() for c in range(k)}

    def assign(cent):
        C = np.stack([cent[c] for c in range(k)])
        d = ((Xq[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        best = d.argmin(axis=1)  # ties: lowest cent_id (argmin is first-min)
        return best, d[np.arange(len(Xq)), best]

    init_inertia = int(assign(cent)[1].sum())
    for _ in range(iters):
        best, _ = assign(cent)
        for c in range(k):
            m = Xq[best == c]
            if len(m):
                s = m.sum(axis=0)
                cent[c] = np.array(
                    [_trunc_div(int(x), len(m)) for x in s], dtype=np.int64
                )
    best, dist = assign(cent)
    out = {}
    for c in range(k):
        mask = best == c
        if mask.any():
            out[c] = (
                int(mask.sum()),
                int(dist[mask].sum()),
                int(cent[c].sum()),
            )
    return out, init_inertia


def test_kmeans_matches_numpy_replay(spark, sf_dir):
    from mapreduce_citation_spark.operators.similarity import embedding_kmeans
    from mapreduce_citation_spark.sources.readers import load_table

    e = load_table(spark, sf_dir, "embeddings").collect()
    ids = np.array([r["vec_id"] for r in e])
    V = np.array([r["embedding"] for r in e], dtype=np.float64)
    want, init_inertia = _replay(V, ids)

    rows = embedding_kmeans(spark, sf_dir).collect()
    got = {
        r["cent_id"]: (r["n_points"], r["inertia_q"], r["centroid_checksum_q"])
        for r in rows
    }
    assert got == want
    assert sum(n for n, _, _ in got.values()) == len(ids)
    assert sum(i for _, i, _ in got.values()) <= init_inertia


def test_kcenter_matches_numpy_replay_and_invariants(spark, sf_dir):
    """Farthest-point traversal vs a numpy replay on the fixture:
    identical selection sequence and radii; radii non-increasing;
    2-approximation sanity (every point within the final coverage
    radius of some selected center)."""
    import numpy as np
    import pandas as pd

    from mapreduce_citation_spark.operators.similarity import (
        _KM_SCALE,
        kcenter_select,
    )
    from mapreduce_citation_spark.sources.readers import load_table

    e = load_table(spark, sf_dir, "embeddings")
    got = [
        (r["it"], r["center_id"], r["radius_sq"])
        for r in kcenter_select(e, 5).orderBy("it").collect()
    ]

    pdf = pd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"]).sort_values("vec_id")
    ids = pdf["vec_id"].to_numpy()
    X = np.floor(
        np.stack(pdf["embedding"].to_numpy()).astype(np.float64) * _KM_SCALE
    ).astype(np.int64)

    def d2(a, b):
        diff = a - b
        return (diff * diff).sum(axis=-1)

    mind = d2(X, X[0])  # init: min vec_id center
    expected = []
    for it in range(1, 6):
        best = np.lexsort((ids, -mind))[0]
        expected.append((it, int(ids[best]), int(mind[best])))
        mind = np.minimum(mind, d2(X, X[best]))
    assert got == expected
    radii = [r for _, _, r in got]
    assert radii == sorted(radii, reverse=True)
    # coverage: after selecting the 5 (plus init), max remaining
    # distance is <= the last selection radius
    assert mind.max() <= radii[-1]


def test_covariance_matches_numpy(spark, sf_dir):
    """The distributed BLAS-partial covariance equals numpy's full
    X^T X computed in one shot on the quantized matrix — exact
    integer sums, and the assembled cov matches np.cov (population,
    quantized) to double identity."""
    import numpy as np
    import pandas as pd

    from mapreduce_citation_spark.operators.similarity import (
        _KM_SCALE,
        embedding_covariance,
    )

    rows = embedding_covariance(spark, sf_dir).collect()
    assert len(rows) == 64 * 65 // 2
    pdf = pd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["embedding"])
    X = np.floor(
        np.stack(pdf["embedding"].to_numpy()).astype(np.float64) * _KM_SCALE
    ).astype(np.int64)
    G = X.T @ X
    sx = X.sum(axis=0)
    n = len(X)
    for r in rows:
        i, j = r["i"] - 1, r["j"] - 1
        assert i <= j
        assert r["sxy"] == G[i, j]
        expect = (float(G[i, j]) - float(sx[i]) * float(sx[j]) / n) / n
        assert r["cov"] == expect


def test_power_iteration_matches_integer_replay_and_eigengap(spark, sf_dir):
    """Two halves: (1) on the fixture, the distributed power method
    equals a python INTEGER replay of the same quantized recursion
    bit-for-bit, and its Rayleigh quotient improves on v0's (each
    power step is a monotone Rayleigh ascent); (2) on a PLANTED
    eigengap matrix (diag-dominant rank-1 spike) the same operator
    converges to the known top eigenvector — the fixture itself is
    near-isotropic (lambda1/lambda2 ~ 1.02), so convergence there
    would need hundreds of steps and is not the contract."""
    import numpy as np
    import pandas as pd

    from mapreduce_citation_spark.operators.similarity import (
        _KM_SCALE,
        _PI_GDIV,
        _PI_ITERS,
        _PI_VSCALE,
        embedding_power_iteration,
    )

    rows = embedding_power_iteration(spark, sf_dir).collect()
    assert len(rows) == 64
    got = np.array([r["v_q"] for r in sorted(rows, key=lambda r: r["pos"])],
                   dtype=np.int64)
    unit = np.array([r["v_unit"] for r in sorted(rows, key=lambda r: r["pos"])])

    pdf = pd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["embedding"])
    X = np.floor(
        np.stack(pdf["embedding"].to_numpy()).astype(np.float64) * _KM_SCALE
    ).astype(np.int64)
    G = (X.T @ X)
    def tdiv(a, b):
        # python // floors; Spark div / DuckDB // truncate toward zero
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q

    Gq = np.array([[tdiv(int(G[i, j]), _PI_GDIV) for j in range(64)]
                   for i in range(64)], dtype=object)
    v = np.array([_PI_VSCALE] * 64, dtype=object)
    for _ in range(_PI_ITERS):
        w = Gq @ v
        m = max(abs(int(x)) for x in w)
        v = np.array(
            [tdiv(int(x) * _PI_VSCALE, m) if m else 0 for x in w], dtype=object
        )
    assert [int(x) for x in v] == got.tolist()

    Gf = np.array(Gq.tolist(), dtype=np.float64)
    rayleigh = lambda u: float(u @ Gf @ u) / float(u @ u)  # noqa: E731
    v0 = np.ones(64)
    assert rayleigh(got.astype(np.float64)) > rayleigh(v0)
    assert np.isclose(float(unit @ unit), 1.0, atol=1e-9)

    # planted eigengap: G = I + 50 * t t^T (unit t) — the top
    # eigenvector IS t, lambda1/lambda2 = 51
    from mapreduce_citation_spark.operators.similarity import power_iterate

    rng = np.random.default_rng(11)
    t = rng.standard_normal(64)
    t /= np.linalg.norm(t)
    P = (np.eye(64) * 1000 + 50_000 * np.outer(t, t)).astype(np.int64)
    gq = spark.createDataFrame(
        [(i + 1, j + 1, int(P[i, j])) for i in range(64) for j in range(64)],
        ["i", "j", "g"],
    )
    v = power_iterate(spark, gq, dim=64, iters=8).collect()
    vv = np.array([r["val"] for r in sorted(v, key=lambda r: r["pos"])],
                  dtype=np.float64)
    cos = abs(float(vv @ t)) / np.linalg.norm(vv)
    assert cos >= 0.999, f"planted top eigenvector missed: |cos| = {cos}"


def test_pca_scores_match_integer_replay(spark, sf_dir):
    """Projection scores equal the exact integer dot products of the
    quantized embeddings with the bit-replayed power-iteration
    direction (full 500-row apply)."""
    import numpy as np
    import pandas as pd

    from mapreduce_citation_spark.operators.similarity import (
        _KM_SCALE,
        _PI_GDIV,
        _PI_ITERS,
        _PI_VSCALE,
        embedding_pca_scores,
    )

    rows = embedding_pca_scores(spark, sf_dir).collect()
    pdf = pd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    X = np.floor(
        np.stack(pdf["embedding"].to_numpy()).astype(np.float64) * _KM_SCALE
    ).astype(np.int64)

    def tdiv(a, b):
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q

    G = X.T @ X
    Gq = np.array([[tdiv(int(G[i, j]), _PI_GDIV) for j in range(64)]
                   for i in range(64)], dtype=object)
    v = np.array([_PI_VSCALE] * 64, dtype=object)
    for _ in range(_PI_ITERS):
        w = Gq @ v
        m = max(abs(int(x)) for x in w)
        v = np.array([tdiv(int(x) * _PI_VSCALE, m) if m else 0 for x in w],
                     dtype=object)
    want = {
        int(vid): int(sum(int(a) * int(b) for a, b in zip(xrow, v)))
        for vid, xrow in zip(pdf["vec_id"], X)
    }
    got = {r["vec_id"]: r["score_q"] for r in rows}
    assert got == want and len(got) == len(X)
