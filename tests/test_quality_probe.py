"""Unit tests for the trained linear quality probe (queries_ml.py):
the exact Cramer solve, its agreement with numpy's float solver, and
the end-to-end train/score/eval behavior on a session.
"""

from __future__ import annotations

import numpy as np
import pytest

from precios_nexo_sperant_etl_spark.queries_ml import _solve


def _moments_from(X, y):
    n = len(y)
    x1, x2 = X[:, 0], X[:, 1]
    return {"n_docs": n, "s1": int(x1.sum()), "s2": int(x2.sum()),
            "s11": int((x1 * x1).sum()), "s12": int((x1 * x2).sum()),
            "s22": int((x2 * x2).sum()), "b0": int(y.sum()),
            "b1": int((x1 * y).sum()), "b2": int((x2 * y).sum())}


def test_cramer_matches_numpy_lstsq():
    rng = np.random.RandomState(11)
    X = rng.randint(0, 1000, size=(200, 2)).astype(np.int64)
    y = (X[:, 1] > 500).astype(np.int64)
    w0, w1, w2, det = _solve(_moments_from(X, y))
    A = np.column_stack([np.ones(len(y)), X]).astype(np.float64)
    ref, *_ = np.linalg.lstsq(A, y.astype(np.float64), rcond=None)
    assert det != 0
    np.testing.assert_allclose([w0, w1, w2], ref, rtol=1e-9)


def test_exact_solve_recovers_exact_plane():
    # y generated exactly by a plane -> residual 0, weights exact
    X = np.array([[1, 0], [0, 1], [2, 3], [5, 1], [7, 2]], dtype=np.int64)
    # y = 3 + 2*x1 - x2 (integers)
    y = 3 + 2 * X[:, 0] - X[:, 1]
    w0, w1, w2, det = _solve(_moments_from(X, y))
    assert (w0, w1, w2) == (3.0, 2.0, -1.0)


def test_singular_gram_returns_nulls():
    # x2 identically zero: the 3x3 system is singular
    X = np.column_stack([np.arange(10), np.zeros(10)]).astype(np.int64)
    y = (np.arange(10) > 4).astype(np.int64)
    w0, w1, w2, det = _solve(_moments_from(X, y))
    assert w0 is None and w1 is None and w2 is None and det == 0.0


def test_probe_learns_on_testdata(spark):
    from precios_nexo_sperant_etl_spark.queries_ml import (
        _quality_linear_probe, _quality_probe_eval)
    probe = _quality_linear_probe(spark,
                                  "/root/testdata/sf0.001").collect()[0]
    # the Gram matrix is non-singular on real features and the solved
    # weights satisfy the normal equations exactly (integer moments,
    # one float division each — verifiable to a few ulps)
    assert probe["det"] != 0.0
    for lhs, rhs in (
        (probe["n_docs"] * probe["w0"] + probe["s1"] * probe["w1"]
         + probe["s2"] * probe["w2"], probe["b0"]),
        (probe["s1"] * probe["w0"] + probe["s11"] * probe["w1"]
         + probe["s12"] * probe["w2"], probe["b1"]),
        (probe["s2"] * probe["w0"] + probe["s12"] * probe["w1"]
         + probe["s22"] * probe["w2"], probe["b2"]),
    ):
        assert abs(lhs - rhs) < 1e-6 * max(1.0, abs(rhs))
    # NOTE: the synthetic corpus draws text independently of the lang
    # tag (en-stopword rates are ~uniform across langs), so there is no
    # learnable signal to assert on — only the mechanics.
    ev = _quality_probe_eval(spark,
                             "/root/testdata/sf0.001").collect()[0]
    n = ev["tp"] + ev["fp"] + ev["tn"] + ev["fn"]
    assert n == probe["n_docs"]
    assert ev["accuracy_milli"] == (ev["tp"] + ev["tn"]) * 1000 // n


def test_ridge_shrinks_toward_zero():
    import numpy as np
    from precios_nexo_sperant_etl_spark.queries_ml import (_RIDGE_LAMBDA,
                                                           _solve,
                                                           _solve_ridge)
    rng = np.random.RandomState(5)
    X = rng.randint(0, 1000, size=(300, 2)).astype(np.int64)
    y = (X[:, 0] + 2 * X[:, 1] > 1400).astype(np.int64)
    m = _moments_from(X, y)
    w0, w1, w2, _ = _solve(m)
    r0, r1, r2, _ = _solve_ridge(m, _RIDGE_LAMBDA * 100)
    # heavy lambda shrinks the penalized slopes in magnitude
    assert abs(r1) < abs(w1) and abs(r2) < abs(w2)
    # lambda=0 is exactly the unregularized solve
    assert _solve_ridge(m, 0) == _solve(m)


def test_elo_tdiv_matches_engines():
    """_tdiv must truncate toward zero — Spark `div` and DuckDB `//`
    semantics — where Python's `//` floors."""
    import duckdb

    from precios_nexo_sperant_etl_spark.queries_ml import _tdiv

    for a in (-1307, -25, -1, 0, 1, 24, 25, 1307):
        for b in (25, 1000, -25):
            got = _tdiv(a, b)
            want = duckdb.sql(f"SELECT ({a}) // ({b})").fetchone()[0]
            assert got == want, (a, b, got, want)


def test_elo_expectation_table_shape():
    from precios_nexo_sperant_etl_spark.queries_ml import _elo_table

    t = _elo_table()
    assert len(t) == 81
    assert t[40] == 500                      # equal ratings -> 1/2
    assert t[0] + t[80] == 999 or t[0] + t[80] == 1000  # symmetry (trunc)
    assert all(t[i] <= t[i + 1] for i in range(80))     # monotone


def test_isotonic_minimax_equals_pava(spark):
    """The minimax closed form used by isotonic_calibration (r11) must
    equal classic pool-adjacent-violators on weighted buckets."""
    import random

    rng = random.Random(7)
    buckets = [(i, rng.randint(1, 20), None) for i in range(12)]
    buckets = [(i, n, rng.randint(0, n)) for i, n, _ in buckets]

    def pava(rows):
        # stack of [n, pos] blocks merged while decreasing
        blocks = []
        for _, n, p in rows:
            blocks.append([n, p, 1])
            while len(blocks) > 1 and \
                    blocks[-2][1] * blocks[-1][0] >= \
                    blocks[-1][1] * blocks[-2][0]:
                n2, p2, c2 = blocks.pop()
                blocks[-1][0] += n2
                blocks[-1][1] += p2
                blocks[-1][2] += c2
        out = []
        for n, p, c in blocks:
            out.extend([p / n] * c)
        return out

    def minimax(rows):
        cp = [0]
        cn = [0]
        for _, n, p in rows:
            cp.append(cp[-1] + p)
            cn.append(cn[-1] + n)
        out = []
        for i in range(len(rows)):
            out.append(max(
                min((cp[k + 1] - cp[j]) / (cn[k + 1] - cn[j])
                    for k in range(i, len(rows)))
                for j in range(i + 1)))
        return out

    a, b = pava(buckets), minimax(buckets)
    assert all(abs(x - y) < 1e-12 for x, y in zip(a, b))
    # and the registered query's output is monotone non-decreasing
    from precios_nexo_sperant_etl_spark.registry import queries
    rows = queries()["isotonic_calibration"](
        spark, "/root/testdata/sf0.001").collect()
    iso = [r["iso_rate"] for r in rows]
    assert iso == sorted(iso)
    assert all(0.0 <= v <= 1.0 for v in iso)
