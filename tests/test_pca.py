"""Fixed-point power-iteration PCA: exact pure-Python twin, dominant-
direction recovery, partition invariance."""

from __future__ import annotations

import math

import pytest

from rag_document_parser_spark.operators import pca as P


def _vecs():
    # dominant direction u = normalize([3,1,0,0,-2,0,1,1]) + structured
    # second direction; all values derived from small ints (exact floats)
    u = [3, 1, 0, 0, -2, 0, 1, 1]
    w = [0, -1, 2, 0, 1, 1, 0, -1]
    rows = []
    for i in range(60):
        a = (i % 11) - 5          # spread along u: -5..5
        b = ((i * 7) % 3) - 1     # small spread along w: -1..1
        rows.append((i, [a * ui * 0.11 + b * wi * 0.013 + 0.05
                         for ui, wi in zip(u, w)]))
    return rows


def _sdiv(a, b):
    return (1 if a > 0 else -1 if a < 0 else 0) * (abs(a) // b)


def _py_pc1(rows, iters=3):
    d = len(rows[0][1])
    x4 = [[math.floor(x * 10_000) for x in v] for _, v in rows]
    n = len(x4)
    mean = [_sdiv(sum(r[j] for r in x4), n) for j in range(d)]
    c = [[r[j] - mean[j] for j in range(d)] for r in x4]
    v = [P.v0_e6(d)] * d
    for _ in range(iters):
        sc = [_sdiv(sum(ci * vi for ci, vi in zip(row, v)), 1_000_000)
              for row in c]
        w = [sum(c[r][j] * sc[r] for r in range(n)) for j in range(d)]
        mw = max(max(abs(x) for x in w), 1)
        shift = max(mw.bit_length() - 28, 0)
        w2 = [_sdiv(x, 1 << shift) for x in w]
        nrm = max(math.isqrt(sum(x * x for x in w2)), 1)
        v = [_sdiv(x * 1_000_000, nrm) for x in w2]
    return mean, v


def test_pc1_matches_python_twin_exactly_and_recovers_direction(spark):
    rows = _vecs()
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {r["dim"]: (r["mean_e4"], r["v_e6"]) for r in
           P.power_iteration_pc1(df, iters=3).collect()}
    # float32 storage: quantize from the float32-rounded values, exactly
    # as the engine reads them
    import struct
    f32 = [(i, [struct.unpack("f", struct.pack("f", x))[0] for x in v])
           for i, v in rows]
    mean, v = _py_pc1(f32, iters=3)
    assert got == {j: (mean[j], v[j]) for j in range(len(v))}
    # the recovered direction aligns with the planted dominant axis
    u = [3, 1, 0, 0, -2, 0, 1, 1]
    nu = math.sqrt(sum(x * x for x in u))
    vv = [got[j][1] / 1e6 for j in range(8)]
    nv = math.sqrt(sum(x * x for x in vv))
    cos = abs(sum(a * b for a, b in zip(u, vv)) / (nu * nv))
    assert cos > 0.99, (cos, vv)
    with pytest.raises(ValueError):
        P.power_iteration_pc1(df, iters=0)


def test_pc1_partition_invariant_and_projection_orders(spark):
    rows = _vecs()
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    a = sorted(map(tuple, P.power_iteration_pc1(df, iters=2).collect()))
    b = sorted(map(tuple, P.power_iteration_pc1(
        df.repartition(13), iters=2).collect()))
    assert a == b
    comp = P.power_iteration_pc1(df, iters=3)
    sc = {r["vec_id"]: r["pc1_e6"] for r in
          P.project_pc1(df, comp).collect()}
    assert len(sc) == len(rows)
    # projections along the dominant axis follow the planted coefficient
    # a = (i % 11) - 5 up to sign: correlate rank order
    import statistics
    coef = [(i % 11) - 5 for i in range(60)]
    proj = [sc[i] for i in range(60)]
    r = statistics.correlation(coef, proj)
    assert abs(r) > 0.99, r


def test_random_projection_distance_preservation_and_invariance(spark):
    rows = _vecs()
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = P.random_projection(df, out_dim=16, salt="t")
    y = {}
    for r in out.collect():
        y.setdefault(r["vec_id"], {})[r["j"]] = r["y_e4"]
    assert all(len(v) == 16 for v in y.values()) and len(y) == 60
    # JL property (loose): relative pairwise distances correlate between
    # the original and projected spaces (scaled by sqrt(out_dim))
    import math
    import statistics
    orig = {i: v for i, v in rows}
    d_o, d_p = [], []
    ids = list(range(0, 60, 7))
    for a in ids:
        for b in ids:
            if a >= b:
                continue
            d_o.append(math.dist(orig[a], orig[b]))
            d_p.append(math.sqrt(sum(
                (y[a][j] - y[b][j]) ** 2 for j in range(16))))
    assert statistics.correlation(d_o, d_p) > 0.7
    # deterministic + partition invariant
    a = sorted(map(tuple, out.collect()))
    b = sorted(map(tuple, P.random_projection(
        df.repartition(13), out_dim=16, salt="t").collect()))
    assert a == b
    import pytest as _pt
    with _pt.raises(ValueError):
        P.random_projection(df, out_dim=0)


def test_pca_components_deflation_exact_and_orthogonal(spark):
    rows = _vecs()
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {}
    for r in P.pca_components(df, k=2, iters=3).collect():
        got.setdefault(r["component"], {})[r["dim"]] = (r["mean_e4"],
                                                        r["v_e6"])
    assert set(got) == {1, 2} and all(len(v) == 8 for v in got.values())
    # python twin: component 1 identical to pc1; component 2 = pc1 of
    # the fixed-point-deflated residual
    import struct
    f32 = [(i, [struct.unpack("f", struct.pack("f", x))[0] for x in v])
           for i, v in rows]
    mean, v1 = _py_pc1(f32, iters=3)
    assert got[1] == {j: (mean[j], v1[j]) for j in range(8)}
    d = 8
    x4 = [[__import__("math").floor(x * 10_000) for x in v]
          for _, v in f32]
    c = [[r[j] - mean[j] for j in range(d)] for r in x4]
    c2 = []
    for row in c:
        raw = sum(ci * vi for ci, vi in zip(row, v1))
        c2.append([ci - _sdiv(raw * vi, 10 ** 12)
                   for ci, vi in zip(row, v1)])
    # rerun the iteration twin over the deflated matrix
    import math
    v = [P.v0_e6(d)] * d
    for _ in range(3):
        sc = [_sdiv(sum(ci * vi for ci, vi in zip(row, v)), 1_000_000)
              for row in c2]
        w = [sum(c2[r][j] * sc[r] for r in range(len(c2)))
             for j in range(d)]
        mw = max(max(abs(x) for x in w), 1)
        shift = max(mw.bit_length() - 28, 0)
        w2 = [_sdiv(x, 1 << shift) for x in w]
        nrm = max(math.isqrt(sum(x * x for x in w2)), 1)
        v = [_sdiv(x * 1_000_000, nrm) for x in w2]
    assert {j: got[2][j][1] for j in range(8)} == dict(enumerate(v))
    # components are near-orthogonal unit vectors
    a = [got[1][j][1] / 1e6 for j in range(8)]
    b = [got[2][j][1] / 1e6 for j in range(8)]
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    assert 0.98 < na < 1.02 and 0.98 < nb < 1.02
    cos = abs(sum(x * y for x, y in zip(a, b)) / (na * nb))
    assert cos < 0.05, (cos, a, b)
    with pytest.raises(ValueError):
        P.pca_components(df, k=0)


def test_project_components_matches_per_component_projection(spark):
    rows = _vecs()
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    comps = P.pca_components(df, k=2, iters=3)
    long = {(r["vec_id"], r["component"]): r["score_e6"]
            for r in P.project_components(df, comps).collect()}
    assert len(long) == 120
    # component 1 scores equal the single-component projection exactly
    c1 = comps.where("component = 1").select("dim", "mean_e4", "v_e6")
    pc1 = {r["vec_id"]: r["pc1_e6"] for r in
           P.project_pc1(df, c1).collect()}
    assert all(long[(i, 1)] == pc1[i] for i in pc1)
    # the 2-dim representation separates the planted axes: scores along
    # component 1 track coefficient a, component 2 tracks b
    import statistics
    a = [(i % 11) - 5 for i in range(60)]
    b = [((i * 7) % 3) - 1 for i in range(60)]
    s1 = [long[(i, 1)] for i in range(60)]
    s2 = [long[(i, 2)] for i in range(60)]
    assert abs(statistics.correlation(a, s1)) > 0.99
    assert abs(statistics.correlation(b, s2)) > 0.9


def test_mean_pool_and_truncate_normalize(spark):
    import math

    from rag_document_parser_spark.operators import vectorize as VEC

    rows = [(i, [0.5, -0.25, 0.0, 1.0]) for i in range(4)] + \
           [(10, [1.0, 1.0, 1.0, 1.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pooled = {(r["grp"], r["dim"]): (r["mean_e6"], r["n_vecs"])
              for r in VEC.mean_pool(
                  df.selectExpr("vec_id div 4 as grp", "embedding"),
                  group_col="grp").collect()}
    # group 0 = four identical vectors: mean == the vector, n_vecs == 4
    assert pooled[(0, 0)] == (500_000, 4)
    assert pooled[(0, 1)] == (-250_000, 4)
    assert pooled[(2, 3)] == (1_000_000, 1)
    tn = {(r["vec_id"], r["dim"]): r["val_e6"]
          for r in VEC.truncate_normalize(df, m=2).collect()}
    # prefix [0.5, -0.25]: norm = sqrt(5000^2 + 2500^2)
    nrm = math.isqrt(5000 ** 2 + 2500 ** 2)
    assert tn[(0, 0)] == (5000 * 1_000_000) // nrm
    assert tn[(0, 1)] == -((2500 * 1_000_000) // nrm)
    # unit norm within quantization: sum of squares ~ 1e12
    ss = sum(tn[(0, j)] ** 2 for j in (0, 1))
    assert abs(ss - 10 ** 12) < 10 ** 9
    import pytest as _pt
    with _pt.raises(ValueError):
        VEC.truncate_normalize(df, m=0)
