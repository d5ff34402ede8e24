"""Contract tests for the distributed logistic-regression trainer.

The guarantee under test is not one hash row at one SF but the MATH:
(a) every step of the distributed trainer is bit-identical to a pure
Python re-implementation of the integer-grid recurrence (featurize →
center → residual → gradient → half-away update), and (b) the trainer
actually LEARNS a separable concept in its few full-batch steps —
an always-zero weight vector would pass (a).
"""

import hashlib
import math

import pyspark.sql.functions as F

from feast_java_old_spark.operators import classify


def _py_featurize(docs, dims):
    """Pure-python mirror of hashed_token_features: per-mille ints of
    frequency × dims, md5-slice hash."""
    feats = {}
    for doc_id, text in docs:
        toks = text.lower().split(" ")
        counts = {}
        for t in toks:
            j = int(hashlib.md5(t.encode()).hexdigest()[:7], 16) % dims
            counts[j] = counts.get(j, 0) + 1
        feats[doc_id] = {
            j: _py_round(c * dims * 1000.0 / len(toks))
            for j, c in counts.items()
        }
    return feats


def _py_round(v):
    return int(math.floor(v + 0.5)) if v >= 0 else int(math.ceil(v - 0.5))


def _py_train(docs, labels, dims, steps, lr):
    """Pure-python mirror of classify.logreg_train."""
    feats = _py_featurize(docs, dims)
    n = len(docs)
    sums = {}
    for fv in feats.values():
        for j, x in fv.items():
            sums[j] = sums.get(j, 0) + x
    m = {j: _py_round(sx / n) for j, sx in sums.items()}
    w = {j: 0 for j in range(dims)}
    b = 0
    for _ in range(steps):
        grads, r_total = {}, 0
        for doc_id, _ in docs:
            s = sum(w[j] * x for j, x in feats[doc_id].items())
            center = sum(w[j] * m.get(j, 0) for j in w)
            z = (s - center + b * 1000) / 1.0e9
            p = 1.0 / (1.0 + math.exp(-z))
            r = _py_round((p - labels[doc_id]) * 1_000_000)
            r_total += r
            for j, x in feats[doc_id].items():
                grads[j] = grads.get(j, 0) + x * r
        for j in range(dims):
            g = grads.get(j, 0) - m.get(j, 0) * r_total
            w[j] -= _py_round(lr * g / (n * 1000))
        b -= _py_round(lr * r_total / n)
    return w, b, m


def test_logreg_train_bit_identical_to_python_oracle(spark):
    """Three gradient steps on a small corpus: every weight, the bias,
    and every feature mean must equal the pure-python recurrence
    EXACTLY (integer grid — no tolerance)."""
    docs = [
        (0, "red red red blue fish"),
        (1, "blue blue fish fish fish cat"),
        (2, "red cat cat dog"),
        (3, "dog dog dog dog red"),
        (4, "fish blue red blue"),
        (5, "cat dog fish"),
    ]
    labels = {0: 1, 1: 0, 2: 1, 3: 0, 4: 1, 5: 0}
    df = spark.createDataFrame(
        [(d, t, labels[d]) for d, t in docs],
        "doc_id long, text string, y int",
    )
    w, b, m = classify.logreg_train(df, "y", dims=8, steps=3, lr=4.0)
    pw, pb, pm = _py_train(docs, labels, dims=8, steps=3, lr=4.0)
    assert w == pw
    assert b == pb
    assert m == pm


def test_logreg_learns_separable_concept(spark):
    """Deterministic synthetic corpus: class 1 docs are dominated by
    'alpha', class 0 by 'omega', with shared filler. Four steps must
    reach >= 95% training accuracy AND produce a nonzero model (guards
    against the trivial all-zero passer)."""
    rows = []
    filler = "the a of and to in it is was on"
    for i in range(60):
        if i % 2:
            rows.append((i, f"alpha alpha alpha {filler} beta", 1))
        else:
            rows.append((i, f"omega omega omega {filler} beta", 0))
    df = spark.createDataFrame(rows, "doc_id long, text string, y int")
    w, b, m = classify.logreg_train(df, "y", dims=16, steps=4, lr=4.0)
    assert any(v != 0 for v in w.values())
    scored = classify.logreg_score(df, w, b, m, "y", dims=16)
    acc = (
        scored.where(F.col("pred") == F.col("y")).count() / scored.count()
    )
    assert acc >= 0.95


def test_hashed_token_features_grid_and_hash(spark):
    """Per-doc feature sum must be ~dims·1000 (frequencies sum to 1,
    up to per-term rounding), and the bucket of a known token must
    match the 28-bit md5 slice."""
    df = spark.createDataFrame(
        [(0, "x y z"), (1, "x x x x")], "doc_id long, text string"
    )
    feat = classify.hashed_token_features(df, dims=8)
    rows = feat.collect()
    per_doc = {}
    for r in rows:
        per_doc[r.doc_id] = per_doc.get(r.doc_id, 0) + r.x
    for total in per_doc.values():
        assert abs(total - 8000) <= 8  # one rounding step per term
    jx = int(hashlib.md5(b"x").hexdigest()[:7], 16) % 8
    assert {r.j for r in rows if r.doc_id == 1} == {jx}
    assert [r.x for r in rows if r.doc_id == 1] == [8000]


def test_linreg_grouped_recovers_exact_plane_and_degenerates(spark):
    """On noiseless integer data y = b0 + b1*x1 + b2*x2 the grouped
    normal equations must recover the plane exactly per group; a
    collinear group (x2 = 2*x1 -> det = 0) and a tiny group (n < 3)
    yield NULL coefficients, not a division blow-up."""
    from feast_java_old_spark.operators.classify import linreg_grouped

    rows = []
    # group g1: y = 7 + 3*x1 - 2*x2 over a non-degenerate grid
    for x1 in range(1, 7):
        for x2 in range(1, 5):
            rows.append(("g1", x1, x2, 7 + 3 * x1 - 2 * x2))
    # group g2: different plane y = -5 + x1 + 10*x2
    for x1 in range(1, 7):
        for x2 in range(1, 5):
            rows.append(("g2", x1, x2, -5 + x1 + 10 * x2))
    # g3: collinear features
    for x1 in range(1, 10):
        rows.append(("g3", x1, 2 * x1, x1))
    # g4: too small
    rows += [("g4", 1, 1, 1), ("g4", 2, 3, 4)]
    df = spark.createDataFrame(
        rows, "g string, x1 long, x2 long, y long"
    )
    import pyspark.sql.functions as F

    out = {
        r.g: r
        for r in linreg_grouped(
            df, F.col("y"), F.col("x1"), F.col("x2"), ["g"]
        ).collect()
    }
    assert (out["g1"].b0, out["g1"].b1, out["g1"].b2) == (7.0, 3.0, -2.0)
    assert out["g1"].r2 == 1.0
    assert (out["g2"].b0, out["g2"].b1, out["g2"].b2) == (-5.0, 1.0, 10.0)
    assert out["g3"].b0 is None and out["g3"].r2 is None
    assert out["g4"].b0 is None
    assert out["g4"].n == 2
