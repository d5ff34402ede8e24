"""Distributed linear-model training as relational aggregates.

The reference engine ships no model training; this module exists for the
LLM-data-pipeline surface: a fastText-style quality / language classifier
(GPT-3 WebText filter, CCNet) trained IN the engine, so corpus curation
does not round-trip 100 TB through a separate ML system.

Design for exact cross-engine reproducibility (the same discipline as
functions/hashing.py and the MMR integer-micro-unit lesson):

* Features are hashed token FREQUENCIES on the 1e-3 integer grid:
  ``X_dj = round(c_dj · dims · 1000 / len_d)`` — the per-mille grid of
  ``frequency × dims``, which puts the average feature at ~1.0, the
  same scale as the bias, so one learning rate moves every coordinate.
  The hash is the 28-bit md5-slice family
  (``('0x' || substr(md5(tok), 1, 7))::BIGINT % dims`` in ANSI SQL),
  so an oracle can replay the featurization term for term.
* Features are CENTERED (``X̃ = X - M``, ``M_j = round(mean X_j)``) —
  without centering, all-positive correlated features force gradient
  descent to spend its few full-batch steps discovering the bias
  direction (measured: uncentered ~chance after 8 steps on a perfectly
  separable label; centered 100% in 4).  Centering is FREE in sparse
  form: fold ``M_j·Σr`` into each gradient and ``Σ_j W_j·M_j`` into
  the bias at score time — the stored features stay sparse.
* Weights live on the 1e-6 integer grid ("micro-units").  Every
  gradient is an INT64 sum of X·R products (R = the per-doc residual
  rounded to micro-units) — exact and order-independent, so
  shuffle/combine order can never flip a low bit.  The per-step
  floating-point ops (one division, one ``exp``, one ``round`` per
  doc; one mult+div+round per dim) are each a single IEEE op on
  identical inputs in any engine.  Driver-side rounding is HALF-AWAY
  (matching Spark/DuckDB ``round``), never Python's banker's.
* Batch gradient descent, one corpus pass per step; the step's
  gradient vector (``dims``+1 INT64s) is collected to the driver and
  re-embedded as literals — the kmeans_train lineage-cut pattern
  (similarity.py): step N+1's plan contains constants, not step N's
  DAG.  Driver traffic is dims+1 scalars per step, independent of
  corpus size.

At 100 TB: the feature explode is a projection (no shuffle); each step
shuffles only ``(dims+2)``-row partial aggregates (map-side combined);
nothing is per-row Python.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000
MILLE = 1_000


def _half_away(v: float) -> int:
    """Round half AWAY from zero — the ``round`` of Spark and DuckDB.
    Python's built-in ``round`` is banker's and would diverge from the
    SQL oracle on exact .5 values (the EWMA lesson)."""
    return int(math.floor(v + 0.5)) if v >= 0 else int(math.ceil(v - 0.5))


def _feature_hash(tok: Column, dims: int) -> Column:
    """28-bit md5-slice feature hash — engine-reproducible (see
    sketches._cms_col_hash / dedup.shingle_base_hash)."""
    return (
        F.conv(F.substring(F.md5(tok), 1, 7), 16, 10).cast("long")
        % F.lit(dims)
    ).cast("int")


def hashed_token_features(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dims: int = 64,
) -> DataFrame:
    """Hashed bag-of-words frequencies: ``(doc_id, j, x)`` with
    ``x = round(c_j · dims · 1000 / len)`` — per-mille ints of
    ``frequency × dims``.  Whitespace tokenization of lowercased text
    (exactly ``string_split(lower(text), ' ')``).  One explode + one
    map-side-combined (doc, j) count + one doc-keyed aggregate for the
    length; text itself never shuffles."""
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("__tok"),
    )
    counts = (
        toks.select("doc_id", _feature_hash(F.col("__tok"), dims).alias("j"))
        .groupBy("doc_id", "j")
        .agg(F.count(F.lit(1)).cast("long").alias("__c"))
    )
    lens = counts.groupBy("doc_id").agg(F.sum("__c").alias("__len"))
    return counts.join(lens, "doc_id").select(
        "doc_id",
        "j",
        F.round(F.col("__c") * F.lit(float(dims * MILLE)) / F.col("__len"), 0)
        .cast("long")
        .alias("x"),
    )


def _scores(
    feat: DataFrame,
    labels: DataFrame,
    w_micro: dict[int, int],
    b_micro: int,
    m_mille: dict[int, int],
) -> DataFrame:
    """Per-doc margin and probability under micro-unit weights over
    CENTERED features: ``z = (Σ_j W_j·X_j - Σ_j W_j·M_j + B·1000)/1e9``
    (both sums exact INT64; the centering sum is a driver-side Python
    int folded into the bias term; one IEEE division), then
    ``p = 1 / (1 + exp(-z))``.  Docs with no feature rows fall back to
    the centered bias via the left join + coalesce.  The weight vector
    rides as a dims-term CASE chain of literals — codegen'd, no join,
    the kmeans literal-embedding pattern (64–256 terms, nowhere near
    the janino method-size cliff).

    r16: the weight vector rides as ONE constant-folded array literal
    indexed by ``j`` (``get`` → NULL→0 for any out-of-range j, the
    same 0-contribution the old when-chain gave), not a dims-term CASE
    chain — per feature row that is one O(1) indexed load + multiply
    instead of O(dims) compare-and-adds, and the expression tree the
    driver re-analyzes per training step shrinks from 3·dims nodes to
    one (guide §1.2 per-task work; same exact INT64 sum either way)."""
    if any(int(v) for v in w_micro.values()):
        warr = F.array(
            *[
                F.lit(int(w_micro.get(j, 0))).cast("long")
                for j in range(max(w_micro) + 1)
            ]
        )
        contrib = (
            F.coalesce(F.get(warr, F.col("j")), F.lit(0).cast("long"))
            * F.col("x")
        )
    else:
        contrib = F.lit(0).cast("long")
    center = sum(
        int(w_micro[j]) * int(m_mille.get(j, 0)) for j in w_micro
    )
    per_doc = feat.groupBy("doc_id").agg(F.sum(contrib).alias("__zw"))
    z = (
        (
            F.coalesce(F.col("__zw"), F.lit(0))
            + F.lit(int(b_micro) * MILLE - center)
        )
        / F.lit(1.0e9)
    ).alias("z")
    return (
        labels.join(per_doc, "doc_id", "left")
        .select("doc_id", "y", z)
        .withColumn("p", F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("z"))))
    )


def logreg_train(
    df: DataFrame,
    label_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    dims: int = 64,
    steps: int = 4,
    lr: float = 4.0,
) -> tuple[dict[int, int], int, dict[int, int]]:
    """Train a hashed bag-of-words logistic regression by ``steps``
    full-batch gradient-descent passes over centered features; returns
    ``(w_micro, b_micro, m_mille)`` — per-dimension micro-unit weights,
    bias, and the per-mille feature means the weights are centered on.

    Per step, with current weights:
    ``R_d = round((p_d - y_d) · 1e6)``        (INT64 residual),
    ``G_j = Σ_d X_dj·R_d - M_j·Σ_d R_d``      (exact INT64 aggregate;
    the second term is the centering correction, computed from the
    bias pseudo-feature's gradient — no extra pass),
    ``W_j -= round(lr · G_j / (n·1000))``     (one FP mult+div, then
    half-away round).

    The bias is the pseudo-feature ``j = -1`` with ``X = 1000`` on
    every doc, so its gradient falls out of the SAME aggregate — each
    step is exactly ONE corpus pass shuffling dims+2 partial rows
    (map-side combined).  The collected gradient is dims+1 INT64s
    (bounded driver scalars, the kmeans centroid precedent).

    r16 step shape: after the (unchanged, bit-identical) sparse init,
    the step loop runs over a cached DENSE per-doc feature vector
    ``(doc_id, y, xs[dims])`` — margin, residual and ALL dims gradient
    sums evaluate in ONE grouping-free codegen'd aggregate per step
    (dims+1 INT64 accumulators, map-side combined, one collected row),
    instead of a per-doc score aggregate + residual join + (doc×dims)
    gradient aggregate (guide §1.1 "how many passes are fundamentally
    required" — one; §2.3 aggregate before you shuffle).  Every sum is
    the same order-independent exact INT64 (``xs[j] = 0`` for absent
    features contributes exactly the 0 the sparse join contributed by
    absence), so the trained model is bit-identical.
    """
    # Persist PRE-PARTITIONED on doc_id (r16), same as featb below: every
    # step's residual plan joins labels with the doc-keyed score
    # aggregate (whose partitioning comes from featb), so a co-partitioned
    # cache makes each step's (labels ⋈ per_doc) and (featb ⋈ resid)
    # joins exchange-free — the per-step shuffle is ONLY the dims+2-row
    # gradient aggregate. Unpartitioned labels re-shuffled the n-row
    # label/residual frame twice per step (guide §2.4: two operations
    # keyed the same way share one exchange).
    labels = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(label_col).cast("int").alias("y"),
    ).repartition(F.col("doc_id")).persist()
    featb = (
        hashed_token_features(df, text_col, id_col, dims)
        .unionByName(
            labels.select(
                "doc_id",
                F.lit(-1).alias("j"),
                F.lit(MILLE).cast("long").alias("x"),
            )
        )
        # Persist PRE-PARTITIONED on doc_id: every step's score
        # aggregate and residual join cluster on doc_id, so the cached
        # partitioning satisfies their distribution and the per-step
        # plans skip re-exchanging the (docs × dims)-row feature frame
        # — each step shuffles only the n-row residual frame.
        .repartition(F.col("doc_id"))
        .persist()
    )
    # Dense per-doc feature vector for the step loop, built FROM the
    # cached sparse frame (one cheap cached scan + per-doc map build):
    # xs[j] = X_dj, 0 where the sparse frame had no row — contributing
    # exactly the 0 that absence contributed through the old join.
    dense = (
        featb.where(F.col("j") >= 0)
        .groupBy("doc_id")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("j", "x"))
            ).alias("__fm")
        )
        .join(labels, "doc_id", "right")
        .select(
            "doc_id",
            "y",
            F.transform(
                F.sequence(F.lit(0), F.lit(dims - 1)),
                lambda i: F.coalesce(
                    # try_: ANSI element_at throws on a missing map key
                    F.try_element_at("__fm", i.cast("int")),
                    F.lit(0).cast("long"),
                ),
            ).alias("xs"),
        )
        .persist()
    )
    try:
        # One pass for doc count AND feature means: the bias row has
        # x = 1000 on every doc, so Σx over j = -1 is exactly 1000·n.
        sums = {
            r.j: int(r.sx)
            for r in featb.groupBy("j")
            .agg(F.sum("x").alias("sx"))
            .collect()
        }
        n = sums.pop(-1) // MILLE
        m_mille = {j: _half_away(sx / n) for j, sx in sums.items()}
        w_micro: dict[int, int] = {j: 0 for j in range(dims)}
        b_micro = 0
        xs = [F.element_at("xs", j + 1) for j in range(dims)]
        # Hoisted out of the step loop (r16): the dims+1 gradient sum
        # Columns are identical every step (they reference the "r"/"xs"
        # columns of the per-step select by name), and building them
        # costs ~0.5 s of driver time per step — Column construction
        # walks the py4j bridge plus PySpark's per-op call-site capture
        # once per expression node (guide §1.2: measure where the time
        # goes — this was plan CONSTRUCTION, not execution).
        grad_aggs = [F.sum("r").alias("rt")] + [
            F.sum(xs[j] * F.col("r")).alias(f"g{j}") for j in range(dims)
        ]
        for _ in range(steps):
            if not any(w_micro.values()) and b_micro == 0:
                # Closed-form first step (r16): with w = 0 and b = 0,
                # z = (0 - 0 + 0)/1e9 = 0 EXACTLY for every doc (with
                # or without feature rows), so p = 0.5 and the residual
                # is round((0.5 - y)·1e6) — a pure function of the
                # label column. The SQL oracle uses the same closed
                # form for its step 1.
                r_col = (
                    F.round((F.lit(0.5) - F.col("y")) * MICRO, 0)
                    .cast("long")
                    .alias("r")
                )
            else:
                # z = (Σ_j W_j·X_j - Σ_j W_j·M_j + B·1000)/1e9, the
                # weight vector unrolled as literal·element_at terms
                # (all-codegen; zero-weight terms dropped — they
                # contribute exactly 0 either way).
                zw = F.lit(0).cast("long")
                for j in range(dims):
                    w = int(w_micro.get(j, 0))
                    if w:
                        zw = zw + F.lit(w) * xs[j]
                center = sum(
                    int(w_micro[j]) * int(m_mille.get(j, 0))
                    for j in w_micro
                )
                z = (
                    zw + F.lit(int(b_micro) * MILLE - center)
                ) / F.lit(1.0e9)
                p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
                r_col = (
                    F.round((p - F.col("y")) * MICRO, 0)
                    .cast("long")
                    .alias("r")
                )
            g_row = dense.select(r_col, "xs").agg(*grad_aggs).collect()[0]
            r_total = int(g_row["rt"] or 0)
            for j in range(dims):
                g = int(g_row[f"g{j}"] or 0) - m_mille.get(j, 0) * r_total
                w_micro[j] -= _half_away(lr * g / (n * MILLE))
            b_micro -= _half_away(lr * r_total / n)
    finally:
        dense.unpersist()
        featb.unpersist()
        labels.unpersist()
    return w_micro, b_micro, m_mille


def logreg_score(
    df: DataFrame,
    w_micro: dict[int, int],
    b_micro: int,
    m_mille: dict[int, int],
    label_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    dims: int = 64,
) -> DataFrame:
    """Score ``df`` under trained micro-unit weights: returns
    ``(doc_id, y, p, pred)`` with ``p`` rounded to 6 (the engine's
    cross-engine float discipline) and ``pred = p > 0.5``."""
    feat = hashed_token_features(df, text_col, id_col, dims)
    labels = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(label_col).cast("int").alias("y"),
    )
    s = _scores(feat, labels, w_micro, b_micro, m_mille)
    return s.select(
        "doc_id",
        "y",
        F.round("p", 6).alias("p"),
        (F.col("p") > 0.5).cast("int").alias("pred"),
    )


def linreg_grouped(
    df: DataFrame,
    y_col: Column,
    x1_col: Column,
    x2_col: Column,
    group_cols: list[str],
) -> DataFrame:
    """Closed-form OLS — ``y ≈ b0 + b1·x1 + b2·x2`` — fit INDEPENDENTLY
    per group in ONE aggregate pass: the grouped normal equations.

    This is the "train a million small models" shape (per-tenant
    forecasters, per-segment calibrations) that at 100 TB must not
    round-trip through a driver loop: the sufficient statistics of OLS
    are nine sums (n, Σx1, Σx2, Σx1², Σx1x2, Σx2², Σy, Σx1y, Σx2y) —
    all map-side-combinable — and the 3×3 Cramer solve is a stateless
    per-group projection. One shuffle of 9 longs per group, whatever
    the row count; no model-fitting library, no collect.

    Cross-engine determinism (the module discipline): inputs must be
    INTEGER-VALUED (counts, quantities, money in cents) so the nine
    sums are exact BIGINTs in any aggregation order; each sum is then
    cast once to double (exact below 2^53) and the Cramer determinants
    are evaluated in ONE identical double-expression chain — bit-equal
    across engines. Emits per group: n, b0/b1/b2 (rounded 6dp) and r2
    (1 − SSE/SST, from the same sums).

    Degenerate groups (det = 0: constant or collinear features, or
    n < 3) emit NULL coefficients rather than dividing by zero.
    """
    y = y_col.cast("long")
    x1 = x1_col.cast("long")
    x2 = x2_col.cast("long")
    # Σy² can exceed 2^53 — keep every sum BIGINT-exact, cast once.
    sums = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x1).alias("s1"),
        F.sum(x2).alias("s2"),
        F.sum(x1 * x1).alias("s11"),
        F.sum(x1 * x2).alias("s12"),
        F.sum(x2 * x2).alias("s22"),
        F.sum(y).alias("sy"),
        F.sum(x1 * y).alias("s1y"),
        F.sum(x2 * y).alias("s2y"),
        F.sum(y * y).alias("syy"),
    )
    d = {
        c: F.col(c).cast("double")
        for c in ["n", "s1", "s2", "s11", "s12", "s22", "sy", "s1y", "s2y"]
    }
    # det of [[n,s1,s2],[s1,s11,s12],[s2,s12,s22]] and Cramer numerators
    det = (
        d["n"] * (d["s11"] * d["s22"] - d["s12"] * d["s12"])
        - d["s1"] * (d["s1"] * d["s22"] - d["s12"] * d["s2"])
        + d["s2"] * (d["s1"] * d["s12"] - d["s11"] * d["s2"])
    )
    det0 = (
        d["sy"] * (d["s11"] * d["s22"] - d["s12"] * d["s12"])
        - d["s1"] * (d["s1y"] * d["s22"] - d["s12"] * d["s2y"])
        + d["s2"] * (d["s1y"] * d["s12"] - d["s11"] * d["s2y"])
    )
    det1 = (
        d["n"] * (d["s1y"] * d["s22"] - d["s12"] * d["s2y"])
        - d["sy"] * (d["s1"] * d["s22"] - d["s12"] * d["s2"])
        + d["s2"] * (d["s1"] * d["s2y"] - d["s1y"] * d["s2"])
    )
    det2 = (
        d["n"] * (d["s11"] * d["s2y"] - d["s1y"] * d["s12"])
        - d["s1"] * (d["s1"] * d["s2y"] - d["s1y"] * d["s2"])
        + d["sy"] * (d["s1"] * d["s12"] - d["s11"] * d["s2"])
    )
    b0, b1, b2 = det0 / det, det1 / det, det2 / det
    # SSE = Σy² − (b0·Σy + b1·Σx1y + b2·Σx2y); SST = Σy² − (Σy)²/n.
    dyy = F.col("syy").cast("double")
    sse = dyy - (b0 * d["sy"] + b1 * d["s1y"] + b2 * d["s2y"])
    sst = dyy - d["sy"] * d["sy"] / d["n"]
    # Degeneracy guard note: `det != 0` is an exact float comparison on
    # a double expression whose intermediate products (e.g. s11·s22) can
    # exceed 2^53 and round — a truly collinear group with very large
    # sums can yield a tiny NONZERO det and emit huge coefficients
    # instead of NULLs. Kept deliberately: the gate oracle evaluates the
    # IDENTICAL chain (both engines agree bit-for-bit), and a relative-
    # magnitude threshold would need an epsilon the oracle can't mirror
    # portably. Library callers with near-collinear regressors at
    # >2^53-scale sums should pre-scale features (the documented
    # contract) rather than rely on this guard.
    ok = (F.col("n") >= 3) & (det != 0)
    out = sums.select(
        *group_cols,
        F.col("n").cast("long").alias("n"),
        F.when(ok, F.round(b0, 6)).alias("b0"),
        F.when(ok, F.round(b1, 6)).alias("b1"),
        F.when(ok, F.round(b2, 6)).alias("b2"),
        F.when(ok & (sst != 0), F.round(F.lit(1.0) - sse / sst, 6)).alias(
            "r2"
        ),
    )
    return out
