"""Skew-resistant join strategies.

Hot keys are the classic 100 TB join failure: a shuffle hash/sort-merge
join sends every row of a key to one reducer, so one celebrity user or
one default-valued key turns a 1000-executor join into a single-task
straggler (the ``key_skew_stats`` diagnostic in ``operators/text.py``
measures exactly this). AQE's skew-join splitting handles *sort-merge*
skew adaptively when partition sizes trip its thresholds; salting is the
deterministic, strategy-independent form — and the only option when the
skewed side must join a non-broadcastable dimension.

:func:`skew_join` implements classic salt-and-replicate: the fact side
gets a deterministic salt in ``[0, salt)`` derived by hashing its
payload columns (a pure row function — stable under task retry, no
``rand()``); the dimension side is replicated ``salt`` times via
``explode(sequence(...))``. The join key becomes (keys…, salt), so each
hot key fans out over ``salt`` reducers. Join results are provably
identical to the unsalted join: every fact row meets every dimension row
of its key exactly once (the dimension copy carrying that row's salt).

Cost model: dimension shuffle volume grows ``salt``×; fact volume is
unchanged. Use for inner/left joins of a skewed fact against a
moderate-size dimension that exceeds the broadcast threshold. (For
dimensions that *do* fit in memory, ``F.broadcast`` — used throughout
``operators/retrieval.py`` — is strictly better: no shuffle at all.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def skew_join(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str],
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``fact ⋈ dim`` on ``on`` with hot-key salting.

    ``how`` may be ``inner`` or ``left`` (outer semantics on the fact
    side are preserved: a fact row's single salt value always has a
    matching dimension replica when the key exists at all).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"skew_join supports inner/left, got {how!r}")
    if salt < 1:
        raise ValueError("salt must be >= 1")
    fact_salted = fact.withColumn(
        "__salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(salt)).cast(
            "int"
        ),
    )
    dim_salted = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return fact_salted.join(dim_salted, on=[*on, "__salt"], how=how).drop(
        "__salt"
    )
