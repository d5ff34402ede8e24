"""PII detection and redaction for training-data pipelines.

Pure projections over built-in ``regexp_count`` / ``regexp_replace`` —
JVM-side, whole-stage-codegen'd, zero shuffles, linear in corpus bytes.
The pattern set is deliberately the **Java-regex ∩ RE2 common subset**
(character classes, bounded quantifiers, ``\\b`` word boundaries; no
lookaround, no backreferences) so the DuckDB oracle (RE2) evaluates the
exact same patterns.

Scrub order is fixed (email → ssn → phone → ipv4) and counts are taken
on the *original* text, so detection is independent of redaction and the
composition is deterministic.

At 100 TB: nothing here shuffles or calls Python; the scan's codegen
stage does all the work, and column pruning keeps untouched columns out
of the read when composed into a pipeline.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Ordered: earlier patterns are counted and scrubbed first; SSN before
# phone so `123-45-6789` never half-matches the phone pattern's remains.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "phone": r"\b\d{3}[-.]\d{3}[-.]\d{4}\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}


def pii_count_cols(text_col: str = "text") -> dict[str, Column]:
    """``n_<kind>`` count expressions over the original text."""
    t = F.col(text_col)
    return {
        f"n_{kind}": F.regexp_count(t, F.lit(pat)).cast("long")
        for kind, pat in PII_PATTERNS.items()
    }


def scrubbed_text_col(text_col: str = "text") -> Column:
    """Text with each PII kind replaced by ``[<KIND>]``, applied in
    ``PII_PATTERNS`` order."""
    out = F.col(text_col)
    for kind, pat in PII_PATTERNS.items():
        out = F.regexp_replace(out, pat, f"[{kind.upper()}]")
    return out


def scrub_pii(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document PII counts + redacted text.

    Returns (id, n_email, n_ssn, n_phone, n_ipv4, text) with ``text``
    scrubbed; counts reflect the original text.
    """
    counts = pii_count_cols(text_col)
    return df.select(
        F.col(id_col),
        *[c.alias(n) for n, c in counts.items()],
        scrubbed_text_col(text_col).alias(text_col),
    )


def k_anonymity(
    df: DataFrame,
    quasi_ids: list,
    k: int = 5,
) -> DataFrame:
    """k-anonymity audit over a quasi-identifier combination: every row's
    equivalence class size, whether the class meets the ``k`` floor, and
    the suppression decision a release pipeline would apply (classes
    below ``k`` must be suppressed or generalized before the table can
    ship to training).

    One hash aggregate keyed by the quasi-id tuple — map-side combined,
    the shuffle carries (quasi-ids, partial count), never full rows; the
    per-class verdict is a projection on the aggregate. Returns one row
    per equivalence class: ``(*quasi_ids, class_size, anonymous)``.
    """
    return (
        df.groupBy(*quasi_ids)
        .agg(F.count(F.lit(1)).alias("class_size"))
        .withColumn("anonymous", F.col("class_size") >= k)
    )
