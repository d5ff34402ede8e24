"""Composed clean-corpus pipeline: semantics + plan shape."""

import pytest

from feast_java_old_spark.operators import pipeline


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # 1 and 2: exact duplicates after whitespace normalization → canonical 1
        (1, "the cat sat of the mat and it is that good for all of the day"),
        (2, "the  cat sat of the mat and it is that good for all of the day"),
        # 3: German
        (3, "der hund und die katze sind ein team mit den besten zu allen"),
        # 4: junk (all punctuation → low quality)
        (4, "!!! ??? ### $$$ %%% ^^^ &&& *** ((( )))"),
        # 5: good English
        (5, "a long story of the time it took to go to the sea and back for fun"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_clean_corpus_filters_and_dedups(docs):
    out = {r.doc_id: r for r in pipeline.clean_corpus(docs, min_quality=0.3).collect()}
    assert 1 in out and 2 not in out  # dup collapsed to canonical min id
    assert 3 not in out  # language gate
    assert 4 not in out  # quality gate
    assert 5 in out
    assert out[5].predicted_lang == "en"


def test_clean_corpus_single_scan_single_shuffle(docs):
    plan = (
        pipeline.clean_corpus(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1
    # what crosses the shuffle is the partial-min struct of signals —
    # the text column is not in it
    partial = next(l for l in plan.splitlines() if "partial_min" in l)
    assert "text" not in partial


def test_build_training_corpus_end_to_end(spark):
    """Composition semantics: exact dups collapse to the canonical copy,
    low quality drops, cross-doc chunks vanish, PII is scrubbed, and the
    mixing sample is deterministic."""
    from feast_java_old_spark.operators.pipeline import build_training_corpus

    # chunk_tokens=8: prefixes are exactly 8 tokens so the shared chunk
    # aligns on a chunk boundary in both docs (non-overlapping chunking
    # only dedups boundary-aligned repeats — the standard caveat).
    prefix1 = "the quick brown fox jumps over a dog"
    prefix4 = "it is a fine day for the animals"
    shared = " alpha beta gamma delta epsilon zeta eta theta"
    tail1 = " and then the small cat walks in quietly to see a@b.co"
    tail4 = " totally different continuation here my friend for the yard"
    docs = spark.createDataFrame(
        [
            (1, prefix1 + shared + tail1),
            (2, prefix1 + shared + tail1),  # exact dup
            (3, "x! y! z!"),  # low quality -> gated out
            (4, prefix4 + shared + tail4),
        ],
        "doc_id long, text string",
    )
    out = build_training_corpus(
        docs, min_quality=0.5, mix_rates={"en": 1.0}, chunk_tokens=8
    )
    rows = {r.doc_id: r for r in out.collect()}
    assert 2 not in rows  # dup collapsed to canonical id 1
    assert 3 not in rows  # quality gate
    assert 1 in rows and 4 in rows
    assert "[email]" in rows[1].text and "a@b.co" not in rows[1].text
    # the shared 8-token tail chunk is cross-doc duplicated -> removed
    assert "zeta eta theta" not in rows[1].text
    assert rows[4].n_removed >= 1
    # deterministic resample
    again = {r.doc_id for r in build_training_corpus(
        docs, min_quality=0.5, mix_rates={"en": 1.0}, chunk_tokens=8
    ).collect()}
    assert again == set(rows)


def test_rejection_report_partitions_input_and_agrees_with_clean(
    spark, sf_dir
):
    """The lineage invariant: every input doc gets exactly one verdict,
    the 'kept' set is exactly clean_corpus's output, and each rejected
    doc's verdict is the FIRST failing gate in pipeline order."""
    from feast_java_old_spark.operators.pipeline import (
        clean_corpus,
        rejection_report,
    )
    from feast_java_old_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    rep = rejection_report(docs, min_quality=0.55, lang="en")
    rows = rep.collect()
    assert len(rows) == docs.count()  # total function over the input
    kept = {r.doc_id for r in rows if r.verdict == "kept"}
    clean = {r.doc_id for r in clean_corpus(docs, min_quality=0.55).collect()}
    assert kept == clean
    # precedence: a duplicate is reported duplicate even if ALSO low
    # quality — no rejected doc carries a later-gate verdict while an
    # earlier gate also failed (duplicate rows have rn>1 by id order)
    by_verdict = {}
    for r in rows:
        by_verdict.setdefault(r.verdict, 0)
        by_verdict[r.verdict] += 1
    assert set(by_verdict) <= {"kept", "duplicate", "low_quality", "wrong_lang"}

    # precedence on a constructed corpus: doc 2 duplicates doc 1's
    # LOW-QUALITY text — it must report 'duplicate' (the first gate),
    # not 'low_quality'; the canonical copy reports the quality gate
    junk = "zzz qqq xxx"  # short, stopword-free -> low quality, non-en
    synth = spark.createDataFrame(
        [(1, junk), (2, junk)], "doc_id long, text string"
    )
    sv = {
        r.doc_id: r.verdict
        for r in rejection_report(synth, min_quality=0.55).collect()
    }
    assert sv[2] == "duplicate"
    assert sv[1] in ("low_quality", "wrong_lang")  # judged, not dup
