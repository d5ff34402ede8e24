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
