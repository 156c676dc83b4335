"""Round-12 data-selection additions: SemDeDup / DSIR / trained quality
classifier. Value exactness is fully oracled (selfcheck/driver); these
tests pin the SEMANTICS — the selector prefers target-like documents, the
classifier learns the separating feature — on planted corpora where the
right answer is known by construction, plus structural invariants on the
real tables."""

from __future__ import annotations


def test_dsir_rank_contract(spark, sf_dir):
    """On the real corpus: ranks are 1..min(K, n_docs) with no gaps, and
    weights are non-increasing in rank (ties broken by doc_id, so the
    rank order IS the (weight DESC, doc_id) order)."""
    from big_data_medical_analysis_spark.operators.text_analysis import (
        DSIR_KEEP,
        dsir_importance_select,
    )
    from big_data_medical_analysis_spark.sources.readers import read_table

    rows = sorted(
        dsir_importance_select(spark, sf_dir).collect(), key=lambda r: r.rnk
    )
    n_docs = read_table(spark, sf_dir, "documents").count()
    assert [r.rnk for r in rows] == list(range(1, min(DSIR_KEEP, n_docs) + 1))
    for a, b in zip(rows, rows[1:]):
        assert (a.weight_micro, -a.doc_id) >= (b.weight_micro, -b.doc_id)


def test_dsir_planted_target_vocabulary_wins(spark):
    """DSIR's whole point: a raw-corpus doc written in the TARGET slice's
    vocabulary must outrank every doc written in the background
    vocabulary — the importance weight is the log-likelihood ratio of
    exactly that. Planted: 10 target docs (vocab A), 20 background docs
    (vocab B), one held-out non-target doc in vocab A."""
    from big_data_medical_analysis_spark.operators.text_analysis import (
        DSIR_TARGET_SOURCE,
        dsir_select,
    )

    vocab_a = ["alpha", "beta", "gamma", "delta", "epsi"]
    vocab_b = ["omega", "sigma", "tau", "rho", "phi"]
    text_a = " ".join(vocab_a[i % 5] for i in range(40))
    text_b = " ".join(vocab_b[i % 5] for i in range(40))
    rows = [(i, DSIR_TARGET_SOURCE, text_a) for i in range(10)]
    rows += [(100 + i, "src5", text_b) for i in range(20)]
    rows.append((999, "src7", text_a))  # target-like but NOT in the target
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {r.doc_id: r for r in dsir_select(docs).collect()}
    assert len(got) == 31  # K=100 > corpus: everything ranked
    planted = got[999]
    for i in range(20):
        assert planted.weight_micro > got[100 + i].weight_micro
        assert planted.rnk < got[100 + i].rnk
    assert planted.rnk <= 11  # only the 10 target docs may tie ahead


def test_quality_classifier_learns_separating_feature(spark):
    """Two GD steps must already order a linearly separable corpus: the
    curated slice is long docs, the background short, with the OTHER
    features (distinct fraction, token length) held identical by
    construction — so the score ordering is decided purely by the sign
    of the learned length weight. A held-out long NON-target doc must
    outscore every short doc (the classifier generalizes the feature,
    not the label column)."""
    from big_data_medical_analysis_spark.operators.text_analysis import (
        QC_TARGET_SOURCE,
        qc_train_score,
    )

    toks = [f"tok{i:02d}" for i in range(60)]  # all 5 chars
    long_text = " ".join(toks)  # 60 distinct tokens, avg len 5
    short_text = " ".join(toks[:10])  # 10 distinct tokens, avg len 5
    rows = [(i, QC_TARGET_SOURCE, long_text) for i in range(10)]
    rows += [(100 + i, "src5", short_text) for i in range(20)]
    rows.append((999, "src7", long_text))  # held-out long, not curated
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {r.doc_id: r for r in qc_train_score(docs).collect()}
    assert len(got) == 31
    assert all(0 <= r.score_micro <= 1_000_000 for r in got.values())
    # labels reflect the source column, scores reflect the learned model
    assert got[0].label == 1 and got[100].label == 0 and got[999].label == 0
    long_scores = [got[i].score_micro for i in range(10)] + [got[999].score_micro]
    short_scores = [got[100 + i].score_micro for i in range(20)]
    assert min(long_scores) > max(short_scores)
    # identical features ⇒ identical scores (the model is a pure function
    # of the feature row, never of doc identity)
    assert len(set(long_scores)) == 1 and len(set(short_scores)) == 1
