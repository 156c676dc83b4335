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


# ---------------------------------------------------------------------------
# Round-12 continuation: DoReMi / CCNet bucketing / D4
# ---------------------------------------------------------------------------


def test_doremi_upweights_hard_domain(spark):
    """DoReMi's whole point: a domain the reference model finds HARD
    (high excess loss) must end up ABOVE uniform weight, and an easy
    domain below it. Planted: one domain of a single repeated common
    token (NLL ~ 0 excess), one domain of all-unique rare tokens."""
    from big_data_medical_analysis_spark.operators.text_analysis import (
        doremi_weights,
    )

    easy = " ".join("the" for _ in range(50))
    rows = [(i, "easy", "en", easy) for i in range(10)]
    rows += [
        (100 + i, "hard", "en", " ".join(f"tok{i}_{j}" for j in range(50)))
        for i in range(10)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, source string, lang string, text string"
    )
    got = {r.source: r for r in doremi_weights(docs).collect()}
    assert got["easy"].excess_q == 0
    assert got["hard"].excess_q > 0
    assert got["hard"].weight_micro > 500_000 > got["easy"].weight_micro
    # the smoothing mix keeps every domain at >= c·u
    assert got["easy"].weight_micro >= 100_000 * 500_000 // 1_000_000


def test_doremi_real_corpus_contract(spark, sf_dir):
    """On the real corpus: one row per source, excess clipped at >= 0,
    and the mixture sums to 1e6 within per-domain rounding. The expected
    source count is DERIVED from the documents table (ADVICE r12: a
    literal 20 coupled this test to the current corpus composition)."""
    from big_data_medical_analysis_spark.operators.text_analysis import (
        doremi_domain_weights,
    )
    from big_data_medical_analysis_spark.sources.readers import read_table

    n_sources = (
        read_table(spark, sf_dir, "documents").select("source").distinct().count()
    )
    rows = doremi_domain_weights(spark, sf_dir).collect()
    assert len(rows) == len({r.source for r in rows}) == n_sources > 0
    assert all(r.excess_q >= 0 for r in rows)
    assert all(r.weight_micro > 0 for r in rows)
    assert abs(sum(r.weight_micro for r in rows) - 1_000_000) <= len(rows)


def test_ccnet_planted_fluency_order(spark):
    """CCNet's contract: documents written in the corpus's common
    vocabulary land in the head, gibberish in the tail. Planted per
    bucket: 2 docs of a very common token, 2 mid-frequency, 2 all-unique."""
    from big_data_medical_analysis_spark.operators.text_analysis import (
        ccnet_buckets,
    )

    common = " ".join("the" for _ in range(30))
    mid = " ".join(f"mid{j % 5}" for j in range(30))
    rows = [(i, "s", "en", common) for i in range(2)]
    rows += [(10 + i, "s", "en", mid) for i in range(2)]
    rows += [
        (20 + i, "s", "en", " ".join(f"rare{i}_{j}" for j in range(30)))
        for i in range(2)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, source string, lang string, text string"
    )
    got = {r.bucket: r for r in ccnet_buckets(docs).collect()}
    assert set(got) == {"head", "middle", "tail"}
    assert all(r.n_docs == 2 for r in got.values())
    assert got["head"].nll_max_q <= got["middle"].nll_min_q
    assert got["middle"].nll_max_q <= got["tail"].nll_min_q


def test_ccnet_real_corpus_contract(spark, sf_dir):
    """On the real corpus: every language splits into 3 buckets whose
    counts differ by at most 1 (ANSI ntile), bucket NLL ranges are
    internally consistent and ordered head <= middle <= tail, and ppl_max
    is monotone in nll_max_q."""
    from collections import defaultdict

    from big_data_medical_analysis_spark.operators.text_analysis import (
        ccnet_perplexity_buckets,
    )

    by_lang = defaultdict(dict)
    for r in ccnet_perplexity_buckets(spark, sf_dir).collect():
        by_lang[r.lang][r.bucket] = r
    for lang, bs in by_lang.items():
        assert set(bs) == {"head", "middle", "tail"}, lang
        counts = [b.n_docs for b in bs.values()]
        assert max(counts) - min(counts) <= 1, (lang, counts)
        for b in bs.values():
            assert b.nll_min_q <= b.nll_mean_q <= b.nll_max_q, (lang, b)
        assert bs["head"].nll_max_q <= bs["middle"].nll_min_q, lang
        assert bs["middle"].nll_max_q <= bs["tail"].nll_min_q, lang
        assert (
            bs["head"].ppl_max <= bs["middle"].ppl_max <= bs["tail"].ppl_max
        ), lang


def test_d4_planted_two_stage_prune(spark):
    """Hierarchical-trajectory plant (round 14): N=8 derives k=4,
    kc=ceil(sqrt(4))=2 coarse cells (init v0, v1), each cell derives
    kf=1 fine cluster, so the final clusters ARE the two coarse cells
    with centroid = cell mean. Cell 0 = {0,4,5,6,7}: v0 points along
    the shared axis so every far member sees cosine 1/sqrt(5) ≈ 0.447
    > tau against it while the members pairwise sit at 0.2 < tau —
    SemDeDup prunes exactly v0 (the closest-to-centroid rank loser),
    and the four equidistant survivors tie, so the prototypicality
    stage prunes exactly floor(4*25/100) = 1, the lowest vec_id. Cell
    1 = {1,2,3}: near-orthogonal members (the +1 in dim 2 pulls v2/v3
    strictly toward the v1 init without raising any cosine above
    1e-6), nothing prunes. Global ids: cell*2^20 + fine."""
    from big_data_medical_analysis_spark.operators.similarity import (
        SEMDEDUP_CELL_SHIFT,
        d4_stats,
    )

    M = 1_000_000
    vecs = {
        0: [M, 0, 0, 0, 0, 0, 0, 0],  # cell-0 coarse init, the dup
        1: [0, M, 0, 0, 0, 0, 0, 0],  # cell-1 coarse init
        2: [0, 1, M, 0, 0, 0, 0, 0],  # strictly nearer cell 1 every round
        3: [0, 1, 0, M, 0, 0, 0, 0],
        4: [M, 0, 0, 0, 2 * M, 0, 0, 0],  # members: cosine 0.2 pairwise,
        5: [M, 0, 0, 0, 0, 2 * M, 0, 0],  # 1/sqrt(5) ~ 0.447 vs v0
        6: [M, 0, 0, 0, 0, 0, 2 * M, 0],
        7: [M, 0, 0, 0, 0, 0, 0, 2 * M],
    }
    vm = spark.createDataFrame(
        [(i, [int(x) for x in v]) for i, v in sorted(vecs.items())],
        "vec_id long, v array<long>",
    )
    got = {r.cluster: r for r in d4_stats(vm).collect()}
    assert set(got) == {0, SEMDEDUP_CELL_SHIFT}
    assert got[0].n_members == 5
    assert got[0].n_semdedup_pruned == 1
    assert got[0].n_proto_pruned == 1
    assert got[0].n_kept == 3
    c1 = got[SEMDEDUP_CELL_SHIFT]
    assert (
        c1.n_members,
        c1.n_semdedup_pruned,
        c1.n_proto_pruned,
        c1.n_kept,
    ) == (3, 0, 0, 3)


def test_d4_consistent_with_semdedup(spark, sf_dir):
    """D4's first stage IS the semdedup screen: per-cluster member and
    semdedup-pruned counts must match semdedup_prune_stats exactly, the
    prototype cut must respect floor((members - sem) * pct / 100), and
    the kept arithmetic must close."""
    from big_data_medical_analysis_spark.operators.similarity import (
        D4_PROTO_PCT,
        d4_prototype_prune,
        semdedup_prune_stats,
    )

    sem = {r.cluster: r for r in semdedup_prune_stats(spark, sf_dir).collect()}
    d4 = {r.cluster: r for r in d4_prototype_prune(spark, sf_dir).collect()}
    assert set(sem) == set(d4)
    for c, r in d4.items():
        assert r.n_members == sem[c].n_members
        assert r.n_semdedup_pruned == sem[c].n_pruned
        n_surv = r.n_members - r.n_semdedup_pruned
        assert r.n_proto_pruned == n_surv * D4_PROTO_PCT // 100
        assert r.n_kept == n_surv - r.n_proto_pruned >= 0


def test_hier_kc_sqrt_boundary_parity(spark):
    """Round-14 canary, the `_unigram_nll` sweep's sibling: the
    hierarchical trajectory's ONE float op is kc = ceil(sqrt(k)). IEEE
    754 REQUIRES sqrt correctly rounded (unlike log), and the derivation
    integer-corrects a ±1 drift anyway — this sweep proves both engines
    agree with exact integer isqrt at every boundary-adjacent k:
    perfect squares, squares ±1, and huge near-squares where a naive
    double sqrt WOULD be off by an ulp. A future engine/libm change
    that broke the invariant fails here, not in a probe run."""
    import math

    import duckdb

    ks = []
    for s in [2, 3, 4, 5, 10, 100, 1000, 10**6, 10**7, 94906265]:
        for dk in (-1, 0, 1):
            k = s * s + dk
            if k >= 4:
                ks.append(k)
    ks += [4, 6, 7, 12, 2**52 - 1, 2**52 + 1]
    # the IDENTICAL text both engines run (the _hier_kc_df / cc-CTE
    # derivation, minus the greatest() floor which is pure integer)
    sql = (
        "SELECT k, CASE WHEN s * s < k THEN s + 1 ELSE s END AS kc FROM ("
        "SELECT k, CASE WHEN s0 * s0 > k THEN s0 - 1 ELSE s0 END AS s "
        "FROM (SELECT k, CAST(floor(sqrt(CAST(k AS DOUBLE))) AS BIGINT)"
        " AS s0 FROM t))"
    )
    spark.createDataFrame(
        [(k,) for k in ks], "k long"
    ).createOrReplaceTempView("t")
    got = {r.k: r.kc for r in spark.sql(sql).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE t (k BIGINT)")
    con.executemany("INSERT INTO t VALUES (?)", [(k,) for k in ks])
    want_duck = dict(con.execute(sql).fetchall())
    assert len(got) == len(want_duck) == len(set(ks))
    for k in set(ks):
        s = math.isqrt(k)
        exact = s + (0 if s * s == k else 1)
        assert got[k] == exact, (k, got[k], exact)
        assert want_duck[k] == exact, (k, want_duck[k], exact)


def test_semdedup_oracle_parity_kc3_random_corpus(spark, tmp_path):
    """Round-14 gap closure: every driver scale factor derives kc = 2
    (N <= 500 -> k = 4), so the kc = 3 branch of the hierarchical
    trajectory — three coarse cells, a 3-way routing argmin, per-cell
    fine counts over unequal cells — had no cross-engine value check.
    Run the FULL registered query AND its registered DuckDB oracle on a
    seeded random 600-vector corpus (k = 5, kc = 3, ~2 fine clusters
    per cell) and require exact row-set equality. Random geometry also
    exercises ties/drops the hand-planted tests cannot."""
    import random

    import duckdb

    from big_data_medical_analysis_spark import registry

    rng = random.Random(20240814)
    rows = [
        (i, [rng.uniform(-1.0, 1.0) for _ in range(64)], i % 7)
        for i in range(600)
    ]
    sf_dir = str(tmp_path)
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.parquet(sf_dir + "/embeddings.parquet")

    registry._load_all()
    q = registry._REGISTRY["semdedup_prune_stats"]
    got = {
        (r.cluster, r.n_members, r.n_pruned, r.n_kept, r.prune_rate)
        for r in q.fn(spark, sf_dir).collect()
    }
    # kc = 3 must actually be in play, else this test went vacuous
    cells = {c >> 20 for c, *_ in got}
    assert cells == {0, 1, 2}, cells

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{sf_dir}/embeddings.parquet/*.parquet')"
    )
    want = {
        (c, m, p, k, rate)
        for c, m, p, k, rate in con.execute(q.oracle).fetchall()
    }
    assert got == want

    # the D4 prototype stage rides the same kc=3 sel — verify it too
    q4 = registry._REGISTRY["d4_prototype_prune"]
    got4 = {
        tuple(r) for r in (
            (r.cluster, r.n_members, r.n_semdedup_pruned,
             r.n_proto_pruned, r.n_kept, r.keep_rate)
            for r in q4.fn(spark, sf_dir).collect()
        )
    }
    want4 = {tuple(r) for r in con.execute(q4.oracle).fetchall()}
    assert got4 == want4


def test_unigram_nll_floor_boundary_parity(spark):
    """ADVICE r12 canary: the shared NLL quantization
    floor(ln((cw+1)/(n+vsz)) * 1e12) relies on JVM Math.log and DuckDB
    std::log producing bit-identical doubles — a 1-ulp divergence at an
    integer boundary would flip the floored int64 term inside DoReMi,
    CCNet, AND the per-domain reference NLL. This sweeps the (cw, n, vsz)
    triples whose quantized value lands CLOSEST to a floor boundary
    (within ~2 quantization-ulps, where a libm drift would actually
    flip) and asserts exact int64 agreement between the two engines, so
    any future libm change fails CI here rather than a bench run."""
    import math

    import duckdb

    from big_data_medical_analysis_spark.operators.text_analysis import (
        PPL_Q,
        UNLL_SMOOTH,
    )

    # brute-force a grid for near-boundary quantized values; one ulp of
    # ln(p) ~ 2^-52 * |ln p| -> * 1e12 gives the flippable band width
    cands = []
    for n in range(950, 1100):
        for cw in range(1, 60):
            for vsz in (37, 271, 997):
                p = (cw + UNLL_SMOOTH) / (n + UNLL_SMOOTH * vsz)
                q = math.log(p) * PPL_Q
                frac = q - math.floor(q)
                band = abs(math.log(p)) * 2.0 ** -52 * PPL_Q * 2
                if frac < band or (1 - frac) < band:
                    cands.append((cw, n, vsz))
    # always include a fixed spread so the test never goes vacuous
    cands.extend((c, 1000, 271) for c in range(1, 40))
    rows = [(int(c), int(n), int(v)) for c, n, v in cands]
    df = spark.createDataFrame(rows, "cw long, n_all long, vsz long")
    from pyspark.sql import functions as F

    got = {
        (r.cw, r.n_all, r.vsz): r.lq
        for r in df.select(
            "cw", "n_all", "vsz",
            F.floor(
                F.log(
                    (F.col("cw") + F.lit(UNLL_SMOOTH))
                    / (F.col("n_all") + F.lit(UNLL_SMOOTH) * F.col("vsz"))
                )
                * PPL_Q
            )
            .cast("long")
            .alias("lq"),
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t (cw BIGINT, n_all BIGINT, vsz BIGINT)"
    )
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    want = {
        (cw, n, v): lq
        for cw, n, v, lq in con.execute(
            f"SELECT cw, n_all, vsz, CAST(floor(ln((cw + {UNLL_SMOOTH}) "
            f"/ (n_all + {UNLL_SMOOTH} * vsz)) * {PPL_Q}) AS BIGINT) FROM t"
        ).fetchall()
    }
    assert len(got) == len(want) >= 39
    diffs = {k: (got[k], want[k]) for k in got if got[k] != want[k]}
    assert diffs == {}, f"libm drift at floor boundaries: {diffs}"


# ---------------------------------------------------------------------------
# Round 15: the published-selection capstone (SemDeDup -> DSIR -> DoReMi)
# ---------------------------------------------------------------------------


def test_curated_epoch_planted_three_stages(spark):
    """End-to-end plant for ``curated_epoch`` on the d4 8-vector corpus
    (screen outcome known by construction: cell 0 = {0,4,5,6,7} prunes
    exactly v0, cell 1 = {1,2,3} prunes nothing). Docs align doc_id =
    vec_id so every stage's effect is observable in the output:

    - doc 0 carries PERFECT target-vocabulary text but is the semantic
      duplicate — stage 1 must drop it before DSIR can ever see it;
    - docs 1-3 are the 'src0' target slice (vocab A), docs 4-5 a
      target-like domain (vocab A), docs 6-7 an all-unique-token domain
      (vocab B) — stage 2 must weight vocab-A docs above vocab-B docs;
    - the unique-token domain is the HARD one (highest unigram NLL), so
      stage 3's EG step must hand it the largest mixture weight/quota.
    """
    from big_data_medical_analysis_spark.operators.selection import (
        SELECTION_EPOCH,
        curated_epoch,
    )
    from big_data_medical_analysis_spark.operators.text_analysis import (
        DSIR_TARGET_SOURCE,
    )

    M = 1_000_000
    vecs = {
        0: [M, 0, 0, 0, 0, 0, 0, 0],
        1: [0, M, 0, 0, 0, 0, 0, 0],
        2: [0, 1, M, 0, 0, 0, 0, 0],
        3: [0, 1, 0, M, 0, 0, 0, 0],
        4: [M, 0, 0, 0, 2 * M, 0, 0, 0],
        5: [M, 0, 0, 0, 0, 2 * M, 0, 0],
        6: [M, 0, 0, 0, 0, 0, 2 * M, 0],
        7: [M, 0, 0, 0, 0, 0, 0, 2 * M],
    }
    vm = spark.createDataFrame(
        [(i, [int(x) for x in v]) for i, v in sorted(vecs.items())],
        "vec_id long, v array<long>",
    )
    vocab_a = " ".join(["alpha", "beta", "gamma", "delta"] * 10)
    docs_rows = [(0, "src7", "en", vocab_a)]  # pruned dup, target-like text
    docs_rows += [(i, DSIR_TARGET_SOURCE, "en", vocab_a) for i in (1, 2, 3)]
    docs_rows += [(i, "easy", "en", vocab_a) for i in (4, 5)]
    docs_rows += [
        (i, "hard", "en", " ".join(f"rare{i}_{j}" for j in range(40)))
        for i in (6, 7)
    ]
    docs = spark.createDataFrame(
        docs_rows, "doc_id long, source string, lang string, text string"
    )
    rows = curated_epoch(vm, docs).collect()
    by_doc = {r.doc_id: r for r in rows}
    # stage 1: the semantically pruned doc never reaches the epoch, no
    # matter how target-like its text is
    assert 0 not in by_doc
    assert set(by_doc) <= {1, 2, 3, 4, 5, 6, 7}
    # stage 2: every drawn vocab-A doc outweighs every drawn vocab-B doc
    a_ws = [r.dsir_weight_micro for r in rows if r.doc_id in (1, 2, 3, 4, 5)]
    b_ws = [r.dsir_weight_micro for r in rows if r.doc_id in (6, 7)]
    assert a_ws and b_ws
    assert min(a_ws) > max(b_ws)
    # stage 3: the hard (all-unique-token) domain takes the largest
    # mixture weight; quotas follow the weights and sum to the epoch
    # within per-domain rounding
    by_src = {r.source: r for r in rows}
    assert by_src["hard"].doremi_weight_micro > by_src["easy"].doremi_weight_micro
    assert (
        by_src["hard"].doremi_weight_micro
        > by_src[DSIR_TARGET_SOURCE].doremi_weight_micro
    )
    quotas = {r.source: r.quota for r in rows}
    assert abs(sum(quotas.values()) - SELECTION_EPOCH) <= len(quotas)
    # the draw contract: per source, ranks are contiguous from 1 and
    # never exceed the quota
    for src in quotas:
        rnks = sorted(r.rnk for r in rows if r.source == src)
        assert rnks == list(range(1, len(rnks) + 1)), (src, rnks)
        assert rnks[-1] <= quotas[src], (src, rnks, quotas[src])


def test_curated_epoch_real_corpus_contract(spark, sf_dir):
    """On the real corpus: per-source ranks are contiguous from 1 and
    bounded by that source's quota, quotas are positive where drawn,
    doc_ids are distinct, and the total draw never exceeds the epoch
    plus per-domain rounding slack."""
    from big_data_medical_analysis_spark.operators.selection import (
        SELECTION_EPOCH,
        curated_corpus_epoch,
    )

    rows = curated_corpus_epoch(spark, sf_dir).collect()
    assert rows
    assert len({r.doc_id for r in rows}) == len(rows)
    by_src: dict = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    for src, rs in by_src.items():
        rnks = sorted(r.rnk for r in rs)
        assert rnks == list(range(1, len(rnks) + 1)), (src, rnks)
        quota = {r.quota for r in rs}
        assert len(quota) == 1 and rnks[-1] <= rs[0].quota > 0, (src, quota)
        w = {r.doremi_weight_micro for r in rs}
        assert len(w) == 1, (src, w)
    n_sources = len(by_src)
    assert len(rows) <= SELECTION_EPOCH + n_sources
