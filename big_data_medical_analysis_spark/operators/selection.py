"""Published-selection capstone: the curation pipeline composed end-to-end.

The selection family's members are graded individually — hierarchical
SemDeDup / D4 (`operators/similarity.py`), DSIR importance selection and
DoReMi domain reweighting (`operators/text_analysis.py`) — but a 100 TB
curation loop runs them as ONE plan: semantic dedup first (don't spend
importance weight on near-duplicates), distribution-matching selection
second (pick the target-like survivors), learned-mixture quota draw last
(assemble the training epoch). This module fuses exactly that chain the
way `governed_mixture_sample` (`operators/dedup.py`) fused the dedup
governance pillar: every stage is the already-verified factored core, the
composition is plumbing, and the whole trajectory replays bit-for-bit in
DuckDB (VERDICT r14 task 3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from big_data_medical_analysis_spark.operators.similarity import (
    _kmeans_vm,
    _semdedup_screen,
    _semdedup_screen_ctes,
)
from big_data_medical_analysis_spark.operators.text_analysis import (
    DOREMI_CMIX_MICRO,
    DOREMI_ETA,
    DOREMI_EXCESS_CAP_Q,
    DSIR_BUCKETS,
    DSIR_KEEP,
    DSIR_TARGET_SOURCE,
    PPL_Q,
    UNLL_SMOOTH,
    doremi_weights,
    dsir_select,
)
from big_data_medical_analysis_spark.registry import register
from big_data_medical_analysis_spark.sources.readers import read_table

# Epoch size of the final quota draw: the scheduler asks the curated pool
# for this many documents per epoch, split across domains by the DoReMi
# weights. Deliberately smaller than DSIR_KEEP so the draw is a real cut.
SELECTION_EPOCH = 40


def _curate_oracle() -> str:
    """FULL DuckDB replay of the three-stage composition: the hierarchical
    SemDeDup screen (``_semdedup_screen_ctes`` — two-level Lloyd
    trajectory through `sel`/`pruned`), the DSIR chain re-expressed over
    the keeper docs (the ``_DSIR_SQL`` CTEs verbatim with `documents`
    swapped for `kdocs` and d-prefixed names), the shared unigram-NLL +
    DoReMi EG step over the DSIR-selected docs (the ``_UNLL_CTES`` /
    ``_DOREMI_SQL`` algebra, u/d-prefixed), then the per-domain quota and
    the uniform md5 race. Every stage is exact integer algebra with one
    quantized transcendental per row-group (ln per bucket, exp per
    domain) — the same discipline each member's own oracle already
    proves."""
    return (
        _semdedup_screen_ctes()
        + f""", keepers AS MATERIALIZED (
  SELECT s.vec_id
  FROM sel s
  LEFT JOIN pruned p ON p.cluster = s.cluster AND p.vec_id = s.vec_id
  WHERE p.vec_id IS NULL
), kdocs AS MATERIALIZED (
  SELECT d.doc_id, d.source, d.lang, d.text
  FROM documents d JOIN keepers k ON k.vec_id = d.doc_id
), dt AS (
  SELECT doc_id, source, string_split(text, ' ') AS toks FROM kdocs
), dg AS (
  SELECT dt.doc_id, dt.source,
         CAST(concat('0x', substr(md5(u.gram), 1, 8)) AS BIGINT)
           % {DSIR_BUCKETS} AS bucket
  FROM dt, unnest(list_concat(
    dt.toks,
    list_transform(list_zip(dt.toks[1:len(dt.toks) - 1],
                            dt.toks[2:len(dt.toks)]),
                   z -> z[1] || ' ' || z[2])
  )) AS u(gram)
), ddb AS MATERIALIZED (
  SELECT doc_id, source, bucket, CAST(count(*) AS BIGINT) AS c
  FROM dg GROUP BY 1, 2, 3
), drb AS (SELECT bucket, CAST(sum(c) AS BIGINT) AS c FROM ddb GROUP BY 1),
dtb AS (
  SELECT bucket, CAST(sum(c) AS BIGINT) AS c
  FROM ddb WHERE source = '{DSIR_TARGET_SOURCE}' GROUP BY 1
), dtot AS (
  SELECT (SELECT CAST(sum(c) AS BIGINT) FROM dtb) AS t_n,
         (SELECT CAST(sum(c) AS BIGINT) FROM drb) AS r_n
), dlam AS (
  SELECT drb.bucket,
         CAST(round(ln(
           ((coalesce(dtb.c, 0) + 1.0) / (dtot.t_n + {DSIR_BUCKETS}))
           / ((drb.c + 1.0) / (dtot.r_n + {DSIR_BUCKETS}))
         ) * 1000000) AS BIGINT) AS lam_micro
  FROM drb LEFT JOIN dtb USING (bucket) CROSS JOIN dtot
), dwt AS (
  SELECT ddb.doc_id, CAST(sum(ddb.c * dlam.lam_micro) AS BIGINT)
           AS weight_micro
  FROM ddb JOIN dlam USING (bucket) GROUP BY 1
), dsel AS MATERIALIZED (
  SELECT doc_id, source, weight_micro, rnk
  FROM (
    SELECT dwt.doc_id, k.source, dwt.weight_micro,
           row_number() OVER (ORDER BY dwt.weight_micro DESC, dwt.doc_id)
             AS rnk
    FROM dwt JOIN kdocs k USING (doc_id)
  )
  WHERE rnk <= {DSIR_KEEP}
), ddocs AS MATERIALIZED (
  SELECT k.doc_id, k.source, k.lang, k.text
  FROM kdocs k JOIN dsel USING (doc_id)
), utok AS MATERIALIZED (
  SELECT doc_id, source, lang, unnest(string_split(text, ' ')) AS w
  FROM ddocs
), uuni AS (SELECT w, CAST(count(*) AS BIGINT) AS cw FROM utok GROUP BY w),
utot AS (SELECT CAST(count(*) AS BIGINT) AS n_all FROM utok),
uv AS (SELECT CAST(count(*) AS BIGINT) AS vsz FROM uuni),
uscored AS (
  SELECT t.doc_id, t.source, t.lang,
         CAST(floor(ln((uuni.cw + {UNLL_SMOOTH})
                       / (utot.n_all + {UNLL_SMOOTH} * uv.vsz))
                    * {PPL_Q}) AS BIGINT) AS lq
  FROM utok t
  JOIN uuni USING (w)
  CROSS JOIN utot
  CROSS JOIN uv
), unll2 AS MATERIALIZED (
  SELECT doc_id, source, lang, CAST(count(*) AS BIGINT) AS n_tokens,
         sum(lq) AS sum_lq
  FROM uscored GROUP BY doc_id, source, lang
), dom AS (
  SELECT source, CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
         sum(sum_lq) AS sum_lq
  FROM unll2 GROUP BY source
), domq AS (
  SELECT source,
         CAST(round(-CAST(sum_lq AS DOUBLE) / CAST(n_tokens AS DOUBLE))
              AS BIGINT) AS nll_q
  FROM dom
), dref AS (
  SELECT CAST(round(-CAST(sum(sum_lq) AS DOUBLE)
                    / CAST(sum(n_tokens) AS DOUBLE)) AS BIGINT) AS ref_q
  FROM dom
), dex AS (
  SELECT d.source,
         least(CAST({DOREMI_EXCESS_CAP_Q} AS BIGINT),
               greatest(CAST(0 AS BIGINT), d.nll_q - r.ref_q)) AS excess_q
  FROM domq d CROSS JOIN dref r
), dem AS (
  SELECT source, CAST(round(1000000.0 * exp({DOREMI_ETA}
                       * CAST(excess_q AS DOUBLE) / {PPL_Q})) AS BIGINT)
            AS e_micro
  FROM dex
), dtote AS (
  SELECT CAST(sum(e_micro) AS BIGINT) AS tot_e,
         CAST(count(*) AS BIGINT) AS n_dom
  FROM dem
), dwm AS (
  SELECT dem.source,
         CAST(round(((1000000 - {DOREMI_CMIX_MICRO})
                     * CAST(round(1000000.0 * dem.e_micro / t.tot_e)
                            AS BIGINT)
                     + {DOREMI_CMIX_MICRO}
                     * CAST(round(1000000.0 / t.n_dom) AS BIGINT))
                    / 1000000.0) AS BIGINT) AS doremi_weight_micro
  FROM dem CROSS JOIN dtote t
), qtot AS (
  SELECT CAST(sum(doremi_weight_micro) AS BIGINT) AS total_micro FROM dwm
), quota AS (
  SELECT source, doremi_weight_micro,
         CAST(round({SELECTION_EPOCH}.0 * doremi_weight_micro
                    / total_micro) AS BIGINT) AS quota
  FROM dwm, qtot
), rankd AS (
  SELECT doc_id, source, weight_micro AS dsir_weight_micro,
         row_number() OVER (
           PARTITION BY source
           ORDER BY CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)
                         || ':curate'), 1, 8)) AS BIGINT), doc_id) AS rnk
  FROM dsel
)
SELECT r.doc_id, r.source, CAST(r.rnk AS INTEGER) AS rnk, q.quota,
       r.dsir_weight_micro, q.doremi_weight_micro
FROM rankd r JOIN quota q USING (source)
WHERE r.rnk <= q.quota"""
    )


def curated_epoch(vm: DataFrame, docs: DataFrame) -> DataFrame:
    """Core of ``curated_corpus_epoch`` over any (vec_id, v) int64-micro
    vector table and any (doc_id, source, lang, text) document table with
    doc_id = vec_id — factored out so the pytest can plant a semantic
    duplicate (must never reach the epoch) and a target-like slice (must
    dominate the DSIR cut) and prove the composition end to end."""
    assign, pruned = _semdedup_screen(vm)
    keepers = assign.join(pruned, ["cluster", "vec_id"], "left_anti").select(
        F.col("vec_id").alias("doc_id")
    )
    kdocs = docs.join(keepers, "doc_id")
    dsel = dsir_select(kdocs)
    ddocs = docs.join(dsel.select("doc_id"), "doc_id")
    dwm = doremi_weights(ddocs).select(
        "source", F.col("weight_micro").alias("doremi_weight_micro")
    )
    qtot = dwm.agg(
        F.sum("doremi_weight_micro").cast("long").alias("total_micro")
    )
    quota = dwm.crossJoin(F.broadcast(qtot)).select(
        "source",
        "doremi_weight_micro",
        F.round(
            F.lit(float(SELECTION_EPOCH))
            * F.col("doremi_weight_micro")
            / F.col("total_micro")
        )
        .cast("long")
        .alias("quota"),
    )
    # Uniform within-domain draw (DoReMi samples the domain by weight,
    # then uniformly within it): portable md5 race keyed on ':curate' so
    # the draw is independent of governed_mixture_sample's length-weighted
    # race. Window is partitioned by source over DSIR_KEEP rows — never a
    # corpus-sized single partition.
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":curate"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    wr = W.partitionBy("source").orderBy(h.asc(), F.asc("doc_id"))
    rankd = dsel.select(
        "doc_id", "source", F.col("weight_micro").alias("dsir_weight_micro")
    ).withColumn("rnk", F.row_number().over(wr).cast("integer"))
    return (
        rankd.join(F.broadcast(quota), "source")
        .filter(F.col("rnk") <= F.col("quota"))
        .select(
            "doc_id",
            "source",
            "rnk",
            "quota",
            "dsir_weight_micro",
            "doremi_weight_micro",
        )
    )


@register("curated_corpus_epoch", oracle=_curate_oracle(), category="text")
def curated_corpus_epoch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The published-selection CAPSTONE (VERDICT r14 task 3): hierarchical
    SemDeDup keeper set → DSIR importance cut → DoReMi-weighted per-domain
    quota draw, fused into ONE lazy plan — the selection twin of
    ``governed_mixture_sample``, which fused the dedup-governance pillar.
    A 100 TB curation loop runs exactly this chain per epoch: semantic
    dedup first so importance weight is never spent on near-duplicates
    (Abbas et al. 2023, arXiv:2303.09540), distribution-matching selection
    of the survivors second (DSIR, Xie et al. 2023, arXiv:2302.03169),
    and the epoch assembled last by the LEARNED domain mixture (DoReMi,
    Xie et al. 2023, arXiv:2305.10429) with a uniform within-domain draw.

    Pipeline: the two-level (coarse-cell-routed, cell-gated fine Lloyd)
    SemDeDup screen keeps every vector not cosine-matched by a
    better-ranked cluster-mate; keeper docs (doc_id = vec_id — the
    embedded corpus) feed the DSIR chain (uni+bigram md5 buckets, Laplace
    log-likelihood ratios vs the '{target}' slice, top {keep} by exact
    integer weight); the selected docs feed the shared unigram-NLL +
    DoReMi EG step (per-domain excess loss → exponentiated-gradient
    weights, uniform-smoothed); quota = round({epoch}·share) per domain;
    the draw is a portable-md5 uniform race within each domain. Output:
    one row per drawn doc — domain, within-domain rank, domain quota, and
    both stage weights (the epoch manifest a training scheduler consumes).

    Cross-engine exactness: every stage is its member query's already
    bit-for-bit algebra (integer distances/cosines, quantized ln/exp,
    integer weight sums, md5 race), so the FULL composition replays in
    DuckDB — the oracle is the member CTE chains spliced together over
    the intermediate relations.

    Scale: the screen is the measured O(N·sqrt(k)) hierarchical plan
    (selection probe tier, 10/30/100×); the DSIR chain is one gram
    explode + B-bounded combine with a broadcast λ table and a fixed-K
    TakeOrderedAndProject cut; everything after the cut (DoReMi algebra,
    quota, race) runs on ≤ {keep} rows / |domains| aggregates —
    broadcast-sized by construction. No stage is all-pairs; the epoch
    assembly costs the same at any corpus size once the screen and one
    corpus scan are paid.
    """
    vm = _kmeans_vm(spark, sf_dir)
    docs = read_table(spark, sf_dir, "documents")
    return curated_epoch(vm, docs)


curated_corpus_epoch.__doc__ = curated_corpus_epoch.__doc__.format(
    target=DSIR_TARGET_SOURCE, keep=DSIR_KEEP, epoch=SELECTION_EPOCH
)
