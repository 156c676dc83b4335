"""Property tests for the analytics / chunking / stream-static operators.

The oracle harness already value-checks these at sf0.01; the tests here pin
the *invariants* a value hash can't express (chunk coverage and overlap,
funnel monotonicity, densification completeness) at smoke scale, plus the
stream ≡ batch equivalence for the stream-static enrichment join.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import functions as F

from big_data_medical_analysis_spark.operators.analytics import (
    daily_user_value_gapfill,
    event_funnel,
)
from big_data_medical_analysis_spark.operators.text_analysis import (
    CHUNK_SIZE,
    CHUNK_STRIDE,
    doc_chunk_windows,
)
from big_data_medical_analysis_spark.sources.readers import read_table
from big_data_medical_analysis_spark.streaming import windows as SW


def test_chunks_cover_every_token_with_exact_overlap(spark, sf_dir):
    """Reassembling chunk 0 plus each later chunk's non-overlapping tail
    must reproduce the document exactly — chunking loses nothing and
    duplicates only the (SIZE - STRIDE)-token overlap."""
    chunks = doc_chunk_windows(spark, sf_dir)
    docs = read_table(spark, sf_dir, "documents")

    pieces = chunks.withColumn(
        "piece",
        F.when(F.col("chunk_id") == 0, F.col("chunk_text")).otherwise(
            F.array_join(
                # tail = tokens past the overlap with the previous chunk
                F.slice(
                    F.split("chunk_text", " "),
                    CHUNK_SIZE - CHUNK_STRIDE + 1,
                    CHUNK_SIZE,
                ),
                " ",
            )
        ),
        # a final chunk that lies entirely inside the previous window
        # contributes an empty tail — drop it, its tokens are covered
    ).filter(F.col("piece") != "")
    reassembled = pieces.groupBy("doc_id").agg(
        F.array_join(
            F.array_sort(F.collect_list(F.struct("chunk_id", "piece"))).piece,
            " ",
        ).alias("rebuilt")
    )
    diff = (
        docs.join(reassembled, "doc_id")
        .filter(F.col("rebuilt") != F.col("text"))
        .count()
    )
    assert diff == 0
    assert reassembled.count() == docs.count()

    # chunk length law: every chunk holds min(SIZE, n_tokens - id*STRIDE)
    n_tok = F.size(F.split("text", " "))
    bad_len = (
        chunks.join(docs.select("doc_id", n_tok.alias("n_tokens")), "doc_id")
        .filter(
            F.col("chunk_tokens")
            != F.least(
                F.lit(CHUNK_SIZE),
                F.col("n_tokens") - F.col("chunk_id") * CHUNK_STRIDE,
            )
        )
        .count()
    )
    assert bad_len == 0


def test_funnel_stage_counts_are_monotone(spark, sf_dir):
    row = event_funnel(spark, sf_dir).collect()[0]
    assert row.n_signup >= row.n_viewed_after >= row.n_purchased_after
    if row.n_purchased_after:
        assert row.total_view_to_purchase_us > 0


def test_gapfill_is_dense_and_preserves_totals(spark, sf_dir):
    ev = read_table(spark, sf_dir, "events")
    filled = daily_user_value_gapfill(spark, sf_dir)
    n_users = ev.select("user_id").distinct().count()
    n_days = (
        ev.select(F.to_date("ts").alias("d"))
        .agg(F.datediff(F.max("d"), F.min("d")) + 1)
        .collect()[0][0]
    )
    # dense grid: exactly users x days rows, no duplicates
    assert filled.count() == n_users * n_days
    assert (
        filled.select("user_id", "day").distinct().count() == n_users * n_days
    )
    # densification adds zeros, never changes the total event count
    assert filled.agg(F.sum("n_events")).collect()[0][0] == ev.count()


def _write_events_json(dirpath: str, name: str, rows: list[tuple]) -> None:
    """rows: (event_id, ts_str, user_id, event_type, value); atomic rename
    so the file stream never sees partial files."""
    os.makedirs(dirpath, exist_ok=True)
    path = os.path.join(dirpath, name)
    with open(path + ".tmp", "w") as f:
        for eid, ts, uid, etype, value in rows:
            f.write(
                json.dumps(
                    {
                        "event_id": eid,
                        "ts": ts,
                        "user_id": uid,
                        "event_type": etype,
                        "value": value,
                        "props": "{}",
                    }
                )
                + "\n"
            )
    os.rename(path + ".tmp", path)


def test_enrich_stream_matches_batch(spark, tmp_path):
    """Stream-static join: the per-segment aggregate over micro-batched
    events must equal the batch form on the same rows."""
    indir = str(tmp_path / "in")
    qname = "enrich_" + uuid.uuid4().hex[:8]
    customer = spark.createDataFrame(
        [(1, "AUTO"), (2, "BIKE"), (3, "AUTO")],
        "c_custkey long, c_mktsegment string",
    )
    batch_a = [
        (1, "2024-01-01 01:00:00.000000", 1, "purchase", 10.01),
        (2, "2024-01-01 02:00:00.000000", 2, "purchase", 5.02),
        (3, "2024-01-01 03:00:00.000000", 1, "click", 99.0),  # filtered
    ]
    batch_b = [
        (4, "2024-01-02 01:00:00.000000", 3, "purchase", 7.555),
        (5, "2024-01-02 02:00:00.000000", 1, "purchase", 0.49),
        (6, "2024-01-02 03:00:00.000000", 9, "purchase", 1.0),  # no dim row
    ]
    _write_events_json(indir, "a.json", batch_a)
    stream = SW.enrich_stream(SW.read_event_stream(spark, indir), customer)
    q = (
        stream.writeStream.format("memory")
        .queryName(qname)
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
        _write_events_json(indir, "b.json", batch_b)
        q.processAllAvailable()
        got = {
            r.c_mktsegment: (r.n_purchases, r.total_value)
            for r in spark.sql(f"SELECT * FROM {qname}").collect()
        }
    finally:
        q.stop()

    batch_df = spark.createDataFrame(
        batch_a + batch_b,
        "event_id long, ts string, user_id long, event_type string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    want = {
        r.c_mktsegment: (r.n_purchases, r.total_value)
        for r in SW.enrich_purchases(batch_df, customer).collect()
    }
    assert got == want
    # AUTO cents: 1001 (u1) + 756 (u3, 7.555 rounds half-away) + 49 (u1)
    assert want["AUTO"] == (3, 18.06)


def test_range_pair_stream_matches_batch(spark, tmp_path):
    """Stream-stream interval join: pairs found across micro-batches must
    equal the batch range join on the same rows (inner-join matches emit
    as both sides arrive; state eviction needs only the watermark)."""
    indir = str(tmp_path / "pairs_in")
    qname = "pairs_" + uuid.uuid4().hex[:8]
    batch_a = [
        (1, "2024-01-01 01:00:00.000000", 1, "click", 1.0),
        (2, "2024-01-01 01:00:30.000000", 1, "click", 1.0),  # pair with 1
        (3, "2024-01-01 01:05:00.000000", 2, "view", 1.0),
    ]
    batch_b = [
        # arrives in a later micro-batch but still pairs with event 2
        (4, "2024-01-01 01:01:10.000000", 1, "click", 1.0),
        (5, "2024-01-01 01:05:30.000000", 2, "view", 1.0),  # pair with 3
        (6, "2024-01-01 09:00:00.000000", 2, "view", 1.0),  # no pair
    ]
    _write_events_json(indir, "a.json", batch_a)
    stream = SW.range_pair_stream(
        SW.read_event_stream(spark, indir),
        SW.read_event_stream(spark, indir),
    )
    q = (
        stream.writeStream.format("memory")
        .queryName(qname)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        _write_events_json(indir, "b.json", batch_b)
        q.processAllAvailable()
        got = {
            (r.first_event_id, r.next_event_id, r.gap_us)
            for r in spark.sql(f"SELECT * FROM {qname}").collect()
        }
    finally:
        q.stop()

    rows = batch_a + batch_b
    batch_df = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    a, b = batch_df.alias("a"), batch_df.alias("b")
    want = {
        (r.first_event_id, r.next_event_id, r.gap_us)
        for r in a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("b.ts") > F.col("a.ts"))
            & (F.col("b.ts") <= F.col("a.ts") + F.expr("INTERVAL 60 SECONDS")),
        )
        .select(
            F.col("a.event_id").alias("first_event_id"),
            F.col("b.event_id").alias("next_event_id"),
            (F.unix_micros(F.col("b.ts")) - F.unix_micros(F.col("a.ts"))).alias(
                "gap_us"
            ),
        )
        .collect()
    }
    assert got == want
    assert (1, 2, 30_000_000) in want and (2, 4, 40_000_000) in want


def test_order_chain_recursion_depth_is_chain_bound(spark, sf_dir):
    """The recursion cost model: every order appears exactly once in the
    output, max pos equals the LONGEST PER-CUSTOMER CHAIN, and — since the
    round-7 block-batching — the recursive executor runs only
    ceil(max_chain / ORDER_CHAIN_BLOCK) steps, not max_chain. That is the
    scaling disclosure for order_chain_recursion: per-iteration job
    overhead × block count, with K× more headroom under Spark's 100-step
    recursion limit than the naive per-order walk."""
    from big_data_medical_analysis_spark.operators.subqueries import (
        ORDER_CHAIN_BLOCK,
        order_chain_recursion,
    )
    from big_data_medical_analysis_spark.sources.readers import read_table

    out = order_chain_recursion(spark, sf_dir)
    orders = read_table(spark, sf_dir, "orders")
    assert out.count() == orders.count()
    max_pos = out.agg(F.max("pos")).collect()[0][0]
    max_chain = (
        orders.groupBy("o_custkey").count().agg(F.max("count")).collect()[0][0]
    )
    assert max_pos == max_chain
    # executor-loop depth = block count, far under the 100-step limit
    blocks = -(-max_chain // ORDER_CHAIN_BLOCK)
    assert blocks <= 100 and blocks < max_chain


def test_ewma_matches_direct_recurrence(spark, sf_dir):
    """The HOF-fold EWMA must equal the direct e_t = 0.5*e_{t-1} + 0.5*x_t
    recurrence over the exact daily cents series."""
    from big_data_medical_analysis_spark.operators.analytics import (
        ewma_daily_revenue,
    )

    rows = sorted(ewma_daily_revenue(spark, sf_dir).collect(),
                  key=lambda r: r.day)
    assert rows
    e = None
    for r in rows:
        x = round(r.day_revenue * 100, 4)  # back to cents
        e = x if e is None else 0.5 * e + 0.5 * x
        assert abs(r.ewma_cents - round(e, 4)) < 1e-3, r.day
        e = r.ewma_cents  # re-anchor on the engine value (rounding drift)


def test_cumulative_unique_users_monotone_and_total(spark, sf_dir):
    """cum_users is strictly increasing, equals the running sum of
    new_users, and ends at the total distinct user count."""
    from big_data_medical_analysis_spark.operators.analytics import (
        cumulative_unique_users,
    )
    from big_data_medical_analysis_spark.sources.readers import read_table

    rows = sorted(
        cumulative_unique_users(spark, sf_dir).collect(), key=lambda r: r.day
    )
    running = 0
    prev = 0
    for r in rows:
        running += r.new_users
        assert r.cum_users == running
        assert r.cum_users > prev
        prev = r.cum_users
    n_users = (
        read_table(spark, sf_dir, "events").select("user_id").distinct().count()
    )
    assert prev == n_users


def test_last_touch_attribution_conserves_revenue(spark, sf_dir):
    """Attribution is a partition of purchases: per-touch counts and values
    sum exactly to the unattributed purchase totals (no purchase dropped
    or double-credited), touch types come from the non-purchase event
    vocabulary plus 'direct', and 'direct' is non-empty (first-ever
    purchases have no preceding touch)."""
    from big_data_medical_analysis_spark.operators.analytics import (
        last_touch_attribution,
    )
    from big_data_medical_analysis_spark.operators.common import cents
    from big_data_medical_analysis_spark.sources.readers import read_table

    res = last_touch_attribution(spark, sf_dir).collect()
    ev = read_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase")
    n_total = purchases.count()
    cents_total = purchases.agg(F.sum(cents("value"))).collect()[0][0]
    assert sum(r.n_purchases for r in res) == n_total
    assert round(sum(r.attributed_value for r in res) * 100) == cents_total
    types = {r.touch_type for r in res}
    assert types <= {"click", "view", "signup", "error", "direct"}
    assert "direct" in types


def test_watermark_audit_covers_all_events_within_jitter(spark, sf_dir):
    """The lateness histogram partitions ALL events, coverage is monotone
    to exactly 1.0, and no lateness exceeds the synthetic jitter bound:
    since arrival = ts + jitter with jitter < WATERMARK_JITTER_S, an
    event can only be overtaken by event-times at most the jitter bound
    ahead, so every '>1h' row still lies within 2h — the audit's
    recommended complete-capture watermark equals the transport bound."""
    from big_data_medical_analysis_spark.operators.analytics import (
        WATERMARK_JITTER_S,
        watermark_delay_audit,
    )
    from big_data_medical_analysis_spark.sources.readers import read_table

    rows = sorted(
        watermark_delay_audit(spark, sf_dir).collect(), key=lambda r: r.bin_id
    )
    total = read_table(spark, sf_dir, "events").count()
    assert sum(r.n_events for r in rows) == total
    assert abs(rows[-1].cum_share - 1.0) < 1e-9
    cums = [r.cum_share for r in rows]
    assert cums == sorted(cums)
    assert rows[0].lateness_bin == "in-order" and rows[0].share > 0.5
    assert WATERMARK_JITTER_S == 7200  # docstring's 2h claim stays honest
