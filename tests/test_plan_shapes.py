"""Plan-shape golden tests (SURVEY.md §4): the joins the engine relies on must
keep their intended physical strategy — broadcast where a side is small, and
sort-merge with AQE skew handling available where both sides are big."""

import contextlib
import io
import os

import pytest
from pyspark.sql import functions as F


def plan_str(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def test_referential_join_is_broadcast(spark, fixtures_sf0001):
    """The tools dimension is tiny → the anti-join must broadcast it; the fact
    table must never shuffle for referential integrity."""
    from lyra_spark.checks import referential_violations

    tdf = spark.read.parquet(os.path.join(fixtures_sf0001, "transcripts"))
    dim = spark.read.parquet(os.path.join(fixtures_sf0001, "tools_dim.parquet"))
    p = plan_str(referential_violations(tdf, dim))
    assert "BroadcastHashJoin" in p or "BroadcastNestedLoopJoin" in p
    assert "BroadcastHashJoin" in p  # anti-join on equality → hash, not NLJ
    assert "SortMergeJoin" not in p


def test_verdict_grid_join_is_broadcast(spark, fixtures_sf0001):
    """compute_verdicts joins pre-aggregated counts against a rules-grid frame
    that is rows × rules small — both joins must broadcast, never SMJ."""
    from lyra_spark.engine import compute_verdicts, row_violations
    from lyra_spark.presets import transcript_ruleset

    tdf = spark.read.parquet(os.path.join(fixtures_sf0001, "transcripts"))
    rs = transcript_ruleset()
    viol = row_violations(tdf, rs)
    verd = compute_verdicts(tdf, viol, [r.rule_id for r in rs.checks], "part_date")
    p = plan_str(verd)
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_lsh_self_join_is_smj_when_big(spark, fixtures_sf0001):
    """The LSH band self-join is the one genuinely big-big join in the repo: with
    broadcast disabled (as at 100 TB, where neither side fits an executor) it
    must plan as SortMergeJoin on the band keys, under AQE with skew-join
    handling enabled (runtime splitting of oversized band buckets)."""
    from lyra_spark.pipeline.dedup import lsh_candidate_pairs, minhash_signature

    tdf = spark.read.parquet(os.path.join(fixtures_sf0001, "transcripts"))
    docs = tdf.limit(200).select(F.col("conv_id").alias("doc_id"), "text")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        cands = lsh_candidate_pairs(minhash_signature(docs), id_col="doc_id")
        p = plan_str(cands)
        assert "SortMergeJoin" in p
        assert "BroadcastHashJoin" not in p
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    # AQE skew splitting must be armed for exactly this shape
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"


def test_row_rules_single_scan_no_exchange(spark, fixtures_sf0001):
    """The whole row-rule family is one shuffle-free scan: no Exchange may
    appear in the violations plan (verdict roll-ups are the only aggs)."""
    from lyra_spark.engine import row_violations
    from lyra_spark.presets import transcript_ruleset

    tdf = spark.read.parquet(os.path.join(fixtures_sf0001, "transcripts"))
    p = plan_str(row_violations(tdf, transcript_ruleset()))
    assert "Exchange" not in p
    assert "codegen id" in p  # rule expressions stay inside whole-stage codegen


def test_violation_emit_prefilter_below_generate(spark, fixtures_sf0001):
    """The emit pre-filter (any rule's ok == False) must sit BELOW the
    struct-array Generate in the physical plan, so the ~99% clean rows never
    build rule_id/observed_value structs (measured 5.8x suite CPU; the 16-way
    memory-bandwidth saturation came entirely from this allocation traffic).
    Guards both the row-rule emitter and the fused conv-check emitter."""
    from lyra_spark.engine import row_violations
    from lyra_spark.fused import conv_scoped_violations
    from lyra_spark.presets import transcript_ruleset

    tdf = spark.read.parquet(os.path.join(fixtures_sf0001, "transcripts"))
    for df in (
        row_violations(tdf, transcript_ruleset()),
        conv_scoped_violations(tdf),
    ):
        p = plan_str(df, "simple")
        gen = p.index("Generate explode")
        # a Filter must appear below (after, in explain output) the Generate
        below = p[gen:]
        assert "Filter" in below, p
        # and it must be the multi-rule fail disjunction (Catalyst rewrites
        # eqNullSafe(False) into CASE WHEN/NOT coalesce form), not a lone
        # null guard
        fline = below[below.index("Filter"):].splitlines()[0]
        assert " OR " in fline, p


def test_simhash_probe_join_is_smj_when_big(spark, fixtures_sf0001):
    """The SimHash candidate join (probe side × exact side on (ci, cv)) is a
    big-big self-join at corpus scale: with broadcast off it must plan as
    SortMergeJoin on the block keys — the id inequality rides along as a join
    condition, never degrading to a nested-loop or cartesian plan — in both
    the radius-0 (exact) and radius-1 (multi-probe) regimes."""
    from lyra_spark.pipeline.dedup import simhash_candidate_pairs

    tdf = spark.read.parquet(os.path.join(fixtures_sf0001, "transcripts"))
    hashes = tdf.limit(500).select(F.xxhash64("conv_id", "turn_idx").alias("doc_id")).select(
        "doc_id", F.xxhash64("doc_id").alias("simhash")
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        for mh in (3, 7):  # exact blocking, then multi-probe blocking
            p = plan_str(simhash_candidate_pairs(hashes, max_hamming=mh))
            assert "SortMergeJoin" in p, f"max_hamming={mh}"
            assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_connected_components_rounds_stay_bounded(spark):
    """Each CC round localCheckpoints: the logical plan of round i must not
    grow with i (an uncheckpointed iterative plan doubles per round and
    eventually overwhelms the optimizer at web scale)."""
    from lyra_spark.pipeline.dedup import connected_components

    edges = [(i, i + 1) for i in range(40)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    out = connected_components(df, driver_max_edges=0)  # pin the distributed path
    # the returned frame's plan derives from a checkpointed RDD scan, not the
    # full iteration history
    p = plan_str(out, "extended")
    assert "ExistingRDD" in p or "LogicalRDD" in p or "Scan ExistingRDD" in p
    assert p.count("Join") < 10


def test_incremental_band_join_is_smj_when_big(spark, fixtures_sf0001):
    """The snapshot-vs-store band join is big-big at web scale (both sides are
    band rows): with broadcast off it must plan as SortMergeJoin on the band
    keys, and the base STORE side must prune to (id, minhash) — the scan must
    not read content_sha into the band join."""
    from lyra_spark.pipeline.dedup import incremental_near_duplicates, signature_store

    tdf = spark.read.parquet(os.path.join(fixtures_sf0001, "transcripts"))
    docs = tdf.limit(400).select(F.col("conv_id").alias("doc_id"), "text")
    base = docs.limit(200)
    store_path = os.path.join(os.environ.get("TMPDIR", "/tmp"), "lyra_test_sigstore")
    signature_store(base).write.mode("overwrite").parquet(store_path)
    store = spark.read.parquet(store_path)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out = incremental_near_duplicates(docs, store, base, threshold=0.9)
        p = plan_str(out)
        assert "SortMergeJoin" in p
        # column pruning: the store scan feeding bands reads minhash, not the digest
        import re

        scans = [m for m in re.findall(r"ReadSchema: struct<[^>]*>", p) if "minhash" in m]
        assert scans and all("content_sha" not in s for s in scans)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_frequent_values_single_raw_exchange(spark, fixtures_sf0001):
    """Raw rows shuffle exactly once (the count aggregate); the rank window
    exchanges only the already-aggregated distinct values. Pinned by counting
    Exchange operators below/above the HashAggregate pair."""
    from lyra_spark.stats import frequent_values

    tdf = spark.read.parquet(os.path.join(fixtures_sf0001, "transcripts"))
    p = plan_str(frequent_values(tdf, ["role", "tool"], k=5), mode="simple")
    # plan reads bottom-up: scan → partial agg → Exchange → final agg →
    # Exchange(window) → sort → window → filter. Two exchanges total, and the
    # generate/explode (unpivot) must sit BELOW the first aggregate (map-side).
    assert p.count("Exchange") == 2
    assert "Generate explode" in p
    # window sits ABOVE the aggregate (plans print top-down), and Spark's
    # WindowGroupLimit prunes each partition to k rows BEFORE the window
    # exchange — the top-k never ships more than k rows per column per task
    assert p.index("Window") < p.index("HashAggregate")
    partial_limit = p.index("WindowGroupLimit", p.index("WindowGroupLimit") + 1)
    assert p.index("Exchange") < partial_limit  # Partial limit below the exchange
    # scan prunes to exactly the profiled columns
    assert "ReadSchema: struct<role:string,tool:string>" in p


def test_conversation_assembly_reuses_session_exchange(spark, fixtures_sf0001):
    """sessionize → conversation_text on (user, session) must NOT add an
    exchange: partitioning by the window's group key already satisfies the
    conversation aggregate (grouping keys are a superset). Whole composed
    conv-dedup plan = exactly two exchanges (session window + dedup digest)."""
    from lyra_spark.pipeline.dedup import exact_duplicates
    from lyra_spark.sessionize import conversation_text, sessionize

    tdf = spark.read.parquet(os.path.join(fixtures_sf0001, "transcripts"))
    ev = tdf.select(
        F.col("conv_id").alias("user_id"), F.col("ts"), F.col("turn_idx").alias("event_id"),
        F.col("role").alias("event_type"),
    )
    sess = sessionize(ev, gap_sec=1800, order_cols=["event_id"])
    conv = conversation_text(sess, ["user_id", "session_id"], ["ts", "event_id"], "event_type")
    dedup = exact_duplicates(
        conv.select(F.concat_ws("#", "user_id", "session_id").alias("k"), "conv_text"),
        text_col="conv_text", id_col="k",
    )
    assert plan_str(dedup, "simple").count("Exchange") == 2


def test_contiguity_two_bounded_exchanges(spark, fixtures_sf0001):
    """The contiguity check must stay the standard two-phase distinct
    aggregate: exactly two hash exchanges, with a map-side dedup aggregate
    BELOW the first so only distinct (conv, idx) pairs ever ship — no
    collect-style list aggregation anywhere."""
    import re

    from lyra_spark.checks import contiguity_violations

    tdf = spark.read.parquet(os.path.join(fixtures_sf0001, "transcripts"))
    p = plan_str(contiguity_violations(tdf))
    assert len(re.findall(r"^\(\d+\) Exchange", p, re.MULTILINE)) == 2
    assert len(re.findall(r"hashpartitioning\(conv_id", p)) >= 2
    assert "collect_list" not in p and "collect_set" not in p
    # the (conv, idx)-keyed dedup aggregate exists (distinct pairs, not rows)
    assert re.search(r"Keys \[2\]: \[conv_id.*turn_idx", p)


def test_bucketed_tables_join_without_exchange(spark):
    """io.write_bucketed: two tables bucketed on the same key + count must
    sort-merge join with ZERO Exchange nodes — the write's one-time shuffle
    buys every later join on that key (SURVEY.md §4 bucketing row). Also
    pins that the scans actually read bucketed (SelectedBucketsCount).
    Table names are uniqued per run so a failure between write and DROP
    never collides with a concurrent session on the same checkout."""
    import uuid

    from lyra_spark.io import write_bucketed

    suffix = uuid.uuid4().hex[:8]
    ta, tb = f"bk_test_a_{suffix}", f"bk_test_b_{suffix}"
    a = spark.range(0, 5000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("va"))
    b = spark.range(0, 5000).select(F.col("id").alias("k"), (F.col("id") * 3).alias("vb"))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        write_bucketed(a, ta, ["k"], 8, sort_cols=["k"])
        write_bucketed(b, tb, ["k"], 8, sort_cols=["k"])
        j = spark.table(ta).join(spark.table(tb), "k")
        p = plan_str(j)
        assert "Exchange" not in p
        assert "SortMergeJoin" in p
        assert "Bucketed: true" in p
        assert j.count() == 5000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql(f"DROP TABLE IF EXISTS {ta}")
        spark.sql(f"DROP TABLE IF EXISTS {tb}")


def test_shuffle_index_single_exchange(spark):
    """The global-shuffle address (pipeline.export.shuffle_index) costs ONE
    exchange — the hash-partition on the uniform shard key that the sharded
    write needs anyway; hash, shard, and the rank window all ride it."""
    from lyra_spark.pipeline.export import shuffle_index

    df = spark.range(0, 1000).withColumnRenamed("id", "doc_id")
    p = plan_str(shuffle_index(df, n_shards=8))
    import re

    assert len(re.findall(r"^\(\d+\) Exchange", p, re.MULTILINE)) == 1


def test_write_sorted_enables_row_group_skipping(spark, tmp_path):
    """The range-sorted layout (io.write_sorted) must make row-group min/max
    stats selective: a narrow value predicate intersects only a few of the
    row groups, while the same data written unsorted intersects nearly all
    of them — the data-skipping property, measured from the parquet footers
    a reader actually prunes with. The filter itself reaches the scan
    (PushedFilters)."""
    import glob

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from lyra_spark.io import write_sorted

    df = spark.range(0, 200_000).select(
        F.col("id").alias("event_id"),
        (F.pmod(F.col("id") * 2654435761, F.lit(100000)) / 1000.0).alias("value"),
    )
    sorted_path, plain_path = str(tmp_path / "sorted"), str(tmp_path / "plain")
    write_sorted(df, sorted_path, ["value"], target_files=8)
    df.repartition(8).write.parquet(plain_path)

    def intersecting(path, lo, hi):
        total = hits = 0
        for f in glob.glob(os.path.join(path, "*.parquet")):
            md = pq.read_metadata(f)
            idx = md.schema.names.index("value")
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                total += 1
                if st.min <= hi and st.max >= lo:
                    hits += 1
        return hits, total

    s_hits, s_total = intersecting(sorted_path, 40.0, 41.0)
    p_hits, p_total = intersecting(plain_path, 40.0, 41.0)
    assert s_total >= 8 and p_hits == p_total  # unsorted: every group intersects
    assert s_hits <= max(2, s_total // 4)      # sorted: the slice, not the table
    # correctness + pushdown: same rows either way, filter at the scan
    q = spark.read.parquet(sorted_path).filter("value >= 40.0 AND value < 41.0")
    assert q.count() == df.filter("value >= 40.0 AND value < 41.0").count()
    assert "PushedFilters: [" in plan_str(q)


def test_split_leakage_safe_single_exchange(spark):
    """Default (digest) mode costs exactly ONE exchange — the same shuffle
    exact dedup pays — and no join; cluster_col mode is map-only."""
    import re

    from lyra_spark.pipeline.sample import split_leakage_safe

    df = spark.range(0, 1000).selectExpr("id AS doc_id", "CAST(id % 100 AS STRING) AS text")
    p = plan_str(split_leakage_safe(df, {"a": 0.5, "b": 0.5}))
    assert len(re.findall(r"^\(\d+\) Exchange", p, re.MULTILINE)) == 1
    assert "Join" not in p
    p2 = plan_str(
        split_leakage_safe(
            df.withColumn("comp", F.col("doc_id") % 10), {"a": 0.5, "b": 0.5}, cluster_col="comp"
        )
    )
    assert "Exchange" not in p2


def test_write_zorder_skips_row_groups_on_both_columns(spark, tmp_path):
    """The Z-ordered layout (io.write_zorder) must make footer min/max stats
    selective on EVERY z-column: a narrow predicate on either column
    intersects a strict subset of files, while the single-column sorted
    layout only prunes its own sort column (the other column's predicate
    intersects every file). Rows must round-trip unchanged."""
    import glob

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from lyra_spark.io import write_sorted, write_zorder

    # two independent uniform-ish columns (decorrelated multipliers)
    df = spark.range(0, 200_000).select(
        F.col("id").alias("event_id"),
        (F.pmod(F.col("id") * 2654435761, F.lit(100000)) / 1000.0).alias("x"),
        (F.pmod(F.col("id") * 40503 + 17, F.lit(100000)) / 1000.0).alias("y"),
    )
    z_path, s_path = str(tmp_path / "zorder"), str(tmp_path / "xsorted")
    write_zorder(df, z_path, ["x", "y"], target_files=16)
    write_sorted(df, s_path, ["x"], target_files=16)

    def intersecting(path, col, lo, hi):
        total = hits = 0
        for f in glob.glob(os.path.join(path, "*.parquet")):
            md = pq.read_metadata(f)
            idx = md.schema.names.index(col)
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                total += 1
                if st.min <= hi and st.max >= lo:
                    hits += 1
        return hits, total

    zx_hits, z_total = intersecting(z_path, "x", 40.0, 42.0)
    zy_hits, _ = intersecting(z_path, "y", 40.0, 42.0)
    sy_hits, s_total = intersecting(s_path, "y", 40.0, 42.0)
    assert z_total >= 16 and s_total >= 16
    # z-order: BOTH dimensions prune (Morton slabs are hyper-rectangles)
    assert zx_hits <= z_total // 2, (zx_hits, z_total)
    assert zy_hits <= z_total // 2, (zy_hits, z_total)
    # x-sorted: y-predicate intersects every group — the gap z-order closes
    assert sy_hits == s_total
    # round-trip: layout changes bytes, never rows; helper columns dropped
    back = spark.read.parquet(z_path)
    assert set(back.columns) == {"event_id", "x", "y"}
    assert back.count() == 200_000
    assert back.agg(F.sum("event_id")).first()[0] == df.agg(F.sum("event_id")).first()[0]


def test_write_zorder_validation(spark, tmp_path):
    import pytest as _pytest

    from lyra_spark.io import write_zorder

    df = spark.range(5).selectExpr("id", "id * 2 AS v")
    with _pytest.raises(ValueError, match="2-4"):
        write_zorder(df, str(tmp_path / "z1"), ["id"])
    with _pytest.raises(ValueError, match="bits"):
        write_zorder(df, str(tmp_path / "z2"), ["id", "v"], bits=0)


def test_card_scrub_is_map_only(spark):
    """scrub_card_numbers must stay a pure map over the scan — zero Exchange
    nodes (the nested Luhn fold is per-row Catalyst, never a shuffle or a
    Python crossing)."""
    from lyra_spark.pipeline.text import scrub_card_numbers

    df = spark.range(100).selectExpr("id AS doc_id", "concat('pay ', id) AS text")
    p = plan_str(scrub_card_numbers(df))
    assert "Exchange" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
