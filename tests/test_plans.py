"""Physical-plan shape assertions — the 100 TB posture, enforced.

Correctness tests prove the operators compute the right answer at small SF;
these prove the PLANS are the ones that survive a 1000-executor scale-up:
filters reach the parquet scan, projections prune columns, small dims
broadcast, top-k is a bounded heap (TakeOrderedAndProject), and nothing
degenerates into a cartesian product over the corpus.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_T2
from victor_spark.plans import QUERIES


def plan(name, spark, sf=SF_T2) -> str:
    df = QUERIES[name].build(spark, sf)
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_topk_is_bounded_heap_not_global_sort(spark):
    # reference Q5 (db.rs:244-282) == TakeOrderedAndProject: per-partition
    # bounded heap + driver merge of k rows, never a full shuffle sort
    p = plan("topk_cosine", spark)
    assert "TakeOrderedAndProject" in p
    assert "Exchange rangepartitioning" not in p  # a global sort would show this


def test_tpch_q1_filter_pushed_to_scan(spark):
    p = plan("tpch_q1", spark)
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in p


def test_tpch_q1_column_pruning(spark):
    # the scan must read only the 7 needed columns, not all 16
    p = plan("tpch_q1", spark)
    scan = p[p.index("Scan parquet"):]
    schema = scan[scan.index("ReadSchema:"):].splitlines()[0]
    assert "l_orderkey" not in schema  # unused column stays unread
    assert "l_comment" not in schema
    assert "l_quantity" in schema


def test_tpch_q6_all_predicates_pushed(spark):
    # Q6 is the pure-pushdown query: every predicate must reach the reader
    # and the scan must read only the 4 referenced columns
    p = plan("tpch_q6", spark)
    assert "PushedFilters: [IsNotNull(l_shipdate)" in p
    assert "GreaterThanOrEqual(l_discount,0.03)" in p
    assert "LessThan(l_quantity,24.0)" in p
    scan = p[p.index("Scan parquet"):]
    schema = scan[scan.index("ReadSchema:"):].splitlines()[0]
    assert "l_orderkey" not in schema and "l_returnflag" not in schema


def test_tpch_q4_exists_is_semi_join(spark):
    # EXISTS must plan as a semi join (no row duplication, no count fixup)
    p = plan("tpch_q4", spark)
    assert "LeftSemi" in p
    assert "CartesianProduct" not in p


def test_tpch_q5_dims_broadcast(spark):
    # supplier/nation/region all broadcast; the fact spine shuffles only on
    # its join keys
    p = plan("tpch_q5", spark)
    assert p.count("BroadcastHashJoin") >= 3
    # r11: the ASIA nation-key set semi-filters customer (and the supplier
    # broadcast side) BEFORE any exchange — the region join projected no
    # columns, so the semi is lossless given c_nationkey = s_nationkey
    assert "LeftSemi" in p


def test_tpch_q18_having_semi_join_single_fact_agg(spark):
    # the HAVING subquery feeds a semi join — the big-orders list must not
    # round-trip through the driver as a literal IN-list
    p = plan("tpch_q18", spark)
    assert "LeftSemi" in p
    assert "TakeOrderedAndProject" in p


def test_tpch_q2_per_part_top1_is_single_window(spark):
    # the per-part argmax must be a rank-limit window (row_number <= 1 pushed
    # down as WindowGroupLimit: per-partition partial top-1 before the
    # shuffle, final after — the distributed bounded-heap shape), not a
    # self-join of the candidate set against its own per-group max
    p = plan("tpch_q2", spark)
    assert "WindowGroupLimit" in p
    assert "TakeOrderedAndProject" in p  # final top-100


def test_tpch_q19_part_broadcast_under_disjunction(spark):
    # OR-of-ANDs spanning both join sides: the join itself must stay a
    # broadcast hash join on p_partkey (the disjunction filters after)
    p = plan("tpch_q19", spark)
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_tpch_q20_q21_in_subqueries_are_semi_joins(spark):
    # the IN (SELECT …) / finalized-orders probes must stay executor-side
    # semi joins, never driver-collected IN-lists
    assert "LeftSemi" in plan("tpch_q20", spark)
    assert "LeftSemi" in plan("tpch_q21", spark)


def test_tpch_q20_part_total_is_one_window_pass(spark):
    # round-11 optimization: the per-part total is a window sum over the
    # shipped aggregate, NOT a second groupBy + join back — the old shape
    # evaluated the lineitem ⋈ part aggregation subtree twice (one scan
    # of each per join side)
    p = plan("tpch_q20", spark)
    assert "Window" in p
    assert p.count(") Scan parquet") == 4, (
        "expected exactly 4 scans (lineitem, part, supplier, nation once "
        "each) — a duplicate shipped subtree re-scans lineitem and part"
    )


def test_line_dedup_first_occurrence_is_one_window_pass(spark):
    # round-11 optimization: first-occurrence detection is one window min
    # over the exploded lines, not a groupBy(line) + self-join of the
    # explode with its own aggregate (which evaluated the explode twice)
    p = plan("line_dedup_global", spark)
    assert "Window" in p
    assert p.count(") Scan parquet") == 2, (
        "expected exactly 2 document scans (window pass + reassembly) — "
        "a first-occurrence join re-derives the explode subtree"
    )


def test_tpch_q22_not_exists_is_anti_join(spark):
    # NOT EXISTS → left-anti hash join (no row expansion, no subquery loop)
    p = plan("tpch_q22", spark)
    assert "LeftAnti" in p


def test_tpch_q13_outer_join_preserved(spark):
    # zero-order customers must survive: the join may not be rewritten to
    # inner by the count aggregate
    p = plan("tpch_q13", spark)
    assert "LeftOuter" in p or "RightOuter" in p


def test_star_join_broadcasts_dims(spark):
    # fact-side stays shuffle-free on the dim joins: customer+nation go
    # broadcast, never sort-merge
    p = plan("revenue_by_nation", spark)
    assert p.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in p


def test_search_query_side_broadcast(spark):
    # the 1-row query vector must broadcast to the corpus scan, not shuffle it
    p = plan("topk_cosine", spark)
    assert "BroadcastNestedLoopJoin" in p or "BroadcastExchange" in p
    assert "Exchange hashpartitioning" not in p  # corpus never shuffles


def test_batch_topk_partial_rank_no_corpus_shuffle_before_score(spark):
    # scoring happens map-side against the broadcast query set; the only
    # shuffle is the per-query window over scored rows
    p = plan("topk_batch", spark)
    assert "BroadcastExchange" in p


def test_dedup_exact_is_partial_agg(spark):
    # hash-groupBy dedup must partial-aggregate map-side (HashAggregate
    # appears twice: partial + final)
    p = plan("dedup_exact", spark)
    assert p.count("HashAggregate") >= 2


def test_no_cartesian_products_anywhere(spark):
    # every catalog query must avoid an unbounded cross product over the
    # corpus; the only cross joins allowed are against 1-row/broadcast sides
    for name, spec in QUERIES.items():
        if name == "pca_project":
            continue  # fit collects d² partials by design (driver eigh)
        p = plan(name, spark)
        assert "CartesianProduct" not in p, f"{name} plans a CartesianProduct"


def test_session_scale_configs(spark):
    # the 100 TB runtime levers must be on in every session the factory
    # builds: AQE (runtime coalesce + skew-join splitting) and Arrow for
    # the pandas-UDF paths
    conf = spark.conf
    assert conf.get("spark.sql.adaptive.enabled") == "true"
    assert conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"
    assert conf.get("spark.sql.adaptive.coalescePartitions.enabled") == "true"
    assert conf.get("spark.sql.execution.arrow.pyspark.enabled") == "true"


def test_index_tag_scan_prunes_partitions(spark, tmp_path):
    # the tag-superset filter must become partition pruning on tag_set_id —
    # the reference's data skipping (db.rs:687-706) as directory pruning;
    # a pruned scan never lists the other tag-set's files
    from victor_spark.index import VectorIndex

    idx = VectorIndex(spark, str(tmp_path / "prune_idx"))
    idx.insert([("a", [1.0, 0.0], ["red"]), ("b", [0.0, 1.0], ["blue"])])
    df = idx.scan(tags=["red"])
    p = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    scan = p[p.index("Scan parquet"):]
    part_line = scan[scan.index("PartitionFilters:"):].splitlines()[0]
    assert "tag_set_id" in part_line  # filter applied to the partition listing


def test_quantized_index_storage_is_bytes_not_floats(spark, tmp_path):
    # the VectorIndex table stores u8 quant + 2 floats per vector
    # (packed_vector.rs layout); parquet must see tinyint, not float array
    from victor_spark.index import VectorIndex

    idx = VectorIndex(spark, str(tmp_path / "storage_idx"))
    idx.insert([("a", [0.1] * 16, ["t"]), ("b", [0.2] * 16, ["t"])])
    stored = spark.read.parquet(idx.data_path)
    types = dict(stored.dtypes)
    assert types["quant"] == "array<tinyint>"
    assert types["qmin"] == "float" and types["qmax"] == "float"


def test_pq_adc_reads_codes_not_vectors(spark, tmp_path):
    # the point of PQ: a stored encoded table serves ADC queries from the
    # m-byte code column alone — the float vectors are never scanned
    from pyspark.sql import functions as F

    from victor_spark.operators import pq

    df = spark.createDataFrame(
        [(i, [float(i % 7), float(i % 5), 1.0, 0.0]) for i in range(64)],
        "vec_id long, v array<double>",
    )
    cb = pq.codebook_vectors(df, "vec_id", "v", k=4)
    path = str(tmp_path / "pq_table")
    pq.encode(df, "v", cb, m=2).write.parquet(path)
    stored = spark.read.parquet(path)
    out = pq.adc_topk(stored, [1.0, 0.0, 0.0, 1.0], cb, k=3, m=2)
    p = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    scan = p[p.index("Scan parquet"):]
    schema = scan[scan.index("ReadSchema:"):].splitlines()[0]
    assert "pq_code" in schema and "v:" not in schema
    assert "TakeOrderedAndProject" in p


def test_pack_sequences_single_bucket_shuffle(spark):
    # packing must shuffle once on the bucket key — never collapse to a
    # single-partition global window
    p = plan("pack_sequences", spark)
    assert "hashpartitioning(bucket" in p
    assert "SinglePartition" not in p


def test_range_join_is_equi_join(spark):
    p = plan("events_range_join", spark)
    assert "BroadcastNestedLoopJoin" not in p
    assert "SortMergeJoin" in p or "ShuffledHashJoin" in p or "BroadcastHashJoin" in p


def test_vocab_topk_partial_agg_bounded_merge(spark):
    p = plan("vocab_topk", spark)
    assert "partial_count" in p  # map-side combine before the shuffle
    assert "TakeOrderedAndProject" in p


def test_bucketed_join_avoids_both_shuffles(spark, tmp_path):
    """The 100 TB co-location lever: two tables bucketed by the join key
    join WITHOUT an Exchange on either side (bucketing IS the shuffle,
    paid once at write time and amortized over every later join)."""
    import uuid

    from pyspark.sql import functions as F

    a_name = f"bucket_a_{uuid.uuid4().hex[:8]}"
    b_name = f"bucket_b_{uuid.uuid4().hex[:8]}"
    a = spark.range(1000).withColumn("va", F.col("id") * 2)
    b = spark.range(1000).withColumn("vb", F.col("id") * 3)
    try:
        a.write.bucketBy(8, "id").sortBy("id").saveAsTable(a_name)
        b.write.bucketBy(8, "id").sortBy("id").saveAsTable(b_name)
        joined = (
            spark.table(a_name).hint("merge").join(spark.table(b_name), "id")
        )
        p = joined._sc._jvm.PythonSQLUtils.explainString(
            joined._jdf.queryExecution(), "formatted"
        )
        assert "SortMergeJoin" in p
        assert "Exchange" not in p, "bucketed join still shuffles"
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {a_name}")
        spark.sql(f"DROP TABLE IF EXISTS {b_name}")


def test_funnel_is_single_shuffle(spark):
    # the ordered funnel must be ONE exchange (the groupBy(user) for the
    # sorted-array fold) — never per-step self-joins over the event table
    p = plan("events_funnel", spark)
    assert p.count("hashpartitioning(user_id") == 1
    assert "SortMergeJoin" not in p and "ShuffledHashJoin" not in p


def test_gapfill_spine_is_broadcast(spark):
    # the dense (hour x type) spine is built from scalar bounds and
    # broadcast — the fact table is scanned once, never per-slot
    p = plan("events_gapfill", spark)
    assert "BroadcastExchange" in p
    assert "CartesianProduct" not in p


def test_incremental_dedup_corpus_never_shuffles(spark):
    # batch bands broadcast onto the corpus band table: the corpus side is
    # map-side only — no sort-merge join, no corpus-sized exchange before
    # the candidate join
    p = plan("dedup_incremental", spark)
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_ann_ivf_batch_probe_is_equi_join(spark):
    # the batched serving path: (query, probed-cell) list broadcast,
    # candidates found by a hash join on cell — the corpus scan is shared
    # by every query in the batch
    p = plan("ann_ivf_batch", spark)
    assert "BroadcastHashJoin" in p and "[cell" in p
    assert "SortMergeJoin" not in p
    # round-11 optimization: cell assignment is a map-side fold over the
    # collected centroid literals — the corpus's float vectors must never
    # shuffle through a groupBy(vec_id) argmax exchange
    assert "hashpartitioning(vec_id" not in p


def test_ann_ivf_topk_is_map_side_zero_exchange(spark):
    # round-11 optimization: one fused model collect (centroids + query),
    # probe cells picked driver-side, assignment as a literal-centroid
    # fold, scoring against the literal query — the whole query is a
    # single map-side TakeOrderedAndProject pass with ZERO exchanges
    # (the old shape shuffled one (vec_id, v) row per vector purely to
    # run the argmax)
    p = plan("ann_ivf_topk", spark)
    assert "TakeOrderedAndProject" in p
    assert "Exchange" not in p
    assert "CartesianProduct" not in p


def test_ann_ivfpq_topk_is_map_side_zero_exchange(spark):
    # round-11 optimization: ivfpq.assign_cells is a map-side fold over
    # the collected centroid literals (the semantic_dedup precedent), so
    # the probe + encode + ADC-score pipeline is one map-side pass into a
    # bounded heap — no broadcast crossJoin row inflation, no groupBy
    # argmax exchange
    p = plan("ann_ivfpq_topk", spark)
    assert "TakeOrderedAndProject" in p
    assert "Exchange" not in p
    assert "CartesianProduct" not in p


def test_semdedup_pairs_join_is_equi_on_cell(spark):
    # SemDeDup's within-cluster compare must be an equi-join on the cell
    # key (the O(c²) budget is per cluster); assignment uses the broadcast
    # centroid set. A CartesianProduct would mean global all-pairs.
    p = plan("semdedup", spark)
    assert "CartesianProduct" not in p
    # round-12 optimization: the assignment subtree (broadcast-centroid
    # crossJoin + max_by) sits behind a localCheckpoint reuse barrier so
    # its three consumers compute it ONCE — in explain it appears as a
    # Scan ExistingRDD, and the centroid BroadcastExchange lives inside
    # the hidden subtree (still forced by F.broadcast in the operator).
    assert "Scan ExistingRDD" in p
    # the pair join must KEY on cell (shuffle-hash or sort-merge both fine);
    # in formatted mode the join keys print on their own "keys" lines
    assert any(
        "keys" in ln and "cell" in ln for ln in p.splitlines()
    ), "pair join does not key on cell"


def test_dsir_scoring_is_map_side(spark):
    # round-11 optimization: the 64-bucket log-ratio model collapses to
    # ONE broadcast map row built in a single corpus pass (totals and
    # entries fold over one collected bucket-stats array); per-token
    # scoring folds each doc's own token array against the broadcast map
    # — no join keyed on bkt, no corpus-token shuffle, and exactly TWO
    # parquet scans total (model-build pass + scoring pass, the minimum:
    # scoring cannot start before the model exists)
    p = plan("dsir_weights", spark)
    assert "SortMergeJoin" not in p and "BroadcastHashJoin" not in p
    assert not any(
        "keys" in ln and "bkt" in ln for ln in p.splitlines()
    ), "scoring must not shuffle tokens on bkt"
    import re

    n_scans = len(re.findall(r"^\(\d+\) Scan parquet", p, flags=re.M))
    assert n_scans == 2, f"expected 2 corpus scans, plan has {n_scans}"


def test_hll_registers_partial_aggregate(spark):
    # the register build must map-side combine: two HashAggregate stages
    # around one Exchange keyed on bucket — the shuffle carries <=1024
    # rows per upstream partition regardless of corpus size
    p = plan("hll_distinct", spark)
    assert "SortMergeJoin" not in p  # the spine join rides broadcast
    assert p.count("partial_") >= 1  # map-side partial max/count
    assert "CartesianProduct" not in p


def test_cms_probe_side_broadcasts(spark):
    # the 80-row (top-20 x 4 hashes) probe set must broadcast against the
    # 8192-row sketch — no shuffle of either for the lookup
    p = plan("cms_heavy_hitters", spark)
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_bloom_screen_is_map_side(spark):
    # the packed filter and the exact shingle set each collapse to ONE
    # broadcast row; every corpus doc probes map-side — the only
    # exchanges are the two tiny single-row aggregates
    p = plan("bloom_screen", spark)
    assert "SortMergeJoin" not in p
    assert "BroadcastNestedLoopJoin" in p or "BroadcastExchange" in p
    assert "CartesianProduct" not in p


def test_textrank_is_one_arrow_farm_zero_join(spark):
    # round-12 optimization: a document's co-occurrence graph never
    # spans rows, so the whole PageRank is row-local — ONE Arrow farm,
    # zero joins, zero aggregation exchanges. The only Exchange allowed
    # is fan_out's round-robin scan widening. This also retires the
    # round-11 64x hazard (AQE demoting node-sized iteration tables to
    # driver-OOMing broadcasts) structurally: there is no iteration
    # table to broadcast.
    p = plan("textrank_keywords", spark)
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "SortMergeJoin" not in p
    assert "BroadcastHashJoin" not in p
    assert "MapInPandas" in p or "FlatMapGroupsInPandas" in p
    # formatted explain prints each node twice (tree + numbered detail)
    n_exchanges = p.count(") Exchange")
    assert n_exchanges <= 1, "textrank must not shuffle beyond fan_out"


def test_textrank_farm_ships_only_id_and_tokens(spark):
    # the farm is opaque to Catalyst: an explicit pre-projection must
    # keep the scan at (doc_id, text) — shipping documents' other
    # columns through Arrow would both widen the scan and the boundary
    p = plan("textrank_keywords", spark)
    scan = next(ln for ln in p.splitlines() if "ReadSchema" in ln)
    assert "text" in scan and "doc_id" in scan
    assert "lang" not in scan and "source" not in scan and "n_chars" not in scan


def test_zorder_audit_single_pass_aggregates(spark):
    # the morton key is a pure projection (no UDF, no extra shuffle): the
    # only exchanges are the two bucket aggregations and the 1-row bounds
    # broadcast; both layouts' aggregates partial-combine map-side
    p = plan("zorder_audit", spark)
    assert "SortMergeJoin" not in p
    assert "partial_" in p
    assert "pythonUDF" not in p.lower()


def test_hist_quantiles_bounds_broadcast(spark):
    # per-group bounds (5 rows) broadcast back onto the stream; binning is
    # a projection; per-(group, bin) counts partial-aggregate
    p = plan("hist_quantiles", spark)
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_retrieve_rerank_stage1_is_bounded_heap(spark):
    # stage 1 must cut to 20 candidates via TakeOrderedAndProject (never
    # a corpus-wide sort shuffle); stage 2's window then ranks <=20 rows
    p = plan("retrieve_rerank", spark)
    assert "TakeOrderedAndProject" in p
    assert "Exchange rangepartitioning" not in p
    assert "CartesianProduct" not in p


def test_hybrid_rrf_legs_are_bounded_heaps(spark):
    # both retrieval legs cut to 20 via TakeOrderedAndProject; the fusion
    # joins two 20-row lists — nothing corpus-sized past the scans
    p = plan("hybrid_search_rrf", spark)
    assert p.count("TakeOrderedAndProject") >= 2
    assert "CartesianProduct" not in p


def test_keep_longest_drop_set_broadcasts(spark):
    # the corpus subtraction must stay a broadcast anti-join (the drop
    # set is tiny); a sort-merge anti-join would shuffle the corpus
    p = plan("dedup_keep_longest", spark)
    assert "BroadcastHashJoin" in p and "LeftAnti" in p
    assert "CartesianProduct" not in p


def test_trending_and_decayed_partial_aggregate(spark):
    for name in ("events_trending", "events_decayed_score"):
        p = plan(name, spark)
        assert "partial_" in p, f"{name} lacks map-side combine"
        assert "CartesianProduct" not in p


def test_embedding_outliers_centroids_broadcast(spark):
    # per-label centroid arrays ride a broadcast join back onto the
    # stream; the farthest-10 cut is a bounded heap
    p = plan("embedding_outliers", spark)
    assert "BroadcastHashJoin" in p
    assert "TakeOrderedAndProject" in p


def test_fixed_sample_is_group_limited(spark):
    # per-stratum top-20 must run as a window group limit / rank filter
    # over a hash exchange on lang — never a global sort of the corpus
    p = plan("stratified_fixed_sample", spark)
    assert "Exchange rangepartitioning" not in p
    assert "WindowGroupLimit" in p or "row_number" in p


def test_ann_recall_is_two_actions(spark):
    """The recall audit's round-3 regression was STRUCTURAL: ~10 serial
    driver round trips that a busy cluster scheduler amplifies. The
    restructured audit is exactly TWO actions — one fused model collect
    inside the builder (codebook + all three query vectors + centroids
    in a single union'd round trip), then the returned frame computes in
    one final action — and the scheduler-job total stays well under the
    old serial chain even counting AQE stage-jobs and broadcast builds."""
    # pyspark 4 routes pyspark.sql.DataFrame to the classic impl class —
    # patch the class the runtime actually dispatches to
    from pyspark.sql.classic.dataframe import DataFrame

    sc = spark.sparkContext
    real_collect = DataFrame.collect
    calls = {"n": 0}

    def counting(self):
        calls["n"] += 1
        return real_collect(self)

    DataFrame.collect = counting
    try:
        sc.setJobGroup("annrecall_test", "job-count audit")
        df = QUERIES["ann_recall"].build(spark, SF_T2)
        assert calls["n"] == 1, (
            f"builder ran {calls['n']} internal collects, wants exactly 1"
        )
        rows = real_collect(df)
    finally:
        DataFrame.collect = real_collect
        sc.setJobGroup(None, None)
    assert [r["method"] for r in rows] == ["pq_adc", "ivf", "lsh", "ivf_pq"]
    assert all(0.0 <= r["recall"] <= 1.0 and r["k"] == 10 for r in rows)
    jobs = sc.statusTracker().getJobIdsForGroup("annrecall_test")
    # 2 actions; AQE stage-jobs + broadcast builds ride along. The old
    # structure produced 19 — anything near that is a regression.
    assert len(jobs) <= 12, f"{len(jobs)} scheduler jobs (old serial chain: 19)"


def test_image_phash_dedup_single_shuffle_mapside_partial(spark):
    """The image-dedup plan must be a pure decode farm + one hash shuffle:
    both union branches decode partition-local (MapInPandas directly over
    the synthesized payloads), the clone branch's doc_id % 10 filter is
    pushed into its scan, the dhash groupBy partial-aggregates map-side,
    and there is exactly ONE hash-partitioning exchange (the groupBy) —
    no join of any kind, so nothing can degenerate at 100 TB of media."""
    import re

    for name, key, n_pandas in (
        # image: 1 decode over the union + 1 clone resize (synthesis is
        # JVM-side); audio: 1 fingerprint + 1 clone resample + 2 synthesis
        # stages (the WAV container needs python struct packing)
        ("dedup_image_phash", "dhash", 2),
        ("dedup_audio_fingerprint", "fingerprint", 4),
        # cross-format: PNG synthesis + clone resize + one dhash over the
        # union (the PPM branch synthesizes JVM-side)
        ("dedup_image_cross_format", "dhash", 3),
        # audio cross-format: WAV synthesis + FLAC synthesis + one
        # fingerprint over the union
        ("dedup_audio_cross_format", "fingerprint", 3),
    ):
        p = plan(name, spark)
        # node-detail headers count each node exactly once in formatted mode
        assert len(re.findall(r"\(\d+\) MapInPandas", p)) == n_pandas, name
        assert "SortMergeJoin" not in p and "Cartesian" not in p, name
        assert "BroadcastHashJoin" not in p, name  # no join — exact groupBy
        hash_exchanges = re.findall(r"hashpartitioning\(([a-z_]+)", p)
        assert set(hash_exchanges) == {key}, (name, hash_exchanges)
        assert len(re.findall(r"\(\d+\) HashAggregate", p)) == 2, name  # partial + final
        # the planted-clone branch prunes 90% of the corpus AT THE SCAN
        # (for audio that requires filtering BEFORE the python synthesis)
        assert "PushedFilters: [IsNotNull(doc_id)" in p, name


def test_media_decode_queries_are_shuffle_free(spark):
    """The decode-stats queries are per-row maps: after the (deliberate,
    small-scan-only) fan_out round-robin, no exchange of any kind may
    appear — the 100 TB contract is that decode cost parallelizes with
    the scan and nothing ever re-shuffles the media bytes."""
    import re

    for name in ("multimodal_ppm_decode", "multimodal_wav_decode",
                 "multimodal_ppm_resize", "multimodal_png_decode",
                 "multimodal_png_resize", "multimodal_wav_mulaw_decode",
                 "multimodal_gif_decode", "multimodal_gif_frames",
                 "multimodal_flac_decode"):
        p = plan(name, spark)
        exchanges = re.findall(r"Exchange (\w+)", p)
        assert all(e == "RoundRobinPartitioning" for e in exchanges), (name, exchanges)
        assert "Join" not in p and "Cartesian" not in p, name


def test_lossy_farm_query_plans_are_map_plus_broadcast(spark):
    """The lossy-codec farm queries (baseline JPEG roundtrip, its
    progressive SOF2 twin, MJPEG-in-AVI demux): encode + decode are
    per-row maps (only the fan_out round-robin may move rows), and the
    bounded-error source-mean check joins the tiny doc table by
    BROADCAST — the media bytes are never hash/range-shuffled and never
    sort-merge-joined."""
    import re

    for name in ("multimodal_avi_frames", "multimodal_jpeg_roundtrip",
                 "multimodal_jpeg_progressive"):
        p = plan(name, spark)
        exchanges = re.findall(r"Exchange (\w+)", p)
        assert all(
            e in ("RoundRobinPartitioning", "SinglePartition")
            or "Broadcast" in e
            for e in exchanges
        ), (name, exchanges)
        assert "BroadcastExchange" in p, name  # the doc-side mean lookup
        assert "SortMergeJoin" not in p and "Cartesian" not in p, name


def test_warc_extract_is_shuffle_free_scan_plus_map(spark):
    """The first-mile pipeline (WARC shards -> records -> HTML -> text)
    is scan -> Arrow-batched record walk -> JVM regexp projection: NO
    exchange of any kind — at 100 TB the extraction parallelizes with
    the shard scan (parallelism = shard count, the format's contract)
    and the crawl bytes are never shuffled."""
    p = plan("warc_extract", spark)
    assert "Exchange" not in p
    assert "Join" not in p and "Cartesian" not in p
    assert "MapInPandas" in p  # the record walk (one Arrow hop, bounded per shard)


def test_global_dedup_reassembly_rides_the_drop_set(spark):
    # round-9 dedup perf refactor: reassembly must NOT regroup kept text
    # through a corpus-sized collect_list shuffle — each doc is rebuilt
    # by a codegen index-filter over its original array, and the only
    # thing that shuffles per doc is the (small) dropped/covered position
    # set (collect_set of ints, never the text)
    for name in ("line_dedup_global", "dedup_substring_global"):
        p = plan(name, spark)
        assert "collect_list" not in p, f"{name} regroups kept text"
        assert "CartesianProduct" not in p


def test_keep_longest_has_no_corpus_self_join(spark):
    # round-9 dedup perf refactor: n_tokens is a projection of text, so
    # the final select must not join the corpus back to itself — the
    # only joins touching corpus-sized relations are the broadcast
    # anti-join (drop set) and the minhash pipeline's internals
    p = plan("dedup_keep_longest", spark)
    assert "SortMergeJoin" not in p
