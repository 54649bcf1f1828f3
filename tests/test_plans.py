"""Physical-plan shape regression tests.

Throughput claims live in BENCH/; these tests pin the PLAN properties
the claims rest on, so a refactor that silently de-broadcasts a join,
breaks scan pruning, or adds a shuffle fails CI rather than only
showing up as a slower benchmark. (The reference has no optimizer to
test; this suite is the engine's analog of its operator-contract
unit tests.)
"""

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry
from protosc_spark.extract import extract
from protosc_spark.features.text import default_text_extractors
from protosc_spark.windows import rolling_agg, sessionize, with_lag_lead

SF = "/root/testdata/sf0.001"


def plan(df) -> str:
    """Physical plan text, truncated at the first cache boundary —
    InMemoryRelation prints its (already materialized) child plan,
    whose exchanges are not re-executed."""
    p = df._jdf.queryExecution().executedPlan().toString()
    idx = p.find("InMemoryRelation")
    return p if idx < 0 else p[:idx]


def n_shuffles(p: str) -> int:
    return p.count("Exchange hashpartitioning") + p.count(
        "Exchange rangepartitioning"
    )


@pytest.fixture(scope="module")
def queries():
    return entry.queries()


def test_q1_pushes_filter_and_prunes_columns(spark, queries):
    p = plan(queries["q1_pricing_summary"](spark, SF))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in p
    # scan reads only the 7 needed columns of 16
    read = p.split("ReadSchema:")[1].splitlines()[0]
    assert "l_comment" not in read and "l_partkey" not in read


def test_q3_joins_broadcast_not_sortmerge(spark, queries):
    p = plan(queries["q3_order_revenue"](spark, SF))
    assert p.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in p and "CartesianProduct" not in p


def test_extract_is_narrow_single_python_stage(spark, transcripts):
    out, _ = extract(
        transcripts, list(default_text_extractors()), keep_cols=["conv_id"]
    )
    p = plan(out)
    # both pandas UDFs batched into ONE Arrow exchange, no shuffle at all
    assert p.count("ArrowEvalPython") == 1
    assert n_shuffles(p) == 0


def test_window_chain_single_shuffle(spark, transcripts):
    df = transcripts.withColumn(
        "nt", F.size(F.split("text", " ")).cast("double")
    )
    df = with_lag_lead(df, {"x": "nt"}, order="turn_idx")
    df = rolling_agg(df, {"rm": F.avg("nt")}, n_rows=5, order="turn_idx")
    df = sessionize(df, gap_seconds=1800, order=["turn_idx"])
    # lag + rolling + sessionize all ride ONE conv_id exchange — and
    # when the input is already hash-partitioned on conv_id (the cached
    # fixture is, because datagen itself windows on conv_id), ZERO
    assert n_shuffles(plan(df)) <= 1


def test_flagship_shuffle_budget(spark, transcripts):
    from protosc_spark.pipeline import flagship_features

    out, _ = flagship_features(transcripts, dedup=True)
    p = plan(out)
    # dedup + every window feature share one conv_id exchange; the
    # cached-input boundary appears as at most one more
    assert n_shuffles(p) <= 2
    assert p.count("ArrowEvalPython") == 1
    assert "CartesianProduct" not in p


def test_jaccard_single_pair_shuffle_no_nested_loop(spark, queries):
    p = plan(queries["dedup_ngram_jaccard"](spark, SF))
    assert "BroadcastNestedLoopJoin" not in p and "CartesianProduct" not in p
    # one hash shuffle for the pair aggregate; per-doc count joins are
    # broadcast (the trailing rangepartitioning is the oracle orderBy)
    assert p.count("Exchange hashpartitioning") == 1


def test_asof_window_impl_single_shuffle(spark, queries):
    p = plan(queries["asof_join_purchase"](spark, SF))
    assert n_shuffles(p) == 1
    assert "SortMergeJoin" not in p  # it's a union + window, not a join


def test_tfidf_topk_plan_no_python_no_cartesian(spark):
    from protosc_spark.textops import tfidf_topk

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    p = plan(tfidf_topk(docs, k=3, min_df=2))
    # pure JVM: no Python evaluation nodes anywhere
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p
    # the ONLY product allowed is the 1-row n_docs broadcast cross
    # join; a second one means a real join regressed
    assert p.count("CartesianProduct") + p.count("BroadcastNestedLoop") <= 1
    # df comes from a token window over the tf table, NOT a second
    # corpus explode: exactly one Generate node in the whole plan
    assert p.count("Generate explode") == 1
    # tf agg + token window + per-doc window: bounded budget
    assert n_shuffles(p) <= 5


def test_line_dedup_plan_shape(spark):
    from protosc_spark.dedup import line_dedup

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", F.regexp_replace("text", " ", "\n").alias("text")
    )
    p = plan(line_dedup(docs))
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p
    assert "CartesianProduct" not in p
    # line window + two per-doc aggs + reassembly join
    assert n_shuffles(p) <= 4


def test_corpus_stats_single_aggregation_exchange(spark, queries):
    p = plan(queries["corpus_stats_by_source"](spark, SF))
    # one hash shuffle for the groupBy (+ range exchange for ORDER BY)
    assert p.count("Exchange hashpartitioning") == 1
    assert "ArrowEvalPython" not in p


def test_connected_components_lineage_is_cut(spark):
    """Each CC round localCheckpoints, so the RETURNED plan must be a
    flat scan of materialized partitions — no O(rounds) nested plan,
    no re-executable exchanges."""
    import pandas as pd
    from protosc_spark.dedup import connected_components

    pairs = spark.createDataFrame(
        pd.DataFrame([(0, 1), (1, 2), (5, 6)], columns=["doc_a", "doc_b"])
    )
    p = plan(connected_components(pairs))
    assert "ExistingRDD" in p or "Scan ExistingRDD" in p
    assert n_shuffles(p) == 0


def test_mixture_sample_broadcasts_rates_no_sortmerge(spark):
    """mixture_sample: the rate table joins back to the corpus as a
    BROADCAST hash join (rates are |groups| rows); the corpus itself is
    never sort-merge-joined or re-shuffled beyond the tiny count
    aggregation, and the row filter stays JVM-only."""
    from protosc_spark.sampling import mixture_sample

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    p = plan(mixture_sample(docs, group_col="lang"))
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p


def test_chunk_documents_is_map_only(spark):
    """Context-window chunking: pure projection — zero exchanges,
    zero Python, whole-stage codegen territory."""
    from protosc_spark.textops import chunk_documents

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    p = plan(chunk_documents(docs, chunk_tokens=12, stride=8))
    assert n_shuffles(p) == 0
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p


def test_knn_batch_no_cartesian_one_candidate_path(spark):
    """ivf_topk_batch: candidates come from the cell cogroup — never a
    cartesian/broadcast-nested-loop product of queries x corpus."""
    from protosc_spark.similarity import knn_graph

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    p = plan(knn_graph(emb, k=3, n_centroids=8, n_probe=2))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "FlatMapCoGroupsInPandas" in p  # the per-cell BLAS kernel


def test_dup_spans_plan_no_python_bounded_shuffles(spark, queries):
    """duplicated_span_stats must stay all-JVM (window hashing is a
    codegen'd transform, not a UDF) and keep a bounded shuffle budget:
    the hash groupBy, the windows->dup-hash join, the coverage window
    and the final per-doc joins — no Python stage, no cartesian."""
    p = plan(queries["corpus_dup_spans"](spark, SF))
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p
    assert "CartesianProduct" not in p
    assert n_shuffles(p) <= 8


def test_dsir_plan_broadcast_ratio_table_no_python(spark):
    """dsir_log_weights: the bucket-ratio table joins onto the corpus
    tokens as a BROADCAST (n_buckets rows), never a sort-merge; no
    Python anywhere."""
    from protosc_spark.sampling import dsir_log_weights

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    target = docs.where(F.col("lang") == "en")
    p = plan(dsir_log_weights(docs, target, n_buckets=1 << 12))
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_dsir_sample_keep_rule_is_jvm_filter(spark, queries):
    """The final keep decision is a codegen'd md5-bucket filter over
    broadcast 1-row aggregates — no rank window over all docs (the
    scale-killer the softmax formulation avoids), no Python."""
    p = plan(queries["corpus_dsir_sample"](spark, SF))
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p
    # a global top-frac ranking would need a Window; the softmax
    # keep-prob formulation needs none at all
    assert "Window" not in p
    assert p.count("CartesianProduct") == 0


def test_wav_gate_single_python_stage(spark, queries):
    """mm_wav_features: encode UDF + decode/feature kernel are the
    only Python stages (2), everything else JVM."""
    p = plan(queries["mm_wav_features"](spark, SF))
    assert (
        p.count("ArrowEvalPython") + p.count("MapInPandas")
        + p.count("BatchEvalPython") <= 2
    )


def test_g711_gate_single_python_stage(spark, queries):
    """mm_g711_features: same shape as the WAV gate — encode UDF +
    decode/feature kernel are the only Python stages (2)."""
    p = plan(queries["mm_g711_features"](spark, SF))
    assert (
        p.count("ArrowEvalPython") + p.count("MapInPandas")
        + p.count("BatchEvalPython") <= 2
    )


def test_flac_gate_single_python_stage(spark, queries):
    """mm_flac_features: same shape as the WAV gate — encode UDF +
    decode/feature kernel are the only Python stages (2)."""
    p = plan(queries["mm_flac_features"](spark, SF))
    assert (
        p.count("ArrowEvalPython") + p.count("MapInPandas")
        + p.count("BatchEvalPython") <= 2
    )


def test_video_gate_three_python_stages(spark, queries):
    """mm_video_frames: mux UDF + frame-sampling kernel + JPEG decode
    kernel are the only Python stages (3); the per-frame mean-pixel
    reduction is JVM (F.aggregate), and no shuffle beyond the final
    orderBy (frames explode WHERE the blob is scanned)."""
    p = plan(queries["mm_video_frames"](spark, SF))
    assert (
        p.count("ArrowEvalPython") + p.count("MapInPandas")
        + p.count("BatchEvalPython") <= 3
    )
    assert p.count("CartesianProduct") == 0


def test_bm25_topk_plan_no_python_broadcast_queries(spark):
    from protosc_spark.textops import bm25_topk

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    p = plan(
        bm25_topk(docs, [(0, "spark window join"), (1, "fast table scan")])
    )
    # pure JVM end-to-end
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p
    # query-term join and the 1-row stats join are both broadcast;
    # nothing sort-merges the corpus against the tiny sides
    assert "SortMergeJoin" not in p
    # the only nested-loop product allowed is the 1-row stats cross
    assert p.count("CartesianProduct") + p.count("BroadcastNestedLoop") <= 1
    # vocabulary filter must sit below the tf aggregation (one explode
    # for tf, one for the stats-side size() pass at most)
    assert p.count("Generate explode") <= 2
    # tf agg + token window + qid aggs + two top-k windows: bounded
    assert n_shuffles(p) <= 6


def test_cube_stats_single_pass_expand(spark, queries):
    """CUBE must compile to ONE Expand + aggregate over one scan —
    not a 4-way union of groupBys (4 scans) a naive rollup would
    run."""
    p = plan(queries["corpus_cube_stats"](spark, SF))
    assert "Expand" in p
    assert p.count("FileScan parquet") == 1
    assert "Union" not in p
    # partial+final agg pair over the expanded rows: one exchange,
    # plus the final orderBy's range exchange
    assert n_shuffles(p) + p.count("Exchange rangepartitioning") <= 3


def test_daily_monitor_pair_joins_materialize_daily_once(spark, queries):
    """ACF/CCF/MK reuse the calendar-bounded daily table across
    moments + both pair-join sides; the localCheckpoint makes the
    raw scan run ONCE (the visible plan reads the checkpointed
    table, so zero parquet scans remain in it — previously 6/8/3)."""
    for name in ("events_acf_volume", "events_ccf_volume",
                 "events_trend_mk"):
        p = plan(queries[name](spark, SF))
        assert p.count("FileScan parquet") == 0, name


def test_burstiness_topk_not_global_sort(spark):
    from protosc_spark.textops import word_burstiness

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    p = plan(word_burstiness(docs, k=50))
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p
    # deterministic head must be TakeOrderedAndProject, never a
    # global Sort + Limit over the vocabulary
    assert "TakeOrderedAndProject" in p
    assert "Exchange rangepartitioning" not in p
    assert p.count("Generate explode") == 1
    assert n_shuffles(p) <= 2


def test_char_entropy_single_explode(spark):
    from protosc_spark.textops import char_entropy

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    p = plan(char_entropy(docs))
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p
    # one corpus scan: per-doc totals ride a window over the cell
    # table, not a join against a second explode
    assert p.count("Generate explode") == 1
    assert n_shuffles(p) <= 2


def test_rfm_no_global_entity_sort(spark):
    from protosc_spark.evaluation import rfm_segments

    orders = spark.read.parquet(f"{SF}/orders.parquet")
    p = plan(
        rfm_segments(
            orders, "o_custkey", "o_orderdate", "o_totalprice"
        )
    )
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p
    # quintiles come from value histograms: no rank/ntile window
    # over the full entity table (= no range exchange anywhere)
    assert "Exchange rangepartitioning" not in p
    assert "CartesianProduct" not in p


def test_kruskal_histogram_plan(spark):
    from protosc_spark.evaluation import kruskal_wallis

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "n_chars", F.col("lang").alias("g")
    )
    p = plan(kruskal_wallis(docs, "n_chars", "g"))
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p
    assert "CartesianProduct" not in p
    # ranks run over distinct values, never a corpus range sort
    assert "Exchange rangepartitioning" not in p


def test_entropy_rate_single_entity_exchange(spark):
    from protosc_spark.windows import entropy_rate

    ev = spark.read.parquet(f"{SF}/events.parquet")
    p = plan(entropy_rate(ev))
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p
    # the counts checkpoint cuts the pair stream: everything after
    # runs on |states|^2 rows
    assert n_shuffles(p) <= 4


def test_holt_winters_plan_no_python_no_sort(spark):
    from protosc_spark.windows import holt_winters

    ev = spark.read.parquet(f"{SF}/events.parquet").select(
        "event_type", "ts"
    )
    p = plan(holt_winters(ev, "event_type"))
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p
    # the recursion is a Catalyst aggregate over sort_array state:
    # one daily agg + one series agg, no range exchange
    assert "Exchange rangepartitioning" not in p
    assert n_shuffles(p) <= 2


def test_q5_broadcast_chain_no_sortmerge(spark, queries):
    p = plan(queries["q5_local_supplier"](spark, SF))
    # dims flow through a broadcast chain; the only shuffles are
    # the aggregation exchange and the 5-row output sort
    assert "SortMergeJoin" not in p
    assert p.count("BroadcastHashJoin") >= 4
    assert n_shuffles(p) <= 2
    # region filter reached the scan
    assert "PushedFilters" in p and "ASIA" in p


def test_sft_pack_pure_jvm_bounded_shuffles(spark):
    from protosc_spark.datagen import generate_transcripts
    from protosc_spark.posttrain import sft_pack

    tr = generate_transcripts(spark, n_conversations=60, seed=3)
    p = plan(sft_pack(tr, max_len=512, bucket_width=16))
    # next-fit runs as a Catalyst aggregate fold, never Python
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p
    # no global sort: packing order is per-bucket, hash-partitioned
    assert "Exchange rangepartitioning" not in p
    # sizes agg + bucket agg (+ the 1-row count broadcast)
    assert n_shuffles(p) <= 3


def test_dpo_pairs_no_collect_list_at_prompt_level(spark):
    from protosc_spark.datagen import generate_transcripts
    from protosc_spark.posttrain import dpo_pairs

    tr = generate_transcripts(spark, n_conversations=60, seed=3)
    p = plan(dpo_pairs(tr))
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p
    # collect_list appears only in the conversation rollup (printed
    # twice: partial + final agg); the prompt-level stage is min/max
    # structs only — the viral-prompt skew guard
    assert p.count("collect_list") <= 2
    assert "n_candidates" in p  # prompt stage present
    assert n_shuffles(p) <= 2


def test_time_decay_single_exchange_pure_jvm(spark):
    from protosc_spark.datagen import generate_transcripts
    from protosc_spark.windows import time_decay_features

    tr = generate_transcripts(spark, n_conversations=60, seed=3)
    p = plan(time_decay_features(tr, None))
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p
    # one conversation rollup carries the whole fold
    assert n_shuffles(p) <= 1


def test_nb_predict_broadcasts_label_table(spark):
    from pyspark.sql import functions as F

    from protosc_spark.classifier import nb_predict, nb_train

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    tr = docs.select(F.col("source").alias("label"), "text")
    lik, labels = nb_train(tr, "label")
    p = plan(nb_predict(lik, labels, docs.select("doc_id", "text")))
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p
    # the label table rides a broadcast; the only big join is the
    # token-keyed equi-join against the likelihood table
    assert "Broadcast" in p


def test_isotonic_pairs_never_touch_corpus_rows(spark):
    from pyspark.sql import functions as F

    from protosc_spark.evaluation import isotonic_calibration

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        (F.col("n_chars") % 20).cast("int").alias("score"),
        (F.col("n_chars") % 2).cast("int").alias("y"),
    )
    p = plan(isotonic_calibration(docs, "score", "y"))
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p
    # corpus is touched by ONE scan feeding the histogram aggregate;
    # the V-row collapse is lineage-cut, so every downstream consumer
    # (both pair-join sides, the output join) reads the checkpoint
    assert p.count("Scan parquet") == 0
    assert "ExistingRDD" in p or "LocalTableScan" in p


def test_weighted_quantiles_histogram_collapse(spark):
    from pyspark.sql import functions as F

    from protosc_spark.sketches import weighted_quantiles

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    p = plan(weighted_quantiles(docs, "n_chars", "n_chars", "source"))
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p
    # corpus feeds ONE histogram aggregation; the V-row collapse is
    # lineage-cut so the probe join and totals read the checkpoint
    assert p.count("Scan parquet") == 0
    assert "ExistingRDD" in p or "LocalTableScan" in p


def test_sprt_single_day_window(spark):
    from protosc_spark.experiment import sprt_monitor

    ev = spark.read.parquet(f"{SF}/events.parquet")
    p = plan(sprt_monitor(ev, p0=0.3, p1=0.45, conversion_threshold=5))
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p
    # the trajectory window runs over the calendar-sized day table,
    # partitioned by state; the only range exchange is the
    # |states|-row output ORDER BY
    assert p.count("Exchange rangepartitioning") <= 1


def test_bradley_terry_one_row_fold(spark):
    from protosc_spark.evaluation import bradley_terry

    m = spark.createDataFrame(
        [("x", "y", 7.0, 3.0), ("y", "z", 5.0, 5.0)],
        "a string, b string, wins_a double, wins_b double",
    )
    p = plan(bradley_terry(m, n_iter=5))
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p
    # the MM iteration is a Catalyst fold on the one-row assembly:
    # no per-iteration shuffles, no Python
    assert n_shuffles(p) <= 3
