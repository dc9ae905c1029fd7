"""Physical-plan regression guards (scale contract, SURVEY.md §4).

These assert the *shape* of the plans Catalyst produces, not results:
- the extraction pipeline must stay a zero-exchange narrow map with a
  column-pruned scan (url, html only);
- small-dimension joins must stay broadcast (no SortMergeJoin creep);
- predicate pushdown must reach the parquet scan.

A regression here is invisible to correctness tests but catastrophic at
corpus scale, so it gets its own failing test.
"""

import re

import pandas as pd
import pytest
from pyspark.sql import functions as F


def _plan(spark, df) -> str:
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


@pytest.fixture(scope="module")
def pages_parquet(spark, tmp_path_factory):
    from pdf_spark.gen.corpus import rows_for_texts

    out = str(tmp_path_factory.mktemp("plans") / "pages")
    df = spark.createDataFrame(
        pd.DataFrame(rows_for_texts([f"plan audit doc {i}" for i in range(64)]))
    )
    df.write.parquet(out)
    return out


def test_extraction_plan_is_narrow_and_pruned(spark, pages_parquet):
    from pdf_spark.operators.extract import extract_docs_text

    pages = spark.read.parquet(pages_parquet)
    plan = _plan(spark, extract_docs_text(pages))
    assert "Exchange" not in plan, "extraction must stay shuffle-free"
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    assert schemas, plan
    cols = {c.split(":")[0] for c in schemas[0].split(",")}
    assert cols == {"url", "html"}, f"scan not pruned: {cols}"


def test_dim_joins_stay_broadcast(spark):
    from pdf_spark.functions.registry import all_queries

    q = all_queries()
    sf = "/root/testdata/sf0.001"
    for name in ("qr03_broadcast_join_segment", "qr04_multiway_dim_join"):
        plan = _plan(spark, q[name](spark, sf))
        assert "BroadcastHashJoin" in plan, name
        assert "SortMergeJoin" not in plan, f"{name}: dim join degraded to SMJ"
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_filter_pushdown_reaches_scan(spark):
    sf = "/root/testdata/sf0.001"
    df = (
        spark.read.parquet(f"{sf}/customer.parquet")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    plan = _plan(spark, df)
    assert re.search(r"PushedFilters: \[[^\]]*EqualTo\(c_mktsegment,BUILDING\)", plan)
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    cols = {c.split(":")[0] for c in schemas[0].split(",")}
    assert "c_acctbal" not in cols, "projection not pruned"


def test_lsh_band_joins_reuse_persisted_stage(spark):
    """The staged signature table must feed every band join from cache —
    re-deriving it per band would multiply the aggregation cost by the
    band count (the Catalyst CTE-inlining trap)."""
    from pdf_spark.functions.registry import all_queries

    q = all_queries()
    plan = _plan(
        spark, q["qt06_minhash_lsh_pairs"](spark, "/root/testdata/sf0.001")
    )
    assert plan.count("InMemoryTableScan") >= 4  # 2 bands x 2 join sides


def test_bucketed_sink_join_avoids_shuffle(spark):
    """Bucketing the docs_text sink by url lets downstream url-keyed joins
    (parity checks, metadata enrichment, incremental diffs) run without
    shuffling either side — the co-location technique the 100 TB design
    relies on for repeated joins against the extraction output."""
    import pandas as pd

    from pdf_spark.gen.corpus import rows_for_texts
    from pdf_spark.operators.extract import extract_docs_text

    # tables land in the session's default warehouse dir (gitignored);
    # warehouse.dir is a static conf and cannot be set per-test. A fresh
    # session's catalog doesn't know about a previous run's directories,
    # so stale locations must be removed from disk too.
    import shutil

    spark.sql("DROP TABLE IF EXISTS docs_bucketed")
    spark.sql("DROP TABLE IF EXISTS meta_bucketed")
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("docs_bucketed", "meta_bucketed"):
        shutil.rmtree(f"{wh}/{t}", ignore_errors=True)

    pages = spark.createDataFrame(
        pd.DataFrame(rows_for_texts([f"bucketed doc {i}" for i in range(64)]))
    )
    docs = extract_docs_text(pages)
    docs.write.bucketBy(8, "url").sortBy("url").saveAsTable("docs_bucketed")
    pages.select("url", "lang").write.bucketBy(8, "url").sortBy(
        "url"
    ).saveAsTable("meta_bucketed")

    # disable broadcast so the join exercises the bucketed SMJ path the
    # way two large-at-scale tables would
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("docs_bucketed").join(
            spark.table("meta_bucketed"), "url"
        )
        plan = _plan(spark, joined)
        # co-located: SortMergeJoin without an Exchange on either side
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "bucketed join must not shuffle"
        assert joined.count() == 64
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS docs_bucketed")
        spark.sql("DROP TABLE IF EXISTS meta_bucketed")


def test_contamination_probe_plan_broadcasts(spark):
    """qt19: the probe side must broadcast (map-side shingle match, no
    sort-merge join of the exploded shingle table), or the 10^12-doc
    version shuffles the entire shingle explosion."""
    from pdf_spark.functions.registry import all_queries

    df = all_queries()["qt19_contamination_probe"](
        spark, "/root/testdata/sf0.001"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_new_operator_plan_shapes(spark):
    """Session-4 operators keep their scale shapes: the WARC flattener and
    metadata/normalization maps are shuffle-free; the link-graph histogram
    pays exactly one exchange (the groupBy); URL canonicalization has no
    Python eval node at all."""
    from pdf_spark.functions.registry import all_queries

    q = all_queries()
    sf = "/root/testdata/sf0.001"

    def exchanges(plan: str) -> int:
        # formatted explain lists each node once as "(N) Exchange" in the
        # detail section; the tree render would double-count
        return len(re.findall(r"\(\d+\) Exchange\b", plan))

    for name in ("qx10_doc_metadata", "qx12_warc_ingest",
                 "qt21_text_normalize", "qx13_pdf_outline",
                 "qx14_jsonld", "qx15_robots_rules"):
        plan = _plan(spark, q[name](spark, sf))
        assert exchanges(plan) == 0, f"{name}: map stage grew a shuffle"

    for name in ("qx11_pdf_link_graph", "qx08_html_link_graph"):
        plan = _plan(spark, q[name](spark, sf))
        assert exchanges(plan) == 1, f"{name}: expected exactly the groupBy shuffle"

    plan = _plan(spark, q["qt20_url_canonicalize"](spark, sf))
    assert exchanges(plan) == 0
    assert "EvalPython" not in plan, "qt20 must stay JVM-only"


def test_session5_operator_plan_shapes(spark):
    """qt25/26/27 keep their scale shapes: PII masking is a pure map
    (zero exchanges, JVM regex only); paragraph dedup pays the freq
    groupBy + join-back shuffles but keeps partial aggregation map-side;
    sequence packing's window is partitioned (no single-partition
    Exchange SinglePartition in the plan)."""
    from pdf_spark.functions.registry import all_queries

    q = all_queries()
    sf = "/root/testdata/sf0.001"

    def exchanges(plan: str) -> int:
        return len(re.findall(r"\(\d+\) Exchange\b", plan))

    plan = _plan(spark, q["qt26_pii_mask"](spark, sf))
    assert exchanges(plan) == 0, "qt26: PII mask must stay a narrow map"
    assert "EvalPython" not in plan, "qt26 must stay JVM-only"

    plan = _plan(spark, q["qt25_paragraph_dedup"](spark, sf))
    assert "HashAggregate" in plan
    assert "partial_count" in plan, "qt25: freq count lost map-side combine"

    plan = _plan(spark, q["qt27_sequence_packing"](spark, sf))
    assert "SinglePartition" not in plan, (
        "qt27: packing window collapsed to one partition — scale-killer"
    )

    plan = _plan(spark, q["qt29_hashed_linear_quality"](spark, sf))
    assert "BroadcastHashJoin" in plan, "qt29: weight table must broadcast"
    assert "SortMergeJoin" not in plan, "qt29: classifier join degraded to SMJ"

    plan = _plan(spark, q["qt32_dehyphenate"](spark, sf))
    assert exchanges(plan) == 0, "qt32: dehyphenation must stay a narrow map"
    assert "EvalPython" not in plan, "qt32 must stay JVM-only"

    plan = _plan(spark, q["qt05_minhash_signatures"](spark, sf))
    assert exchanges(plan) == 0, (
        "qt05: minhash signatures regressed to explode+groupBy — at corpus "
        "scale that exchange of every shingle row IS the job"
    )

    plan = _plan(spark, q["qt13_kgram_min_fingerprint"](spark, sf))
    assert exchanges(plan) == 0, "qt13: k-gram fingerprint regressed to a shuffle"

    plan = _plan(spark, q["qt23_repetition_rules"](spark, sf))
    assert exchanges(plan) == 0, (
        "qt23: repetition rules regressed to the per-bigram groupBy shuffle"
    )

    plan = _plan(spark, q["qt34_c4_line_rules"](spark, sf))
    assert exchanges(plan) == 0, "qt34: line cleaning must stay a narrow map"

    plan = _plan(spark, q["qr23_sessionize"](spark, sf))
    assert exchanges(plan) <= 2, (
        "qr23: sessionize grew beyond the shared window exchange + "
        "per-session aggregate shuffle"
    )

    plan = _plan(spark, q["qt08_simhash"](spark, sf))
    assert exchanges(plan) == 1, (
        "qt08: expected exactly the 1-row/doc groupBy exchange — the "
        "(doc_id, hash) DISTINCT exchange must stay deleted"
    )
    assert "partial" in plan.lower(), "qt08: lost map-side combine"


def test_asof_and_range_join_shapes(spark):
    """qr25 must stay the single-exchange union-merge as-of (no per-probe
    range lookup); qr26 must plan as a hash equi-join on (key, bucket) —
    a NestedLoop regression is the shape that dies at corpus scale."""
    from __spark_entry__ import queries

    q = queries()
    sf = "/root/testdata/sf0.001"

    plan = _plan(spark, q["qr25_asof_join"](spark, sf))
    assert len(re.findall(r"\(\d+\) Exchange\b", plan)) == 1, (
        "qr25: as-of join must cost exactly one user_id exchange"
    )
    assert "NestedLoop" not in plan

    plan = _plan(spark, q["qr26_range_join_bucketed"](spark, sf))
    assert "NestedLoop" not in plan, (
        "qr26: range join regressed to an interval product"
    )
    assert ("BroadcastHashJoin" in plan) or ("SortMergeJoin" in plan) or (
        "ShuffledHashJoin" in plan
    )


def test_global_rank_avoids_single_partition(spark):
    """qr38's whole point: a global total-order ranking WITHOUT the
    Exchange SinglePartition a plain ROW_NUMBER() OVER (ORDER BY ...)
    plans (one task sees every row — dead at corpus scale). The
    two-phase range-partition + offset form must keep the plan free of
    any single-partition exchange."""
    from pdf_spark.functions.relational import QUERIES

    df = QUERIES["qr38_scalable_global_rank"](spark, "/root/testdata/sf0.001")
    plan = _plan(spark, df)
    assert "SinglePartition" not in plan
    # and the naive form DOES plan one (the thing being avoided is real)
    from pdf_spark.functions.tables import register_views

    register_views(spark, "/root/testdata/sf0.001")
    naive = spark.sql(
        "SELECT doc_id, ROW_NUMBER() OVER (ORDER BY n_chars DESC, doc_id)"
        " AS rank FROM documents"
    )
    assert "SinglePartition" in _plan(spark, naive)


def test_png_decode_queries_stay_narrow(spark):
    """qm06/qm07 (real PNG encode->decode->featurize) must stay zero-
    exchange narrow maps over a doc_id-pruned scan — the decode tier adds
    per-row CPU, never a shuffle."""
    from pdf_spark.functions.multimodal import QUERIES

    for name in ("qm06_png_decode_features", "qm07_png_ahash"):
        plan = _plan(spark, QUERIES[name](spark, "/root/testdata/sf0.001"))
        assert "Exchange" not in plan, f"{name} must stay shuffle-free"
        m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
        assert m and m.group(1).startswith("doc_id"), (
            f"{name} scan must prune to doc_id: {m and m.group(1)}"
        )


def test_round4_session_operator_plan_shapes(spark):
    """Plan pins for the round-4 late-session operators: the scale
    property each one claims must be visible in its physical plan."""
    import re as _re

    from pdf_spark.functions.registry import all_queries

    q = all_queries()
    sf = "/root/testdata/sf0.001"

    # qt55 DSIR: both <=256-row distribution tables join BROADCAST —
    # the corpus-sized probe side must never shuffle for them
    plan = _plan(spark, q["qt55_dsir_importance"](spark, sf))
    assert plan.count("BroadcastHashJoin") >= 2
    # qt61 per-host caps: the rank window is PARTITIONED (hashpartitioning
    # by host) — never a single-partition global sort
    plan = _plan(spark, q["qt61_per_host_caps"](spark, sf))
    assert "SinglePartition" not in plan
    assert _re.search(r"hashpartitioning\(host", plan)
    # qs15 binary quantization: shortlist via TakeOrderedAndProject —
    # no global Sort node materializes the full Hamming scan
    plan = _plan(spark, q["qs15_binary_quantization"](spark, sf))
    assert "TakeOrderedAndProject" in plan
    # qt62 char entropy: pure aggregate pipeline — no joins, no windows
    plan = _plan(spark, q["qt62_char_entropy"](spark, sf))
    assert "Join" not in plan and "Window" not in plan
    # qt64 fertility: map-side partial aggregation present (partial_
    # functions before the lang exchange), output bounded by #languages
    plan = _plan(spark, q["qt64_tokenizer_fertility"](spark, sf))
    assert "partial_" in plan


def test_session6_operator_plan_shapes(spark):
    """Plan pins for this session's operators: each claimed scale
    property must be visible in the physical plan."""
    import re as _re

    from pdf_spark.functions.registry import all_queries

    q = all_queries()
    sf = "/root/testdata/sf0.001"

    # qt68 domain boilerplate: the (host, line) frequency groupBy is
    # map-side combined and the per-doc reassembly window never
    # collapses to a single partition
    plan = _plan(spark, q["qt68_domain_boilerplate"](spark, sf))
    assert "partial_" in plan
    assert "SinglePartition" not in plan
    # qg09 link prediction: the wedge join + anti-join are HASH joins —
    # a cartesian/nested-loop here would be the all-pairs blowup the
    # design exists to avoid
    plan = _plan(spark, q["qg09_link_prediction"](spark, sf))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "TakeOrderedAndProject" in plan  # top-20, no global sort
    # qr43 window frames: ONE exchange on the partition key feeds all
    # four window functions (same spec -> same Window node pipeline),
    # never a global (empty-key) window
    plan = _plan(spark, q["qr43_window_frames"](spark, sf))
    assert _re.search(r"hashpartitioning\(o_custkey", plan)
    assert "SinglePartition" not in plan
    # container/doc-format extractors are pure map-side mapInPandas over
    # a doc_id-pruned scan: no exchange anywhere
    for name in (
        "qm37_zip_inventory",
        "qx43_docx_text",
        "qx44_epub_text",
        "qx45_eml_text",
        "qx46_rtf_text",
        "qx47_odt_text",
        "qx48_markdown_source",
        "qx49_latex_source",
        "qx50_csv_sniff",
        "qm38_font_meta",
        "qm39_tar_inventory",
        "qm40_favicon_meta",
        "qx51_http_header_audit",
    ):
        plan = _plan(spark, q[name](spark, sf))
        assert "Exchange" not in plan, f"{name} must stay shuffle-free"
        m = _re.search(r"ReadSchema: struct<([^>]*)>", plan)
        assert m and m.group(1).startswith("doc_id"), (
            f"{name} scan must prune to doc_id: {m and m.group(1)}"
        )


def test_session6b_operator_plan_shapes(spark):
    """Plan pins for the second half of this session's operators."""
    import re as _re

    from pdf_spark.functions.registry import all_queries

    q = all_queries()
    sf = "/root/testdata/sf0.001"

    # qs18 ANN join: bucket equi-joins only, per-query window is
    # PARTITIONED by qid — no cartesian, no single-partition sort
    plan = _plan(spark, q["qs18_ann_join"](spark, sf))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert _re.search(r"hashpartitioning\(qid", plan)
    # qt69 vocab growth: in-row arrays — no explode, no shuffle beyond
    # the scan
    plan = _plan(spark, q["qt69_vocab_growth"](spark, sf))
    assert "Generate" not in plan and "Exchange" not in plan
    # qg10 histogram: two aggregates, both map-side combined
    plan = _plan(spark, q["qg10_degree_histogram"](spark, sf))
    assert "partial_" in plan
    # map-side doc-format extractors stay shuffle-free on pruned scans
    for name in (
        "qx52_xlsx_cells",
        "qx53_pptx_text",
        "qx54_ical_events",
        "qx55_json_audit",
        "qx56_reply_strip",
        "qx57_wikitext_strip",
        "qm41_png_integrity",
        "qt70_script_spoof",
    ):
        plan = _plan(spark, q[name](spark, sf))
        assert "Exchange" not in plan, f"{name} must stay shuffle-free"
        m = _re.search(r"ReadSchema: struct<([^>]*)>", plan)
        assert m and m.group(1).startswith("doc_id"), (
            f"{name} scan must prune to doc_id: {m and m.group(1)}"
        )


def test_session6c_operator_plan_shapes(spark):
    """Plan pins for the close-of-session operators."""
    import re as _re

    from pdf_spark.functions.registry import all_queries

    q = all_queries()
    sf = "/root/testdata/sf0.001"

    # qt71 curriculum: the position window is PARTITIONED by shard —
    # never a global (SinglePartition) sort
    plan = _plan(spark, q["qt71_curriculum_order"](spark, sf))
    assert "SinglePartition" not in plan
    assert _re.search(r"hashpartitioning\(shard", plan)
    # qt72 dataset card: one grouped pass with map-side partials
    plan = _plan(spark, q["qt72_dataset_card"](spark, sf))
    assert "partial_" in plan
    # map-side extractors stay shuffle-free on pruned scans
    for name in (
        "qx58_doc_router",
        "qx59_table_grid",
        "qx60_soft_redirects",
        "qm42_jpeg_integrity",
    ):
        plan = _plan(spark, q[name](spark, sf))
        assert "Exchange" not in plan, f"{name} must stay shuffle-free"
        m = _re.search(r"ReadSchema: struct<([^>]*)>", plan)
        assert m and m.group(1).startswith("doc_id"), (
            f"{name} scan must prune to doc_id: {m and m.group(1)}"
        )


def test_session6d_operator_plan_shapes(spark):
    """Plan pins for the final session batch."""
    import re as _re

    from pdf_spark.functions.registry import all_queries

    q = all_queries()
    sf = "/root/testdata/sf0.001"

    # qt73 spam lexicon: in-row arrays — no explode, no shuffle
    plan = _plan(spark, q["qt73_spam_lexicon"](spark, sf))
    assert "Generate" not in plan and "Exchange" not in plan
    # qt74 pipeline manifest: every window partitioned (hash/source/
    # shard) — never a global sort
    plan = _plan(spark, q["qt74_pipeline_manifest"](spark, sf))
    assert "SinglePartition" not in plan
    # qg11 star rounds + qs19 fidelity: hash joins only
    for name in ("qg11_star_components", "qs19_jl_fidelity"):
        plan = _plan(spark, q[name](spark, sf))
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
    # qr45 OUTER explode: Generate with outer=true, map-side
    plan = _plan(spark, q["qr45_outer_explode"](spark, sf))
    assert "Generate" in plan and "explode(longs" in plan
    assert ", true, [word" in plan  # the Generate node's outer flag
    assert "Exchange" not in plan
    # qm43 color histogram: shuffle-free pruned scan
    plan = _plan(spark, q["qm43_color_histogram"](spark, sf))
    assert "Exchange" not in plan


def test_session7_operator_plan_shapes(spark):
    """Plan pins for this session's batch (qr46-47, qx61-62, qt75-76,
    qs20, qg12, qm44)."""
    import re as _re

    from pdf_spark.functions.registry import all_queries

    q = all_queries()
    sf = "/root/testdata/sf0.001"

    # qr46 gaps-and-islands: ONE shuffle on source (the window); the
    # island/source groupBys reuse that partitioning — count Exchanges
    plan = _plan(spark, q["qr46_gaps_islands"](spark, sf))
    assert "SinglePartition" not in plan
    assert plan.count("Exchange hashpartitioning") <= 2
    assert _re.search(r"hashpartitioning\(source", plan)
    # qr47 mode: map-side partial aggregation before the shuffle;
    # the window never runs over raw rows (partial agg comes first)
    plan = _plan(spark, q["qr47_group_mode"](spark, sf))
    assert "partial_count" in plan or "partial_" in plan
    assert "SinglePartition" not in plan
    # qt75 bitext pairing: hash equi-join on the group key, never a
    # nested-loop/cartesian pair build
    plan = _plan(spark, q["qt75_bitext_pairs"](spark, sf))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # qs20 MRR + qg12 PPR: hash joins only
    for name in ("qs20_mrr_eval", "qg12_personalized_pagerank"):
        plan = _plan(spark, q[name](spark, sf))
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
    # map-side extractors stay shuffle-free on doc_id-pruned scans
    for name in (
        "qx61_charset_detect",
        "qx62_hreflang_audit",
        "qt76_sentence_split",
        "qm44_wasm_audit",
    ):
        plan = _plan(spark, q[name](spark, sf))
        assert "Exchange" not in plan, f"{name} must stay shuffle-free"
        m = _re.search(r"ReadSchema: struct<([^>]*)>", plan)
        assert m and m.group(1).startswith("doc_id"), (
            f"{name} scan must prune to doc_id: {m and m.group(1)}"
        )


def test_session7b_operator_plan_shapes(spark):
    """Plan pins for the second session batch (qt77-78, qr48-50,
    qx63-64, qm45-46, qg13, qs21)."""
    import re as _re

    from pdf_spark.functions.registry import all_queries

    q = all_queries()
    sf = "/root/testdata/sf0.001"

    # qt77 containment: entirely in-row — no explode, no shuffle
    plan = _plan(spark, q["qt77_shingle_containment"](spark, sf))
    assert "Generate" not in plan and "Exchange" not in plan
    # qt78 zipf: partial aggregation on the token groupBy
    plan = _plan(spark, q["qt78_zipf_octaves"](spark, sf))
    assert "partial_" in plan and "SinglePartition" not in plan
    # qr49 release diff: full-outer as a hash join, hashes computed
    # below the join (text never shuffles wide)
    plan = _plan(spark, q["qr49_release_diff"](spark, sf))
    assert "FullOuter" in plan
    assert "CartesianProduct" not in plan
    # qr50 funnel: ONE user_id shuffle + scalar rollup, no join at all
    plan = _plan(spark, q["qr50_funnel_steps"](spark, sf))
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") <= 1
    # qr48 / qg13 / qs21: no nested-loop pair builds
    for name in (
        "qr48_notin_null_trap",
        "qg13_reciprocity",
        "qs21_metric_divergence",
    ):
        plan = _plan(spark, q[name](spark, sf))
        assert "CartesianProduct" not in plan, name
    # map-side extractors stay shuffle-free on doc_id-pruned scans
    for name in (
        "qx63_dechunk",
        "qx64_spa_shell",
        "qm45_ogg_audit",
        "qm46_woff_audit",
    ):
        plan = _plan(spark, q[name](spark, sf))
        assert "Exchange" not in plan, f"{name} must stay shuffle-free"
        m = _re.search(r"ReadSchema: struct<([^>]*)>", plan)
        assert m and m.group(1).startswith("doc_id"), (
            f"{name} scan must prune to doc_id: {m and m.group(1)}"
        )


def test_session7c_operator_plan_shapes(spark):
    """Plan pins for the third session batch (qx65-66, qr51, qt79-80,
    qs22)."""
    import re as _re

    from pdf_spark.functions.registry import all_queries

    q = all_queries()
    sf = "/root/testdata/sf0.001"

    # qr51 attribution: hash join + purchase-partitioned window, no
    # nested loop, no global sort
    plan = _plan(spark, q["qr51_last_touch_attribution"](spark, sf))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert _re.search(r"hashpartitioning\(purchase_id", plan)
    # qt79 burstiness: both groupBys keep map-side partials
    plan = _plan(spark, q["qt79_word_burstiness"](spark, sf))
    assert "partial_" in plan
    # qt80 snake packing: the rank is the ONLY total ordering (the
    # 10^12 path swaps in qr38's two-phase rank); rollup is partial
    plan = _plan(spark, q["qt80_shard_balance"](spark, sf))
    assert "partial_" in plan
    # qs22 ivf balance: hash joins only
    plan = _plan(spark, q["qs22_ivf_balance"](spark, sf))
    assert "CartesianProduct" not in plan
    # map-side extractors stay shuffle-free on doc_id-pruned scans
    for name in ("qx65_data_uris", "qx66_html_router"):
        plan = _plan(spark, q[name](spark, sf))
        assert "Exchange" not in plan, f"{name} must stay shuffle-free"
        m = _re.search(r"ReadSchema: struct<([^>]*)>", plan)
        assert m and m.group(1).startswith("doc_id"), (
            f"{name} scan must prune to doc_id: {m and m.group(1)}"
        )


def test_session7d_operator_plan_shapes(spark):
    """Plan pins for the fourth session batch (qr52, qt81, qm47)."""
    import re as _re

    from pdf_spark.functions.registry import all_queries

    q = all_queries()
    sf = "/root/testdata/sf0.001"

    # qr52 MAD: both rank passes partitioned by source, never global
    plan = _plan(spark, q["qr52_mad_robust_spread"](spark, sf))
    assert "SinglePartition" not in plan
    assert _re.search(r"hashpartitioning\(source", plan)
    # qt81 calibration: in-row signatures — no join/exchange before
    # the 5-row rollup (one final aggregation exchange allowed)
    plan = _plan(spark, q["qt81_minhash_calibration"](spark, sf))
    assert "Join" not in plan and "Generate" not in plan
    # formatted explain names each node twice (tree + details):
    # one physical Exchange == tree occurrence "+- Exchange"
    assert plan.count("+- Exchange") <= 1
    # qm47: shuffle-free pruned scan
    plan = _plan(spark, q["qm47_mp3_audit"](spark, sf))
    assert "Exchange" not in plan
    m = _re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m and m.group(1).startswith("doc_id")


def test_session7e_operator_plan_shapes(spark):
    """Plan pins for the fifth session batch (qt82-83, qg14-15,
    qx67-68, qr53-54)."""
    import re as _re

    from pdf_spark.functions.registry import all_queries

    q = all_queries()
    sf = "/root/testdata/sf0.001"

    # qt82 split: map-side assignment + one bounded-key groupBy with
    # partials; no window, no join
    plan = _plan(spark, q["qt82_eval_split"](spark, sf))
    assert "Join" not in plan and "Window" not in plan
    assert "partial_" in plan
    # qg14/qg15: hash joins / aggregations only, no nested loop
    for name in ("qg14_assortativity_sums", "qg15_partition_cut"):
        plan = _plan(spark, q[name](spark, sf))
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name
    # qr54 spine: the month-spine side joins BROADCAST (|months| rows)
    plan = _plan(spark, q["qr54_calendar_spine"](spark, sf))
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    # qt83 saturation: the only windows run over the 10-row decile
    # rollup, AFTER aggregation (never over raw docs)
    plan = _plan(spark, q["qt83_dedup_saturation"](spark, sf))
    assert "partial_" in plan
    # map-side extractors stay shuffle-free on doc_id-pruned scans
    for name in ("qx67_srcset_election", "qx68_pubdate_election"):
        plan = _plan(spark, q[name](spark, sf))
        assert "Exchange" not in plan, f"{name} must stay shuffle-free"
        m = _re.search(r"ReadSchema: struct<([^>]*)>", plan)
        assert m and m.group(1).startswith("doc_id"), (
            f"{name} scan must prune to doc_id: {m and m.group(1)}"
        )
    # qr53: bounded-key window input (o_orderkey < 200 filter pushed)
    plan = _plan(spark, q["qr53_null_ordering"](spark, sf))
    assert "PushedFilters" in plan and "200" in plan


def test_session7f_operator_plan_shapes(spark):
    """Plan pins for the final session batch (qm48, qr55)."""
    import re as _re

    from pdf_spark.functions.registry import all_queries

    q = all_queries()
    sf = "/root/testdata/sf0.001"

    # qr55 rollup: Expand + partial aggregation, no global sort
    plan = _plan(spark, q["qr55_grouping_disambiguation"](spark, sf))
    assert "Expand" in plan and "partial_" in plan
    assert "SinglePartition" not in plan
    # qm48: shuffle-free pruned scan
    plan = _plan(spark, q["qm48_ttc_audit"](spark, sf))
    assert "Exchange" not in plan
    m = _re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m and m.group(1).startswith("doc_id")


def test_session7g_operator_plan_shapes(spark):
    """Plan pins for the 300-milestone batch (qx69-70, qr56-57,
    qt85-86, qs23, qm49, qg16)."""
    import re as _re

    from pdf_spark.functions.registry import all_queries

    q = all_queries()
    sf = "/root/testdata/sf0.001"

    # qr56 TWA: one user_id shuffle (window) + combined agg, no join
    plan = _plan(spark, q["qr56_time_weighted_avg"](spark, sf))
    assert "Join" not in plan
    assert _re.search(r"hashpartitioning\(user_id", plan)
    # qr57 running distinct: per-key window partitioned by custkey;
    # the only ordered-global window runs over the monthly rollup
    plan = _plan(spark, q["qr57_running_distinct"](spark, sf))
    assert _re.search(r"hashpartitioning\(o_custkey", plan)
    # qt85 hapax + qt86 gini: partial aggregation present
    for name in ("qt85_hapax_ratio", "qt86_host_gini"):
        plan = _plan(spark, q[name](spark, sf))
        assert "partial_" in plan, name
    # qs23 multiprobe + qg16 churn: no nested-loop pair builds (the
    # probe-plan expansion is a bounded row literal, not a data cross)
    for name in ("qs23_multiprobe_lsh", "qg16_edge_churn"):
        plan = _plan(spark, q[name](spark, sf))
        assert "CartesianProduct" not in plan, name
    assert "FullOuter" in _plan(spark, q["qg16_edge_churn"](spark, sf))
    # map-side extractors stay shuffle-free on doc_id-pruned scans
    for name in (
        "qx69_third_party",
        "qx70_lang_conflict",
        "qm49_svg_security",
    ):
        plan = _plan(spark, q[name](spark, sf))
        assert "Exchange" not in plan, f"{name} must stay shuffle-free"
        m = _re.search(r"ReadSchema: struct<([^>]*)>", plan)
        assert m and m.group(1).startswith("doc_id"), (
            f"{name} scan must prune to doc_id: {m and m.group(1)}"
        )


def test_session7h_operator_plan_shapes(spark):
    """Plan pins for the closing pair (qx71, qt87)."""
    import re as _re

    from pdf_spark.functions.registry import all_queries

    q = all_queries()
    sf = "/root/testdata/sf0.001"

    # qt87: distinct counts keep map-side partial aggregation
    plan = _plan(spark, q["qt87_normalization_ladder"](spark, sf))
    assert "partial_" in plan
    # qx71: shuffle-free pruned scan
    plan = _plan(spark, q["qx71_paywall_flag"](spark, sf))
    assert "Exchange" not in plan
    m = _re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m and m.group(1).startswith("doc_id")
