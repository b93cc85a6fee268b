"""Scale-path plan assertions: partition pruning on the (source)-partitioned
layout (what makes backfill/resume cheap at 100 TB) and broadcast dimension
joins (no fact-side shuffle)."""

from pyspark.sql import functions as F

from cflog2otel_spark.sources.tokenized import read_cf_log_file, tokenized_df_from_lines

from .conftest import CF_LOG, CF_LOG2, SOURCE1, SOURCE2


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_source_partitioned_layout_prunes(spark, tmp_path):
    """With the corpus laid out partitionBy(source) — the parquet stand-in
    for Iceberg (source, hours(ts)) partitioning — a backfill/resume
    source filter becomes a PartitionFilter: the scan never touches other
    sources' files."""
    _, l1 = read_cf_log_file(CF_LOG)
    _, l2 = read_cf_log_file(CF_LOG2)
    corpus = tokenized_df_from_lines(spark, l1, SOURCE1).union(
        tokenized_df_from_lines(spark, l2, SOURCE2)
    )
    path = str(tmp_path / "part_corpus")
    corpus.write.partitionBy("source").parquet(path)

    filtered = spark.read.parquet(path).filter(F.col("source") == SOURCE1)
    plan = _plan(filtered)
    assert "PartitionFilters" in plan and "source" in plan
    # pruning is effective, not cosmetic: only SOURCE1's rows are read
    assert filtered.count() == 6
    # and the resume-style NOT IN list also prunes
    from cflog2otel_spark.lineage import resume_filter
    import json, os

    mdir = str(tmp_path / "m")
    os.makedirs(mdir)
    with open(f"{mdir}/manifest_x.json", "w") as fh:
        json.dump({"sources": {SOURCE1: {"status": "done"}}}, fh)
    remaining = resume_filter(spark.read.parquet(path), mdir)
    assert remaining.count() == 6
    assert {r["source"] for r in remaining.select("source").distinct().collect()} == {SOURCE2}


def test_dimension_join_broadcasts(spark, cf_fixture_df):
    """broadcast_lookup must plan as BroadcastHashJoin — the fact side
    never shuffles for a dimension enrichment."""
    from cflog2otel_spark.operators.enrich import broadcast_lookup, enrich
    from cflog2otel_spark.operators.parse import decode_and_parse

    parsed = enrich(decode_and_parse(cf_fixture_df))
    dim = spark.createDataFrame(
        [("EMLARXS9EXAMPLE", "prod", "us-east-1")],
        ["distribution_id", "env", "region"],
    )
    joined = broadcast_lookup(parsed, dim, on="distribution_id")
    plan = _plan(joined)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    rows = joined.select("env", "region").distinct().collect()
    assert [(r["env"], r["region"]) for r in rows] == [("prod", "us-east-1")]


def test_bucket_cap_is_broadcast_anti_join_not_window(spark):
    """The LSH skew cap must not shuffle the signature-carrying exploded
    rows twice: the over-cap bucket set is a groupBy-count (map-side
    combined) + broadcast anti-join, never a Window over the full rows."""
    from cflog2otel_spark.operators.dedup import minhash_lsh_pairs, simhash_near_dup_pairs

    docs = spark.createDataFrame(
        [(i, f"some repeated text body number {i % 3} with shared shingles here") for i in range(12)],
        ["doc_id", "text"],
    )
    for pairs in (minhash_lsh_pairs(docs), simhash_near_dup_pairs(docs)):
        plan = _plan(pairs)
        assert "Window" not in plan
        assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_registered_similarity_queries_are_scale_shaped(spark):
    """VERDICT r1: no cross join and no per-query index (re)build in any
    registered similarity query. near-dup plans as equi-joins only; the IVF
    probe partition-prunes the materialized cluster layout; the LSH probe
    scans the persisted _sig column straight from parquet."""
    from cflog2otel_spark.plans.driver_queries import (
        q_emb_ann_topk, q_emb_ivf_topk, q_emb_near_dup)

    sf = "/root/testdata/sf0.001"
    nd = q_emb_near_dup(spark, sf)
    plan = _plan(nd)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan

    ivf = q_emb_ivf_topk(spark, sf)
    plan = _plan(ivf)
    assert "PartitionFilters" in plan and "_cluster" in plan
    assert ivf.count() == 20

    ann = q_emb_ann_topk(spark, sf)
    plan = _plan(ann)
    # the signature filter reads the persisted _sig column; the hyperplane
    # dot products (zip_with folds) appear only for the final rescore, so
    # the hamming predicate must reference the scanned column
    assert "_sig" in plan
    assert ann.count() == 20


def test_round4_queries_are_scale_shaped(spark):
    """Round-4 registrations keep the same discipline: no cross joins, no
    windows, no per-row Python in the new query plans."""
    from cflog2otel_spark.operators.dedup import release_persisted
    from cflog2otel_spark.plans.driver_queries import (
        q_docs_dedup_clusters,
        q_docs_split,
        q_emb_near_dup_nware,
    )

    sf = "/root/testdata/sf0.001"

    split = q_docs_split(spark, sf)
    plan = _plan(split)
    # pure per-row arithmetic: a project over the scan, no exchange at all
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    clusters = q_docs_dedup_clusters(spark, sf)
    plan = _plan(clusters)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Window" not in plan
    # one row per document, keepers are a subset
    n_docs = spark.read.parquet(f"{sf}/documents.parquet").count()
    rows = clusters.collect()
    assert len(rows) == n_docs
    keep = [r for r in rows if r["keep"]]
    assert 0 < len(keep) <= n_docs
    # cluster ids are canonical members (every cluster_id is a kept doc_id)
    kept_ids = {r["doc_id"] for r in keep}
    assert {r["cluster_id"] for r in rows} <= kept_ids

    nware = q_emb_near_dup_nware(spark, sf)
    plan = _plan(nware)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    release_persisted()


def test_round5_token_queries_are_scale_shaped(spark):
    """Round-5 token-payload registrations: no cross joins, no per-row
    Python anywhere; the exact-dedup shuffle carries digests (not token
    payloads); pack materialization has exactly the two value shuffles its
    design claims (chunk-scan window + (source, seq_id) reassembly) plus
    the broadcast of the tiny subtotal table."""
    from cflog2otel_spark.plans.driver_queries import (
        q_events_attribution_fwd,
        q_tok_contamination,
        q_tok_pack_emit,
        q_tok_seq_dedup,
    )

    sf = "/root/testdata/sf0.001"

    for q in (q_tok_seq_dedup, q_tok_contamination, q_tok_pack_emit,
              q_events_attribution_fwd):
        plan = _plan(q(spark, sf))
        assert "CartesianProduct" not in plan, q.__name__
        assert "BroadcastNestedLoopJoin" not in plan, q.__name__
        assert "BatchEvalPython" not in plan, q.__name__
        assert "ArrowEvalPython" not in plan, q.__name__

    dedup_plan = _plan(q_tok_seq_dedup(spark, sf))
    # the groupBy/join key is the sha256 digest column, never the array
    assert "_seq_digest" in dedup_plan

    cont_plan = _plan(q_tok_contamination(spark, sf))
    # benchmark grams reach the corpus via broadcast, not a shuffled join
    assert "BroadcastHashJoin" in cont_plan

    fwd_plan = _plan(q_events_attribution_fwd(spark, sf))
    # forward as-of is still the single-window merge, not a range join
    assert fwd_plan.count("Window") >= 1
