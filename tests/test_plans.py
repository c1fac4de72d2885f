"""Physical-plan regression tests: the plans we shipped are the plans we
want (SURVEY.md §4 / the 100 TB checklist) — filters push to parquet, small
dims broadcast, the encode pipeline has exactly one exchange."""

from __future__ import annotations

import pyspark.sql.functions as F

from cuda_float_compress_spark.plans import plan_partitions
from cuda_float_compress_spark.table import generate_webpages_df

SF = "/root/testdata/sf0.01"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_filter_pushdown_reaches_parquet(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    q = li.filter(F.col("l_shipdate") <= "1998-09-02").select(
        "l_quantity", "l_returnflag"
    )
    plan = _plan(q)
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # column pruning: the scan reads only the 3 needed columns
    assert "ReadSchema: struct<l_quantity:double,l_returnflag:string,l_shipdate" in plan


def test_q3_broadcasts_customer(spark):
    import __spark_entry__ as entrymod

    q = entrymod.queries()["q3_top_orders"](spark, SF)
    assert "BroadcastHashJoin" in _plan(q)


def test_encode_pipeline_single_exchange(spark):
    df = generate_webpages_df(spark, 1000, partitions=2)
    planned = plan_partitions(df, "url", 8).sortWithinPartitions("part_id", "url")
    plan = _plan(planned)
    assert plan.count("Exchange") == 1, plan
    # the sort is partition-local (global=false), not a global sort
    assert "Sort [part_id" in plan and "false, 0" in plan


def test_clean_corpus_cheap_predicates_first(spark):
    """The corpus-assembly endpoint's one Filter node must evaluate the
    cheap punct/length predicates BEFORE the 6-regex language-ID cascade
    (And evaluates left-to-right; at 100 TB the ordering is most of the
    query's cost). r7 shape: the dedup keep-rule is ONE window over the
    filter survivors — a single scan and a single exchange, no join (the
    old groupBy + broadcast-semi-join scanned the table twice)."""
    import __spark_entry__ as entrymod

    q = entrymod.queries()["clean_corpus"](spark, SF)
    plan = _plan(q)
    assert "Join" not in plan, plan
    assert plan.count("Exchange") == 1, plan
    assert plan.count("FileScan") == 1, plan
    # the SCAN-side filter (the last Filter node) carries the predicate
    # chain; the keep-rule filter above the window has no regexes
    filt = plan[plan.rindex("Filter (") :]
    i_cheap = max(filt.index("<= 0.2"), filt.index(">= 100"))
    # the language-ID cascade compiles to the array_max argmax over the six
    # marker-regex structs (punct_ratio itself uses one regexp_count, so a
    # bare regex marker would false-positive on the cheap predicate)
    i_lang = filt.index("array_max")
    assert i_cheap < i_lang, filt[:400]


def test_stratified_sample_is_scan_fused_filter(spark):
    """Hash-based stratified sampling must compile to a single codegen'd
    scan+filter: zero exchanges, schema pruned to the two output columns —
    the shape that costs one pass at 100 TB."""
    import __spark_entry__ as entrymod

    q = entrymod.queries()["stratified_sample"](spark, SF)
    plan = _plan(q)
    assert "Exchange" not in plan, plan
    assert plan.count("FileScan") == 1
    assert "ReadSchema: struct<doc_id:bigint,lang:string>" in plan
    assert "*(1)" in plan  # whole-stage codegen over scan+filter


def test_decode_prunes_payload_for_metadata_agg(spark, scratch):
    from cuda_float_compress_spark.operators.encode import encode_table

    df = generate_webpages_df(spark, 500, partitions=1)
    encode_table(spark, df, scratch, n_parts=2, resume=False)
    blocks = spark.read.parquet(f"{scratch}/blocks")
    agg = blocks.groupBy("col").agg(F.sum("enc_bytes").alias("e"))
    plan = _plan(agg)
    # the manifest-style aggregate must not read the payload column
    assert "payload" not in plan.split("ReadSchema")[-1]
