"""The encode job: DataFrame -> compressed blocks + manifest + lineage.

Dataflow (SURVEY.md §3.4):

    read -> plan_partitions (explicit shuffle #1, hash+salt or range)
         -> sortWithinPartitions(part_id, sort_keys)   (no extra shuffle)
         -> mapInArrow(encode)                          (shuffle-free)
         -> write blocks parquet (append)
         -> groupBy(part_id) manifest/lineage aggregates (tiny shuffle #2)

The Arrow UDF buffers record batches per part_id (parts are contiguous after
the sort) and cuts chunks at ``chunk_rows`` rows or ``chunk_bytes`` payload
bytes, whichever first — the Spark analog of the reference's fixed 32,768-
float block (src/cuszplus_f32.cu:21-28), with byte-capping because web-page
rows are variable-width.

Scale notes (100 TB, 1000 executors): every stage is embarrassingly parallel
after the single planned shuffle; block rows are ~chunk-sized (MBs), so the
blocks write streams without driver involvement; manifest/lineage aggregates
reduce to one row per (part, column) — broadcast-sized metadata.
"""

from __future__ import annotations

import json
import time
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cuda_float_compress_spark.metrics import EngineMetrics
from cuda_float_compress_spark.operators import chunks as C
from cuda_float_compress_spark.plans import plan_partitions, skewed_hosts

BLOCKS_SCHEMA = T.StructType(
    [
        T.StructField("part_id", T.IntegerType(), False),
        T.StructField("chunk_id", T.LongType(), False),
        T.StructField("col", T.StringType(), False),
        T.StructField("col_idx", T.IntegerType(), False),
        T.StructField("ptype", T.StringType(), False),
        T.StructField("codec", T.StringType(), False),
        T.StructField("n", T.LongType(), False),
        T.StructField("n_nulls", T.LongType(), False),
        T.StructField("raw_bytes", T.LongType(), False),
        T.StructField("enc_bytes", T.LongType(), False),
        T.StructField("params", T.StringType(), False),
        # zone-map stats (numeric/timestamp columns; null otherwise): enable
        # chunk pruning on the ENCODED table without touching payloads
        T.StructField("vmin", T.LongType(), True),
        T.StructField("vmax", T.LongType(), True),
        # exact per-chunk value sum for int32/int64 columns (null when the
        # sum leaves the int64 domain, for other ptypes, or in pre-r6
        # layouts): lets count/sum/min/max aggregate from METADATA alone
        # (operators/metadata_agg) — at 100 TB that is MBs instead of the
        # full decode
        T.StructField("vsum", T.LongType(), True),
        # provenance: which run wrote this block. decode/manifest only trust
        # blocks whose (part_id, run_id) is committed in lineage — a crash
        # between the blocks append and the lineage write leaves stale
        # partials that must never double-count or corrupt decode
        T.StructField("run_id", T.StringType(), False),
        # optional per-(chunk, column) Bloom filter over distinct values
        # (operators/bloom.py): prunes equality/IN probes on columns whose
        # zone maps can't (high-cardinality, unsorted — e.g. url). Null
        # unless the encode opted the column in via ``bloom_cols``.
        T.StructField("bloom", T.BinaryType(), True),
        T.StructField("payload", T.BinaryType(), False),
    ]
)

_BLOCKS_ARROW = pa.schema(
    [
        ("part_id", pa.int32()),
        ("chunk_id", pa.int64()),
        ("col", pa.string()),
        ("col_idx", pa.int32()),
        ("ptype", pa.string()),
        ("codec", pa.string()),
        ("n", pa.int64()),
        ("n_nulls", pa.int64()),
        ("raw_bytes", pa.int64()),
        ("enc_bytes", pa.int64()),
        ("params", pa.string()),
        ("vmin", pa.int64()),
        ("vmax", pa.int64()),
        ("vsum", pa.int64()),
        ("run_id", pa.string()),
        ("bloom", pa.large_binary()),
        ("payload", pa.large_binary()),
    ]
)


def build_manifest(written, run_id: str):
    """Per-(part, col) manifest aggregate, shared by every writer (encode,
    direct, compact, rewrite). Includes PART-LEVEL zone-map rollups
    (min vmin / max vmax): two-level pruning reads these to drop whole
    parts before touching any chunk metadata — at 100 TB the chunk
    metadata itself is a scan worth skipping (the Iceberg
    manifest-stats move)."""
    return (
        written.groupBy("part_id", "col", "col_idx", "ptype")
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum("n").alias("n_values"),
            F.sum("n_nulls").alias("n_nulls"),
            F.sum("raw_bytes").alias("raw_bytes"),
            F.sum("enc_bytes").alias("enc_bytes"),
            F.sort_array(F.collect_set("codec")).alias("codecs"),
            F.min("vmin").alias("vmin"),
            F.max("vmax").alias("vmax"),
        )
        .withColumn("run_id", F.lit(run_id))
    )


def _encode_chunk_to_rows(tbl: pa.Table, part_id: int, chunk_id: int,
                          overrides: dict, acc, run_id: str = "",
                          profile: str = "ratio",
                          bloom_cols: frozenset = frozenset()) -> pa.RecordBatch:
    cols = {name: [] for name in _BLOCKS_ARROW.names}
    data_cols = [c for c in tbl.column_names if c != "part_id"]
    for idx, name in enumerate(data_cols):
        col = tbl.column(name)
        # combine_chunks COPIES even when there is a single chunk (~60% of
        # the non-zstd encode time on web text); chunk(0) is zero-copy
        arr = col.chunk(0) if col.num_chunks == 1 else col.combine_chunks()
        ptype = C.ptype_of(arr.type)
        raw = C.raw_size_of(arr, ptype)
        codec, payload, params_json, n, n_nulls = C.encode_column_chunk(
            arr, ptype, overrides.get(name), profile
        )
        vmin = vmax = vsum = None
        if ptype in ("int64", "int32", "timestamp_us", "timestamp_ntz", "date32"):
            if n > n_nulls:
                nn = arr.drop_null() if n_nulls else arr
                np_vals = nn.to_numpy(zero_copy_only=False)
                if np_vals.dtype.kind == "M":
                    np_vals = np_vals.view("i8")
                vmin = int(np_vals.min())
                vmax = int(np_vals.max())
                if ptype in ("int64", "int32"):
                    # exact chunk sum for metadata-only aggregation; values
                    # summing past the int64 column domain store null
                    # (decode fallback). Fast path: when n * max|v| cannot
                    # reach 2^63, the int64 sum is provably overflow-free —
                    # the object-dtype sum (a per-value Python loop) is only
                    # needed for chunks that might actually wrap.
                    bound = max(abs(vmin), abs(vmax))
                    if len(np_vals) == 0:
                        vsum = 0
                    elif bound == 0 or len(np_vals) < (2 ** 63) // bound:
                        vsum = int(np_vals.sum(dtype=np.int64))
                    else:
                        s = int(np_vals.sum(dtype=object))
                        vsum = s if -(2 ** 63) <= s < 2 ** 63 else None
        elif ptype in ("float32", "float64") and n > n_nulls:
            # float zone maps: Spark-total-order int64 keys (NaN greatest,
            # -0.0 == 0.0 — chunks.float_key64). A chunk containing NaN
            # reports vmax = key(NaN) so ">= x" predicates never prune it.
            nn = arr.drop_null() if n_nulls else arr
            fv = nn.to_numpy(zero_copy_only=False).astype(np.float64)
            finite_or_inf = fv[~np.isnan(fv)]
            if len(finite_or_inf):
                vmin = C.float_key64(float(finite_or_inf.min()))
                vmax = (C.FLOAT_KEY_NAN if np.isnan(fv).any()
                        else C.float_key64(float(finite_or_inf.max())))
            elif len(fv):  # all-NaN chunk
                vmin = vmax = C.FLOAT_KEY_NAN
        elif ptype in ("string", "binary") and n > n_nulls:
            # string zone maps: order-preserving 7-byte big-endian prefixes
            # in the SAME int64 vmin/vmax columns (56 bits stays positive;
            # zero-pad preserves bytewise UTF8String order, the order Spark
            # compares strings with). min_max is one vectorized Arrow pass.
            mm = pc.min_max(arr)
            vmin = C.string_prefix64(mm["min"].as_py())
            vmax = C.string_prefix64(mm["max"].as_py())
        cols["part_id"].append(part_id)
        cols["chunk_id"].append(chunk_id)
        cols["col"].append(name)
        cols["col_idx"].append(idx)
        cols["ptype"].append(ptype)
        cols["codec"].append(codec)
        cols["n"].append(n)
        cols["n_nulls"].append(n_nulls)
        cols["raw_bytes"].append(raw)
        cols["enc_bytes"].append(len(payload))
        cols["params"].append(params_json)
        cols["vmin"].append(vmin)
        cols["vmax"].append(vmax)
        cols["vsum"].append(vsum)
        cols["run_id"].append(run_id)
        bloom = None
        if name in bloom_cols and n > n_nulls:
            from cuda_float_compress_spark.operators.bloom import bloom_build

            nn = arr.drop_null() if n_nulls else arr
            if ptype in ("string", "binary"):
                bloom = bloom_build(nn.to_pylist())
            elif ptype in ("int64", "int32"):
                # ints hash via their decimal text form — the same bytes
                # bloom_hashes derives from a probe literal
                bloom = bloom_build(
                    str(v)
                    for v in nn.to_numpy(zero_copy_only=False).tolist()
                )
        cols["bloom"].append(bloom)
        cols["payload"].append(payload)
        if acc is not None:
            acc["raw_bytes"].add(raw)
            acc["enc_bytes"].add(len(payload))
            acc["null_values"].add(n_nulls)
    if acc is not None:
        acc["rows"].add(tbl.num_rows)
        acc["chunks"].add(1)
    return pa.RecordBatch.from_pydict(cols, schema=_BLOCKS_ARROW)


def make_encoder(chunk_rows: int, chunk_bytes: int, overrides: dict, acc=None,
                 run_id: str = "", profile: str = "ratio",
                 bloom_cols: frozenset = frozenset()):
    """Build the mapInArrow function. Parts arrive contiguous (sorted); cut a
    chunk when the buffer reaches chunk_rows rows or chunk_bytes bytes."""

    def encode_partition(batches):
        buf: list[pa.RecordBatch] = []
        buf_rows = 0
        buf_bytes = 0
        cur_part: int | None = None
        chunk_counter = 0

        def flush():
            nonlocal buf, buf_rows, buf_bytes, chunk_counter
            if not buf:
                return None
            tbl = pa.Table.from_batches(buf)
            rb = _encode_chunk_to_rows(
                tbl, cur_part, chunk_counter, overrides, acc, run_id,
                profile, bloom_cols
            )
            chunk_counter += 1
            buf, buf_rows, buf_bytes = [], 0, 0
            return rb

        for batch in batches:
            if batch.num_rows == 0:
                continue
            part_col = batch.column(batch.schema.get_field_index("part_id"))
            parts = part_col.to_numpy(zero_copy_only=False)
            # split the batch at part boundaries (input sorted by part_id)
            start = 0
            for i in range(1, len(parts) + 1):
                if i == len(parts) or parts[i] != parts[start]:
                    piece = batch.slice(start, i - start)
                    pid = int(parts[start])
                    if cur_part is not None and pid != cur_part:
                        rb = flush()
                        if rb is not None:
                            yield rb
                        chunk_counter = 0
                    cur_part = pid
                    # sub-slice so a chunk never exceeds chunk_rows even when
                    # an Arrow batch piece is larger than the chunk budget
                    off = 0
                    while off < piece.num_rows:
                        take = min(piece.num_rows - off, chunk_rows - buf_rows)
                        part_slice = piece.slice(off, take)
                        buf.append(part_slice)
                        buf_rows += part_slice.num_rows
                        buf_bytes += part_slice.nbytes
                        off += take
                        if buf_rows >= chunk_rows or buf_bytes >= chunk_bytes:
                            rb = flush()
                            if rb is not None:
                                yield rb
                    start = i
        rb = flush()
        if rb is not None:
            yield rb

    return encode_partition


def completed_parts(
    spark: SparkSession,
    out_dir: str,
    lo: int | None = None,
    hi: int | None = None,
) -> list[int]:
    """part_ids with a 'done' lineage record (checkpoint-resume source).
    ``lo``/``hi`` bound the scan to one part-id range — essential for
    streaming replay, where each epoch owns [epoch*n_parts, +n_parts) and
    collecting EVERY epoch's ids would grow the driver list and the isin()
    predicate without bound over the stream's lifetime."""
    try:
        lineage = spark.read.parquet(f"{out_dir}/lineage")
    except Exception:
        return []
    done = lineage.filter(F.col("status") == "done")
    if lo is not None:
        done = done.filter(F.col("part_id") >= lo)
    if hi is not None:
        done = done.filter(F.col("part_id") < hi)
    return [r["part_id"] for r in done.select("part_id").distinct().collect()]


def salts_from_lineage(spark: SparkSession, out_dir: str) -> dict | None:
    """The most recent run's persisted salt map, or None if the table has no
    lineage yet. Reusing it (``encode_table(salts=...)``) makes the plan
    stage metadata-only — no input scan — which is the right call for
    periodic re-encodes and streaming epochs where the host distribution
    drifts slowly."""
    try:
        lineage = spark.read.parquet(f"{out_dir}/lineage")
    except Exception:
        return None
    rows = (
        lineage.filter(F.col("status") == "done")
        .orderBy(F.col("finished_at").desc())
        .select("salts_json")
        .limit(1)
        .collect()
    )
    if not rows or rows[0]["salts_json"] is None:
        return None
    return json.loads(rows[0]["salts_json"])


def encode_table(
    spark: SparkSession,
    df: DataFrame,
    out_dir: str,
    url_col: str = "url",
    n_parts: int = 32,
    mode: str = "hash",
    chunk_rows: int = 32_768,
    chunk_bytes: int = 1 << 24,
    sort_keys: list[str] | None = None,
    codec_overrides: dict | None = None,
    resume: bool = True,
    detect_skew: bool = True,
    salts: dict | None = None,
    skew_sample_fraction: float | None = None,
    run_id: str | None = None,
    metrics: EngineMetrics | None = None,
    part_offset: int = 0,
    profile: str = "ratio",
    pre_partitioned: bool = False,
    bloom_cols: list[str] | None = None,
) -> dict:
    """Encode ``df`` into ``out_dir``/{blocks,manifest,lineage}. Returns a
    metrics dict. Resumable: parts already marked done in lineage are skipped
    (left-anti semantics via a broadcast-sized NOT IN — the part list is
    metadata, not data).

    ``profile``: 'ratio' (default) or 'throughput' — see codecs/select.py;
    decode reads codec names from the manifest, so either profile's output
    (or a mix, e.g. after resume under a different profile) decodes
    bit-identically.

    ``part_offset`` shifts this run's part ids (streaming ingest gives each
    epoch a disjoint part range so block keys stay globally unique).
    Crash safety: blocks carry ``run_id``; manifest aggregates ONLY this
    run's blocks, and decode trusts only (part_id, run_id) pairs committed
    in lineage — stale partials from a crashed run are inert.

    ``pre_partitioned``: the caller already shuffled ``df`` and attached a
    ``part_id`` column (e.g. ``zorder.cluster_by_zorder``) — skip the
    internal hash/range plan and skew detection and encode as-is.

    ``bloom_cols``: columns to attach per-chunk Bloom filters to (see
    operators/bloom.py) — pay ~10 bits/distinct-value of metadata at encode
    time to prune equality/IN probes that zone maps can't."""
    run_id = run_id or uuid.uuid4().hex[:12]
    metrics = metrics or EngineMetrics(spark)
    overrides = codec_overrides or {}
    t_start = time.time()

    with metrics.stage("plan"):
        # skew plan, cheapest-available source first: an explicit ``salts``
        # map (e.g. reused from a prior run's lineage via salts_from_lineage
        # — zero input scans) > a fresh scan (optionally sampled via
        # ``skew_sample_fraction``: one job over a ~0.1-1% sample instead of
        # two exact passes — the right default at 100 TB)
        if pre_partitioned:
            if "part_id" not in df.columns:
                raise ValueError(
                    "pre_partitioned=True requires a part_id column "
                    "(see zorder.cluster_by_zorder)"
                )
            salts = {}
        elif salts is None:
            salts = (
                skewed_hosts(
                    df, url_col, n_parts, sample_fraction=skew_sample_fraction
                )
                if (detect_skew and mode == "hash")
                else {}
            )
        planned = (
            df if pre_partitioned
            else plan_partitions(df, url_col, n_parts, mode=mode, salts=salts)
        )
        if part_offset:
            planned = planned.withColumn(
                "part_id", (F.col("part_id") + F.lit(part_offset)).cast("int")
            )

    # this run's parts all lie in [part_offset, part_offset + n_parts), so
    # the resume filter only needs done ids from that range (constant-sized
    # even at streaming epoch 10^5)
    done = (
        completed_parts(spark, out_dir, part_offset, part_offset + n_parts)
        if resume
        else []
    )
    if done:
        planned = planned.filter(~F.col("part_id").isin(done))

    sort_cols = ["part_id"] + (sort_keys or [url_col])
    planned = planned.sortWithinPartitions(*sort_cols)

    encoder = make_encoder(
        chunk_rows, chunk_bytes, overrides, metrics.acc, run_id, profile,
        frozenset(bloom_cols or ()),
    )
    blocks = planned.mapInArrow(encoder, schema=BLOCKS_SCHEMA)

    with metrics.stage("encode_write"):
        # payload is already entropy-coded; skip parquet-level recompression
        blocks.write.mode("append").option(
            "compression", "uncompressed"
        ).parquet(f"{out_dir}/blocks")

    with metrics.stage("manifest"):
        # aggregate ONLY this run's blocks: stale partials from a crashed
        # earlier run (blocks written, lineage missing) must not double-count.
        # r7: like the direct path, metadata-scale dirs (<= 256 block files)
        # build manifest + lineage driver-side with pyarrow — the Spark
        # read-back/groupBy/write chain here was ~4 driver-blocking jobs
        # (~0.7 s) per encode. Falls back to the Spark jobs on any error or
        # beyond the file cap (lazy import: direct.py imports this module).
        import glob as _glob

        from cuda_float_compress_spark.operators import direct as _direct

        blk_files = _glob.glob(f"{out_dir}/blocks/*.parquet")
        man_rows = None
        if len(blk_files) <= 256:
            try:
                man_rows = _direct._manifest_rows_driver_side(
                    blk_files, run_id
                )
            except Exception:
                man_rows = None
        if man_rows is not None:
            _direct._commit_metadata_driver_side(
                out_dir, man_rows, run_id, salts=salts
            )
        else:
            written = spark.read.parquet(f"{out_dir}/blocks").filter(
                F.col("run_id") == run_id
            )
            manifest = build_manifest(written, run_id)
            manifest.write.mode("append").parquet(f"{out_dir}/manifest")

            # lineage derives from the (tiny) manifest — one blocks scan
            # total, and that scan is column-pruned (payload never read back)
            manifest_rows = spark.read.parquet(f"{out_dir}/manifest").filter(
                F.col("run_id") == run_id
            )
            lineage = (
                manifest_rows.groupBy("part_id")
                .agg(
                    F.max("n_chunks").alias("n_chunks"),
                    F.max("n_values").alias("n_rows"),
                    F.sum("raw_bytes").alias("raw_bytes"),
                    F.sum("enc_bytes").alias("enc_bytes"),
                )
                .withColumn("run_id", F.lit(run_id))
                .withColumn("status", F.lit("done"))
                .withColumn("finished_at", F.lit(time.time()))
                .withColumn("salts_json", F.lit(json.dumps(salts)))
            )
            lineage.write.mode("append").parquet(f"{out_dir}/lineage")

    snap = metrics.snapshot()
    snap["run_id"] = run_id
    snap["skipped_parts"] = len(done)
    snap["salted_hosts"] = len(salts)
    snap["salts"] = dict(salts)  # reusable by the next epoch/run (salts=)
    snap["wall_sec"] = time.time() - t_start
    return snap
