"""Direct-layout encode: distribute parquet row-group splits; each task reads
its split with pyarrow INSIDE the Python worker and emits compressed blocks.

Why this exists (the 100 TB argument): the shuffle-path encode
(operators/encode.py) re-clusters rows by url-host — correct when you want
host locality, but it ships the entire table twice (shuffle + JVM→Python
Arrow). For bulk encode of a table as laid out, the scale-aware plan is to
encode row groups IN PLACE: no shuffle, no JVM transfer of raw payloads —
only the ~5-6x smaller compressed blocks cross Arrow back to the JVM. This is
the same locality argument as Iceberg/Spark storage-partitioned execution.

part_id = split index over the (deterministically sorted) file list, so
checkpoint-resume re-derives identical assignments from the same input.
"""

from __future__ import annotations

import glob
import json
import os
import time
import uuid

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from cuda_float_compress_spark.metrics import EngineMetrics
from cuda_float_compress_spark.operators.encode import (
    BLOCKS_SCHEMA,
    _encode_chunk_to_rows,
    completed_parts,
)

SPLITS_SCHEMA = ("part_id int, file string, rg_start int, rg_end int, "
                 "row_start bigint, row_end bigint, est_bytes bigint")


def _to_us_batch(rb: pa.RecordBatch) -> pa.RecordBatch:
    """Normalize timestamp columns to us precision at the direct-read
    boundary (parquet INT96 arrives as ns in pyarrow). safe=True raises if a
    value has sub-microsecond precision — the codec's bit-identity contract
    refuses silent truncation (chunks.ptype_of enforces the same)."""
    changed = False
    cols, fields = [], []
    for i, f in enumerate(rb.schema):
        if pa.types.is_timestamp(f.type) and f.type.unit != "us":
            t = pa.timestamp("us", f.type.tz)
            cols.append(rb.column(i).cast(t, safe=True))
            fields.append(pa.field(f.name, t, f.nullable))
            changed = True
        else:
            cols.append(rb.column(i))
            fields.append(f)
    if not changed:
        return rb
    return pa.RecordBatch.from_arrays(cols, schema=pa.schema(fields))


def decode_table_direct(spark: SparkSession, out_dir: str,
                        columns: list[str] | None = None,
                        predicates: list[tuple] | None = None,
                        with_row_address: bool = False,
                        apply_deletes: bool = True,
                        chunk_keys: set | None = None,
                        any_of: list[list[tuple]] | None = None,
                        as_of: float | None = None,
                        since: float | None = None):
    """Shuffle-free decode: every encode task wrote whole chunks to its own
    blocks file, so chunks never span files — each decode task reads one
    blocks file with pyarrow and reconstructs its chunks locally. The
    shuffle-based ``decode_table`` remains for blocks that were compacted or
    rewritten by other tools.

    ``apply_deletes``: anti-join committed tombstones (operators/deletes) —
    on by default so merge-on-read deletes are never silently resurrected.
    ``with_row_address``: emit the stable (_part_id, _chunk_id, _pos)
    address columns (delete_rows uses this to compute tombstones).
    ``chunk_keys``: restrict the decode to these (part_id << 32 | chunk_id)
    keys (metadata_agg decodes only the BOUNDARY chunks this way);
    composes with predicate pruning as an intersection.
    ``any_of``: a DISJUNCTION of conjunctions — [[...], [...]] means
    (conj1 OR conj2). Chunk pruning is the UNION of each conjunction's
    qualifying set; the exact row filter is the matching OR. Composes
    with ``predicates`` as a further AND.
    ``as_of`` / ``since``: lineage-timestamp snapshot / incremental
    windows — parity with decode_table (see committed_blocks)."""
    import numpy as np

    from cuda_float_compress_spark.operators import chunks as Ch
    from cuda_float_compress_spark.operators.decode import (
        _SPARK_TYPE,
        _STD_ARROW,
        blocks_of,
        table_columns,
    )

    from cuda_float_compress_spark.operators.decode import (
        _exact_filter,
        qualifying_chunks,
    )

    from cuda_float_compress_spark.operators.decode import (
        _META_FALLBACK,
        _committed_pairs,
        _lineage_rows_local,
        _local_files,
        _repair_if_needed,
        committed_blocks,
        table_columns_local,
    )

    # metadata setup (schema + committed pairs) via driver-side pyarrow
    # when the table's metadata is local and file-count-bounded — the Spark
    # metadata jobs this replaces cost ~1.1 s of pure driver setup per
    # decode at bench scale (see decode.py fast-path note). Falls back to
    # the original Spark jobs for big/remote tables or on any read error.
    _repair_if_needed(out_dir)
    blocks = None  # the Spark blocks frame — only needed for pruning below
    cols = None
    committed: set | None = None
    blk_files = _local_files(f"{out_dir}/blocks")
    lrows = _lineage_rows_local(out_dir) if blk_files is not None else _META_FALLBACK
    if blk_files is not None and lrows is not _META_FALLBACK:
        # schema = union over ALL committed runs (no time scoping — parity
        # with the Spark path, which derives it from committed_blocks
        # without as_of); the trust set IS time-scoped
        pairs_all = _committed_pairs(lrows) if lrows is not None else None
        cols = table_columns_local(blk_files, pairs_all)
        if cols is not _META_FALLBACK and lrows is not None:
            committed = (
                pairs_all if (as_of is None and since is None)
                else _committed_pairs(lrows, as_of=as_of, since=since)
            )
    if cols is None or cols is _META_FALLBACK:
        blocks = committed_blocks(spark, out_dir)
        cols = table_columns(blocks)
        # committed (part_id, run_id) pairs: workers read block files
        # directly with pyarrow, so the lineage trust filter ships as a
        # closure set (metadata-scale — one entry per part per run)
        try:
            lin = spark.read.parquet(f"{out_dir}/lineage").filter(
                F.col("status") == "done"
            )
            if as_of is not None:
                lin = lin.filter(F.col("finished_at") <= float(as_of))
            if since is not None:
                lin = lin.filter(F.col("finished_at") > float(since))
            lin_rows = lin.select("part_id", "run_id").distinct().collect()
            committed = {(r["part_id"], r["run_id"]) for r in lin_rows}
        except Exception:
            committed = None
    all_ptypes = dict(cols)
    keep_keys: set[int] | None = None
    if predicates or any_of:
        if blocks is None:
            blocks = committed_blocks(spark, out_dir)
    if predicates:
        from cuda_float_compress_spark.operators.decode import (
            qualifying_parts,
        )

        # level 1: whole-part pruning from the manifest rollups (the chunk
        # metadata scan below shrinks to the surviving parts)
        keep_parts = qualifying_parts(spark, out_dir, predicates)
        pruned = (
            blocks.filter(F.col("part_id").isin(keep_parts))
            if keep_parts is not None else blocks
        )
        # level 2: chunk-level zone maps / Bloom; key set is manifest-scale
        # (one entry per surviving chunk) and ships to tasks via the closure
        keys = qualifying_chunks(pruned, predicates).collect()
        keep_keys = {(r["part_id"] << 32) | r["chunk_id"] for r in keys}
    if any_of:
        union_keys: set[int] = set()
        for conj in any_of:
            union_keys |= {
                (r["part_id"] << 32) | r["chunk_id"]
                for r in qualifying_chunks(blocks, conj).collect()
            }
        keep_keys = (
            union_keys if keep_keys is None else keep_keys & union_keys
        )
    if chunk_keys is not None:
        keep_keys = (
            set(chunk_keys) if keep_keys is None
            else keep_keys & set(chunk_keys)
        )
    if columns is not None:
        want = set(columns) | {c for c, _, _ in (predicates or [])} | {
            c for conj in (any_of or []) for c, _, _ in conj
        }
        cols = [(c, p) for c, p in cols if c in want]
    col_ptypes = dict(cols)
    want_cols = [c for c, _ in cols]
    from cuda_float_compress_spark.operators.deletes import (
        ADDRESS_COLS,
        anti_join_tombstones,
        tombstones_df,
    )

    tombs = tombstones_df(spark, out_dir, as_of=as_of) if apply_deletes else None
    address = bool(with_row_address or tombs is not None)
    out_schema = ", ".join(f"`{c}` {_SPARK_TYPE[p]}" for c, p in cols)
    arrow_schema = pa.schema([pa.field(c, _STD_ARROW[p]) for c, p in cols])
    if address:
        out_schema += ", _part_id int, _chunk_id bigint, _pos bigint"
        arrow_schema = pa.schema(
            list(arrow_schema)
            + [pa.field("_part_id", pa.int32()),
               pa.field("_chunk_id", pa.int64()),
               pa.field("_pos", pa.int64())]
        )

    # LPT bin-packing of blocks files into ~4x-slots tasks, LARGEST FIRST:
    # raw sizes per split vary with document lengths (bench table: 5x
    # file-size skew), so bins are balanced by bytes; and one task per FILE
    # would pay this host's ~160 ms per-task scheduler latency per file
    # (a streamed table's thousands of small run files must not become
    # thousands of tasks). decode_file already loops every row in its
    # batch; parallelize preserves element->partition order.
    import heapq

    files = sorted(
        glob.glob(f"{out_dir}/blocks/*.parquet"),
        key=lambda f: -os.path.getsize(f),
    )
    slots = max(spark.sparkContext.defaultParallelism, 1)
    n_tasks = max(1, min(len(files), slots * 4))
    heap = [(0, i) for i in range(n_tasks)]
    bins: list[list] = [[] for _ in range(n_tasks)]
    for f in files:
        load, i = heapq.heappop(heap)
        bins[i].append((f,))
        heapq.heappush(heap, (load + os.path.getsize(f), i))
    bins = [b for b in bins if b]
    files_df = spark.createDataFrame(
        spark.sparkContext.parallelize(bins, max(len(bins), 1)).flatMap(
            lambda b: b
        ),
        "file string",
    )

    def decode_file(batches):
        for batch in batches:
            for row in batch.to_pylist():
                # mmap + single-threaded: tasks already saturate the
                # cores; pyarrow's intra-read threads only thrash here
                tbl = pq.ParquetFile(
                    row["file"], memory_map=True, buffer_size=0
                ).read(
                    columns=["part_id", "chunk_id", "col", "codec", "n",
                             "n_nulls", "params", "run_id", "payload"],
                    use_threads=False,
                )
                part = tbl.column("part_id").to_numpy(zero_copy_only=False)
                chunk = tbl.column("chunk_id").to_numpy(zero_copy_only=False)
                names = tbl.column("col").to_pylist()
                codecs = tbl.column("codec").to_pylist()
                ns = tbl.column("n").to_pylist()
                nnulls = tbl.column("n_nulls").to_pylist()
                params = tbl.column("params").to_pylist()
                run_ids = tbl.column("run_id").to_pylist()
                payloads = tbl.column("payload")
                keys = part.astype(np.int64) << np.int64(32) | chunk.astype(np.int64)
                by_chunk: dict[int, dict] = {}
                chunk_n: dict[int, int] = {}  # rows per LIVE chunk (any col)
                for i in range(len(keys)):
                    if keep_keys is not None and int(keys[i]) not in keep_keys:
                        continue
                    if committed is not None and (
                        int(part[i]), run_ids[i]
                    ) not in committed:
                        continue  # stale partial from an uncommitted run
                    chunk_n[int(keys[i])] = int(ns[i])
                    if names[i] not in col_ptypes:
                        continue
                    colmap = by_chunk.setdefault(int(keys[i]), {})
                    if names[i] in colmap:
                        raise ValueError(
                            f"duplicate block for part={int(part[i])} "
                            f"chunk={int(chunk[i])} col={names[i]} in {row['file']}"
                        )
                    colmap[names[i]] = i
                # iterate LIVE chunks, not just those carrying a wanted
                # column: a chunk written before a column was added (schema
                # evolution) decodes that column as nulls, and its rows
                # must survive even when NO wanted column predates it
                for ckey in sorted(chunk_n):
                    colmap = by_chunk.get(ckey, {})
                    out = {}
                    n_rows = chunk_n[ckey]
                    for c, ptype in cols:
                        i = colmap.get(c)
                        if i is None:  # column added after this chunk
                            out[c] = pa.nulls(n_rows, _STD_ARROW[ptype])
                            continue
                        arr = Ch.decode_column_chunk(
                            payloads[i].as_py(), codecs[i], params[i],
                            int(ns[i]), int(nnulls[i]), ptype,
                        )
                        if not arr.type.equals(_STD_ARROW[ptype]):
                            arr = arr.cast(_STD_ARROW[ptype])
                        out[c] = arr
                    tab = {c: out[c] for c in want_cols}
                    if address:
                        tab["_part_id"] = pa.array(
                            np.full(n_rows, ckey >> 32, dtype=np.int32))
                        tab["_chunk_id"] = pa.array(
                            np.full(n_rows, ckey & 0xFFFFFFFF,
                                    dtype=np.int64))
                        tab["_pos"] = pa.array(
                            np.arange(n_rows, dtype=np.int64))
                    yield pa.table(
                        tab, schema=arrow_schema
                    ).to_batches(max_chunksize=1 << 30)[0]

    decoded = files_df.mapInArrow(decode_file, schema=out_schema)
    if tombs is not None:
        decoded = anti_join_tombstones(decoded, tombs)
    if predicates:
        decoded = _exact_filter(decoded, predicates, all_ptypes)
    if any_of:
        from cuda_float_compress_spark.operators.decode import (
            _exact_condition,
        )

        disj = F.lit(False)
        for conj in any_of:
            disj = disj | _exact_condition(conj, all_ptypes)
        decoded = decoded.filter(disj)
    keep = want_cols if columns is None else [
        c for c in want_cols if c in set(columns)
    ]
    if with_row_address:
        keep = keep + list(ADDRESS_COLS)
    if keep != decoded.columns:
        decoded = decoded.select(*keep)
    return decoded


def plan_splits(input_dir: str, target_rows_per_split: int = 131_072,
                target_bytes_per_split: int | None = None) -> list[tuple]:
    """(part_id, file, rg_start, rg_end) over all parquet files, grouping
    consecutive row groups up to the target. Driver-side metadata only.

    Splits close on EITHER cap: rows, or uncompressed bytes (row-group
    ``total_byte_size`` from the parquet footers). Row-count-only splits
    skew when document lengths vary — the bench table showed 5x
    raw-byte spread across equal-row splits, which makes the straggler
    task 5x the median at decode too.

    Default byte cap: derived from the footers as
    ``max(192 MB, largest observed row group)``, so a table written by a
    normal parquet writer NEVER takes the sub-row-group path.  That path
    splits one row group into k row ranges, and each range's task must
    re-decode the row group from its start (parquet has no intra-row-group
    seek), i.e. ~k/2x read+decode amplification across the k tasks — only
    worth paying for a true straggler.  Round 5 defaulted the cap to 16 MB,
    which quintupled ordinary 67 MB row groups and tripled 1-core encode
    time; deriving the cap from the actual footer statistics removes the
    amplification entirely for uniform tables while an EXPLICIT
    ``target_bytes_per_split`` still subdivides pathological row groups
    (>1.5x the cap) for callers that know their table has one."""
    files = sorted(glob.glob(os.path.join(input_dir, "*.parquet")))
    metas = [pq.ParquetFile(f).metadata for f in files]
    if target_bytes_per_split is None:
        max_rg = max(
            (md.row_group(i).total_byte_size
             for md in metas for i in range(md.num_row_groups)),
            default=0,
        )
        target_bytes_per_split = max(192 << 20, max_rg)
    splits = []
    pid = 0
    for f, md in zip(files, metas):
        rg = 0
        while rg < md.num_row_groups:
            rg_rows = md.row_group(rg).num_rows
            rg_bytes = md.row_group(rg).total_byte_size
            if rg_bytes > target_bytes_per_split * 3 // 2 and rg_rows > 1:
                # one oversized row group (writers that never flushed):
                # subdivide by ROW RANGE — the encode task slices the
                # streamed batches, so no task carries k x the target
                k = min(-(-rg_bytes // target_bytes_per_split), rg_rows)
                per = -(-rg_rows // k)
                start_row = 0
                while start_row < rg_rows:
                    end_row = min(start_row + per, rg_rows)
                    splits.append((
                        pid, f, rg, rg + 1, start_row, end_row,
                        rg_bytes * (end_row - start_row) // rg_rows,
                    ))
                    pid += 1
                    start_row = end_row
                rg += 1
                continue
            rows = 0
            nbytes = 0
            start = rg
            while (rg < md.num_row_groups and rows < target_rows_per_split
                   and nbytes < target_bytes_per_split):
                rows += md.row_group(rg).num_rows
                nbytes += md.row_group(rg).total_byte_size
                rg += 1
                if (rg < md.num_row_groups
                        and md.row_group(rg).total_byte_size
                        > target_bytes_per_split * 3 // 2):
                    break  # let the oversized row group get its own splits
            splits.append((pid, f, start, rg, -1, -1, nbytes))
            pid += 1
    return splits


_MANIFEST_ARROW = pa.schema([
    ("part_id", pa.int32()),
    ("col", pa.string()),
    ("col_idx", pa.int32()),
    ("ptype", pa.string()),
    ("n_chunks", pa.int64()),
    ("n_values", pa.int64()),
    ("n_nulls", pa.int64()),
    ("raw_bytes", pa.int64()),
    ("enc_bytes", pa.int64()),
    # element name + non-null mirror Spark's array<string> parquet layout
    ("codecs", pa.list_(pa.field("element", pa.string(), nullable=False))),
    ("vmin", pa.int64()),
    ("vmax", pa.int64()),
    ("run_id", pa.string()),
])

_LINEAGE_ARROW = pa.schema([
    ("part_id", pa.int32()),
    ("n_chunks", pa.int64()),
    ("n_rows", pa.int64()),
    ("raw_bytes", pa.int64()),
    ("enc_bytes", pa.int64()),
    ("run_id", pa.string()),
    ("status", pa.string()),
    ("finished_at", pa.float64()),
    ("salts_json", pa.string()),
])


def _atomic_parquet_append(dir_path: str, tbl: pa.Table, name: str) -> None:
    """Append one parquet file to a dataset dir with atomic visibility:
    write under a dot-prefixed temp name (ignored by every parquet
    reader), then os.rename into place."""
    os.makedirs(dir_path, exist_ok=True)
    tmp = os.path.join(dir_path, f".inprogress-{name}")
    pq.write_table(tbl, tmp)
    os.rename(tmp, os.path.join(dir_path, name))


_MANIFEST_META_COLS = ["part_id", "col", "col_idx", "ptype", "n", "n_nulls",
                       "raw_bytes", "enc_bytes", "codec", "vmin", "vmax"]


def _manifest_rows_driver_side(blk_files: list[str],
                               run_id: str) -> list[dict]:
    """build_manifest's aggregate computed on the driver from the block
    files' METADATA columns (payloads never read — parquet column
    projection): bit-identical semantics to the Spark groupBy (count,
    sums, sorted codec set, null-skipping min/max), pinned by the
    mixed-writer parity test."""
    import pyarrow.dataset as ds

    tbl = ds.dataset(blk_files, format="parquet").to_table(
        columns=_MANIFEST_META_COLS,
        filter=ds.field("run_id") == run_id,
    )
    cols = {c: tbl.column(c).to_pylist() for c in _MANIFEST_META_COLS}
    agg: dict[tuple, dict] = {}
    for i in range(tbl.num_rows):
        key = (cols["part_id"][i], cols["col"][i],
               cols["col_idx"][i], cols["ptype"][i])
        a = agg.get(key)
        if a is None:
            a = agg[key] = {
                "part_id": key[0], "col": key[1], "col_idx": key[2],
                "ptype": key[3], "n_chunks": 0, "n_values": 0,
                "n_nulls": 0, "raw_bytes": 0, "enc_bytes": 0,
                "codecs": set(), "vmin": None, "vmax": None,
                "run_id": run_id,
            }
        a["n_chunks"] += 1
        a["n_values"] += cols["n"][i]
        a["n_nulls"] += cols["n_nulls"][i]
        a["raw_bytes"] += cols["raw_bytes"][i]
        a["enc_bytes"] += cols["enc_bytes"][i]
        a["codecs"].add(cols["codec"][i])
        vmin, vmax = cols["vmin"][i], cols["vmax"][i]
        if vmin is not None and (a["vmin"] is None or vmin < a["vmin"]):
            a["vmin"] = vmin
        if vmax is not None and (a["vmax"] is None or vmax > a["vmax"]):
            a["vmax"] = vmax
    out = []
    for a in agg.values():
        a["codecs"] = sorted(a["codecs"])
        out.append(a)
    return out


def _commit_metadata_driver_side(out_dir: str, man_rows: list[dict],
                                 run_id: str,
                                 salts: dict | None = None) -> None:
    """Manifest + lineage appends for a direct-encode run, written
    driver-side with pyarrow instead of two Spark write jobs: the rows are
    metadata-scale (parts x cols), and each Spark job carries ~0.5 s of
    fixed driver latency on this host — a serial tail that directly caps
    the N -> 4N scaling-efficiency quotient. Schemas mirror the shuffle
    path's Spark-written files EXACTLY (types checked by
    tests/test_direct.py mixed-writer round trip), so one table dir can
    carry appends from both writers. The lineage write lands LAST — it is
    the run's commit point (decode trusts only lineage-committed parts)."""
    man_cols = {f.name: [r[f.name] for r in man_rows]
                for f in _MANIFEST_ARROW}
    _atomic_parquet_append(
        f"{out_dir}/manifest",
        pa.Table.from_pydict(man_cols, schema=_MANIFEST_ARROW),
        f"part-direct-{run_id}.parquet",
    )
    per_part: dict[int, dict] = {}
    for r in man_rows:
        p = per_part.setdefault(
            r["part_id"],
            {"n_chunks": 0, "n_rows": 0, "raw_bytes": 0, "enc_bytes": 0},
        )
        p["n_chunks"] = max(p["n_chunks"], r["n_chunks"])
        p["n_rows"] = max(p["n_rows"], r["n_values"])
        p["raw_bytes"] += r["raw_bytes"]
        p["enc_bytes"] += r["enc_bytes"]
    now = time.time()
    lin_cols = {
        "part_id": list(per_part),
        "n_chunks": [p["n_chunks"] for p in per_part.values()],
        "n_rows": [p["n_rows"] for p in per_part.values()],
        "raw_bytes": [p["raw_bytes"] for p in per_part.values()],
        "enc_bytes": [p["enc_bytes"] for p in per_part.values()],
        "run_id": [run_id] * len(per_part),
        "status": ["done"] * len(per_part),
        "finished_at": [now] * len(per_part),
        "salts_json": [json.dumps(salts or {})] * len(per_part),
    }
    _atomic_parquet_append(
        f"{out_dir}/lineage",
        pa.Table.from_pydict(lin_cols, schema=_LINEAGE_ARROW),
        f"part-direct-{run_id}.parquet",
    )


def encode_table_direct(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    columns: list[str] | None = None,
    chunk_rows: int = 32_768,
    chunk_bytes: int = 1 << 24,
    codec_overrides: dict | None = None,
    resume: bool = True,
    run_id: str | None = None,
    metrics: EngineMetrics | None = None,
    target_rows_per_split: int = 131_072,
    target_bytes_per_split: int | None = None,
    profile: str = "ratio",
) -> dict:
    run_id = run_id or uuid.uuid4().hex[:12]
    metrics = metrics or EngineMetrics(spark)
    overrides = codec_overrides or {}
    t_start = time.time()

    with metrics.stage("plan"):
        splits = plan_splits(input_dir, target_rows_per_split,
                             target_bytes_per_split)
        done = set(completed_parts(spark, out_dir)) if resume else set()
        todo = [s for s in splits if s[0] not in done]

    if todo:
        acc = metrics.acc

        def encode_split(batches):
            for batch in batches:
                for row in batch.to_pylist():
                    pf = pq.ParquetFile(row["file"])
                    part_id = row["part_id"]
                    row_start, row_end = row["row_start"], row["row_end"]
                    chunk_id = 0
                    buf, buf_rows, buf_bytes = [], 0, 0
                    offset = 0  # rows streamed so far within the rg range
                    for rb in pf.iter_batches(
                        batch_size=chunk_rows,
                        row_groups=range(row["rg_start"], row["rg_end"]),
                        columns=columns,
                    ):
                        if row_start >= 0:  # sub-row-group split: clip the
                            lo = max(row_start - offset, 0)  # batch to the
                            hi = min(row_end - offset, rb.num_rows)  # range
                            offset += rb.num_rows
                            if offset >= row_end and hi <= lo:
                                break  # past our range: skip the tail decode
                            if hi <= lo:
                                continue
                            if (lo, hi) != (0, rb.num_rows):
                                rb = rb.slice(lo, hi - lo)
                        rb = _to_us_batch(rb)
                        buf.append(rb)
                        buf_rows += rb.num_rows
                        buf_bytes += rb.nbytes
                        if buf_rows >= chunk_rows or buf_bytes >= chunk_bytes:
                            yield _encode_chunk_to_rows(
                                pa.Table.from_batches(buf), part_id, chunk_id,
                                overrides, acc, run_id, profile,
                            )
                            chunk_id += 1
                            buf, buf_rows, buf_bytes = [], 0, 0
                    if buf:
                        yield _encode_chunk_to_rows(
                            pa.Table.from_batches(buf), part_id, chunk_id,
                            overrides, acc, run_id, profile,
                        )

        # LPT bin-packing: biggest split first (document-length skew puts
        # up to ~5x byte spread across equal-row splits), each assigned to
        # the currently-lightest of ~4x-slots bins. One TASK per BIN, not
        # per split: a table of many small files must not pay per-task
        # scheduler latency per file (measured ~160 ms/task on this host —
        # 90 one-file tasks cost 16 s of pure dispatch at 1 core; at 100 TB
        # a million small files would be a million tasks). encode_split
        # already iterates every split row in its batch, and each split
        # keeps its own part_id, so (part, chunk) keys are unaffected.
        import heapq

        todo = sorted(todo, key=lambda s: -s[6])
        slots = max(spark.sparkContext.defaultParallelism, 1)
        n_tasks = max(1, min(len(todo), slots * 4))
        heap = [(0, i) for i in range(n_tasks)]  # (bytes_assigned, bin)
        bins: list[list] = [[] for _ in range(n_tasks)]
        for s in todo:
            load, i = heapq.heappop(heap)
            bins[i].append(s)
            heapq.heappush(heap, (load + s[6], i))
        bins = [b for b in bins if b]
        splits_df = spark.createDataFrame(
            spark.sparkContext.parallelize(bins, len(bins)).flatMap(
                lambda b: b
            ),
            SPLITS_SCHEMA,
        )
        blocks = splits_df.mapInArrow(encode_split, schema=BLOCKS_SCHEMA)
        with metrics.stage("encode_write"):
            # payload bytes are already entropy-coded: parquet-level snappy
            # on top is a wasted (re)compression pass on write AND a
            # decompression pass on every read (metadata columns are ~100 B)
            blocks.write.mode("append").option(
                "compression", "uncompressed"
            ).parquet(f"{out_dir}/blocks")

        with metrics.stage("manifest"):
            # Manifest build + manifest/lineage appends are driver-side:
            # the rows are metadata-scale (parts x cols), and every Spark
            # job here costs ~0.5 s of fixed driver latency — a pure
            # serial-tail Amdahl term that directly caps the measured
            # N -> 4N scaling efficiency. Small tables (file count up to
            # ~4x-slots bins) read the block METADATA columns with a
            # driver-side pyarrow dataset scan; beyond that (a real
            # cluster's thousands of task files) the same aggregate runs
            # as a Spark job.
            blk_files = glob.glob(f"{out_dir}/blocks/*.parquet")
            if len(blk_files) <= 256:
                man_rows = _manifest_rows_driver_side(blk_files, run_id)
            else:
                from cuda_float_compress_spark.operators.encode import (
                    build_manifest,
                )

                written = spark.read.parquet(f"{out_dir}/blocks").filter(
                    F.col("run_id") == run_id
                )
                man_rows = [r.asDict() for r in
                            build_manifest(written, run_id).collect()]
            _commit_metadata_driver_side(out_dir, man_rows, run_id)

    snap = metrics.snapshot()
    snap["run_id"] = run_id
    snap["skipped_parts"] = len(done)
    snap["n_splits"] = len(todo)
    snap["n_tasks"] = len(bins) if todo else 0
    snap["wall_sec"] = time.time() - t_start
    return snap
