"""Spark-free LOCAL reader for the engine's encoded tables.

``read_table_local`` reconstructs an encoded table (or a projection /
filtered slice of it) into a ``pyarrow.Table`` with NO SparkSession —
pure pyarrow + the codec kernels. This is the table-level analog of the
reference's local decompress call (``cuszplus_decompress`` is an
in-process function, src/cuda_float_compress.cpp:88-91): a tool, test,
or downstream service can pull a small extract without paying a JVM.
Trust and visibility rules are IDENTICAL to the Spark decode paths:

* only lineage-committed ``(part_id, run_id)`` pairs are read (crashed
  runs are inert), with the same ``as_of`` snapshot semantics;
* committed merge-on-read tombstones are applied (``_SUCCESS``-marked
  ``deletes/run-*`` dirs only);
* chunk pruning uses the exact int-domain zone maps (int/timestamp/date
  columns — where vmin/vmax are exact, so pruning can never drop a
  matching row); string/float predicates are applied as exact filters
  after decode.

Intended for metadata-scale and extract-scale reads (the driver-side
use case); the 100 TB path is ``decode_table_direct``.
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from cuda_float_compress_spark.operators import chunks as Ch
from cuda_float_compress_spark.operators.decode import (
    _STD_ARROW,
    _predicate_value,
)

__all__ = ["read_table_local"]

_INT_EXACT_PTYPES = ("int64", "int32", "timestamp_us", "timestamp_ntz",
                     "date32")


def _committed_pairs(out_dir: str, as_of: float | None) -> set[tuple]:
    lin = pq.read_table(
        f"{out_dir}/lineage",
        columns=["part_id", "run_id", "status", "finished_at"],
    )
    mask = pc.equal(lin.column("status"), "done")
    if as_of is not None:
        mask = pc.and_(mask, pc.less_equal(
            lin.column("finished_at"), float(as_of)))
    lin = lin.filter(mask)
    return set(zip(lin.column("part_id").to_pylist(),
                   lin.column("run_id").to_pylist()))


def _table_columns_local(out_dir: str) -> list[tuple[str, str]]:
    man = pq.read_table(f"{out_dir}/manifest",
                        columns=["col", "col_idx", "ptype"])
    rows = sorted(
        {(man.column("col_idx")[i].as_py(), man.column("col")[i].as_py(),
          man.column("ptype")[i].as_py()) for i in range(man.num_rows)}
    )
    out: list[tuple[str, str]] = []
    seen: dict[str, str] = {}
    for _, col, ptype in rows:
        prev = seen.get(col)
        if prev is None:
            seen[col] = ptype
            out.append((col, ptype))
        elif prev != ptype:
            if {prev, ptype} == {"timestamp_us", "timestamp_ntz"}:
                # same INT96-ambiguity coalesce as decode.table_columns
                seen[col] = "timestamp_us"
                out[[c for c, _ in out].index(col)] = (col, "timestamp_us")
            else:
                raise ValueError(
                    f"column {col!r} appended with conflicting types "
                    f"{prev!r} and {ptype!r}"
                )
    return out


def _tombstone_set(out_dir: str, as_of: float | None = None) -> set[tuple]:
    runs = [
        d for d in glob.glob(os.path.join(out_dir, "deletes", "run-*"))
        if os.path.exists(os.path.join(d, "_SUCCESS"))
    ]
    tombs: set[tuple] = set()
    for d in runs:
        t = pq.read_table(d)
        if as_of is not None and "committed_at" in t.column_names:
            # Iceberg position-delete time scoping: a snapshot dated
            # before the delete committed still sees the rows. Legacy
            # runs without the stamp apply unconditionally.
            t = t.filter(pc.fill_null(pc.less_equal(
                t.column("committed_at"), float(as_of)), True))
        tombs.update(zip(t.column("_part_id").to_pylist(),
                         t.column("_chunk_id").to_pylist(),
                         t.column("_pos").to_pylist()))
    return tombs


def _chunk_pruned(pred_by_col: dict, names, vmins, vmaxs, i) -> bool:
    """True when block row i's zone map PROVES no row matches (exact
    int-domain columns only — callers pass only those predicates)."""
    preds = pred_by_col.get(names[i])
    if not preds:
        return False
    vmin, vmax = vmins[i], vmaxs[i]
    if vmin is None or vmax is None:
        return False
    for op, key in preds:
        if op == "==" and not (vmin <= key <= vmax):
            return True
        if op == ">=" and vmax < key:
            return True
        if op == ">" and vmax <= key:
            return True
        if op == "<=" and vmin > key:
            return True
        if op == "<" and vmin >= key:
            return True
        if op == "in" and all(not (vmin <= k <= vmax) for k in key):
            return True
    return False


def _exact_mask(tbl: pa.Table, predicates: list[tuple],
                ptypes: dict) -> pa.Array | None:
    mask = None
    for col, op, lit in predicates:
        arr = tbl.column(col)
        if ptypes.get(col) in ("timestamp_us", "timestamp_ntz"):
            lit = pa.scalar(lit, type=arr.type)
        if op == "==":
            m = pc.equal(arr, lit)
        elif op == "<":
            m = pc.less(arr, lit)
        elif op == "<=":
            m = pc.less_equal(arr, lit)
        elif op == ">":
            m = pc.greater(arr, lit)
        elif op == ">=":
            m = pc.greater_equal(arr, lit)
        elif op == "in":
            m = pc.is_in(arr, value_set=pa.array(list(lit)))
        else:
            raise ValueError(f"unsupported predicate op: {op!r}")
        m = pc.fill_null(m, False)
        mask = m if mask is None else pc.and_(mask, m)
    return mask


def read_table_local(
    out_dir: str,
    columns: list[str] | None = None,
    predicates: list[tuple] | None = None,
    as_of: float | None = None,
    apply_deletes: bool = True,
    verify: bool = True,
) -> pa.Table:
    """Decode an encoded table into one in-memory ``pyarrow.Table``
    without Spark. ``predicates`` uses the decode-pushdown language
    ([(col, op, literal)], AND semantics; ops ==, <, <=, >, >=, in)."""
    committed = _committed_pairs(out_dir, as_of)
    cols = _table_columns_local(out_dir)
    if columns is not None:
        want_set = set(columns) | {c for c, _, _ in (predicates or [])}
        cols = [(c, p) for c, p in cols if c in want_set]
    ptypes = dict(cols)
    tombs_by_chunk: dict[tuple, list[int]] = {}
    if apply_deletes:
        for p_, c_, pos in _tombstone_set(out_dir, as_of=as_of):
            tombs_by_chunk.setdefault((p_, c_), []).append(pos)

    # exact int-domain zone-map predicates prune chunks; everything is
    # ALSO exact-filtered after decode, so pruning is purely an optimization
    pred_by_col: dict[str, list] = {}
    for c, op, lit in (predicates or []):
        if ptypes.get(c) in _INT_EXACT_PTYPES and op in (
                "==", "<", "<=", ">", ">=", "in"):
            key = ([_predicate_value(v, ptypes[c]) for v in lit]
                   if op == "in" else _predicate_value(lit, ptypes[c]))
            pred_by_col.setdefault(c, []).append((op, key))

    pieces: list[pa.Table] = []
    meta_cols = ["part_id", "chunk_id", "col", "codec", "n", "n_nulls",
                 "params", "run_id", "vmin", "vmax", "payload"]
    for f in sorted(glob.glob(f"{out_dir}/blocks/*.parquet")):
        tbl = pq.ParquetFile(f, memory_map=True, buffer_size=0).read(
            columns=meta_cols, use_threads=False,
        )
        part = tbl.column("part_id").to_pylist()
        chunk = tbl.column("chunk_id").to_pylist()
        names = tbl.column("col").to_pylist()
        codecs = tbl.column("codec").to_pylist()
        ns = tbl.column("n").to_pylist()
        nnulls = tbl.column("n_nulls").to_pylist()
        params = tbl.column("params").to_pylist()
        run_ids = tbl.column("run_id").to_pylist()
        vmins = tbl.column("vmin").to_pylist()
        vmaxs = tbl.column("vmax").to_pylist()
        payloads = tbl.column("payload")
        by_chunk: dict[tuple, dict] = {}
        chunk_n: dict[tuple, int] = {}
        dead: set[tuple] = set()
        for i in range(tbl.num_rows):
            key = (part[i], chunk[i])
            if (part[i], run_ids[i]) not in committed:
                continue
            if _chunk_pruned(pred_by_col, names, vmins, vmaxs, i):
                dead.add(key)
            chunk_n[key] = ns[i]
            if names[i] in ptypes:
                by_chunk.setdefault(key, {})[names[i]] = i
        for key in sorted(k for k in chunk_n if k not in dead):
            colmap = by_chunk.get(key, {})
            n_rows = chunk_n[key]
            out = {}
            for c, ptype in cols:
                i = colmap.get(c)
                if i is None:  # schema evolution: column postdates chunk
                    out[c] = pa.nulls(n_rows, _STD_ARROW[ptype])
                    continue
                arr = Ch.decode_column_chunk(
                    payloads[i].as_py(), codecs[i], params[i],
                    ns[i], nnulls[i], ptype, verify=verify,
                )
                if not arr.type.equals(_STD_ARROW[ptype]):
                    arr = arr.cast(_STD_ARROW[ptype])
                out[c] = arr
            piece = pa.table(out, schema=pa.schema(
                [pa.field(c, _STD_ARROW[p]) for c, p in cols]))
            gone = tombs_by_chunk.get(key)
            if gone:
                m = np.ones(n_rows, dtype=bool)
                m[[g for g in gone if g < n_rows]] = False
                piece = piece.filter(pa.array(m))
            pieces.append(piece)

    schema = pa.schema([pa.field(c, _STD_ARROW[p]) for c, p in cols])
    full = (pa.concat_tables(pieces) if pieces
            else pa.table({c: pa.nulls(0, _STD_ARROW[p])
                           for c, p in cols}, schema=schema))
    if predicates:
        mask = _exact_mask(full, predicates, ptypes)
        if mask is not None:
            full = full.filter(mask)
    if columns is not None:
        full = full.select(columns)
    return full
