"""Scale-up correctness tier: build a deterministic ~10x replica of the
sf0.1 documents/embeddings tables (the sandbox's largest driver fixture)
and run the LSH/dedup oracle family on it.

Why: 51/52 queries gate at sf0.01, and the LSH family additionally at
sf0.001/0.1 — but bucket caps, the 2048-vector IVF training sample, and
band-bucket skew only start binding as N grows. This tier exercises them
at 50k docs / 20k vectors with cross-replica NEAR-dups (each replica
appends a replica token, so replicas are near- but not exact duplicates —
the hardest shape for banded minhash) while both engines see the identical
parquet bytes, so every hash comparison stays exact.

Usage:
    python tools/scale_tier.py            # build + run the family
    python tools/scale_tier.py --build    # build only
Results are recorded in QUERIES.md by hand (see 'Scale tiers').
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
DST = "/root/repo/.scratch/sf1x"
REPLICAS = 10
FAMILY = (
    "minhash_dedup_pairs,simhash_pairs,dup_components,dedup_keep_list,"
    "ivf_topk,ann_lsh_topk,embedding_topk"
)

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def build() -> None:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    # id stride derived from the base fixture, never hardcoded: a stride
    # smaller than max(id)+1 would silently collide replica ids and the
    # oracle comparison would "pass" against a corrupted corpus
    doc_stride = con.execute(
        f"SELECT max(doc_id) + 1 FROM read_parquet('{SRC}/documents.parquet')"
    ).fetchone()[0]
    vec_stride = con.execute(
        f"SELECT max(vec_id) + 1 FROM read_parquet('{SRC}/embeddings.parquet')"
    ).fetchone()[0]
    # documents: replica 0 verbatim; replica r>0 appends a replica token
    # (near-dup of the original, never exact) and re-derives n_chars
    con.execute(
        f"""
        COPY (
            SELECT d.doc_id + r.r * {doc_stride} AS doc_id,
                   CASE WHEN r.r = 0 THEN d.text
                        ELSE d.text || ' replica' || r.r END AS text,
                   d.lang, d.source,
                   CASE WHEN r.r = 0 THEN d.n_chars
                        ELSE length(d.text || ' replica' || r.r) END AS n_chars
            FROM read_parquet('{SRC}/documents.parquet') d,
                 range(0, {REPLICAS}) r(r)
            ORDER BY doc_id
        ) TO '{DST}/documents.parquet' (FORMAT PARQUET)
        """
    )
    # embeddings: replica r shifts every component by r*1e-3 — replicas stay
    # near-identical in cosine but never tie exactly (top-k stays
    # deterministic in both engines)
    con.execute(
        f"""
        COPY (
            SELECT e.vec_id + r.r * {vec_stride} AS vec_id,
                   list_transform(
                       e.embedding, x -> (x + r.r * 0.001)::FLOAT
                   ) AS embedding,
                   e.label
            FROM read_parquet('{SRC}/embeddings.parquet') e,
                 range(0, {REPLICAS}) r(r)
            ORDER BY vec_id
        ) TO '{DST}/embeddings.parquet' (FORMAT PARQUET)
        """
    )
    for t in TABLES:
        if t in ("documents", "embeddings"):
            continue
        dst = f"{DST}/{t}.parquet"
        if not os.path.exists(dst):
            shutil.copyfile(f"{SRC}/{t}.parquet", dst)
    n = con.execute(
        f"SELECT count(*) FROM read_parquet('{DST}/documents.parquet')"
    ).fetchone()[0]
    print(f"built {DST}: {n} documents, {REPLICAS}x replicas")


def main() -> int:
    build()
    if "--build" in sys.argv:
        return 0
    proc = subprocess.run(
        [sys.executable, "/root/repo/tools/check_oracles.py", DST, FAMILY],
        cwd="/root/repo",
    )
    return proc.returncode


if __name__ == "__main__":
    raise SystemExit(main())
