"""Model-based testing of the table-mutation surface: a seeded random
sequence of MERGE / predicate-delete / takedown-delete / sorted-compact /
vacuum operations is applied to an encoded table AND to a plain Python
dict model; after every operation both decode paths must equal the model
exactly. This is the state-machine twin of the per-operator tests — it
catches interactions (merge after delete, delete of merged rows,
compaction materializing tombstones mid-sequence) that single-op tests
cannot."""
from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from cuda_float_compress_spark.operators.decode import decode_table
from cuda_float_compress_spark.operators.deletes import (
    delete_rows,
    delete_rows_by_keys,
)
from cuda_float_compress_spark.operators.direct import decode_table_direct
from cuda_float_compress_spark.operators.encode import encode_table
from cuda_float_compress_spark.operators.maintain import compact, vacuum
from cuda_float_compress_spark.operators.merge import merge_rows

SCHEMA = "doc_id: long, url: string, lang: string, score: long"
LANGS = ["en", "de", "fr", "zh"]


def _row(i: int, version: int = 0) -> tuple:
    return (i, f"doc://d/{i}", LANGS[(i + version) % 4],
            (i * 13 + version * 101) % 1000)


def _decode_rows(spark, out) -> set[tuple]:
    return {
        (r["doc_id"], r["url"], r["lang"], r["score"])
        for r in decode_table_direct(spark, out).collect()
    }


@pytest.mark.parametrize("seed", [7, 23])
def test_mutation_sequence_matches_model(spark, tmp_path, seed):
    rng = random.Random(seed)
    out = str(tmp_path / f"mm_{seed}")
    model: dict[str, tuple] = {}
    rows = [_row(i) for i in range(240)]
    for t in rows:
        model[t[1]] = t
    df = spark.createDataFrame(rows, SCHEMA)
    encode_table(spark, df, out, n_parts=3, resume=False,
                 sort_keys=["doc_id"], chunk_rows=64)
    next_new_id = 10_000
    compact_gen = 0

    for step in range(7):
        op = rng.choice(["merge", "delete_pred", "delete_keys", "compact",
                         "vacuum", "merge"])
        if op == "merge":
            # update a random sample of surviving keys + insert new rows
            keys = rng.sample(sorted(model), k=min(9, len(model)))
            version = step + 1
            ups = [_row(int(u.rsplit("/", 1)[1]), version) for u in keys]
            ins = [_row(next_new_id + j, version) for j in range(3)]
            next_new_id += 3
            for t in ups + ins:
                model[t[1]] = t
            merge_rows(
                spark, out,
                spark.createDataFrame(ups + ins, SCHEMA),
                key_col="url", sort_keys=["doc_id"],
            )
        elif op == "delete_pred":
            lang = rng.choice(LANGS)
            cut = rng.randrange(0, 1000)
            delete_rows(spark, out, [("lang", "==", lang),
                                     ("score", ">=", cut)])
            model = {u: t for u, t in model.items()
                     if not (t[2] == lang and t[3] >= cut)}
        elif op == "delete_keys":
            if model:
                victims = rng.sample(sorted(model), k=min(5, len(model)))
                delete_rows_by_keys(
                    spark, out, "url",
                    spark.createDataFrame([(v,) for v in victims],
                                          "url: string"),
                )
                for v in victims:
                    model.pop(v, None)
        elif op == "compact":
            packed = str(tmp_path / f"mm_{seed}_c{compact_gen}")
            compact_gen += 1
            compact(spark, out, packed, chunk_rows=128,
                    sort_keys=["score"])
            out = packed
        elif op == "vacuum":
            vacuum(spark, out)

        got = _decode_rows(spark, out)
        want = set(model.values())
        assert got == want, (
            f"seed={seed} step={step} op={op}: "
            f"missing={sorted(want - got)[:5]} extra={sorted(got - want)[:5]}"
        )

    # shuffle path agrees at the end state
    shuffle_rows = {
        (r["doc_id"], r["url"], r["lang"], r["score"])
        for r in decode_table(spark, out).collect()
    }
    assert shuffle_rows == set(model.values())
