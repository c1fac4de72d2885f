"""Deterministic synthetic Common-Crawl-style web-page table.

Exactly the BASELINE.json ``input_hint`` shape:
``url:string, warc_ts:timestamp, html:binary, text:string, lang:string``.

Design goals (FIXTURES.md §1):
* ``url``  — unique; host drawn Zipf-skewed (a few hosts own ~30% of rows →
  exercises salting / skew handling)
* ``warc_ts`` — base 2024-08-07 + small increasing deltas (delta+FOR friendly;
  mirrors the reference's Gaussian-int32 fixture,
  cpu_compress_test/cpu_compress_test.cpp:809-826)
* ``html`` — boilerplate template wrapping ``text`` (high cross-row
  redundancy → FSST/zstd friendly); a seeded ~1% of rows are random bytes
  (incompressible path)
* ``text`` — seeded word-salad prose per ``lang``, log-normal lengths; must
  round-trip byte-identical per url
* ``lang`` — 9 categories, Zipf weights (low cardinality → dict+RLE)

Edge rows at fixed ids: empty text/html, 1-char text, text containing every
Unicode codepoint 0..255, duplicate text under different urls, single-row host.

Generation is a pure function of (row_id range, seed): the distributed and
local paths produce identical rows, so tests and benches agree.
"""

from __future__ import annotations

from datetime import datetime, timezone

import numpy as np
import pandas as pd

BASE_TS_US = int(
    datetime(2024, 8, 7, 0, 0, 0, tzinfo=timezone.utc).timestamp() * 1_000_000
)

LANGS = ["en", "de", "fr", "es", "zh", "ru", "ja", "pt", "other"]
_LANG_CUM = np.cumsum(
    np.array([1.0 / (k + 1) for k in range(len(LANGS))])
    / sum(1.0 / (k + 1) for k in range(len(LANGS)))
)

_WORDS = {
    "en": "the of and to in is was for that with page news about home search".split(),
    "de": "der die das und ist von mit für seite nachrichten über suche".split(),
    "fr": "le la les et de est pour avec page nouvelles recherche accueil".split(),
    "es": "el la los y de es para con página noticias buscar inicio".split(),
    "zh": "的 一 是 在 不 了 有 和 人 这 中 大 页面 新闻".split(),
    "ru": "и в не на я быть он с что а по это страница новости".split(),
    "ja": "の に は を た が で て と し れ さ ページ".split(),
    "pt": "o a e de que do da em um para com página notícias".split(),
    "other": "lorem ipsum dolor sit amet consectetur adipiscing elit sed".split(),
}

_HTML_HEAD = (
    b"<!DOCTYPE html><html><head><meta charset=\"utf-8\"><title>synthetic page"
    b"</title><link rel=\"stylesheet\" href=\"/static/site.css\"></head><body>"
    b"<header><nav><a href=\"/\">home</a><a href=\"/news\">news</a></nav></header>"
    b"<main><article>"
)
_HTML_FOOT = (
    b"</article></main><footer><p>&copy; 2024 synthetic-crawl. All rights "
    b"reserved.</p><script src=\"/static/app.js\"></script></footer></body></html>"
)

N_EDGE_ROWS = 8


def n_hosts_for(n_rows: int) -> int:
    return max(20, n_rows // 200)


def _edge_row(i: int, n_rows: int) -> dict:
    """Fixed edge-case rows at ids 0..7."""
    every_cp = "".join(chr(c) for c in range(256))
    rows = [
        dict(text="", html=b"", lang="en"),  # empty text+html
        dict(text="x", html=_HTML_HEAD + b"x" + _HTML_FOOT, lang="en"),  # 1-char
        dict(text=every_cp, html=every_cp.encode("utf-8"), lang="other"),
        dict(text="duplicate text payload", html=_HTML_HEAD + _HTML_FOOT, lang="en"),
        dict(text="duplicate text payload", html=_HTML_HEAD + _HTML_FOOT, lang="de"),
        dict(text="tab\tnewline\nquote\"backslash\\end", html=b"\x00\x01\xfe\xff", lang="fr"),
        dict(text="singleton host row", html=_HTML_HEAD + b"s" + _HTML_FOOT, lang="en"),
        dict(text=" leading and trailing spaces ", html=b" ", lang="pt"),
    ]
    r = dict(rows[i])
    host = "edge-singleton.example" if i == 6 else "edge.example"
    r["url"] = f"https://{host}/p{i}"
    r["warc_ts"] = BASE_TS_US + i
    return r


def generate_batch(start: int, end: int, n_rows: int, seed: int = 42) -> pd.DataFrame:
    """Rows [start, end) of the n_rows-row table. Pure function of arguments —
    identical output regardless of how ranges are split across tasks."""
    out_url: list = []
    out_ts: list = []
    out_html: list = []
    out_text: list = []
    out_lang: list = []

    n_hosts = n_hosts_for(n_rows)
    ids = np.arange(start, end, dtype=np.int64)
    # one RNG per row, seeded by (seed, row_id): partition-shape independent
    # (vectorized below via Philox counter-style hashing of the row id)
    h = _hash64(ids, np.int64(seed))
    u_host = (h & np.int64(0xFFFFFFFF)).astype(np.float64) / 2**32
    u_lang = ((h >> np.int64(32)) & np.int64(0xFFFF)).astype(np.float64) / 2**16
    u_len = ((h >> np.int64(48)) & np.int64(0x7FFF)).astype(np.float64) / 2**15

    # Zipf-ish skew: host_id = floor(n_hosts * u^3): host 0 gets ~ cube-root
    # share concentration; a handful of hosts own ~30% of rows.
    host_ids = np.minimum((n_hosts * u_host**3).astype(np.int64), n_hosts - 1)
    lang_idx = np.searchsorted(_LANG_CUM, u_lang, side="left").clip(0, len(LANGS) - 1)
    # log-normal-ish text length 50..5000 chars (in words of ~6 chars)
    n_words = (8 + (np.exp(u_len * 4.5) * 3)).astype(np.int64)

    # timestamp: small increasing per-row deltas (mean ~1.5s in microseconds)
    ts = BASE_TS_US + ids * np.int64(1_500_000) + (h % np.int64(1_000_000))

    incompressible = (h % np.int64(100)) == np.int64(7)  # ~1% of rows

    for j, rid in enumerate(ids):
        rid = int(rid)
        if rid < N_EDGE_ROWS:
            r = _edge_row(rid, n_rows)
            out_url.append(r["url"])
            out_ts.append(r["warc_ts"])
            out_html.append(r["html"])
            out_text.append(r["text"])
            out_lang.append(r["lang"])
            continue
        lang = LANGS[lang_idx[j]]
        words = _WORDS[lang]
        k = int(n_words[j])
        # deterministic word picks from the row hash, cheap vector trick
        picks = (_hash64(np.arange(k, dtype=np.int64), np.int64(h[j]))) % len(words)
        text = " ".join(words[int(p)] for p in picks)
        if incompressible[j]:
            rng = np.random.default_rng(int(h[j]) & 0x7FFFFFFF)
            html = rng.bytes(256 + int(u_len[j] * 2048))
        else:
            html = _HTML_HEAD + text.encode("utf-8") + _HTML_FOOT
        out_url.append(f"https://host{host_ids[j]}.example.com/p{rid}")
        out_ts.append(int(ts[j]))
        out_html.append(html)
        out_text.append(text)
        out_lang.append(lang)

    return pd.DataFrame(
        {
            "url": pd.Series(out_url, dtype="object"),
            "warc_ts": pd.Series(
                np.array(out_ts, dtype="datetime64[us]"), dtype="datetime64[us]"
            ),
            "html": pd.Series(out_html, dtype="object"),
            "text": pd.Series(out_text, dtype="object"),
            "lang": pd.Series(out_lang, dtype="object"),
        }
    )


def _hash64(x: np.ndarray, seed: np.int64) -> np.ndarray:
    """splitmix64-style integer hash, vectorized (public-domain algorithm)."""
    z = (x.astype(np.int64) + seed) * np.int64(-7046029254386353131)  # golden gamma
    z = z.view(np.uint64)
    z ^= z >> np.uint64(30)
    z *= np.uint64(0xBF58476D1CE4E5B9)
    z ^= z >> np.uint64(27)
    z *= np.uint64(0x94D049BB133111EB)
    z ^= z >> np.uint64(31)
    return (z & np.uint64(0x7FFFFFFFFFFFFFFF)).view(np.int64)


def webpages_schema():
    from pyspark.sql import types as T

    return T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("warc_ts", T.TimestampType(), False),
            T.StructField("html", T.BinaryType(), False),
            T.StructField("text", T.StringType(), False),
            T.StructField("lang", T.StringType(), False),
        ]
    )


def generate_webpages_df(spark, n_rows: int, seed: int = 42, partitions: int | None = None):
    """Distributed generation: spark.range → mapInPandas batches. Scales to any
    n_rows without touching the driver (the 100 TB path: same function, more
    partitions)."""
    if partitions is None:
        partitions = max(1, min(256, n_rows // 8192 or 1))

    def gen(iterator):
        for pdf in iterator:
            ids = pdf["id"].to_numpy()
            if len(ids) == 0:
                continue
            # ranges arrive contiguous from spark.range; generate per run
            yield generate_batch(int(ids.min()), int(ids.max()) + 1, n_rows, seed)

    rng_df = spark.range(0, n_rows, numPartitions=partitions)
    return rng_df.mapInPandas(gen, schema=webpages_schema())


def generate_webpages_pandas(n_rows: int, seed: int = 42) -> pd.DataFrame:
    """Local (driver-side) generation for unit tests."""
    return generate_batch(0, n_rows, n_rows, seed)
