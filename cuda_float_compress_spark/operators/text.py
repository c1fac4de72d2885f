"""Text-analysis operators for large-scale training-data pipelines.

All hot paths are built-in ``pyspark.sql.functions`` expressions (JVM-side,
whole-stage-codegen'd); no Python UDFs. Each operator is a pure
DataFrame -> DataFrame transform so Catalyst can push filters/pruning through.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# marker stopwords per language for the n-gram/stopword language-ID heuristic
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "das", "und", "ist"],
    "fr": ["le", "la", "les", "est", "avec"],
    "es": ["el", "los", "es", "para", "con"],
    "ru": ["и", "не", "на", "что", "это"],
    "pt": ["o", "que", "do", "da", "em"],
}


def token_count_col(text: Column) -> Column:
    """Whitespace tokenization; empty/blank text counts 0."""
    trimmed = F.trim(text)
    return F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )


def with_token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn("n_tokens", token_count_col(F.col(text_col)))


# GPT-2-style pre-tokenizer pattern (simplified, ASCII apostrophes):
# contractions | space?+letters | space?+digits | space?+other | whitespace.
# Uses only constructs Java regex and RE2 (DuckDB) tokenize identically —
# verified mismatch-free across the multilingual corpus.
BPE_TOKEN_PATTERN = (
    r"'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"
)


def bpe_token_count_col(text: Column) -> Column:
    """BPE-ish token count: non-overlapping matches of the GPT-2-style
    pre-tokenizer regex — the cheap LLM-token estimator a training-data
    pipeline budgets with (whitespace counting undercounts CJK/punctuation)."""
    return F.regexp_count(text, F.lit(BPE_TOKEN_PATTERN))


def with_bpe_token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn("n_bpe_tokens", bpe_token_count_col(F.col(text_col)))


def _chars_col(text: Column) -> Column:
    """The text as an array of 1-codepoint strings, built in ONE pass.

    This exists because ``text.substr(i, 1)`` inside a higher-order-function
    lambda is O(i): UTF8String codepoint indexing scans from the string
    start, so folding substr over ``sequence(1, n)`` is O(n^2) — invisible
    on short fixture docs, catastrophic on real 100 KB–1 MB web pages.
    ``split(text, '')`` materializes the codepoints once (Java regex splits
    between codepoints, surrogate pairs kept whole); the filter drops the
    zero-width trailing match Spark's limit=-1 split keeps."""
    return F.filter(F.split(text, ""), lambda c: F.length(c) > 0)


def rolling_hash_col(text: Column, base: int = 31, mod: int = 1_000_000_007) -> Column:
    """Polynomial rolling hash (Rabin-Karp) over codepoints:
    h = fold(h*base + codepoint) mod p. All JVM expressions; a SQL oracle
    folds the identical recurrence (DuckDB list_reduce), so the value is
    engine-portable — unlike md5, it also supports incremental/windowed
    updates, the property rolling-hash fingerprints exist for.

    O(n): one split pass + one linear fold over the char array (the char
    array is the aggregate's input expression, evaluated once per row)."""
    folded = F.aggregate(
        _chars_col(text),
        F.lit(0).cast("long"),
        lambda acc, c: (acc * base + F.ascii(c)) % mod,
    )
    return F.when(F.length(text) == 0, F.lit(0).cast("long")).otherwise(folded)


def with_rolling_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn("rolling_fp", rolling_hash_col(F.col(text_col)))


def quality_score_cols(text: Column) -> dict[str, Column]:
    """Length / punctuation / uppercase / digit ratios + mean word length —
    the standard cheap quality signals (C4/Gopher-style heuristics, public)."""
    n_chars = F.length(text)
    safe = F.greatest(n_chars, F.lit(1))
    # regexp_count, not length(regexp_replace(...)): every pattern matches
    # exactly one char, so the counts are identical — without allocating a
    # stripped copy of the text per pattern
    n_punct = F.regexp_count(text, F.lit(r"[^\w\s]"))
    n_digit = F.regexp_count(text, F.lit(r"[0-9]"))
    n_upper = F.regexp_count(text, F.lit(r"[A-Z]"))
    n_tok = token_count_col(text)
    mean_word_len = F.when(n_tok > 0, n_chars.cast("double") / n_tok).otherwise(
        F.lit(0.0)
    )
    return {
        "n_chars": n_chars.cast("long"),
        "punct_ratio": F.round(n_punct.cast("double") / safe, 6),
        "digit_ratio": F.round(n_digit.cast("double") / safe, 6),
        "upper_ratio": F.round(n_upper.cast("double") / safe, 6),
        "mean_word_len": F.round(mean_word_len, 6),
    }


def with_quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    cols = quality_score_cols(F.col(text_col))
    for name, c in cols.items():
        df = df.withColumn(name, c)
    # composite score in [0,1]: long-enough, low punct/digit noise
    return df.withColumn(
        "quality_score",
        F.round(
            F.least(F.col("n_chars") / F.lit(500.0), F.lit(1.0))
            * (1 - F.least(F.col("punct_ratio") * 2, F.lit(1.0)))
            * (1 - F.least(F.col("digit_ratio") * 2, F.lit(1.0))),
            6,
        ),
    )


def lang_id_col(text: Column) -> Column:
    """Stopword-marker language ID: count per-language marker words, argmax.
    Pure JVM expressions — each regexp_count appears in the tree EXACTLY
    once: the argmax is array_max over (score, -index, lang) structs
    (struct comparison is field-by-field, so ties go to the smallest
    marker-table index, and the (0, 1, 'und') sentinel beats any zero
    score — identical semantics to a sequential strictly-greater scan).
    The previous chained-CASE formulation embedded each earlier score
    subtree twice per step — ~2^L copies of the first regexes, measured
    3.7 s for 5k docs vs ~0.2 s for this form (Spark does not CSE
    subexpressions inside one projection)."""
    lowered = F.lower(text)
    elems = [
        F.struct(
            F.regexp_count(
                lowered, F.lit(r"\b(" + "|".join(markers) + r")\b")
            ).alias("s"),
            F.lit(-i).alias("ni"),
            F.lit(lang).alias("l"),
        )
        for i, (lang, markers) in enumerate(LANG_MARKERS.items())
    ]
    sentinel = F.struct(
        F.lit(0).alias("s"), F.lit(1).alias("ni"), F.lit("und").alias("l")
    )
    return F.array_max(F.array(sentinel, *elems)).getField("l")


def with_lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn("lang_pred", lang_id_col(F.col(text_col)))


def repetition_cols(text: Column) -> dict[str, Column]:
    """Within-document repetition signals (Gopher-style): the fraction of
    duplicate lines and duplicate whitespace words. High values mark
    boilerplate/navigation spam a training pipeline drops. All JVM array
    ops; a SQL oracle reproduces the identical counts."""
    lines = F.filter(
        F.split(text, r"\n"), lambda s: F.length(F.trim(s)) > 0
    )
    n_lines = F.size(lines)
    words = F.filter(
        F.split(F.trim(text), r"\s+"), lambda s: F.length(s) > 0
    )
    n_words = F.size(words)
    dup_line_frac = F.round(
        (n_lines - F.size(F.array_distinct(lines))).cast("double")
        / F.greatest(n_lines, F.lit(1)),
        6,
    )
    dup_word_frac = F.round(
        (n_words - F.size(F.array_distinct(words))).cast("double")
        / F.greatest(n_words, F.lit(1)),
        6,
    )
    return {
        "n_lines": n_lines.cast("long"),
        "dup_line_frac": dup_line_frac,
        "dup_word_frac": dup_word_frac,
    }


def with_repetition_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    for name, c in repetition_cols(F.col(text_col)).items():
        df = df.withColumn(name, c)
    return df


def _max_run_count(arr: Column) -> Column:
    """Count of the most frequent element of ``arr`` = the longest run in
    the sorted array, via one linear fold (accumulator: previous element,
    current run, best run). Empty array -> 0."""
    init = F.struct(
        F.lit(None).cast("string").alias("p"),
        F.lit(0).cast("long").alias("r"),
        F.lit(0).cast("long").alias("b"),
    )

    def step(acc, x):
        r_new = F.when(acc["p"] == x, acc["r"] + 1).otherwise(
            F.lit(1).cast("long")
        )
        return F.struct(
            x.alias("p"), r_new.alias("r"),
            F.greatest(acc["b"], r_new).alias("b"),
        )

    return F.aggregate(F.array_sort(arr), init, step).getField("b")


def top_ngram_fractions(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Gopher-style top-n-gram concentration per document: the share of
    word occurrences taken by the single most frequent unigram and bigram.
    A page whose top bigram covers 20% of it is navigation/boilerplate.

    Shape: the signal is strictly per-document, so it is computed per ROW
    (sort the doc's gram array once, longest run = top-gram count) with
    ZERO shuffles — one scan, no exchange at any scale. The previous
    explode -> groupBy(id, gram) -> groupBy(id) -> join shape shuffled
    every gram occurrence twice and re-scanned the table three times for
    the same per-doc answer. Docs with no words — including NULL text —
    report 0 / 0.0 (the coalesce mirrors the old left-join behavior).
    One row per INPUT row; callers feed one row per document."""
    words = F.coalesce(
        F.filter(
            F.split(F.trim(F.lower(F.col(text_col))), r"\s+"),
            lambda s: F.length(s) > 0,
        ),
        F.array().cast("array<string>"),
    )
    base = df.select(F.col(id_col), words.alias("_words"))
    n = F.size("_words")
    bigrams = F.zip_with(
        F.slice("_words", 1, F.greatest(n - 1, F.lit(0))),
        F.slice("_words", 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return base.select(
        F.col(id_col),
        n.cast("long").alias("n_words"),
        F.round(
            _max_run_count(F.col("_words")).cast("double")
            / F.greatest(n, F.lit(1)),
            6,
        ).alias("top_word_frac"),
        F.round(
            _max_run_count(bigrams).cast("double")
            / F.greatest(F.size(bigrams), F.lit(1)),
            6,
        ).alias("top_bigram_frac"),
    )


def url_canonicalize_col(url: Column) -> Column:
    """Canonical URL form for URL-level dedup: strip fragment, lowercase
    scheme+host, drop default ports (http:80 / https:443), drop a leading
    'www.', remove tracking query params (utm_*, gclid, fbclid), tidy the
    leftover separators, and drop a bare root slash. Path case and real
    query params are preserved.

    Every pattern stays inside the RE2-compatible subset (no lookaround,
    no backrefs) so the DuckDB oracle can run the IDENTICAL rule chain —
    the same Java-vs-RE2 discipline as the HTML/PII operators."""
    u = F.regexp_replace(url, "#.*", "")  # fragment never reaches a server
    prefix = F.regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?]*", 0)
    u = F.concat(F.lower(prefix), F.substr(u, F.length(prefix) + F.lit(1)))
    # default ports: the alternation group always participates, so the
    # replacement is portable (unmatched-group semantics differ by engine)
    u = F.regexp_replace(u, r"^(http://[^/?:]+):80([/?].*|$)", r"$1$2")
    u = F.regexp_replace(u, r"^(https://[^/?:]+):443([/?].*|$)", r"$1$2")
    u = F.regexp_replace(u, r"^(https?://)www\.", r"$1")
    u = F.regexp_replace(u, r"(utm_[a-z]+|gclid|fbclid)=[^&#]*&?", "")
    u = F.regexp_replace(u, r"\?&", "?")
    u = F.regexp_replace(u, r"[?&]$", "")
    u = F.regexp_replace(u, r"^([a-z][a-z0-9+.-]*://[^/?]+)/$", r"$1")
    return u


def url_host_col(canon_url: Column) -> Column:
    """Host part of an (already canonical) URL."""
    return F.regexp_extract(canon_url, r"^[a-z][a-z0-9+.-]*://([^/?:]+)", 1)


def with_canonical_url(df: DataFrame, url_col: str = "url") -> DataFrame:
    canon = url_canonicalize_col(F.col(url_col))
    return df.withColumn("canon_url", canon).withColumn(
        "host", url_host_col(F.col("canon_url"))
    )


def fingerprint_col(text: Column) -> Column:
    """Deterministic document fingerprint: md5 of whitespace-normalized text.
    md5 (not xxhash64) so the DuckDB oracle computes the identical value."""
    return F.md5(F.regexp_replace(F.trim(text), r"\s+", " "))


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn("fingerprint", fingerprint_col(F.col(text_col)))


def html_to_text_col(html: Column) -> Column:
    """Boilerplate HTML -> visible text: drop script/style/comment blocks,
    strip tags, decode the common entities, collapse whitespace — the
    extraction step of a Common-Crawl-style corpus pipeline (the per-row
    north-rule invariant is byte-identical EXTRACTED text per url, so the
    extractor must be deterministic). All JVM regexp_replace chains using
    only constructs Java regex and RE2 (DuckDB) interpret identically
    ((?s)/(?i) flags, no backrefs), so a SQL oracle reproduces every byte."""
    t = F.regexp_replace(html, r"(?is)<script\b.*?</script>", " ")
    t = F.regexp_replace(t, r"(?is)<style\b.*?</style>", " ")
    t = F.regexp_replace(t, r"(?s)<!--.*?-->", " ")
    t = F.regexp_replace(t, r"(?s)<[^>]*>", " ")
    # &amp; decodes LAST: decoding it first would double-unescape
    # entity-escaped entities ("&amp;lt;" must yield the literal "&lt;",
    # not "<"). Literal replace (no regex engine): the entity strings
    # contain no metacharacters, so the result is byte-identical.
    for ent, rep in (("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"),
                     ("&quot;", "\""), ("&#39;", "'"), ("&amp;", "&")):
        t = F.replace(t, F.lit(ent), F.lit(rep))
    # explicit class, not \s: Java \s includes \x0B, RE2's does not — the
    # explicit class keeps the DuckDB oracle byte-identical on any input
    return F.trim(F.regexp_replace(t, "[ \\t\\n\\r\\f]+", " "))


def with_extracted_text(df: DataFrame, html_col: str = "html",
                        out: str = "extracted_text") -> DataFrame:
    return df.withColumn(out, html_to_text_col(F.col(html_col)))


# PII patterns: only constructs Java regex and RE2 interpret IDENTICALLY
# (no backrefs/lookaround, and an explicit whitespace class instead of \s —
# Java's \s includes \x0B, RE2's does not), so the SQL oracle replays the
# identical redaction on any input byte
_PII_PATTERNS = (
    # email first: an address also contains digit runs an aggressive phone
    # pattern could nibble at
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    # international-ish phone: optional +CC, separators, 9-15 digits total
    ("\\+?\\d[\\d \\t\\n\\r\\f().-]{7,}\\d", "<PHONE>"),
)


def redact_pii_col(text: Column) -> Column:
    """Redact emails, IPv4 addresses, and phone-shaped digit runs with
    typed placeholder tokens — the standard pre-training scrub (C4-style,
    public). Order matters (emails before phones) and is mirrored by the
    SQL oracle."""
    t = text
    for pat, rep in _PII_PATTERNS:
        t = F.regexp_replace(t, pat, rep)
    return t


def with_pii_redaction(df: DataFrame, text_col: str = "text",
                       out: str = "redacted") -> DataFrame:
    df = df.withColumn(out, redact_pii_col(F.col(text_col)))
    # one alternation pass, not three: the placeholder literals cannot
    # overlap, so the count is the same sum
    return df.withColumn(
        "pii_hits",
        F.regexp_count(F.col(out), F.lit("<EMAIL>|<IP>|<PHONE>")).cast("int"),
    )


def shingles_col(text: Column, k: int = 5) -> Column:
    """Character k-shingles as an array<string>.

    O(k*n), not O(n^2): window i is the concat of k aligned slices of the
    one-pass char array (see _chars_col) zipped elementwise — the same
    shifted-slices trick the word-shingle rot-xor hash uses. Each slice and
    each zip_with argument is a top-level expression evaluated ONCE per row;
    the per-window ``substr(i, k)`` it replaces rescanned the string from
    position 0 for every window."""
    n = F.length(text)
    chars = _chars_col(text)
    n_windows = n - k + 1
    arrs = [F.slice(chars, j + 1, n_windows) for j in range(k)]
    sh = arrs[0]
    for a in arrs[1:]:
        sh = F.zip_with(sh, a, lambda x, y: F.concat(x, y))
    return F.when(n < k, F.array(text)).otherwise(sh)


def word_shingles_col(text: Column, w: int = 5) -> Column:
    """Word w-shingles (space-joined token windows) as an array<string> —
    ~word-length x fewer elements than character shingles for the same
    dedup power on prose; the standard large-corpus MinHash configuration.
    SQL twin (DuckDB): [array_to_string(list_slice(toks, i, i+w-1), ' ')
    for i in range(1, greatest(len(toks)-w+2, 2))]."""
    trimmed = F.trim(text)
    toks = F.split(trimmed, r"\s+")
    n = F.size(toks)
    windows = F.transform(
        F.sequence(F.lit(1), F.greatest(n - (w - 1), F.lit(1))),
        lambda i: F.array_join(F.slice(toks, i, w), " "),
    )
    return F.when(F.length(trimmed) == 0, F.array(F.lit(""))).otherwise(windows)
