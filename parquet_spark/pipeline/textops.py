"""Text analysis for training-data curation: token counting, quality
scoring, language-ID heuristic, rolling-hash document fingerprints.

Design rules (SURVEY.md §2.5 consequence — everything relational is
Catalyst's): every operator here is pure built-in `pyspark.sql.functions`
expression trees — no Python UDFs at all, so the hot path stays inside
whole-stage codegen and scales linearly with executors. Each operator's
DuckDB oracle SQL lives next to it; both sides compute the identical
integer/left-fold formula so value hashes match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

MOD = 1_000_000_007
BPE_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

# tiny per-language lexicons for the n-gram/stopword heuristic; membership
# ratio over whitespace tokens. Deterministic and SQL-expressible.
LEXICONS = {
    "en": ["the", "a", "of", "and", "is", "to", "in"],
    "es": ["el", "la", "de", "y", "es", "en", "un"],
    "fr": ["le", "la", "de", "et", "est", "en", "un"],
    "de": ["der", "die", "das", "und", "ist", "in", "ein"],
    "zh": ["de5", "shi4", "le5", "zai4", "he2", "you3", "wo3"],
}
STOPWORDS = LEXICONS["en"]
PUNCT_RE = "[.,!?;:]"


def _words(text: Column) -> Column:
    return F.split(F.trim(text), r"\s+")


def token_counts(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace token count + BPE-ish regex token count per document."""
    t = F.col(text_col)
    return df.select(
        F.col(id_col),
        F.size(_words(t)).alias("n_ws_tokens"),
        F.regexp_count(t, F.lit(BPE_RE)).alias("n_bpe_tokens"),
        F.length(t).alias("n_chars_c"),
    )


def token_counts_oracle(table: str = "documents", text_col: str = "text", id_col: str = "doc_id") -> str:
    return (
        f"SELECT {id_col}, "
        f"len(string_split_regex(trim({text_col}), '\\s+')) AS n_ws_tokens, "
        f"len(regexp_extract_all({text_col}, '{BPE_RE}')) AS n_bpe_tokens, "
        f"length({text_col}) AS n_chars_c FROM {table}"
    )


def quality_scores(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Length / punctuation / stopword-ratio quality features + a composite
    score — the standard cheap pre-filter for web-scale corpus curation."""
    t = F.col(text_col)
    words = _words(t)
    n_words = F.size(words)
    n_stop = F.size(F.filter(words, lambda w: w.isin(*STOPWORDS)))
    n_punct = F.regexp_count(t, F.lit(PUNCT_RE))
    mean_wl = F.round(F.length(F.regexp_replace(t, r"\s+", "")) / n_words, 6)
    stop_ratio = F.round(n_stop / n_words, 6)
    punct_ratio = F.round(n_punct / F.length(t), 6)
    score = F.round(
        F.least(F.length(t) / F.lit(500.0), F.lit(1.0)) * F.lit(0.4)
        + stop_ratio * F.lit(0.4)
        + (F.lit(1.0) - F.least(punct_ratio * F.lit(10.0), F.lit(1.0))) * F.lit(0.2),
        6,
    )
    return df.select(
        F.col(id_col),
        n_words.alias("n_words"),
        mean_wl.alias("mean_word_len"),
        stop_ratio.alias("stopword_ratio"),
        punct_ratio.alias("punct_ratio"),
        score.alias("quality_score"),
    )


def quality_scores_oracle(table: str = "documents", text_col: str = "text", id_col: str = "doc_id") -> str:
    sw = ", ".join(f"'{w}'" for w in STOPWORDS)
    w = f"string_split_regex(trim({text_col}), '\\s+')"
    return (
        f"SELECT {id_col}, len({w}) AS n_words, "
        f"round(length(regexp_replace({text_col}, '\\s+', '', 'g')) / len({w}), 6) AS mean_word_len, "
        f"round(len(list_filter({w}, x -> x IN ({sw}))) / len({w}), 6) AS stopword_ratio, "
        f"round(len(regexp_extract_all({text_col}, '{PUNCT_RE}')) / length({text_col}), 6) AS punct_ratio, "
        f"round(least(length({text_col}) / 500.0, 1.0) * 0.4 "
        f"+ round(len(list_filter({w}, x -> x IN ({sw}))) / len({w}), 6) * 0.4 "
        f"+ (1.0 - least(round(len(regexp_extract_all({text_col}, '{PUNCT_RE}')) / length({text_col}), 6) * 10.0, 1.0)) * 0.2, 6) "
        f"AS quality_score FROM {table}"
    )


def language_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Lexicon-membership language-ID heuristic: per-language hit ratio over
    whitespace tokens; argmax with a fixed language order as tiebreak."""
    t = F.col(text_col)
    words = _words(t)
    n_words = F.size(words)
    cols = {}
    for lang, lex in LEXICONS.items():
        cols[lang] = F.round(F.size(F.filter(words, lambda w: w.isin(*lex))) / n_words, 6)
    # deterministic argmax: first language (in LEXICONS order) reaching the max
    langs = list(LEXICONS)
    best = F.greatest(*[cols[l] for l in langs])
    pred = F.lit(None).cast("string")
    for lang in reversed(langs):
        pred = F.when(cols[lang] == best, F.lit(lang)).otherwise(pred)
    sel = [F.col(id_col)] + [cols[l].alias(f"score_{l}") for l in langs] + [pred.alias("lang_pred")]
    return df.select(*sel)


def language_id_oracle(table: str = "documents", text_col: str = "text", id_col: str = "doc_id") -> str:
    w = f"string_split_regex(trim({text_col}), '\\s+')"
    score = {
        lang: f"round(len(list_filter({w}, x -> x IN ({', '.join(repr(x) for x in lex)}))) / len({w}), 6)"
        for lang, lex in LEXICONS.items()
    }
    langs = list(LEXICONS)
    best = "greatest(" + ", ".join(score[l] for l in langs) + ")"
    case = "CASE " + " ".join(f"WHEN {score[l]} = {best} THEN '{l}'" for l in langs) + " END"
    cols = ", ".join(f"{score[l]} AS score_{l}" for l in langs)
    return f"SELECT {id_col}, {cols}, {case} AS lang_pred FROM {table}"


def fingerprints(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 8) -> DataFrame:
    """Rolling-hash document fingerprints: a full-document polynomial hash
    (left fold, base 31 mod 1e9+7) plus a winnowing-style min over all
    k-gram rolling hashes — both pure codegen expressions."""
    t = F.col(text_col)
    full = F.aggregate(
        F.split(t, ""),
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * F.lit(31) + F.ascii(ch)) % F.lit(MOD),
    )
    gram_hash = lambda s: F.aggregate(  # noqa: E731
        F.split(s, ""),
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * F.lit(31) + F.ascii(ch)) % F.lit(MOD),
    )
    min_gram = F.array_min(
        F.transform(
            F.sequence(F.lit(1), F.length(t) - F.lit(k - 1)),
            lambda i: gram_hash(F.substring(t, i, k)),
        )
    )
    return df.select(
        F.col(id_col),
        full.alias("fp_full"),
        min_gram.alias("fp_min_kgram"),
    )


def fingerprints_oracle(table: str = "documents", text_col: str = "text", id_col: str = "doc_id", k: int = 8) -> str:
    def fold(expr: str) -> str:
        return (
            f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
            f"list_transform(string_split({expr}, ''), c -> CAST(ascii(c) AS BIGINT))), "
            f"(a, b) -> (a * 31 + b) % {MOD})"
        )

    min_gram = (
        f"list_min(list_transform(generate_series(1, length({text_col}) - {k - 1}), "
        f"i -> {fold(f'substr({text_col}, CAST(i AS INT), {k})')}))"
    )
    return (
        f"SELECT {id_col}, {fold(text_col)} AS fp_full, {min_gram} AS fp_min_kgram FROM {table}"
    )


def quality_filter(
    df: DataFrame, min_score: float = 0.5, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """The most-used curation op: keep documents whose composite quality
    score clears the threshold. Pure expression tree over quality_scores —
    one scan, no shuffle, whole-stage codegen."""
    scored = quality_scores(df, text_col, id_col)
    return scored.filter(F.col("quality_score") >= min_score).select(id_col, "quality_score")


def quality_filter_oracle(
    table: str = "documents", min_score: float = 0.5, text_col: str = "text", id_col: str = "doc_id"
) -> str:
    inner = quality_scores_oracle(table, text_col, id_col)
    return (
        f"SELECT {id_col}, quality_score FROM ({inner}) q "
        f"WHERE quality_score >= {min_score}"
    )


def sample_by_hash(
    df: DataFrame, rate: float = 0.25, id_col: str = "doc_id", salt: str = "s0"
) -> DataFrame:
    """Deterministic corpus subsampling: keep a document iff the top 32
    bits of md5(salt || id) fall below rate * 2^32. Unlike sample()/rand()
    this is reproducible across engines, runs, and partitionings — the
    property a training-data pipeline needs for holdout splits — and both
    Spark and DuckDB compute the identical md5, so it is oracle-exact."""
    bucket = F.conv(F.substring(F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 8), 16, 10).cast("long")
    return df.select(F.col(id_col), bucket.alias("hash_bucket")).filter(
        F.col("hash_bucket") < F.lit(int(rate * (1 << 32)))
    )


def sample_by_hash_oracle(
    table: str = "documents", rate: float = 0.25, id_col: str = "doc_id", salt: str = "s0"
) -> str:
    thr = int(rate * (1 << 32))
    bucket = f"CAST('0x' || substr(md5('{salt}' || CAST({id_col} AS VARCHAR)), 1, 8) AS BIGINT)"
    return (
        f"SELECT {id_col}, {bucket} AS hash_bucket "
        f"FROM {table} WHERE {bucket} < {thr}"
    )


# PII rules applied IN ORDER (each count is taken on the text after the
# previous rule's replacement, so both engines see identical inputs).
# Patterns are deliberately conservative and restricted to syntax Java
# regex (Spark) and RE2 (DuckDB) interpret identically: ASCII classes,
# bounded quantifiers, \b ASCII word boundaries — no backrefs, no
# lookaround (RE2 has neither).
PII_RULES = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d[\d -]{7,}\d", "<PHONE>"),
]


def pii_scrub(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """PII redaction — the compliance pass every web-scale training
    corpus runs before the tokenizer: emails, IPv4 addresses, and
    international-format phone numbers replaced by typed placeholder
    tokens, with per-category match counts for audit. Pure built-in
    regexp expression tree (regexp_extract_all + regexp_replace): no
    Python UDFs, no shuffle, whole-stage codegen — one scan at any
    corpus size."""
    counts = []
    cur = F.col(text_col)
    for name, pat, repl in PII_RULES:
        counts.append(F.size(F.regexp_extract_all(cur, F.lit(pat), 0)).alias(f"n_{name}"))
        cur = F.regexp_replace(cur, pat, repl)
    return df.select(F.col(id_col), cur.alias("scrubbed"), *counts)


def pii_scrub_oracle(table: str = "documents", text_col: str = "text", id_col: str = "doc_id") -> str:
    counts = []
    cur = text_col
    for name, pat, repl in PII_RULES:
        counts.append(f"len(regexp_extract_all({cur}, '{pat}')) AS n_{name}")
        cur = f"regexp_replace({cur}, '{pat}', '{repl}', 'g')"
    return f"SELECT {id_col}, {cur} AS scrubbed, {', '.join(counts)} FROM {table}"


def strip_repeated_lines(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Intra-document repetition cleanup: collapse CONSECUTIVE duplicate
    lines within each document (boilerplate nav bars, scraped pagination,
    degenerate generation loops). Array expression tree — split once,
    index-aware `filter` against the previous element, re-join — so the
    work is per-row with no window, no shuffle, and no Python."""
    with_lines = df.withColumn("__lines", F.split(F.col(text_col), "\n"))
    kept = F.expr("filter(__lines, (x, i) -> i = 0 OR x != __lines[i-1])")
    return with_lines.select(
        F.col(id_col),
        F.array_join(kept, "\n").alias("scrubbed"),
        (F.size("__lines") - F.size(kept)).alias("n_removed"),
    )


def strip_repeated_lines_oracle(table: str = "documents", text_col: str = "text", id_col: str = "doc_id") -> str:
    """Window-function replica: a line is kept iff it is the first of its
    document or differs from its predecessor; rejoin in line order."""
    return (
        f"WITH l AS (SELECT {id_col}, "
        f"unnest(string_split({text_col}, chr(10))) AS line, "
        f"generate_subscripts(string_split({text_col}, chr(10)), 1) AS idx FROM {table}), "
        f"k AS (SELECT {id_col}, line, idx, "
        f"CASE WHEN idx = 1 THEN 1 "
        f"WHEN line IS DISTINCT FROM lag(line) OVER (PARTITION BY {id_col} ORDER BY idx) THEN 1 "
        f"ELSE 0 END AS keep FROM l) "
        f"SELECT {id_col}, "
        f"string_agg(line, chr(10) ORDER BY idx) FILTER (WHERE keep = 1) AS scrubbed, "
        f"CAST(count(*) - sum(keep) AS BIGINT) AS n_removed "
        f"FROM k GROUP BY {id_col}"
    )
