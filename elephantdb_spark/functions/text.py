"""Text-analysis column functions for large-scale training-data pipelines:
token counting, quality scoring, language-ID heuristic, document
fingerprinting. Every function is a pure Column expression (JVM-side,
vectorized, no Python UDFs) and has an exact SQL twin runnable by DuckDB —
see `elephantdb_spark.extensions` for the oracle strings.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: modulus for the rolling fingerprint: keeps acc*31+cp < 2^63 under ANSI
#: arithmetic (acc < 2^53 → acc*31 + 0x10FFFF < 2^58).
FINGERPRINT_MOD = 1 << 53
FINGERPRINT_BASE = 31

DEFAULT_STOPWORDS = ("the", "a", "of", "and", "in")

#: marker words per language for the n-gram/stopword language-ID heuristic.
DEFAULT_LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "is"),
    "de": ("der", "die", "das", "und", "ist"),
    "es": ("el", "la", "los", "y", "es"),
    "fr": ("le", "la", "les", "et", "est"),
}


def tokens_col(text: Column) -> Column:
    """Whitespace tokens; empty text → empty array (not [''])."""
    trimmed = F.trim(text)
    return F.when(F.length(trimmed) == 0, F.array().cast("array<string>")).otherwise(
        F.split(trimmed, r"\s+")
    )


def token_count_col(text: Column) -> Column:
    return F.size(tokens_col(text)).cast("bigint")


#: BPE-style pre-tokenizer split (the GPT-2 pattern family): contraction
#: suffixes, space-prefixed letter runs, digit runs, punctuation runs.
#: Restricted to constructs Java regex and RE2 (DuckDB) treat identically —
#: no lookahead, ASCII classes, and an EXPLICIT whitespace class (Java's
#: \s includes \x0b, RE2's does not — the one place the engines disagree)
#: — so the SQL oracle matches token-for-token.
BPE_SPLIT_PATTERN = (
    r"'(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 \t\n\r\x0b\x0c]+"
)


def subword_tokens_col(text: Column) -> Column:
    """BPE-ish subword pre-tokens (the unit an LLM tokenizer would merge
    from). A closer token-budget estimate than whitespace words for
    training-data accounting."""
    return F.regexp_extract_all(text, F.lit(BPE_SPLIT_PATTERN), 0)


def subword_count_col(text: Column) -> Column:
    return F.size(subword_tokens_col(text)).cast("bigint")


def stopword_ratio_from_tokens(
    toks: Column, stopwords: tuple[str, ...] = DEFAULT_STOPWORDS
) -> Column:
    """:func:`stopword_ratio_col` over an already-materialized token
    array column. Prefer this form when the consumer computes several
    token metrics in one projection: passing ``tokens_col(text)`` inline
    to each metric re-runs the regex tokenization once per metric (and
    per higher-order-lambda reference — expressions are not CSE'd across
    those boundaries); materialize the array once and feed it here
    (r18; same rule as :func:`text_profile` and dedup._shingle_index)."""
    stops = F.filter(
        toks, lambda t: F.lower(t).isin([s.lower() for s in stopwords])
    )
    n = F.size(toks)
    return F.when(n == 0, F.lit(0.0)).otherwise(
        F.size(stops).cast("double") / n.cast("double")
    )


def stopword_ratio_col(
    text: Column, stopwords: tuple[str, ...] = DEFAULT_STOPWORDS
) -> Column:
    """Fraction of tokens that are stopwords (quality-scoring feature)."""
    return stopword_ratio_from_tokens(tokens_col(text), stopwords)


def avg_token_len_from_tokens(toks: Column) -> Column:
    """:func:`avg_token_len_col` over a materialized token array (see
    :func:`stopword_ratio_from_tokens` for when to prefer this form)."""
    n = F.size(toks)
    total = F.aggregate(
        toks, F.lit(0).cast("bigint"), lambda acc, t: acc + F.length(t)
    )
    return F.when(n == 0, F.lit(0.0)).otherwise(
        total.cast("double") / n.cast("double")
    )


def avg_token_len_col(text: Column) -> Column:
    return avg_token_len_from_tokens(tokens_col(text))


def lang_scores_from_tokens(
    toks: Column, markers: dict[str, tuple[str, ...]] | None = None
) -> dict[str, Column]:
    """Per-language marker-token counts over a materialized token array:
    ``{lang: count}``. Split out from :func:`lang_id_col` (r18) so a
    consumer can materialize the counts as real columns behind a
    projection boundary before feeding them to :func:`lang_id_pick` —
    the argmax WHEN-chain references every language's count several
    times, so inline count expressions (and the tokenization inside
    them) are re-evaluated O(languages²) times per row otherwise."""
    markers = markers or DEFAULT_LANG_MARKERS

    def marker_count(words: tuple[str, ...]) -> Column:
        lowered = [w.lower() for w in words]
        # NB: a default-arg lambda (t, ws=words) would be seen by PySpark as
        # a two-arg (element, index) lambda — close over the list instead.
        return F.size(F.filter(toks, lambda t: F.lower(t).isin(lowered)))

    return {lang: marker_count(words) for lang, words in markers.items()}


def lang_id_pick(scores: dict[str, Column]) -> Column:
    """Argmax over per-language scores with alphabetical tiebreak; all
    scores zero (or no languages at all) → 'und'. Pass cheap column
    references for the scores where possible (see
    :func:`lang_scores_from_tokens`)."""
    if not scores:  # no markers: the documented no-winner answer, not
        return F.lit("und")  # an AttributeError on the empty WHEN chain
    best_score = None
    for s in scores.values():
        best_score = s if best_score is None else F.greatest(best_score, s)
    result = F.lit("und")
    # alphabetical tiebreak: first language (sorted) reaching the max wins;
    # build the WHEN chain in sorted order so the first match takes it.
    chain = None
    for lang in sorted(scores):
        cond = (scores[lang] == best_score) & (best_score > 0)
        chain = F.when(cond, F.lit(lang)) if chain is None else chain.when(cond, F.lit(lang))
    return chain.otherwise(result)


def lang_id_from_tokens(
    toks: Column, markers: dict[str, tuple[str, ...]] | None = None
) -> Column:
    """:func:`lang_id_col` over a materialized token array (see
    :func:`stopword_ratio_from_tokens` for when to prefer this form)."""
    return lang_id_pick(lang_scores_from_tokens(toks, markers))


def lang_id_col(
    text: Column, markers: dict[str, tuple[str, ...]] | None = None
) -> Column:
    """Marker-word language ID: score each language by its marker-token
    count; argmax with alphabetical tiebreak; no markers at all → 'und'."""
    return lang_id_from_tokens(tokens_col(text), markers)


def fingerprint_rolling_col(
    text: Column,
    base: int = FINGERPRINT_BASE,
    mod: int = FINGERPRINT_MOD,
) -> Column:
    """Polynomial rolling-hash document fingerprint over unicode codepoints:
    ``acc = (acc*base + codepoint) % mod`` left-to-right. Pure fold over a
    character split — deterministic, exact-integer, and replicable in DuckDB
    (list_reduce) for the oracle."""
    chars = F.filter(F.split(text, ""), lambda c: F.length(c) > 0)
    return F.aggregate(
        chars,
        F.lit(0).cast("bigint"),
        lambda acc, c: (acc * F.lit(base) + F.ascii(c)) % F.lit(mod),
    )


def python_fingerprint(
    text: str, base: int = FINGERPRINT_BASE, mod: int = FINGERPRINT_MOD
) -> int:
    """Reference implementation for tests."""
    acc = 0
    for ch in text:
        acc = (acc * base + ord(ch)) % mod
    return acc


def text_profile(df, text_col: str, out_prefix: str = "") -> "DataFrame":
    """All token-based metrics in one pass: materializes the token array
    once behind a projection boundary, then derives token count, stopword
    ratio and average token length from it — the per-metric ``tokens_col``
    calls would each re-run the regex split (expressions are not CSE'd
    across lambdas; same pitfall as the shingle index, see
    operators/dedup._shingle_index).

    Adds columns ``{p}n_tokens``, ``{p}stop_ratio``, ``{p}avg_tok_len``,
    ``{p}fp`` (rolling-hash fingerprint) to ``df``.
    """
    p = out_prefix
    toks = "__prof_toks"
    out = df.withColumn(toks, tokens_col(F.col(text_col)))
    n = F.size(F.col(toks))
    lowered = [s.lower() for s in DEFAULT_STOPWORDS]
    stops = F.size(F.filter(F.col(toks), lambda t: F.lower(t).isin(lowered)))
    total_len = F.aggregate(
        F.col(toks), F.lit(0).cast("bigint"), lambda acc, t: acc + F.length(t)
    )
    return (
        out.withColumn(f"{p}n_tokens", n.cast("bigint"))
        .withColumn(
            f"{p}stop_ratio",
            F.when(n == 0, F.lit(0.0)).otherwise(stops.cast("double") / n.cast("double")),
        )
        .withColumn(
            f"{p}avg_tok_len",
            F.when(n == 0, F.lit(0.0)).otherwise(total_len.cast("double") / n.cast("double")),
        )
        .withColumn(f"{p}fp", fingerprint_rolling_col(F.col(text_col)))
        .drop(toks)
    )
