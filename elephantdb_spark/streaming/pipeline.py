"""Streaming corpus curation — the continuous twin of
:func:`elephantdb_spark.pipeline.clean_corpus`'s stateless + exact stages.

An ingest stream of documents passes through:

1. quality gate — ``min_tokens`` / repetition-fraction caps, all pure
   Column expressions (stateless: executes in the micro-batch scan, no
   state store entry, no watermark interaction);
2. PII redaction — the fixed regexp chain (stateless);
3. exact dedup — ``dropDuplicatesWithinWatermark`` keyed on a 128-bit
   text digest (the same digest-first rule as batch ``exact_dedup``:
   dedup state stores 16-byte digests, never document text), state
   bounded by the watermark horizon.

Near-dup detection stays batch-side by design: LSH banding needs a
corpus-wide shingle index, which has no bounded-state streaming form —
run :func:`elephantdb_spark.pipeline.clean_corpus` over compacted
micro-batch output instead (the reference's own split: streaming ingest,
batch global build — elephantdb-server updates domains from batch
exports for the same reason).

The output composes with any sink, including the micro-batch domain
updater (streaming/updater.stream_build).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from elephantdb_spark.functions.redact import redact_pii
from elephantdb_spark.functions.text import token_count_col
from elephantdb_spark.operators.dedup import digest128_null_safe
from elephantdb_spark.operators.quality import _ngrams_from_tokens
from elephantdb_spark.functions.text import tokens_col


def clean_stream(
    stream_df: DataFrame,
    text_col: str,
    event_time_col: str,
    min_tokens: int | None = 30,
    max_dup_ngram_frac: float | None = None,
    redact: bool = True,
    watermark_delay: str = "10 minutes",
    normalize: bool = False,
    gopher: dict | bool = False,
) -> DataFrame:
    """Quality-gate, optionally redact, and exact-dedup a document
    stream. Returns the surviving rows (``text_col`` replaced by its
    redacted form when ``redact``). See module docstring for the
    stage-by-stage state story.

    ``max_dup_ngram_frac`` drops highly repetitive docs (the streaming
    slice of ``repetition_profile``: the dup-2-gram fraction, computable
    per-row without state).

    ``normalize`` / ``gopher`` run the batch curation front-end
    continuously (both stateless, so they add no state-store entries):
    ``normalize=True`` rewrites ``text_col`` through
    ``curation.NORMALIZATION_STEPS`` BEFORE any gate (so dedup digests
    see canonical bytes, same order as the batch q86 pipeline);
    ``gopher`` is ``True`` for the default thresholds or a dict of
    overrides, filtering through the SAME ``gopher_rule_cols``
    expressions the batch ``gopher_filter`` uses — one rule definition,
    zero batch/stream drift.
    """
    out = stream_df
    if normalize:
        from elephantdb_spark.operators.curation import normalize_text_col

        out = out.withColumn(text_col, normalize_text_col(F.col(text_col)))
    # contract: False/None = off, True = defaults, dict = overrides
    # (an EMPTY dict still gates — bare truthiness would skip it); any
    # other value raises rather than silently disabling the quality gate
    if gopher is True or isinstance(gopher, dict):
        from elephantdb_spark.operators.curation import (
            _clean_tokens,
            gopher_rule_cols_from_tokens,
        )

        overrides = gopher if isinstance(gopher, dict) else {}
        # tokens behind a projection boundary (r18): the kept-rule
        # conjunction references the token array ~8 times — inline, each
        # reference re-ran the regex tokenization
        out = out.withColumn("__g_toks", _clean_tokens(F.col(text_col)))
        out = out.filter(
            gopher_rule_cols_from_tokens(F.col("__g_toks"), **overrides)[
                "kept"
            ]
        ).drop("__g_toks")
    elif gopher is not False and gopher is not None:
        raise ValueError(
            f"gopher must be False/None, True, or a dict of threshold "
            f"overrides; got {gopher!r}"
        )
    if min_tokens is not None:
        out = out.filter(token_count_col(F.col(text_col)) >= min_tokens)
    if max_dup_ngram_frac is not None:
        # token array behind a projection boundary first (r18): the
        # n-gram transform's per-element lambda references the token
        # array, and lambda references are never CSE'd — inlining the
        # regex split here re-tokenized the document once per n-gram
        # (the O(tokens²) trap quality.repetition_profile documents)
        out = out.withColumn("__toks", tokens_col(F.col(text_col)))
        out = out.withColumn(
            "__ng", _ngrams_from_tokens(F.col("__toks"), 2)
        ).drop("__toks")
        n = F.size(F.col("__ng"))
        dup_frac: Column = F.when(n == 0, F.lit(0.0)).otherwise(
            F.lit(1.0)
            - F.size(F.array_distinct(F.col("__ng"))).cast("double")
            / n.cast("double")
        )
        out = out.filter(dup_frac <= max_dup_ngram_frac).drop("__ng")
    if redact:
        out = out.withColumn(text_col, redact_pii(F.col(text_col)))
    # digest-first dedup: state stores 16 bytes per doc in the horizon,
    # never the text (same scale rule as batch exact_dedup; shared
    # digest128 derivation keeps the collision story centralized)
    d0, d1 = digest128_null_safe([text_col])
    out = out.withColumn("__d0", d0).withColumn("__d1", d1)
    out = out.withWatermark(event_time_col, watermark_delay)
    return out.dropDuplicatesWithinWatermark(["__d0", "__d1"]).drop("__d0", "__d1")
