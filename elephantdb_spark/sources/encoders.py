"""Typed column → bytes encoders (and back).

The reference's type system is exactly one type — ``byte[]`` key and value
(KeyValDocument.java:6-15, core.thrift:6-8) — with serialization left to
the caller (client.clj:72-84). These helpers are that caller-side contract
as composable Spark expressions:

* ``encode_utf8(col)`` — canonical string-bytes encoding (any atomic type
  casts through string first, so ``42`` and ``"42"`` encode identically —
  the convention the parity corpus and oracles use).
* ``encode_binary(col)`` — pass binary through untouched.
* ``kv_from_columns(df, key_cols, value_cols)`` — composite keys join with
  a separator; composite values serialize as a JSON object, the
  schema-carrying choice that stays readable from any client.
* ``decode_utf8`` / ``decode_json_value`` — the inverses for served bytes.

All pure column expressions: no UDFs, fully inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def encode_utf8(col: Column | str) -> Column:
    """Any atomic column → utf-8 bytes of its string form."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("string").cast("binary")


def encode_binary(col: Column | str) -> Column:
    """Binary column passthrough (byte fidelity, no re-encoding)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("binary")


def decode_utf8(col: Column | str) -> Column:
    """Served value bytes → string."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("string")


def decode_json_value(col: Column | str, schema: str):
    """Served JSON value bytes → typed struct (inverse of the composite
    value encoding in :func:`kv_from_columns`). ``schema`` is a DDL string,
    e.g. ``"name string, price double"``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.from_json(c.cast("string"), schema)


def kv_from_columns(
    df: DataFrame,
    key_cols: list[str] | str,
    value_cols: list[str] | str,
    key_sep: str = "-",
) -> DataFrame:
    """Project any DataFrame onto the canonical ``(key, value)`` domain
    input.

    Single key column → utf-8 bytes of its string form; multiple key
    columns → ``key_sep``-joined string (the composite-key convention the
    bench's lineitem domain uses). Single value column → utf-8/binary
    bytes; multiple value columns → a JSON object with one field per
    column.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    vals = [value_cols] if isinstance(value_cols, str) else list(value_cols)
    if not keys or not vals:
        raise ValueError("key_cols and value_cols must be non-empty")
    if len(keys) == 1:
        key = encode_utf8(keys[0])
    else:
        # concat, NOT concat_ws: concat_ws silently skips NULL components,
        # so ("a-b", NULL) and ("a", "b") would collide on key b"a-b" and
        # LWW dedup would silently drop a row. With concat, any NULL
        # component yields a NULL key, which the build rejects loudly.
        parts: list = []
        for i, k in enumerate(keys):
            if i:
                parts.append(F.lit(key_sep))
            parts.append(F.col(k).cast("string"))
        key = F.concat(*parts).cast("binary")
    if len(vals) == 1:
        dtype = dict(df.dtypes).get(vals[0])
        value = encode_binary(vals[0]) if dtype == "binary" else encode_utf8(vals[0])
    else:
        value = F.to_json(F.struct(*[F.col(v) for v in vals])).cast("binary")
    return df.select(key.alias("key"), value.alias("value"))
