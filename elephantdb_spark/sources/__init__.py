"""Ingestion surface: turn arbitrary tabular sources into the engine's
canonical ``(key: binary, value: binary)`` domain input.

The reference stores uninterpreted byte arrays end-to-end and leaves
serialization of richer types entirely to clients (reference:
elephantdb-core/src/jvm/elephantdb/document/KeyValDocument.java:6-15;
clients Thrift-serialize keys themselves,
elephantdb-client/src/clj/elephantdb/client.clj:72-84). This package is
that client-side layer made first-class: typed encoders from any Spark
column(s) to key/value bytes, readers for the common file formats, and the
inverse decoders for reading served values back into typed columns.

Everything here is plain column expressions (JVM-side, codegen-friendly) —
encoding must not become the bottleneck of a 100 TB export job.
"""

from elephantdb_spark.sources.encoders import (
    decode_json_value,
    decode_utf8,
    encode_binary,
    encode_utf8,
    kv_from_columns,
)
from elephantdb_spark.sources.readers import (
    kv_from_csv,
    kv_from_json,
    kv_from_parquet,
    read_domain,
)
from elephantdb_spark.sources.warc import (
    build_warc,
    parse_warc,
    warc_records_df,
)

__all__ = [
    "encode_utf8",
    "encode_binary",
    "decode_utf8",
    "decode_json_value",
    "kv_from_columns",
    "kv_from_csv",
    "kv_from_json",
    "kv_from_parquet",
    "read_domain",
    "parse_warc",
    "build_warc",
    "warc_records_df",
]
