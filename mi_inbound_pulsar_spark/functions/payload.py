"""Payload decode + metadata projection (reference ops T1-T3).

T1 — content-type decode dispatch. The reference strips an optional
``;charset`` suffix, looks up a message builder for the content type,
and parses the payload into a document tree
(PulsarMessageConsumer.java:505-529, strip at :518-519, fallback to the
SOAP builder at :521-526). Here the dispatch selects a typed Spark
parser — ``from_json`` / ``from_csv`` / ``from_xml`` /
``cast(string)`` — producing a *columnar struct* instead of a tree,
and an unknown content type keeps the raw payload plus an error column
(a SOAP-envelope fallback has no sane Spark analogue).

T2 — metadata projection (PulsarUtils.java:121-130): topic, message_id,
key, redelivery_count, properties become plain columns.

T3 — properties→JSON. The reference serializes Map<String,String> to a
JSON **array of single-key objects** ``[{"k1":"v1"},{"k2":"v2"}]``
(PulsarUtils.java:144-157). Natively we keep MapType; the compat
encoder reproduces that exact shape for parity.

All of this is JVM-expression-only — the decode path stays inside
whole-stage codegen at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: content types the engine decodes into typed structs; everything else
#: falls through to the raw+error path. Mirrors the builder registry
#: dispatch in PulsarMessageConsumer.java:520.
_JSON_TYPES = {"application/json", "text/json"}
_XML_TYPES = {"application/xml", "text/xml", "application/soap+xml"}
_CSV_TYPES = {"text/csv", "application/csv"}
_TEXT_TYPES = {"text/plain"}


def normalize_content_type(content_type: str) -> str:
    """Strip the ``;charset=...`` suffix and lowercase — the reference does
    ``contentType.substring(0, contentType.indexOf(';'))``
    (PulsarMessageConsumer.java:518-519), but NPE-safe."""
    if ";" in content_type:
        content_type = content_type[: content_type.index(";")]
    return content_type.strip().lower()


def decode_payload(
    df: DataFrame,
    content_type: str,
    schema: str | None = None,
    value_col: str = "value",
    out_col: str = "body",
) -> DataFrame:
    """T1 — decode ``value_col`` according to ``content_type``.

    JSON/CSV/XML require ``schema`` (a DDL string); text keeps the
    payload as a string; an unknown content type yields a null body and
    a ``decode_error`` column instead of failing the job (at 100 TB a
    poison message must not kill the stream — it flows to the DLQ).
    """
    ct = normalize_content_type(content_type)
    value = F.col(value_col).cast("string")
    if ct in _JSON_TYPES:
        if not schema:
            raise ValueError(f"content type {ct!r} requires a schema")
        decoded = F.from_json(value, schema)
    elif ct in _CSV_TYPES:
        if not schema:
            raise ValueError(f"content type {ct!r} requires a schema")
        decoded = F.from_csv(value, schema)
    elif ct in _XML_TYPES:
        if not schema:
            raise ValueError(f"content type {ct!r} requires a schema")
        decoded = F.from_xml(value, schema)
    elif ct in _TEXT_TYPES:
        decoded = value
    else:
        return df.withColumn(out_col, F.lit(None).cast("string")).withColumn(
            "decode_error", F.concat(F.lit(f"unsupported content type {ct}: "), value)
        )
    return df.withColumn(out_col, decoded)


def project_metadata(df: DataFrame, value_col: str = "value") -> DataFrame:
    """T2 — select the reference's metadata projection as columns
    (PulsarUtils.java:121-130 key order)."""
    return df.select(
        F.col("topic").alias("topicNames"),
        F.col("message_id").alias("msgId"),
        "key",
        F.col("redelivery_count").alias("redeliveryCount"),
        "properties",
        F.col(value_col),
    )


def encode_properties_json(props_col: str | Column = "properties") -> Column:
    """T3 — exact-shape compat encoder: MapType → JSON array of
    single-key objects, ``[{"k1":"v1"},{"k2":"v2"}]``
    (PulsarUtils.java:144-157). Entry order = map_entries order
    (insertion order of the map column)."""
    col = F.col(props_col) if isinstance(props_col, str) else props_col
    return F.to_json(F.transform(F.map_entries(col), lambda e: F.create_map(e.key, e.value)))
