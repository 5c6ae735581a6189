"""Column-level function library: payload decode, metadata projection,
vector math. All built on pyspark.sql.functions (JVM-side, codegen)."""

from mi_inbound_pulsar_spark.functions.payload import (
    decode_payload,
    encode_properties_json,
    project_metadata,
)
from mi_inbound_pulsar_spark.functions.vectors import cosine_similarity, dot, l2_norm

__all__ = [
    "decode_payload",
    "encode_properties_json",
    "project_metadata",
    "cosine_similarity",
    "dot",
    "l2_norm",
]
