"""mi_inbound_pulsar_spark — a PySpark-native analytics engine.

Re-expresses the capabilities of the reference
``sajinieKavindya/mi-inbound-pulsar`` (a WSO2 MI inbound endpoint that
consumes Apache Pulsar messages; see SURVEY.md) as an idiomatic Spark
engine with two layers:

1. **Ingestion layer** (`sources/`, `streaming/`, `config.py`) — a
   Pulsar-shaped Structured Streaming source abstraction with the
   reference's subscription semantics, payload decoding (content-type
   dispatch), message-metadata projection, and at-least-once delivery
   with retry/DLQ routing.
   Reference surface: ``PulsarMessageConsumer.java``,
   ``PulsarUtils.java``, ``PulsarConnectionSetup.java``.

2. **Processing layer** (`operators/`, `functions/`) — the DataFrame /
   Spark-SQL surface the reference delegates per-message processing to
   (``injectingSeq``, ``PulsarMessageConsumer.java:535-545``), plus the
   LLM-data-pipeline operators (dedup, similarity search, text
   analysis, multimodal plumbing) designed for 100 TB scale.

Everything is built on public PySpark APIs: DataFrame/SQL + Catalyst
for batch, Structured Streaming for streams, Arrow-batched Pandas UDFs
only where built-ins cannot express the semantics.
"""

from mi_inbound_pulsar_spark.session import get_spark

__version__ = "0.1.0"

__all__ = ["get_spark", "__version__"]
