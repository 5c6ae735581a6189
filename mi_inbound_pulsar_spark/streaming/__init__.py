"""Streaming layer: delivery semantics (ack/nack/DLQ), pipeline
dispatch, windowed analytics, chunk reassembly."""
