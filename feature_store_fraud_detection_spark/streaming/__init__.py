"""Structured Streaming: the engine-native replacement for the reference's
Kafka -> PyFlink -> Redis pipeline."""
