"""Structured Streaming surfaces: incremental corpus ingestion and
stateful event processing."""
