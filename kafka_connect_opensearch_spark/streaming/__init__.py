"""Structured Streaming ingestion (the connector's unbounded mode)."""
