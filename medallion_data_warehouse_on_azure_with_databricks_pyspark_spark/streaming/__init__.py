"""Structured-streaming surface: bronze ingest, event-time windows."""
