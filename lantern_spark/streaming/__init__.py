"""Structured-Streaming operators (daemon-parity incremental jobs)."""
