"""Infra utilities: logging, metrics, checkpointing, conversion, visualization."""
