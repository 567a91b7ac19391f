"""Utilities: synthesis, checkpointing, timing/logging, plotting."""
