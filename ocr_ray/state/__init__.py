"""Checkpoint/lineage: per-partition resumable execution records."""
