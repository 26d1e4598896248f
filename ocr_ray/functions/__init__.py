"""Operator families: dedup, similarity, textstats, sketches, bloom, multimodal."""
