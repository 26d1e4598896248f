"""map_batches stage library: extractor, normalize, partial aggregation."""
