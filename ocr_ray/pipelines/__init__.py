"""End-to-end pipelines: extract (flagship), relational, joins, streaming."""
