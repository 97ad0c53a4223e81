"""End-to-end pipelines, lineage/checkpoint, resume semantics."""
