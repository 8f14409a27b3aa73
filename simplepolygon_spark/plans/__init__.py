"""End-to-end pipelines, lineage/resume, skew handling."""
