"""Production job layer: salted partitioning, lineage, idempotent resume."""
