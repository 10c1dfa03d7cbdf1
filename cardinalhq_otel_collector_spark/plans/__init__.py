"""Pipeline plans: stage composition, lineage, idempotent resume."""
