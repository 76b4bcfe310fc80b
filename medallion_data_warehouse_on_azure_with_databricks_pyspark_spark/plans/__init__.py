"""Gold-layer plans: MERGE engine, SCD dimensions, facts, expectations,
declarative pipelines."""
