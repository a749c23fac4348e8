"""Driver-contract query definitions (queries + DuckDB oracle SQL)."""
