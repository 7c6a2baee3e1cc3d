"""Sources & sinks (SURVEY.md §2.1): batch readers with encoding
fallback, checkpoint/resume state store, audit (runs/exceptions) tables
with the 24h dedup gate."""
