"""Job orchestration: per-partition checkpointing with lineage +
row-count metrics, resumable mid-run (north rule)."""
