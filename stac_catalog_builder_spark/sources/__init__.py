"""Sources & sinks: partitioned parquet, snapshot/lineage checkpointing."""
