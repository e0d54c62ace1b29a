"""Persistent pipeline state: partitioned parquet lake with per-partition
lineage manifests, enabling checkpoint-resume of any stage."""
