"""Table layer: Iceberg-style snapshot manifests over partitioned
Parquet with H3 min/max file pruning (no Iceberg jar in this runtime —
the manifest format is a thin stand-in behind the same interface a real
Iceberg catalog would provide; see manifest.py)."""
