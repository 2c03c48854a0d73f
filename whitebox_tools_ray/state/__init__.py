"""Per-partition lineage manifests — resumable batch runs."""
