"""Sources & sinks: table catalog (parquet/Iceberg), manifests, fixtures."""
