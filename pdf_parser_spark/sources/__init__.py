"""Sources: the synthetic transcript ``turns`` generator and a thin
table abstraction (parquet dirs; Iceberg when jars are present)."""
