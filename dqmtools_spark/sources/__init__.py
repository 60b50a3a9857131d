"""Table IO: one module speaks 'tables' so the sandbox runs parquet
while a production deployment points the same calls at Iceberg."""
