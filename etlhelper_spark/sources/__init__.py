from .parquet import nanos_timestamp_columns, read_parquet_table

__all__ = ["nanos_timestamp_columns", "read_parquet_table"]
