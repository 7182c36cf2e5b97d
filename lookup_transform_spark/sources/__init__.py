from lookup_transform_spark.sources.readers import (
    read_binary_files,
    read_csv,
    read_json,
    read_orc,
    read_parquet,
)
from lookup_transform_spark.sources.writers import (
    write_binary_files,
    write_csv,
    write_json,
    write_orc,
    write_parquet_partitioned,
)

__all__ = [
    "read_binary_files",
    "read_csv",
    "read_json",
    "read_orc",
    "read_parquet",
    "write_binary_files",
    "write_csv",
    "write_json",
    "write_orc",
    "write_parquet_partitioned",
]
