"""Sources & sinks: Parquet/CSV readers and partitioned writers."""

from .readers import read_code_files, read_stream_csv, read_outlier_ids

__all__ = ["read_code_files", "read_stream_csv", "read_outlier_ids"]
