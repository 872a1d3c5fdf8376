from clp_spark.sources.readers import read_json_log_files, read_text_log_files

__all__ = ["read_json_log_files", "read_text_log_files"]
