from csv_crm_upload_spark.sinks.http_sink import fibonacci_backoff, upload_partition, upload_pending

__all__ = ["fibonacci_backoff", "upload_partition", "upload_pending"]
