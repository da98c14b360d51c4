from csv_crm_upload_spark.streaming.pipeline import run_ingest_stream, run_upload_cycle

__all__ = ["run_ingest_stream", "run_upload_cycle"]
