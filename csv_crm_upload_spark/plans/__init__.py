from csv_crm_upload_spark.plans.ingest import IngestResult, ingest_batch, ingest_csv

__all__ = ["IngestResult", "ingest_batch", "ingest_csv"]
