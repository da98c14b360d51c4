from csv_crm_upload_spark.operators.validate import validate_split
from csv_crm_upload_spark.operators.dedup import anti_join_existing, dedupe_batch
from csv_crm_upload_spark.operators.mutate import finalize_columns, mark_uploaded
from csv_crm_upload_spark.operators.store import CustomerStore

__all__ = [
    "validate_split",
    "dedupe_batch",
    "anti_join_existing",
    "finalize_columns",
    "mark_uploaded",
    "CustomerStore",
]
