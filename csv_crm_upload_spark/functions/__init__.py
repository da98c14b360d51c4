from csv_crm_upload_spark.functions.json_codec import customers_from_json, customers_to_json

__all__ = ["customers_from_json", "customers_to_json"]
