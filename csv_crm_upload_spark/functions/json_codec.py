"""JSON wire-format codec (X2, X3).

The reference moves rows across boundaries as snake_case JSON: structs are
marshalled for the batch insert (reference database/database.go:91,123 via
JSON_POPULATE_RECORD/RECORDSET at :16-17) and for the HTTP POST body
(reference crm/upload/uploader.go:117-123).

Spark-first: `to_json(struct(...))` / `from_json(col, schema)` — JVM-side,
codegen'd, no Python in the loop. The reference's `updated_ts` JSON tag vs
`modified_ts` column mismatch (SURVEY §1.3) is intentionally NOT
replicated: our payloads say `modified_ts`, and `customers_from_json`
tolerates the legacy `updated_ts` key by mapping it when present.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType, TimestampType

from csv_crm_upload_spark.schemas import CUSTOMER_SCHEMA

# NB: StructType.add() mutates the receiver — build a fresh StructType so
# the shared CUSTOMER_SCHEMA is never modified.
_LEGACY_SCHEMA = StructType(
    list(CUSTOMER_SCHEMA.fields) + [StructField("updated_ts", TimestampType(), True)]
)

UPLOAD_COLUMNS = ["id", "first_name", "last_name", "email", "phone"]


def customers_to_json(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """X2: one JSON object string per row (the POST body shape)."""
    cols = columns or UPLOAD_COLUMNS
    return df.select(F.to_json(F.struct(*cols)).alias("payload"))


def customer_struct(payload: Column) -> Column:
    """X3: schema-directed parse of one JSON object into a typed struct
    (the Spark analog of JSON_POPULATE_RECORD). Tolerates the legacy
    `updated_ts` key: when present and `modified_ts` absent, it fills in."""
    parsed = F.from_json(payload, _LEGACY_SCHEMA)
    return F.struct(
        parsed["id"].alias("id"),
        parsed["first_name"].alias("first_name"),
        parsed["last_name"].alias("last_name"),
        parsed["email"].alias("email"),
        parsed["phone"].alias("phone"),
        parsed["uploaded"].alias("uploaded"),
        parsed["created_ts"].alias("created_ts"),
        F.coalesce(parsed["modified_ts"], parsed["updated_ts"]).alias("modified_ts"),
    )


def customers_from_json(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """X3 applied to a payload column; returns typed customer rows."""
    return df.select(customer_struct(F.col(payload_col)).alias("c")).select("c.*")
