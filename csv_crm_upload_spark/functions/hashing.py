"""THE canonical 60-bit md5 hash — the single definition of the
expression every deterministic gate, shingle hash, and sampling key in
the repo (and every DuckDB oracle) depends on.

The expression is oracle-critical: a one-character drift in any copy is
a silent cross-engine hash mismatch, so it lives HERE exactly once.
DuckDB equivalent: ('0x' || substr(md5(x), 1, 15))::BIGINT, or
CAST(conv(substr(md5(x),1,15),16,10) AS BIGINT) in engines with conv.

Two variants, differing ONLY in the input cast:
  * md5_60(col)    — col is already a string (token/shingle hashing)
  * md5_60_id(col) — col is an id of any type; cast to string first so
    the hash is a pure function of the id's decimal rendering (the
    doc_id gate convention shared by split/mix/sample/quality gates)

Both return a non-negative LONG uniform on [0, 2^60): 15 hex digits
never set the sign bit, so pmod/range gates need no abs()."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_60(col: Column) -> Column:
    """60-bit integer hash of a STRING column (first 15 md5 hex digits)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def md5_60_id(col: Column) -> Column:
    """60-bit integer hash of an id column of any type (decimal-string
    rendering hashed — the deterministic doc_id gate convention)."""
    return md5_60(col.cast("string"))
