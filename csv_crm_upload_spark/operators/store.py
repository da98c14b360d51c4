"""Customer store: append sink, pending scan, keyed update (S4, S5, F1, P1, U1).

The reference's store is a Postgres table with UNIQUE constraints and an
index on the `uploaded` flag (reference init-db.sh:11-25); its whole query
surface is four SQL statements (reference database/database.go:16-19).

Spark-first realization: a versioned parquet table. Each mutation commits
a NEW immutable version directory and atomically repoints `_LATEST` —
the standard snapshot/commit pattern of lakehouse table formats, reduced
to its minimum. This sidesteps the read-while-overwrite hazard (SURVEY
§7.4) without requiring Delta in the container, and is how the keyed
UPDATE (U1) stays correct on immutable columnar files.

Scale posture: appends are per-partition file writes (no shuffle);
the pending scan is `filter(~uploaded).select(5 cols)` — Catalyst pushes
both the predicate and the pruned column set to the parquet reader; the
flag-flip rewrite broadcasts the (small) success set. On a real
deployment the store would be Delta/Iceberg with MERGE INTO, partitioned
or z-ordered so the rewrite touches only affected files; the operator
surface here is identical.
"""

from __future__ import annotations

import contextlib
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession

from csv_crm_upload_spark.operators.mutate import mark_uploaded
from csv_crm_upload_spark.schemas import CUSTOMER_SCHEMA

PENDING_COLUMNS = ["id", "first_name", "last_name", "email", "phone"]


class CustomerStore:
    """Versioned parquet-backed `customers` table."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- version plumbing ---------------------------------------------------
    @property
    def _latest_path(self) -> str:
        return os.path.join(self.root, "_LATEST")

    def _current_version(self) -> int:
        try:
            with open(self._latest_path) as f:
                return int(f.read().strip())
        except FileNotFoundError:
            return -1

    def _version_dir(self, v: int) -> str:
        return os.path.join(self.root, f"v{v:08d}")

    def _commit(self, v: int) -> None:
        tmp = self._latest_path + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(v))
        os.replace(tmp, self._latest_path)  # atomic pointer swap

    @contextlib.contextmanager
    def _write_lock(self, timeout_s: float = 60.0):
        """Advisory single-writer lock (O_EXCL lockfile) around mutations:
        two concurrent CLI invocations would otherwise both read version N
        and race the pointer swap. Readers never take the lock — they see
        the last committed snapshot (MVCC-style isolation, the minimal
        form of a lakehouse table format's commit protocol)."""
        lock = os.path.join(self.root, "_LOCK")
        deadline = time.monotonic() + timeout_s
        while True:
            try:
                fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                break
            except FileExistsError:
                if time.monotonic() > deadline:
                    raise TimeoutError(f"store write lock held: {lock}")
                time.sleep(0.1)
        try:
            os.write(fd, str(os.getpid()).encode())
            os.close(fd)
            yield
        finally:
            with contextlib.suppress(FileNotFoundError):
                os.remove(lock)

    # -- operators ----------------------------------------------------------
    def read(self) -> DataFrame:
        """S4: full table scan of the current snapshot."""
        v = self._current_version()
        if v < 0:
            return self.spark.createDataFrame([], CUSTOMER_SCHEMA)
        return self.spark.read.parquet(self._version_dir(v))

    def append(self, batch: DataFrame) -> None:
        """S5: append a finalized batch as a new snapshot.

        Prior version files are immutable: the new snapshot hard-links
        them (no data copy — the parquet-level analog of a table-format
        ADD FILE commit) and adds the batch's new files.
        """
        # stage outside the lock (the expensive part), commit inside it
        staging = os.path.join(self.root, f"staging_{os.getpid()}_{id(batch)}")
        batch = batch.select([f.name for f in CUSTOMER_SCHEMA.fields])
        batch.write.mode("overwrite").parquet(staging)
        with self._write_lock():
            v = self._current_version()
            new_v = v + 1
            new_dir = self._version_dir(new_v)
            os.makedirs(new_dir, exist_ok=True)
            # hard-link prior snapshot's files (no data copy), move in new
            if v >= 0:
                for name in os.listdir(self._version_dir(v)):
                    if name.endswith(".parquet"):
                        os.link(
                            os.path.join(self._version_dir(v), name),
                            os.path.join(new_dir, f"prev_{name}"),
                        )
            for name in os.listdir(staging):
                if name.endswith(".parquet"):
                    os.rename(os.path.join(staging, name), os.path.join(new_dir, name))
            self._commit(new_v)
        shutil.rmtree(staging, ignore_errors=True)

    def pending(self) -> DataFrame:
        """F1+P1: `SELECT id, first_name, last_name, email, phone FROM
        customers WHERE uploaded = false` (reference database/database.go:18).
        Predicate + projection push down to the parquet scan."""
        from pyspark.sql import functions as F

        return self.read().filter(~F.col("uploaded")).select(*PENDING_COLUMNS)

    def mark_uploaded(self, succeeded_emails: DataFrame, now=None) -> int:
        """U1+U2: flip the flag for confirmed uploads; new snapshot.

        Returns the number of rows flipped.
        """
        with self._write_lock():
            table = self.read()
            updated = mark_uploaded(table, succeeded_emails, now=now)
            v = self._current_version()
            new_v = v + 1
            new_dir = self._version_dir(new_v)
            updated.write.mode("overwrite").parquet(new_dir)
            self._commit(new_v)
        flipped = (
            self.read().filter("uploaded").count() - table.filter("uploaded").count()
        )
        return flipped
