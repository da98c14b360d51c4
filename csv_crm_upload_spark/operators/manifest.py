"""Single-file manifest commit protocol shared by the persisted index
layouts (BM25 inverted index, LSH near-dup pair index).

The manifest is the ONLY commit point of an epoch-versioned index: all
epoch-K+1 files land first, then one atomic os.replace publishes K+1.
A reader resolves its epoch from the manifest once and reads one fully
written snapshot — old or new, never a mix; a crash leaves the manifest
at K and only orphan K+1 dirs, which the next writer removes. On a real
cluster this pointer is a metastore entry / table-format commit log;
the fsync'd single-file swap is the local-filesystem equivalent.
"""

from __future__ import annotations

import json
import os
import shutil


def read_manifest(path: str) -> dict:
    with open(os.path.join(path, "MANIFEST")) as f:
        return json.load(f)


def commit_manifest(path: str, payload: dict) -> None:
    """Atomically publish `payload` (must contain "epoch") as the
    current manifest: temp file + fsync + os.replace (atomic on POSIX)."""
    tmp = os.path.join(path, f"MANIFEST.tmp.{payload['epoch']}")
    with open(tmp, "w") as f:
        json.dump(payload, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(path, "MANIFEST"))


def txn_already_applied(manifest: dict, txn: tuple[str, int] | None) -> bool:
    """True when (app_id, batch_id) is at or below the manifest's last
    recorded transaction for that app — the replay guard that makes a
    checkpointed foreachBatch fold EXACTLY-ONCE in effect: the batch id
    rides the SAME atomic manifest commit as the epoch it folded, so a
    crash either committed both (replay no-ops) or neither (replay
    redoes cleanly). The txnAppId pattern of lakehouse streaming writers
    (cf. operators/store.py merge)."""
    if txn is None:
        return False
    app, batch_id = txn
    return manifest.get("last_txn", {}).get(app, -1) >= batch_id


def with_txn(payload: dict, txn: tuple[str, int] | None) -> dict:
    """Fold (app_id, batch_id) into a manifest payload about to commit."""
    if txn is None:
        return payload
    app, batch_id = txn
    last = dict(payload.get("last_txn", {}))
    last[app] = batch_id
    return {**payload, "last_txn": last}


def remove_orphan_epochs(path: str, subdirs: list[str], current_epoch: int) -> None:
    """Self-heal after a crashed update: drop epoch dirs newer than the
    committed epoch (they were never published; partial files are fine
    to delete)."""
    for sub in subdirs:
        base = os.path.join(path, sub)
        if os.path.isdir(base):
            for d in os.listdir(base):
                if d.startswith("epoch=") and int(d.split("=", 1)[1]) > current_epoch:
                    shutil.rmtree(os.path.join(base, d))
