"""Per-stage lineage records + _SUCCESS markers (resumable builds).

The reference tracks build progress in MongoDB bookkeeping collections
(crawl_skip / rescore_tracking, myaku/datastore/database.py:160-162;
per-item checkpoints crawl_track.py:131-157).  The batch analog here:

- every build stage writes its output under ``<index_dir>/<stage>/`` and
  drops a ``_SUCCESS`` marker only after the write completed;
- a JSON lineage record (stage, inputs, row count, wall seconds) is
  appended to ``<index_dir>/lineage.jsonl``;
- on restart, stages whose marker exists are skipped (idempotent because
  doc_ids derive from url hashes, not block order).
"""

from __future__ import annotations

import json
import os
import time


def stage_dir(index_dir: str, stage: str) -> str:
    return os.path.join(index_dir, stage)


def is_complete(index_dir: str, stage: str) -> bool:
    return os.path.exists(os.path.join(stage_dir(index_dir, stage), "_SUCCESS"))


def mark_complete(index_dir: str, stage: str, **info) -> None:
    d = stage_dir(index_dir, stage)
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "_SUCCESS"), "w") as f:
        f.write(json.dumps(info))
    append_lineage(index_dir, stage=stage, **info)


def append_lineage(index_dir: str, **record) -> None:
    os.makedirs(index_dir, exist_ok=True)
    record.setdefault("wall_end", time.time())
    with open(os.path.join(index_dir, "lineage.jsonl"), "a") as f:
        f.write(json.dumps(record) + "\n")


def read_lineage(index_dir: str) -> list[dict]:
    path = os.path.join(index_dir, "lineage.jsonl")
    if not os.path.exists(path):
        return []
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]
