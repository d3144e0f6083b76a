"""Writeback sinks (SURVEY.md §2A A16-A18): mirror-side writes flow back
to CouchDB over HTTP; the change feed then round-trips them into the
mirror, with the rev-compare merge suppressing the echo (entry point 4 of
SURVEY.md §3).

The reference's trigger swallows the local write and POSTs the doc
(README.md:336-352); large updates use chunked `_bulk_docs` — 50-500 docs
per request; 1000 timed out and an unchunked full-db POST crashed CouchDB
(README.md:504-530). Here the chunking is per-partition slicing inside
``foreachPartition`` — each executor batches its own rows, no global
ROW_NUMBER sort, no driver collect — which is the shape that survives a
1000-executor writeback of a 100 TB mirror.
"""

from __future__ import annotations

import json
import time
from typing import Iterator

from pyspark.sql import DataFrame

from couch_to_postgres_spark.functions.json import json_get
from pyspark.sql import functions as F

# bounds documented at reference README.md:530
MIN_CHUNK, MAX_CHUNK, DEFAULT_CHUNK = 50, 500, 200
#: transient-status retry policy per chunk (5xx/429/connection errors)
DEFAULT_MAX_RETRIES = 3


def _post_chunk_with_retry(
    client, database: str, batch: list[dict], max_retries: int, backoff_s: float
) -> tuple[int, list[str], int]:
    """POST one `_bulk_docs` chunk with per-doc status surfacing.

    CouchDB reports conflicts PER DOC inside a 201 response
    (``[{"id":…, "error":"conflict", …}, …]``) — an HTTP-status-only
    check silently drops them (reference failure discussion
    README.md:534-546). Policy:

    * transient statuses (5xx/429) and connection errors → retry the
      chunk up to ``max_retries`` with fixed backoff (idempotent: a doc
      that DID land turns into a conflict on the replayed chunk, which
      is counted, not fatal);
    * per-doc ``conflict`` → counted and returned, NOT retried: a blind
      same-rev retry conflicts forever. The system-level resolution is
      the round trip itself — the `_changes` feed delivers the winning
      rev and the CDC merge converges the mirror;
    * any other per-doc error (forbidden, …) → raised.

    Returns (n_conflicts, conflict_ids, n_retries)."""
    attempt = 0
    while True:
        attempt += 1
        try:
            status, body = client.bulk_docs(database, batch)
        except OSError:
            if attempt > max_retries:
                raise
            time.sleep(backoff_s)
            continue
        if status >= 500 or status == 429:
            if attempt > max_retries:
                raise IOError(f"_bulk_docs -> {status} after {attempt} attempts")
            time.sleep(backoff_s)
            continue
        if status >= 400:
            raise IOError(f"_bulk_docs -> {status}")
        try:
            results = json.loads(body)
        except (ValueError, TypeError):
            results = []
        conflict_ids = [
            str(r.get("id")) for r in results if r.get("error") == "conflict"
        ]
        hard = [r for r in results if r.get("error") not in (None, "conflict")]
        if hard:
            raise IOError(f"_bulk_docs per-doc errors: {hard[:5]}")
        return len(conflict_ids), conflict_ids, attempt - 1


def writeback_bulk(
    mirror: DataFrame,
    couch_url: str,
    database: str,
    chunk_size: int = DEFAULT_CHUNK,
    transport=None,
    max_retries: int = DEFAULT_MAX_RETRIES,
    retry_backoff_s: float = 1.0,
) -> dict:
    """POST every doc of ``mirror`` to ``database`` via chunked
    `_bulk_docs` (A17). Returns per-chunk status accounting:
    ``{"chunks", "docs", "conflicts", "conflict_ids", "retries"}``
    (conflict_ids capped at 100 for driver safety).

    Echo suppression needs no code here: CouchDB assigns new revs, the
    changes feed replays them, and the CDC merge's rev compare turns the
    replay into NOOPs (reference lib/index.js:110-128).
    """
    chunk_size = max(MIN_CHUNK, min(MAX_CHUNK, chunk_size))

    def _post_partition(rows: Iterator) -> Iterator[tuple]:
        # imports inside the task: runs on executors
        from couch_to_postgres_spark.sources.couchdb import CouchClient, urllib_transport

        client = CouchClient(
            couch_url, transport=transport or urllib_transport()
        )
        sent = docs = conflicts = retries = 0
        conflict_ids: list[str] = []

        def _flush(batch: list[dict]) -> None:
            nonlocal sent, conflicts, retries
            c, ids, r = _post_chunk_with_retry(
                client, database, batch, max_retries, retry_backoff_s
            )
            sent += 1
            conflicts += c
            retries += r
            if len(conflict_ids) < 100:
                conflict_ids.extend(ids[: 100 - len(conflict_ids)])

        batch: list[dict] = []
        for row in rows:
            batch.append(json.loads(row["doc"]))
            docs += 1
            if len(batch) >= chunk_size:
                _flush(batch)
                batch = []
        if batch:
            _flush(batch)
        yield (sent, docs, conflicts, conflict_ids, retries)

    # mapPartitions (not foreachPartition) so chunk stats come back as data
    parts = mirror.select("doc").rdd.mapPartitions(_post_partition).collect()
    out = {
        "chunks": sum(p[0] for p in parts),
        "docs": sum(p[1] for p in parts),
        "conflicts": sum(p[2] for p in parts),
        "conflict_ids": [i for p in parts for i in p[3]][:100],
        "retries": sum(p[4] for p in parts),
    }
    return out


def writeback_single_put(
    mirror: DataFrame,
    couch_url: str,
    database: str,
    transport=None,
) -> dict:
    """One HTTP PUT per doc — the reference's trigger path (A16,
    README.md:336-352). Slow by design (475 s for ~60k docs there);
    kept for parity and small targeted writes. A 409 (stale rev) is
    counted as a conflict, not fatal — the round trip delivers the
    winning rev. Returns ``{"docs", "conflicts"}``."""

    def _put_partition(rows: Iterator) -> Iterator[tuple]:
        from couch_to_postgres_spark.sources.couchdb import CouchClient, urllib_transport

        client = CouchClient(couch_url, transport=transport or urllib_transport())
        n = conflicts = 0
        for row in rows:
            doc = json.loads(row["doc"])
            doc_id = row["id"]
            status, _ = client.put_doc(database, doc_id, doc)
            if status == 409:
                conflicts += 1
            elif status >= 400:
                raise IOError(f"PUT {doc_id} -> {status}")
            else:
                n += 1
        yield (n, conflicts)

    parts = mirror.select("id", "doc").rdd.mapPartitions(_put_partition).collect()
    return {
        "docs": sum(p[0] for p in parts),
        "conflicts": sum(p[1] for p in parts),
    }


def filtered_rereplication(
    mirror: DataFrame,
    predicate_key: str,
    predicate_value: str,
    couch_url: str,
    database: str,
    chunk_size: int = DEFAULT_CHUNK,
    transport=None,
) -> dict:
    """A18 (README.md:648-664): populate a *new* CouchDB database from a
    WHERE-subset of the mirror — poor-man's filtered replication. The
    filter pushes down to the mirror scan; only matching docs travel.
    Returns writeback_bulk's per-chunk status accounting."""
    subset = mirror.filter(json_get("doc", predicate_key) == F.lit(predicate_value))
    return writeback_bulk(subset, couch_url, database, chunk_size, transport)
