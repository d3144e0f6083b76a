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
from typing import Iterator

from pyspark.sql import DataFrame

from couch_to_postgres_spark.functions.json import json_get
from pyspark.sql import functions as F

# bounds documented at reference README.md:530
MIN_CHUNK, MAX_CHUNK, DEFAULT_CHUNK = 50, 500, 200


def writeback_bulk(
    mirror: DataFrame,
    couch_url: str,
    database: str,
    chunk_size: int = DEFAULT_CHUNK,
    transport=None,
) -> int:
    """POST every doc of ``mirror`` to ``database`` via chunked
    `_bulk_docs` (A17). Returns the number of chunks sent.

    Echo suppression needs no code here: CouchDB assigns new revs, the
    changes feed replays them, and the CDC merge's rev compare turns the
    replay into NOOPs (reference lib/index.js:110-128).
    """
    chunk_size = max(MIN_CHUNK, min(MAX_CHUNK, chunk_size))

    def _post_partition(rows: Iterator) -> Iterator[tuple[int]]:
        # imports inside the task: runs on executors
        from couch_to_postgres_spark.sources.couchdb import CouchClient, urllib_transport

        client = CouchClient(
            couch_url, transport=transport or urllib_transport()
        )
        sent = 0
        batch: list[dict] = []
        for row in rows:
            batch.append(json.loads(row["doc"]))
            if len(batch) >= chunk_size:
                status, _ = client.bulk_docs(database, batch)
                if status >= 400:
                    raise IOError(f"_bulk_docs -> {status}")
                sent += 1
                batch = []
        if batch:
            status, _ = client.bulk_docs(database, batch)
            if status >= 400:
                raise IOError(f"_bulk_docs -> {status}")
            sent += 1
        yield (sent,)

    # mapPartitions (not foreachPartition) so chunk counts come back as data
    counts = mirror.select("doc").rdd.mapPartitions(_post_partition).collect()
    return sum(c[0] for c in counts)


def writeback_single_put(
    mirror: DataFrame,
    couch_url: str,
    database: str,
    transport=None,
) -> int:
    """One HTTP PUT per doc — the reference's trigger path (A16,
    README.md:336-352). Slow by design (475 s for ~60k docs there);
    kept for parity and small targeted writes. Returns docs sent."""

    def _put_partition(rows: Iterator) -> Iterator[tuple[int]]:
        from couch_to_postgres_spark.sources.couchdb import CouchClient, urllib_transport

        client = CouchClient(couch_url, transport=transport or urllib_transport())
        n = 0
        for row in rows:
            doc = json.loads(row["doc"])
            doc_id = row["id"]
            status, _ = client.put_doc(database, doc_id, doc)
            if status >= 400:
                raise IOError(f"PUT {doc_id} -> {status}")
            n += 1
        yield (n,)

    counts = mirror.select("id", "doc").rdd.mapPartitions(_put_partition).collect()
    return sum(c[0] for c in counts)


def filtered_rereplication(
    mirror: DataFrame,
    predicate_key: str,
    predicate_value: str,
    couch_url: str,
    database: str,
    chunk_size: int = DEFAULT_CHUNK,
    transport=None,
) -> int:
    """A18 (README.md:648-664): populate a *new* CouchDB database from a
    WHERE-subset of the mirror — poor-man's filtered replication. The
    filter pushes down to the mirror scan; only matching docs travel."""
    subset = mirror.filter(json_get("doc", predicate_key) == F.lit(predicate_value))
    return writeback_bulk(subset, couch_url, database, chunk_size, transport)
