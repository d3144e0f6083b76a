"""CouchDB-HTTP → change-log bridge: the glue that makes a real CouchDB
`_changes` feed drive the streaming pipeline (SURVEY.md §2A A1 + A8/A9).

The Structured Streaming file source owns offsets/resume; this bridge owns
the HTTP side: drain pages from ``since``, append them as JSON-lines files
to the feed's change-log directory, and persist the HTTP high-water mark in
a sidecar state file (the `since_checkpoints` row of the HTTP leg —
distinct from the streaming query's own checkpointLocation, which tracks
*file* offsets; together they reproduce the reference's two-level
since-tracking, lib/index.js:62-94 + bin/index.js:76-104).

Drains are append-only and atomically renamed into place, so a crash
between write and state update replays a window of changes — which the
rev-compare merge absorbs (at-least-once end to end).
"""

from __future__ import annotations

import json
import os
import time

from couch_to_postgres_spark.sources.couchdb import (
    CouchClient,
    poll_changes_to_rows,
    reconnect_backoff_seconds,
)


def read_since(state_path: str) -> int:
    """Bootstrap: stored high-water mark, or 0 on first run
    (get_initial_since, bin/index.js:76-104)."""
    if os.path.exists(state_path):
        with open(state_path) as f:
            return int(json.load(f)["since"])
    return 0


def write_since(state_path: str, since: int) -> None:
    tmp = state_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"since": since, "updated_at": time.time()}, f)
    os.replace(tmp, state_path)


def drain_once(
    client: CouchClient,
    database: str,
    log_dir: str,
    state_path: str,
    page_limit: int = 1000,
) -> int:
    """One HTTP drain: fetch all pages past `since`, append ONE atomic
    JSON-lines file to the change log, advance the state. Returns the
    number of changes written."""
    since = read_since(state_path)
    rows, last_seq = poll_changes_to_rows(client, database, since=since, limit=page_limit)
    if not rows:
        return 0
    os.makedirs(log_dir, exist_ok=True)
    fname = f"changes-{last_seq:020d}-{int(time.time() * 1000)}.json"
    tmp_path = os.path.join(log_dir, "." + fname + ".tmp")
    final_path = os.path.join(log_dir, fname)
    with open(tmp_path, "w") as f:
        for seq, doc_id, deleted, doc in rows:
            f.write(
                json.dumps(
                    {"seq": seq, "id": doc_id, "deleted": deleted, "doc": doc},
                    separators=(",", ":"),
                )
                + "\n"
            )
    os.replace(tmp_path, final_path)
    write_since(state_path, last_seq)
    return len(rows)


def drain_loop(
    client: CouchClient,
    database: str,
    log_dir: str,
    state_path: str,
    poll_seconds: float = 3.0,
    max_iterations: int | None = None,
    stop_check=None,
) -> int:
    """Continuous drain with reconnect backoff (lib/index.js:225-229):
    HTTP errors back off 10-60 s randomized instead of hot-looping.
    Returns total changes written. ``max_iterations``/``stop_check`` bound
    the loop for tests and supervised runs."""
    total = 0
    i = 0
    while max_iterations is None or i < max_iterations:
        i += 1
        if stop_check is not None and stop_check():
            break
        try:
            n = drain_once(client, database, log_dir, state_path)
            total += n
            if n == 0:
                time.sleep(poll_seconds)
        except IOError:
            time.sleep(min(reconnect_backoff_seconds(), poll_seconds * 2))
    return total
