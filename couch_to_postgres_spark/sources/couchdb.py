"""CouchDB HTTP client for the `_changes` feed and `_bulk_docs` endpoint
(SURVEY.md §2A A1, A16-A17).

Pure-stdlib (urllib) with an injectable ``transport`` so tests run without
a CouchDB server: ``transport(method, url, body, headers) -> (status,
body_bytes)``. The reference consumes `_changes` via the `follow` library
(lib/index.js:50-53) with ``include_docs=true``, resumable ``since``,
inactivity timeout 30 s (lib/index.js:248) and randomized 10-60 s
reconnect backoff (lib/index.js:225-229,267-273) — the client mirrors
those knobs.
"""

from __future__ import annotations

import base64
import json
import random
import urllib.request
from dataclasses import dataclass, field
from typing import Callable

Transport = Callable[[str, str, bytes | None, dict], tuple[int, bytes]]


def urllib_transport(timeout: float = 30.0) -> Transport:
    """Default HTTP transport (stdlib). 30 s default timeout matches the
    reference's inactivity_ms (lib/index.js:248)."""

    def _send(method: str, url: str, body: bytes | None, headers: dict) -> tuple[int, bytes]:
        req = urllib.request.Request(url, data=body, headers=headers, method=method)
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            return resp.status, resp.read()

    return _send


@dataclass
class CouchClient:
    """Minimal CouchDB API surface the engine needs."""

    url: str  # e.g. http://127.0.0.1:5984
    username: str | None = None
    password: str | None = None
    transport: Transport = field(default_factory=urllib_transport)

    def _headers(self) -> dict:
        h = {"Content-Type": "application/json"}
        if self.username is not None:
            # Basic auth header exactly as the reference builds it
            # (lib/index.js startFollowing auth option)
            token = base64.b64encode(
                f"{self.username}:{self.password or ''}".encode()
            ).decode()
            h["Authorization"] = f"Basic {token}"
        return h

    def _get_json(self, path: str) -> dict:
        status, body = self.transport("GET", f"{self.url}{path}", None, self._headers())
        if status >= 400:
            raise IOError(f"GET {path} -> {status}")
        return json.loads(body)

    def db_info(self, database: str) -> dict:
        """GET /<db> — doc_count etc. (the nagios reconciliation source,
        nagios-check_couch_postgres_count:14)."""
        return self._get_json(f"/{database}")

    def changes(self, database: str, since: int = 0, limit: int = 1000) -> dict:
        """One `_changes` page with docs included (lib/index.js:50-53).
        Returns {'results': [{seq, id, deleted?, doc}...], 'last_seq': n}."""
        return self._get_json(
            f"/{database}/_changes?include_docs=true&since={since}&limit={limit}"
        )

    def bulk_docs(self, database: str, docs: list[dict]) -> tuple[int, bytes]:
        """POST /<db>/_bulk_docs — the chunked writeback endpoint
        (reference README.md:513-530)."""
        body = json.dumps({"docs": docs}).encode()
        return self.transport(
            "POST", f"{self.url}/{database}/_bulk_docs", body, self._headers()
        )

    def put_doc(self, database: str, doc_id: str, doc: dict) -> tuple[int, bytes]:
        """Single-doc PUT — the couchdb_put trigger path
        (reference README.md:336-352)."""
        body = json.dumps(doc).encode()
        return self.transport(
            "PUT", f"{self.url}/{database}/{doc_id}", body, self._headers()
        )


def reconnect_backoff_seconds(rng: random.Random | None = None) -> float:
    """Randomized 10-60 s reconnect backoff (lib/index.js:225-229,267-273):
    avoids a thundering herd of executors re-connecting after a CouchDB
    restart."""
    r = rng or random
    return 10.0 + r.random() * 50.0


def poll_changes_to_rows(
    client: CouchClient,
    database: str,
    since: int = 0,
    limit: int = 1000,
    max_pages: int = 100,
) -> tuple[list[tuple], int]:
    """Drain `_changes` pages into CHANGES_SCHEMA tuples
    ``(seq, id, deleted, doc)`` and return (rows, last_seq). The micro-batch
    ingest path: the daemon turns each drain into one batch for
    ``apply_changes``; `limit` bounds the page (A2 admission control)."""
    rows: list[tuple] = []
    for _ in range(max_pages):
        page = client.changes(database, since=since, limit=limit)
        results = page.get("results", [])
        for ch in results:
            seq = ch.get("seq")
            seq = int(seq) if not isinstance(seq, int) else seq
            doc = ch.get("doc")
            rows.append(
                (
                    seq,
                    ch["id"],
                    bool(ch.get("deleted", False)),
                    json.dumps(doc, separators=(",", ":")) if doc is not None else None,
                )
            )
        if not results:
            # empty page: keep the accumulated high-water mark (an empty
            # feed reports last_seq for ITS window, not the stream's)
            return rows, since
        last = page.get("last_seq", since)
        last = int(last) if not isinstance(last, int) else last
        if last == since:
            return rows, since
        since = last
    return rows, since
