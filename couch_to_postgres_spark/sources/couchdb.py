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
import time
import urllib.error
import urllib.request
from dataclasses import dataclass, field
from typing import Callable

Transport = Callable[[str, str, bytes | None, dict], tuple[int, bytes]]
# streaming variant: returns (status, iterator of raw byte chunks) so the
# continuous feed can be consumed incrementally, line by line, while the
# HTTP connection stays open
StreamTransport = Callable[[str, str, bytes | None, dict], tuple[int, object]]

#: reference inactivity timeout: follow's inactivity_ms (lib/index.js:248)
INACTIVITY_MS = 30_000


class CouchError(IOError):
    """HTTP-level CouchDB error with the parsed error/reason payload."""

    def __init__(self, status: int, path: str, error: str | None, reason: str | None):
        super().__init__(f"{path} -> {status} ({error}: {reason})")
        self.status = status
        self.path = path
        self.error = error
        self.reason = reason


class CouchMissingDatabaseError(CouchError):
    """The `no_db_file` surface (reference lib/index.js:267-277): the
    followed database does not exist. NOT retried — the reference emits a
    hard error instead of backoff-looping, and so do we: the daemon
    should surface it, not reconnect forever."""


def urllib_transport(timeout: float = 30.0) -> Transport:
    """Default HTTP transport (stdlib). 30 s default timeout matches the
    reference's inactivity_ms (lib/index.js:248). HTTP error statuses are
    returned as (status, body) — NOT raised — so the client layer can
    classify them (no_db_file vs transient) uniformly across transports."""

    def _send(method: str, url: str, body: bytes | None, headers: dict) -> tuple[int, bytes]:
        req = urllib.request.Request(url, data=body, headers=headers, method=method)
        try:
            with urllib.request.urlopen(req, timeout=timeout) as resp:
                return resp.status, resp.read()
        except urllib.error.HTTPError as e:  # 4xx/5xx with a response body
            with e:
                return e.code, e.read()

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
            error = reason = None
            try:
                payload = json.loads(body)
                error, reason = payload.get("error"), payload.get("reason")
            except (ValueError, AttributeError):
                pass
            # CouchDB's missing-database signature: 404 {"error":
            # "not_found", "reason": "no_db_file"} (also "Database does
            # not exist." on newer servers)
            if status == 404 and (
                reason == "no_db_file"
                or (error == "not_found" and reason and "exist" in reason)
            ):
                raise CouchMissingDatabaseError(status, path, error, reason)
            raise CouchError(status, path, error, reason)
        return json.loads(body)

    def db_info(self, database: str) -> dict:
        """GET /<db> — doc_count etc. (the nagios reconciliation source,
        nagios-check_couch_postgres_count:14)."""
        return self._get_json(f"/{database}")

    def changes(
        self,
        database: str,
        since: int = 0,
        limit: int = 1000,
        feed: str | None = None,
        timeout_ms: int | None = None,
    ) -> dict:
        """One `_changes` page with docs included (lib/index.js:50-53).
        Returns {'results': [{seq, id, deleted?, doc}...], 'last_seq': n}.

        ``feed="longpoll"`` holds the HTTP connection until a change
        arrives or ``timeout_ms`` elapses (server-side) — steady-state
        delivery latency becomes change-arrival-bound instead of
        poll-interval-bound, the reference's continuous-follow property
        re-expressed for a pull engine."""
        url = f"/{database}/_changes?include_docs=true&since={since}&limit={limit}"
        if feed is not None:
            url += f"&feed={feed}"
        if timeout_ms is not None:
            url += f"&timeout={timeout_ms}"
        return self._get_json(url)

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


def urllib_stream_transport(timeout: float = 40.0) -> StreamTransport:
    """Streaming HTTP transport for ``feed=continuous``: returns the
    status plus a chunk iterator over the open response body (``read1``
    — yields whatever bytes are available instead of blocking for a full
    buffer, which is what makes mid-stream incremental delivery work).
    The socket ``timeout`` is the dead-server guard: the server ends an
    idle continuous feed itself after its `timeout` window (last_seq
    line + close), so a read blocking longer than that means the
    connection is wedged and the caller should reconnect."""

    def _send(method: str, url: str, body: bytes | None, headers: dict):
        req = urllib.request.Request(url, data=body, headers=headers, method=method)
        try:
            resp = urllib.request.urlopen(req, timeout=timeout)
        except urllib.error.HTTPError as e:  # 4xx/5xx: whole body at once
            with e:
                return e.code, iter([e.read()])

        def _chunks():
            # The `with resp` closes the socket when the generator is
            # exhausted OR closed — callers that break out early (e.g. the
            # continuous reader's `limit` path) must call .close() on this
            # generator (generator .close() raises GeneratorExit inside the
            # with-block, releasing the socket deterministically instead of
            # waiting for GC — refcounting happens to save CPython, but not
            # other runtimes or long-lived references).
            with resp:
                while True:
                    chunk = resp.read1(65536)
                    if not chunk:
                        return
                    yield chunk

        return resp.status, _chunks()

    return _send


def _iter_lines(chunks):
    """Newline-split an incremental chunk stream — each yielded item is
    one complete feed line (heartbeats are empty lines)."""
    buf = b""
    for chunk in chunks:
        buf += chunk
        while b"\n" in buf:
            line, buf = buf.split(b"\n", 1)
            yield line
    if buf:
        yield buf


def reconnect_backoff_seconds(
    rng: random.Random | None = None,
    min_s: float = 10.0,
    max_s: float = 60.0,
) -> float:
    """Randomized 10-60 s reconnect backoff (lib/index.js:225-229,267-273):
    avoids a thundering herd of executors re-connecting after a CouchDB
    restart. ``min_s``/``max_s`` exist for tests and for deployments that
    tune the window — the default IS the reference's."""
    r = rng or random
    return min_s + r.random() * (max_s - min_s)


def _changes_page_with_retry(
    client: CouchClient,
    database: str,
    since: int,
    limit: int,
    feed: str | None,
    timeout_ms: int | None,
    max_attempts: int,
    backoff_min_s: float,
    backoff_max_s: float,
    sleep: Callable[[float], None],
    rng: random.Random | None,
) -> dict:
    """One `_changes` request with the reference's reconnect discipline:
    transient transport errors back off 10-60 s (randomized) and retry
    up to ``max_attempts``; a missing database raises immediately
    (no_db_file is a configuration error, not an outage)."""
    attempt = 0
    while True:
        attempt += 1
        try:
            return client.changes(
                database, since=since, limit=limit, feed=feed, timeout_ms=timeout_ms
            )
        except CouchMissingDatabaseError:
            raise
        except (OSError, ValueError):  # connection refused/reset, bad body
            if attempt >= max_attempts:
                raise
            sleep(reconnect_backoff_seconds(rng, backoff_min_s, backoff_max_s))


def poll_changes_to_rows(
    client: CouchClient,
    database: str,
    since: int = 0,
    limit: int = 1000,
    max_pages: int = 100,
    feed: str | None = None,
    inactivity_ms: int = INACTIVITY_MS,
    max_attempts: int = 1,
    backoff_min_s: float = 10.0,
    backoff_max_s: float = 60.0,
    sleep: Callable[[float], None] = time.sleep,
    rng: random.Random | None = None,
) -> tuple[list[tuple], int]:
    """Drain `_changes` pages into CHANGES_SCHEMA tuples
    ``(seq, id, deleted, doc)`` and return (rows, last_seq). The micro-batch
    ingest path: the daemon turns each drain into one batch for
    ``apply_changes``; `limit` bounds the page (A2 admission control).

    ``feed="longpoll"`` applies to the FIRST page only: it blocks until a
    change arrives or ``inactivity_ms`` elapses (the reference's
    inactivity window, lib/index.js:248); once data is flowing the
    backlog drains with plain pages at full speed. ``max_attempts`` > 1
    turns on the 10-60 s randomized reconnect backoff per page request."""
    rows: list[tuple] = []
    for page_no in range(max_pages):
        page = _changes_page_with_retry(
            client,
            database,
            since,
            limit,
            feed if page_no == 0 else None,
            inactivity_ms if (feed is not None and page_no == 0) else None,
            max_attempts,
            backoff_min_s,
            backoff_max_s,
            sleep,
            rng,
        )
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


def continuous_changes_to_rows(
    client: CouchClient,
    database: str,
    since: int = 0,
    limit: int = 1000,
    inactivity_ms: int = INACTIVITY_MS,
    max_attempts: int = 1,
    backoff_min_s: float = 10.0,
    backoff_max_s: float = 60.0,
    sleep: Callable[[float], None] = time.sleep,
    rng: random.Random | None = None,
    stream_transport: StreamTransport | None = None,
) -> tuple[list[tuple], int]:
    """Drain one `feed=continuous` connection into CHANGES_SCHEMA tuples
    ``(seq, id, deleted, doc)`` — the reference's actual transport
    (`follow` consumes the continuous streaming feed, lib/index.js:50-53)
    beside the longpoll mode.

    One HTTP connection streams newline-delimited change lines as they
    happen; lines are consumed INCREMENTALLY (a change written mid-stream
    is parsed without waiting for the response to end). The server closes
    the feed after ``inactivity_ms`` with a ``{"last_seq": n}`` line
    (follow's inactivity window, lib/index.js:248); ``limit`` bounds the
    batch (A2 admission control — the server closes after `limit`
    results). Same (rows, last_seq) contract as
    :func:`poll_changes_to_rows`, so the micro-batch pipeline treats the
    transports interchangeably; at-least-once holds because the caller's
    checkpoint only advances to the returned last_seq.

    Failure discipline: errors BEFORE any data arrives back off 10-60 s
    randomized and retry up to ``max_attempts`` (reference
    lib/index.js:225-229); a wedged connection (read blocking past the
    dead-server guard) or a mid-stream drop returns what was accumulated
    — the next connection resumes from the advanced ``since``. A missing
    database raises immediately (no_db_file, lib/index.js:267-277)."""
    transport = stream_transport or urllib_stream_transport(
        timeout=inactivity_ms / 1000.0 + 10.0
    )
    attempt = 0
    while True:
        attempt += 1
        rows: list[tuple] = []
        last = since
        try:
            url = (
                f"{client.url}/{database}/_changes?include_docs=true"
                f"&feed=continuous&since={since}&limit={limit}"
                f"&timeout={inactivity_ms}"
            )
            status, chunks = transport("GET", url, None, client._headers())
            if status >= 400:
                body = b"".join(chunks)
                error = reason = None
                try:
                    payload = json.loads(body)
                    error, reason = payload.get("error"), payload.get("reason")
                except (ValueError, AttributeError):
                    pass
                path = f"/{database}/_changes"
                if status == 404 and (
                    reason == "no_db_file"
                    or (error == "not_found" and reason and "exist" in reason)
                ):
                    raise CouchMissingDatabaseError(status, path, error, reason)
                raise CouchError(status, path, error, reason)
            # try/finally releases the streaming socket DETERMINISTICALLY on
            # every early exit (limit break, last_seq break, mid-stream
            # error raise/return): generator .close() triggers the
            # transport's `with resp` teardown; without it the socket
            # lingers until GC (fine on CPython refcounting, a connection
            # leak under other runtimes or long-lived references).
            try:
                for line in _iter_lines(chunks):
                    if not line.strip():
                        continue  # heartbeat newline
                    obj = json.loads(line)
                    if "last_seq" in obj and "id" not in obj:
                        ls = obj["last_seq"]
                        last = int(ls) if not isinstance(ls, int) else ls
                        break
                    if "error" in obj and "id" not in obj:
                        # mid-stream error object (e.g. the db was deleted
                        # while the feed was open). Classify like HTTP-level
                        # errors: a vanished db is a hard config error; other
                        # errors surface as CouchError — caught below, where
                        # accumulated rows are still returned first via the
                        # partial-return path on the NEXT connection.
                        path = f"/{database}/_changes"
                        if obj.get("reason") == "no_db_file" or (
                            obj.get("error") == "not_found"
                            and obj.get("reason")
                            and "exist" in obj["reason"]
                        ):
                            raise CouchMissingDatabaseError(
                                404, path, obj.get("error"), obj.get("reason")
                            )
                        if rows:
                            return rows, last
                        raise CouchError(
                            500, path, obj.get("error"), obj.get("reason")
                        )
                    if "id" not in obj or obj.get("seq") is None:
                        continue  # unknown frame type: tolerate, don't crash
                    seq = obj.get("seq")
                    seq = int(seq) if not isinstance(seq, int) else seq
                    doc = obj.get("doc")
                    rows.append(
                        (
                            seq,
                            obj["id"],
                            bool(obj.get("deleted", False)),
                            json.dumps(doc, separators=(",", ":"))
                            if doc is not None
                            else None,
                        )
                    )
                    last = max(last, seq)
                    if len(rows) >= limit:
                        break
                return rows, last
            finally:
                close = getattr(chunks, "close", None)
                if close is not None:
                    close()
        except CouchMissingDatabaseError:
            raise
        except CouchError:
            if attempt >= max_attempts:
                raise
            sleep(reconnect_backoff_seconds(rng, backoff_min_s, backoff_max_s))
        except (OSError, ValueError):
            # connection refused/reset/wedged or a torn JSON line. With
            # data in hand, return it (at-least-once; next connection
            # resumes from the checkpoint) — only a data-less failure
            # burns a retry attempt.
            if rows:
                return rows, last
            if attempt >= max_attempts:
                raise
            sleep(reconnect_backoff_seconds(rng, backoff_min_s, backoff_max_s))
