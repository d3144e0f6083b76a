"""Writeback sink tests (A16-A18) against a real local HTTP server that
records requests — the full executor→HTTP path with the stdlib transport."""

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest
from pyspark.sql import functions as F

from couch_to_postgres_spark.operators.mirror import docs_mirror
from couch_to_postgres_spark.sinks.writeback import (
    filtered_rereplication,
    writeback_bulk,
    writeback_single_put,
)
from couch_to_postgres_spark.sources.couchdb import CouchClient, poll_changes_to_rows


class RecordingCouch:
    """Tiny in-memory CouchDB-ish server: records _bulk_docs and PUT
    bodies; serves a canned _changes feed. Fault injection for the
    transport tests: ``fail_changes`` N 500s before success,
    ``missing_db`` the no_db_file 404, and a real longpoll simulation
    (feed=longpoll requests hold until a page is added or the request's
    timeout elapses)."""

    def __init__(self):
        import time as _time
        import urllib.parse as _parse

        self.bulk_batches: list[list[dict]] = []
        self.puts: list[tuple[str, dict]] = []
        self.changes_pages: list[dict] = []
        self.changes_requests: list[str] = []
        self.fail_changes = 0
        self.fail_bulk = 0
        self.conflict_doc_ids: set[str] = set()
        self.missing_db = False
        self.lock = threading.Lock()
        self.data_event = threading.Event()
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def _read_body(self):
                n = int(self.headers.get("Content-Length", 0))
                return json.loads(self.rfile.read(n)) if n else None

            def _reply(self, obj, status=201):
                body = json.dumps(obj).encode()
                self.send_response(status)
                self.send_header("Content-Type", "application/json")
                self.end_headers()
                self.wfile.write(body)

            def do_POST(self):  # noqa: N802
                if self.path.endswith("/_bulk_docs"):
                    with outer.lock:
                        if outer.fail_bulk > 0:
                            outer.fail_bulk -= 1
                            self._reply({"error": "internal_error"}, 500)
                            return
                    docs = self._read_body()["docs"]
                    results = []
                    accepted = []
                    for d in docs:
                        did = d.get("_id", d.get("doc_id"))
                        if str(did) in outer.conflict_doc_ids:
                            # CouchDB's per-doc conflict shape inside a 201
                            results.append(
                                {
                                    "id": str(did),
                                    "error": "conflict",
                                    "reason": "Document update conflict.",
                                }
                            )
                        else:
                            accepted.append(d)
                            results.append({"ok": True, "id": str(did)})
                    with outer.lock:
                        outer.bulk_batches.append(accepted)
                    self._reply(results)
                else:
                    self._reply({"error": "not_found"}, 404)

            def do_PUT(self):  # noqa: N802
                doc_id = self.path.rsplit("/", 1)[-1]
                with outer.lock:
                    outer.puts.append((doc_id, self._read_body()))
                self._reply({"ok": True, "id": doc_id})

            def do_GET(self):  # noqa: N802
                if "/_changes" in self.path:
                    with outer.lock:
                        outer.changes_requests.append(self.path)
                        if outer.missing_db:
                            self._reply(
                                {"error": "not_found", "reason": "no_db_file"},
                                404,
                            )
                            return
                        if outer.fail_changes > 0:
                            outer.fail_changes -= 1
                            self._reply({"error": "internal_error"}, 500)
                            return
                    q = _parse.parse_qs(_parse.urlparse(self.path).query)
                    if q.get("feed") == ["continuous"]:
                        # streaming newline-delimited change lines, written
                        # incrementally while the connection stays open;
                        # the inactivity window resets on each write and
                        # the feed ends with a last_seq line (CouchDB
                        # continuous-feed semantics)
                        timeout_ms = int(q.get("timeout", ["30000"])[0])
                        lim = int(q.get("limit", ["1000"])[0])
                        last_seq = int(q.get("since", ["0"])[0])
                        self.send_response(200)
                        self.send_header("Content-Type", "application/json")
                        self.end_headers()
                        sent = 0
                        deadline = _time.time() + timeout_ms / 1000.0
                        while _time.time() < deadline and sent < lim:
                            page = None
                            with outer.lock:
                                if outer.changes_pages:
                                    page = outer.changes_pages.pop(0)
                            if page is None:
                                outer.data_event.wait(0.02)
                                continue
                            wrote_error = False
                            for ch in page.get("results", []):
                                self.wfile.write(
                                    (json.dumps(ch) + "\n").encode()
                                )
                                if "error" in ch and "id" not in ch:
                                    wrote_error = True
                                else:
                                    sq = ch.get("seq", last_seq)
                                    last_seq = max(last_seq, int(sq))
                                sent += 1
                            self.wfile.flush()
                            if wrote_error:
                                # a real CouchDB error line TERMINATES the
                                # continuous feed (no last_seq follows) —
                                # and closing here also stops this handler
                                # from stealing pages meant for the
                                # client's retry connection
                                return
                            deadline = _time.time() + timeout_ms / 1000.0
                        self.wfile.write(
                            (json.dumps({"last_seq": last_seq}) + "\n").encode()
                        )
                        return
                    if q.get("feed") == ["longpoll"]:
                        timeout_ms = int(q.get("timeout", ["30000"])[0])
                        deadline = _time.time() + timeout_ms / 1000.0
                        while _time.time() < deadline:
                            with outer.lock:
                                if outer.changes_pages:
                                    break
                            outer.data_event.wait(0.02)
                    with outer.lock:
                        page = (
                            outer.changes_pages.pop(0)
                            if outer.changes_pages
                            else {"results": [], "last_seq": 0}
                        )
                    self._reply(page, 200)
                else:
                    self._reply({"doc_count": 0}, 200)

            def log_message(self, *args):
                pass

        self.server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.port = self.server.server_address[1]
        threading.Thread(target=self.server.serve_forever, daemon=True).start()

    def add_page(self, page: dict) -> None:
        """Enqueue a page and wake any in-flight longpoll."""
        with self.lock:
            self.changes_pages.append(page)
        self.data_event.set()

    @property
    def url(self):
        return f"http://127.0.0.1:{self.port}"

    def close(self):
        self.server.shutdown()


@pytest.fixture
def couch():
    c = RecordingCouch()
    yield c
    c.close()


def test_bulk_writeback_chunks(spark, sf_dir, couch):
    mirror = docs_mirror(spark, sf_dir).coalesce(2)  # 500 docs, 2 partitions
    stats = writeback_bulk(mirror, couch.url, "target", chunk_size=50)
    assert stats["chunks"] == len(couch.bulk_batches)
    assert stats["docs"] == 500
    assert stats["conflicts"] == 0 and stats["retries"] == 0
    sizes = [len(b) for b in couch.bulk_batches]
    assert all(s <= 50 for s in sizes)
    assert sum(sizes) == 500
    seen = {str(d["doc_id"]) for b in couch.bulk_batches for d in b}
    assert len(seen) == 500


def test_bulk_chunk_size_clamped_to_reference_bounds(spark, sf_dir, couch):
    """Chunk 1000 timed out in the reference (README.md:530): clamp to 500."""
    mirror = docs_mirror(spark, sf_dir).coalesce(1)
    writeback_bulk(mirror, couch.url, "target", chunk_size=5000)
    assert max(len(b) for b in couch.bulk_batches) == 500


def test_single_put_writeback(spark, sf_dir, couch):
    mirror = docs_mirror(spark, sf_dir).filter(F.col("id").cast("long") < 20)
    stats = writeback_single_put(mirror, couch.url, "target")
    assert stats == {"docs": 20, "conflicts": 0} and len(couch.puts) == 20
    ids = {doc_id for doc_id, _ in couch.puts}
    assert ids == {str(i) for i in range(20)}


def test_filtered_rereplication(spark, sf_dir, couch):
    """A18: only the WHERE-subset reaches the new database."""
    mirror = docs_mirror(spark, sf_dir)
    expected = mirror.filter(
        F.get_json_object("doc", "$.source") == "src1"
    ).count()
    filtered_rereplication(mirror, "source", "src1", couch.url, "newdb")
    sent = sum(len(b) for b in couch.bulk_batches)
    assert sent == expected > 0
    assert all(d["source"] == "src1" for b in couch.bulk_batches for d in b)


def test_bulk_conflicts_surfaced_not_fatal(spark, sf_dir, couch):
    """Per-doc conflicts inside a 201 response (the CouchDB shape,
    reference README.md:534-546) are counted and reported — the
    non-conflicted docs still land, nothing raises."""
    couch.conflict_doc_ids = {"3", "7", "11"}
    mirror = docs_mirror(spark, sf_dir).filter(F.col("id").cast("long") < 20)
    stats = writeback_bulk(mirror, couch.url, "target", chunk_size=50)
    assert stats["conflicts"] == 3
    assert sorted(stats["conflict_ids"]) == ["11", "3", "7"]
    landed = {str(d["doc_id"]) for b in couch.bulk_batches for d in b}
    assert landed == {str(i) for i in range(20)} - {"3", "7", "11"}


def test_bulk_transient_500_retries_then_succeeds(spark, sf_dir, couch):
    """A transient 5xx retries the chunk with backoff and the docs land;
    the retry count is surfaced."""
    couch.fail_bulk = 1
    mirror = docs_mirror(spark, sf_dir).filter(F.col("id").cast("long") < 20).coalesce(1)
    stats = writeback_bulk(
        mirror, couch.url, "target", chunk_size=50, retry_backoff_s=0.01
    )
    assert stats["retries"] == 1 and stats["conflicts"] == 0
    assert sum(len(b) for b in couch.bulk_batches) == 20


def test_bulk_persistent_500_raises(spark, sf_dir, couch):
    couch.fail_bulk = 100
    mirror = docs_mirror(spark, sf_dir).filter(F.col("id").cast("long") < 5).coalesce(1)
    with pytest.raises(Exception, match="_bulk_docs"):
        writeback_bulk(
            mirror, couch.url, "target", chunk_size=50,
            max_retries=2, retry_backoff_s=0.01,
        )


def test_changes_polling_client(couch):
    """A1 over HTTP: drain paged _changes into CHANGES_SCHEMA rows."""
    couch.changes_pages = [
        {
            "results": [
                {"seq": 1, "id": "a", "doc": {"_id": "a", "_rev": "1-x", "v": 1}},
                {"seq": 2, "id": "b", "deleted": True},
            ],
            "last_seq": 2,
        },
        {
            "results": [
                {"seq": 3, "id": "a", "doc": {"_id": "a", "_rev": "2-y", "v": 2}}
            ],
            "last_seq": 3,
        },
    ]
    client = CouchClient(couch.url)
    rows, last_seq = poll_changes_to_rows(client, "db", since=0, limit=2)
    assert last_seq == 3 and len(rows) == 3
    assert rows[0][:3] == (1, "a", False) and json.loads(rows[0][3])["v"] == 1
    assert rows[1][:3] == (2, "b", True) and rows[1][3] is None
    assert rows[2][:3] == (3, "a", False)
