"""Operate the engine like the reference daemon — against a LIVE (here:
in-process stand-in) CouchDB over HTTP, end to end:

registry row (url + longpoll) → Daemon.find_feeds → format("couchdb")
stream → partitioned O(touched) mirror → /_status with layout health →
hash-pruned point lookup → integrity fsck.

Run: python examples/live_daemon_operations.py
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from couch_to_postgres_spark.session import get_spark  # noqa: E402
from couch_to_postgres_spark.streaming.daemon import (  # noqa: E402
    Daemon,
    FeedConfig,
    save_registry,
)
from couch_to_postgres_spark.streaming.partitioned import (  # noqa: E402
    point_lookup_partitioned,
    validate_mirror,
)


def tiny_couch(docs: list[dict]) -> tuple[ThreadingHTTPServer, str]:
    """A minimal `_changes`-serving HTTP server (one page, then empty)."""
    pages = [
        {
            "results": [
                {"seq": i + 1, "id": d["_id"], "doc": d}
                for i, d in enumerate(docs)
            ],
            "last_seq": len(docs),
        }
    ]
    lock = threading.Lock()

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):  # noqa: N802
            with lock:
                page = pages.pop(0) if pages else {"results": [], "last_seq": len(docs)}
            body = json.dumps(page).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    return server, f"http://127.0.0.1:{server.server_address[1]}"


def main() -> None:
    spark = get_spark(app_name="live-daemon-example", cpus=8)
    work = tempfile.mkdtemp(prefix="live_daemon_")
    docs = [
        {"_id": f"doc{i}", "_rev": f"1-{i:08x}", "kind": "article", "words": i * 10}
        for i in range(200)
    ]
    server, url = tiny_couch(docs)

    # 1. registry row pointing at the live server, longpoll transport
    registry = os.path.join(work, "registry.json")
    save_registry(
        registry,
        [FeedConfig(name="articles", url=url, feed="longpoll", inactivity_ms=500)],
    )

    # 2. daemon discovers and drains the feed into the partitioned mirror
    daemon = Daemon(spark, registry, os.path.join(work, "data"))
    started = daemon.find_feeds()
    print("feeds started:", started)
    daemon.await_all()

    # 3. operator's view: /_status payload incl. layout health
    st = daemon.status()["articles"]
    print("doc_count:", st["doc_count"], "| layout:", st["layout"])

    # 4. hash-pruned point lookup (one bucket directory scanned)
    mirror = daemon.mirror_path(FeedConfig(name="articles", changes_path=""))
    row = point_lookup_partitioned(spark, mirror, "doc42").head()
    print("point lookup doc42 ->", json.loads(row["doc"])["words"], "words")

    # 5. integrity fsck before trusting pruned reads in anger
    print("fsck:", validate_mirror(spark, mirror))

    daemon.stop_all()
    server.shutdown()
    spark.stop()


if __name__ == "__main__":
    main()
