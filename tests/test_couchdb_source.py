"""The format("couchdb") data source: batch drain, streaming micro-batches
with checkpoint resume, end-to-end into the CDC merge."""

import pytest

from couch_to_postgres_spark.sources.couchdb_source import register
from couch_to_postgres_spark.streaming.pipeline import read_mirror, upsert_mirror
from tests.test_writeback import RecordingCouch


@pytest.fixture
def couch():
    c = RecordingCouch()
    yield c
    c.close()


def page(results, last_seq):
    return {"results": results, "last_seq": last_seq}


PAGES = [
    page(
        [
            {"seq": 1, "id": "a", "doc": {"_id": "a", "_rev": "1-x", "v": 1}},
            {"seq": 2, "id": "b", "doc": {"_id": "b", "_rev": "1-y", "v": 2}},
        ],
        2,
    ),
    page(
        [
            {"seq": 3, "id": "a", "doc": {"_id": "a", "_rev": "2-z", "v": 10}},
            {"seq": 4, "id": "c", "deleted": True},
        ],
        4,
    ),
]


def test_batch_read(spark, couch):
    register(spark)
    couch.changes_pages = list(PAGES)
    df = (
        spark.read.format("couchdb")
        .option("url", couch.url)
        .option("database", "db")
        .load()
    )
    rows = {r["seq"]: (r["id"], r["deleted"]) for r in df.collect()}
    assert rows == {1: ("a", False), 2: ("b", False), 3: ("a", False), 4: ("c", True)}
    assert [f.name for f in df.schema.fields] == ["seq", "id", "deleted", "doc"]


def test_stream_to_mirror_with_resume(spark, couch, tmp_path):
    register(spark)
    couch.changes_pages = [PAGES[0]]

    def run_query():
        stream = (
            spark.readStream.format("couchdb")
            .option("url", couch.url)
            .option("database", "db")
            .load()
        )
        return (
            stream.writeStream.foreachBatch(
                lambda batch, _eid: upsert_mirror(
                    batch.sparkSession, str(tmp_path / "mirror"), batch
                )
            )
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )

    q = run_query()
    q.awaitTermination(120)
    state = {r["id"] for r in read_mirror(spark, str(tmp_path / "mirror")).collect()}
    assert state == {"a", "b"}

    # more changes appear; restart from the same checkpoint
    couch.changes_pages = [PAGES[1]]
    q2 = run_query()
    q2.awaitTermination(120)
    mirror = read_mirror(spark, str(tmp_path / "mirror"))
    state2 = {r["id"]: r["doc"] for r in mirror.collect()}
    assert set(state2) == {"a", "b"}  # c deleted before ever landing
    assert '"2-z"' in state2["a"]  # the rev-2 update applied
