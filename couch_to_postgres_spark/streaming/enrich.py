"""Stream-static enrichment: join a change/event stream against a slowly
changing dimension table (the lookup-table pattern the reference pushes
into Postgres-side joins after replication, README.md:664 — here it
happens inline, per micro-batch, before the sink).

Semantics (Spark stream-static join): the static side is re-planned per
micro-batch, so swapping the dim's underlying files between batches is
picked up — the cheap way to keep a slowly-changing lookup fresh without
restarting the query.

Scale notes: the dim is broadcast by default — a per-executor hash map,
zero shuffle on the unbounded stream side, which is the only plan that
holds when the stream side is 100 TB/day. ``broadcast_dim=False`` opts
into a shuffled join for dims too big to broadcast; at that size prefer
pre-bucketing both sides on the key instead.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_stream(
    stream: DataFrame,
    dim: DataFrame,
    on: str | Sequence[str],
    how: str = "left",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Enrich each stream row with dim columns via a stream-static join.

    ``how`` is ``left`` by default: enrichment must never drop stream
    rows just because the dim hasn't caught up (late dim rows surface as
    NULLs to be backfilled, not as silent data loss). Works identically
    on a batch frame, which is how tests oracle it.
    """
    d = F.broadcast(dim) if broadcast_dim else dim
    return stream.join(d, on, how)
