"""Corpus mixing: deterministic per-source sampling and repetition.

A training-data pipeline rarely consumes a corpus as-is — it *mixes*
sources at configured rates (downsample the crawl, keep all the books,
repeat the high-quality slice for several epochs). Both operators here are
deterministic functions of (id, salt): the same rows are kept on any
cluster size, any partitioning, any engine — unlike ``df.sample``, which
is seed-and-partitioning dependent. That determinism is what makes a 100 TB
mixing run resumable and auditable (and lets DuckDB oracle it bit-for-bit).

Plan shape: the per-source rate table is a tiny broadcast join; the keep
decision is a pure map (md5 prefix vs threshold) — no shuffle anywhere.
Repetition is ``explode(sequence(...))`` — row-local, no shuffle, and the
generated `epoch` column keeps repeated rows distinguishable downstream.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType

#: the per-group selection key space: first 15 hex chars of the md5 key
#: as an integer — 60 bits, comfortably inside BIGINT for both Spark and
#: any SQL oracle that replays the threshold math.
_KEY_SPACE = 1 << 60


def _topq_bounds(n: int, q: int, mult: float) -> tuple[int, int]:
    """(lo, hi) key-space thresholds bracketing the q-th order statistic
    of ``n`` md5 keys. md5 keys are uniform on [0, _KEY_SPACE) whatever
    the id distribution, so the exact boundary sits at ≈ (q/n)·SPACE
    with binomial spread √(n·p(1-p)); 6σ plus a 64-row absolute slack
    puts the bracket's miss probability far below ever observing it —
    and a miss is CAUGHT by the exact-count verification in
    :func:`_select_topq` (widened and retried), never silently wrong.
    ``mult`` widens the bracket on retry."""
    if q <= 0:
        return (0, 0)
    if q >= n:
        return (_KEY_SPACE, _KEY_SPACE)
    p = q / n
    m = (6.0 * math.sqrt(p * (1.0 - p) / n) + 64.0 / n) * mult
    lo = max(0, int((p - m) * _KEY_SPACE))
    hi = min(_KEY_SPACE, int(math.ceil((p + m) * _KEY_SPACE)))
    return (lo, hi)


def _band_select(j, group_cols, order_cols, band_cond):
    """The boundary-band ranking shared by every threshold-refinement
    selector: rank ONLY the rows inside the bracket band (never the
    corpus) and take each group's remaining quota ``_q - _clo``. With
    empty ``group_cols`` the window is global — safe because the band
    is bracket-bounded, not corpus-sized."""
    from pyspark.sql import Window as W

    w = (
        W.partitionBy(*group_cols).orderBy(*order_cols)
        if group_cols
        else W.orderBy(*order_cols)
    )
    return (
        j.filter(band_cond)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= F.col("_q") - F.col("_clo"))
    )


def _band_cut(j, group_cols, order_cols, keep_cond, band_cond, out_cols):
    """keep-set ∪ band-selected — the common SELECT step of
    :func:`_select_topq`, :func:`cap_per_group_distributed`, and
    :func:`select_topk_by_key`: rows proven inside the cut are kept
    MAP-SIDE (no shuffle), only the band is ranked."""
    return (
        j.filter(keep_cond)
        .select(out_cols)
        .unionByName(
            _band_select(j, group_cols, order_cols, band_cond).select(out_cols)
        )
    )


def _with_keys(df: DataFrame, id_col: str, salt: str) -> DataFrame:
    """Attach the deterministic selection key columns: ``_k`` (md5 of
    salt:id) and ``_kn`` (its first 15 hex chars as a 60-bit int)."""
    key = F.md5(F.concat_ws(":", F.lit(salt), F.col(id_col).cast("string")))
    knum = F.conv(F.substring(key, 1, 15), 16, 10).cast("long")
    return df.withColumn("_k", key).withColumn("_kn", knum)


def _hist_bits(n_groups: int) -> int:
    """Key-space histogram resolution: the finest power-of-two bin count
    whose driver-side result (≤ groups × 2^bits nonempty bins) stays
    within ~1 M collected rows — 1024 bins for the usual handful of
    sources, degrading gracefully for strata-style group counts (the
    bracket stays EXACT at any resolution; coarser bins only widen the
    ranked boundary band toward n/2^bits rows per group)."""
    bits = 10
    while bits > 0 and n_groups << bits > 1_000_000:
        bits -= 1
    return bits


def _collect_key_histogram(
    base: DataFrame, group_cols: list[str], bits: int
) -> dict[tuple, list[tuple[int, int]]]:
    """ONE exact aggregation over ``base`` (must carry ``_kn``):
    per-group row counts in each of ``2^bits`` equal key-space bins —
    map-side partial combine, ≤ groups × 2^bits result rows. md5 keys
    are uniform, so every bin holds ≈ n/2^bits rows; because the bins
    PARTITION the key space with exact counts, any bin-aligned
    threshold's below-count is exact — the sketch that lets the top-q
    selectors bracket every group's q-th order statistic without a
    separate verify pass (and without the old retry loop: a bracket
    read off the histogram cannot miss)."""
    shift = 60 - bits
    rows = (
        base.groupBy(*group_cols, F.shiftright("_kn", shift).alias("_bin"))
        .agg(F.count(F.lit(1)).alias("_c"))
        .collect()
    )
    hist: dict[tuple, list[tuple[int, int]]] = {}
    for r in rows:
        g = tuple(r[c] for c in group_cols)
        hist.setdefault(g, []).append((int(r["_bin"]), int(r["_c"])))
    for g in hist:
        hist[g].sort()
    return hist


def _bracket_from_hist(
    hist_g: list[tuple[int, int]], n: int, q: int, bits: int
) -> tuple[int, int, int]:
    """(lo, hi, c_lo) for the q-th order statistic of ``n`` keys, exact
    from the group's key-space histogram: the binomial bracket of
    :func:`_topq_bounds` (tight, ~√n wide) aligned outward to bin
    boundaries so its below-counts are exactly readable; if the
    binomial bound missed (probability ≪ ever observing it), fall back
    to the histogram bin where the cumulative count crosses ``q`` —
    valid by construction, so exactness never depends on the
    probabilistic bound and no recount pass exists at all."""
    if q <= 0:
        return (0, 0, 0)
    if q >= n:
        return (_KEY_SPACE, _KEY_SPACE, n)
    shift = 60 - bits

    def cum_below(b: int) -> int:
        return sum(c for bb, c in hist_g if bb < b)

    lo_b, hi_b = _topq_bounds(n, q, 1.0)
    lo_bin = lo_b >> shift
    hi_bin = min(1 << bits, (hi_b + (1 << shift) - 1) >> shift)
    c_lo = cum_below(lo_bin)
    c_hi = cum_below(hi_bin)
    if c_lo <= q <= c_hi:
        return (lo_bin << shift, hi_bin << shift, c_lo)
    # exact fallback: the crossing bin (always contains the boundary)
    run = 0
    for bb, c in hist_g:
        if run + c >= q:
            return (bb << shift, (bb + 1) << shift, run)
        run += c
    # fewer actual rows than the caller's n claims (cannot happen when
    # stats derive from the same frame): degrade to a full sort for
    # this group only, like the old final-attempt behavior
    return (0, _KEY_SPACE, 0)


def _select_topq(
    df: DataFrame,
    group_cols: list[str],
    stats: dict[tuple, tuple[int, int]],
    id_col: str,
    salt: str,
    flag: str | None = None,
    _diag: dict | None = None,
    _hist: tuple[DataFrame, dict, int] | None = None,
) -> DataFrame:
    """EXACTLY the first ``q`` rows of every group under the
    deterministic (md5(salt:id), id) order — without sorting any group
    in one task.

    The naive plan (``row_number().over(partitionBy(group))``) funnels
    every row of a group through ONE shuffle partition; with a handful
    of sources at 100 TB that task sorts terabytes. This helper keeps
    the exact same output set with the repo's candidates+recount
    discipline (``text.approx_top_tokens``):

    1. THRESHOLD: per group, bracket the q-th key with
       :func:`_topq_bounds` — pure driver math on (n, q), no scan.
    2. VERIFY (exact, fused): one aggregation builds a per-group
       key-space HISTOGRAM (:func:`_collect_key_histogram` — map-side
       partial combine, ≤ groups × 1024 result rows). Bin-aligning the
       bracket makes its below-counts exactly readable off the
       histogram, and a missed binomial bound falls back to the bin
       where the cumulative count crosses ``q`` — valid by
       construction, so there is no recount retry loop (pre-r10 this
       was a separate count-two-thresholds pass that re-ran ×8-widened
       on a miss).
    3. SELECT: rows below ``lo`` are kept MAP-SIDE (no shuffle); only
       the boundary band [lo, hi) — ~12·√n + 128 rows plus at most two
       histogram bins (~n/1024) per group — flows through the exact
       ranking window, taking ``q - c_lo`` rows per group.

    ``stats`` maps group-value tuples to (n_rows, quota). Groups absent
    from ``stats`` are dropped. With ``flag=None`` returns the selected
    rows (original columns); with ``flag=<name>`` returns ALL rows of
    ``stats``-listed groups plus a boolean column marking selection.
    Group matching is null-safe (a NULL stratum is its own group, as
    under the window plan). ``_diag`` (tests) receives per-group band
    sizes and the attempt count (always 1 since the fused histogram).
    ``_hist`` lets a caller that already built the keyed frame +
    histogram (``resample_to_mix`` derives its group counts from it —
    one corpus pass for counts AND brackets) pass them in."""
    spark = df.sparkSession
    if _hist is not None:
        base, hist, bits = _hist
    else:
        base = _with_keys(df, id_col, salt)
        bits = _hist_bits(len(stats))
        hist = _collect_key_histogram(base, group_cols, bits)

    from pyspark.sql.types import LongType, StructField, StructType

    gschema = df.select(*group_cols).schema
    tschema = StructType(
        list(gschema.fields)
        + [
            StructField("_lo", LongType()),
            StructField("_hi", LongType()),
            StructField("_q", LongType()),
        ]
    )
    c_lo: dict[tuple, int] = {}
    bounds: dict[tuple, tuple[int, int]] = {}
    band = {}
    for g, (n, q) in stats.items():
        # a group with zero df rows has no histogram entry; its bracket
        # trivially holds (callers derive quotas from counts, so q=0)
        lo, hi, cl = _bracket_from_hist(hist.get(g, []), n, q, bits)
        bounds[g] = (lo, hi)
        c_lo[g] = cl
        hb = hi >> (60 - bits)
        band[g] = sum(
            c for bb, c in hist.get(g, []) if lo >> (60 - bits) <= bb < hb
        )
    if _diag is not None:
        _diag["band_rows"] = band
        _diag["attempts"] = 1
    # Attach (_lo, _hi, _q, _clo) per group. For the usual handful of
    # groups (a mix's sources) the per-group constants INLINE as CASE
    # expressions — a pure map with ZERO joins: the r10 profile showed
    # the per-query BroadcastExchange setup (2 tiny joins × 2 union
    # branches) costing more than the corpus scan itself at sf0.1.
    # Beyond 64 groups the expression tree stops being the cheap path
    # and ONE merged broadcast join (formerly two) takes over.
    if len(stats) <= 64:
        def _gcond(g):
            cc = None
            for c, v in zip(group_cols, g):
                e = F.col(c).eqNullSafe(
                    F.lit(v).cast(gschema[c].dataType)
                )
                cc = e if cc is None else (cc & e)
            return cc

        def _chain(vals: dict) -> F.Column:
            expr = F.lit(None).cast("long")
            for g in sorted(stats, key=str):
                expr = F.when(_gcond(g), F.lit(int(vals[g]))).otherwise(expr)
            return expr

        j = (
            base.withColumn("_lo", _chain({g: b[0] for g, b in bounds.items()}))
            .withColumn("_hi", _chain({g: b[1] for g, b in bounds.items()}))
            .withColumn("_q", _chain({g: q for g, (_, q) in stats.items()}))
            .withColumn("_clo", _chain(c_lo))
            .filter(F.col("_q").isNotNull())  # inner-join semantics
        )
    else:
        tdf = spark.createDataFrame(
            [
                (*g, lo, hi, stats[g][1], int(c_lo[g]))
                for g, (lo, hi) in sorted(
                    bounds.items(), key=lambda kv: str(kv[0])
                )
            ],
            StructType(
                list(tschema.fields)
                + [StructField("_clo", LongType())]
            ),
        )
        cond = [base[c].eqNullSafe(tdf[c]) for c in group_cols]
        j = base.join(F.broadcast(tdf), cond, "inner").drop(
            *[tdf[c] for c in group_cols]
        )
    keep_low = F.col("_kn") < F.col("_lo")
    in_band = (F.col("_kn") >= F.col("_lo")) & (F.col("_kn") < F.col("_hi"))
    order_cols = [F.col("_k"), F.col(id_col)]
    helper_cols = ["_k", "_kn", "_lo", "_hi", "_q", "_clo"]
    if flag is None:
        # the union's two branches each scan the corpus (keep map-side,
        # band ranked). The histogram makes the EXACT selected+band row
        # count known on the driver before any job launches — when it is
        # small, one scan materializes that superset (localCheckpoint,
        # the phrase_hits_indexed gating pattern) and both branches read
        # it back instead of re-scanning; when it is large (a 100 TB mix
        # keeps half the corpus), materializing the output would be the
        # new bottleneck and the two-scan map-side plan stands.
        superset_rows = sum(c_lo[g] + band[g] for g in stats)
        if superset_rows <= 4_000_000:
            j = j.filter(F.col("_kn") < F.col("_hi")).localCheckpoint(
                eager=True
            )
        return _band_cut(
            j, group_cols, order_cols, keep_low, in_band, df.columns
        )
    band_sel = _band_select(j, group_cols, order_cols, in_band)
    bsel = band_sel.select(F.col(id_col).alias("_bid")).withColumn(
        "_bsel", F.lit(True)
    )
    return (
        j.join(F.broadcast(bsel), j[id_col] == F.col("_bid"), "left")
        .withColumn(flag, keep_low | F.coalesce(F.col("_bsel"), F.lit(False)))
        .drop("_bid", "_bsel", *helper_cols)
    )


def _hex4_threshold(rate: float) -> str:
    """First-4-hex-chars threshold for a keep rate in [0, 1]. Rate 1.0 maps
    to 'g', which sorts above every hex prefix ('f' < 'g' in binary
    collation) — the 5-char '10000' would sort BELOW 'ffff' and drop rows."""
    n = int(rate * 65536)
    if n >= 65536:
        return "g"
    return format(max(0, n), "04x")


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    group_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "mix1",
) -> DataFrame:
    """Keep each row of group ``g`` with probability ``rates[g]``,
    deterministically: a row survives iff ``md5(salt ':' id)``'s first 4
    hex chars fall under the group's threshold. Groups absent from
    ``rates`` are dropped (rate 0). Changing ``salt`` re-rolls membership
    without touching the rates."""
    spark = df.sparkSession
    rates_df = spark.createDataFrame(
        [(g, _hex4_threshold(r)) for g, r in sorted(rates.items())],
        f"{group_col} string, thr string",
    )
    key = F.md5(F.concat_ws(":", F.lit(salt), F.col(id_col).cast("string")))
    return (
        df.join(F.broadcast(rates_df), group_col, "left")
        .filter(F.substring(key, 1, 4) < F.coalesce(F.col("thr"), F.lit("0000")))
        .drop("thr")
    )


def deterministic_shuffle(
    df: DataFrame, id_col: str = "doc_id", salt: str = "shuf1"
) -> DataFrame:
    """Attach the global training-order key ``shuffle_key = md5(salt:id)``.
    Sorting by it yields the same pseudo-random permutation on any engine,
    partitioning, or cluster size (``df.orderBy(rand())`` yields none of
    that). At scale, range-partition on the key's hex prefix and sort
    within partitions: each output shard is internally ordered and shard
    boundaries are deterministic — no global sort. Changing ``salt``
    re-deals the epoch's order."""
    return df.withColumn(
        "shuffle_key",
        F.md5(F.concat_ws(":", F.lit(salt), F.col(id_col).cast("string"))),
    )


def upsample(
    df: DataFrame,
    factors: dict[str, int],
    group_col: str = "source",
) -> DataFrame:
    """Repeat each row of group ``g`` ``factors[g]`` times (default 1),
    adding an ``epoch`` column 1..factor. Row-local explode — no shuffle;
    at scale the output inherits the input partitioning, so a skewed
    factor map (one source x100) should be followed by AQE or an explicit
    rebalance before the next wide stage."""
    spark = df.sparkSession
    f_df = spark.createDataFrame(
        [(g, int(n)) for g, n in sorted(factors.items())],
        f"{group_col} string, factor int",
    )
    n = F.coalesce(F.col("factor"), F.lit(1))
    # factor <= 0 drops the group entirely. The guard matters: Spark's
    # sequence(1, 0) counts DOWN to [1, 0] — it would emit two epochs,
    # not zero.
    epochs = F.when(n >= 1, F.sequence(F.lit(1), n)).otherwise(
        F.array().cast("array<int>")
    )
    return (
        df.join(F.broadcast(f_df), group_col, "left")
        .withColumn("epoch", F.explode(epochs))
        .drop("factor")
    )


def cap_per_group(
    df: DataFrame,
    group_col: str = "source",
    k: int = 100,
    id_col: str = "doc_id",
    salt: str = "cap1",
) -> DataFrame:
    """Keep at most ``k`` rows per group, chosen by deterministic hash
    order (md5 of salt:id) — the "cap documents per domain" operator a
    crawl-heavy corpus needs so no single source dominates.

    Deterministic on any cluster size/partitioning/engine (same property
    as :func:`stratified_sample`, same auditability argument). One
    shuffle on the group key for the per-group ranking window; groups
    with ≤ k rows pass through untouched. Every group's rows flow
    through one task here — at extreme group skew (one domain with
    billions of rows) or million-domain cardinality use
    :func:`cap_per_group_distributed`, which returns the identical set
    via fully-distributed threshold refinement."""
    from pyspark.sql import Window as W

    order = F.md5(F.concat_ws(":", F.lit(salt), F.col(id_col).cast("string")))
    rn = F.row_number().over(
        W.partitionBy(group_col).orderBy(order, F.col(id_col))
    )
    return df.withColumn("_rn", rn).filter(F.col("_rn") <= k).drop("_rn")


def cap_per_group_distributed(
    df: DataFrame,
    group_col: str = "source",
    k: int = 100,
    id_col: str = "doc_id",
    salt: str = "cap1",
) -> DataFrame:
    """:func:`cap_per_group` for HIGH-CARDINALITY group spaces — the
    "cap documents per DOMAIN" shape where the group count is millions
    (so no driver-side quota table can exist) AND single domains can
    dominate (so no per-group ranking window can run). Exactly the same
    output set as :func:`cap_per_group`, fully distributed:

    1. group sizes: one partial-aggregated count (shuffle carries
       group-cardinality rows);
    2. per-group key brackets for the k-th order statistic, computed IN
       the plan from (n, k) via md5-uniformity (the
       :func:`_topq_bounds` math as column expressions — no collect);
    3. exact verification: per-group counts below lo/hi (map-side
       combine); the ONLY driver action is a single scalar — the number
       of groups whose bracket missed. A missed group's bracket widens
       to (0, SPACE), which needs NO recount: below-lo count is 0 by
       construction, and the group degenerates to an exact in-band sort
       of itself — correctness never rests on the probabilistic bound;
    4. selection: below-lo rows kept map-side; only the ~12·√n+128-row
       boundary band per group enters the ranking window.

    The corpus⋈bounds joins are hint-free group-keyed joins: AQE
    broadcasts the bounds when the group space is small and
    skew-splits the hot groups when it is not (a JOIN on a skewed key
    splits fine — it is the window/groupBy funnel that cannot).
    Trade-off vs the window plan: ~3 corpus passes instead of 1 — use
    :func:`cap_per_group` when every group comfortably fits one task."""
    key = F.md5(F.concat_ws(":", F.lit(salt), F.col(id_col).cast("string")))
    knum = F.conv(F.substring(key, 1, 15), 16, 10).cast("long")
    base = df.withColumn("_k", key).withColumn("_kn", knum)
    counts = base.groupBy(group_col).agg(F.count(F.lit(1)).alias("_n"))
    kk = F.least(F.lit(int(k)).cast("long"), F.col("_n"))
    p = kk.cast("double") / F.col("_n")
    m = F.lit(6.0) * F.sqrt(p * (F.lit(1.0) - p) / F.col("_n")) + F.lit(
        64.0
    ) / F.col("_n")
    space = F.lit(float(_KEY_SPACE))
    keep_all = kk >= F.col("_n")
    lo = F.when(keep_all, F.lit(_KEY_SPACE)).otherwise(
        F.greatest(F.lit(0).cast("long"), F.floor((p - m) * space))
    )
    hi = F.when(keep_all, F.lit(_KEY_SPACE)).otherwise(
        F.least(F.lit(_KEY_SPACE).cast("long"), F.ceil((p + m) * space))
    )
    bounds = counts.select(
        group_col, F.col("_n"), kk.alias("_q"), lo.alias("_lo"), hi.alias("_hi")
    )
    ver = (
        base.join(bounds, group_col)
        .groupBy(group_col)
        .agg(
            F.sum((F.col("_kn") < F.col("_lo")).cast("long")).alias("_clo"),
            F.sum((F.col("_kn") < F.col("_hi")).cast("long")).alias("_chi"),
            F.first("_q").alias("_vq"),
            F.first("_lo").alias("_vlo"),
            F.first("_hi").alias("_vhi"),
        )
    )
    bracket_ok = (F.col("_clo") <= F.col("_vq")) & (
        F.col("_vq") <= F.col("_chi")
    )
    # the one driver action: how many brackets missed (6σ + 64-row
    # slack ⇒ essentially never; a miss is handled exactly, below)
    n_bad = ver.filter(~bracket_ok).limit(1).count()
    info = ver.select(
        group_col,
        F.col("_vq").alias("_q"),
        F.when(bracket_ok, F.col("_vlo")).otherwise(F.lit(0)).alias("_lo"),
        F.when(bracket_ok, F.col("_vhi"))
        .otherwise(F.lit(_KEY_SPACE))
        .alias("_hi"),
        F.when(bracket_ok, F.col("_clo")).otherwise(F.lit(0)).alias("_clo"),
    ) if n_bad else ver.select(
        group_col,
        F.col("_vq").alias("_q"),
        F.col("_vlo").alias("_lo"),
        F.col("_vhi").alias("_hi"),
        F.col("_clo"),
    )
    j = base.join(info, group_col)
    return _band_cut(
        j,
        [group_col],
        [F.col("_k"), F.col(id_col)],
        F.col("_kn") < F.col("_lo"),
        (F.col("_kn") >= F.col("_lo")) & (F.col("_kn") < F.col("_hi")),
        df.columns,
    )


#: tie-split gives up (and the plain band window runs) when the band
#: holds more distinct key values than this — a huge band with MANY
#: distinct keys is a bracket miss, not a tie problem, and collecting
#: an unbounded tier table would violate the bounded-driver discipline.
MAX_TIE_TIERS = 10_000


def _tie_split_cut(
    base: DataFrame,
    out_cols,
    key_col: str,
    id_col: str,
    k: int,
    c_above: int,
    keep_cond,
    band_cond,
    max_band_rows: int,
    _diag: dict | None,
) -> DataFrame | None:
    """Split an oversized (tie-dominated) verify band so no corpus-sized
    window ever runs (the r07 ADVICE hot-spot: a constant or coarsely
    rounded key makes the exact band [lo, hi] corpus-sized, and the
    single-partition global ranking window becomes an executor OOM at
    exactly the scale :func:`select_topk_by_key` exists for):

    1. TIER: aggregate the band per distinct key value (≤
       :data:`MAX_TIE_TIERS` tiny rows to the driver — a tie-dominated
       band has FEW distinct keys by construction; more than that means
       the band is big for some other reason and the caller keeps the
       plain band window).
    2. Driver prefix-sum over tiers (key desc): tiers fully inside the
       quota are kept MAP-SIDE (``key >= cutoff`` — no shuffle, no
       window); exactly ONE boundary tier needs a partial take of its
       ``q2`` id-ascending rows.
    3. BOUNDARY: if the tier is window-sized, rank it directly; a huge
       tie with a NUMERIC id recurses into the quantile-bracketed cut
       on the negated id (ids are unique, so the recursion's band is
       sketch-bounded and terminates); a huge tie with a STRING id
       falls back to the single window (documented residual — sampled
       quantiles need a numeric domain; ``_diag`` flags it).

    Returns None when not applicable (caller falls back)."""
    from pyspark.sql import Window as W

    key = F.col(key_col)
    tiers = (
        base.filter(band_cond)
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("_c"))
        .orderBy(key.desc())
        .limit(MAX_TIE_TIERS + 1)
        .collect()
    )
    if len(tiers) > MAX_TIE_TIERS:
        if _diag is not None:
            _diag["tie_split"] = {"path": "skipped-many-tiers"}
        return None
    remaining = k - c_above
    cutoff_val = None  # lowest FULLY-kept key value
    boundary_val = None
    boundary_rows = 0
    q2 = 0
    for t in tiers:
        c = int(t["_c"])
        if remaining >= c:
            remaining -= c
            cutoff_val = t[key_col]
            if remaining == 0:
                break
        else:
            boundary_val, boundary_rows, q2 = t[key_col], c, remaining
            break
    if q2 == 0 and remaining > 0:
        return None  # can't happen post-verify (c_ge >= k); be safe
    full_cond = (
        keep_cond if cutoff_val is None else (keep_cond | (key >= F.lit(cutoff_val)))
    )
    parts = [base.filter(full_cond).select(out_cols)]
    path = "no-boundary"
    if q2 > 0:
        btier = base.filter(key == F.lit(boundary_val))
        id_is_numeric = isinstance(
            base.schema[id_col].dataType, NumericType
        )
        if boundary_rows > max_band_rows and id_is_numeric:
            path = "boundary-recurse"
            sub = select_topk_by_key(
                btier.withColumn("_negid", -F.col(id_col)),
                "_negid",
                q2,
                id_col=id_col,
                max_band_rows=max_band_rows,
            ).drop("_negid")
        else:
            path = (
                "boundary-window"
                if boundary_rows <= max_band_rows
                else "boundary-window-unbounded"  # string-id residual
            )
            w = W.orderBy(F.col(id_col))
            sub = (
                btier.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") <= q2)
                .drop("_rn")
            )
        parts.append(sub.select(out_cols))
    if _diag is not None:
        _diag["tie_split"] = {
            "path": path,
            "tiers": len(tiers),
            "boundary_rows": boundary_rows,
            "q2": q2,
        }
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def select_topk_by_key(
    df: DataFrame,
    key_col: str,
    k: int,
    id_col: str = "doc_id",
    rel_err: float | None = None,
    max_band_rows: int = 1_000_000,
    _diag: dict | None = None,
) -> DataFrame:
    """EXACTLY the ``k`` rows with the largest ``key_col`` (id ascending
    tie-break — the same deterministic order as
    ``ORDER BY key DESC, id LIMIT k``), selected WITHOUT
    TakeOrderedAndProject and without a global sort.

    Why: ``orderBy(key.desc()).limit(k)`` is the right plan for small k
    (per-partition top-k map-side, heap-merge on the driver) but the
    driver merge materializes ~partitions × k rows — at a DSIR-realistic
    selection rate (k = a corpus fraction, millions–billions of rows at
    100 TB) that is a driver OOM, not a plan. This helper applies the
    repo's threshold-refinement discipline (:func:`_select_topq`) to a
    GLOBAL cut on an arbitrary numeric key: the key is not md5-uniform,
    so the bracket comes from a SAMPLED QUANTILE of the key
    (``approxQuantile``, Greenwald-Khanna — driver state is the sketch,
    never rows) instead of binomial driver math:

    1. BRACKET: quantile values (lo, hi) around rank n-k with margin
       2·rel_err on each side.
    2. VERIFY (exact): one aggregate counts rows strictly above ``hi``
       (``c_above``, all provably selected) and at-or-above ``lo``
       (``c_ge``, the selection certainly inside). Bracket holds iff
       ``c_above <= k <= c_ge``; a miss widens ×8 and retries, and the
       final attempt degenerates to an exact full ranking (one task —
       the documented never-in-practice fallback, same contract as
       ``_select_topq``'s (0, SPACE)).
    3. SELECT via :func:`_band_cut`: rows above ``hi`` kept MAP-SIDE;
       only the ~4·rel_err·n-row band [lo, hi] flows through the global
       ranking window, taking ``k - c_above`` rows.

    Rows with a NULL key are excluded (they cannot rank; DSIR callers
    join scores inner, so none exist there). Ties are exact: every tie
    of the ``hi`` bracket value lands in the band and resolves by id.
    ``rel_err`` defaults to ``max(1e-6, min(0.01, 2000/n))`` — a few
    thousand band rows regardless of n.

    TIED / LOW-CARDINALITY KEYS (r07 ADVICE): the "band stays
    sketch-bounded" property assumes near-continuous keys; a constant
    or coarsely rounded key can make the exact band corpus-sized, and
    the global ranking window would funnel it through one task. When
    the verified band exceeds ``max_band_rows``, :func:`_tie_split_cut`
    takes over: per-distinct-key tier counts (bounded driver metadata),
    map-side keep of whole tiers, and a partial take of the ONE
    boundary tier — windowed if it fits, recursed through this same
    quantile machinery on the (unique, hence tie-free) numeric id if
    not. The only residual single-window case is a > ``max_band_rows``
    tie on a STRING id (sampled quantiles need a numeric domain) —
    flagged in ``_diag``. ``_diag`` (tests) receives the attempt count,
    exact band size, and the tie-split decision."""
    if k <= 0:
        return df.limit(0)
    base = df.filter(F.col(key_col).isNotNull())
    n = base.count()
    if k >= n:
        return base
    e = rel_err if rel_err is not None else max(1e-6, min(0.01, 2000.0 / n))
    p = (n - k) / n
    key = F.col(key_col)
    c_above = 0
    keep_cond = F.lit(False)
    band_cond = F.lit(True)
    band_rows = n
    for attempt in range(4):
        if attempt == 3:
            # degenerate: exact full ranking (keep nothing map-side,
            # band = everything) — termination never rests on the sketch
            c_above, keep_cond, band_cond = 0, F.lit(False), F.lit(True)
            band_rows = n
            if _diag is not None:
                _diag["attempts"] = attempt + 1
                _diag["band_rows"] = band_rows
            break
        m = 2.0 * e * (8.0**attempt)
        lo_val, hi_val = base.approxQuantile(
            key_col, [max(0.0, p - m), min(1.0, p + m)], e
        )
        row = base.agg(
            F.sum((key > F.lit(hi_val)).cast("long")).alias("c_above"),
            F.sum((key >= F.lit(lo_val)).cast("long")).alias("c_ge"),
        ).collect()[0]
        if row["c_above"] <= k <= row["c_ge"]:
            c_above = int(row["c_above"])
            keep_cond = key > F.lit(hi_val)
            band_cond = (key >= F.lit(lo_val)) & (key <= F.lit(hi_val))
            band_rows = int(row["c_ge"] - row["c_above"])
            if _diag is not None:
                _diag["attempts"] = attempt + 1
                _diag["band_rows"] = band_rows
            break
    if band_rows > max_band_rows:
        out = _tie_split_cut(
            base,
            df.columns,
            key_col,
            id_col,
            k,
            c_above,
            keep_cond,
            band_cond,
            max_band_rows,
            _diag,
        )
        if out is not None:
            return out
    j = base.withColumn("_q", F.lit(int(k)).cast("long")).withColumn(
        "_clo", F.lit(c_above).cast("long")
    )
    return _band_cut(
        j,
        [],
        [key.desc(), F.col(id_col)],
        keep_cond,
        band_cond,
        df.columns,
    )


def resample_to_mix(
    df: DataFrame,
    weights: dict[str, float],
    group_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "mix1",
    total: int | None = None,
) -> DataFrame:
    """Rebalance the corpus to a TARGET group mixture (DoReMi-style
    domain reweighting, downsampling form): given per-group weights,
    emit the LARGEST epoch achievable without replacement whose
    composition matches the normalized weights — feasible total
    ``T = min_g floor(n_g / w_g)`` (the binding group runs out first),
    per-group quota ``floor(w_g · T)``, rows chosen in deterministic
    hash order (md5 of salt:id — same auditability contract as
    :func:`stratified_sample`). Groups absent from ``weights`` (or
    weighted 0) are dropped; a positive-weight group with NO corpus rows
    makes the mix infeasible and raises. ``total`` caps the epoch below
    the feasible maximum. To OVERSHOOT a group's supply instead of
    shrinking the epoch, compose with :func:`upsample_epochs`.

    Scale shape (r10 profile, VERDICT r09 #4): ONE corpus pass builds
    the per-group key-space histogram (≤ groups × 1024 rows on the
    driver — weighted groups only, so bounded by the caller's mix) and
    serves BOTH the group counts for the quota math AND the exact
    selection brackets — the former separate count-collect and
    bracket-verify passes are gone. Selection is the
    threshold-refinement plan of :func:`_select_topq` — the kept rows
    are decided MAP-SIDE against a broadcast per-group key threshold,
    and only a ~√n-sized boundary band per group is ever sorted (the
    former ``row_number().over(partitionBy(group))`` window sent every
    row of a source through one task — a single-task terabyte sort the
    first time one source dominates the corpus, which at web scale is
    the normal case). The selected SET is identical to the window
    plan's, row for row.

    Cross-engine exactness note: quota arithmetic is IEEE double
    (floor(n/w), floor(w·T)). An external replay matches bit-for-bit
    when the weights are binary-exact (0.5, 0.25, …) or when it
    replicates the same double ops; near-integer boundaries with
    non-binary weights can differ by one row between decimal and double
    engines."""
    wsum = float(sum(weights.values()))
    if wsum <= 0:
        raise ValueError("weights must sum to a positive value")
    norm = {g: float(w) / wsum for g, w in weights.items() if w > 0}
    if not norm:
        raise ValueError("no positive-weight groups in the mix")
    # one fused pass: the key-space histogram over the WEIGHTED groups
    # only (unweighted groups are dropped anyway — filtering first keeps
    # the driver result bounded by the caller's mix, not the corpus's
    # group cardinality) yields the group counts by summation and the
    # selection brackets by bin cumulation
    bits = _hist_bits(len(norm))
    base = _with_keys(df, id_col, salt).filter(
        F.col(group_col).isin(list(norm))
    )
    hist = _collect_key_histogram(base, [group_col], bits)
    counts = {g: sum(c for _, c in h) for (g,), h in hist.items()}
    missing = sorted(set(norm) - set(counts))
    if missing:
        raise ValueError(f"mix demands groups absent from the corpus: {missing}")
    feasible = min(math.floor(counts[g] / w) for g, w in norm.items())
    t = feasible if total is None else min(int(total), feasible)
    stats = {
        (g,): (counts[g], math.floor(w * t)) for g, w in norm.items()
    }
    return _select_topq(
        df, [group_col], stats, id_col, salt, _hist=(base, hist, bits)
    )


def mix_report(
    df: DataFrame,
    weights: dict[str, float],
    group_col: str = "source",
) -> DataFrame:
    """The planning companion to :func:`resample_to_mix`: per mix group,
    what the corpus HAS vs what the target mixture can USE — emits
    ``(group, n_rows, weight, quota, surplus, binding)`` where ``quota``
    is the rows the largest feasible epoch takes, ``surplus`` the rows
    left on the floor, and ``binding`` marks the group(s) that cap the
    epoch (grow THOSE sources — or upsample them — to grow the epoch;
    surplus elsewhere is unusable at this mixture). Run this before
    committing to a mix; read ``surplus/quota`` as the price of the
    target composition.

    Fully distributed (no driver-side quota math): group counts join a
    broadcast weight table, the feasible epoch is one min-aggregate
    (group-cardinality rows), quotas project per group. Same floor
    arithmetic as :func:`resample_to_mix` — binary-exact weights make
    the report engine-exact (see that docstring)."""
    spark = df.sparkSession
    wsum = float(sum(weights.values()))
    if wsum <= 0:
        raise ValueError("weights must sum to a positive value")
    norm = sorted(
        (g, float(w) / wsum) for g, w in weights.items() if w > 0
    )
    if not norm:
        raise ValueError("no positive-weight groups in the mix")
    wdf = spark.createDataFrame(norm, f"{group_col} string, wt double")
    counts = df.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows")
    )
    g = wdf.join(counts, group_col, "left").fillna({"n_rows": 0})
    cand = F.floor(F.col("n_rows") / F.col("wt"))
    t = g.agg(F.min(cand).alias("t"))
    quota = F.floor(F.col("wt") * F.col("t")).cast("long")
    return (
        g.crossJoin(F.broadcast(t))
        .select(
            group_col,
            "n_rows",
            F.round("wt", 6).alias("weight"),
            quota.alias("quota"),
            (F.col("n_rows") - quota).cast("long").alias("surplus"),
            (cand == F.col("t")).alias("binding"),
        )
    )


def sample_to_token_budget(
    df: DataFrame,
    budgets: dict[str, int],
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "budget1",
) -> DataFrame:
    """Greedy deterministic selection to a per-group TOKEN budget: walk
    each group's rows in hash order, keep documents while the group's
    running token total is below its budget (the first overflowing doc
    is kept, so every nonzero budget yields at least one doc and totals
    land within one doc of the target — the standard mixture-building
    contract).

    Emits the kept rows plus ``n_tokens`` and the group's running
    ``cum_tokens`` (audit columns: a mixture run can prove what it
    consumed). One shuffle on the group key; the running sum is a
    per-group window, never a global order."""
    from pyspark.sql import Window as W

    from couch_to_postgres_spark.extensions.text import token_count

    sess = df.sparkSession
    btab = sess.createDataFrame(
        list(budgets.items()), f"{group_col} string, _budget long"
    )
    order = F.md5(F.concat_ws(":", F.lit(salt), F.col(id_col).cast("string")))
    w = (
        W.partitionBy(group_col)
        .orderBy(order, F.col(id_col))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    toks = df.join(F.broadcast(btab), group_col).withColumn(
        "n_tokens", token_count(text_col)
    )
    out = toks.withColumn("cum_tokens", F.sum("n_tokens").over(w))
    # keep while the PREVIOUS cumulative total was under budget: the doc
    # that crosses the line stays, everything after goes
    return out.filter(
        F.col("cum_tokens") - F.col("n_tokens") < F.col("_budget")
    ).drop("_budget")


def weighted_sample_topn(
    df: DataFrame,
    weight_col,
    n: int,
    id_col: str = "doc_id",
    salt: str = "wsamp1",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis-
    Spirakis A-ES): each row draws a deterministic uniform u from
    ``md5(salt:id)`` and the ``n`` rows with the largest ``u^(1/w)``
    (equivalently, with ``ln(u)/w`` closest to zero) win. Inclusion
    probability is proportional to weight; higher-weight rows (longer
    docs, higher quality scores) win their place more often — the
    mixture operator for "sample a training epoch proportional to
    quality".

    Scale shape: the key is a pure map; selection is one global top-n on
    the ROUNDED key (6 dp, id tie-break — reproducible across engines,
    partitionings, and FP summation orders; there is no summation at
    all, one log and one divide per row), executed as
    ``orderBy(...).limit(n)`` — Spark's TakeOrderedAndProject, which
    takes n per partition map-side and merges heaps on the driver. A
    global ROW_NUMBER window would funnel the entire corpus through one
    task; this never materializes more than partitions×n rows. Changing
    ``salt`` re-draws the sample at identical weights."""
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    hexpfx = F.substring(
        F.md5(F.concat_ws(":", F.lit(salt), F.col(id_col).cast("string"))), 1, 8
    )
    # u in (0,1]: (v+1)/2^32 over the 8-hex-digit prefix — never 0, so
    # ln(u) is finite; ln(u)/w in (-inf, 0], larger (closer to 0) wins.
    # Nonpositive weights are FILTERED before ranking (inclusion
    # probability 0 means excluded even when n exceeds the positive
    # pool): w=0 would otherwise yield NaN at u==1.0 — and Spark sorts
    # NaN ABOVE every double, so a zero-weight row could win a slot —
    # and w<0 would silently invert the inclusion odds.
    u = (F.conv(hexpfx, 16, 10).cast("double") + F.lit(1.0)) / F.lit(
        float(1 << 32)
    )
    # + 0.0 collapses -0.0 (large weights round the key to -0.0; Spark
    # sorts -0.0 below 0.0 while DuckDB treats them equal) — the repo's
    # standard -0.0 normalization for engine-stable sort keys (same as
    # robust_zscore / assign_cells_hof).
    key = F.round(F.log(u) / w.cast("double"), 6) + F.lit(0.0)
    return (
        df.filter(w.cast("double") > 0)
        .withColumn("_ws_key", key)
        .orderBy(F.col("_ws_key").desc(), F.col(id_col))
        .limit(n)
        .drop("_ws_key")
    )


def stratified_split(
    df: DataFrame,
    strata_cols: list[str],
    eval_per_10: int = 1,
    id_col: str = "doc_id",
    salt: str = "strat1",
    max_strata: int = 100_000,
) -> DataFrame:
    """Stratified train/eval split with EXACT per-stratum proportions:
    within every stratum (e.g. language × length-bucket), exactly
    ⌈n·eval_per_10/10⌉ rows go to eval, chosen by the deterministic md5
    order — so the eval set mirrors the corpus composition instead of
    drifting on small strata the way independent per-row hashing does
    (a 30-doc stratum under a 10% Bernoulli hash gets 0-7 eval docs;
    here it gets exactly 3). Emits ``(id, *strata_cols, split)``.

    Exactness is integer-only (ceil via ``(n·k + 9) div 10``): no
    float boundary to disagree across engines. The md5 order key is
    partitioning-stable and re-dealt by ``salt``.

    Scale note: the eval/train boundary per stratum is resolved by the
    threshold-refinement plan of :func:`_select_topq` — the decision is
    map-side against a broadcast per-stratum key threshold, and only a
    ~√n boundary band per stratum is ever sorted, so a dominant stratum
    no longer funnels through one task (the former per-stratum
    ``row_number`` window did). The stratum-count collect is
    strata-cardinality rows (language × length-bucket — bounded). The
    split labels are identical to the window plan's, row for row. For
    splitting a full web-scale corpus where even strata counts are
    awkward, the Bernoulli
    :func:`couch_to_postgres_spark.extensions.text.hash_split` remains
    the zero-coordination alternative (with its proportion drift)."""
    if not 0 <= eval_per_10 <= 10:
        raise ValueError("eval_per_10 must be in [0, 10]")
    base = df.select(F.col(id_col), *strata_cols)
    # BOUNDED driver state, enforced: the per-stratum quota table (and
    # _select_topq's verify collect) is strata-cardinality rows, fine
    # for language × length-bucket but a driver-memory failure mode if
    # someone strata-keys on a high-cardinality column (domain, doc id).
    # limit(max+1) caps what the driver can ever receive: either the
    # collect IS the complete count set, or we raise before collecting
    # more.
    count_rows = (
        base.groupBy(*strata_cols)
        .agg(F.count(F.lit(1)).alias("_n"))
        .limit(max_strata + 1)
        .collect()
    )
    if len(count_rows) > max_strata:
        raise ValueError(
            f"stratified_split saw more than max_strata={max_strata} "
            f"strata for {strata_cols}; the per-stratum quota table is "
            "driver-resident by design (bounded-cardinality strata such "
            "as language x length-bucket). For high-cardinality keys use "
            "cap_per_group_distributed (fully in-plan quotas) or the "
            "Bernoulli text.hash_split (zero coordination, proportion "
            "drift), or raise max_strata deliberately."
        )
    counts = {
        tuple(r[c] for c in strata_cols): r["_n"] for r in count_rows
    }
    stats = {
        g: (n, (n * eval_per_10 + 9) // 10) for g, n in counts.items()
    }
    flagged = _select_topq(
        base, list(strata_cols), stats, id_col, salt, flag="_eval"
    )
    return flagged.select(
        id_col,
        *strata_cols,
        F.when(F.col("_eval"), F.lit("eval"))
        .otherwise(F.lit("train"))
        .alias("split"),
    )
