"""Variant-backed mirror — the true jsonb analog (Spark 4 VariantType).

Postgres jsonb is parse-once binary JSON; the string-`doc` mirror parses
on every extraction instead. Storing ``doc`` as VARIANT in the mirror
parquet moves the parse to ingest time and makes every subsequent
extraction a binary field probe. Measured at sf0.1 (600k docs, group-by
on one extracted field): stored-variant ≈ 0.45 s vs JSON-string ≈ 2.4 s —
5×. Semantics are unchanged, so variant-backed queries share the string
mirror's DuckDB oracles.

Interop: ``to_variant`` / ``to_json_string`` convert between the two
representations; the CDC merge keeps working on either (it only touches
``id`` and passes ``doc`` through).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def to_variant(mirror: DataFrame, doc_col: str = "doc") -> DataFrame:
    """(id, doc json-string) → (id, doc variant). The ingest-time parse."""
    return mirror.withColumn(doc_col, F.parse_json(F.col(doc_col)))


def to_json_string(mirror: DataFrame, doc_col: str = "doc") -> DataFrame:
    """(id, doc variant) → (id, doc json-string) for sinks that need text
    (writeback payloads, change-log files)."""
    return mirror.withColumn(doc_col, F.to_json(F.col(doc_col)))


def write_variant_mirror(mirror: DataFrame, path: str) -> None:
    """Materialize a string-doc mirror as variant-doc parquet (the stored
    layout queries should run against)."""
    to_variant(mirror).write.mode("overwrite").parquet(path)


def read_variant_mirror(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def vget(doc: Column | str, key: str) -> Column:
    """``doc->>'key'`` on a variant doc (string result, NULL when absent;
    path may be nested 'a.b')."""
    c = F.col(doc) if isinstance(doc, str) else doc
    return F.variant_get(c, f"$.{key}", "string")


def vget_typed(doc: Column | str, key: str, dtype: str) -> Column:
    c = F.col(doc) if isinstance(doc, str) else doc
    return F.variant_get(c, f"$.{key}", dtype)


def vkeys(doc: Column | str) -> Column:
    """``jsonb_object_keys(doc)`` on a variant doc."""
    c = F.col(doc) if isinstance(doc, str) else doc
    return F.map_keys(c.cast("map<string,variant>"))


def group_count_variant(vmirror: DataFrame, key: str) -> DataFrame:
    """B10 on the variant mirror (same oracle as the string form)."""
    return vmirror.groupBy(vget("doc", key).alias(key)).agg(
        F.count(F.lit(1)).alias("value")
    )


def key_expansion_variant(vmirror: DataFrame, type_key: str) -> DataFrame:
    """B14 on the variant mirror: same two-phase distinct / explode_outer
    plan decisions as operators.query.key_expansion."""
    return (
        vmirror.select(
            vget("doc", type_key).alias("type"),
            vkeys("doc").alias("keys"),
        )
        .distinct()
        .select("type", F.explode_outer("keys").alias("key"))
        .filter(F.col("key").isNotNull())
        .distinct()
    )


def infer_doc_schema(vmirror: DataFrame, sample: int = 1000) -> str:
    """Dynamic-schema discovery: merged variant schema over a sample
    (the engine-level answer to `SELECT DISTINCT jsonb_object_keys(doc)` —
    full typed structure, not just key names)."""
    row = (
        vmirror.limit(sample)
        .select(F.schema_of_variant_agg("doc").alias("s"))
        .head()
    )
    return row["s"]
