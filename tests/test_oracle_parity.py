"""Cross-engine differential check (SURVEY.md §5 technique 3): every
__spark_entry__ query vs its DuckDB oracle at sf0.001 — the in-repo version
of the driver's CORRECTNESS gate."""

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entrymod

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    yield con
    con.close()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
        df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), ignore_index=True)


QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


# non-SQL-expressible ops (driver records the weaker rows-only check).
# x_ann_ivf / x_semantic_dedup moved OUT of this set: their quantizer is
# now a fixed anchor set (literal centroids), so assignment + probing +
# dedup are fully value-oracled; only the iterative FITS (KMeans, LBFGS)
# and zlib remain outside SQL.
NO_ORACLE = {
    "x_compression",
    "x_quality_classifier",
}


def test_every_query_has_oracle_or_is_flagged():
    missing = set(QUERIES) - set(ORACLES)
    assert missing == NO_ORACLE, f"queries without oracle: {missing}"


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_parity(name, spark, sf_dir, duck):
    spark_df = QUERIES[name](spark, sf_dir).toPandas()
    if name not in ORACLES:
        assert len(spark_df) >= 0
        return
    duck_df = duck.execute(ORACLES[name]).fetchdf()
    a, b = canon(spark_df), canon(duck_df)
    assert list(a.columns) == list(b.columns)
    assert len(a) == len(b), f"rows {len(a)} vs {len(b)}"
    pd.testing.assert_frame_equal(a, b)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert df.columns == ["id", "myvar_text", "myvar_num"]
