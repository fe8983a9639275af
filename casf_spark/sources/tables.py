"""Source connectors for the test corpus and matrix derivations.

The reference's only sources are text files (KeyWordsDemo.scala:19-27) and
caller-constructed Datasets (MatrixCosineAnalyse.scala:218). Ours reads the
driver's parquet star schema; the engine itself accepts any DataFrame
conforming to the (y, x, value) COO contract (schemas.MATRIX_ELEMENT).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; one of {TABLES}")
    # timestamp-derived outputs (date_format/window/date_trunc) must agree
    # with the DuckDB oracle's naive timestamps regardless of the caller's
    # session defaults
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        # events.parquet has stored `ts` as TIMESTAMP(NANOS) in some
        # generations (which Spark's reader rejects without nanosAsLong) and
        # plain timestamp[us] in others. Never assume: set nanosAsLong so a
        # nanos file reads as long, then branch on the dtype we actually got.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/events.parquet")
        df = df.withColumn("ts", normalize_ts(df.schema["ts"].dataType))
        # `props` is consumed as a JSON string (get_json_object). Data
        # regenerations have changed physical encodings before (see ts
        # above) — if a generation stores it as a parquet struct/map,
        # serialize it back rather than failing analysis.
        if "props" in df.columns and not isinstance(
                df.schema["props"].dataType, StringType):
            df = df.withColumn("props", F.to_json("props"))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def normalize_ts(dtype, col: str = "ts"):
    """Column expression mapping a parquet-read `ts` of either encoding to a
    session-tz TimestampType: long = raw nanos (read under nanosAsLong) →
    truncate to micros, the same truncation DuckDB applies to nano
    timestamps; timestamp / timestamp_ntz → pass through (cast unifies NTZ
    vs LTZ so downstream schemas are stable across data generations)."""
    from pyspark.sql.types import LongType

    if isinstance(dtype, LongType):
        return F.timestamp_micros((F.col(col) / 1000).cast("long"))
    return F.col(col).cast("timestamp")


def matrix_from_lineitem(spark: SparkSession, sf_dir: str,
                         y: str = "l_suppkey", x: str = "l_partkey",
                         value: str = "l_quantity",
                         partition_by_vector: bool = True) -> DataFrame:
    """Derive a COO sparse matrix from lineitem: one cell per (y, x) with
    value = sum(value_col). E.g. supplier purchase-profiles over parts.

    Only the three needed columns are selected, so the parquet scan prunes
    to exactly that ReadSchema.

    ``partition_by_vector`` pre-partitions the raw rows by ``y`` before the
    cell aggregation. HashPartitioning(y) satisfies the (y, x) aggregation's
    clustered requirement AND the downstream per-vector max aggregation and
    normalization join in CosineAnalyser — removing two exchanges of the
    cell table from every cosine plan (measured ~30-40% off the sparse
    pipeline at sf0.1). Trade-off: the one shuffle that remains carries RAW
    rows instead of map-side-combined cells — right when (y, x) duplication
    is low (here: 600k rows -> 591k cells). For high-duplication corpora
    set False (keep the combine) or repartition the aggregated result.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col(y).cast("string").alias("y"),
        F.col(x).cast("string").alias("x"),
        F.col(value).cast("double").alias("value"),
    )
    if partition_by_vector:
        li = li.repartition("y")
    return li.groupBy("y", "x").agg(F.sum("value").alias("value"))
