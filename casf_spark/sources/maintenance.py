"""Table-maintenance operators: small-file compaction and range clustering.

Long-running ingestion (streaming sinks, per-batch appends) leaves parquet
directories with thousands of KB-sized files; at 100 TB that turns every
scan into a driver-side file-listing stall and starves the readers of
row-group-level min/max skipping. Compaction rewrites a directory into
size-targeted files; clustering additionally range-partitions + sorts on
the chosen columns so each output file covers a narrow value range and
filters on those columns skip whole files/row groups via parquet footer
statistics.

No equivalent exists in the reference (it has no sinks beyond .show,
KeyWordsDemo.scala:106); this is pipeline-operations surface.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession


def _input_bytes(spark: SparkSession, path: str) -> int:
    """Total byte size of the files under ``path`` via the Hadoop
    FileSystem API (driver-side metadata call — no data read)."""
    jvm = spark.sparkContext._jvm
    jsc = spark.sparkContext._jsc
    conf = jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    return fs.getContentSummary(p).getLength()


def compact_parquet(spark: SparkSession, in_path: str, out_path: str,
                    target_file_bytes: int = 128 * 1024 * 1024,
                    cluster_by: list[str] | None = None) -> DataFrame:
    """Rewrite the parquet directory at ``in_path`` into
    ``ceil(input_bytes / target_file_bytes)`` files at ``out_path``.

    Without ``cluster_by``: a round-robin repartition — balanced file
    sizes, one shuffle whose width is the *output* file count (not the
    input fragment count).

    With ``cluster_by``: ``repartitionByRange`` + ``sortWithinPartitions``
    on those columns — output files cover disjoint value ranges, so later
    scans filtering on them skip non-matching files entirely (parquet
    min/max footer stats). Range boundaries come from Spark's built-in
    reservoir sampling of the keys, so skew in ``cluster_by`` spreads
    across files instead of pinning one writer.

    Returns the reloaded compacted DataFrame.
    """
    n_files = max(1, math.ceil(_input_bytes(spark, in_path)
                               / max(1, target_file_bytes)))
    df = spark.read.parquet(in_path)
    if cluster_by:
        out = (df.repartitionByRange(n_files, *cluster_by)
               .sortWithinPartitions(*cluster_by))
    else:
        out = df.repartition(n_files)
    out.write.mode("overwrite").parquet(out_path)
    return spark.read.parquet(out_path)


def _zvalue(cols: list, mins: list, maxs: list, bits: int):
    """Interleaved-bit Morton code over min/max-normalized columns (all
    Column arithmetic — JVM-side, no UDF). ``bits`` per column.

    Keys must be numeric with a non-NULL min/max (i.e. at least one
    non-NULL value per column) — anything else raises here with the
    offending column named, instead of surfacing as a TypeError deep in
    the arithmetic. NULL key values sort into bucket 0 (the low edge)
    explicitly: Spark's least/greatest IGNORE nulls, which would
    otherwise silently send NULLs to the TOP bucket."""
    from pyspark.sql import functions as F

    n = len(cols)
    scaled = []
    for c, lo, hi in zip(cols, mins, maxs):
        if lo is None or hi is None:
            raise ValueError(
                f"zorder: column {c!r} is all-NULL (no min/max); "
                "drop it from zorder_by or filter NULLs first")
        if not isinstance(lo, (int, float)) or isinstance(lo, bool):
            raise TypeError(
                f"zorder: column {c!r} has non-numeric bounds "
                f"({type(lo).__name__}); z-ordering needs numeric keys — "
                "cast dates/strings to a numeric surrogate first")
        rng = (hi - lo) or 1
        q = F.floor((F.col(c).cast("double") - F.lit(float(lo)))
                    / F.lit(float(rng)) * ((1 << bits) - 1)).cast("long")
        q = F.coalesce(q, F.lit(0))  # NULL keys -> low bucket, explicitly
        scaled.append(F.greatest(F.lit(0), F.least(q, F.lit((1 << bits) - 1))))
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, s in enumerate(scaled):
            bit = F.shiftright(s, b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * n + i))
    return z


def zorder_parquet(spark: SparkSession, in_path: str, out_path: str,
                   zorder_by: list[str],
                   target_file_bytes: int = 128 * 1024 * 1024) -> DataFrame:
    """Compact + Z-ORDER cluster: rows sort by the Morton (interleaved
    -bit) code of ``zorder_by``, so every output file covers a bounded
    hyper-rectangle in ALL the listed columns — filters on ANY of them
    skip files via parquet min/max stats. Lexicographic clustering
    (``compact_parquet(cluster_by=...)``) bounds only the leading
    column; Z-order trades a little per-column locality for skipping on
    every dimension (the Delta/Iceberg OPTIMIZE ZORDER technique).

    Column min/max come from one 1-row aggregate (a metadata-cheap scan);
    the z-code is pure JVM column arithmetic; the layout is
    repartitionByRange + sortWithinPartitions on the code — reservoir
    -sampled bounds, skew-tolerant, output-width shuffle.
    """
    import math as _math

    from pyspark.sql import functions as F

    df = spark.read.parquet(in_path)
    bits = max(4, 48 // max(1, len(zorder_by)))
    stats = df.agg(*[F.min(c).alias(f"mn_{c}") for c in zorder_by],
                   *[F.max(c).alias(f"mx_{c}") for c in zorder_by]).first()
    mins = [stats[f"mn_{c}"] for c in zorder_by]
    maxs = [stats[f"mx_{c}"] for c in zorder_by]
    n_files = max(1, _math.ceil(_input_bytes(spark, in_path)
                                / max(1, target_file_bytes)))
    out = (df.withColumn("_z", _zvalue(zorder_by, mins, maxs, bits))
           .repartitionByRange(n_files, "_z")
           .sortWithinPartitions("_z")
           .drop("_z"))
    out.write.mode("overwrite").parquet(out_path)
    return spark.read.parquet(out_path)
