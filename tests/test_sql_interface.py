from __future__ import annotations

from pyspark.sql import functions as F

from casf_spark import sql as CSQL
from casf_spark.matrix.analyse import CosineAnalyser
from casf_spark.sources.tables import matrix_from_lineitem


def test_sql_interface_matches_dsl(spark, sf_dir):
    """The SQL-string pipeline and the DataFrame DSL pipeline must produce
    identical similarity tables (same normalization, ordering, rounding)."""
    via_sql = {(r.vector0, r.vector1): r.similarity_value
               for r in CSQL.supplier_cosine(spark, sf_dir).collect()}
    m = matrix_from_lineitem(spark, sf_dir)
    model = CosineAnalyser(axis="y").fit(m, is_sparse=True, persist=False,
                                         pre_aggregated=True)
    via_dsl = {(r.vector0, r.vector1): round(r.similarity_value, 6)
               for r in model.all_similarity().collect()}
    assert via_sql == via_dsl and len(via_sql) > 0


def test_register_tables_views_queryable(spark, sf_dir):
    CSQL.register_tables(spark, sf_dir, ["region", "nation"])
    n = spark.sql("SELECT COUNT(*) n FROM nation").collect()[0].n
    assert n > 0
