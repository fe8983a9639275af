from casf_spark.sources.tables import TABLES, load_table, matrix_from_lineitem

__all__ = ["TABLES", "load_table", "matrix_from_lineitem"]
