from casf_spark.sources.maintenance import compact_parquet
from casf_spark.sources.tables import TABLES, load_table, matrix_from_lineitem
from casf_spark.sources.text import (read_stopwords, read_text_documents,
                                     read_text_lines, write_parquet)

__all__ = ["TABLES", "load_table", "matrix_from_lineitem", "read_text_lines",
           "read_text_documents", "read_stopwords", "write_parquet",
           "compact_parquet"]
