"""Custom Python DataSource (Spark 4 API): a JSONL corpus reader.

Demonstrates the connector escape hatch for formats/services with no JVM
connector: implement ``DataSource``/``DataSourceReader`` in Python,
register once per session, then ``spark.read.format("jsonl_docs")`` like
any built-in. (For plain JSONL Spark's native ``spark.read.json`` is the
right call — it's JVM-side; this source exists as the *pattern* for
custom ingestion: one InputPartition per file gives file-level
parallelism, and rows stream out of a generator so a partition never
buffers a whole file.)

Python data sources execute in Python workers (Arrow-batched back to the
JVM) — acceptable at the ingestion edge where the alternative is no
connector at all; not a substitute for JVM sources on hot paths.
"""

from __future__ import annotations

import glob
import json
import os

from pyspark.sql.datasource import (DataSource, DataSourceReader,
                                    InputPartition)
from pyspark.sql.types import StructType

DEFAULT_SCHEMA = ("doc_id BIGINT, text STRING, lang STRING, "
                  "source STRING")


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class JsonlReader(DataSourceReader):
    def __init__(self, options: dict, schema: StructType):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_docs: 'path' option is required")
        self.fields = [f.name for f in schema.fields]

    def partitions(self):
        files = sorted(glob.glob(os.path.join(self.path, "*.jsonl")))
        if not files:
            raise FileNotFoundError(f"no *.jsonl under {self.path}")
        return [_FilePartition(f) for f in files]

    def read(self, partition: _FilePartition):
        with open(partition.path, encoding="utf-8") as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                rec = json.loads(line)
                yield tuple(rec.get(k) for k in self.fields)


class JsonlDocsSource(DataSource):
    """``spark.read.format("jsonl_docs").option("path", dir).load()``."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_docs"

    def schema(self) -> str:
        return self.options.get("schema", DEFAULT_SCHEMA)

    def reader(self, schema: StructType) -> JsonlReader:
        return JsonlReader(self.options, schema)


def register(spark) -> None:
    spark.dataSource.register(JsonlDocsSource)
