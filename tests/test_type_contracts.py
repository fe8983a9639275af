"""Driver-hash type contracts for EVERY queries() entry.

Round-4 postmortem: three driver correctness rows failed on the value
hash with cell-identical outputs because the two engines emitted
different output TYPES (Spark decimal(29,2)/bigint vs DuckDB
decimal128(38,2)/HUGEINT). The driver's hash sees types; the old local
gate didn't. This test closes the class at the cheapest possible layer:
Spark's analysis-time schema (no execution) against DuckDB's DESCRIBE
(binding only), for all oracle-backed queries at once.

Comparison model (same as scripts/verify_contract.py, validated against
all 200 r1-r4 driver CORRECTNESS rows):

  * integer widths collapse to one class — the driver tolerates int32 vs
    int64 (r4-green multimodal_pcm);
  * DuckDB DECIMAL and HUGEINT read as float64 on the driver's wire ->
    class "f"; they only match a Spark double;
  * a Spark-side decimal output is ALWAYS a contract violation — DuckDB
    never delivers object-Decimal columns, so the hash can't match
    (r4-fails orders_quartiles / orders_yoy_growth).
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import types as T

import __spark_entry__ as entrymod

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")

_INT = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
_TS = (T.TimestampType, T.TimestampNTZType)

_DUCK_INT = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"}
_DUCK_FLOAT = {"DOUBLE", "FLOAT", "REAL", "HUGEINT", "UHUGEINT"}


def spark_class(dt: T.DataType) -> str:
    if isinstance(dt, _INT):
        return "i"
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return "f"
    if isinstance(dt, T.DecimalType):
        # never hash-matches anything DuckDB produces — see module doc
        return f"SPARK-DECIMAL({dt.precision},{dt.scale})"
    if isinstance(dt, T.StringType):
        return "str"
    if isinstance(dt, T.BooleanType):
        return "b"
    if isinstance(dt, T.DateType):
        return "date"
    if isinstance(dt, _TS):
        return "ts"
    if isinstance(dt, T.BinaryType):
        return "bin"
    if isinstance(dt, T.ArrayType):
        return f"list<{spark_class(dt.elementType)}>"
    if isinstance(dt, T.StructType):
        inner = ",".join(f"{f.name}:{spark_class(f.dataType)}"
                         for f in dt.fields)
        return f"struct<{inner}>"
    return dt.simpleString()


def duck_class(s: str) -> str:
    s = s.strip()
    if s.endswith("[]"):
        return f"list<{duck_class(s[:-2])}>"
    up = s.upper()
    if up in _DUCK_INT:
        return "i"
    if up in _DUCK_FLOAT or up.startswith("DECIMAL"):
        return "f"
    if up == "VARCHAR":
        return "str"
    if up == "BOOLEAN":
        return "b"
    if up == "DATE":
        return "date"
    if up.startswith("TIMESTAMP"):
        return "ts"
    if up == "BLOB":
        return "bin"
    if up.startswith("STRUCT("):
        inner = s[7:-1]
        parts = []
        depth = 0
        field = ""
        for ch in inner:
            if ch == "," and depth == 0:
                parts.append(field)
                field = ""
                continue
            depth += ch in "(<["
            depth -= ch in ")>]"
            field += ch
        if field:
            parts.append(field)
        fields = []
        for p in parts:
            name, _, typ = p.strip().partition(" ")
            clean = name.strip('"')
            fields.append(f"{clean}:{duck_class(typ)}")
        return f"struct<{','.join(fields)}>"
    return up


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    yield con
    con.close()


def test_every_query_type_exact(spark, sf_dir, duck):
    """Spark analysis schema == DuckDB DESCRIBE schema (by class), for
    every oracle-backed queries() entry — 100% coverage, no allowlist."""
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    problems = []
    checked = 0
    for name, fn in qs.items():
        if name not in oracles:
            continue
        try:
            stypes = {f.name: spark_class(f.dataType)
                      for f in fn(spark, sf_dir).schema.fields}
        except Exception as e:  # noqa: BLE001 — report, don't abort sweep
            problems.append(f"{name}: spark build failed: {e}")
            continue
        # round-6 postmortem (tokens_to_ids): the driver's pandas canon
        # sort_values/hashes every output column and throws "unhashable
        # type" on list/struct/map cells — an oracle-backed query may
        # NEVER emit a nested top-level column. Join arrays to strings
        # (array_join) or explode to rows instead.
        nested = {c: t for c, t in stypes.items()
                  if t.startswith(("list<", "large_list<", "struct<",
                                   "map<"))}
        if nested:
            problems.append(
                f"{name}: nested top-level column(s) {nested} — the "
                "driver canon cannot hash array/struct cells")
            continue
        try:
            rows = duck.execute("DESCRIBE " + oracles[name]).fetchall()
            dtypes = {r[0]: duck_class(r[1]) for r in rows}
        except Exception as e:  # noqa: BLE001
            problems.append(f"{name}: duckdb describe failed: {e}")
            continue
        if sorted(stypes) != sorted(dtypes):
            problems.append(
                f"{name}: columns {sorted(stypes)} != {sorted(dtypes)}")
            continue
        diff = {c: (stypes[c], dtypes[c]) for c in stypes
                if stypes[c] != dtypes[c]}
        if diff:
            problems.append(f"{name}: type mismatch (spark, duck): {diff}")
        checked += 1
    assert not problems, "\n".join(problems)
    # regression guard: the sweep must actually cover the full registry
    assert checked >= 140, f"only {checked} queries type-checked"
