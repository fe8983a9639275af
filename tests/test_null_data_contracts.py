"""Cross-engine contracts on NULL-bearing data.

The shipped testdata has no NULL text/source, so the driver gate cannot
catch a NULL-handling divergence between a Spark query and its DuckDB
oracle — exactly the class the round-6 self-review found (gopher oracle
propagating NULL, dsir dropping NULL-predicate rows from both pools).
This suite runs selected text/selection queries on a synthetic documents
table WITH NULLs through BOTH engines and compares cell-for-cell, so the
class stays structurally covered."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as E

#: queries over `documents` whose semantics must survive NULL text /
#: NULL source identically on both engines
NULL_SENSITIVE = ["gopher_quality", "dsir_select", "c4_quality",
                  "text_cdc_chunks", "dedup_exact"]

ROWS = [
    (1, "the quick brown fox and that have with be to of goes on",
     "en", "src0", 50),
    (2, None, "en", "src1", 0),
    (3, "delta epsilon zeta words here for the test and that",
     "en", None, 40),
    (4, "alpha beta gamma", None, "src2", 15),
    (5, "", "de", "src3", 0),
]


@pytest.fixture(scope="module")
def null_sf(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("null_docs")
    pd.DataFrame(ROWS, columns=["doc_id", "text", "lang", "source",
                                "n_chars"]).to_parquet(
        tmp / "documents.parquet")
    return str(tmp)


@pytest.mark.parametrize("name", NULL_SENSITIVE)
def test_engines_agree_on_null_data(spark, null_sf, name):
    sdf = E.queries()[name](spark, null_sf).toPandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{null_sf}/documents.parquet'")
    odf = con.execute(E.oracle_sql()[name]).df()
    cols = sorted(sdf.columns)
    assert cols == sorted(odf.columns)
    s = sdf[cols].sort_values(cols).reset_index(drop=True)
    o = odf[cols].sort_values(cols).reset_index(drop=True)
    assert s.shape == o.shape, f"{name}: {s.shape} vs {o.shape}"
    for c in cols:
        assert (s[c].isna() == o[c].isna()).all(), f"{name}.{c} null mask"
        sv, ov = s[c].dropna(), o[c].dropna()
        if sv.dtype.kind == "f":
            assert (sv.round(9).values == ov.astype(float).round(9)
                    .values).all(), f"{name}.{c}"
        else:
            assert (sv.astype(str).values == ov.astype(str).values).all(), \
                f"{name}.{c}"
