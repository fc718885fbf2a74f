"""Round-start tripwire: the driver can REGENERATE /root/testdata
between rounds with silent physical-type changes (round 4: events.ts
flipped TIMESTAMP(NANOS) -> TIMESTAMP(MICROS) and every event-time
query would have failed the gate). This test reads every parquet
footer at every scale factor and pins the exact arrow types the
engine's loaders (sources/tables.py) are written against, so a
regeneration fails loudly in the first pytest run of a round instead
of silently in the driver's correctness sample. FIXTURES.md §B is the
human-readable twin of _EXPECTED.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

SF_DIRS = ["sf0.001", "sf0.01", "sf0.1"]
TESTDATA = "/root/testdata"

_EXPECTED: dict[str, list[tuple[str, str]]] = {
    "region": [("r_regionkey", "int32"), ("r_name", "string")],
    "nation": [
        ("n_nationkey", "int32"),
        ("n_name", "string"),
        ("n_regionkey", "int32"),
    ],
    "customer": [
        ("c_custkey", "int64"),
        ("c_name", "string"),
        ("c_nationkey", "int32"),
        ("c_acctbal", "double"),
        ("c_mktsegment", "string"),
    ],
    "supplier": [
        ("s_suppkey", "int64"),
        ("s_name", "string"),
        ("s_nationkey", "int32"),
        ("s_acctbal", "double"),
    ],
    "part": [
        ("p_partkey", "int64"),
        ("p_name", "string"),
        ("p_brand", "string"),
        ("p_type", "string"),
        ("p_size", "int32"),
        ("p_retailprice", "double"),
    ],
    "orders": [
        ("o_orderkey", "int64"),
        ("o_custkey", "int64"),
        ("o_orderstatus", "string"),
        ("o_totalprice", "double"),
        ("o_orderdate", "timestamp[us]"),
        ("o_orderpriority", "string"),
    ],
    "lineitem": [
        ("l_orderkey", "int64"),
        ("l_partkey", "int64"),
        ("l_suppkey", "int64"),
        ("l_linenumber", "int32"),
        ("l_quantity", "double"),
        ("l_extendedprice", "double"),
        ("l_discount", "double"),
        ("l_tax", "double"),
        ("l_returnflag", "string"),
        ("l_linestatus", "string"),
        ("l_shipdate", "timestamp[us]"),
    ],
    "events": [
        ("event_id", "int64"),
        ("ts", "timestamp[us]"),  # flipped from timestamp[ns] in round 4
        ("user_id", "int64"),
        ("event_type", "string"),
        ("value", "double"),
        ("props", "string"),
    ],
    "documents": [
        ("doc_id", "int64"),
        ("text", "string"),
        ("lang", "string"),
        ("source", "string"),
        ("n_chars", "int64"),
    ],
    "embeddings": [
        ("vec_id", "int64"),
        ("embedding", "list<element: float>"),
        ("label", "int32"),
    ],
}


@pytest.mark.parametrize("sf", SF_DIRS)
@pytest.mark.parametrize("table", sorted(_EXPECTED))
def test_parquet_footer_types(sf: str, table: str):
    path = os.path.join(TESTDATA, sf, f"{table}.parquet")
    assert os.path.exists(path), f"driver testdata missing: {path}"
    schema = pq.read_schema(path)
    got = [(n, str(schema.field(n).type)) for n in schema.names]
    assert got == _EXPECTED[table], (
        f"{sf}/{table}: driver regenerated testdata with a schema change —\n"
        f"  expected: {_EXPECTED[table]}\n"
        f"  found:    {got}\n"
        "Update sources/tables.py normalization + this table + FIXTURES.md §B."
    )


def test_embedding_dim_is_64():
    """similarity/PQ geometry (8 subspaces × 8 dims) is derived from a
    64-wide embedding column; a width change must fail here, not deep
    inside an ADC expression."""
    import duckdb

    con = duckdb.connect()
    for sf in SF_DIRS:
        dims = con.sql(
            "SELECT DISTINCT len(embedding) FROM "
            f"read_parquet('{TESTDATA}/{sf}/embeddings.parquet')"
        ).fetchall()
        assert dims == [(64,)], f"{sf}: embedding dims {dims}"
    con.close()
