"""Round-trip every TESTDATA table through the DWRF writer/reader —
parquet → DWRF → read must equal the original (SURVEY.md §2.C format-level
round-trip checks), including stats sanity vs direct aggregation."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from hive_dwrf_spark.format import DwrfFile, write_arrow_table
from hive_dwrf_spark.format.writer import _normalize_schema

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


@pytest.mark.parametrize("name", TABLES)
def test_roundtrip_table(tmp_path, name):
    table = pq.read_table(f"{SF_DIR}/{name}.parquet")
    norm = table.cast(_normalize_schema(table.schema))
    path = str(tmp_path / f"{name}.dwrf")
    write_arrow_table(path, table, stripe_rows=2500)
    with DwrfFile(path) as f:
        got = f.read()
    assert got.num_rows == norm.num_rows
    for c in norm.column_names:
        assert got.column(c).to_pylist() == norm.column(c).to_pylist(), c


def test_stats_match_aggregation(tmp_path):
    table = pq.read_table(f"{SF_DIR}/lineitem.parquet")
    path = str(tmp_path / "li.dwrf")
    write_arrow_table(path, table)
    with DwrfFile(path) as f:
        # column ids: root=0, then schema order; l_orderkey is id 1
        st = f.file_stats(1)
        ok = table.column("l_orderkey")
        assert st.count == len(ok)
        assert st.minimum == min(ok.to_pylist())
        assert st.maximum == max(ok.to_pylist())
        assert st.sum == sum(ok.to_pylist())
