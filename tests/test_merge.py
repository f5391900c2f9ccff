"""Stripe-copy merge tests: concat without decode must preserve all rows,
stats, and readability (reference A22 fast-concat parity)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from hive_dwrf_spark.format import DwrfFile, write_arrow_table
from hive_dwrf_spark.format.merge import merge_files


def _make(path, start, n, stripe_rows=None):
    table = pa.table(
        {
            "k": pa.array(np.arange(start, start + n)),
            "s": pa.array([f"v{(start + i) % 13}" for i in range(n)]),
        }
    )
    write_arrow_table(str(path), table, stripe_rows=stripe_rows)
    return table


def test_merge_preserves_rows_and_stats(tmp_path):
    _make(tmp_path / "a.dwrf", 0, 4000, stripe_rows=1500)
    _make(tmp_path / "b.dwrf", 4000, 2000)
    out = str(tmp_path / "merged.dwrf")
    merge_files([str(tmp_path / "a.dwrf"), str(tmp_path / "b.dwrf")], out)
    with DwrfFile(out) as f:
        assert f.num_rows == 6000
        assert len(f.footer.stripes) == 4  # 3 + 1, copied verbatim
        got = f.read()
        assert got.column("k").to_pylist() == list(range(6000))
        st = f.file_stats(1)
        assert (st.minimum, st.maximum, st.count) == (0, 5999, 6000)
        assert st.sum == sum(range(6000))


def test_merge_rejects_schema_mismatch(tmp_path):
    _make(tmp_path / "a.dwrf", 0, 10)
    other = pa.table({"different": pa.array([1.5])})
    write_arrow_table(str(tmp_path / "c.dwrf"), other)
    with pytest.raises(ValueError, match="schema mismatch"):
        merge_files(
            [str(tmp_path / "a.dwrf"), str(tmp_path / "c.dwrf")],
            str(tmp_path / "out.dwrf"),
        )


def test_merged_file_prunes(tmp_path):
    _make(tmp_path / "a.dwrf", 0, 3000, stripe_rows=1000)
    _make(tmp_path / "b.dwrf", 3000, 3000, stripe_rows=1000)
    out = str(tmp_path / "merged.dwrf")
    merge_files([str(tmp_path / "a.dwrf"), str(tmp_path / "b.dwrf")], out)
    with DwrfFile(out) as f:
        got = f.read(filters=[("k", "gte", 5000)])
        assert got.num_rows == 1000  # five of six stripes pruned
