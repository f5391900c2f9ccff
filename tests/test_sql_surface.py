"""Pure-SQL surface over DWRF (sources/sql.py) + file:-URI path handling.

Covers: CREATE TEMPORARY VIEW ... USING dwrf (SELECT semantics equal to
the DataFrame read), SQL INSERT INTO / INSERT OVERWRITE through the
DataSource writer, refresh() view rebuilding (the JVM caches each
resolved view's planned file list — see sources/sql.py), identifier
validation, and the reader/writer accepting Hadoop ``file:`` URIs (what
Spark's SQL surfaces pass instead of os paths)."""

from __future__ import annotations

import os
import shutil

import pytest

from tests.conftest import SF_SMOKE


def _seed(spark, path, rows=((1, "a"), (2, "b"))):
    shutil.rmtree(path, ignore_errors=True)
    df = spark.createDataFrame(list(rows), "k int, v string")
    df.coalesce(1).write.format("dwrf").mode("overwrite").save(path)


class TestFileUri:
    def test_strip_file_uri_forms(self):
        from hive_dwrf_spark.format.fs import strip_file_uri

        assert strip_file_uri("/tmp/x") == "/tmp/x"
        assert strip_file_uri("file:/tmp/x") == "/tmp/x"
        assert strip_file_uri("file:///tmp/x") == "/tmp/x"
        assert strip_file_uri("file:/tmp/a%20b") == "/tmp/a b"
        assert strip_file_uri("s3://bucket/x") == "s3://bucket/x"
        assert strip_file_uri(None) is None
        assert strip_file_uri("file://localhost/tmp/x") == "/tmp/x"
        # a non-local authority must refuse, not silently read the
        # wrong local path
        import pytest

        with pytest.raises(ValueError, match="somehost"):
            strip_file_uri("file://somehost/data")

    def test_path_algebra_and_scheme_routing(self, monkeypatch, tmp_path):
        """URI-safe path helpers (os.path would mangle 'scheme://') and
        the per-scheme fs registry with its env-factory resolution —
        the executor propagation path for object-store routing."""
        import pytest

        from hive_dwrf_spark.format.fs import (
            _SCHEME_FS,
            LocalFileSystem,
            fs_env_overlay,
            get_fs,
            join_path,
            path_scheme,
            rel_subpath,
        )
        from hive_dwrf_spark.format.memfs import PrefixMappedFS

        assert path_scheme("s3://b/x") == "s3"
        assert path_scheme("file:///x") is None
        assert path_scheme("/tmp/x") is None
        assert join_path("s3://b", "p=1", "f.dwrf") == "s3://b/p=1/f.dwrf"
        assert join_path("/tmp/x/", "a") == "/tmp/x/a"
        assert rel_subpath("s3://b/t/p=1/f", "s3://b/t") == "p=1/f"
        assert rel_subpath("s3://b/t", "s3://b/t") == ""
        with pytest.raises(ValueError):
            rel_subpath("s3://other/f", "s3://b/t")
        # no scheme -> process default; an UNROUTED non-file scheme must
        # fail loudly — the stock local fallback would silently write a
        # cwd-relative './zzz:/b/x' and lose the data on worker teardown
        assert isinstance(get_fs("/tmp/x"), LocalFileSystem)
        with pytest.raises(ValueError, match="no filesystem registered"):
            get_fs("zzz://b/x")
        # env factory resolves once per (scheme, spec, fs-env) and caches
        monkeypatch.setenv("SPARK_GRAFT_FS_MAPPED_ROOT", str(tmp_path))
        monkeypatch.setenv(
            "SPARK_GRAFT_FS_FACTORIES",
            "mock=hive_dwrf_spark.format.memfs:factory",
        )
        _SCHEME_FS.pop("mock", None)
        try:
            fs = get_fs("mock://b/x")
            assert isinstance(fs, PrefixMappedFS)
            assert get_fs("mock://b/y") is fs
            # a DIFFERENT config env must not reuse the first job's fs —
            # reused Python workers run many differently-configured jobs
            other_root = tmp_path / "other"
            other_root.mkdir()
            monkeypatch.setenv("SPARK_GRAFT_FS_MAPPED_ROOT", str(other_root))
            fs2 = get_fs("mock://b/x")
            assert fs2 is not fs
            monkeypatch.setenv("SPARK_GRAFT_FS_MAPPED_ROOT", str(tmp_path))
            assert get_fs("mock://b/x") is fs
            assert "SPARK_GRAFT_FS_FACTORIES" in fs_env_overlay()
        finally:
            _SCHEME_FS.pop("mock", None)

    def test_load_and_save_accept_file_uri(self, spark):
        from hive_dwrf_spark.sources import register

        register(spark)
        path = "/tmp/dwrf_sql_test_uri"
        _seed(spark, path)
        got = spark.read.format("dwrf").load(f"file:{path}").count()
        assert got == 2
        out = "/tmp/dwrf_sql_test_uri_out"
        shutil.rmtree(out, ignore_errors=True)
        spark.read.format("dwrf").load(path).write.format("dwrf").mode(
            "overwrite"
        ).save(f"file://{out}")
        assert spark.read.format("dwrf").load(out).count() == 2


class TestSqlSurface:
    def test_select_matches_dataframe_read(self, spark):
        from hive_dwrf_spark.sources.sql import create_temp_table

        path = "/tmp/dwrf_sql_test_select"
        _seed(spark, path)
        create_temp_table(spark, "t_sel", path)
        assert spark.sql("SELECT v FROM t_sel ORDER BY k").collect() == (
            spark.read.format("dwrf")
            .load(path)
            .select("v")
            .orderBy("k")
            .collect()
        )

    def test_insert_into_visible_after_refresh(self, spark):
        from hive_dwrf_spark.sources.sql import create_temp_table, refresh

        path = "/tmp/dwrf_sql_test_insert"
        _seed(spark, path)
        create_temp_table(spark, "t_ins", path)
        spark.sql("INSERT INTO t_ins VALUES (3, 'c')")
        refresh(spark, "t_ins")
        assert spark.sql("SELECT count(*) AS c FROM t_ins").first().c == 3
        # and the write really is on disk, not a session artifact
        assert spark.read.format("dwrf").load(path).count() == 3

    def test_insert_overwrite_replaces_content(self, spark):
        from hive_dwrf_spark.sources.sql import create_temp_table, refresh

        path = "/tmp/dwrf_sql_test_overwrite"
        _seed(spark, path)
        create_temp_table(spark, "t_ovr", path)
        spark.sql("INSERT OVERWRITE t_ovr VALUES (9, 'z')")
        refresh(spark, "t_ovr")
        assert [(r.k, r.v) for r in spark.sql(
            "SELECT * FROM t_ovr"
        ).collect()] == [(9, "z")]

    def test_insert_select_between_views(self, spark):
        from hive_dwrf_spark.sources.sql import create_temp_table, refresh

        src, dst = "/tmp/dwrf_sql_test_src", "/tmp/dwrf_sql_test_dst"
        _seed(spark, src, rows=((1, "a"), (2, "b"), (3, "c")))
        _seed(spark, dst, rows=((0, "seed"),))
        create_temp_table(spark, "t_src", src)
        create_temp_table(spark, "t_dst", dst)
        spark.sql(
            "INSERT OVERWRITE t_dst SELECT k * 10 AS k, upper(v) AS v"
            " FROM t_src WHERE k >= 2"
        )
        refresh(spark, "t_dst")
        assert sorted(
            (r.k, r.v) for r in spark.sql("SELECT * FROM t_dst").collect()
        ) == [(20, "B"), (30, "C")]

    def test_refresh_requires_registration(self, spark):
        from hive_dwrf_spark.sources.sql import refresh

        with pytest.raises(KeyError):
            refresh(spark, "never_created_this")

    def test_identifier_validation(self, spark):
        from hive_dwrf_spark.sources.sql import create_temp_table

        with pytest.raises(ValueError):
            create_temp_table(spark, "bad name; drop", "/tmp/x")
        with pytest.raises(ValueError):
            create_temp_table(spark, "ok_name", "/tmp/x", **{"bad key": "1"})

    def test_options_forwarded_to_writer(self, spark):
        """A compression option on the view applies to SQL INSERTs."""
        from hive_dwrf_spark.format.reader import DwrfFile
        from hive_dwrf_spark.sources.sql import create_temp_table

        path = "/tmp/dwrf_sql_test_opts"
        _seed(spark, path)
        before = set(os.listdir(path))
        create_temp_table(spark, "t_opt", path, compression="snappy")
        spark.sql("INSERT INTO t_opt VALUES (5, 'e')")
        new = [f for f in set(os.listdir(path)) - before
               if f.endswith(".dwrf")]
        assert len(new) == 1
        with DwrfFile(os.path.join(path, new[0])) as f:
            assert f.compression.name == "SNAPPY"

    def test_persistent_catalog_tables_unsupported(self, spark):
        """Documented Spark 4.1 gap: PythonDataSourceV2.getTable drops the
        table properties, so a persistent `CREATE TABLE ... USING dwrf`
        cannot carry its location into reads. If this test starts failing
        (i.e. the SELECT succeeds), Spark fixed the forwarding — promote
        create_temp_table to persistent DDL and retire this pin."""
        path = "/tmp/dwrf_sql_test_catalog"
        _seed(spark, path)
        spark.sql("DROP TABLE IF EXISTS t_catalog_pin")
        spark.sql(
            f"CREATE TABLE t_catalog_pin USING dwrf LOCATION '{path}'"
        )
        try:
            with pytest.raises(Exception, match="path"):
                spark.sql("SELECT * FROM t_catalog_pin").collect()
        finally:
            spark.sql("DROP TABLE IF EXISTS t_catalog_pin")

    def test_persistent_table_workaround_roundtrip(self, spark, tmp_path):
        """The shipped workaround for the pin above: create_table issues
        real persistent DDL (catalog keeps name/location/options), and
        attach_catalog_tables re-binds every cataloged dwrf table as a
        readable temp view — the one call a new session makes. Probed
        round 10: the session-conf route is closed too
        (PythonDataSourceV2 implements no SessionConfigSupport), so this
        catalog-rebind is the supported persistent-table path."""
        from hive_dwrf_spark.sources import register
        from hive_dwrf_spark.sources.sql import (
            attach_catalog_tables,
            create_table,
            drop_table,
            refresh,
        )

        register(spark)
        path = str(tmp_path / "ptab")
        _seed(spark, path)
        spark.sql("DROP TABLE IF EXISTS t_persist")
        create_table(spark, "t_persist", path, compression="snappy")
        try:
            assert (
                spark.sql("SELECT count(*) c FROM t_persist").collect()[0].c
                == 2
            )
            # simulate a fresh session: the view binding is gone, only
            # the catalog DDL remains — reads hit the getTable gap again
            spark.catalog.dropTempView("t_persist")
            with pytest.raises(Exception, match="path"):
                spark.sql("SELECT * FROM t_persist").collect()
            assert "t_persist" in attach_catalog_tables(spark)
            assert (
                spark.sql("SELECT count(*) c FROM t_persist").collect()[0].c
                == 2
            )
            # stored storage properties came back from the catalog
            from hive_dwrf_spark.sources.sql import _registry

            assert _registry(spark)["t_persist"]["compression"] == "snappy"
            # DML routes through the binding like any temp table
            spark.sql("INSERT INTO t_persist VALUES (9, 'z')")
            refresh(spark, "t_persist")
            assert (
                spark.sql("SELECT count(*) c FROM t_persist").collect()[0].c
                == 3
            )
        finally:
            drop_table(spark, "t_persist")


class TestSqlSurfaceQuery:
    def test_format_sql_surface_matches_oracle(self, spark, duck):
        from hive_dwrf_spark.queries import load_registry
        from tests.conftest import register_duck_views
        from tests.oracle import compare_spark_duck

        queries, oracle = load_registry()
        df = queries["format_sql_surface"](spark, SF_SMOKE)
        register_duck_views(duck, SF_SMOKE)
        ok, msg = compare_spark_duck(df, duck, oracle["format_sql_surface"])
        assert ok, msg


class TestDwrfLookupUDTF:
    """SQL TVF serving surface (sources/udtf.py): footer-derived schema at
    analysis time, batched pruned lookups at eval."""

    @pytest.fixture(scope="class")
    def table(self, spark):
        from hive_dwrf_spark.sources import register

        register(spark)
        path = "/tmp/dwrf_sql_test_tvf"
        shutil.rmtree(path, ignore_errors=True)
        df = spark.createDataFrame(
            [(i, f"v{i}", [i, i * 2], {"f": i % 3}) for i in range(500)],
            "k int, v string, arr array<int>, st struct<f:int>",
        )
        df.orderBy("k").coalesce(2).write.format("dwrf").mode(
            "overwrite"
        ).save(path)
        return path

    def test_lookup_matches_filter(self, spark, table):
        got = spark.sql(
            f"SELECT k, v FROM dwrf_lookup('{table}', 'k',"
            " array(3, 250, 499)) ORDER BY k"
        ).collect()
        assert [(r.k, r.v) for r in got] == [
            (3, "v3"), (250, "v250"), (499, "v499")
        ]

    def test_nested_columns_roundtrip(self, spark, table):
        r = spark.sql(
            f"SELECT * FROM dwrf_lookup('{table}', 'k', array(7))"
        ).first()
        assert (r.k, r.v, r.arr, r.st.f) == (7, "v7", [7, 14], 1)

    def test_empty_and_absent_keys(self, spark, table):
        assert spark.sql(
            f"SELECT * FROM dwrf_lookup('{table}', 'k',"
            " array(100000, 100001))"
        ).count() == 0
        assert spark.sql(
            f"SELECT * FROM dwrf_lookup('{table}', 'k',"
            " slice(array(1), 1, 0))"
        ).count() == 0

    def test_unknown_key_column_fails_at_analysis(self, spark, table):
        with pytest.raises(Exception, match="no column"):
            spark.sql(
                f"SELECT * FROM dwrf_lookup('{table}', 'nope', array(1))"
            ).collect()

    def test_non_constant_path_rejected(self, spark, table):
        with pytest.raises(Exception, match="constant"):
            spark.sql(
                "SELECT * FROM dwrf_lookup(concat(rand()::string, 'x'),"
                " 'k', array(1))"
            ).collect()

    def test_null_keys_match_nothing(self, spark, table):
        got = spark.sql(
            f"SELECT k FROM dwrf_lookup('{table}', 'k',"
            " array(3, NULL, 250)) ORDER BY k"
        ).collect()
        assert [r.k for r in got] == [3, 250]
        assert spark.sql(
            f"SELECT * FROM dwrf_lookup('{table}', 'k',"
            " array(CAST(NULL AS INT)))"
        ).count() == 0

    def test_oversized_key_batch_rejected(self, spark, table, monkeypatch):
        """Past the serving-path limit the batch is a scan wearing a
        lookup's clothes — the TVF must reject with the scan-path
        guidance, not grind through the UDTF row channel. The limit is
        snapshotted at REGISTRATION (worker env is frozen at JVM start,
        so eval can't read a driver-side env change)."""
        from hive_dwrf_spark.sources.udtf import register_udtfs

        q = (
            f"SELECT * FROM dwrf_lookup('{table}', 'k',"
            f" array({','.join(str(i) for i in range(11))}))"
        )
        monkeypatch.setenv("SPARK_GRAFT_LOOKUP_MAX_KEYS", "10")
        spark._dwrf_udtfs_registered = False
        try:
            register_udtfs(spark)
            with pytest.raises(Exception, match="serving-path limit"):
                spark.sql(q).collect()
            # at the limit it still serves
            monkeypatch.setenv("SPARK_GRAFT_LOOKUP_MAX_KEYS", "11")
            spark._dwrf_udtfs_registered = False
            register_udtfs(spark)
            assert spark.sql(q).count() == 11
        finally:
            monkeypatch.undo()
            spark._dwrf_udtfs_registered = False
            register_udtfs(spark)


class TestIvfPersistedIndex:
    """Persisted IVF index (operators/similarity.py::ivf_build_index /
    ivf_search_index): DWRF centroids + cid-partitioned inverted lists;
    search equals the in-memory ivf_lloyd_topk bit-for-bit and the probed
    IN-filter prunes the unprobed cid= directories."""

    @pytest.fixture(scope="class")
    def corpus(self, spark):
        from hive_dwrf_spark.sources import register

        register(spark)
        import random

        rng = random.Random(7)
        rows = [
            (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(300)
        ]
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<float>"
        )

    def test_search_equals_in_memory(self, spark, corpus, tmp_path):
        from hive_dwrf_spark.operators import similarity

        idx = str(tmp_path / "ivf_idx")
        similarity.ivf_build_index(
            corpus, "embedding", "vec_id", idx, n_lists=4, rounds=2
        )
        q = [r.embedding for r in corpus.filter("vec_id = 0").collect()][0]
        q = [float(x) for x in q]
        got = similarity.ivf_search_index(
            spark, idx, "embedding", "vec_id", q, 10, nprobe=2
        ).collect()
        want = similarity.ivf_lloyd_topk(
            corpus, "embedding", "vec_id", q, 10, n_lists=4, nprobe=2
        ).collect()
        assert [(r.vec_id, r.dist_e8) for r in got] == [
            (r.vec_id, r.dist_e8) for r in want
        ]

    def test_probe_prunes_list_directories(self, spark, corpus, tmp_path):
        from pyspark.sql.datasource import In

        from hive_dwrf_spark.operators import similarity
        from hive_dwrf_spark.sources.dwrf_datasource import DwrfDataSource

        idx = str(tmp_path / "ivf_idx2")
        similarity.ivf_build_index(
            corpus, "embedding", "vec_id", idx, n_lists=4, rounds=2
        )
        src = DwrfDataSource({"path": f"{idx}/lists"})
        reader = src.reader(src.schema())
        list(reader.pushFilters([In(("cid",), (0, 2))]))
        parts = reader.partitions()
        assert parts, "probed partitions must survive"
        assert all(
            "cid=0" in p.path or "cid=2" in p.path for p in parts
        ), [p.path for p in parts]


class TestDwrfStatsUDTF:
    """dwrf_stats TVF: footer-merged per-column catalog rows from SQL."""

    def test_stats_rows(self, spark, tmp_path):
        from hive_dwrf_spark.sources import register

        register(spark)
        path = str(tmp_path / "stats_tvf")
        df = spark.createDataFrame(
            [(i, float(i) / 2, f"s{i}") for i in range(1000)],
            "k long, x double, s string",
        )
        df.repartition(3).write.format("dwrf").mode("overwrite").save(path)
        rows = {
            r.col_name: r
            for r in spark.sql(
                f"SELECT * FROM dwrf_stats('{path}')"
            ).collect()
        }
        assert rows["k"].n == 1000 and rows["k"].sum_int == 499500
        assert rows["k"].min_num == 0.0 and rows["k"].max_num == 999.0
        assert rows["x"].sum_int is None  # double: order-dependent sum
        assert rows["x"].max_num == 499.5
        # strings: count only, numerics NULL
        assert rows["s"].n == 1000 and rows["s"].min_num is None

    def test_non_constant_path_rejected(self, spark):
        from hive_dwrf_spark.sources import register

        register(spark)
        with pytest.raises(Exception, match="constant"):
            spark.sql(
                "SELECT * FROM dwrf_stats(concat(rand()::string, 'x'))"
            ).collect()


class TestDwrfVerifyUDTF:
    """dwrf_verify TVF: the CRC scrub from SQL — per-file status, never
    raising, so one rotten object doesn't hide the rest."""

    def test_ok_corrupt_and_unchecked(self, spark, tmp_path):
        import glob
        import os as _os

        from hive_dwrf_spark.sources import register

        register(spark)
        path = str(tmp_path / "verify_tvf")
        spark.range(3000).selectExpr("id AS k").coalesce(1).write.format(
            "dwrf"
        ).option("checksums", "true").option("stripe_rows", "1000").mode(
            "overwrite"
        ).save(path)
        rows = spark.sql(f"SELECT * FROM dwrf_verify('{path}')").collect()
        assert len(rows) == 1
        assert rows[0].status == "ok" and rows[0].stripes == 3
        assert rows[0].bytes_checked > 0
        # flip one data byte -> that file reports corrupt, with detail
        fp = glob.glob(_os.path.join(path, "*.dwrf"))[0]
        raw = bytearray(open(fp, "rb").read())
        raw[len(raw) // 3] ^= 0x01
        bad = str(tmp_path / "verify_tvf2")
        _os.makedirs(bad)
        open(_os.path.join(bad, "bad.dwrf"), "wb").write(bytes(raw))
        open(_os.path.join(bad, "good.dwrf"), "wb").write(
            open(fp, "rb").read()
        )
        # plus an un-checksummed member
        spark.range(5).selectExpr("id AS k").coalesce(1).write.format(
            "dwrf"
        ).mode("overwrite").save(str(tmp_path / "nocrc"))
        nc = glob.glob(str(tmp_path / "nocrc" / "*.dwrf"))[0]
        import shutil

        shutil.copy(nc, _os.path.join(bad, "plain.dwrf"))
        got = {
            _os.path.basename(r.file): r.status
            for r in spark.sql(f"SELECT * FROM dwrf_verify('{bad}')").collect()
        }
        assert got["good.dwrf"] == "ok"
        assert got["bad.dwrf"].startswith("corrupt:")
        assert got["plain.dwrf"] == "no checksums"

    def test_empty_path_is_an_error_row_not_a_clean_scrub(
        self, spark, tmp_path
    ):
        """A typo'd or empty path must not read as 'nothing corrupt':
        the TVF yields an explicit error row (the CLI variant exits 2)."""
        from hive_dwrf_spark.sources import register

        register(spark)
        empty = str(tmp_path / "nothing_here")
        import os as _os

        _os.makedirs(empty)
        rows = spark.sql(f"SELECT * FROM dwrf_verify('{empty}')").collect()
        assert len(rows) == 1
        assert rows[0].status == "error: no data files found"
        assert rows[0].stripes is None


def test_dwrf_lookup_lateral_join(spark, tmp_path):
    """The TVF composes as a correlated LATERAL source: one pruned
    lookup per driving row (per-key serving joins straight from SQL).
    For key-table-sized batches, prefer one call with the whole array —
    LATERAL pays a lookup per row by construction."""
    from hive_dwrf_spark.sources import register

    register(spark)
    path = str(tmp_path / "lat")
    spark.createDataFrame(
        [(i, f"v{i}") for i in range(100)], "k int, v string"
    ).coalesce(1).write.format("dwrf").mode("overwrite").save(path)
    spark.createDataFrame([(3,), (7,)], "id int").createOrReplaceTempView(
        "lat_keys"
    )
    got = spark.sql(
        f"SELECT lat_keys.id, l.v FROM lat_keys, LATERAL"
        f" dwrf_lookup('{path}', 'k', array(lat_keys.id)) l ORDER BY id"
    ).collect()
    assert [(r.id, r.v) for r in got] == [(3, "v3"), (7, "v7")]


def test_package_level_wrappers_and_drop(spark, tmp_path):
    """The sources-package re-exports (create/refresh/drop) are the
    documented entry points — exercise them end to end."""
    from hive_dwrf_spark.sources import (
        create_temp_table,
        drop_temp_table,
        refresh_temp_table,
        register,
    )

    register(spark)
    path = str(tmp_path / "wrap")
    spark.createDataFrame([(1, "a")], "k int, v string").coalesce(
        1
    ).write.format("dwrf").mode("overwrite").save(path)
    create_temp_table(spark, "t_wrap", path)
    assert spark.sql("SELECT count(*) c FROM t_wrap").first().c == 1
    spark.sql("INSERT INTO t_wrap VALUES (2, 'b')")
    refresh_temp_table(spark, "t_wrap")
    assert spark.sql("SELECT count(*) c FROM t_wrap").first().c == 2
    drop_temp_table(spark, "t_wrap")
    assert "t_wrap" not in [
        t.name for t in spark.catalog.listTables()
    ]
    # dropping again is a no-op, and refresh after drop raises
    drop_temp_table(spark, "t_wrap")
    with pytest.raises(KeyError):
        refresh_temp_table(spark, "t_wrap")
