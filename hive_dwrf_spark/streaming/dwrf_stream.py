"""Structured Streaming over DWRF directories.

The reference is a batch format (SURVEY.md §2.B: no streaming), but its
Hive deployments tail partition directories; the Spark-native equivalent is
a file-discovery stream: each micro-batch picks up newly arrived .dwrf
files. The offset is the SET of processed file names (not a positional
index into the sorted listing): writers emit part-<uuid> names, so a new
file may sort anywhere in the listing, and an index offset would both skip
it and re-emit already-read files. Each batch = listing minus processed
names; restarts resume from the checkpointed name set exactly.

Scale notes: discovery is a directory listing per micro-batch (cheap); rows
are decoded executor-side via the same stripe reader as the batch source.
The simple reader re-reads on the driver by design (Spark's
SimpleDataSourceStreamReader contract) — fine for the moderate per-batch
volumes a file stream implies; a partition-planning DataSourceStreamReader
is the upgrade path for firehose rates.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader
from pyspark.sql.types import StructType


def _dwrf_files(path: str) -> list[str]:
    if not os.path.isdir(path):
        return []
    return sorted(
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".dwrf") and not f.startswith(("_", "."))
    )


class _DwrfStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, schema: StructType, options):
        self.path = options.get("path")
        self.schema = schema

    def initialOffset(self) -> dict:
        return {"processed": []}

    def _processed(self, offset: dict) -> set[str]:
        # legacy index offsets ({"file_index": N}) from pre-fix checkpoints
        # map to "first N names of the current sorted listing" — best-effort
        if "file_index" in offset:
            listing = [os.path.basename(p) for p in _dwrf_files(self.path)]
            return set(listing[: offset["file_index"]])
        return set(offset.get("processed", []))

    def _rows_for(self, paths: list[str]):
        # returns a materialized list: Spark pickles the prefetched batch
        # between read() and commit(), so the result must be serializable
        DwrfStreamDataSource._bootstrap()
        from hive_dwrf_spark.format.reader import DwrfFile

        names = [f.name for f in self.schema.fields]
        rows: list[tuple] = []
        for fp in paths:
            with DwrfFile(fp) as f:
                table = f.read(columns=names)
            rows.extend(
                tuple(row[n] for n in names) for row in table.to_pylist()
            )
        # list_iterator: a real iterator (Spark requires one) that still
        # pickles for the prefetch cache
        return iter(rows)

    def read(self, start: dict):
        done = self._processed(start)
        fresh = [
            p for p in _dwrf_files(self.path) if os.path.basename(p) not in done
        ]
        end = {"processed": sorted(done | {os.path.basename(p) for p in fresh})}
        return self._rows_for(fresh), end

    def readBetweenOffsets(self, start: dict, end: dict):
        done = self._processed(start)
        batch = self._processed(end) - done
        return self._rows_for(
            sorted(os.path.join(self.path, name) for name in batch)
        )


class DwrfStreamDataSource(DataSource):
    """spark.readStream.format("dwrf_stream").option("path", dir).

    Spark's streaming-source planner runs this class in a separate
    driver-side Python process that does NOT receive the session's pyFiles
    (unlike executor workers and the batch planner), so the class is
    registered pickled BY VALUE (stream_dwrf_dir below) and lazily imports
    the format core through _bootstrap(), which falls back to the import
    roots recorded at registration time (package dir + shipped zip — both
    driver-local paths, and this reader is a driver-side component)."""

    #: candidate sys.path roots for importing hive_dwrf_spark in the
    #: planner subprocess; set at registration, pickled with the class
    _import_roots: list[str] = []

    @classmethod
    def _bootstrap(cls) -> None:
        import importlib
        import sys

        try:
            importlib.import_module("hive_dwrf_spark")
            return
        except ModuleNotFoundError:
            pass
        for root in cls._import_roots:
            if root and os.path.exists(root) and root not in sys.path:
                sys.path.insert(0, root)
        importlib.invalidate_caches()
        importlib.import_module("hive_dwrf_spark")

    @classmethod
    def name(cls) -> str:
        return "dwrf_stream"

    def schema(self):
        self._bootstrap()
        from hive_dwrf_spark.format.reader import DwrfFile
        from hive_dwrf_spark.sources.dwrf_datasource import _arrow_to_spark_type
        from pyspark.sql.types import StructField

        files = _dwrf_files(self.options.get("path", ""))
        if not files:
            raise ValueError("dwrf_stream requires a path with at least one .dwrf file")
        with DwrfFile(files[0]) as f:
            return StructType(
                [
                    StructField(
                        f.schema.field(i).name,
                        _arrow_to_spark_type(f.schema.field(i).type),
                    )
                    for i in range(len(f.schema))
                ]
            )

    def simpleStreamReader(self, schema: StructType):
        return _DwrfStreamReader(schema, self.options)


def stream_dwrf_dir(spark: SparkSession, path: str) -> DataFrame:
    """Open a DWRF directory as a structured stream."""
    import sys

    from pyspark import cloudpickle

    from ..shipping import _package_zip, ensure_shipped

    ensure_shipped(spark)
    pkg_parent = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    DwrfStreamDataSource._import_roots = [pkg_parent, _package_zip()]
    # by-value pickling: the streaming planner subprocess can't import this
    # module by name (no pyFiles there) — ship the code inside the pickle
    cloudpickle.register_pickle_by_value(sys.modules[__name__])
    spark.dataSource.register(DwrfStreamDataSource)
    return spark.readStream.format("dwrf_stream").option("path", path).load()


def windowed_event_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window counts — the canonical late-data-tolerant
    streaming aggregate (works identically on batch DataFrames)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("win"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.col("win.start").alias("window_start"),
            key_col,
            "cnt",
        )
    )


def sessionize(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Session windows per user with an inactivity gap (state handled by
    Spark's session_window, spilling + watermark eviction built in)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("sess"), F.col(user_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ts_col).alias("first_ts"),
            F.max(ts_col).alias("last_ts"),
        )
        .select(
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            user_col,
            "n_events",
            "first_ts",
            "last_ts",
        )
    )


def stateful_running_counts(
    events: DataFrame, key_col: str = "event_type"
) -> DataFrame:
    """Custom stateful streaming operator via applyInPandasWithState: a
    per-key running event counter whose state survives across micro-batches
    (the arbitrary-state surface Spark offers where built-in windowed aggs
    don't fit; state lives in the state store, one entry per key, so memory
    scales with distinct keys — not with the stream).

    Emits one (key, running_total) row per key per micro-batch that saw the
    key ("update" semantics)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(key, pdfs, state):
        total = state.get[0] if state.exists else 0
        for pdf in pdfs:
            total += len(pdf)
        state.update((total,))
        yield pd.DataFrame({key_col: [key[0]], "running_total": [total]})

    return events.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=f"{key_col} string, running_total bigint",
        stateStructType="total bigint",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_dedup(
    events: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming exact dedup: keep the first occurrence of each key combo,
    with state bounded by the watermark (dropDuplicatesWithinWatermark —
    a duplicate arriving within the lateness window is dropped; state for
    keys older than the watermark is evicted, so state size tracks the
    window's key cardinality, not the stream's).

    The training-pipeline shape: dedup document/event ids at ingest before
    they reach storage. Works identically on batch frames (plain
    dropDuplicates semantics there)."""
    if events.isStreaming:
        return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            keys
        )
    return events.dropDuplicates(keys)


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts_col: str = "ts",
    lookback: str = "10 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked stream-stream inner join: each left row matches right
    rows with the same key whose timestamp falls in
    [left.ts - lookback, left.ts].

    The time-range condition is what makes this feasible unbounded: Spark
    keeps join state only for rows inside watermark + lookback, so state
    size tracks the window's row rate, not stream length. The same plan
    runs in batch (the watermark is a no-op there)."""
    l = left.withWatermark(ts_col, watermark).alias("l")
    r = right.withWatermark(ts_col, watermark).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{ts_col}") >= F.expr(f"l.{ts_col} - INTERVAL {lookback}"))
        & (F.col(f"r.{ts_col}") <= F.col(f"l.{ts_col}"))
    )
    return l.join(r, cond, "inner")
