"""Spark Python DataSource for the DWRF format: spark.read.format("dwrf").

Maps the reference's Hive integration points onto Spark's DataSource API:

- OrcInputFormat split planning (one split per stripe byte range,
  OrcInputFormat.java:165-181) -> one InputPartition per (file, stripe);
  Spark schedules them across executors, so scan parallelism scales with
  stripes exactly like the reference's MR splits.
- OrcSerde row bridge (OrcSerde.java:43-139) -> Arrow RecordBatch exchange
  (zero row-at-a-time conversion on either side).
- Column projection pushdown (OrcInputFormat.java:121-163) -> the driver
  passes only needed columns via the "columns" option (set automatically by
  our helpers) or full schema reads; per-stripe decode only touches
  requested columns' streams either way.
- Predicate pushdown -> pushFilters() receives Catalyst filters; supported
  conjuncts are evaluated against file and stride statistics to prune whole
  files/stripes (the stats-evaluation layer the reference leaves to its host
  engine — SURVEY.md §4 O2/O3). All filters are also reported back as
  unsupported so Spark re-applies them for exactness; pruning is purely an
  IO optimization.

At 100 TB: planning reads only file footers (stripe directories); data IO
happens in executors, one stripe per task, so no driver bottleneck beyond
the file listing itself.
"""

from __future__ import annotations

import os
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    EqualNullSafe,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    IsNotNull,
    IsNull,
    LessThan,
    LessThanOrEqual,
    StringStartsWith,
    WriterCommitMessage,
)
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    ByteType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    ShortType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
    TimestampType,
)


def _list_dwrf_files(path: str) -> list[str]:
    if os.path.isfile(path):
        return [path]
    out = []
    for root, _dirs, files in os.walk(path):
        for fn in sorted(files):
            if fn.endswith((".dwrf", ".orc")) and not fn.startswith(("_", ".")):
                out.append(os.path.join(root, fn))
    if not out:
        raise FileNotFoundError(f"no .dwrf files under {path}")
    return out


def _arrow_to_spark_type(t):
    import pyarrow as pa

    if pa.types.is_boolean(t):
        return BooleanType()
    if pa.types.is_int8(t):
        return ByteType()
    if pa.types.is_int16(t):
        return ShortType()
    if pa.types.is_int32(t):
        return IntegerType()
    if pa.types.is_int64(t):
        return LongType()
    if pa.types.is_float32(t):
        return FloatType()
    if pa.types.is_float64(t):
        return DoubleType()
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return StringType()
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return BinaryType()
    if pa.types.is_timestamp(t):
        return TimestampNTZType()
    if pa.types.is_list(t):
        return ArrayType(_arrow_to_spark_type(t.value_type))
    if pa.types.is_map(t):
        return MapType(
            _arrow_to_spark_type(t.key_type), _arrow_to_spark_type(t.item_type)
        )
    if pa.types.is_struct(t):
        return StructType(
            [StructField(f.name, _arrow_to_spark_type(f.type)) for f in t]
        )
    raise TypeError(f"unsupported arrow type {t}")


def _spark_to_arrow_type(t):
    import pyarrow as pa

    mapping = {
        BooleanType: pa.bool_(),
        ByteType: pa.int8(),
        ShortType: pa.int16(),
        IntegerType: pa.int32(),
        LongType: pa.int64(),
        FloatType: pa.float32(),
        DoubleType: pa.float64(),
        StringType: pa.string(),
        BinaryType: pa.binary(),
        TimestampType: pa.timestamp("us"),
        TimestampNTZType: pa.timestamp("us"),
    }
    for cls, at in mapping.items():
        if isinstance(t, cls):
            return at
    if isinstance(t, ArrayType):
        return pa.list_(_spark_to_arrow_type(t.elementType))
    if isinstance(t, MapType):
        return pa.map_(
            _spark_to_arrow_type(t.keyType), _spark_to_arrow_type(t.valueType)
        )
    if isinstance(t, StructType):
        return pa.struct(
            [pa.field(f.name, _spark_to_arrow_type(f.dataType)) for f in t.fields]
        )
    raise TypeError(f"unsupported spark type {t}")


_FILTER_OPS = {
    EqualTo: "eq",
    EqualNullSafe: "eq",  # null-safe value compare prunes like eq; a null
    # value raises TypeError in the stats check and is treated as may-match
    GreaterThan: "gt",
    GreaterThanOrEqual: "gte",
    LessThan: "lt",
    LessThanOrEqual: "lte",
    In: "in",
    IsNull: "is_null",
    IsNotNull: "is_not_null",
    StringStartsWith: "starts_with",
}


def _convert_filter(f) -> tuple | None:
    """Catalyst Filter -> (column, op, value) or None if unsupported."""
    op = _FILTER_OPS.get(type(f))
    if op is None:
        return None
    attr = f.attribute
    if len(attr) != 1:  # nested paths not used for stats pruning
        return None
    value = getattr(f, "value", None)
    if op == "in":
        value = getattr(f, "values", None)
    if isinstance(value, (list, tuple)) or value is None or isinstance(
        value, (int, float, str, bool)
    ):
        return (attr[0], op, value)
    return None


@dataclass
class _StripePartition(InputPartition):
    path: str
    stripe_index: int


@dataclass
class _WriteResult(WriterCommitMessage):
    path: str
    rows: int


class DwrfReader(DataSourceReader):
    def __init__(self, schema: StructType, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("dwrf reader requires a path")
        self.schema = schema
        columns_opt = options.get("columns")
        self.columns = columns_opt.split(",") if columns_opt else None
        self._filters: list[tuple] = []

    def pushFilters(self, filters):
        for f in filters:
            conv = _convert_filter(f)
            if conv is not None:
                self._filters.append(conv)
            # report everything unsupported: Spark re-applies all predicates;
            # our pruning is IO-level only, never semantic
            yield f

    def partitions(self):
        from ..format.reader import DwrfFile

        parts = []
        for path in _list_dwrf_files(self.path):
            with DwrfFile(path) as f:
                if self._filters and not f._filter_may_match_stats(
                    self._filters, lambda tid: f.file_stats(tid)
                ):
                    continue  # whole file pruned by footer stats
                for i in range(len(f.footer.stripes)):
                    parts.append(_StripePartition(path=path, stripe_index=i))
        if not parts:
            # Spark requires >=1 partition; emit an empty sentinel
            parts.append(_StripePartition(path="", stripe_index=-1))
        return parts

    def read(self, partition: _StripePartition):
        import pyarrow as pa

        from ..format.reader import DwrfFile

        if partition.stripe_index < 0:
            return
        with DwrfFile(partition.path) as f:
            table = f.read_stripe(
                partition.stripe_index,
                columns=self.columns,
                filters=self._filters or None,
            )
        if table is None:
            return
        # Spark cannot consume ns timestamps; truncate to us at the edge
        fields = []
        changed = False
        for fld in table.schema:
            if pa.types.is_timestamp(fld.type) and fld.type.unit == "ns":
                fields.append(pa.field(fld.name, pa.timestamp("us")))
                changed = True
            else:
                fields.append(fld)
        if changed:
            table = table.cast(pa.schema(fields), safe=False)
        yield from table.to_batches()


class DwrfWriter(DataSourceArrowWriter):
    def __init__(self, schema: StructType, options, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("dwrf writer requires a path")
        self.options = dict(options)
        self.overwrite = overwrite
        self.schema = schema

    def write(self, iterator):
        import pyarrow as pa

        from ..format.writer import DwrfWriter as FileWriter, _normalize_schema

        os.makedirs(self.path, exist_ok=True)
        filename = f"part-{uuid.uuid4().hex[:16]}.dwrf"
        out_path = os.path.join(self.path, filename)
        opts = {}
        if "compression" in self.options:
            opts["compression"] = self.options["compression"]
        if "stripe_rows" in self.options:
            opts["stripe_rows"] = int(self.options["stripe_rows"])
        if "row_index_stride" in self.options:
            opts["row_index_stride"] = int(self.options["row_index_stride"])
        rows = 0
        writer = None
        for batch in iterator:
            if writer is None:
                schema = _normalize_schema(batch.schema)
                writer = FileWriter(out_path, schema, **opts)
            writer.write_batch(batch)
            rows += batch.num_rows
        if writer is None:  # empty task: write a zero-row file for the schema
            arrow_schema = _normalize_schema(
                pa.schema(
                    [
                        pa.field(f.name, _spark_to_arrow_type(f.dataType))
                        for f in self.schema.fields
                    ]
                )
            )
            writer = FileWriter(out_path, arrow_schema, **opts)
        writer.close()
        return _WriteResult(path=out_path, rows=rows)

    def commit(self, messages):
        if self.overwrite:
            keep = {os.path.basename(m.path) for m in messages if m is not None}
            for fn in os.listdir(self.path):
                if fn.endswith(".dwrf") and fn not in keep:
                    os.remove(os.path.join(self.path, fn))
        with open(os.path.join(self.path, "_SUCCESS"), "w") as f:
            for m in messages:
                if m is not None:
                    f.write(f"{os.path.basename(m.path)}\t{m.rows}\n")

    def abort(self, messages):
        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)


class DwrfDataSource(DataSource):
    """spark.read.format("dwrf") / df.write.format("dwrf")."""

    @classmethod
    def name(cls) -> str:
        return "dwrf"

    def schema(self):
        from ..format.reader import DwrfFile

        path = self.options.get("path")
        if not path:
            raise ValueError("dwrf source requires a path")
        first = _list_dwrf_files(path)[0]
        with DwrfFile(first) as f:
            fields = [
                StructField(
                    f.schema.field(i).name,
                    _arrow_to_spark_type(f.schema.field(i).type),
                )
                for i in range(len(f.schema))
            ]
        columns_opt = self.options.get("columns")
        if columns_opt:
            by_name = {fl.name: fl for fl in fields}
            fields = [by_name[c] for c in columns_opt.split(",")]
        return StructType(fields)

    def reader(self, schema: StructType) -> DwrfReader:
        return DwrfReader(schema, self.options)

    def writer(self, schema: StructType, overwrite: bool) -> DwrfWriter:
        return DwrfWriter(schema, self.options, overwrite)


def register(spark) -> None:
    """Register the dwrf format with a SparkSession (idempotent)."""
    spark.dataSource.register(DwrfDataSource)
