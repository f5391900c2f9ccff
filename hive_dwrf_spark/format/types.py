"""DWRF type tree ⇄ Arrow schema ⇄ Spark StructType.

The DWRF footer stores a pre-order-numbered flat list of Type messages
(orc_proto.proto:76-96): column 0 is the root STRUCT, children follow in
pre-order (WriterImpl.writeTypes / RecordReaderImpl.java:177-233).

UNION has no Arrow/Spark-native analog here; we map it to a STRUCT of
(tag: BYTE, field0, field1, ...) on read, and a struct whose first field is
named "tag" round-trips back to UNION only when explicitly requested.

DATE/DECIMAL do not exist in DWRF (the fork predates them); Spark DateType
is stored as INT days-since-epoch with a user-metadata annotation
("dwrf.spark.date.columns") so our reader restores the logical type.
"""

from __future__ import annotations

import pyarrow as pa

from . import proto
from .constants import TypeKind

_PRIMITIVE_ARROW = {
    TypeKind.BOOLEAN: pa.bool_(),
    TypeKind.BYTE: pa.int8(),
    TypeKind.SHORT: pa.int16(),
    TypeKind.INT: pa.int32(),
    TypeKind.LONG: pa.int64(),
    TypeKind.FLOAT: pa.float32(),
    TypeKind.DOUBLE: pa.float64(),
    TypeKind.STRING: pa.string(),
    TypeKind.BINARY: pa.binary(),
    TypeKind.TIMESTAMP: pa.timestamp("us"),
}


def arrow_to_typekind(t: pa.DataType) -> TypeKind:
    if pa.types.is_boolean(t):
        return TypeKind.BOOLEAN
    if pa.types.is_int8(t):
        return TypeKind.BYTE
    if pa.types.is_int16(t):
        return TypeKind.SHORT
    if pa.types.is_int32(t):
        return TypeKind.INT
    if pa.types.is_int64(t):
        return TypeKind.LONG
    if pa.types.is_float32(t):
        return TypeKind.FLOAT
    if pa.types.is_float64(t):
        return TypeKind.DOUBLE
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return TypeKind.STRING
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return TypeKind.BINARY
    if pa.types.is_timestamp(t):
        return TypeKind.TIMESTAMP
    if pa.types.is_date32(t):
        return TypeKind.INT  # extension: dates stored as days-since-epoch
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return TypeKind.LIST
    if pa.types.is_map(t):
        return TypeKind.MAP
    if pa.types.is_struct(t):
        return TypeKind.STRUCT
    raise TypeError(f"unsupported arrow type for DWRF: {t}")


def schema_to_type_tree(
    schema: pa.Schema, union_columns: set[str] | None = None
) -> list[proto.Type]:
    """Arrow schema -> pre-order flat Type list (root STRUCT at id 0).

    Top-level struct columns named in `union_columns` — which must have the
    tagged-struct shape (tag: int8, field0, field1, ...) — are emitted as
    true DWRF UNION nodes (orc_proto.proto:90-92): the branches become the
    union's subtypes and the tag field becomes the byte-RLE tag stream."""
    types: list[proto.Type] = []

    def add(t: pa.DataType, as_union: bool = False) -> int:
        my_id = len(types)
        if as_union:
            if not (
                pa.types.is_struct(t)
                and t.num_fields >= 2
                and t.field(0).name == "tag"
                and pa.types.is_int8(t.field(0).type)
            ):
                raise TypeError(
                    "union column must be struct<tag: int8, field0, ...>; "
                    f"got {t}"
                )
            msg = proto.Type(kind=int(TypeKind.UNION))
            types.append(msg)
            for f in list(t)[1:]:
                msg.subtypes.append(add(f.type))
            return my_id
        kind = arrow_to_typekind(t)
        msg = proto.Type(kind=int(kind))
        types.append(msg)
        if kind == TypeKind.LIST:
            msg.subtypes.append(add(t.value_type))
        elif kind == TypeKind.MAP:
            msg.subtypes.append(add(t.key_type))
            msg.subtypes.append(add(t.item_type))
        elif kind == TypeKind.STRUCT:
            for f in t:
                msg.fieldNames.append(f.name)
                msg.subtypes.append(add(f.type))
        return my_id

    root = proto.Type(kind=int(TypeKind.STRUCT))
    types.append(root)
    for f in schema:
        root.fieldNames.append(f.name)
        root.subtypes.append(
            add(f.type, as_union=bool(union_columns and f.name in union_columns))
        )
    return types


def arrow_type_of(
    types: list[proto.Type], type_id: int, overrides: dict[int, pa.DataType] | None = None
) -> pa.DataType:
    """Arrow type of any node in the flat pre-order type tree.

    `overrides` maps type ids to replacement arrow types (used to restore
    logical types DWRF cannot express, e.g. timestamp[ns])."""
    if overrides and type_id in overrides:
        return overrides[type_id]
    t = types[type_id]
    kind = TypeKind(t.kind)
    if kind in _PRIMITIVE_ARROW:
        return _PRIMITIVE_ARROW[kind]
    if kind == TypeKind.LIST:
        return pa.list_(arrow_type_of(types, t.subtypes[0], overrides))
    if kind == TypeKind.MAP:
        return pa.map_(
            arrow_type_of(types, t.subtypes[0], overrides),
            arrow_type_of(types, t.subtypes[1], overrides),
        )
    if kind == TypeKind.STRUCT:
        return pa.struct(
            [
                pa.field(n, arrow_type_of(types, s, overrides))
                for n, s in zip(t.fieldNames, t.subtypes)
            ]
        )
    if kind == TypeKind.UNION:
        fields = [pa.field("tag", pa.int8())] + [
            pa.field(f"field{i}", arrow_type_of(types, s, overrides))
            for i, s in enumerate(t.subtypes)
        ]
        return pa.struct(fields)
    raise TypeError(f"unsupported DWRF type kind {kind}")


def type_tree_to_schema(
    types: list[proto.Type], overrides: dict[int, pa.DataType] | None = None
) -> pa.Schema:
    root = types[0]
    return pa.schema(
        [
            pa.field(n, arrow_type_of(types, s, overrides))
            for n, s in zip(root.fieldNames, root.subtypes)
        ]
    )


def collect_arrow_types(
    schema: pa.Schema, union_columns: set[str] | None = None
) -> dict[int, pa.DataType]:
    """type id -> source arrow type, walking the same pre-order as
    schema_to_type_tree.

    `union_columns` MUST match what was passed to schema_to_type_tree: a
    union column's tagged struct is numbered as ONE node (the UNION) whose
    tag field is the tag stream, not a child type node — so the tag field
    is skipped here exactly as schema_to_type_tree skips it."""
    out: dict[int, pa.DataType] = {}
    counter = [0]

    def walk(t: pa.DataType, as_union: bool = False) -> None:
        my_id = counter[0]
        counter[0] += 1
        out[my_id] = t
        if as_union:
            # branches only; the tag field is the UNION node's own stream
            for f in list(t)[1:]:
                walk(f.type)
        elif pa.types.is_list(t) or pa.types.is_large_list(t):
            walk(t.value_type)
        elif pa.types.is_map(t):
            walk(t.key_type)
            walk(t.item_type)
        elif pa.types.is_struct(t):
            for f in t:
                walk(f.type)

    counter[0] = 1  # root struct is id 0
    for f in schema:
        walk(f.type, as_union=bool(union_columns and f.name in union_columns))
    return out


def num_columns(types: list[proto.Type]) -> int:
    return len(types)


def subtree_ids(types: list[proto.Type], type_id: int) -> list[int]:
    """All type ids in the subtree rooted at type_id (pre-order)."""
    out = [type_id]
    for s in types[type_id].subtypes:
        out.extend(subtree_ids(types, s))
    return out
