"""Multi-file batched point lookup — the serving surface over a
directory of DWRF files.

Reference parity (SURVEY §2 A5): the reference exposes seekToRow on one
open reader (RecordReaderImpl.java:494-543) and leaves file routing to
the host engine, which prunes files/stripes with the footer statistics
(ReaderImpl.java:204-260). At serving scale the table is thousands of
range-sorted files and callers look up key BATCHES, so this module does
both halves in one pass:

  file level   : each file's footer column statistics (min/max of the
                 key column — zero data bytes read) prune files that
                 cannot contain any requested key;
  stride level : within a surviving file, the key column's ROW_INDEX
                 per-stride statistics prune strides the same way;
  decode level : each candidate stride of the key column is decoded
                 ONCE, matched vectorized (arrow is_in), and only the
                 matching rows' projected columns are gathered — via the
                 same LRU point-decoder cache DwrfFile.read_row uses, so
                 footer / stripe-footer / index parses amortize across
                 the whole batch.

On a range-sorted 100 TB table a k-key batch therefore touches
O(files-holding-keys) footers + O(strides-holding-keys) stride decodes,
independent of table width and row count.
"""

from __future__ import annotations

import bisect

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .reader import DwrfFile, NoStridePositions, _corrupt_guard
from .stats import stats_from_proto
from .types import TypeKind


def _list_files(path: str) -> list[str]:
    from .fs import get_fs

    out = get_fs(path).list_files(path, (".dwrf", ".orc"))
    if not out:
        raise FileNotFoundError(f"no .dwrf files under {path}")
    return sorted(out)


def _any_key_in_range(keys_sorted: list, mn, mx) -> bool:
    """May [mn, mx] contain one of the sorted keys? Missing bounds
    (all-null column, statless legacy file) can never prune."""
    if mn is None or mx is None:
        return True
    j = bisect.bisect_left(keys_sorted, mn)
    return j < len(keys_sorted) and keys_sorted[j] <= mx


def _match_offsets(karr: pa.Array, key_set: pa.Array) -> np.ndarray:
    """Positions in `karr` whose value is one of the keys (nulls never
    match)."""
    mask = pc.fill_null(pc.is_in(karr, value_set=key_set), False)
    return np.flatnonzero(mask.to_numpy(zero_copy_only=False))


def lookup_keys(
    path: str,
    key_column: str,
    keys,
    columns: list[str] | None = None,
    trace: dict | None = None,
) -> pa.Table:
    """Fetch every row of the DWRF table under `path` whose `key_column`
    value is in `keys`, as ONE pyarrow Table (rows in file/row order; a
    key occurring on several rows returns all of them, an absent key
    returns none). `columns` projects the output (the key column is
    decoded for matching regardless and appears in the output only if
    projected). Pass a dict as `trace` to observe the pruning decisions
    ({files_total, files_pruned, strides_total, strides_scanned}).
    """
    # NULL keys match no row (SQL equality semantics) — drop them before
    # sorting, where None is unorderable; mixed int/string keys likewise
    # can't order, surface that as a clear error instead of a TypeError
    dedup = set(k for k in keys if k is not None)
    try:
        key_list = sorted(dedup)
    except TypeError:
        kinds = sorted({type(k).__name__ for k in dedup})
        raise ValueError(
            f"lookup_keys: keys must share one orderable type, got {kinds}"
        ) from None
    if not key_list:
        raise ValueError("lookup_keys requires at least one non-null key")
    key_set = pa.array(key_list)
    files = _list_files(path)
    if trace is not None:
        trace.update(
            files_total=len(files),
            files_pruned=0,
            strides_total=0,
            strides_scanned=0,
        )
    out_chunks: dict[str, list[pa.Array]] = {}
    schema: pa.Schema | None = None
    for fp in files:
        with DwrfFile(fp) as f:
            key_tid = f._top_level_id(key_column)
            if key_tid is None:
                raise KeyError(f"{key_column!r} not in {fp}")
            if columns is not None:
                tops, include_ids = f._parse_projection(columns)
                if schema is None:
                    schema = f.projected_schema(columns)
                # the key column must reach the decoder even when the
                # projection drops it from the output
                if include_ids is not None and key_tid not in include_ids:
                    from .types import subtree_ids

                    include_ids = include_ids | set(
                        subtree_ids(f.types, key_tid)
                    )
            else:
                root = f.types[0]
                tops = list(zip(root.fieldNames, root.subtypes))
                include_ids = None
                if schema is None:
                    schema = f.schema
            if f.num_rows == 0:
                continue
            # --- file-level pruning: footer stats only, no data bytes ---
            st = f.file_stats(key_tid)
            if not _any_key_in_range(key_list, st.minimum, st.maximum):
                if trace is not None:
                    trace["files_pruned"] += 1
                continue
            kind = TypeKind(f.types[key_tid].kind)
            stride = f.footer.rowIndexStride
            index_ids = {tid for _, tid in tops} | {key_tid}
            with _corrupt_guard(fp):
                for i, stripe in enumerate(f.footer.stripes):
                    n_rows = stripe.numberOfRows
                    if n_rows == 0:
                        continue
                    dec = f._point_decoder(i, include_ids, index_ids)
                    n_strides = (n_rows + stride - 1) // stride if stride else 1
                    if trace is not None:
                        trace["strides_total"] += n_strides

                    stripe_cols: dict[int, pa.Array] = {}

                    def whole(tid):
                        col = stripe_cols.get(tid)
                        if col is None:
                            col = dec.decode_column(tid, n_rows)
                            stripe_cols[tid] = col
                        return col

                    def emit(offs_global: np.ndarray, karr, k_base: int, in_stride: bool):
                        """Gather every projected column at stripe-global row
                        offsets `offs_global`; `karr` (the decoded key window
                        starting at `k_base`) is reused when projected.
                        `in_stride`: offsets all fall in the single stride the
                        key was decoded from, so other columns may seek to it;
                        False means a whole-stripe pass (offsets may span
                        strides), so other columns decode whole-stripe too."""
                        for name, tid in tops:
                            if tid == key_tid:
                                piece = karr.take(
                                    pa.array(
                                        offs_global - k_base, type=pa.int64()
                                    )
                                )
                            else:
                                piece = None
                                if in_stride:
                                    s_idx0 = int(offs_global[0]) // stride
                                    try:
                                        arr = dec.decode_stride_column(
                                            tid, s_idx0, stride, n_rows
                                        )
                                        piece = arr.take(
                                            pa.array(
                                                offs_global - s_idx0 * stride,
                                                type=pa.int64(),
                                            )
                                        )
                                    except NoStridePositions:
                                        piece = None
                                if piece is None:
                                    piece = whole(tid).take(
                                        pa.array(offs_global, type=pa.int64())
                                    )
                            out_chunks.setdefault(name, []).append(piece)

                    # --- stride-level pruning via the key's ROW_INDEX stats ---
                    alive = list(range(n_strides))
                    ri = dec.row_index(key_tid) if stride else None
                    if ri is not None and len(ri.entry) >= n_strides:
                        kept = []
                        for s in alive:
                            e = ri.entry[s].statistics
                            if e is None:
                                kept.append(s)
                                continue
                            cs = stats_from_proto(kind, e)
                            if _any_key_in_range(key_list, cs.minimum, cs.maximum):
                                kept.append(s)
                        alive = kept
                    if not alive:
                        continue
                    if not stride:
                        # legacy file without a row index: one whole-stripe pass
                        if trace is not None:
                            trace["strides_scanned"] += 1
                        karr = whole(key_tid)
                        hits = _match_offsets(karr, key_set)
                        if len(hits):
                            emit(hits, karr, 0, in_stride=False)
                        continue
                    for s_idx in alive:
                        if trace is not None:
                            trace["strides_scanned"] += 1
                        base = s_idx * stride
                        try:
                            karr = dec.decode_stride_column(
                                key_tid, s_idx, stride, n_rows
                            )
                        except NoStridePositions:
                            karr, base = whole(key_tid), 0
                            # stats pruning already ran; scanning the whole
                            # stripe once covers every remaining stride
                            hits = _match_offsets(karr, key_set)
                            if len(hits):
                                emit(hits, karr, 0, in_stride=False)
                            break
                        hits = _match_offsets(karr, key_set)
                        if len(hits):
                            emit(hits + base, karr, base, in_stride=True)
    if schema is None:  # no files had rows and none set a schema
        with DwrfFile(files[0]) as f:
            schema = (
                f.projected_schema(columns) if columns is not None else f.schema
            )
    cols = []
    for field in schema:
        parts = out_chunks.get(field.name, [])
        if not parts:
            cols.append(pa.array([], type=field.type))
        elif len(parts) == 1:
            cols.append(parts[0])
        else:
            cols.append(pa.concat_arrays(parts))
    return pa.table(cols, schema=schema)
