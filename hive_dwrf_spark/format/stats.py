"""Column statistics: collect (vectorized), merge, serialize.

Mirrors the semantics of statistics/ColumnStatisticsImpl.java — count of
non-null values plus type-specific min/max/sum (integer sum saturates to
None on overflow like the reference's overflow guard :137-144; boolean keeps
a true-count bucket) — but collects from numpy arrays in one pass.
"""

from __future__ import annotations

import numpy as np

from . import proto
from .constants import TypeKind

_I64_MIN = -(2**63)
_I64_MAX = 2**63 - 1


class ColumnStats:
    __slots__ = ("kind", "count", "minimum", "maximum", "sum", "true_count", "overflow")

    def __init__(self, kind: TypeKind):
        self.kind = kind
        self.count = 0
        self.minimum = None
        self.maximum = None
        self.sum = 0
        self.true_count = 0
        self.overflow = False

    # -- update from a batch (values already null-stripped) --------------------

    def update_ints(self, values: np.ndarray) -> None:
        if len(values) == 0:
            return
        self.count += len(values)
        lo, hi = int(values.min()), int(values.max())
        self.minimum = lo if self.minimum is None else min(self.minimum, lo)
        self.maximum = hi if self.maximum is None else max(self.maximum, hi)
        if not self.overflow:
            self.sum += int(values.sum(dtype=object if len(values) > 2**20 else np.int64))
            if not (_I64_MIN <= self.sum <= _I64_MAX):
                self.overflow = True

    def update_doubles(self, values: np.ndarray) -> None:
        if len(values) == 0:
            return
        self.count += len(values)
        lo, hi = float(values.min()), float(values.max())
        self.minimum = lo if self.minimum is None else min(self.minimum, lo)
        self.maximum = hi if self.maximum is None else max(self.maximum, hi)
        self.sum += float(values.sum(dtype=np.float64))

    def update_strings(self, min_val: str | None, max_val: str | None, n: int) -> None:
        self.count += n
        if min_val is not None:
            self.minimum = min_val if self.minimum is None else min(self.minimum, min_val)
        if max_val is not None:
            self.maximum = max_val if self.maximum is None else max(self.maximum, max_val)

    def update_bools(self, values: np.ndarray) -> None:
        self.count += len(values)
        self.true_count += int(values.sum())

    def update_count_only(self, n: int) -> None:
        self.count += n

    # -- merge/serialize ---------------------------------------------------------

    def merge(self, other: "ColumnStats") -> None:
        self.count += other.count
        self.true_count += other.true_count
        if other.minimum is not None:
            self.minimum = (
                other.minimum if self.minimum is None else min(self.minimum, other.minimum)
            )
        if other.maximum is not None:
            self.maximum = (
                other.maximum if self.maximum is None else max(self.maximum, other.maximum)
            )
        self.overflow = self.overflow or other.overflow
        if not self.overflow:
            self.sum += other.sum
            if self.kind != TypeKind.DOUBLE and isinstance(self.sum, int):
                if not (_I64_MIN <= self.sum <= _I64_MAX):
                    self.overflow = True

    def to_proto(self) -> proto.ColumnStatistics:
        msg = proto.ColumnStatistics(numberOfValues=self.count)
        k = self.kind
        if k in (TypeKind.BYTE, TypeKind.SHORT, TypeKind.INT, TypeKind.LONG):
            msg.intStatistics = proto.IntegerStatistics(
                minimum=self.minimum,
                maximum=self.maximum,
                sum=None if self.overflow else int(self.sum),
            )
        elif k in (TypeKind.FLOAT, TypeKind.DOUBLE):
            msg.doubleStatistics = proto.DoubleStatistics(
                minimum=self.minimum, maximum=self.maximum, sum=float(self.sum)
            )
        elif k == TypeKind.STRING:
            msg.stringStatistics = proto.StringStatistics(
                minimum=self.minimum, maximum=self.maximum
            )
        elif k == TypeKind.BOOLEAN:
            msg.bucketStatistics = proto.BucketStatistics(count=[self.true_count])
        return msg


def stats_from_proto(kind: TypeKind, msg: proto.ColumnStatistics) -> ColumnStats:
    st = ColumnStats(kind)
    st.count = msg.numberOfValues or 0
    if msg.intStatistics is not None:
        st.minimum = msg.intStatistics.minimum
        st.maximum = msg.intStatistics.maximum
        st.sum = msg.intStatistics.sum if msg.intStatistics.sum is not None else 0
        st.overflow = msg.intStatistics.sum is None
    elif msg.doubleStatistics is not None:
        st.minimum = msg.doubleStatistics.minimum
        st.maximum = msg.doubleStatistics.maximum
        st.sum = msg.doubleStatistics.sum or 0.0
    elif msg.stringStatistics is not None:
        st.minimum = msg.stringStatistics.minimum
        st.maximum = msg.stringStatistics.maximum
    elif msg.bucketStatistics is not None and msg.bucketStatistics.count:
        st.true_count = msg.bucketStatistics.count[0]
    return st
