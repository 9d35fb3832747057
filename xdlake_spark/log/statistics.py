"""Per-file statistics for ``add.stats`` (data-skipping inputs).

Folds Parquet row-group footer statistics into file-level
numRecords / minValues / maxValues / nullCount, matching the shape the
reference emits (/root/reference/xdlake/delta_log/statistics.py:14-36) and
that delta-rs / delta-spark emit, so manifests interoperate.

Driver-side only: reading a Parquet footer is a few KB of I/O per file. At
cluster scale the same stats can be produced by a single Spark aggregation
job grouped on ``input_file_name()`` — see table.py — so the driver never
becomes a bottleneck for wide writes.
"""

from __future__ import annotations

import datetime
import json
import math
from dataclasses import dataclass, field
from typing import Any


#: Sentinel: this row group's stat can't be represented faithfully in the
#: JSON stats (non-finite float, undecodable bytes). The whole column's
#: min/max must then be OMITTED for the file — folding only the
#: representable row groups would yield an over-tight interval and let the
#: skipper wrongly prune (e.g. ``x > 1e308`` on a file whose true max is
#: +inf; Spark additionally orders NaN above every value).
_UNREPRESENTABLE = object()


def _json_safe(v: Any) -> Any:
    """Make a footer stat value JSON-serializable (timestamps -> ISO)."""
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, bytes):
        try:
            return v.decode("utf-8")
        except UnicodeDecodeError:
            return _UNREPRESENTABLE
    if isinstance(v, float) and (math.isnan(v) or math.isinf(v)):
        return _UNREPRESENTABLE
    return v


@dataclass
class Statistics:
    numRecords: int = 0
    minValues: dict[str, Any] = field(default_factory=dict)
    maxValues: dict[str, Any] = field(default_factory=dict)
    nullCount: dict[str, int] = field(default_factory=dict)

    def to_json(self) -> str:
        return json.dumps({
            "numRecords": self.numRecords,
            "minValues": self.minValues,
            "maxValues": self.maxValues,
            "nullCount": self.nullCount,
        }, default=str)

    def restrict(self, cols) -> "Statistics":
        """Keep stats only for ``cols`` (delta.dataSkippingStatsColumns
        / dataSkippingNumIndexedCols): numRecords always survives (the
        metadata-only COUNT and DELETE paths depend on it); min/max/
        nullCount drop for unlisted columns, so wide tables don't pay
        footer-stat JSON for columns nobody filters on."""
        keep = set(cols)
        return Statistics(
            numRecords=self.numRecords,
            minValues={k: v for k, v in self.minValues.items()
                       if k in keep},
            maxValues={k: v for k, v in self.maxValues.items()
                       if k in keep},
            nullCount={k: v for k, v in self.nullCount.items()
                       if k in keep})

    @classmethod
    def from_parquet_file(cls, path: str, filesystem=None) -> "Statistics":
        """Read one Parquet footer and fold its row-group stats."""
        import pyarrow.parquet as pq

        md = pq.read_metadata(path, filesystem=filesystem)
        return cls.from_parquet_metadata(md)

    @classmethod
    def try_from_parquet_file(cls, path: str,
                              filesystem=None) -> "Statistics | None":
        """Like :meth:`from_parquet_file` but returns None when the
        footer cannot be parsed by pyarrow at all — e.g. Spark's
        VARIANT logical type, which pyarrow's thrift reader does not
        yet recognize. ``add.stats`` is optional in the Delta spec, so
        the add is committed without stats (skipping and metadata-only
        counts degrade to scans for that file, never to wrong
        answers)."""
        try:
            return cls.from_parquet_file(path, filesystem=filesystem)
        except Exception:
            return None

    @classmethod
    def from_parquet_metadata(cls, md) -> "Statistics":
        """Fold row-group footer stats into file-level stats
        (reference statistics.py:14-36)."""
        stats = cls(numRecords=md.num_rows)
        unbounded: set[str] = set()
        for rg_i in range(md.num_row_groups):
            rg = md.row_group(rg_i)
            for col_i in range(rg.num_columns):
                col = rg.column(col_i)
                name = col.path_in_schema
                if "." in name:          # nested leaf — skip, file-level
                    continue             # stats are top-level-column only
                s = col.statistics
                if s is None:
                    continue
                if s.has_null_count and s.null_count is not None:
                    stats.nullCount[name] = (
                        stats.nullCount.get(name, 0) + s.null_count)
                if s.has_min_max:
                    mn, mx = _json_safe(s.min), _json_safe(s.max)
                    if mn is _UNREPRESENTABLE or mx is _UNREPRESENTABLE:
                        unbounded.add(name)
                        continue
                    if mn is not None:
                        cur = stats.minValues.get(name)
                        stats.minValues[name] = mn if cur is None else min(cur, mn)
                    if mx is not None:
                        cur = stats.maxValues.get(name)
                        stats.maxValues[name] = mx if cur is None else max(cur, mx)
        # any row group with an unrepresentable stat leaves the whole
        # column's interval unbounded — sound, never over-tight
        for name in unbounded:
            stats.minValues.pop(name, None)
            stats.maxValues.pop(name, None)
        return stats
