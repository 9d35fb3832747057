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


#: Delta writers cap string min/max at 32 characters — without it a
#: long-text column (a web-crawl ``documents`` table) serializes whole
#: documents into every add's stats JSON, and a billion-file manifest
#: carries gigabytes of bounds nobody needs for pruning.
STRING_PREFIX_LENGTH = 32

#: Unicode gap the truncated-max increment must hop over: bumping into
#: the surrogate range would produce an unencodable JSON string.
_SURROGATE_LO, _SURROGATE_HI = 0xD800, 0xDFFF
_MAX_CP = 0x10FFFF


def truncate_min(v: Any, limit: int = STRING_PREFIX_LENGTH) -> Any:
    """Lower bound under truncation: a prefix sorts <= the full string,
    so the plain cut is already sound."""
    if isinstance(v, str) and len(v) > limit:
        return v[:limit]
    return v


def truncate_max(v: Any, limit: int = STRING_PREFIX_LENGTH) -> Any:
    """Upper bound under truncation (the Delta writer rule): cut to
    ``limit`` chars, then increment the last incrementable code point
    and drop everything after it, so the result sorts >= every string
    sharing the prefix. A prefix of all-U+10FFFF cannot be bumped:
    return None (interval unbounded above — sound, never over-tight).
    """
    if not isinstance(v, str) or len(v) <= limit:
        return v
    prefix = v[:limit]
    chars = list(prefix)
    for i in range(len(chars) - 1, -1, -1):
        cp = ord(chars[i])
        if cp >= _MAX_CP:
            continue
        cp += 1
        if _SURROGATE_LO <= cp <= _SURROGATE_HI:
            cp = _SURROGATE_HI + 1
        chars[i] = chr(cp)
        return "".join(chars[:i + 1])
    return None


@dataclass
class Statistics:
    numRecords: int = 0
    minValues: dict[str, Any] = field(default_factory=dict)
    maxValues: dict[str, Any] = field(default_factory=dict)
    nullCount: dict[str, int] = field(default_factory=dict)

    def to_json(self) -> str:
        """Serialize for ``add.stats`` — string bounds truncate at the
        Delta writer's 32-character prefix here, the single choke
        point every stats-producing path (footer fold, Spark-agg
        fallback, import) funnels through. Truncation only WIDENS the
        interval (prefix min sorts lower, bumped max sorts higher),
        so skipping stays sound; an un-bumpable max drops to
        unbounded."""
        max_vals = {}
        for k, v in self.maxValues.items():
            t = truncate_max(v)
            if t is not None:
                max_vals[k] = t
        return json.dumps({
            "numRecords": self.numRecords,
            "minValues": {k: truncate_min(v)
                          for k, v in self.minValues.items()},
            "maxValues": max_vals,
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
