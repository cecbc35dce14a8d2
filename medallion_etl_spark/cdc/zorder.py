"""Multi-dimensional Z-order clustering for compaction.

Bucket pruning already handles key point-lookups, and compaction's
default key sort gives row-group pruning ON THE KEY. But within a
bucket, scans filtered on non-key dimensions (``source``, ``n_tok``,
``lang``) still read every row group, because merge writes leave rows
in arrival order. Sorting by a Z-value — the bit-interleaving of
range codes of several columns — makes parquet row-group min/max
statistics tight on ALL interleaved dimensions at once, so a
predicate on ANY of them prunes row groups. This is the Delta
``OPTIMIZE ... ZORDER BY`` / Iceberg sort-order analog, same recipe:
range-code each column, interleave the bits, sort by the result.

Scale shape: the per-column ranges come from ONE column-pruned
min/max aggregate (the driver receives two scalars per column); the
Z-value itself is pure JVM bit arithmetic inside whole-stage codegen
(no Python, no UDF); and the sort rides the compaction's existing
per-bucket ``sortWithinPartitions`` — no extra shuffle is added.

Range-coding note: two codings, both order-preserving.

- ``linear`` (default): equal-width bins over [min, max]; the stats
  pass is one tiny min/max aggregate. Ideal for uniform dimensions;
  under heavy skew most rows collapse into a few bins and the
  interleave loses resolution on that dimension.
- ``quantile``: equal-FREQUENCY bins from one ``approxQuantile``
  pass (Greenwald-Khanna sketch, single scan for all dimensions —
  the Iceberg/Delta file-skipping recipe for skewed columns). Every
  bin holds ~|rows|/bins rows no matter the distribution, so
  row-group stats stay tight even when 95% of values share one hot
  range. Bin assignment is a JVM-side fold over the (deduped)
  boundary array — no Python, no UDF.

Strings are coded by their first 4 UTF-8 bytes read as a big-endian
integer — an order-preserving prefix, the standard trick for
lexicographic dimensions.

Reference analog: none — the reference (postgres ORM pipeline) has no
physical-layout maintenance at all; this exists for the 100 TB lake
where layout IS the difference between a pruned scan and a full one.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEFAULT_BITS = 8  # 256 bins per dimension; 4 dims -> 32-bit Z-value


def _as_ordered_double(dtype: T.DataType, name: str) -> Column:
    """An order-preserving numeric view of a column, for range coding."""
    if isinstance(dtype, T.StringType):
        # first 4 utf-8 bytes as a big-endian integer: preserves
        # lexicographic (binary utf-8) order on the prefix, which is
        # all a range code needs. rpad to EXACTLY 4 bytes with 0x00 —
        # without the pad, shorter strings code at a narrower width and
        # the integer comparison stops being order-preserving ('ab' =
        # 0x6162 would code BELOW 'aab' = 0x616162); 0x00 sorts below
        # every byte, so padded prefixes compare exactly like the
        # strings. rpad also truncates multi-byte prefixes (4 chars can
        # be up to 16 utf-8 bytes) so conv() never overflows 64 bits.
        return F.expr(
            f"cast(conv(hex(rpad(encode(substring(`{name}`, 1, 4), 'utf-8'), "
            "4, x'00')), 16, 10) as double)"
        )
    if isinstance(dtype, (T.DateType, T.TimestampType)):
        return F.col(name).cast("timestamp").cast("double")
    if isinstance(dtype, T.BooleanType):
        return F.col(name).cast("int").cast("double")
    if isinstance(dtype, T.NumericType):
        return F.col(name).cast("double")
    raise ValueError(f"column {name!r} of type {dtype.simpleString()} is not Z-orderable")


def _linear_codes(
    df: DataFrame, cols: list[str], nums: dict[str, Column], n_bins: int
) -> list[Column]:
    """Equal-width bin codes from one min/max aggregate (the driver
    receives 2·len(cols) scalars)."""
    stats = df.agg(
        *[
            f
            for c in cols
            for f in (F.min(nums[c]).alias(f"min_{c}"), F.max(nums[c]).alias(f"max_{c}"))
        ]
    ).first()
    codes: list[Column] = []
    for c in cols:
        lo, hi = stats[f"min_{c}"], stats[f"max_{c}"]
        if lo is None or hi is None or hi <= lo:
            codes.append(F.lit(0).cast("long"))  # constant/empty dimension
            continue
        code = F.floor((nums[c] - F.lit(float(lo))) / F.lit(float(hi - lo)) * n_bins)
        codes.append(
            F.coalesce(F.least(F.lit(n_bins - 1), F.greatest(F.lit(0), code)), F.lit(0)).cast(
                "long"
            )
        )
    return codes


def _quantile_codes(
    df: DataFrame, cols: list[str], nums: dict[str, Column], n_bins: int
) -> list[Column]:
    """Equal-frequency bin codes from ONE ``approxQuantile`` pass over
    all dimensions (Greenwald-Khanna sketches; the driver receives at
    most (n_bins-1)·len(cols) boundary scalars). The per-row bin is a
    count of boundaries below the value — a JVM fold over the deduped
    boundary-array literal, monotonic by construction."""
    proj = df.select(*[nums[c].alias(f"__zq_{i}") for i, c in enumerate(cols)])
    probs = [i / n_bins for i in range(1, n_bins)]
    quantiles = proj.stat.approxQuantile(
        [f"__zq_{i}" for i in range(len(cols))], probs, 1.0 / (4 * n_bins)
    )
    codes: list[Column] = []
    for c, qs in zip(cols, quantiles):
        bnds = sorted(set(qs))  # skew collapses duplicates; dedupe keeps the fold short
        if not bnds:  # all-NULL dimension
            codes.append(F.lit(0).cast("long"))
            continue
        arr = F.array(*[F.lit(float(b)) for b in bnds])
        val = nums[c]
        code = F.aggregate(
            arr,
            F.lit(0).cast("long"),
            lambda acc, b: acc + F.when(val > b, 1).otherwise(0).cast("long"),
        )
        codes.append(F.coalesce(code, F.lit(0)).cast("long"))
    return codes


def zvalue_col(
    df: DataFrame,
    cols: list[str],
    *,
    bits: int = DEFAULT_BITS,
    coding: str = "linear",
) -> Column:
    """The Z-value expression for ``df`` over ``cols``.

    Runs one stats pass over ``df`` (min/max aggregate for ``linear``
    coding, an approxQuantile sketch scan for ``quantile``) to fix the
    bin boundaries, then builds the interleaving as a flat tree of
    shift/and/or expressions — bits·len(cols) terms, all JVM-side.
    NULLs code to bin 0 so they cluster together at the front of the
    sort.
    """
    if not cols:
        raise ValueError("zorder needs at least one column")
    if bits * len(cols) > 63:
        raise ValueError(f"{bits} bits x {len(cols)} columns overflows a long Z-value")
    if coding not in ("linear", "quantile"):
        raise ValueError(f"unknown zorder coding {coding!r} (linear|quantile)")
    dtypes = dict(df.dtypes)
    missing = [c for c in cols if c not in dtypes]
    if missing:
        raise ValueError(f"zorder columns not in frame: {missing}")
    nums = {c: _as_ordered_double(df.schema[c].dataType, c) for c in cols}
    n_bins = 1 << bits
    if coding == "quantile":
        codes = _quantile_codes(df, cols, nums, n_bins)
    else:
        codes = _linear_codes(df, cols, nums, n_bins)

    k = len(cols)
    z: Column = F.lit(0).cast("long")
    for b in range(bits):
        for i, code in enumerate(codes):
            z = z.bitwiseOR(F.shiftleft(F.shiftright(code, b).bitwiseAND(F.lit(1)), b * k + i))
    return z
