"""Geo functions: ``geohashEncode`` / ``geohashDecode`` parity.

ClickHouse ships geohashEncode(lon, lat[, precision]) / geohashDecode as
scalar functions.  The geohash algorithm (public domain, Niemeyer 2008) is
successive binary refinement of the lon/lat intervals with bits interleaved
lon-first, 5 bits per base-32 character.

Spark-first note: this is one of the few places a Python stage is the
right call — the bit-interleave has no builtin-Column expression short of
a 60-term unrolled CASE chain, so it ships as a VECTORIZED Arrow
``pandas_udf`` (numpy array ops per batch, no per-row Python).  The cost
model is map-only: encode/decode touch only their own row, so the stage
pipelines with any scan at any scale.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StringType, StructField, StructType

_BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"
_BASE32_INV = {c: i for i, c in enumerate(_BASE32)}


def _encode_arrays(
    lat: np.ndarray, lon: np.ndarray, precision: int
) -> list[str]:
    """Vectorized successive-refinement geohash over float64 arrays."""
    n_bits = 5 * precision
    lat_lo = np.full_like(lat, -90.0)
    lat_hi = np.full_like(lat, 90.0)
    lon_lo = np.full_like(lon, -180.0)
    lon_hi = np.full_like(lon, 180.0)
    bits = np.zeros((len(lat), n_bits), dtype=np.uint8)
    for i in range(n_bits):
        if i % 2 == 0:  # even bit (from MSB): longitude
            mid = (lon_lo + lon_hi) / 2
            hi_side = lon >= mid
            bits[:, i] = hi_side
            lon_lo = np.where(hi_side, mid, lon_lo)
            lon_hi = np.where(hi_side, lon_hi, mid)
        else:
            mid = (lat_lo + lat_hi) / 2
            hi_side = lat >= mid
            bits[:, i] = hi_side
            lat_lo = np.where(hi_side, mid, lat_lo)
            lat_hi = np.where(hi_side, lat_hi, mid)
    # 5 bits -> one base32 char
    chunks = bits.reshape(len(lat), precision, 5)
    weights = np.array([16, 8, 4, 2, 1], dtype=np.uint8)
    idx = (chunks * weights).sum(axis=2)
    return ["".join(_BASE32[d] for d in row) for row in idx]


def _decode_str(gh: str) -> tuple[float, float]:
    """Interval-midpoint decode of one geohash string."""
    lat_lo, lat_hi, lon_lo, lon_hi = -90.0, 90.0, -180.0, 180.0
    even = True
    for ch in gh:
        d = _BASE32_INV[ch]
        for shift in (4, 3, 2, 1, 0):
            bit = (d >> shift) & 1
            if even:
                mid = (lon_lo + lon_hi) / 2
                if bit:
                    lon_lo = mid
                else:
                    lon_hi = mid
            else:
                mid = (lat_lo + lat_hi) / 2
                if bit:
                    lat_lo = mid
                else:
                    lat_hi = mid
            even = not even
    return (lat_lo + lat_hi) / 2, (lon_lo + lon_hi) / 2


def geohash_encode(lat: Column, lon: Column, precision: int = 12) -> Column:
    """``geohashEncode`` as an Arrow-vectorized column: NULL in → NULL out,
    out-of-range coordinates clamped to the valid sphere like ClickHouse
    clamps (lat ±90, lon wrapped into ±180)."""

    @F.pandas_udf(StringType())
    def enc(la: pd.Series, lo: pd.Series) -> pd.Series:
        lat_v = la.to_numpy(dtype=np.float64, na_value=np.nan)
        lon_v = lo.to_numpy(dtype=np.float64, na_value=np.nan)
        ok = ~(np.isnan(lat_v) | np.isnan(lon_v))
        lat_c = np.clip(lat_v, -90.0, 90.0)
        lon_c = ((lon_v + 180.0) % 360.0) - 180.0
        out = np.empty(len(la), dtype=object)
        if ok.any():
            enc_ok = _encode_arrays(lat_c[ok], lon_c[ok], precision)
            out[np.flatnonzero(ok)] = enc_ok
        out[~ok] = None
        return pd.Series(out)

    return enc(lat, lon)


_DECODE_SCHEMA = StructType([
    StructField("lat", DoubleType()),
    StructField("lon", DoubleType()),
])


def geohash_decode(gh: Column) -> Column:
    """``geohashDecode``: the cell-midpoint (lat, lon) struct for a geohash
    string; NULL/empty/invalid input → NULL struct fields."""

    @F.pandas_udf(_DECODE_SCHEMA)
    def dec(s: pd.Series) -> pd.DataFrame:
        lats, lons = [], []
        for v in s:
            if not isinstance(v, str) or not v:
                la = lo = None
            else:
                try:
                    la, lo = _decode_str(v)
                except KeyError:
                    la = lo = None
            lats.append(la)
            lons.append(lo)
        return pd.DataFrame({"lat": lats, "lon": lons})

    return dec(gh)
