"""Geohash encode/decode — ClickHouse ``geohashEncode(lon, lat, p)`` /
``geohashDecode`` (geo function family of the reference's terminal CH
24.3, alongside the haversine/point-in-polygon pair in
queries/composites.py::geo_funcs).

Pure column expressions: quantize each coordinate to ``5p/2`` bits,
bit-interleave longitude-first (Morton spread via the standard
mask-shift cascade), emit base32 digits MSB-first. Everything is
integer arithmetic plus one float quantization whose op order is
fixed, so any engine that mirrors the formulas agrees byte-for-byte —
there is no library dependency and no UDF; the whole thing compiles
into whole-stage codegen.

Geohash cells double as the classic SPATIAL BUCKETING key (the
geo-join analog of MinHash bands): equal-cell grouping turns
nearest-neighbor-ish workloads into hash aggregation — the 100 TB
shape for "events near each other".
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"


def _spread16(c: Column) -> Column:
    """Insert a zero bit between each of the low 16 bits (Morton)."""
    c = c.bitwiseOR(F.shiftleft(c, 8)).bitwiseAND(F.lit(0x00FF00FF))
    c = c.bitwiseOR(F.shiftleft(c, 4)).bitwiseAND(F.lit(0x0F0F0F0F))
    c = c.bitwiseOR(F.shiftleft(c, 2)).bitwiseAND(F.lit(0x33333333))
    c = c.bitwiseOR(F.shiftleft(c, 1)).bitwiseAND(F.lit(0x55555555))
    return c


def _compact16(c: Column) -> Column:
    """Inverse of :func:`_spread16`: keep even-position bits."""
    c = c.bitwiseAND(F.lit(0x55555555))
    c = c.bitwiseOR(F.shiftright(c, 1)).bitwiseAND(F.lit(0x33333333))
    c = c.bitwiseOR(F.shiftright(c, 2)).bitwiseAND(F.lit(0x0F0F0F0F))
    c = c.bitwiseOR(F.shiftright(c, 4)).bitwiseAND(F.lit(0x00FF00FF))
    c = c.bitwiseOR(F.shiftright(c, 8)).bitwiseAND(F.lit(0x0000FFFF))
    return c


def _bits(precision: int) -> tuple[int, int, int]:
    if not 1 <= precision <= 12:
        raise ValueError("precision must be in 1..12")
    nbits = 5 * precision
    lon_bits = (nbits + 1) // 2
    lat_bits = nbits // 2
    if lon_bits > 16:  # _spread16 handles 16 bits; 12 chars = 30+30
        # split into high/low halves for >16-bit coordinates
        raise NotImplementedError("precision > 6 needs 32-bit spread")
    return nbits, lon_bits, lat_bits


def _quantize(lon: Column, lat: Column, lon_bits: int, lat_bits: int):
    lon_idx = F.least(
        F.lit((1 << lon_bits) - 1),
        F.floor((lon + F.lit(180.0)) / F.lit(360.0) * F.lit(float(1 << lon_bits))),
    ).cast("long")
    lat_idx = F.least(
        F.lit((1 << lat_bits) - 1),
        F.floor((lat + F.lit(90.0)) / F.lit(180.0) * F.lit(float(1 << lat_bits))),
    ).cast("long")
    return lon_idx, lat_idx


def encode_from_idx(lon_idx: Column, lat_idx: Column, precision: int) -> Column:
    """Geohash string from already-quantized cell indices (the shared
    core of :func:`geohash_encode` and :func:`geohashes_in_box`)."""
    nbits, lon_bits, lat_bits = _bits(precision)
    if lon_bits == lat_bits:
        code = F.shiftleft(_spread16(lon_idx), 1).bitwiseOR(_spread16(lat_idx))
    else:  # odd precision ends on a lon bit: lon at even positions
        code = _spread16(lon_idx).bitwiseOR(F.shiftleft(_spread16(lat_idx), 1))
    chars = [
        F.substring(
            F.lit(ALPHABET),
            F.shiftright(code, nbits - 5 * (k + 1)).bitwiseAND(F.lit(31)).cast("int")
            + F.lit(1),
            F.lit(1),
        )
        for k in range(precision)
    ]
    return F.concat(*chars)


def geohash_encode(lon: Column, lat: Column, precision: int = 6) -> Column:
    """Base32 geohash of (lon, lat) at ``precision`` characters.
    Even precisions split bits evenly (lon and lat get 5p/2 each);
    odd precisions give longitude the extra bit, per the standard."""
    nbits, lon_bits, lat_bits = _bits(precision)
    lon_idx, lat_idx = _quantize(lon, lat, lon_bits, lat_bits)
    return encode_from_idx(lon_idx, lat_idx, precision)


def geohashes_in_box(
    lon_min: Column,
    lat_min: Column,
    lon_max: Column,
    lat_max: Column,
    precision: int = 4,
) -> Column:
    """ClickHouse ``geohashesInBox(lon_min, lat_min, lon_max, lat_max,
    precision)``: the array of geohash cells intersecting the box —
    the spatial PARTITION-PRUNING primitive (probe a cell-bucketed
    table with this set instead of scanning the world). The parameter
    order IS the CH order (min corner first, then max corner — ADVICE
    r9: a positional port of CH code must not silently swap
    lon_max/lat_min). Cell count is the caller's responsibility at
    coarse precisions, exactly as CH caps it; sizes here are (lon
    cells × lat cells) of the quantized ranges. Empty/inverted boxes
    yield an empty array."""
    nbits, lon_bits, lat_bits = _bits(precision)
    lo1, la1 = _quantize(lon_min, lat_min, lon_bits, lat_bits)
    lo2, la2 = _quantize(lon_max, lat_max, lon_bits, lat_bits)
    cells = F.flatten(
        F.transform(
            F.sequence(lo1, lo2),
            lambda li: F.transform(
                F.sequence(la1, la2),
                lambda la: encode_from_idx(li, la, precision),
            ),
        )
    )
    return F.when(
        (lon_min <= lon_max) & (lat_min <= lat_max), cells
    ).otherwise(F.array().cast("array<string>"))


def geohash_decode(gh: Column, precision: int = 6) -> tuple[Column, Column]:
    """(lon, lat) CELL CENTER of a geohash produced at the same
    precision — the ClickHouse geohashDecode contract."""
    if not 1 <= precision <= 6:
        raise ValueError("precision must be in 1..6")
    nbits = 5 * precision
    lon_bits = (nbits + 1) // 2
    lat_bits = nbits // 2
    code = F.lit(0).cast("long")
    for k in range(precision):
        digit = (
            F.instr(F.lit(ALPHABET), F.substring(gh, k + 1, 1)) - F.lit(1)
        ).cast("long")
        code = code.bitwiseOR(F.shiftleft(digit, nbits - 5 * (k + 1)))
    if lon_bits == lat_bits:
        lon_idx = _compact16(F.shiftright(code, 1))
        lat_idx = _compact16(code)
    else:
        lon_idx = _compact16(code)
        lat_idx = _compact16(F.shiftright(code, 1))
    lon = (
        (lon_idx.cast("double") + F.lit(0.5))
        * F.lit(360.0)
        / F.lit(float(1 << lon_bits))
        - F.lit(180.0)
    )
    lat = (
        (lat_idx.cast("double") + F.lit(0.5))
        * F.lit(180.0)
        / F.lit(float(1 << lat_bits))
        - F.lit(90.0)
    )
    return lon, lat
