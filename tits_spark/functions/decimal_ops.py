"""Decimal price operations — the engine analog of the reference's
IEEE 754-2008 decimal32/64 support (ref:dfp754_d32.c).

Spark's DecimalType is exact base-10 like _Decimal32, so every operation
is a built-in expression:

 - parse   (strtod32,  ref:dfp754_d32.c:626-637)  -> cast(DecimalType)
 - print   (d32tostr,  ref:dfp754_d32.c:697-719)  -> cast(StringType)
 - quantize(quantized32, ref:dfp754_d32.c:721-731) -> round half-away +
   cast to the quantum's scale (the reference rounds half away from
   zero via round_bcd32, ref:dfp754_d32.c:357-370; Spark round() is
   HALF_UP = away from zero — identical)
 - scalbn  (scalbnd32, ref:dfp754_d32.c:733-744)  -> exact * 10^n
 - decompose(decompd32, ref:dfp754_d32.c:746-755) -> (sign, mantissa,
   exponent) columns
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def parse_decimal(col: Column | str, precision: int = 9, scale: int = 5) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({precision},{scale})")


def decimal_to_str(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("string")


def quantize(col: Column | str, scale: int, precision: int = 18) -> Column:
    """Round to the quantum 10^-scale, half away from zero (reference
    round_bcd32 semantics), result typed at that scale."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c, scale).cast(f"decimal({precision},{scale})")


def scalbn10(col: Column | str, n: int, precision: int = 38, scale: int = 10) -> Column:
    """Exact x * 10^n in decimal space."""
    c = F.col(col) if isinstance(col, str) else col
    factor = F.lit(10).cast(f"decimal({precision},{scale})")
    if n >= 0:
        return (c.cast(f"decimal({precision},{scale})") * F.lit(10 ** n).cast("decimal(38,0)")).cast(
            f"decimal({precision},{scale})"
        )
    return (c.cast(f"decimal({precision},{scale})") / F.lit(10 ** (-n)).cast("decimal(38,0)")).cast(
        f"decimal({precision},{scale})"
    )


def decompose(col: Column | str, scale: int) -> list[Column]:
    """(sign, mantissa, exponent) of a decimal at a fixed scale:
    x = sign * mantissa * 10^exponent with exponent = -scale."""
    c = F.col(col) if isinstance(col, str) else col
    sign = F.when(c < 0, F.lit(-1)).otherwise(F.lit(1)).alias("sign")
    mant = F.abs((c * F.lit(10 ** scale)).cast("long")).alias("mantissa")
    expo = F.lit(-scale).alias("exponent")
    return [sign, mant, expo]
