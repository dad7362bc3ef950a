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


def d32_parse(col: Column | str, digits: int = 7) -> Column:
    """Quantum-preserving decimal parse (ref:dfp754_d32.c:372-424
    strtobcd32): returns struct(sign, mant, expo) where the value is
    (-1)^sign * mant * 10^expo and expo encodes the QUANTUM — trailing
    zeros in the input survive as mantissa digits ("1.200" -> mant 1200,
    expo -3), unlike Spark's DecimalType which normalizes scale.

    Mirrors the reference's 7-significant-digit budget: extra integer
    digits raise expo, the 8th significant digit rounds half away from
    zero, and a fraction after a full 7-digit integer part contributes
    no round-off (the reference evaluates '.' for the round digit).

    ``digits=16`` gives the _Decimal64 twin (ref:dfp754_d64.c, 16-digit
    coefficient) — see d64_parse.
    """
    s = F.col(col) if isinstance(col, str) else col
    first = F.substring(s, 1, 1)
    sign = F.when(first == "-", F.lit(1)).otherwise(F.lit(0))
    body = F.when(first.isin("-", "+"), s.substr(F.lit(2), F.length(s))).otherwise(s)
    dot = F.instr(body, ".")
    ipart = F.when(dot > 0, body.substr(F.lit(1), dot - 1)).otherwise(body)
    fpart = F.when(dot > 0, body.substr(dot + 1, F.length(body))).otherwise(F.lit(""))
    istrip = F.regexp_replace(ipart, "^0+", "")
    n_i = F.length(istrip)

    # integer part alone covers (or exceeds) the digit budget
    mant_hi = F.substring(istrip, 1, digits)
    roff_hi = F.substring(istrip, digits + 1, 1)
    expo_hi = n_i - digits

    # fewer than `digits` integer digits: take fraction digits up to the budget
    k = F.least(F.length(fpart), F.lit(digits) - n_i)
    mant_lo = F.concat(istrip, fpart.substr(F.lit(1), k))
    roff_lo = fpart.substr(k + 1, F.lit(1))
    expo_lo = -k

    over = n_i >= digits
    digit_str = F.when(over, mant_hi).otherwise(mant_lo)
    roff = F.when(over, roff_hi).otherwise(roff_lo)
    expo = F.when(over, expo_hi).otherwise(expo_lo)
    mant = F.coalesce(F.nullif(digit_str, F.lit("")).cast("long"), F.lit(0)) + F.when(
        roff.isin("5", "6", "7", "8", "9"), F.lit(1)
    ).otherwise(F.lit(0))
    return F.struct(
        sign.cast("int").alias("sign"),
        mant.alias("mant"),
        expo.cast("int").alias("expo"),
    )


def d64_parse(col: Column | str) -> Column:
    """_Decimal64 twin of d32_parse: 16-digit coefficient budget
    (ref:dfp754_d64.c strtobcd64 — same grammar, wider mantissa)."""
    return d32_parse(col, digits=16)


def d32_format(sign: Column, mant: Column, expo: Column) -> Column:
    """Quantum-preserving decimal print (ref:dfp754_d32.c:426-466
    bcd32tostr): emits exactly -expo fraction digits (trailing zeros
    included), expo literal zeros for positive quanta, and drops the
    sign of zero ("no stinking signed naughts", ref:dfp754_d32.c:651)."""
    s = mant.cast("string")
    ln = F.length(s)
    f = -expo
    frac_form = F.when(
        ln <= f, F.concat(F.lit("0."), F.lpad(s, f, "0"))
    ).otherwise(
        F.concat(s.substr(F.lit(1), ln - f), F.lit("."), s.substr(ln - f + 1, ln))
    )
    magnitude = (
        F.when(expo < 0, frac_form)
        .when(expo > 0, F.concat(s, F.repeat(F.lit("0"), expo)))
        .otherwise(s)
    )
    neg = (sign == 1) & (mant != 0)
    return F.concat(F.when(neg, F.lit("-")).otherwise(F.lit("")), magnitude)


def decompose(col: Column | str, scale: int) -> list[Column]:
    """(sign, mantissa, exponent) of a decimal at a fixed scale:
    x = sign * mantissa * 10^exponent with exponent = -scale."""
    c = F.col(col) if isinstance(col, str) else col
    sign = F.when(c < 0, F.lit(-1)).otherwise(F.lit(1)).alias("sign")
    mant = F.abs((c * F.lit(10 ** scale)).cast("long")).alias("mantissa")
    expo = F.lit(-scale).alias("exponent")
    return [sign, mant, expo]
