"""Externally grounded bit-exactness evidence for the pedantic layer
(reference: filters/pedantic.go:29-110).

The pedantic components exist to reproduce Java/GATK bit patterns, so
testing them against libm (|delta| < 1e-12) proves nothing about their
reason to exist. Here each is pinned against an INDEPENDENT model of
the documented semantics, built from Python's decimal/Fraction
arbitrary-precision arithmetic:

- x86_log10: the x87 sequence ``fldlg2; fyl2x`` computes
  fl80(log10(2)) * log2(x) in 80-bit extended precision with a
  documented error of at most 1 ulp of the extended format (Intel SDM
  vol. 2A, FYL2X), then the store narrows to binary64. We model that
  pipeline exactly: t = fl80(log10(2)) * log2(x) computed to 60
  significant digits, rounded to the 64-bit extended significand
  (round-to-nearest-even), widened by +-1 ulp80 for the instruction's
  error license, and each candidate rounded to double. Whenever all
  candidates collapse to ONE double (the overwhelming majority of
  inputs), the hardware result is uniquely determined by the
  documented semantics and we assert exact bit equality.

- pedantic_formatf: Java's %.Nf formatting (java.util.Formatter ->
  FormattedFloatingDecimal) applies HALF_UP rounding to the SHORTEST
  round-trip decimal representation of the double - NOT to its exact
  binary expansion (e.g. Java prints %.1f of 0.15 as "0.2" even though
  the double is 0.1499999...). The independent model: Python's repr()
  is the same shortest-round-trip algorithm family, and
  decimal.quantize(ROUND_HALF_UP) applies textbook HALF_UP to it.
"""

import decimal
import math
import struct
from decimal import Decimal
from fractions import Fraction

import numpy as np
import pytest

from elprep_tpu import native
from elprep_tpu.pedantic import pedantic_formatf

pytestmark = pytest.mark.skipif(
    native.x86_log10(2.0) is None, reason="native lib unavailable")


def _round_to_significand(x: Fraction, bits: int):
    """Round positive x to a `bits`-bit significand, nearest-even.
    Returns (Fraction value, ulp as Fraction)."""
    assert x > 0
    # find e with 2^(bits-1) <= x * 2^-e < 2^bits
    e = x.numerator.bit_length() - x.denominator.bit_length() - bits
    scaled = x * Fraction(2) ** (-e)
    while scaled >= (1 << bits):
        e += 1
        scaled /= 2
    while scaled < (1 << (bits - 1)):
        e -= 1
        scaled *= 2
    floor = scaled.numerator // scaled.denominator
    rem = scaled - floor
    if rem > Fraction(1, 2) or (rem == Fraction(1, 2) and floor % 2 == 1):
        floor += 1
    return Fraction(floor) * Fraction(2) ** e, Fraction(2) ** e


def _to_double(x: Fraction) -> float:
    """Nearest binary64, via two one-sided float conversions."""
    f = x.numerator / x.denominator  # correctly rounded by CPython
    return f


# fl80(log10(2)): the constant the FPU pushes for FLDLG2, i.e. log10(2)
# rounded to the 64-bit extended significand.
_LG2_80, _ = _round_to_significand(
    Fraction(Decimal("2").ln(decimal.Context(prec=60)) /
             Decimal("10").ln(decimal.Context(prec=60))), 64)


def _expected_log10(x: float):
    """The unique binary64 result of fldlg2;fyl2x on x under the
    documented semantics, or None when the 1-ulp80 license makes it
    ambiguous."""
    ctx = decimal.Context(prec=60)
    dx = Decimal(x)  # exact: binary64 -> decimal is exact
    log2x = Fraction(ctx.divide(ctx.ln(dx), ctx.ln(Decimal(2))))
    if log2x == 0:
        return 0.0
    sign = 1 if log2x > 0 else -1
    t = _LG2_80 * abs(log2x)
    ideal, ulp = _round_to_significand(t, 64)
    cands = {_to_double(sign * ideal),
             _to_double(sign * (ideal - ulp)),
             _to_double(sign * (ideal + ulp))}
    if len(cands) != 1:
        return None
    return cands.pop()


def test_x86_log10_bit_patterns_adversarial():
    """Exact bit equality on a fixed adversarial input set: the qual
    probabilities and odds ratios the pipeline feeds log10 (powers of
    ten, error probs 10^(-q/10), near-1 values, subnormal-ish small
    values, exact powers of two)."""
    inputs = [2.0, 3.0, 10.0, 100.0, 1e-3, 7.0, 0.5,
              1.0000000000000002, 0.9999999999999999,
              2.2250738585072014e-308, 1.7976931348623157e308]
    inputs += [10.0 ** (-q / 10.0) for q in range(1, 50, 3)]
    inputs += [float(2 ** k) for k in (-30, -5, 5, 30)]
    checked = 0
    for x in inputs:
        want = _expected_log10(x)
        if want is None:
            continue  # ambiguous under the 1-ulp license: skip
        got = native.x86_log10(x)
        assert struct.pack("<d", got) == struct.pack("<d", want), \
            (x, got, want)
        checked += 1
    assert checked >= len(inputs) - 3  # the license rarely bites


def test_x86_log10_bit_patterns_random():
    rng = np.random.RandomState(7)
    xs = np.concatenate([
        rng.uniform(1e-12, 1.0, 200),
        rng.uniform(1.0, 1e12, 200),
        10.0 ** rng.uniform(-300, 300, 100),
    ])
    ambiguous = 0
    for x in xs:
        x = float(x)
        want = _expected_log10(x)
        if want is None:
            ambiguous += 1
            continue
        got = native.x86_log10(x)
        assert struct.pack("<d", got) == struct.pack("<d", want), \
            (x, got, want)
    # the 1-ulp80 ambiguity window is ~2^-11 per side; allow slack
    assert ambiguous < 25


def test_x86_log10_one_is_exact():
    assert native.x86_log10(1.0) == 0.0


def _java_formatf(value: float, precision: int) -> str:
    """Independent model of Java's %.Nf: HALF_UP on the shortest
    round-trip decimal representation. Only precisions >= 1 are
    modeled: at precision 0 the reference's string surgery leaves a
    trailing '.' ("-64." where Java prints "-64"), a quirk faithfully
    ported here but unreachable in the pipeline (every reference call
    site uses precision 2..4: assigngls.go:1646-1742,
    call-region.go:401)."""
    assert precision >= 1
    d = Decimal(repr(float(value)))  # repr = shortest round-trip digits
    q = d.quantize(Decimal(1).scaleb(-precision), rounding=decimal.ROUND_HALF_UP,
                   context=decimal.Context(prec=60))
    return f"{q:f}"


def test_formatf_java_model_known_cases():
    # 0.15 stores as 0.1499999...; Java (and elPrep) still print "0.2"
    # because the shortest repr "0.15" rounds half-up.
    assert pedantic_formatf(0.15, 1) == "0.2"
    assert _java_formatf(0.15, 1) == "0.2"
    # exact-value HALF_UP would give "0.3" here either way:
    assert pedantic_formatf(0.25, 1) == "0.3"
    # carry propagation through nines
    assert pedantic_formatf(9.9999, 2) == "10.00"
    assert pedantic_formatf(-9.9999, 2) == "-10.00"
    assert pedantic_formatf(0.999999999, 4) == "1.0000"


def test_formatf_matches_java_model_random():
    rng = np.random.RandomState(11)
    vals = np.concatenate([
        rng.uniform(-100, 100, 400),
        rng.uniform(-1, 1, 200),
        np.round(rng.uniform(-50, 50, 200), 3),  # many decimal ties
        rng.uniform(0, 1e6, 100),
    ])
    for v in vals:
        v = float(v)
        for precision in (1, 2, 3, 4, 6):
            assert pedantic_formatf(v, precision) == \
                _java_formatf(v, precision), (v, precision)
