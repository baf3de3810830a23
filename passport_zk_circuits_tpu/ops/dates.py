"""Batched passport-date utilities ("YYMMDD" UTF-8 packed in 48 bits).

Capability twin of /root/reference/circuits/dateUtilities/:
DateEncoder/DateDecoder (dateEncoder.circom:4-31, dateDecoder.circom:6-23),
DateIsLess (dateComparison.circom:5-54), EncodedDateIsLess
(dateComparisonEncoded.circom:6-29) and the century-normalized variant
(dateComparisonEncodedNormalized.circom:14-49).

Encoded dates are small (48-bit) values carried as (*B,) int64-free uint32
pairs is unnecessary — we keep them as (16, *B) Fr limb tensors like every
other signal and work on the low 3 limbs (6 UTF-8 digit bytes, little-endian
limbs: limb0 = "DD", limb1 = "MM", limb2 = "YY")."""

from __future__ import annotations

import jax.numpy as jnp


def decode(enc_limbs):
    """(16, *B) encoded date -> (day, month, year, well_formed) with
    day/month/year as (*B,) uint32.

    Mirrors DateDecoder: the nibble arithmetic is the witness computation;
    `well_formed` is the re-encoding constraint `dateEncoder.encoded ===
    dateEncoded` (dateDecoder.circom:22), which pins every high nibble to
    0x3 and digits to 0..9 by construction of the re-encode."""
    d = enc_limbs[0]
    m = enc_limbs[1]
    y = enc_limbs[2]
    day = ((d >> 8) & 15) * 10 + (d & 15)
    month = ((m >> 8) & 15) * 10 + (m & 15)
    year = ((y >> 8) & 15) * 10 + (y & 15)
    reenc_d = _encode_two_digits(day)
    reenc_m = _encode_two_digits(month)
    reenc_y = _encode_two_digits(year)
    ok = (reenc_d == d) & (reenc_m == m) & (reenc_y == y)
    ok = ok & jnp.all(enc_limbs[3:] == 0, axis=0)
    return day, month, year, ok


def _encode_two_digits(v):
    """v in 0..99 -> 0x3T3O (two UTF-8 digit bytes, tens first/high byte...
    little-endian 16-bit limb: high byte = tens, low byte = ones — matching
    the byte order of "YYMMDD" big-endian packing)."""
    tens = v // 10
    ones = v % 10
    return ((0x30 + tens) << 8) | (0x30 + ones)


def encode(day, month, year):
    """(day, month, year) (*B,) -> (3, *B) low limbs of the encoded date
    (DateEncoder analog)."""
    return jnp.stack([_encode_two_digits(day), _encode_two_digits(month),
                      _encode_two_digits(year)], axis=0)


def date_is_less(d1, m1, y1, d2, m2, y2):
    """Lexicographic (y, m, d) strict compare -> bool (*B,)
    (DateIsLess, dateComparison.circom:5-54)."""
    return (y1 < y2) | ((y1 == y2) & ((m1 < m2) | ((m1 == m2) & (d1 < d2))))


def encoded_date_is_less(first, second):
    """EncodedDateIsLess: first < second on decoded dates. Returns
    (is_less, well_formed)."""
    d1, m1, y1, ok1 = decode(first)
    d2, m2, y2, ok2 = decode(second)
    return date_is_less(d1, m1, y1, d2, m2, y2), ok1 & ok2


def encoded_date_is_less_normalized(first, second, current):
    """Century-normalized compare: a date earlier than `current` belongs to
    the 21st century (+100 years), else the 20th
    (dateComparisonEncodedNormalized.circom:14-49). Returns
    (is_less, well_formed)."""
    d1, m1, y1, ok1 = decode(first)
    d2, m2, y2, ok2 = decode(second)
    dc, mc, yc, okc = decode(current)
    first_is_20th = date_is_less(d1, m1, y1, dc, mc, yc)
    second_is_20th = date_is_less(d2, m2, y2, dc, mc, yc)
    y1n = y1 + 100 * first_is_20th.astype(jnp.uint32)
    y2n = y2 + 100 * second_is_20th.astype(jnp.uint32)
    return date_is_less(d1, m1, y1n, d2, m2, y2n), ok1 & ok2 & okc
