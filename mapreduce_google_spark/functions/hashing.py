"""Hashing expressions.

The reference partitions map output by
``int(md5(key).hexdigest(), 16) % num_partitions`` (reference
``mapreduce/worker/__main__.py:62-65``). For power-of-two or small moduli we
don't need the full 128-bit integer: ``md5 mod m`` is computable from the
tail of the hex digest, because 16^k mod m cycles. For the common case used
by the declared queries (m ≤ 16^15 fits in a long) we take the last 15 hex
digits — (md5 mod 16^15) mod m == md5 mod m whenever m divides 16^15's
modulus cycle... which is only true for power-of-two m. For arbitrary m we
fall back to a tiny Horner loop in SQL over all 32 digits.

All of it stays JVM-side (``conv``/``aggregate``) — no Python UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_bucket(key: Column | str, num_buckets: int) -> Column:
    """``int(md5(key),16) % num_buckets`` as a JVM-side expression.

    For power-of-two ``num_buckets`` (≤ 2^60) only the low hex digits
    matter: md5 mod 2^k == (last ceil(k/4) hex digits) mod 2^k.
    For general moduli, Horner's rule over the 32 hex digits:
    ``h = (h*16 + digit) % m`` — expressed with ``aggregate`` over the
    digest's characters, still fully inside codegen.
    """
    col = F.col(key) if isinstance(key, str) else key
    digest = F.md5(col)
    m = num_buckets
    if m > 0 and (m & (m - 1)) == 0:
        ndigits = max(1, -(-m.bit_length() // 4) + 1)  # enough tail digits
        tail = F.substring(digest, 33 - ndigits, ndigits)
        return (F.conv(tail, 16, 10).cast("long") % F.lit(m)).alias("bucket")
    # general modulus: Horner over hex chars, h fits in long since m small
    horner = F.aggregate(
        F.split(digest, ""),
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * 16 + F.conv(ch, 16, 10).cast("long")) % F.lit(m),
    )
    return horner.alias("bucket")


def rolling_hash(text: Column | str, modulus: int = 2**61 - 1, base: int = 257) -> Column:
    """Polynomial rolling hash of a string (document fingerprinting).

    h = sum(base^i * code(c_i)) mod modulus, computed left-to-right with
    Horner's rule via ``aggregate`` over the characters — deterministic,
    JVM-side, O(len) per row with no shuffle.
    """
    col = F.col(text) if isinstance(text, str) else text
    # unicode code point per character; ascii() returns the first byte's
    # code for the single-char strings produced by split.
    return F.aggregate(
        F.split(col, ""),
        F.lit(0).cast("decimal(38,0)"),
        lambda acc, ch: (acc * base + F.ascii(ch)) % F.lit(modulus).cast("decimal(38,0)"),
    ).cast("long")
