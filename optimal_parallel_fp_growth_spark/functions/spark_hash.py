"""Pure-python reimplementation of Spark's Murmur3 row hash for the
types a bucket key can be — the hash behind ``F.hash(col)`` AND
``df.repartition(n, col)``'s HashPartitioning (Catalyst
``Murmur3Hash`` with seed 42, ``pmod`` for the partition id).

Why reimplement: hash-bucketed versioned tables (round 13) record one
bucket per data file; manifest-side bucket pruning (``files_scanned``,
``read_table(prune=("k", "==", v))``) must compute ``pmod(hash(v), n)``
WITHOUT a SparkSession — the whole point of manifest math is that it
costs no job. The differential test
(``test_spark_hash.py::test_matches_spark_hash``) pins every branch
against ``F.hash`` on randomized ints/longs/strings, so a Spark-side
change would fail loudly rather than mis-prune silently.

Algorithm notes (matching ``Murmur3_x86_32`` as Catalyst uses it):
- int/long inputs hash as 4-byte words (a long = low word then high
  word), NOT as byte streams;
- string inputs hash their UTF-8 bytes 4 bytes at a time
  (little-endian), then the TAIL bytes one at a time, each
  sign-extended and mixed as a full word — Spark's nonstandard tail,
  inherited from Guava's in-memory layout;
- null hashes to the seed itself (HashPartitioning sends nulls to
  ``pmod(seed, n)``).
"""

from __future__ import annotations

_MASK32 = 0xFFFFFFFF
_C1 = 0xCC9E2D51
_C2 = 0x1B873593

SEED = 42  # Murmur3Hash.seed in Catalyst


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _MASK32


def _mix_k1(k1: int) -> int:
    k1 = (k1 * _C1) & _MASK32
    k1 = _rotl(k1, 15)
    return (k1 * _C2) & _MASK32


def _mix_h1(h1: int, k1: int) -> int:
    h1 ^= k1
    h1 = _rotl(h1, 13)
    return (h1 * 5 + 0xE6546B64) & _MASK32


def _fmix(h1: int, length: int) -> int:
    h1 ^= length
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & _MASK32
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & _MASK32
    h1 ^= h1 >> 16
    return h1


def _signed32(x: int) -> int:
    x &= _MASK32
    return x - (1 << 32) if x >= (1 << 31) else x


def _hash_int(value: int, seed: int) -> int:
    """Murmur3_x86_32.hashInt — one 4-byte word."""
    h1 = _mix_h1(seed & _MASK32, _mix_k1(value & _MASK32))
    return _fmix(h1, 4)


def _hash_long(value: int, seed: int) -> int:
    """Murmur3_x86_32.hashLong — low word, then high word."""
    v = value & 0xFFFFFFFFFFFFFFFF
    h1 = _mix_h1(seed & _MASK32, _mix_k1(v & _MASK32))
    h1 = _mix_h1(h1, _mix_k1((v >> 32) & _MASK32))
    return _fmix(h1, 8)


def _hash_bytes(data: bytes, seed: int) -> int:
    """Murmur3_x86_32.hashUnsafeBytes — aligned words little-endian,
    then tail bytes ONE AT A TIME, sign-extended, each as a full
    mixK1/mixH1 round (Spark/Guava's layout, not canonical Murmur3)."""
    n = len(data)
    aligned = n - n % 4
    h1 = seed & _MASK32
    for i in range(0, aligned, 4):
        word = int.from_bytes(data[i : i + 4], "little")
        h1 = _mix_h1(h1, _mix_k1(word))
    for i in range(aligned, n):
        b = data[i]
        if b >= 128:
            b -= 256  # java bytes are signed; sign-extend to the word
        h1 = _mix_h1(h1, _mix_k1(b & _MASK32))
    return _fmix(h1, n)


def canon_date_days(value) -> int | None:
    """A date key canonicalized to Spark's physical form — days since
    the epoch (what DateType IS under the hood, and what ``F.hash``
    hashes via hashInt). Accepts ``datetime.date`` (but not datetime —
    a timestamp probe on a date column is a type error, fail closed)
    and ISO ``YYYY-MM-DD`` strings. Returns None when the value cannot
    be a date key (round 17, VERDICT r16 task #4: the shared
    canonicalization that lets a date-partitioned corpus bloom/bucket-
    skip on its natural key)."""
    import datetime as _dt

    if isinstance(value, _dt.datetime):
        return None
    if isinstance(value, _dt.date):
        return (value - _dt.date(1970, 1, 1)).days
    if isinstance(value, str):
        try:
            return (
                _dt.date.fromisoformat(value) - _dt.date(1970, 1, 1)
            ).days
        except ValueError:
            return None
    return None


def canon_ts_micros(value) -> int | None:
    """A timestamp key canonicalized to Spark's physical form —
    microseconds since the epoch UTC (what TimestampType IS, hashed
    via hashLong). Accepts ``datetime.datetime`` (tz-aware converts to
    UTC; naive is TAKEN AS UTC — the engine pins
    ``spark.sql.session.timeZone=UTC``, and parquet TIMESTAMP_MICROS
    stats come back naive-UTC the same way) and ISO strings. Returns
    None when the value cannot be a timestamp key."""
    import datetime as _dt

    if isinstance(value, str):
        try:
            value = _dt.datetime.fromisoformat(value)
        except ValueError:
            return None
    if isinstance(value, _dt.datetime):
        if value.tzinfo is not None:
            value = value.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        epoch = _dt.datetime(1970, 1, 1)
        delta = value - epoch
        return (delta.days * 86_400 + delta.seconds) * 1_000_000 + (
            delta.microseconds
        )
    return None


def spark_hash(value, dtype: str, seed: int = SEED) -> int:
    """``F.hash(lit(value).cast(dtype))`` as a signed 32-bit int.
    Supported dtypes: the integral family, strings, and (round 17)
    date/timestamp — the types a bucket key makes sense for. Raises on
    anything else, and on a date/timestamp value that does not
    canonicalize (fail closed beats a wrong bucket)."""
    if value is None:
        return _signed32(seed)
    if dtype in ("tinyint", "smallint", "int"):
        return _signed32(_hash_int(int(value), seed))
    if dtype == "bigint":
        return _signed32(_hash_long(int(value), seed))
    if dtype in ("string",) or dtype.startswith("varchar"):
        return _signed32(_hash_bytes(str(value).encode("utf-8"), seed))
    if dtype == "date":
        days = canon_date_days(value)
        if days is None:
            raise ValueError(f"not a date key: {value!r}")
        return _signed32(_hash_int(days, seed))
    if dtype in ("timestamp", "timestamp_ntz"):
        us = canon_ts_micros(value)
        if us is None:
            raise ValueError(f"not a timestamp key: {value!r}")
        return _signed32(_hash_long(us, seed))
    raise ValueError(
        f"spark_hash supports integral, string, date and timestamp "
        f"bucket keys, not {dtype!r}"
    )


def bucket_of(value, dtype: str, n: int) -> int:
    """The shuffle partition ``df.repartition(n, col)`` sends this key
    to: ``pmod(murmur3(value), n)`` — python ``%`` on the signed hash
    IS pmod (non-negative for positive n)."""
    return spark_hash(value, dtype) % n
