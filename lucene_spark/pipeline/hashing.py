"""Cross-engine deterministic hashing.

All near-dup / fingerprint operators hash tokens through MD5 so the exact
same values are computable in PySpark (`conv(substr(md5(x),1,8),16,10)`),
DuckDB (`('0x'||substr(md5(x),1,8))::BIGINT`), and numpy — which is what
lets the driver hash-compare our distributed implementations against an
independent SQL oracle. MD5 here is a content fingerprint, not a security
primitive. At 10^12-file scale you would swap in xxhash64 uniformly; the
operator logic is hash-agnostic.
"""

from __future__ import annotations

import hashlib

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_32(s: str) -> int:
    """First 32 bits of md5(s) as a non-negative int (fits in int64)."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:8], 16)


def md5_64(s: str) -> int:
    """First 64 bits of md5(s) as a Python int (may exceed int64 range)."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:16], 16)


def md5_32_np(strings) -> np.ndarray:
    """Vectorized-ish md5_32 over an iterable of strings -> int64 array."""
    return np.fromiter(
        (int(hashlib.md5(s.encode("utf-8")).hexdigest()[:8], 16) for s in strings),
        dtype=np.int64,
    )


def spark_md5_32(col: Column) -> Column:
    """Spark column with the same value as md5_32."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def sql_md5_32(expr: str) -> str:
    """DuckDB SQL fragment with the same value as md5_32."""
    return f"('0x' || substr(md5({expr}), 1, 8))::BIGINT"
