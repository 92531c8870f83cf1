"""Shape-bucketing helpers.

Every jitted shape compiles its own program (minutes over tunneled
links), so dynamic sizes round up to a small set of buckets shared
across calls.  Used by the rater dispatch paths and the device beam
engines.
"""
from __future__ import annotations

from typing import Sequence


def bucket(n: int, buckets: Sequence[int]) -> int:
    """Smallest bucket >= n; CAPS at the largest bucket (callers must
    guarantee n fits or handle the truncation)."""
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


def bucket_unbounded(n: int, buckets: Sequence[int]) -> int:
    """Like :func:`bucket` but NEVER truncates: above the largest
    bucket, round up to the next power of two (one extra compilation
    per new size instead of silently wrong results)."""
    for b in buckets:
        if n <= b:
            return b
    return 1 << max(n - 1, 1).bit_length()
