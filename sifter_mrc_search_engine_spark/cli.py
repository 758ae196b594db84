"""Shared argparse helpers for the spark-submit job scripts.

Dependency-free on purpose (no pyspark import): job scripts build their
parser before creating a session, and ``--help`` must work anywhere.
"""

from __future__ import annotations

import argparse

__all__ = ["nonneg_int"]


def nonneg_int(v: str) -> int:
    """argparse type for knobs where a NEGATIVE value would silently
    invert the semantics (e.g. ``--lsh-max-bucket -1`` would drop EVERY
    LSH bucket and turn ``--near-dup`` into a no-op). 0 stays legal —
    jobs map it to "disabled"."""
    i = int(v)
    if i < 0:
        raise argparse.ArgumentTypeError(
            "must be >= 0 (0 disables the cap; a negative cap would "
            "silently drop EVERY LSH bucket and turn --near-dup into a "
            "no-op)"
        )
    return i
