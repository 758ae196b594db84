"""Shared argparse helpers for the spark-submit job scripts.

Dependency-free on purpose (no pyspark import): job scripts build their
parser before creating a session, and ``--help`` must work anywhere.
"""

from __future__ import annotations

import argparse

__all__ = ["validate_nonneg"]


def validate_nonneg(parser: argparse.ArgumentParser, flag: str, value: int):
    """Post-parse validator for knobs where a NEGATIVE value would
    silently invert the semantics (e.g. ``--lsh-max-bucket -1`` would
    drop EVERY LSH bucket and turn ``--near-dup`` into a no-op); 0 stays
    legal — jobs map it to "disabled". Post-parse (not an argparse
    ``type=``) so job scripts stay stdlib-only at import time
    (``--help`` works without this package on sys.path): the parser
    uses plain ``type=int`` and calls this inside ``main()`` once the
    package is importable anyway."""
    if value is not None and value < 0:
        parser.error(
            f"{flag}: must be >= 0 (0 disables the cap; a negative cap "
            f"would silently drop EVERY LSH bucket and turn --near-dup "
            f"into a no-op)"
        )
    return value
