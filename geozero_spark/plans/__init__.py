"""Physical-plan helpers: session config, skew handling, lineage/metrics."""

from . import session  # noqa: F401
