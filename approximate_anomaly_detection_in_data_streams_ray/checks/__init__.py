"""Built-in validation checks.

Each check consumes the narrow features Dataset (see ``stages/features.py``)
and produces (violations Dataset | Arrow table, per-partition verdict rows).
The registry is the engine's user-extension surface — the analogue of the
reference's pluggable detector/index type parameters (SURVEY.md §2.8).
"""

from .base import ValidationConfig, CHECK_REGISTRY, register_check

# importing the check modules populates CHECK_REGISTRY via @register_check
from . import drift, referential, schema_check, stats, uniqueness  # noqa: E402,F401

__all__ = ["ValidationConfig", "CHECK_REGISTRY", "register_check"]
