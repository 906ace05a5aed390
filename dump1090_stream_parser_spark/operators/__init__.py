"""Operator inventory (SURVEY.md §2).

Importing this package registers every query in the engine-wide registry
(`.registry.REGISTRY`): Tier B relational surface, Tier C training-data
extensions, and the SBS-1 domain queries. ``__spark_entry__.py`` exposes
the registry to the driver harness.
"""

from . import relational  # noqa: F401
from . import joins  # noqa: F401
from . import windows  # noqa: F401
from . import text  # noqa: F401
from . import dedup  # noqa: F401
from . import similarity  # noqa: F401
from . import multimodal  # noqa: F401

from .registry import REGISTRY, oracle_sql_map, queries_map  # noqa: F401
