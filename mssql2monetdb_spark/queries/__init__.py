"""Declared query corpus (SURVEY.md §2B relational surface + §2C extensions).

Importing this package populates the registry; ``__spark_entry__.py`` and
``bench.py`` read from it.
"""

from .registry import REGISTRY, Query, oracle_sql, queries, query  # noqa: F401

# Import for side effect: each module registers its queries.
from . import relational  # noqa: E402,F401
from . import relational_ext  # noqa: E402,F401
from . import functions_corpus  # noqa: E402,F401
from . import extensions  # noqa: E402,F401
from . import streaming_batch  # noqa: E402,F401
