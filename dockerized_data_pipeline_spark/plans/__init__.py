"""Registered query surface: every SURVEY.md section-2 operator has a named
DataFrame query here, most with a DuckDB oracle SQL counterpart.

Importing this package populates the registry.
"""

from . import registry  # noqa: F401
from . import monitoring  # noqa: F401
from . import relational  # noqa: F401
from . import ingest_queries  # noqa: F401
from . import llm  # noqa: F401
from . import streaming_queries  # noqa: F401
from . import multimodal_queries  # noqa: F401
from . import extras  # noqa: F401
from . import sketches  # noqa: F401
from . import tpch_like  # noqa: F401
from . import collections  # noqa: F401
from . import profiling  # noqa: F401
from . import timeseries_queries  # noqa: F401
from . import eventflow  # noqa: F401
from . import sqltext  # noqa: F401

QUERIES = registry.QUERIES
ORACLES = registry.ORACLES
