"""Named analytical queries — the driver-checked surface.

Importing this package populates the registry with every query module.
"""

from .registry import QUERIES, QuerySpec, query

# populate the registry (import order = SURVEY §2 section order)
from . import core  # noqa: E402,F401
from . import sources_queries  # noqa: E402,F401
from . import filters  # noqa: E402,F401
from . import joins  # noqa: E402,F401
from . import aggregates  # noqa: E402,F401
from . import windows  # noqa: E402,F401
from . import scalar_funcs  # noqa: E402,F401
from . import text_funcs  # noqa: E402,F401
from . import upsert_queries  # noqa: E402,F401
from . import quality_queries  # noqa: E402,F401
from . import suitability  # noqa: E402,F401
from . import dedup_queries  # noqa: E402,F401
from . import graph_queries  # noqa: E402,F401
from . import sampling_queries  # noqa: E402,F401
from . import similarity_queries  # noqa: E402,F401
from . import textstats_queries  # noqa: E402,F401
from . import events_queries  # noqa: E402,F401
from . import analytics_queries  # noqa: E402,F401
from . import tpch_queries  # noqa: E402,F401
from . import cdc_queries  # noqa: E402,F401
from . import multimodal_queries  # noqa: E402,F401
from . import prep_queries  # noqa: E402,F401

__all__ = ["QUERIES", "QuerySpec", "query"]
