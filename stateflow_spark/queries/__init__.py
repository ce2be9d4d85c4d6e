"""Query registry: every implemented operator from SURVEY.md §2 registers a
named query (Spark DataFrame builder) and, where ANSI SQL can express it, a
DuckDB oracle string. The driver runs both sides at sf0.01 and hash-compares.

Import side effects populate ``REGISTRY``.
"""

from __future__ import annotations

from stateflow_spark.queries.common import REGISTRY, QueryDef, register  # noqa: F401

# Each module registers its queries on import.  Registration order matters:
# the driver's correctness harness checks the first N registered queries, so
# families that have never had a driver-green row import FIRST; families
# proven green in a previous round rotate to the back (round 1 covered
# tpch/tpch2/windows/setops/aggregates/events — see CORRECTNESS_r01.json).
from stateflow_spark.queries import entity_ops  # noqa: F401, E402
from stateflow_spark.queries import dedup  # noqa: F401, E402
from stateflow_spark.queries import similarity  # noqa: F401, E402
from stateflow_spark.queries import multimodal  # noqa: F401, E402
from stateflow_spark.queries import text  # noqa: F401, E402
from stateflow_spark.queries import udtfs  # noqa: F401, E402
from stateflow_spark.queries import joins  # noqa: F401, E402
from stateflow_spark.queries import tpch  # noqa: F401, E402
from stateflow_spark.queries import tpch2  # noqa: F401, E402
from stateflow_spark.queries import windows  # noqa: F401, E402
from stateflow_spark.queries import setops  # noqa: F401, E402
from stateflow_spark.queries import aggregates  # noqa: F401, E402
from stateflow_spark.queries import events  # noqa: F401, E402
