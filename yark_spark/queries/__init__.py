"""Query-key implementations, grouped by SURVEY.md §2 section.

Importing this package populates ``yark_spark.registry.QUERIES/ORACLES``.
"""

from yark_spark.registry import ORACLES, QUERIES  # noqa: F401

# Each import registers its query keys as a side effect.
from yark_spark.queries import scans  # noqa: F401,E402
from yark_spark.queries import relational  # noqa: F401,E402
from yark_spark.queries import extended  # noqa: F401,E402
from yark_spark.queries import functions_extra  # noqa: F401,E402
from yark_spark.queries import pipeline_ops  # noqa: F401,E402
from yark_spark.queries import scalars  # noqa: F401,E402
from yark_spark.queries import writes  # noqa: F401,E402
from yark_spark.queries import dedup  # noqa: F401,E402
from yark_spark.queries import similarity  # noqa: F401,E402
from yark_spark.queries import text  # noqa: F401,E402
from yark_spark.queries import streaming  # noqa: F401,E402
from yark_spark.queries import udf  # noqa: F401,E402
