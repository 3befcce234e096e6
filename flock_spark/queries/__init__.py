"""Query modules. Importing this package registers every query in the registry."""

import flock_spark.queries.relational  # noqa: F401
import flock_spark.queries.nexmark  # noqa: F401
import flock_spark.queries.nexmark_native  # noqa: F401
import flock_spark.queries.tpch  # noqa: F401
import flock_spark.queries.windows_time  # noqa: F401
import flock_spark.queries.advanced  # noqa: F401
import flock_spark.queries.layouts  # noqa: F401
import flock_spark.queries.sql_surface  # noqa: F401
import flock_spark.queries.analytics  # noqa: F401
