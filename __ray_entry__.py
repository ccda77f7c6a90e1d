"""Driver contract for the Ray-Data validation engine.

The driver initialises Ray BEFORE importing this module; nothing here (or
in the library) calls ``ray.init``/``ray.shutdown``.

* ``entry()`` — flagship validation pipeline on /root/testdata/sf0.001's
  synthetic code_files corpus (verdicts table).
* ``queries()`` — every implemented pipeline from SURVEY.md §2 + the
  large-scale training-data ops, one callable per name.
* ``oracle_sql()`` — DuckDB-equivalent SQL for the SQL-expressible subset;
  detector/sketch/LSH pipelines are rows-only by nature.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    import ray

    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        validate_code_files,
    )

    verdicts = validate_code_files("/root/testdata/sf0.001")
    return ray.data.from_pandas(verdicts)


def queries() -> dict[str, Callable[[str], Any]]:
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        ORACLE_SQL,
    )

    return dict(ORACLE_SQL)
