"""Custom aggregates via Arrow grouped-agg pandas UDFs.

NOTE: deliberately no ``from __future__ import annotations`` here —
``pandas_udf`` infers the UDF kind from *evaluated* type hints, and the
future import would turn them into unresolvable strings.
"""

import numpy as np
import pandas as pd

from pyspark.sql.functions import pandas_udf


def make_geomean():
    """Build the geometric-mean grouped-agg UDF. A factory (not a
    module-level decorator) because ``pandas_udf`` parses its DDL return
    type through the active SparkContext — executors importing this
    module for :func:`normalize_per_group` have none."""

    @pandas_udf("double")
    def geomean(v: pd.Series) -> float:
        # partition-order-independent: sort logs before the fold
        logs = np.sort(np.log(v.to_numpy(dtype="float64")))
        return float(np.exp(logs.sum() / len(logs)))

    return geomean


NORMALIZED_SCHEMA = "event_id long, event_type string, norm_value double"


def normalize_per_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """Grouped-map kernel: z-normalize ``value`` within the group.
    Rows are sorted by event_id before the moment computation so the
    float folds are partition-order-independent."""
    pdf = pdf.sort_values("event_id")
    v = pdf["value"].to_numpy(dtype="float64")
    mean = v.sum() / len(v)
    var = ((v - mean) ** 2).sum() / (len(v) - 1) if len(v) > 1 else float("nan")
    std = var ** 0.5
    out = pd.DataFrame(
        {
            "event_id": pdf["event_id"],
            "event_type": pdf["event_type"],
            "norm_value": (v - mean) / std,
        }
    )
    return out
