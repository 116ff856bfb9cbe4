"""Custom aggregates via Arrow grouped-agg pandas UDFs.

NOTE: deliberately no ``from __future__ import annotations`` here —
``pandas_udf`` infers the UDF kind from *evaluated* type hints, and the
future import would turn them into unresolvable strings.
"""

import numpy as np
import pandas as pd

from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def geomean(v: pd.Series) -> float:
    """Geometric mean, partition-order-independent: logs are sorted before
    the fold so every arrival order sums identically."""
    logs = np.sort(np.log(v.to_numpy(dtype="float64")))
    return float(np.exp(logs.sum() / len(logs)))
