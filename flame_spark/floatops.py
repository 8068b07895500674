"""Bit-reproducible float helpers.

JVM ``Math.log`` and NumPy's libm ``log`` can differ in the last ulp,
which breaks bit-exact score parity with the NumPy oracle. Every
transcendental in the scoring formulas therefore goes through this
vectorized pandas UDF (np.log on executors == np.log in the oracle).
It is only ever applied to per-TERM tables (distinct terms), never to
the big posting rows, so the Arrow hop is negligible.

+ - * / and sqrt are IEEE-754 correctly rounded in both runtimes and
stay JVM-side.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F, types as T


@F.pandas_udf(T.DoubleType())
def np_log(s: pd.Series) -> pd.Series:
    return pd.Series(np.log(s.to_numpy(np.float64)))
