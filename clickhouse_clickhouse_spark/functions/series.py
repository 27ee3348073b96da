"""Time-series analysis functions (reference ``seriesPeriodDetectFFT``,
upstream ``src/Functions/seriesPeriodDetectFFT.cpp``).

Arrow-batched pandas UDF over an array column — the array is one
series per row (the reference's signature), so the per-row cost is the
FFT of that row's array, independent of table size; the table scan
itself stays fully distributed.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql.functions import pandas_udf

_UDFS: dict[str, object] = {}


def fft_period_py(vals) -> float:
    """Dominant period of a series by FFT ([U]
    src/Functions/seriesPeriodDetectFFT.cpp): detrend by mean removal,
    take the positive-frequency bin with the largest magnitude, return
    n / bin_index. NaN when no dominant cycle exists (constant series,
    fewer than 4 points, or the DC-adjacent bin winning) — the Arrow
    UDF boundary surfaces that NaN as SQL NULL."""
    if vals is None:
        return None
    a = np.asarray(vals, dtype=np.float64)
    if a.size < 4 or not np.all(np.isfinite(a)):
        return float("nan")
    a = a - a.mean()
    if not a.any():
        return float("nan")
    mag = np.abs(np.fft.rfft(a))
    # bin 0 is DC (removed by detrending but keep it excluded); bin 1 is
    # the whole-window cycle — a "period" only if genuinely dominant
    if mag.size < 3:
        return float("nan")
    peak = 1 + int(np.argmax(mag[1:]))
    if mag[peak] <= 0:
        return float("nan")
    return float(a.size / peak)


def fft_period_udf():
    if "fft_period" not in _UDFS:
        @pandas_udf("double")
        def _fft(s: pd.Series) -> pd.Series:
            return s.map(fft_period_py)
        _UDFS["fft_period"] = _fft
    return _UDFS["fft_period"]


def fft_period(c: Column) -> Column:
    """Column wrapper: ``seriesPeriodDetectFFT(arr)``."""
    return fft_period_udf()(c)
