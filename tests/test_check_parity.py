"""Unit pins for tools/check.py's driver-parity canonicalization —
the local gate is only trustworthy if it fails exactly where the
driver's exact-hash gate fails (round-13 judge finding: the old
tolerant gate was strictly weaker and hid three driver failures)."""

import datetime
import decimal
import importlib.util
import sys

import pandas as pd
import pytest

spec = importlib.util.spec_from_file_location(
    "check_tool", "/root/repo/tools/check.py")
check = importlib.util.module_from_spec(spec)
sys.modules["check_tool"] = check
spec.loader.exec_module(check)


def test_decimal_vs_float_mismatch_detected():
    """The round-13 driver hash mismatch: Decimal('1000000') vs
    1000000.0 are ==-equal in python but must NOT compare equal under
    parity (the driver hashes them differently)."""
    a = pd.DataFrame({"x": [decimal.Decimal("1000000")]})
    b = pd.DataFrame({"x": [1000000.0]})
    _, ra = check.canon_parity(a)
    _, rb = check.canon_parity(b)
    assert ra != rb
    # ...while the old tolerant canon coerced them equal
    _, ta = check.canon(a)
    _, tb = check.canon(b)
    assert all(check.values_equal(x, y) for x, y in zip(ta[0], tb[0]))


def test_list_cells_raise_like_the_driver():
    df = pd.DataFrame({"x": [[1, 2], [3]]})
    with pytest.raises(TypeError):
        check.canon_parity(df)


def test_last_ulp_float_divergence_detected():
    a = pd.DataFrame({"x": [0.1 + 0.2]})
    b = pd.DataFrame({"x": [0.3]})
    _, ra = check.canon_parity(a)
    _, rb = check.canon_parity(b)
    assert ra != rb                       # parity: exact bits
    _, ta = check.canon(a)
    _, tb = check.canon(b)
    assert check.values_equal(ta[0][0], tb[0][0])   # tolerant: equal


def test_timestamp_resolutions_normalize():
    """Spark hands back datetime64[ns], DuckDB datetime64[us] — equal
    instants must compare equal."""
    t = datetime.datetime(2024, 2, 15, 10, 30, 45)
    a = pd.DataFrame({"x": pd.array([t], dtype="datetime64[ns]")})
    b = pd.DataFrame({"x": pd.array([t], dtype="datetime64[us]")})
    _, ra = check.canon_parity(a)
    _, rb = check.canon_parity(b)
    assert ra == rb


def test_integer_width_insensitive_and_row_sort():
    import numpy as np

    a = pd.DataFrame({"k": np.array([2, 1], dtype="int32"),
                      "v": [1.5, 2.5]})
    b = pd.DataFrame({"k": np.array([1, 2], dtype="int64"),
                      "v": [2.5, 1.5]})
    ca, ra = check.canon_parity(a)
    cb, rb = check.canon_parity(b)
    assert ca == cb and ra == rb


def test_none_vs_nan_object_cells_differ():
    """The nullable-BOOLEAN exposure the parity gate caught twice in
    round 14: Spark None vs DuckDB NaN in object columns."""
    a = pd.DataFrame({"x": pd.Series([None, True], dtype="object")})
    b = pd.DataFrame({"x": pd.Series([float("nan"), True],
                                     dtype="object")})
    _, ra = check.canon_parity(a)
    _, rb = check.canon_parity(b)
    assert ra != rb
