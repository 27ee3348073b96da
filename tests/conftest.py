import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from clickhouse_clickhouse_spark.session import get_spark

    # local[8]: tiny-fixture stages pay ~20% wall in per-task scheduling
    # at local[32] (measured r9: test_property 119->95 s, fuzz 131->103 s)
    s = get_spark("tests", shuffle_partitions=8,
                  cores=int(os.environ.get("SPARK_GRAFT_TEST_CORES", "8")))
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


def run_parallel(cases, fn, workers=16):
    """Run one check per case on a thread pool — Spark actions are
    thread-safe and overlap in local mode, so N tiny differential
    queries take ~N/workers wall instead of N (the fuzz suites were
    ~60% of suite wall time executing serially). Deterministic: the
    case list is pre-generated (seeded), only EXECUTION is concurrent.
    Raises the first failure with its case attached."""
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(workers) as ex:
        futs = [(c, ex.submit(fn, c)) for c in cases]
        errors, hard = [], None
        for c, f in futs:
            try:
                f.result()
            except AssertionError as e:
                errors.append((c, e))
            except Exception as e:           # noqa: BLE001 — keep the
                if hard is None:             # triggering case attached
                    hard = (c, e)
    if hard is not None:
        raise RuntimeError(f"case {hard[0]!r} raised") from hard[1]
    assert not errors, f"{len(errors)} case(s) failed; first 3: " \
                       f"{errors[:3]}"
