"""C++ load-generator tests: builds libloadgen.so with g++ and exercises all
three scenarios against a fake SUT (the reference's LoadGen smoke,
`dlrm_v3/inference/tests/inference_test.py` analogue without the model)."""

import shutil
import time

import pytest

g = shutil.which("g++")


@pytest.mark.skipif(g is None, reason="no g++")
def test_loadgen_scenarios():
    from generative_recommenders_tpu.inference.loadgen import (
        Scenario,
        TestSettings,
        query_complete,
        start_test,
    )

    issued = []

    def issue(qid):
        issued.append(qid)
        time.sleep(0.001)
        query_complete(qid)

    r = start_test(
        TestSettings(scenario=Scenario.OFFLINE, min_query_count=20), issue
    )
    assert r["query_count"] == 20 and r["qps"] > 0
    assert r["p50_ms"] >= 1.0
    assert sorted(issued) == list(range(20))

    issued.clear()
    r = start_test(
        TestSettings(
            scenario=Scenario.SERVER, target_qps=200.0, min_query_count=30
        ),
        issue,
    )
    assert r["query_count"] == 30
    # Poisson arrivals: achieved qps should be near (under) the target
    assert 50 < r["qps"] <= 400

    issued.clear()
    r = start_test(
        TestSettings(scenario=Scenario.SINGLE_STREAM, min_query_count=10),
        issue,
    )
    assert r["query_count"] == 10
    # percentiles are monotone
    assert r["p50_ms"] <= r["p99_ms"]


@pytest.mark.skipif(g is None, reason="no g++")
def test_loadgen_multistream_and_early_stopping():
    import ctypes

    from generative_recommenders_tpu.inference.loadgen import (
        Scenario,
        TestSettings,
        _load,
        query_complete,
        start_test,
    )

    lib = _load()
    # MLPerf early-stopping minimums: with 0 overlatency results,
    # p90 needs ceil(log(0.01)/log(0.9)) = 44, p99 needs 459.
    assert lib.lg_min_queries_for_early_stop(0, ctypes.c_double(0.9)) == 44
    assert lib.lg_min_queries_for_early_stop(0, ctypes.c_double(0.99)) == 459
    # monotone in t
    h = [
        lib.lg_min_queries_for_early_stop(t, ctypes.c_double(0.9))
        for t in range(5)
    ]
    assert h == sorted(h) and h[4] > h[0]

    issued = []

    def issue(qid):
        issued.append(qid)
        time.sleep(0.0005)
        query_complete(qid)

    # MultiStream: sequential queries, p99 percentile, generous bound ->
    # early stop exactly at the h(t=0) = 459 mark (min_query_count lower)
    r = start_test(
        TestSettings(
            scenario=Scenario.MULTI_STREAM,
            min_query_count=10,
            target_latency_ms=1000.0,
            target_percentile=0.99,
        ),
        issue,
    )
    assert r["early_stopped"] == 1.0
    assert r["query_count"] == 459
    assert r["latency_bound_ok"] == 1.0

    # impossible bound -> overlatency counts keep pushing the stop mark out;
    # the run still terminates once min_query_count is hit... with every
    # query overlatency the early-stop mark is unreachable, so disable
    # early stopping and check the bound reports failure
    issued.clear()
    r = start_test(
        TestSettings(
            scenario=Scenario.SINGLE_STREAM,
            min_query_count=12,
            target_latency_ms=0.0001,
            target_percentile=0.9,
            enable_early_stopping=False,
        ),
        issue,
    )
    assert r["query_count"] == 12
    assert r["latency_bound_ok"] == 0.0
