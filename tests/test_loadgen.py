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
