"""HTTP serving layer: the two reference REST endpoints
(publishController.java:26-47) served over the warehouse by the
oracle-checked engine plans — start a real server, curl it, compare
JSON against the registry frames."""

from __future__ import annotations

import json
import urllib.request

import pytest

from sparkstreaming_realtime_spark.serving import serve

TD = "2024-01-15"  # the registry endpoint queries' pinned day


@pytest.fixture(scope="module")
def endpoint(spark, sf_dir):
    srv, thread = serve(spark, sf_dir, port=0)
    port = srv.server_address[1]
    yield f"http://127.0.0.1:{port}"
    srv.shutdown()


def _get(url: str):
    with urllib.request.urlopen(url, timeout=120) as resp:
        return resp.status, json.loads(resp.read())


def test_dau_realtime_endpoint_matches_registry(endpoint, spark, sf_dir):
    from sparkstreaming_realtime_spark.plans import REGISTRY

    status, got = _get(f"{endpoint}/dauRealtime?td={TD}")
    assert status == 200
    frame = REGISTRY["dau_realtime_endpoint"].fn(spark, sf_dir).collect()
    want_total = next(r["ct"] for r in frame if r["metric"] == "dauTotal")
    want_td = {r["hr"]: r["ct"] for r in frame if r["metric"] == "dauTd"}
    want_yd = {r["hr"]: r["ct"] for r in frame if r["metric"] == "dauYd"}
    assert got["dauTotal"] == want_total
    assert got["dauTd"] == want_td
    assert got["dauYd"] == want_yd
    assert got["dauTotal"] == sum(got["dauTd"].values())


def test_stats_by_item_endpoint_matches_registry(endpoint, spark, sf_dir):
    from sparkstreaming_realtime_spark.plans import REGISTRY

    status, got = _get(f"{endpoint}/statsByItem?itemName=widget&t=segment")
    assert status == 200
    frame = REGISTRY["stats_by_item_segment"].fn(spark, sf_dir).collect()
    want = sorted(
        (r["segment"], r["sum_amount"]) for r in frame
    )
    assert [(d["name"], d["amount"]) for d in got] == want
    # the alternate grouping axis (the reference's t=age/gender switch)
    status, bands = _get(f"{endpoint}/statsByItem?itemName=widget&t=band")
    assert status == 200
    assert {d["name"] for d in bands} <= {"low", "mid", "high"}
    # both groupings partition the same joined rows: totals agree
    assert round(sum(d["amount"] for d in bands), 2) == round(
        sum(d["amount"] for d in got), 2
    )


def test_endpoint_errors_are_4xx_not_500(endpoint):
    import urllib.error

    with pytest.raises(urllib.error.HTTPError) as e:
        _get(f"{endpoint}/dauRealtime")  # missing td
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(f"{endpoint}/statsByItem?itemName=w&t=nope")
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(f"{endpoint}/nosuch")
    assert e.value.code == 404
