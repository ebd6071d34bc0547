"""REST-proxy v2 surface: subscription, long-poll /records (timeout,
max_bytes, produce-wakes-poller), manual vs auto offset commit, and
commit-survives-instance-recreate (group-level offsets)."""

import json
import threading
import time
import urllib.request

import pytest

from kafka_stream_spark.sources.rest_proxy import RestProxy, RestProxyServer


@pytest.fixture()
def server(spark, tmp_path):
    proxy = RestProxy(spark, str(tmp_path / "topics"), partitions=2)
    srv = RestProxyServer(proxy).start()
    yield srv, proxy
    srv.stop()


def _req(port, method, path, body=None, content_type=None):
    data = json.dumps(body).encode() if body is not None else None
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}", data=data, method=method
    )
    if content_type:
        req.add_header("Content-Type", content_type)
    with urllib.request.urlopen(req) as resp:
        raw = resp.read()
        return resp.status, json.loads(raw) if raw else None


def _produce(port, topic, values):
    return _req(port, "POST", f"/topics/{topic}",
                {"records": [{"value": v} for v in values]},
                "application/vnd.kafka.json.v1+json")


def _mk_consumer(port, group, name, **extra):
    body = {"name": name, "format": "json"} | extra
    return _req(port, "POST", f"/consumers/{group}", body,
                "application/vnd.kafka.v1+json")


def test_subscribe_poll_records(server):
    srv, _ = server
    _produce(srv.port, "t_a", [{"n": 1}, {"n": 2}])
    _produce(srv.port, "t_b", [{"n": 3}])
    _mk_consumer(srv.port, "g2", "c1")
    status, _ = _req(srv.port, "POST",
                     "/consumers/g2/instances/c1/subscription",
                     {"topics": ["t_a", "t_b"]})
    assert status == 204
    status, sub = _req(srv.port, "GET",
                       "/consumers/g2/instances/c1/subscription")
    assert status == 200 and sub == {"topics": ["t_a", "t_b"]}
    status, recs = _req(srv.port, "GET",
                        "/consumers/g2/instances/c1/records")
    assert status == 200
    assert sorted(r["value"]["n"] for r in recs) == [1, 2, 3]
    assert {r["topic"] for r in recs} == {"t_a", "t_b"}
    # position advanced: next poll is empty
    _, again = _req(srv.port, "GET", "/consumers/g2/instances/c1/records")
    assert again == []


def test_long_poll_woken_by_produce(server):
    srv, _ = server
    _mk_consumer(srv.port, "g3", "c1")
    _req(srv.port, "POST", "/consumers/g3/instances/c1/subscription",
         {"topics": ["t_live"]})
    results = {}

    def poll():
        t0 = time.monotonic()
        _, recs = _req(srv.port, "GET",
                       "/consumers/g3/instances/c1/records?timeout=10000")
        results["recs"], results["dt"] = recs, time.monotonic() - t0

    th = threading.Thread(target=poll)
    th.start()
    time.sleep(0.5)  # poller is parked before the produce lands
    _produce(srv.port, "t_live", [{"n": 42}])
    th.join(timeout=15)
    assert not th.is_alive()
    assert [r["value"]["n"] for r in results["recs"]] == [42]
    assert results["dt"] < 9  # woke well before the 10s timeout


def test_long_poll_times_out_empty(server):
    srv, _ = server
    _mk_consumer(srv.port, "g4", "c1")
    _req(srv.port, "POST", "/consumers/g4/instances/c1/subscription",
         {"topics": ["t_never"]})
    t0 = time.monotonic()
    _, recs = _req(srv.port, "GET",
                   "/consumers/g4/instances/c1/records?timeout=600")
    assert recs == []
    assert 0.5 <= time.monotonic() - t0 < 5


def test_max_bytes_caps_but_always_progresses(server):
    srv, _ = server
    big = {"pad": "x" * 200}
    _produce(srv.port, "t_big", [big, big, big])
    _mk_consumer(srv.port, "g5", "c1")
    _req(srv.port, "POST", "/consumers/g5/instances/c1/subscription",
         {"topics": ["t_big"]})
    got = []
    for _ in range(5):
        _, recs = _req(srv.port, "GET",
                       "/consumers/g5/instances/c1/records?max_bytes=10")
        if not recs:
            break
        # cap below one record's size still yields exactly one record
        assert len(recs) == 1
        got.extend(recs)
    assert len(got) == 3


def test_manual_commit_and_group_resume(server):
    srv, _ = server
    _produce(srv.port, "t_c", [{"n": i} for i in range(4)])
    _mk_consumer(srv.port, "g6", "c1", **{"auto.commit.enable": "false"})
    _req(srv.port, "POST", "/consumers/g6/instances/c1/subscription",
         {"topics": ["t_c"]})
    _, recs = _req(srv.port, "GET", "/consumers/g6/instances/c1/records")
    assert len(recs) == 4
    # nothing committed yet: the group store is empty
    _, comm = _req(srv.port, "GET", "/consumers/g6/instances/c1/offsets")
    assert comm == {"offsets": []}
    # crash without commit: a recreated instance re-reads everything
    _req(srv.port, "DELETE", "/consumers/g6/instances/c1")
    _mk_consumer(srv.port, "g6", "c1", **{"auto.commit.enable": "false"})
    _req(srv.port, "POST", "/consumers/g6/instances/c1/subscription",
         {"topics": ["t_c"]})
    _, recs2 = _req(srv.port, "GET", "/consumers/g6/instances/c1/records")
    assert len(recs2) == 4  # at-least-once redelivery
    # commit positions, recreate again: nothing redelivered
    status, _ = _req(srv.port, "POST",
                     "/consumers/g6/instances/c1/offsets", {})
    assert status == 200
    _, comm = _req(srv.port, "GET", "/consumers/g6/instances/c1/offsets")
    assert comm["offsets"] and all(o["topic"] == "t_c"
                                   for o in comm["offsets"])
    _req(srv.port, "DELETE", "/consumers/g6/instances/c1")
    _mk_consumer(srv.port, "g6", "c1", **{"auto.commit.enable": "false"})
    _req(srv.port, "POST", "/consumers/g6/instances/c1/subscription",
         {"topics": ["t_c"]})
    _, recs3 = _req(srv.port, "GET", "/consumers/g6/instances/c1/records")
    assert recs3 == []


def test_explicit_offset_commit_rewinds(server):
    srv, _ = server
    _produce(srv.port, "t_d", [{"n": i} for i in range(3)])
    _mk_consumer(srv.port, "g7", "c1")
    _req(srv.port, "POST", "/consumers/g7/instances/c1/subscription",
         {"topics": ["t_d"]})
    _, recs = _req(srv.port, "GET", "/consumers/g7/instances/c1/records")
    assert len(recs) == 3
    # rewind the group to before the last record of one partition
    part = recs[-1]["partition"]
    _req(srv.port, "POST", "/consumers/g7/instances/c1/offsets",
         {"offsets": [{"topic": "t_d", "partition": part,
                       "offset": recs[-1]["offset"] - 1}]})
    _req(srv.port, "DELETE", "/consumers/g7/instances/c1")
    _mk_consumer(srv.port, "g7", "c1")
    _req(srv.port, "POST", "/consumers/g7/instances/c1/subscription",
         {"topics": ["t_d"]})
    _, recs2 = _req(srv.port, "GET", "/consumers/g7/instances/c1/records")
    # everything past the committed point on that partition comes back
    assert all(r["partition"] == part and r["offset"] > recs[-1]["offset"] - 1
               for r in recs2)
    assert recs2  # at least the rewound record


def test_unsubscribe_empties_polls(server):
    srv, _ = server
    _produce(srv.port, "t_e", [{"n": 1}])
    _mk_consumer(srv.port, "g8", "c1")
    _req(srv.port, "POST", "/consumers/g8/instances/c1/subscription",
         {"topics": ["t_e"]})
    status, _ = _req(srv.port, "DELETE",
                     "/consumers/g8/instances/c1/subscription")
    assert status == 204
    _, recs = _req(srv.port, "GET", "/consumers/g8/instances/c1/records")
    assert recs == []


def test_v1_consume_still_commits_to_group(server):
    srv, _ = server
    _produce(srv.port, "t_f", [{"n": 1}, {"n": 2}])
    _mk_consumer(srv.port, "g9", "c1")
    _, msgs = _req(srv.port, "GET",
                   "/consumers/g9/instances/c1/topics/t_f")
    assert len(msgs) == 2
    # v1 auto-commits: a fresh instance in the same group sees nothing
    _req(srv.port, "DELETE", "/consumers/g9/instances/c1")
    _mk_consumer(srv.port, "g9", "c2")
    _, msgs2 = _req(srv.port, "GET",
                    "/consumers/g9/instances/c2/topics/t_f")
    assert msgs2 == []
