"""Confluent REST-Proxy-shaped HTTP shim over the engine's topic layer
(S9: the last user-facing ingestion entry point).

Covers the v1 surface the reference's integration tests exercise
(kafka-tests.yml:35-43 Avro, :67-71 JSON, :95-113 binary b64):

  POST   /topics/{topic}                      produce (avro/json/binary)
  POST   /consumers/{group}                   create consumer instance
  GET    /consumers/{group}/instances/{name}/topics/{topic}   consume
  DELETE /consumers/{group}/instances/{name}  delete instance

plus the v2 subscription/long-poll surface (the streaming consume path
a reference user scripts against when tailing a topic over HTTP):

  POST   /consumers/{group}/instances/{name}/subscription     subscribe
  GET    /consumers/{group}/instances/{name}/subscription     topics
  DELETE /consumers/{group}/instances/{name}/subscription     unsubscribe
  GET    /consumers/{group}/instances/{name}/records          long-poll
         ?timeout=<ms>&max_bytes=<n> — blocks until records arrive on
         any subscribed topic or the timeout lapses (a produce wakes
         waiting pollers via a condition variable, so latency is
         notification-bound, not sleep-poll-bound)
  POST   /consumers/{group}/instances/{name}/offsets          commit
  GET    /consumers/{group}/instances/{name}/offsets          committed

v2 semantics: polling advances the instance's *position*; the
*committed* offset moves on poll only when the instance was created
with auto-commit (the default), otherwise via the offsets endpoint —
so a crash-and-recreate resumes from the last commit (at-least-once),
matching the proxy's contract.

Design: HTTP ingestion is an edge/driver concern — the handler only
parses + encodes records; the append itself is a Spark write through
``FileTopic`` (keyed partition assignment, monotonic offsets), so the
storage semantics are identical to every other producer in the engine.
Avro values register their writer schema in the in-repo SchemaRegistry
and go to the wire Confluent-framed, so a consumer (HTTP or Spark
``decode_df``) can resolve the schema from the frame — the same
contract the reference's proxy+registry pair implements.

Consumer instances hold per-(topic, partition) committed offsets in
memory (one process, like the proxy's instance affinity); each GET
returns records past the committed offsets and advances them —
at-least-once on crash, exactly the proxy's v1 semantics.
"""

from __future__ import annotations

import base64
import json
import pathlib
import threading
import time
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pyspark.sql.functions as F
from pyspark.sql import SparkSession

from kafka_stream_spark.functions import avro_codec
from kafka_stream_spark.functions.avro_schema import from_avro_json
from kafka_stream_spark.schema_registry import SchemaRegistry
from kafka_stream_spark.sources.topics import FileTopic

_CT_PREFIX = "application/vnd.kafka."


@dataclass
class _Consumer:
    fmt: str
    #: read positions — advanced by every poll; the instance's cursor.
    #: Committed offsets live with the GROUP (RestProxy._group_offsets),
    #: as on a real broker: a recreated instance resumes from the commit.
    positions: dict[tuple[str, int], int] = field(default_factory=dict)
    subscription: list[str] = field(default_factory=list)
    auto_commit: bool = True


class RestProxy:
    """The engine-side state behind the HTTP handler."""

    def __init__(self, spark: SparkSession, topic_root: str,
                 registry: SchemaRegistry | None = None, partitions: int = 4):
        self.spark = spark
        self.topic_root = topic_root
        self.partitions = partitions
        self.registry = registry or SchemaRegistry()
        self._avro_schemas: dict[int, dict] = {}  # schema id → avro json dict
        self._consumers: dict[tuple[str, str], _Consumer] = {}
        #: group → committed offsets; survives instance delete/recreate
        self._group_offsets: dict[str, dict[tuple[str, int], int]] = {}
        self._lock = threading.Lock()
        #: produce() notifies long-pollers blocked in poll_records()
        self._data = threading.Condition(self._lock)

    def _topic(self, name: str) -> FileTopic:
        return FileTopic(self.spark, self.topic_root, name,
                         partitions=self.partitions)

    # -- topic metadata (kafka-tests.yml:24-32: list / info / partitions) --

    def list_topics(self) -> list[str]:
        root = pathlib.Path(self.topic_root)
        if not root.is_dir():
            return []
        return sorted(p.name for p in root.iterdir() if p.is_dir())

    def topic_info(self, name: str) -> dict:
        if name not in self.list_topics():
            raise KeyError(f"topic not found: {name}")
        return {
            "name": name,
            "configs": {},
            "partitions": self.topic_partitions(name),
        }

    def topic_partitions(self, name: str) -> list[dict]:
        """Confluent-v1-shaped partition list; leader/replicas are the
        single local 'broker' 0 (there is no cluster to report)."""
        if name not in self.list_topics():
            raise KeyError(f"topic not found: {name}")
        t = self._topic(name)
        counts = {
            int(r["partition"]): (int(r["n"]), int(r["max_offset"]))
            for r in t.read()
            .groupBy("partition")
            .agg(F.count(F.lit(1)).alias("n"), F.max("offset").alias("max_offset"))
            .collect()
        }
        # the topic's ACTUAL layout, not the proxy's create-default: a
        # topic created elsewhere with 1 partition must report 1
        n_parts = max(counts) + 1 if counts else self.partitions
        return [
            {
                "partition": p,
                "leader": 0,
                "replicas": [{"broker": 0, "leader": True, "in_sync": True}],
                "records": counts.get(p, (0, -1))[0],
                "end_offset": counts.get(p, (0, -1))[1] + 1,
            }
            for p in range(n_parts)
        ]

    # -- produce -----------------------------------------------------------

    def produce(self, topic: str, fmt: str, body: dict) -> dict:
        records = body.get("records", [])
        resp: dict = {}
        if fmt == "avro":
            schema = json.loads(body["value_schema"])
            sid = self.registry.register(
                f"{topic}-value", from_avro_json(body["value_schema"])
            )
            self._avro_schemas[sid] = schema
            resp["value_schema_id"] = sid
            frame = b"\x00" + sid.to_bytes(4, "big")
            vals = [
                frame + avro_codec.encode_record(r["value"], schema)
                for r in records
            ]
        elif fmt == "json":
            vals = [json.dumps(r["value"]).encode() for r in records]
        elif fmt == "binary":
            vals = [base64.b64decode(r["value"]) for r in records]
        else:
            raise ValueError(f"unsupported embedded format {fmt!r}")
        keys = [
            r.get("key") if fmt != "binary"
            else (base64.b64decode(r["key"]) if r.get("key") else None)
            for r in records
        ]
        key_bytes = [
            None if k is None
            else (k if isinstance(k, bytes) else json.dumps(k).encode())
            for k in keys
        ]
        df = self.spark.createDataFrame(
            list(zip(key_bytes, vals)), "key binary, value binary"
        )
        ft = self._topic(topic)
        with self._lock:  # offset assignment reads current maxima
            before = (
                {r.partition: r.offset for r in ft.read()
                 .groupBy("partition").max("offset")
                 .withColumnRenamed("max(offset)", "offset").collect()}
                if ft.exists() else {}
            )
            ft.append(df)
            after = (
                ft.read().groupBy("partition").max("offset")
                .withColumnRenamed("max(offset)", "offset").collect()
            )
            self._data.notify_all()  # wake long-pollers
        resp["offsets"] = [
            {"partition": int(r.partition), "offset": int(r.offset)}
            for r in after
            if before.get(r.partition, -1) < r.offset
        ]
        return resp

    # -- consumers ---------------------------------------------------------

    def create_consumer(self, group: str, body: dict) -> dict:
        name = body["name"]
        auto = str(
            body.get("auto.commit.enable",
                     body.get("enable.auto.commit", "true"))
        ).lower() != "false"
        with self._lock:
            cons = _Consumer(fmt=body.get("format", "binary"),
                             auto_commit=auto)
            # resume from the group's committed offsets, as a real
            # rejoining group member would
            cons.positions = dict(self._group_offsets.get(group, {}))
            self._consumers[(group, name)] = cons
        return {
            "instance_id": name,
            "base_uri": f"/consumers/{group}/instances/{name}",
        }

    def delete_consumer(self, group: str, name: str) -> None:
        with self._lock:
            self._consumers.pop((group, name), None)

    def _fetch_past(self, topic: str, positions: dict,
                    fmt: str, with_topic: bool = False,
                    max_bytes: int | None = None
                    ) -> tuple[list[dict], dict, int]:
        """Records past the given positions, rendered; returns
        (records, advanced positions, value bytes consumed).
        ``max_bytes`` caps the summed raw value payload size v2-style
        (always yields ≥1 record if any are available)."""
        ft = self._topic(topic)
        if not ft.exists():
            return [], {}, 0
        rows = sorted(
            ft.read().collect(), key=lambda r: (r.partition, r.offset)
        )
        out, new_pos, used = [], {}, 0
        for r in rows:
            if r.offset <= positions.get((topic, r.partition), -1):
                continue
            size = len(bytes(r.value)) if r.value is not None else 0
            if max_bytes is not None and out and used + size > max_bytes:
                break
            rec = self._render(fmt, r)
            if with_topic:
                rec["topic"] = topic
            out.append(rec)
            used += size
            new_pos[(topic, r.partition)] = r.offset
        return out, new_pos, used

    def consume(self, group: str, name: str, topic: str) -> list[dict]:
        """v1 single-topic consume: advances the position and (v1
        always auto-commits) the group's committed offsets."""
        with self._lock:
            cons = self._consumers[(group, name)]
            positions = dict(cons.positions)
        out, new_pos, _ = self._fetch_past(topic, positions, cons.fmt)
        with self._lock:
            cons.positions.update(new_pos)
            self._group_offsets.setdefault(group, {}).update(new_pos)
        return out

    # -- v2 subscription / long-poll ---------------------------------------

    def subscribe(self, group: str, name: str, body: dict) -> None:
        with self._lock:
            self._consumers[(group, name)].subscription = list(
                body.get("topics", [])
            )

    def get_subscription(self, group: str, name: str) -> dict:
        with self._lock:
            return {"topics": list(self._consumers[(group, name)].subscription)}

    def unsubscribe(self, group: str, name: str) -> None:
        with self._lock:
            self._consumers[(group, name)].subscription = []

    def poll_records(self, group: str, name: str, timeout_ms: int = 0,
                     max_bytes: int | None = None) -> list[dict]:
        """v2 long-poll over the subscription: returns as soon as any
        subscribed topic has records past the instance's position, else
        blocks until a produce lands or ``timeout_ms`` lapses. Position
        always advances; the group commit follows only under
        auto-commit (else the offsets endpoint moves it)."""
        deadline = time.monotonic() + timeout_ms / 1000.0
        while True:
            with self._lock:
                cons = self._consumers[(group, name)]
                topics = list(cons.subscription)
                positions = dict(cons.positions)
                fmt, auto = cons.fmt, cons.auto_commit
            out: list[dict] = []
            new_pos: dict[tuple[str, int], int] = {}
            used = 0
            for t in topics:
                room = None if max_bytes is None else max_bytes - used
                if room is not None and out and room <= 0:
                    break
                recs, adv, n = self._fetch_past(
                    t, positions, fmt, with_topic=True, max_bytes=room
                )
                out.extend(recs)
                new_pos.update(adv)
                used += n
            if out or timeout_ms <= 0:
                with self._lock:
                    cons = self._consumers[(group, name)]
                    cons.positions.update(new_pos)
                    if auto and new_pos:
                        self._group_offsets.setdefault(group, {}).update(
                            new_pos
                        )
                return out
            with self._data:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    return []
                self._data.wait(timeout=min(remaining, 0.25))
                if time.monotonic() >= deadline:
                    return []

    def commit_offsets(self, group: str, name: str,
                       body: dict | None = None) -> None:
        """v2 manual commit: with a body, commit the given offsets;
        without, commit the instance's current positions."""
        with self._lock:
            cons = self._consumers[(group, name)]
            store = self._group_offsets.setdefault(group, {})
            if body and body.get("offsets"):
                for o in body["offsets"]:
                    store[(o["topic"], int(o["partition"]))] = int(o["offset"])
            else:
                store.update(cons.positions)

    def committed_offsets(self, group: str, name: str) -> dict:
        with self._lock:
            self._consumers[(group, name)]  # 404 via KeyError if absent
            return {
                "offsets": [
                    {"topic": t, "partition": p, "offset": o,
                     "metadata": ""}
                    for (t, p), o in sorted(
                        self._group_offsets.get(group, {}).items()
                    )
                ]
            }

    def _render(self, fmt: str, r) -> dict:
        rec = {"partition": int(r.partition), "offset": int(r.offset)}
        if fmt == "avro":
            sid = int.from_bytes(bytes(r.value)[1:5], "big")
            rec["value"] = avro_codec.decode_record(
                bytes(r.value)[5:], self._avro_schemas[sid]
            )
            rec["key"] = json.loads(bytes(r.key)) if r.key is not None else None
        elif fmt == "json":
            rec["value"] = json.loads(bytes(r.value))
            rec["key"] = json.loads(bytes(r.key)) if r.key is not None else None
        else:
            rec["value"] = base64.b64encode(bytes(r.value)).decode()
            rec["key"] = (
                base64.b64encode(bytes(r.key)).decode()
                if r.key is not None else None
            )
        return rec


def _make_handler(proxy: RestProxy):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet test output
            pass

        def _send(self, code: int, payload) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/vnd.kafka.v1+json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _body(self) -> dict:
            n = int(self.headers.get("Content-Length", 0))
            return json.loads(self.rfile.read(n)) if n else {}

        def _fmt_from_content_type(self) -> str:
            ct = self.headers.get("Content-Type", "")
            if ct.startswith(_CT_PREFIX):
                rest = ct[len(_CT_PREFIX):]  # e.g. "avro.v1+json"
                return rest.split(".", 1)[0]
            return "binary"

        def _route(self) -> tuple[list[str], dict[str, str]]:
            from urllib.parse import parse_qsl, urlsplit
            u = urlsplit(self.path)
            return u.path.strip("/").split("/"), dict(parse_qsl(u.query))

        def do_POST(self):
            parts, _q = self._route()
            try:
                if parts[0] == "topics" and len(parts) == 2:
                    fmt = self._fmt_from_content_type()
                    self._send(200, proxy.produce(parts[1], fmt, self._body()))
                elif parts[0] == "consumers" and len(parts) == 2:
                    self._send(200, proxy.create_consumer(parts[1], self._body()))
                elif (len(parts) == 5 and parts[0] == "consumers"
                        and parts[2] == "instances"
                        and parts[4] == "subscription"):
                    proxy.subscribe(parts[1], parts[3], self._body())
                    self._send(204, {})
                elif (len(parts) == 5 and parts[0] == "consumers"
                        and parts[2] == "instances" and parts[4] == "offsets"):
                    proxy.commit_offsets(parts[1], parts[3], self._body())
                    self._send(200, {})
                else:
                    self._send(404, {"error_code": 40401, "message": "not found"})
            except KeyError as e:
                self._send(404, {"error_code": 40403, "message": str(e)})
            except Exception as e:  # proxy-style error envelope
                self._send(500, {"error_code": 50002, "message": str(e)})

        def do_GET(self):
            parts, q = self._route()
            try:
                if (len(parts) == 6 and parts[0] == "consumers"
                        and parts[2] == "instances" and parts[4] == "topics"):
                    self._send(200, proxy.consume(parts[1], parts[3], parts[5]))
                elif (len(parts) == 5 and parts[0] == "consumers"
                        and parts[2] == "instances" and parts[4] == "records"):
                    self._send(200, proxy.poll_records(
                        parts[1], parts[3],
                        timeout_ms=int(q.get("timeout", 0)),
                        max_bytes=(int(q["max_bytes"])
                                   if "max_bytes" in q else None),
                    ))
                elif (len(parts) == 5 and parts[0] == "consumers"
                        and parts[2] == "instances"
                        and parts[4] == "subscription"):
                    self._send(200, proxy.get_subscription(parts[1], parts[3]))
                elif (len(parts) == 5 and parts[0] == "consumers"
                        and parts[2] == "instances" and parts[4] == "offsets"):
                    self._send(200, proxy.committed_offsets(parts[1], parts[3]))
                elif parts == ["topics"]:
                    self._send(200, proxy.list_topics())
                elif len(parts) == 2 and parts[0] == "topics":
                    self._send(200, proxy.topic_info(parts[1]))
                elif (len(parts) == 3 and parts[0] == "topics"
                        and parts[2] == "partitions"):
                    self._send(200, proxy.topic_partitions(parts[1]))
                else:
                    self._send(404, {"error_code": 40401, "message": "not found"})
            except KeyError as e:
                self._send(404, {"error_code": 40403, "message": str(e)})
            except Exception as e:
                self._send(500, {"error_code": 50002, "message": str(e)})

        def do_DELETE(self):
            parts, _q = self._route()
            try:
                if (len(parts) == 4 and parts[0] == "consumers"
                        and parts[2] == "instances"):
                    proxy.delete_consumer(parts[1], parts[3])
                    self._send(204, {})
                elif (len(parts) == 5 and parts[0] == "consumers"
                        and parts[2] == "instances"
                        and parts[4] == "subscription"):
                    proxy.unsubscribe(parts[1], parts[3])
                    self._send(204, {})
                else:
                    self._send(404, {"error_code": 40401, "message": "not found"})
            except KeyError as e:
                self._send(404, {"error_code": 40403, "message": str(e)})

    return Handler


class RestProxyServer:
    """Threaded HTTP server wrapper; ``port=0`` picks an ephemeral port."""

    def __init__(self, proxy: RestProxy, host: str = "127.0.0.1", port: int = 0):
        self.httpd = ThreadingHTTPServer((host, port), _make_handler(proxy))
        self.port = self.httpd.server_address[1]
        self._thread = threading.Thread(
            target=self.httpd.serve_forever, daemon=True
        )

    def start(self) -> "RestProxyServer":
        self._thread.start()
        return self

    def stop(self) -> None:
        self.httpd.shutdown()
        self.httpd.server_close()
