"""kafka-acls analog: Kafka authorizer semantics — DENY beats ALLOW,
prefixed patterns, wildcard principals, no-acl-found default."""

import pytest

from kafka_stream_spark.acls import AclRegistry


def test_allow_and_default_deny():
    r = AclRegistry()
    r.add("User:alice", "READ", "clicks")
    assert r.check("User:alice", "read", "clicks")
    assert not r.check("User:bob", "READ", "clicks")     # no matching allow
    assert not r.check("User:alice", "WRITE", "clicks")  # op not granted
    assert not r.check("User:alice", "READ", "other")    # nothing references it


def test_deny_beats_allow():
    r = AclRegistry()
    r.add("*", "ALL", "logs_", prefixed=True)
    r.add("User:mallory", "ALL", "logs_", prefixed=True, permission="DENY")
    assert r.check("User:alice", "WRITE", "logs_broker")
    assert not r.check("User:mallory", "READ", "logs_broker")


def test_prefixed_and_wildcard():
    r = AclRegistry()
    r.add("*", "DESCRIBE", "telemetry.", prefixed=True)
    assert r.check("User:x", "DESCRIBE", "telemetry.eu")
    assert not r.check("User:x", "DESCRIBE", "telemetr")  # not under prefix


def test_no_acl_found_toggle():
    relaxed = AclRegistry(allow_everyone_if_no_acl_found=True)
    assert relaxed.check("User:x", "READ", "unreferenced")
    relaxed.add("User:alice", "READ", "guarded")
    # once ANY acl references the resource, the default no longer applies
    assert not relaxed.check("User:x", "READ", "guarded")


def test_require_and_validation():
    r = AclRegistry()
    with pytest.raises(ValueError, match="unknown operation"):
        r.add("User:a", "FLY", "t")
    with pytest.raises(ValueError, match="ALLOW or DENY"):
        r.add("User:a", "READ", "t", permission="MAYBE")
    with pytest.raises(PermissionError, match="not authorized to WRITE"):
        r.require("User:a", "write", "t")
    acl = r.add("User:a", "WRITE", "t")
    r.require("User:a", "WRITE", "t")
    r.remove(acl)
    with pytest.raises(PermissionError):
        r.require("User:a", "WRITE", "t")
    assert r.list() == []
