"""Topic ACLs — the ``kafka-acls`` admin analog (reference ships the
binary in its distribution: /root/reference/binaries/kafka-acls).

Kafka's authorizer semantics, compactly: ACL entries are
(principal, operation, resource, ALLOW|DENY) with literal or PREFIXED
resource patterns; DENY beats ALLOW; if NO acl references a resource,
access is governed by ``allow_everyone_if_no_acl_found`` (Kafka's
broker setting of the same name, default False once an authorizer is
on). Operations follow the Kafka names (READ, WRITE, CREATE, DELETE,
DESCRIBE, ALL).

This is engine-side enforcement for the engine's own surfaces —
``check()`` is called by whoever fronts a topic (e.g. a REST layer);
it holds no credentials and does no authentication (out of scope, as
in the reference's dev stack which runs with the authorizer off).
"""

from __future__ import annotations

from dataclasses import dataclass

OPERATIONS = {"READ", "WRITE", "CREATE", "DELETE", "DESCRIBE", "ALL"}


@dataclass(frozen=True)
class Acl:
    principal: str  # e.g. "User:alice" or "*"
    operation: str
    resource: str  # topic name or prefix
    prefixed: bool = False
    permission: str = "ALLOW"  # or "DENY"

    def matches(self, principal: str, operation: str, resource: str) -> bool:
        if self.principal not in ("*", principal):
            return False
        if self.operation != "ALL" and self.operation != operation:
            return False
        if self.prefixed:
            return resource.startswith(self.resource)
        return self.resource == resource


class AclRegistry:
    def __init__(self, allow_everyone_if_no_acl_found: bool = False):
        self._acls: list[Acl] = []
        self.allow_everyone_if_no_acl_found = allow_everyone_if_no_acl_found

    def add(
        self,
        principal: str,
        operation: str,
        resource: str,
        prefixed: bool = False,
        permission: str = "ALLOW",
    ) -> Acl:
        op = operation.upper()
        if op not in OPERATIONS:
            raise ValueError(f"unknown operation {operation!r} (have {sorted(OPERATIONS)})")
        perm = permission.upper()
        if perm not in ("ALLOW", "DENY"):
            raise ValueError(f"permission must be ALLOW or DENY, got {permission!r}")
        acl = Acl(principal, op, resource, prefixed, perm)
        self._acls.append(acl)
        return acl

    def remove(self, acl: Acl) -> None:
        self._acls.remove(acl)

    def list(self, resource: str | None = None) -> list[Acl]:
        if resource is None:
            return list(self._acls)
        return [a for a in self._acls if a.resource == resource or (
            a.prefixed and resource.startswith(a.resource))]

    def check(self, principal: str, operation: str, resource: str) -> bool:
        """Kafka authorizer decision: DENY wins; else any ALLOW; else the
        no-acl-found default (only when NOTHING references the resource)."""
        op = operation.upper()
        hits = [a for a in self._acls if a.matches(principal, op, resource)]
        if any(a.permission == "DENY" for a in hits):
            return False
        if any(a.permission == "ALLOW" for a in hits):
            return True
        referenced = any(
            (a.resource == resource) or (a.prefixed and resource.startswith(a.resource))
            for a in self._acls
        )
        return self.allow_everyone_if_no_acl_found and not referenced

    def require(self, principal: str, operation: str, resource: str) -> None:
        if not self.check(principal, operation, resource):
            raise PermissionError(
                f"{principal} is not authorized to {operation.upper()} {resource}"
            )
