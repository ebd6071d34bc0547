"""In-process schema registry (Schema Registry analog, SURVEY.md §1.2).

The reference registers key+value schemas per topic, versions them, and
compatibility-checks evolution (reference behaviors:
``integration-tests/kafka-tests.yml:127-143`` subject/version listing,
``:150-156`` compatibility check of an added-field schema → is_compatible,
``:157-159`` global config). This is the engine-side equivalent: a small
catalog mapping subject → versioned Spark StructType schemas with
BACKWARD/FORWARD/FULL/NONE compatibility checking.

At scale this is driver-side metadata only — schemas never ship with rows;
executors see them compiled into ``from_json``/``from_avro`` expressions.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum

from pyspark.sql.types import StructField, StructType


class Compatibility(str, Enum):
    NONE = "NONE"
    BACKWARD = "BACKWARD"  # new schema can read data written with old
    FORWARD = "FORWARD"    # old schema can read data written with new
    FULL = "FULL"


class IncompatibleSchemaError(ValueError):
    pass


@dataclass
class _Subject:
    versions: list[StructType] = field(default_factory=list)
    compatibility: Compatibility | None = None  # None → registry default


def _fields(s: StructType) -> dict[str, StructField]:
    return {f.name: f for f in s.fields}


def _can_read(reader: StructType, writer: StructType) -> list[str]:
    """Avro-style resolution: can ``reader`` decode data written as ``writer``?

    Errors when a reader field is missing from the writer and is not
    nullable (no default), or when a shared field changed type.
    """
    problems = []
    wf = _fields(writer)
    for f in reader.fields:
        if f.name not in wf:
            if not f.nullable:
                problems.append(
                    f"reader field {f.name!r} absent in writer and not nullable"
                )
        elif f.dataType != wf[f.name].dataType:
            problems.append(
                f"field {f.name!r} type changed: {wf[f.name].dataType.simpleString()}"
                f" -> {f.dataType.simpleString()}"
            )
    return problems


class SchemaRegistry:
    """Subject → versioned schemas with compatibility gating."""

    def __init__(self, default_compatibility: Compatibility = Compatibility.BACKWARD):
        self._subjects: dict[str, _Subject] = {}
        self.default_compatibility = default_compatibility
        self._ids: list[tuple[str, int]] = []  # global schema id → (subject, version)

    # -- registration ------------------------------------------------------

    def register(self, subject: str, schema: StructType) -> int:
        """Register a schema version; returns the global schema id.

        Re-registering the current schema is idempotent (same id), like the
        reference registry.
        """
        sub = self._subjects.setdefault(subject, _Subject())
        if sub.versions and sub.versions[-1] == schema:
            return self._id_of(subject, len(sub.versions))
        problems = self.check(subject, schema)
        if problems:
            raise IncompatibleSchemaError(
                f"subject {subject!r}: {'; '.join(problems)}"
            )
        sub.versions.append(schema)
        self._ids.append((subject, len(sub.versions)))
        return len(self._ids)  # 1-based global id

    def _id_of(self, subject: str, version: int) -> int:
        return self._ids.index((subject, version)) + 1

    # -- queries (kafka-tests.yml:127-148 shapes) --------------------------

    def subjects(self) -> list[str]:
        return sorted(self._subjects)

    def versions(self, subject: str) -> list[int]:
        return list(range(1, len(self._subjects[subject].versions) + 1))

    def get(self, subject: str, version: int | str = "latest") -> StructType:
        vs = self._subjects[subject].versions
        if version == "latest":
            return vs[-1]
        return vs[int(version) - 1]

    def by_id(self, schema_id: int) -> StructType:
        subject, version = self._ids[schema_id - 1]
        return self.get(subject, version)

    # -- compatibility (kafka-tests.yml:150-159) ---------------------------

    def check(self, subject: str, candidate: StructType) -> list[str]:
        """Empty list ⇒ compatible (the is_compatible=true response)."""
        sub = self._subjects.get(subject)
        if sub is None or not sub.versions:
            return []
        mode = sub.compatibility or self.default_compatibility
        latest = sub.versions[-1]
        problems = []
        if mode in (Compatibility.BACKWARD, Compatibility.FULL):
            problems += _can_read(candidate, latest)
        if mode in (Compatibility.FORWARD, Compatibility.FULL):
            problems += _can_read(latest, candidate)
        return problems

    def is_compatible(self, subject: str, candidate: StructType) -> bool:
        return not self.check(subject, candidate)

    def set_compatibility(self, level: Compatibility, subject: str | None = None) -> None:
        if subject is None:
            self.default_compatibility = level
        else:
            self._subjects.setdefault(subject, _Subject()).compatibility = level

    def get_compatibility(self, subject: str | None = None) -> Compatibility:
        """GET /config (kafka-tests.yml:157-159): the effective level —
        the subject override if set, else the registry default."""
        if subject is not None:
            sub = self._subjects.get(subject)
            if sub is not None and sub.compatibility is not None:
                return sub.compatibility
        return self.default_compatibility
