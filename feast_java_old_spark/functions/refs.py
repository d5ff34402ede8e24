"""Feature reference parsing / formatting (F2, F6).

Parity:
- string form ``"table:feature"``
  (``common/src/main/java/feast/common/models/FeatureV2.java:30-36``),
- parse rules: exactly one ``:``, both parts non-empty, project-qualified
  refs rejected (``sdk/java/src/main/java/com/gojek/feast/RequestUtil.java:51-79``),
- table string ref ``project/table``
  (``common/src/main/java/feast/common/models/FeatureTable.java:32-47``).
"""

from __future__ import annotations

from typing import NamedTuple


class FeatureRef(NamedTuple):
    table: str
    name: str

    def __str__(self) -> str:
        return f"{self.table}:{self.name}"


def parse_feature_ref(ref: str) -> FeatureRef:
    if "/" in ref:
        raise ValueError(
            f"project-qualified feature reference {ref!r} rejected "
            "(RequestUtil.java:62-69)"
        )
    if ref.count(":") != 1:
        raise ValueError(
            f"feature reference {ref!r} must be 'table:feature' (RequestUtil.java:51-79)"
        )
    table, name = ref.split(":")
    if not table or not name:
        raise ValueError(f"feature reference {ref!r} missing table or feature name")
    return FeatureRef(table, name)


def feature_ref_str(table: str, name: str) -> str:
    return f"{table}:{name}"


def table_ref_str(project: str, table: str) -> str:
    return f"{project}/{table}"
