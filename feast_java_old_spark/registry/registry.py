"""File-backed registry with the reference's control-plane semantics.

Re-expresses ``core/src/main/java/feast/core/service/SpecService.java``
(497 LoC) + ``ProjectService.java`` over a JSON file instead of
Postgres/JPA — the reference itself ships this model as the
``LocalRegistryRepo`` boot mode
(``serving/src/main/java/feast/serving/registry/LocalRegistryRepo.java:38-69``).

Semantics preserved:
- apply* is an idempotent upsert; applying an equal spec is a no-op
  (``SpecService.applyFeatureTable:395-398``);
- entity type change prohibited (``EntityV2.updateFromProto:119-124``);
- feature-table name immutable; revision increments on change
  (``FeatureTable.updateFromProto:163-214``);
- delete is soft: listing hides deleted tables, get raises
  (``SpecService.deleteFeatureTable:480-496``, ``listFeatureTables:427-433``);
- re-applying a deleted table resurrects it with revision continuing;
- default project ``"default"`` auto-created and protected from archive
  (``SpecService.java:320-322``, ``ProjectService.java:45-80``);
- applying into an archived project is rejected
  (``SpecService.applyFeatureTable:383-389``);
- label filters AND-match (P6), entity-set filters exact-match (P7).
"""

from __future__ import annotations

import copy
import json
import os
import tempfile
from typing import Optional

from feast_java_old_spark.registry.model import (
    Entity,
    FeatureTable,
    Project,
    Store,
)
from feast_java_old_spark.registry.validation import (
    ValidationError,
    check_name,
    check_project_name,
    validate_feature_table,
)

DEFAULT_PROJECT = "default"


class Registry:
    """In-memory registry with optional JSON-file persistence."""

    def __init__(self, path: Optional[str] = None, audit=None):
        self.path = path
        # Optional structured audit trail (registry/audit.py): every
        # control-plane MUTATION emits one ACTION entry (CREATE / UPDATE /
        # DELETE / ARCHIVE + resource ref) — the reference's
        # AuditLogger.logAction surface (AuditLogger.java:90-101) wired
        # into SpecService-equivalent methods. No-op feature-table
        # upserts (equal spec hash — the early return) emit nothing:
        # the log records state changes, not calls.
        self.audit = audit
        self._projects: dict[str, Project] = {}
        self._entities: dict[tuple[str, str], Entity] = {}
        self._tables: dict[tuple[str, str], FeatureTable] = {}
        self._stores: dict[str, Store] = {}
        self._projects[DEFAULT_PROJECT] = Project(DEFAULT_PROJECT)
        if path and os.path.exists(path):
            self._load()

    # ------------------------------------------------------------------ io

    def _load(self) -> None:
        with open(self.path) as f:
            d = json.load(f)
        self._projects = {p["name"]: Project.from_dict(p) for p in d.get("projects", [])}
        self._projects.setdefault(DEFAULT_PROJECT, Project(DEFAULT_PROJECT))
        self._entities = {
            (e["project"], e["spec"]["name"]): Entity.from_dict(e["spec"])
            for e in d.get("entities", [])
        }
        self._tables = {
            (t["project"], t["spec"]["name"]): FeatureTable.from_dict(t["spec"])
            for t in d.get("feature_tables", [])
        }
        self._stores = {s["name"]: Store.from_dict(s) for s in d.get("stores", [])}

    def save(self) -> None:
        if not self.path:
            return
        d = {
            "projects": [p.to_dict() for p in self._projects.values()],
            "entities": [
                {"project": proj, "spec": e.to_dict()}
                for (proj, _), e in sorted(self._entities.items())
            ],
            "feature_tables": [
                {"project": proj, "spec": t.to_dict()}
                for (proj, _), t in sorted(self._tables.items())
            ],
            "stores": [s.to_dict() for s in self._stores.values()],
        }
        # Atomic write: the serving side may re-read the file at any time.
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(self.path) or ".")
        try:
            with os.fdopen(fd, "w") as f:
                json.dump(d, f, indent=1, sort_keys=True)
            os.replace(tmp, self.path)
        except BaseException:
            if os.path.exists(tmp):
                os.unlink(tmp)
            raise

    def _log_action(self, action: str, resource_type: str, rid: str) -> None:
        if self.audit is not None:
            self.audit.log_action(action, resource_type, rid)

    # ------------------------------------------------------------ projects

    def create_project(self, name: str) -> Project:
        check_project_name(name)
        if name in self._projects and not self._projects[name].archived:
            raise ValidationError(f"project {name!r} already exists")
        p = Project(name)
        self._projects[name] = p
        self.save()
        self._log_action("CREATE", "PROJECT", name)
        return p

    def archive_project(self, name: str) -> None:
        """Parity: default project protected (``ProjectService.java:68-74``)."""
        if name == DEFAULT_PROJECT:
            raise ValidationError("default project cannot be archived")
        p = self._projects.get(name)
        if p is None:
            raise KeyError(f"project {name!r} not found")
        p.archived = True
        self.save()
        self._log_action("ARCHIVE", "PROJECT", name)

    def list_projects(self, include_archived: bool = False) -> list[Project]:
        return [
            p
            for p in sorted(self._projects.values(), key=lambda p: p.name)
            if include_archived or not p.archived
        ]

    def _ensure_project(self, project: str) -> bool:
        """Auto-create on apply (``SpecService.applyEntity:279-283``);
        archived projects reject writes. Returns True when the project
        was newly created — the CALLER logs the CREATE PROJECT audit
        entry after its save() succeeds (auto-create is the same
        persisted state change as an explicit create_project, but an
        entry written BEFORE validation/save would durably record a
        creation a failed apply never persisted)."""
        check_project_name(project)
        p = self._projects.get(project)
        created = False
        if p is None:
            self._projects[project] = Project(project)
            created = True
        elif p.archived:
            raise ValidationError(f"project {project!r} is archived")
        return created

    # ------------------------------------------------------------ entities

    def apply_entity(self, entity: Entity, project: str = DEFAULT_PROJECT) -> Entity:
        """Idempotent upsert; type change forbidden
        (parity: ``SpecService.applyEntity:268-312``)."""
        new_project = self._ensure_project(project)
        check_name(entity.name, "entity name")
        existing = self._entities.get((project, entity.name))
        if existing is not None and existing.value_type != entity.value_type:
            raise ValidationError(
                f"entity {entity.name!r}: type change "
                f"{existing.value_type.value} -> {entity.value_type.value} "
                "prohibited (EntityV2.java:119-124)"
            )
        self._entities[(project, entity.name)] = copy.deepcopy(entity)
        self.save()
        if new_project:
            self._log_action("CREATE", "PROJECT", project)
        self._log_action(
            "UPDATE" if existing is not None else "CREATE",
            "ENTITY",
            f"{project}/{entity.name}",
        )
        return entity

    def get_entity(self, name: str, project: str = DEFAULT_PROJECT) -> Entity:
        e = self._entities.get((project, name))
        if e is None:
            raise KeyError(f"entity {project}/{name} not found")
        return e

    def list_entities(
        self, project: str = DEFAULT_PROJECT, labels: Optional[dict[str, str]] = None
    ) -> list[Entity]:
        out = [e for (p, _), e in sorted(self._entities.items()) if p == project]
        if labels:
            out = [e for e in out if e.has_all_labels(labels)]
        return out

    # ------------------------------------------------------- feature tables

    def apply_feature_table(
        self, table: FeatureTable, project: str = DEFAULT_PROJECT
    ) -> FeatureTable:
        """Validate -> resolve entities -> upsert
        (parity: ``SpecService.applyFeatureTable:373-407``)."""
        # A just-created project has no entities, so entity resolution
        # below always rejects a table applied into one — new_project
        # only matters for the audit ordering contract.
        new_project = self._ensure_project(project)
        validate_feature_table(table)
        for ent in table.entities:
            if (project, ent) not in self._entities:
                raise ValidationError(
                    f"feature table {table.name!r} references unknown entity "
                    f"{ent!r} (FeatureTable.resolveEntities:258-273)"
                )
        existing = self._tables.get((project, table.name))
        if existing is not None and not existing.is_deleted:
            if existing.spec_hash() == table.spec_hash():
                return existing  # no-op on equal spec
            updated = copy.deepcopy(table)
            updated.revision = existing.revision + 1
            updated.is_deleted = False
            self._tables[(project, table.name)] = updated
            self.save()
            self._log_action("UPDATE", "FEATURE_TABLE", f"{project}/{table.name}")
            return updated
        created = copy.deepcopy(table)
        created.revision = (existing.revision + 1) if existing is not None else 1
        created.is_deleted = False
        self._tables[(project, table.name)] = created
        self.save()
        if new_project:
            self._log_action("CREATE", "PROJECT", project)
        self._log_action("CREATE", "FEATURE_TABLE", f"{project}/{table.name}")
        return created

    def get_feature_table(
        self, name: str, project: str = DEFAULT_PROJECT
    ) -> FeatureTable:
        """Deleted tables raise (parity: ``SpecService.getFeatureTable:465-470``)."""
        t = self._tables.get((project, name))
        if t is None or t.is_deleted:
            raise KeyError(f"feature table {project}/{name} not found")
        return t

    def list_feature_tables(
        self,
        project: str = DEFAULT_PROJECT,
        labels: Optional[dict[str, str]] = None,
        entities: Optional[list[str]] = None,
    ) -> list[FeatureTable]:
        """Soft-delete filter P9 + label filter P6 + entity-set filter P7."""
        out = [
            t
            for (p, _), t in sorted(self._tables.items())
            if p == project and not t.is_deleted
        ]
        if labels:
            out = [t for t in out if t.has_all_labels(labels)]
        if entities:
            out = [t for t in out if t.has_all_entities(entities)]
        return out

    def list_features(
        self,
        project: str = DEFAULT_PROJECT,
        labels: Optional[dict[str, str]] = None,
        entities: Optional[list[str]] = None,
    ) -> dict[str, "Feature"]:
        """Map of 'table:feature' -> Feature
        (parity: ``SpecService.listFeatures:141-180``)."""
        out = {}
        for t in self.list_feature_tables(project, entities=entities):
            feats = t.features_by_labels(labels) if labels else t.features
            for f in feats:
                out[f"{t.name}:{f.name}"] = f
        return out

    def delete_feature_table(self, name: str, project: str = DEFAULT_PROJECT) -> None:
        """Soft delete (parity: ``SpecService.deleteFeatureTable:480-496``)."""
        t = self._tables.get((project, name))
        if t is None or t.is_deleted:
            raise KeyError(f"feature table {project}/{name} not found")
        t.is_deleted = True
        self.save()
        self._log_action("DELETE", "FEATURE_TABLE", f"{project}/{name}")

    # --------------------------------------------------------------- stores

    def update_store(self, store: Store) -> Store:
        """Parity: ``SpecService.updateStore:332-360``."""
        existing_store = store.name in self._stores
        self._stores[store.name] = copy.deepcopy(store)
        self.save()
        self._log_action(
            "UPDATE" if existing_store else "CREATE", "STORE", store.name
        )
        return store

    def list_stores(self) -> list[Store]:
        return sorted(self._stores.values(), key=lambda s: s.name)

    def get_store(self, name: str) -> Store:
        s = self._stores.get(name)
        if s is None:
            raise KeyError(f"store {name!r} not found")
        return s

    def subscribed_tables(self, store_name: str) -> list[tuple[str, FeatureTable]]:
        """Feature tables a store materializes, per subscription wildcards
        (P8; parity: ``common/.../models/Store.java:83-162``)."""
        store = self.get_store(store_name)
        out = []
        for (project, _), t in sorted(self._tables.items()):
            if not t.is_deleted and store.is_subscribed_to(project, t.name):
                out.append((project, t))
        return out
