"""Schema registry: model metadata with the annotation semantics that change
query results.

Replaces the reference's zod-annotation layer (SURVEY.md §1.2; reference
``packages/protobase/src/BaseSchema.ts:83-282`` patches zod prototypes with
``.id() .indexed() .groupIndex() .search() .filter() .generate() .linkTo()
.secret() .hidden()``). Here the same facts are plain Python metadata attached
to columns of a Spark ``StructType`` — consumed by the list-query planner
(plans/listquery.py), the link-join operator (operators/joins.py) and the
projection masks.

Semantics preserved (parity-critical, see SURVEY.md §4.3):
- ``id``: primary key used by upsert/dedup; default generated ids are
  time-sortable (functions.core.gen_time_sortable_id).
- ``indexed``: column is orderable/pageable (the planner only accepts
  ``order_by`` on indexed columns when ``strict_indexes=True``).
- ``group_index``: column participates in grouping; optional ``group_fn``
  maps one row to MANY group keys (reference compiles a JS fn string with
  ``new Function`` at ``db.ts:340,486``; events use it for path-prefix
  expansion ``eventsSchemas.ts:6``). Here ``group_fn`` is a Column->Column
  expression returning an array (exploded before groupBy).
- ``search``: include/exclude from free-text search (default include,
  ``BaseSchema.ts:209-212``).
- ``link_to``: foreign key -> (model, target key); resolved by broadcast
  left join (J1).
- ``secret`` / ``hidden``: per-view projection masking
  (``ProtoSchema.ts:89-116``).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

from pyspark.sql import Column


@dataclass
class FieldSpec:
    name: str
    is_id: bool = False
    indexed: bool = False
    searchable: bool = True          # free-text search participation
    filterable: bool = True
    group_index: bool = False
    # expression mapping the column to an ARRAY of group keys (multi-membership
    # grouping, A4). None => group directly on the column value.
    group_fn: Optional[Callable[[Column], Column]] = None
    link_to: Optional[tuple[str, str]] = None     # (model_name, target_key)
    secret: bool = False
    hidden_views: frozenset[str] = frozenset()
    # default generator expression applied when the column is NULL at create
    generate: Optional[Callable[[], Column]] = None
    generate_force: bool = False

    def visible_in(self, view: str) -> bool:
        if self.secret:
            return False
        return view not in self.hidden_views


@dataclass
class Model:
    name: str
    fields: dict[str, FieldSpec] = field(default_factory=dict)
    default_order_by: Optional[str] = None
    default_order_direction: str = "asc"

    @property
    def id_field(self) -> str:
        # reference: idField = first .id() column, else literal 'id'
        # (ProtoModel.ts:46)
        for f in self.fields.values():
            if f.is_id:
                return f.name
        return "id"

    def searchable_columns(self, all_columns: list[str]) -> list[str]:
        out = []
        for c in all_columns:
            spec = self.fields.get(c)
            if spec is None or spec.searchable:
                out.append(c)
        return out

    def indexed_columns(self) -> list[str]:
        return [f.name for f in self.fields.values() if f.indexed or f.is_id]

    def group_indexes(self) -> list[FieldSpec]:
        return [f for f in self.fields.values() if f.group_index]

    def visible_columns(self, all_columns: list[str], view: str = "list") -> list[str]:
        out = []
        for c in all_columns:
            spec = self.fields.get(c)
            if spec is None or spec.visible_in(view):
                out.append(c)
        return out


def model(name: str, *specs: FieldSpec, default_order_by: str | None = None,
          default_order_direction: str = "asc") -> Model:
    return Model(
        name=name,
        fields={s.name: s for s in specs},
        default_order_by=default_order_by,
        default_order_direction=default_order_direction,
    )
