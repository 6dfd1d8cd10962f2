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
- ``indexed``: advisory orderability metadata (the reference's db layer
  uses its index only as a fetch-order fast path, never as a gate —
  ``db.ts:292-317`` falls back to a full scan — so ``apply_order``
  likewise accepts any column; ``indexed_columns()`` exposes the
  metadata for callers that want to warn).
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

import json
import re
from dataclasses import dataclass, field
from typing import Any, Callable, Optional

from pyspark.sql import Column
from pyspark.sql import types as T


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
    # Spark schema for runtime-declared models (from_json_description);
    # None for models whose schema comes from an existing parquet footer.
    schema: Optional[T.StructType] = None
    # raw key specs preserved so to_json_description round-trips losslessly
    _key_specs: dict[str, dict] = field(default_factory=dict, repr=False)

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
            # secret columns are NEVER searchable, whatever `searchable`
            # says: free-text search over a projection-masked column
            # would let a caller binary-search its values out
            # (ProtoModel.ts:205-211 applies the same guard)
            if spec is None or (spec.searchable and not spec.secret):
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


# ---------------------------------------------------------------------------
# Runtime model declaration from a JSON object description
# ---------------------------------------------------------------------------
# The reference creates new models at runtime from a JSON schema description
# (the `objects` bundle: ``objectsAPI.ts:133-193`` accepts
# ``{name, id, keys: {field: {type, params, modifiers: [{name, params}]}}}``,
# ``objectsSchemas.ts:11-20`` enumerates the legal types and modifiers, and
# ``transformData`` at ``objectsSchemas.ts:63-78`` strips whitespace from key
# names and defaults a missing ``type`` to "string"). There the description is
# code-generated into a zod schema file; here it compiles directly to
# (FieldSpec metadata + Spark StructType) — no codegen, queryable immediately.

#: type name -> Spark type for scalar key types. ``object``/``record``/
#: ``union`` carry arbitrary JSON payloads — stored as JSON text (the engine's
#: jsonParse/toJson functions, F3/F4, are the accessors, mirroring how the
#: reference persists them as JSON strings in its KV stores).
_SCALAR_TYPES: dict[str, T.DataType] = {
    "string": T.StringType(),
    "number": T.DoubleType(),
    "boolean": T.BooleanType(),
    "date": T.TimestampType(),
    "object": T.StringType(),
    "record": T.StringType(),
    "union": T.StringType(),
}

#: modifiers with engine semantics; everything else in the reference's
#: modifier list (display, label, hint, color, textArea, picker, …) is
#: UI-only (``objectsSchemas.ts:22-48``) and accepted-but-ignored here.
_SEMANTIC_MODIFIERS = frozenset({
    "id", "search", "filter", "indexed", "groupIndex", "linkTo",
    "secret", "hidden", "optional", "static", "generate",
})


def _strip_ws(s: str) -> str:
    # objectsAPI.ts put handler: name.replace(/\s/g, "")
    return re.sub(r"\s", "", s)


def spark_type_for(key_type: str, params: list[str] | None = None) -> T.DataType:
    """Map a reference key type (+params) to a Spark DataType.

    ``array`` takes its element type from params[0] (default string);
    ``number`` with an ``int`` param becomes LongType (exact arithmetic),
    otherwise DoubleType (JS number semantics).
    """
    params = params or []
    if key_type == "array":
        elem = params[0] if params else "string"
        return T.ArrayType(spark_type_for(elem), containsNull=True)
    if key_type == "number" and any(p in ("int", "integer", "bigint") for p in params):
        return T.LongType()
    try:
        return _SCALAR_TYPES[key_type]
    except KeyError:
        raise ValueError(
            f"unknown key type {key_type!r}; legal types: "
            f"{sorted(_SCALAR_TYPES) + ['array']}") from None


def model_from_json_description(spec: str | dict[str, Any]) -> Model:
    """Compile a reference-style object description into a Model + schema.

    Accepts the JSON document the reference's objects API accepts
    (``objectsAPI.ts:133-193``): ``name``/``id`` (whitespace stripped), and
    ``keys`` mapping field name -> ``{type, params?, modifiers?}``. A key
    with no ``type`` defaults to string (``transformData``,
    ``objectsSchemas.ts:63-78``); unknown types raise. Semantic modifiers
    (id/search/filter/indexed/groupIndex/linkTo/secret/hidden/optional)
    become FieldSpec metadata; UI-only modifiers are ignored.
    """
    if isinstance(spec, str):
        spec = json.loads(spec)
    if "name" not in spec:
        raise ValueError("object description requires a 'name'")
    name = _strip_ws(str(spec["name"]))
    keys: dict[str, Any] = spec.get("keys") or {}

    fields: dict[str, FieldSpec] = {}
    struct_fields: list[T.StructField] = []
    key_specs: dict[str, dict] = {}
    for raw_key, kspec in keys.items():
        kname = _strip_ws(raw_key)
        if kname in fields:
            # two raw keys stripping to one name would dedupe in the
            # fields dict but append TWO StructFields to the schema —
            # ambiguous-column failures far from the bad description
            raise ValueError(
                f"key {raw_key!r} collides with an earlier key after "
                f"whitespace stripping (both become {kname!r})")
        kspec = {"type": "string", **(kspec or {})}
        mods: dict[str, list[str]] = {}
        for m in kspec.get("modifiers") or []:
            # repeated modifiers ACCUMULATE params (hidden('list') +
            # hidden('edit') hides both views — last-wins would silently
            # un-hide the earlier one)
            mods.setdefault(m["name"], []).extend(m.get("params") or [])
        dtype = spark_type_for(kspec["type"], kspec.get("params"))

        link = None
        if "linkTo" in mods:
            p = mods["linkTo"]
            if len(p) != 2:
                raise ValueError(
                    f"linkTo on {kname!r} needs [model, target_key], got {p}")
            link = (p[0], p[1])
        hidden = frozenset(mods.get("hidden") or [])
        # search(false) excludes the field from free-text search — the
        # reference keeps every field searchable UNLESS _def.search is
        # exactly false (ProtoModel.ts:205-211, BaseSchema.ts:209); secret
        # fields additionally stay unsearchable (probing a masked column
        # through search would leak its values)
        search_off = ("search" in mods and any(
            p is False or str(p).lower() == "false"
            for p in mods["search"]))
        # generate(<constant>[, force]) — the JSON description path can
        # only carry serializable params, so a constant becomes a literal
        # generator (the reference's function-valued generate exists only
        # in code-declared zod schemas, out of scope for runtime DDL)
        gen = None
        gen_force = False
        if "generate" in mods:
            gp = mods["generate"]
            if gp:
                from pyspark.sql import functions as _F
                gen = (lambda v=gp[0]: _F.lit(v))
            gen_force = len(gp) > 1 and (
                gp[1] is True or str(gp[1]).lower() == "true")
        fields[kname] = FieldSpec(
            kname,
            is_id="id" in mods,
            indexed="indexed" in mods or "id" in mods,
            searchable="secret" not in mods and not search_off,
            filterable=True,
            group_index="groupIndex" in mods,
            link_to=link,
            secret="secret" in mods,
            hidden_views=hidden,
            generate=gen,
            generate_force=gen_force,
        )
        # id columns are implicitly required; everything else is nullable
        # unless the description says otherwise (zod fields are required by
        # default but Spark reads treat all parquet columns as nullable, so
        # only the id is pinned non-null).
        struct_fields.append(
            T.StructField(kname, dtype, nullable="id" not in mods))
        key_specs[kname] = {
            "type": kspec["type"],
            **({"params": list(kspec["params"])} if kspec.get("params") else {}),
            **({"modifiers": [
                {"name": n, **({"params": p} if p else {})}
                for n, p in mods.items()]} if mods else {}),
        }

    order_by = spec.get("defaultOrderBy")
    if order_by is not None:
        order_by = _strip_ws(str(order_by))
        if order_by not in fields:
            raise ValueError(f"defaultOrderBy {order_by!r} is not a key")
    return Model(
        name=name,
        fields=fields,
        default_order_by=order_by,
        default_order_direction=spec.get("defaultOrderDirection", "asc"),
        schema=T.StructType(struct_fields),
        _key_specs=key_specs,
    )


def model_to_json_description(m: Model) -> dict[str, Any]:
    """Inverse of :func:`model_from_json_description` (lossless for models
    built from a description; metadata-derived for hand-declared models)."""
    if m._key_specs:
        keys = {k: dict(v) for k, v in m._key_specs.items()}
    else:
        keys = {}
        for f in m.fields.values():
            mods = []
            if f.is_id:
                mods.append({"name": "id"})
            if f.indexed and not f.is_id:
                mods.append({"name": "indexed"})
            if f.group_index:
                mods.append({"name": "groupIndex"})
            if f.link_to:
                mods.append({"name": "linkTo", "params": list(f.link_to)})
            if f.secret:
                mods.append({"name": "secret"})
            if f.hidden_views:
                mods.append({"name": "hidden",
                             "params": sorted(f.hidden_views)})
            if not f.searchable and not f.secret:
                # without this, a round-tripped model would free-text
                # search columns the original excluded (secret already
                # implies unsearchable on re-import)
                mods.append({"name": "search", "params": [False]})
            # NOTE: `generate` holds a Python callable — not JSON-
            # serializable, so it does not survive this metadata-derived
            # round trip (the description path's constant generators,
            # stored in _key_specs, do)
            keys[f.name] = {"type": "string",
                            **({"modifiers": mods} if mods else {})}
    out: dict[str, Any] = {"name": m.name, "keys": keys}
    if m.default_order_by is not None:
        out["defaultOrderBy"] = m.default_order_by
        out["defaultOrderDirection"] = m.default_order_direction
    return out


def model(name: str, *specs: FieldSpec, default_order_by: str | None = None,
          default_order_direction: str = "asc") -> Model:
    return Model(
        name=name,
        fields={s.name: s for s in specs},
        default_order_by=default_order_by,
        default_order_direction=default_order_direction,
    )


# ergonomic aliases: Model.from_json_description(spec) / m.to_json_description()
Model.from_json_description = staticmethod(model_from_json_description)
Model.to_json_description = model_to_json_description
