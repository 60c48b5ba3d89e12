"""Iceberg-v2-shaped metadata export for LakeTable.

The reference's whole point is CROSS-ENGINE reads of Iceberg v2 table
metadata (``ICEBERG-Interoperability-Test-Spec.md:4-14``; the field-id
schema JSON in ``opencatalog/samples/table_create_template.json``).
LakeTable's native metadata is a single JSON document; this module
re-emits it in the Iceberg v2 LAYOUT — ``vN.metadata.json`` with
field-id'd schemas, named partition specs, a snapshot list whose
entries point at per-snapshot MANIFEST LISTS, which point at MANIFESTS
carrying per-file stats — so the table is mechanically convertible to
a real Iceberg table the moment an Iceberg runtime is available
(manifests here are JSON with Avro-field names; converting them to the
spec's Avro encoding is a serialization change, not a model change).

``read_via_iceberg_metadata`` walks the exported chain exactly the way
an external Iceberg reader would (metadata → current snapshot →
manifest list → manifests → data files) and never touches LakeTable's
native metadata — the round-trip test's proof of convertibility.
"""

from __future__ import annotations

import datetime
import json
import os
import re
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

from .table import (
    _DATA_DIR,
    _HIVE_NULL,
    _META_DIR,
    _META_FILE,
    LakeTable,
    _strip_scheme,
)
from .transforms import Transform

# Spark DDL type → Iceberg primitive type name
_TYPE_MAP = {
    "bigint": "long",
    "int": "int",
    "smallint": "int",
    "tinyint": "int",
    "string": "string",
    "double": "double",
    "float": "float",
    "boolean": "boolean",
    "date": "date",
    "timestamp": "timestamptz",  # Spark TIMESTAMP = instant semantics
    "timestamp_ntz": "timestamp",
    "binary": "binary",
}


def _iceberg_type(ddl: str) -> str:
    ddl = ddl.strip().lower()
    if ddl.startswith("decimal"):
        return ddl  # decimal(p, s) spells identically
    try:
        return _TYPE_MAP[ddl]
    except KeyError:
        raise ValueError(f"no Iceberg mapping for Spark type {ddl!r}") from None


def _spark_ddl_type(iceberg: str) -> str:
    """Inverse of `_iceberg_type` — Iceberg primitive → Spark DDL."""
    if iceberg.startswith("decimal"):
        return iceberg
    return {
        "long": "bigint",
        "int": "int",
        "string": "string",
        "double": "double",
        "float": "float",
        "boolean": "boolean",
        "date": "date",
        "timestamptz": "timestamp",
        "timestamp": "timestamp_ntz",
        "binary": "binary",
    }.get(iceberg, "string")


def _iceberg_transform(t: Transform) -> str:
    """Iceberg transform spelling: bucket[N] / truncate[W] / day / ..."""
    if t.name == "bucket":
        return f"bucket[{t.param}]"
    if t.name == "truncate":
        return f"truncate[{t.param}]"
    # Iceberg uses singular day/hour/month/year
    return {"days": "day", "hours": "hour", "months": "month", "years": "year"}.get(
        t.name, t.name
    )


def to_iceberg_metadata(table: LakeTable) -> str:
    """Emit the Iceberg v2 metadata chain for the table's full history
    under ``<table>/_meta/iceberg/``; return the metadata.json path."""
    meta = table._meta
    out_dir = os.path.join(table.path, "_meta", "iceberg")
    os.makedirs(out_dir, exist_ok=True)

    schemas = []
    last_column_id = 0
    ident_ids = meta.get("identifier-field-ids") or []
    for ver, fields in sorted(meta["schemas"].items(), key=lambda kv: int(kv[0])):
        schemas.append(
            {
                "type": "struct",
                "schema-id": int(ver),
                # Iceberg spec: identifier-field-ids live on the schema
                # struct; ids only (names rebind per version)
                **({"identifier-field-ids": [
                        i for i in ident_ids
                        if any(f["id"] == i for f in fields)
                    ]} if ident_ids else {}),
                "fields": [
                    {
                        "id": f["id"],
                        "name": f["name"],
                        "required": False,
                        "type": _iceberg_type(f["type"]),
                        **(
                            {"initial-default": f["default"]}
                            if f.get("default") is not None
                            else {}
                        ),
                    }
                    for f in fields
                ],
            }
        )
        if fields:
            last_column_id = max(last_column_id, *(f["id"] for f in fields))

    # Renames keep field ids, but a partition spec / sort order created
    # before a rename still names the column by its old spelling —
    # resolve through EVERY schema version (current spelling wins) so
    # source-ids survive renames.
    field_ids_by_name: dict[str, int] = {}
    for _ver, fields in sorted(meta["schemas"].items(), key=lambda kv: int(kv[0])):
        for f in fields:
            field_ids_by_name.setdefault(f["name"], f["id"])
    field_ids_by_name.update(
        {f["name"]: f["id"] for f in meta["schemas"][str(meta["current_schema_version"])]}
    )
    # Partition field-ids are TABLE-WIDE in Iceberg: assigned once per
    # (source column, transform), starting at 1000, never reused, and
    # stable across spec evolution — a reader unions manifest partition
    # structs by field-id, so a positional scheme (1000+index-in-spec,
    # the pre-round-5 behavior flagged in ADVICE r4) would conflate
    # different fields that happen to share a position in different
    # specs. `_pf_ids` is the global allocator; `_spec_fields` only
    # looks up / extends it in first-use order.
    _pf_ids: dict[tuple[str, str], int] = {}

    def _pf_id(t: Transform) -> int:
        key = (t.column, _iceberg_transform(t))
        if key not in _pf_ids:
            _pf_ids[key] = 1000 + len(_pf_ids)
        return _pf_ids[key]

    def _spec_fields(spec_json: list) -> list:
        out = []
        for tj in spec_json:
            t = Transform.from_json(tj)
            out.append(
                {
                    "field-id": _pf_id(t),
                    "source-id": field_ids_by_name.get(t.column, -1),
                    "name": f"{t.column}_{t.name}",
                    "transform": _iceberg_transform(t),
                }
            )
        return out

    # Full spec history (Iceberg keeps every spec ever used — files in
    # a multi-generation table reference theirs by id). Dedupe the
    # recorded history + current spec in first-seen order; the current
    # spec's position is the default-spec-id.
    all_specs = list(meta.get("partition_spec_history") or []) + [
        meta["partition_spec"]
    ]
    spec_list: list[list] = []
    spec_keys: list[str] = []
    for sp in all_specs:
        key = json.dumps(sp, sort_keys=True)
        if key not in spec_keys:
            spec_keys.append(key)
            spec_list.append(sp)
    default_spec_id = spec_keys.index(
        json.dumps(meta["partition_spec"], sort_keys=True)
    )
    # Walk the spec history OLDEST-FIRST so field-ids reflect first
    # use (spec 0's fields get the lowest ids), then the current spec.
    for sp in spec_list:
        _spec_fields(sp)
    # per-file spec resolution: a file's hive partition keys
    # (_p_<transform>_<column>) identify which spec wrote it; prefer
    # the LATEST spec whose key-set matches (a re-added identical
    # field should resolve to the newest id)
    keyset_by_spec = [
        frozenset(
            f"_p_{Transform.from_json(tj).name}_{Transform.from_json(tj).column}"
            for tj in sp
        )
        for sp in spec_list
    ]
    _PARAM_FREE = {"identity", "days", "hours", "months", "years", "day",
                   "hour", "month", "year"}

    def _file_spec_id(file_entry: dict) -> int:
        fkeys = frozenset(file_entry.get("partition", {}).keys())
        for sid in range(len(spec_list) - 1, -1, -1):
            if keyset_by_spec[sid] == fkeys:
                return sid
        # No recorded spec matches (possible only for tables whose
        # evolution predates spec-history recording). Silently stamping
        # default_spec_id would misattribute the file's partition
        # struct (ADVICE r4): synthesize a spec from the file's own
        # keys when every transform is parameter-free (the key name
        # `_p_<transform>_<column>` loses bucket/truncate params),
        # else fail loudly.
        synthesized = []
        for k in sorted(fkeys):
            name, _, column = k.removeprefix("_p_").partition("_")
            if name not in _PARAM_FREE or not column:
                raise ValueError(
                    f"data file {file_entry.get('path')!r} carries partition "
                    f"keys {sorted(fkeys)} matching no recorded partition "
                    "spec and not synthesizable (parameterized transform); "
                    "cannot attribute a partition-spec-id"
                )
            synthesized.append(Transform(name, column).to_json())
        spec_list.append(synthesized)
        spec_keys.append(json.dumps(synthesized, sort_keys=True))
        keyset_by_spec.append(fkeys)
        _spec_fields(synthesized)
        return len(spec_list) - 1

    snapshots = []
    for s in meta["snapshots"]:
        # one data manifest PER PARTITION SPEC (Iceberg's invariant: a
        # manifest carries exactly one partition-spec-id; a snapshot
        # spanning an evolution gets one manifest per generation)
        entries_by_spec: dict[int, list] = {}
        for f in s["files"]:
            entry = {
                "status": 1,  # ADDED/EXISTING in this snapshot's scope
                "snapshot-id": s["snapshot_id"],
                "data-file": {
                    "content": 0,  # DATA (delete files ride in their own manifest)
                    "file-path": os.path.join(table.path, f["path"]),
                    "file-format": "PARQUET",
                    "partition": f.get("partition", {}),
                    "data-sequence-number": f.get("seq", 0),
                    "record-count": f["rows"],
                    "file-size-in-bytes": f["bytes"],
                    "lower-bounds": {k: v[0] for k, v in f.get("stats", {}).items()},
                    "upper-bounds": {k: v[1] for k, v in f.get("stats", {}).items()},
                    # Spec extension: real Iceberg resolves columns via
                    # field-ids embedded in parquet footers; Spark-written
                    # parquet lacks them, so the writing schema rides in
                    # the manifest instead (a converter would re-resolve
                    # names→ids from this schema when writing Avro).
                    "schema-id": f["schema_version"],
                },
            }
            entries_by_spec.setdefault(_file_spec_id(f), []).append(entry)
        manifests = []
        for spec_id, entries in sorted(entries_by_spec.items()):
            suffix = f"-spec{spec_id}" if len(entries_by_spec) > 1 else ""
            manifest_path = os.path.join(
                out_dir, f"manifest-{s['snapshot_id']}{suffix}.json"
            )
            with open(manifest_path, "w") as fh:
                json.dump(
                    {"partition-spec-id": spec_id, "entries": entries}, fh
                )
            manifests.append(
                {
                    "manifest-path": manifest_path,
                    "manifest-length": os.path.getsize(manifest_path),
                    "content": 0,
                    "partition-spec-id": spec_id,
                    "added-snapshot-id": s["snapshot_id"],
                    "added-files-count": len(entries),
                    "added-rows-count": sum(
                        e["data-file"]["record-count"] for e in entries
                    ),
                }
            )
        # Iceberg v2 merge-on-read: position-delete files live in their
        # own manifest with content=1; readers anti-join (file, pos).
        if s.get("delete_files"):
            del_manifest_path = os.path.join(
                out_dir, f"delete-manifest-{s['snapshot_id']}.json"
            )
            del_entries = [
                {
                    "status": 1,
                    "snapshot-id": s["snapshot_id"],
                    "data-file": {
                        # 1 = POSITION_DELETES, 2 = EQUALITY_DELETES
                        "content": 1 if d.get("content", "position") == "position" else 2,
                        "file-path": os.path.join(table.path, d["path"]),
                        "file-format": "PARQUET",
                        "record-count": d["rows"],
                        "file-size-in-bytes": d["bytes"],
                        "data-sequence-number": d.get("seq", 0),
                        "referenced-data-files": [
                            os.path.join(table.path, p)
                            for p in d.get("referenced", [])
                        ],
                        # Iceberg stores equality field IDS; ids come
                        # from equality_cols (CURRENT names — rename
                        # rewrites them in table metadata, so they
                        # resolve reliably). The names carried
                        # alongside are the PHYSICAL parquet column
                        # names of the delete file (file_cols, frozen
                        # at write time) — readers rebind them to
                        # target names via the ids.
                        "equality-ids": [
                            field_ids_by_name.get(c, -1)
                            for c in d.get("equality_cols", [])
                        ],
                        "equality-field-names": (
                            d.get("file_cols") or d.get("equality_cols", [])
                        ),
                    },
                }
                for d in s["delete_files"]
            ]
            with open(del_manifest_path, "w") as fh:
                json.dump({"entries": del_entries}, fh)
            manifests.append(
                {
                    "manifest-path": del_manifest_path,
                    "manifest-length": os.path.getsize(del_manifest_path),
                    "content": 1,
                    "added-snapshot-id": s["snapshot_id"],
                    "added-files-count": len(del_entries),
                    "added-rows-count": sum(d["rows"] for d in s["delete_files"]),
                }
            )
        mlist_path = os.path.join(out_dir, f"snap-{s['snapshot_id']}-manifest-list.json")
        with open(mlist_path, "w") as fh:
            json.dump({"manifests": manifests}, fh)
        snapshots.append(
            {
                "snapshot-id": s["snapshot_id"],
                **(
                    {"parent-snapshot-id": s["parent_id"]}
                    if s.get("parent_id") is not None
                    else {}
                ),
                "sequence-number": s["snapshot_id"],
                "timestamp-ms": s["timestamp_ms"],
                "manifest-list": mlist_path,
                "schema-id": s["schema_version"],
                "summary": {"operation": s["operation"], **{
                    k: str(v) for k, v in (s.get("summary") or {}).items()
                }},
            }
        )

    metadata = {
        "format-version": 2,
        "table-uuid": str(uuid.uuid5(uuid.NAMESPACE_URL, table.path)),
        "location": table.path,
        "last-sequence-number": meta.get("current_snapshot_id") or 0,
        "last-updated-ms": int(time.time() * 1000),
        "last-column-id": last_column_id,
        "current-schema-id": meta["current_schema_version"],
        "schemas": schemas,
        "default-spec-id": default_spec_id,
        "partition-specs": [
            {"spec-id": i, "fields": _spec_fields(sp)}
            for i, sp in enumerate(spec_list)
        ],
        # max field-id EVER assigned by the table-wide allocator (999
        # for a never-partitioned table, matching Iceberg's sentinel)
        "last-partition-id": max(_pf_ids.values(), default=999),
        "default-sort-order-id": 0,
        "sort-orders": [
            {
                "order-id": 0,
                "fields": [
                    {
                        "transform": "identity",
                        "source-id": field_ids_by_name.get(c, -1),
                        "direction": "asc",
                        "null-order": "nulls-first",
                    }
                    for c in (meta.get("sort_order") or [])
                ],
            }
        ],
        "properties": meta.get("properties", {}),
        "current-snapshot-id": meta.get("current_snapshot_id"),
        "snapshots": snapshots,
        "snapshot-log": [
            {"snapshot-id": s["snapshot-id"], "timestamp-ms": s["timestamp-ms"]}
            for s in snapshots
        ],
        "metadata-log": [],
        "refs": {
            # retention keys use Iceberg's metadata.json spellings
            # (max-ref-age-ms / min-snapshots-to-keep)
            **{
                name: {"snapshot-id": sid, "type": "tag",
                       **((meta.get("ref_retention") or {}).get(name) or {})}
                for name, sid in (meta.get("refs") or {}).items()
            },
            **{
                name: {"snapshot-id": sid, "type": "branch",
                       **((meta.get("ref_retention") or {}).get(name) or {})}
                for name, sid in (meta.get("branches") or {}).items()
                if sid is not None
            },
        },
    }
    n = meta.get("current_snapshot_id") or 0
    metadata_path = os.path.join(out_dir, f"v{n}.metadata.json")
    with open(metadata_path, "w") as fh:
        json.dump(metadata, fh, indent=1)
    return metadata_path


_ICEBERG_TO_NATIVE_TRANSFORM = {
    "identity": "identity",
    "day": "days",
    "hour": "hours",
    "month": "months",
    "year": "years",
}


def _native_spec_json(
    spec_fields: list, names_by_id: dict[int, str], strict: bool = True
) -> list:
    """Iceberg partition-spec fields → native Transform JSON list.

    ``strict=False`` (historical, non-default specs): a field sourced
    from a column no schema generation still records is SKIPPED rather
    than blocking the whole adoption — that spec is only history; no
    live write will ever use it."""
    out = []
    for f in spec_fields:
        col = names_by_id.get(f["source-id"])
        if col is None:
            if not strict:
                continue
            raise ValueError(
                f"partition spec field {f.get('name')!r} references "
                f"unknown source-id {f.get('source-id')}"
            )
        tr = f["transform"]
        m = re.match(r"^(bucket|truncate)\[(\d+)\]$", tr)
        if m:
            out.append(Transform(m.group(1), col, int(m.group(2))).to_json())
        elif tr in _ICEBERG_TO_NATIVE_TRANSFORM:
            out.append(Transform(_ICEBERG_TO_NATIVE_TRANSFORM[tr], col).to_json())
        else:
            raise ValueError(f"unsupported Iceberg transform {tr!r}")
    return out


def _adopt_partition(part: dict, spec_fields_by_name: dict,
                     names_by_id: dict[int, str]) -> dict:
    """Foreign manifest partition struct → native ``_p_*`` hive keys.

    Only conversions whose VALUE SPELLING provably matches the native
    write path are emitted: identity (``CAST(v AS STRING)``) and day
    (epoch-days int or ISO string → ISO date). Iceberg's bucket hash
    is murmur3 while the native one is xxhash64, and Iceberg truncates
    integers numerically while the native transform truncates the
    string rendering — emitting those values would let
    ``_prune_files`` compare incompatible hash/truncation spaces and
    WRONGLY prune, so they are dropped instead: a missing partition
    key means "never prune this file" (the same conservative
    degradation streamed files use). Keys already in the native
    ``_p_*`` dialect (this repo's own export) pass through whole.
    """
    out: dict[str, str] = {}
    for k, v in part.items():
        if k.startswith("_p_"):
            out[k] = v
            continue
        f = spec_fields_by_name.get(k)
        col = names_by_id.get(f["source-id"]) if f else None
        if f is None or col is None:
            continue
        tr = f["transform"]
        if v is None:
            # null transform source → the native null sentinel (NOT
            # the string "None", which could wrongly equality-prune)
            if tr in ("identity", "day"):
                out[f"_p_{_ICEBERG_TO_NATIVE_TRANSFORM[tr]}_{col}"] = _HIVE_NULL
        elif tr == "identity":
            out[f"_p_identity_{col}"] = str(v)
        elif tr == "day":
            if isinstance(v, int) and not isinstance(v, bool):
                v = (datetime.date(1970, 1, 1)
                     + datetime.timedelta(days=v)).isoformat()
            out[f"_p_days_{col}"] = str(v)[:10]
        # bucket/truncate/hour/month/year: incompatible value encodings
        # — omit the key (file is simply never pruned on it)
    return out


def _resolve_metadata_path(path: str) -> str:
    """Accept a metadata.json file OR a table directory. Directories
    resolve the HadoopCatalog way: ``metadata/version-hint.text``
    names the current version N → ``vN.metadata.json``; without a
    hint, the highest ``vN.metadata.json`` under ``metadata/`` (or
    the directory itself) wins."""
    if os.path.isfile(path):
        return path
    meta_dir = path
    for cand in (os.path.join(path, "metadata"), path):
        if os.path.isdir(cand):
            meta_dir = cand
            hint = os.path.join(cand, "version-hint.text")
            if os.path.isfile(hint):
                with open(hint) as fh:
                    n = fh.read().strip()
                vf = os.path.join(cand, f"v{n}.metadata.json")
                if os.path.isfile(vf):
                    return vf
            break
    versions = []
    for fn in os.listdir(meta_dir):
        m = re.match(r"^v(\d+)\.metadata\.json$", fn)
        if m:
            versions.append((int(m.group(1)), fn))
    if not versions:
        raise FileNotFoundError(
            f"no vN.metadata.json found under {meta_dir!r}")
    return os.path.join(meta_dir, max(versions)[1])


def _footer_schema_id(path: str, schemas: list, default_id: int) -> int:
    """Last-resort writing-schema attribution: when a data file's
    adding snapshot was EXPIRED out of the chain (its manifest entry
    survives with an unknown snapshot-id), pick the schema generation
    whose field names match the parquet footer — newest exact match
    first, newest superset as fallback (a reader projects a subset
    fine). Loud when nothing matches: silently defaulting would
    misbind columns after a rename."""
    import pyarrow.parquet as pq

    names = set(pq.ParquetFile(path).schema_arrow.names)
    by_newest = sorted(schemas, key=lambda s: -s["schema-id"])
    for s in by_newest:
        if {f["name"] for f in s["fields"]} == names:
            return s["schema-id"]
    for s in by_newest:
        if names <= {f["name"] for f in s["fields"]}:
            return s["schema-id"]
    raise ValueError(
        f"data file {path!r} matches no schema generation by footer "
        f"column names {sorted(names)}; cannot attribute a writing schema"
    )


def _parse_iceberg_v2(metadata_path: str) -> dict:
    """Walk an Iceberg v2 metadata chain (metadata.json → manifest
    lists → manifests) into LakeTable's native metadata document —
    the shared engine of :func:`adopt_iceberg_metadata` (first
    registration) and :func:`sync_iceberg_metadata` (pulling foreign
    advances after registration).

    Register an EXTERNALLY-WRITTEN Iceberg v2 table as a live
    LakeTable — the import direction of the reference's cross-engine
    interop loop (``ICEBERG-Interoperability-Test-Spec.md:4-14``: one
    engine reads what another wrote), inverting
    :func:`to_iceberg_metadata`'s walk.

    Zero-copy: the adopted snapshots' manifests point at the foreign
    data/delete files IN PLACE (absolute paths, the
    ``migrate_parquet``/``snapshot_of`` idiom), so adopting a 100 TB
    table costs one metadata pass — no byte is rewritten, and
    ``remove_orphan_files`` sweeps only the new table's own directory.

    What carries over, by field id:

    - the FULL schema history (renames/widenings/initial-defaults keep
      working — files read through their written schema generation);
    - every partition spec (default spec becomes the live write spec;
      prior specs land in ``partition_spec_history``);
    - all snapshots with parent lineage, operations, summaries and
      data-sequence numbers (time travel + incremental reads work);
    - position AND equality delete files (merge-on-read reads apply
      them with the strictly-smaller-sequence rule);
    - refs (tags/branches) with their declared retention, sort order,
      identifier fields, and table properties.

    Continued DML is immediate: new commits take ``max(snapshot
    id)+1``, so foreign equality deletes can never reach rows written
    after adoption, and new files cluster under the adopted default
    spec. Manifests are this repo's JSON dialect of the v2 layout
    (decoding spec Avro is a serialization change, per the module
    docstring); bounds keyed by field id are rebound to the writing
    schema's names.
    """
    with open(metadata_path) as fh:
        md = json.load(fh)
    if md.get("format-version") != 2:
        raise ValueError(
            f"can only adopt Iceberg format-version 2 metadata, got "
            f"{md.get('format-version')!r}"
        )

    # --- schemas, by field id ---
    schemas: dict[str, list] = {}
    last_column_id = 0
    for s in md["schemas"]:
        schemas[str(s["schema-id"])] = [
            {
                "id": f["id"],
                "name": f["name"],
                "type": _spark_ddl_type(f["type"]),
                "default": f.get("initial-default"),
            }
            for f in s["fields"]
        ]
        last_column_id = max(
            last_column_id, *(f["id"] for f in s["fields"]), 0
        )
    cur_schema_id = md["current-schema-id"]
    current = next(s for s in md["schemas"] if s["schema-id"] == cur_schema_id)
    names_by_id = {f["id"]: f["name"] for f in current["fields"]}
    schema_names_by_id = {
        s["schema-id"]: {f["id"]: f["name"] for f in s["fields"]}
        for s in md["schemas"]
    }
    # historical specs may source since-dropped columns: resolve ids
    # against the UNION of all schema generations (current names win)
    union_names_by_id: dict[int, str] = {}
    for s in sorted(md["schemas"], key=lambda s: s["schema-id"]):
        for f in s["fields"]:
            union_names_by_id[f["id"]] = f["name"]
    union_names_by_id.update(names_by_id)

    # --- partition specs (default live, rest history) ---
    spec_jsons = md.get("partition-specs") or []
    default_spec_id = md.get("default-spec-id", 0)
    native_specs: dict[int, list] = {}
    spec_fields_by_id: dict[int, dict] = {}
    for sp in spec_jsons:
        native_specs[sp["spec-id"]] = _native_spec_json(
            sp["fields"], union_names_by_id,
            strict=sp["spec-id"] == default_spec_id,
        )
        spec_fields_by_id[sp["spec-id"]] = {
            f["name"]: f for f in sp["fields"]
        }
    partition_spec = native_specs.get(default_spec_id, [])
    spec_history = [
        native_specs[i] for i in sorted(native_specs) if i != default_spec_id
    ]

    # --- sort order ---
    sort_order = []
    order_id = md.get("default-sort-order-id", 0)
    for so in md.get("sort-orders") or []:
        if so.get("order-id") == order_id:
            sort_order = [
                names_by_id[f["source-id"]]
                for f in so.get("fields", [])
                if f.get("source-id") in names_by_id
            ]

    # --- snapshots: walk each manifest list ---
    snap_schema = {
        s["snapshot-id"]: s.get("schema-id", cur_schema_id)
        for s in md["snapshots"]
    }

    def _rebind_bounds(bounds: dict, schema_id: int) -> dict:
        by_id = schema_names_by_id.get(schema_id, {})
        out = {}
        for k, v in (bounds or {}).items():
            name = by_id.get(int(k)) if str(k).isdigit() else k
            if name is not None:
                out[name] = v
        return out

    native_snapshots = []
    order_key = lambda s: (s.get("sequence-number", 0), s["snapshot-id"])  # noqa: E731
    for s in sorted(md["snapshots"], key=order_key):
        # Iceberg sequence inheritance: an entry with no explicit
        # data-sequence-number takes its snapshot's sequence number
        # (defaulting to 0 would make the file strictly older than
        # every equality delete — wrongly retracting its rows)
        snap_seq = s.get("sequence-number", 0)
        with open(_strip_scheme(s["manifest-list"])) as fh:
            mlist = json.load(fh)
        files: list[dict] = []
        dels: list[dict] = []
        for m in mlist["manifests"]:
            spec_id = m.get("partition-spec-id", default_spec_id)
            with open(_strip_scheme(m["manifest-path"])) as fh:
                manifest = json.load(fh)
            for e in manifest["entries"]:
                if e.get("status") == 2:  # DELETED — not live
                    continue
                d = e["data-file"]
                added_in = e.get("snapshot-id", s["snapshot-id"])
                schema_id = d.get("schema-id", snap_schema.get(added_in))
                if d.get("content", 0) == 0:
                    if schema_id is None:
                        # adding snapshot expired out of the chain —
                        # attribute the writing schema by footer probe
                        schema_id = _footer_schema_id(
                            _strip_scheme(d["file-path"]),
                            md["schemas"], cur_schema_id)
                    lows = _rebind_bounds(d.get("lower-bounds"), schema_id)
                    highs = _rebind_bounds(d.get("upper-bounds"), schema_id)
                    files.append({
                        "path": _strip_scheme(d["file-path"]),
                        "rows": d["record-count"],
                        "bytes": d["file-size-in-bytes"],
                        "schema_version": schema_id,
                        "stats": {c: [lo, highs.get(c)]
                                  for c, lo in lows.items()},
                        "partition": _adopt_partition(
                            d.get("partition") or {},
                            spec_fields_by_id.get(spec_id, {}),
                            names_by_id,
                        ),
                        "seq": d.get("data-sequence-number", snap_seq),
                    })
                else:
                    if schema_id is None:
                        schema_id = cur_schema_id
                    eq_ids = d.get("equality-ids") or []
                    eq_cols = [names_by_id[i] for i in eq_ids
                               if i in names_by_id]
                    if len(eq_cols) != len(eq_ids):
                        raise ValueError(
                            f"equality-delete file {d['file-path']!r} keys "
                            f"fields {eq_ids} not all present in the "
                            "current schema; cannot adopt"
                        )
                    # physical parquet column names inside the delete
                    # file = the names current when it was WRITTEN
                    # (the adding snapshot's schema) — real chains
                    # carry only equality-ids, and binding the current
                    # names would break after a post-delete rename
                    write_names = schema_names_by_id.get(schema_id, {})
                    file_cols = (d.get("equality-field-names")
                                 or [write_names.get(i) for i in eq_ids])
                    if any(c is None for c in file_cols):
                        raise ValueError(
                            f"equality-delete file {d['file-path']!r}: "
                            f"fields {eq_ids} unresolved in writing "
                            f"schema {schema_id}; cannot adopt"
                        )
                    dels.append({
                        "path": _strip_scheme(d["file-path"]),
                        "rows": d["record-count"],
                        "bytes": d["file-size-in-bytes"],
                        "referenced": [
                            _strip_scheme(p)
                            for p in d.get("referenced-data-files", [])
                        ],
                        "content": ("position" if d.get("content") == 1
                                    else "equality"),
                        "equality_cols": eq_cols,
                        "seq": d.get("data-sequence-number", snap_seq),
                        **({"file_cols": file_cols}
                           if d.get("content") == 2 else {}),
                    })
        # a position delete with no recorded referenced-data-files
        # applies to any file — reference every live data file (broad
        # but correct: the anti-join simply scans more)
        all_paths = [f["path"] for f in files]
        for dd in dels:
            if dd["content"] == "position" and not dd["referenced"]:
                dd["referenced"] = list(all_paths)
        native_snapshots.append({
            "snapshot_id": s["snapshot-id"],
            "parent_id": s.get("parent-snapshot-id"),
            "timestamp_ms": s["timestamp-ms"],
            "operation": (s.get("summary") or {}).get("operation", "append"),
            "schema_version": snap_schema.get(s["snapshot-id"], cur_schema_id),
            "files": files,
            "summary": {k: v for k, v in (s.get("summary") or {}).items()
                        if k != "operation"},
            **({"delete_files": dels} if dels else {}),
        })

    # --- refs ---
    tags, branches, retention = {}, {}, {}
    for name, r in (md.get("refs") or {}).items():
        keep = {k: r[k] for k in ("max-ref-age-ms", "min-snapshots-to-keep")
                if r.get(k) is not None}
        if keep:
            retention[name] = keep
        if r.get("type") == "branch" or name == "main":
            if name != "main":  # main IS current-snapshot-id
                branches[name] = r["snapshot-id"]
        else:
            tags[name] = r["snapshot-id"]

    ident_ids = current.get("identifier-field-ids") or []
    meta = {
        "format_version": 2,
        # honor the chain's authoritative last-column-id: if the
        # foreign table dropped its highest-id columns (and pruned
        # those schema generations), allocating from the surviving max
        # would REUSE a historical field id and corrupt by-id
        # resolution against surviving bounds/delete metadata
        "next_field_id": max(last_column_id, md.get("last-column-id", 0)) + 1,
        "current_schema_version": cur_schema_id,
        "schemas": schemas,
        "partition_spec": partition_spec,
        "sort_order": sort_order,
        "properties": dict(md.get("properties") or {}),
        "current_snapshot_id": md.get("current-snapshot-id"),
        "snapshots": native_snapshots,
        **({"partition_spec_history": spec_history} if spec_history else {}),
        **({"identifier-field-ids": ident_ids} if ident_ids else {}),
        **({"refs": tags} if tags else {}),
        **({"branches": branches} if branches else {}),
        **({"ref_retention": retention} if retention else {}),
        "adopted_from": os.path.abspath(metadata_path),
    }
    return meta


def adopt_iceberg_metadata(
    spark: SparkSession, metadata_path: str, dest_path: str
) -> LakeTable:
    """First registration of a foreign Iceberg v2 table: parse the
    chain (see :func:`_parse_iceberg_v2` for the full semantics) and
    publish it as a new LakeTable at ``dest_path``."""
    dest_path = os.path.abspath(dest_path)
    if os.path.exists(os.path.join(dest_path, _META_DIR, _META_FILE)):
        raise FileExistsError(f"table already exists at {dest_path}")
    meta = _parse_iceberg_v2(_resolve_metadata_path(metadata_path))
    # sync re-resolves a DIRECTORY each time, catching new version files
    meta["adopted_from"] = os.path.abspath(metadata_path)
    os.makedirs(os.path.join(dest_path, _META_DIR), exist_ok=True)
    os.makedirs(os.path.join(dest_path, _DATA_DIR), exist_ok=True)
    t = LakeTable(spark, dest_path, meta)
    t._write_meta()
    return t


def sync_iceberg_metadata(table: LakeTable, metadata_path: str | None = None) -> int:
    """Pull FOREIGN ADVANCES into a registered (adopted) table — the
    continuous half of the interop loop: the foreign engine keeps
    committing, and each sync folds its new snapshots in at metadata
    cost (zero data copied, O(new manifest entries) parsed).

    ``metadata_path`` defaults to the chain the table was adopted
    from, so a foreign writer that rewrites ``vN.metadata.json`` in
    place (or a caller passing the newer version file) both work.

    Fast-forward-only, Iceberg's catalog-refresh semantics: if LOCAL
    commits exist that the foreign chain does not know (the table has
    diverged — it is now an independent fork), sync refuses loudly
    instead of merging histories. Schemas, specs, refs, retention,
    properties and heads all move to the foreign chain's current
    state under the commit lock. Returns the number of new snapshots
    folded in."""
    explicit = metadata_path is not None
    metadata_path = metadata_path or table._meta.get("adopted_from")
    if not metadata_path:
        raise ValueError(
            "table was not adopted from an Iceberg chain and no "
            "metadata_path was given"
        )
    fresh = _parse_iceberg_v2(_resolve_metadata_path(metadata_path))
    # An explicit vN.metadata.json override is a one-shot pull: keep
    # following the ORIGINAL adoption source afterwards — overwriting
    # it would permanently pin a directory-adopted table to that one
    # version file and future default syncs would stop seeing newer
    # versions
    orig = table._meta.get("adopted_from")
    if explicit and orig and not os.path.isdir(metadata_path):
        fresh["adopted_from"] = orig
    else:
        fresh["adopted_from"] = os.path.abspath(metadata_path)
    # identity = (id, commit timestamp): a LOCAL commit takes
    # max(id)+1, which can collide with the foreign writer's next id —
    # an id-only check would mistake the fork for a known snapshot
    foreign_keys = {(s["snapshot_id"], s["timestamp_ms"])
                    for s in fresh["snapshots"]}
    pulled = {"n": 0}

    def mutate() -> None:
        local_keys = {(s["snapshot_id"], s["timestamp_ms"])
                      for s in table._meta["snapshots"]}
        diverged = local_keys - foreign_keys
        if diverged:
            raise ValueError(
                f"local table has {len(diverged)} snapshot(s) the foreign "
                f"chain does not know (e.g. snapshot "
                f"{sorted(diverged)[0][0]}) — either local commits forked "
                "the history, or the foreign writer expired those "
                "snapshots; cannot fast-forward (re-adopt to a fresh "
                "table if the foreign chain is the one to follow)"
            )
        pulled["n"] = len(foreign_keys - local_keys)
        table._meta.clear()
        table._meta.update(fresh)

    table._locked_meta_mutation(mutate)
    return pulled["n"]


def read_via_iceberg_metadata(
    spark: SparkSession, metadata_path: str, snapshot_id: int | None = None
) -> DataFrame:
    """Read a table THROUGH its exported Iceberg metadata chain only —
    metadata.json → snapshot → manifest list → manifests → data files —
    with field-id projection to the snapshot's schema, exactly the walk
    an external Iceberg reader performs. Never consults LakeTable
    metadata (that's the point)."""
    from pyspark.sql import functions as F

    with open(metadata_path) as fh:
        md = json.load(fh)
    sid = snapshot_id if snapshot_id is not None else md["current-snapshot-id"]
    snap = next(s for s in md["snapshots"] if s["snapshot-id"] == sid)
    with open(snap["manifest-list"]) as fh:
        mlist = json.load(fh)
    by_schema: dict[int, list[tuple[str, int]]] = {}
    delete_paths: list[str] = []
    eq_deletes: list[dict] = []
    referenced: set[str] = set()
    for m in mlist["manifests"]:
        with open(m["manifest-path"]) as fh:
            manifest = json.load(fh)
        for e in manifest["entries"]:
            df_entry = e["data-file"]
            if df_entry.get("content") == 1:  # position deletes
                delete_paths.append(_strip_scheme(df_entry["file-path"]))
                referenced.update(
                    _strip_scheme(p) for p in df_entry.get("referenced-data-files", [])
                )
                continue
            if df_entry.get("content") == 2:  # equality deletes
                eq_deletes.append(df_entry)
                continue
            by_schema.setdefault(df_entry["schema-id"], []).append(
                (_strip_scheme(df_entry["file-path"]),
                 df_entry.get("data-sequence-number", 0))
            )
    target = next(s for s in md["schemas"] if s["schema-id"] == snap["schema-id"])
    if not by_schema:
        ddl = ", ".join(
            f"{f['name']} {_spark_ddl_type(f['type'])}" for f in target["fields"]
        )
        return spark.createDataFrame([], ddl)
    # Iceberg resolves columns by FIELD ID: for each file generation,
    # map the target schema's ids onto that generation's names (renames
    # and widenings never rewrote the files), defaulting added columns.
    mor = bool(delete_paths or eq_deletes)
    parts = []
    for schema_id, files in sorted(by_schema.items()):
        written = next(s for s in md["schemas"] if s["schema-id"] == schema_id)
        names_by_id = {f["id"]: f["name"] for f in written["fields"]}
        raw = spark.read.parquet(*[f for f, _seq in files])
        sel = []
        for f in target["fields"]:
            old_name = names_by_id.get(f["id"])
            if old_name is not None:
                sel.append(F.col(old_name).alias(f["name"]))
            else:
                sel.append(F.lit(f.get("initial-default")).alias(f["name"]))
        if mor:
            sel.append(F.col("_metadata.file_path").alias("_ice_file"))
            sel.append(F.col("_metadata.row_index").alias("_ice_pos"))
        parts.append(raw.select(*sel))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    if delete_paths:
        # merge-on-read, content=1: (file_path, pos) tombstones applied
        # as a broadcast anti-join; the delete parquet may spell paths
        # as URIs (file:///...) — normalize both sides
        tomb = spark.read.parquet(*delete_paths).select(
            F.regexp_replace("file_path", "^file:/+", "/").alias("file_path"),
            "pos",
        )
        stripped = F.regexp_replace(F.col("_ice_file"), "^file:/+", "/")
        out = out.join(
            F.broadcast(tomb),
            (stripped == tomb["file_path"]) & (out["_ice_pos"] == tomb["pos"]),
            "left_anti",
        )
    if eq_deletes:
        # merge-on-read, content=2: key tombstones apply to data files
        # with a STRICTLY smaller data sequence number
        seq_rows = [
            (f, seq) for files in by_schema.values() for f, seq in files
        ]
        seq_map = spark.createDataFrame(seq_rows, "_seq_path string, _file_seq long")
        stripped = F.regexp_replace(F.col("_ice_file"), "^file:/+", "/")
        out = out.join(
            F.broadcast(seq_map), stripped == seq_map["_seq_path"], "left"
        ).drop("_seq_path")
        target_by_id = {f["id"]: f["name"] for f in target["fields"]}
        for d in eq_deletes:
            # the delete parquet's columns carry WRITE-time names; the
            # out relation carries TARGET names — rebind via field ids
            # so a key-column rename after the delete write still
            # matches (Iceberg semantics: equality-ids, not names)
            pairs = _eq_key_pairs(d, target_by_id)
            tomb = spark.read.parquet(_strip_scheme(d["file-path"])).select(
                *[F.col(w).alias(f"_del_{w}") for w, _t in pairs]
            )
            cond = F.col("_file_seq") < F.lit(d.get("data-sequence-number", 0))
            for w, tname in pairs:
                cond = cond & out[tname].eqNullSafe(tomb[f"_del_{w}"])
            out = out.join(F.broadcast(tomb), cond, "left_anti")
        out = out.drop("_file_seq")
    if mor:
        out = out.drop("_ice_file", "_ice_pos")
    return out


# DuckDB type spelling per Iceberg primitive — the second engine's half
# of the cross-engine contract (reference: cross-engine readback,
# ICEBERG-Interoperability-Test-Spec.md:10-14).
_DUCK_TYPE = {
    "long": "BIGINT",
    "int": "INTEGER",
    "string": "VARCHAR",
    "double": "DOUBLE",
    "float": "REAL",
    "boolean": "BOOLEAN",
    "date": "DATE",
    # instant semantics must survive the cast: DuckDB reads Spark's
    # UTC-adjusted parquet timestamps as TIMESTAMPTZ, and CAST(... AS
    # TIMESTAMP) would re-render through the session TimeZone (value
    # shift on non-UTC hosts)
    "timestamptz": "TIMESTAMP WITH TIME ZONE",
    "timestamp": "TIMESTAMP",
    "binary": "BLOB",
}


def _eq_key_pairs(d: dict, target_by_id: dict[int, str]) -> list[tuple[str, str]]:
    """(write-time name, target name) per equality key of one delete
    file. The delete parquet's columns use the names current when it
    was written (``equality-field-names``); the data relation uses the
    target schema's names. Iceberg binds by ``equality-ids``, so a
    key-column rename after the delete write must rebind — falling
    back to the written name only when no id was recorded."""
    ids = d.get("equality-ids") or []
    wnames = d.get("equality-field-names") or []
    pairs = []
    for i, w in enumerate(wnames):
        fid = ids[i] if i < len(ids) else -1
        pairs.append((w, target_by_id.get(fid, w)))
    return pairs


def _duck_type(iceberg: str) -> str:
    if iceberg.startswith("decimal"):
        return iceberg.upper()
    try:
        return _DUCK_TYPE[iceberg]
    except KeyError:
        raise ValueError(f"no DuckDB mapping for Iceberg type {iceberg!r}") from None


def _sql_literal(v, duck_type: str) -> str:
    if v is None:
        return f"CAST(NULL AS {duck_type})"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, (int, float)):
        return f"CAST({v!r} AS {duck_type})"
    return "CAST('" + str(v).replace("'", "''") + f"' AS {duck_type})"


def duckdb_scan_sql(metadata_path: str, snapshot_id: int | None = None) -> str:
    """Compile the exported Iceberg chain into ONE DuckDB SQL statement
    — a scan a SECOND, INDEPENDENT engine executes entirely itself.

    The walk (metadata.json → snapshot → manifest list → manifests)
    only RESOLVES the plan: which parquet files, which schema
    generation wrote each, which position-delete files tombstone them.
    Everything semantic — field-id projection (rename = alias, widen =
    CAST, added column = its initial-default literal), the
    merge-on-read anti-join of ``(file_path, pos)`` tombstones against
    DuckDB's own ``filename``/``file_row_number`` virtual columns, and
    equality-delete application (a null-safe NOT EXISTS against the
    delete file's key rows, guarded by Iceberg's sequence rule: the
    tombstone hits only data files with a STRICTLY smaller data
    sequence number) — is executed BY DuckDB from plain SQL, so
    agreement with ``LakeTable.read()`` proves the exported metadata
    describes the same table to an engine that shares no code with the
    repo's readers.
    """
    with open(metadata_path) as fh:
        md = json.load(fh)
    sid = snapshot_id if snapshot_id is not None else md["current-snapshot-id"]
    snap = next(s for s in md["snapshots"] if s["snapshot-id"] == sid)
    with open(snap["manifest-list"]) as fh:
        mlist = json.load(fh)
    # union arms are one per (schema generation, data sequence number):
    # the generation fixes the projection, the sequence number rides
    # along as a literal so equality deletes can apply their
    # smaller-sequence rule row-free
    by_arm: dict[tuple[int, int], list[str]] = {}
    delete_paths: list[str] = []
    eq_deletes: list[dict] = []
    for m in mlist["manifests"]:
        with open(m["manifest-path"]) as fh:
            manifest = json.load(fh)
        for e in manifest["entries"]:
            df_entry = e["data-file"]
            if df_entry.get("content") == 2:
                eq_deletes.append(df_entry)
                continue
            if df_entry.get("content") == 1:
                delete_paths.append(_strip_scheme(df_entry["file-path"]))
                continue
            arm = (df_entry["schema-id"], df_entry.get("data-sequence-number") or 0)
            by_arm.setdefault(arm, []).append(_strip_scheme(df_entry["file-path"]))
    target = next(s for s in md["schemas"] if s["schema-id"] == snap["schema-id"])
    names = ", ".join(f'"{f["name"]}"' for f in target["fields"])
    if not by_arm:
        cols = ", ".join(
            f'{_sql_literal(None, _duck_type(f["type"]))} AS "{f["name"]}"'
            for f in target["fields"]
        )
        return f"SELECT {cols} WHERE FALSE"
    gens = []
    for (schema_id, seq), files in sorted(by_arm.items()):
        written = next(s for s in md["schemas"] if s["schema-id"] == schema_id)
        names_by_id = {f["id"]: f["name"] for f in written["fields"]}
        sel = []
        for f in target["fields"]:
            duck = _duck_type(f["type"])
            old = names_by_id.get(f["id"])
            if old is not None:
                sel.append(f'CAST("{old}" AS {duck}) AS "{f["name"]}"')
            else:
                sel.append(
                    f'{_sql_literal(f.get("initial-default"), duck)} AS "{f["name"]}"'
                )
        flist = ", ".join("'" + p.replace("'", "''") + "'" for p in files)
        sel.append("filename AS _f")
        sel.append("file_row_number AS _pos")
        sel.append(f"CAST({seq} AS BIGINT) AS _seq")
        gens.append(
            f"SELECT {', '.join(sel)} FROM read_parquet([{flist}], "
            f"filename=true, file_row_number=true)"
        )
    union = " UNION ALL ".join(gens)
    conds = []
    if delete_paths:
        dlist = ", ".join("'" + p.replace("'", "''") + "'" for p in delete_paths)
        conds.append(
            f"NOT EXISTS (SELECT 1 FROM read_parquet([{dlist}]) _pd "
            f"WHERE regexp_replace(_pd.file_path, '^file:/+', '/') = _data._f "
            f"AND _pd.pos = _data._pos)"
        )
    target_by_id = {f["id"]: f["name"] for f in target["fields"]}
    for d in eq_deletes:
        if not d.get("equality-field-names"):
            raise ValueError(
                f"equality-delete file {d['file-path']} records no key "
                f"column names; cannot compile its tombstones to SQL"
            )
        dpath = _strip_scheme(d["file-path"]).replace("'", "''")
        dseq = d.get("data-sequence-number") or 0
        match = " AND ".join(
            f'_eq."{w}" IS NOT DISTINCT FROM _data."{t}"'
            for w, t in _eq_key_pairs(d, target_by_id)
        )
        conds.append(
            f"NOT (_data._seq < {dseq} AND EXISTS ("
            f"SELECT 1 FROM read_parquet('{dpath}') _eq WHERE {match}))"
        )
    if not conds:
        return f"SELECT {names} FROM ({union})"
    return (
        f"WITH _data AS ({union}) SELECT {names} FROM _data "
        f"WHERE {' AND '.join(conds)}"
    )
