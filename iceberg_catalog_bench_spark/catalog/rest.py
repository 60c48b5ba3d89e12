"""Iceberg-REST-catalog conformance surface (reference §2.8).

The reference ships a 1110-line Polaris REST harness
(``opencatalog/scripts/opencatalog_api_tester.py``) that exercises the
Iceberg REST catalog API end-to-end — OAuth token exchange (:72-89),
config (:506), namespace lifecycle (:515-530, :645-727), table
lifecycle (:680-715), view lifecycle (:796-841) — classifying every
call PASS / EXP (expected 403/406) / FAIL (:137-141).

This module reproduces that surface without external services:

- ``RestCatalogServer``: an in-process HTTP server (stdlib
  ``http.server``) implementing the Iceberg REST catalog API subset
  over a LakeTable warehouse directory — the same role Polaris plays
  for the reference, at conformance-test fidelity.
- ``RestCatalogClient``: a stdlib-``urllib`` client mirroring the
  tester's call inventory.
- ``run_conformance``: the ordered call suite with PASS/EXP/FAIL
  classification and cleanup ordering (tables/views before
  namespaces — ``opencatalog/README.md:78``).

A production deployment would instead point Spark's catalog conf at a
real REST catalog; this keeps the API contract tested in-repo.
"""

from __future__ import annotations

import json
import os
import threading
import urllib.error
import urllib.request
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

_TOKEN = "conformance-test-token"


# ---------------------------------------------------------------------------
# Server
# ---------------------------------------------------------------------------


class _State:
    """In-memory catalog state (namespaces / tables / views), the shape
    the REST API exposes. Table schemas use the Iceberg JSON schema
    model from ``opencatalog/samples/table_create_template.json``.

    ``catalogs`` is the Polaris-style MANAGEMENT entity store
    (tester :272-460): each catalog carries an ``entityVersion`` that
    optimistic-concurrency PUT updates must present and that every
    successful update bumps — the management-plane mirror of the data
    plane's snapshot-id commit check."""

    def __init__(self) -> None:
        self.namespaces: dict[str, dict] = {}
        self.tables: dict[tuple[str, str], dict] = {}
        self.views: dict[tuple[str, str], dict] = {}
        # One lock serializes commit validation+apply: requirements are
        # checked and updates applied atomically per request — the
        # optimistic-concurrency contract of the Iceberg REST commit
        # endpoints (a racer sees 409, never a half-applied commit).
        self.commit_lock = threading.Lock()
        self._uuid_counter = 0
        self.catalogs: dict[str, dict] = {
            "open_catalog": {
                "name": "open_catalog",
                "type": "INTERNAL",
                "entityVersion": 1,
                "properties": {
                    "default-base-location": "file:///warehouse/open_catalog"
                },
                "storageConfigInfo": {
                    "storageType": "FILE",
                    "allowedLocations": ["file:///warehouse/open_catalog"],
                },
            }
        }
        self.catalog_roles: dict[str, list[str]] = {
            "open_catalog": ["catalog_admin"]
        }
        self.principal_roles: list[str] = ["service_admin"]
        # Polaris-style grants (spec §9 permissions: revoke read/write
        # then restore). The single bearer principal holds every
        # catalog role; its effective privileges are the union of the
        # roles' grants. The management plane itself is governed by
        # the principal role (always held) so a revoked principal can
        # be restored — mirroring Polaris, where catalog grants gate
        # the DATA plane and service_admin retains the admin plane.
        self.grants: dict[str, set[str]] = {
            "catalog_admin": {"TABLE_READ_DATA", "TABLE_WRITE_DATA"}
        }

    def next_table_uuid(self) -> str:
        """Deterministic spec-shaped table uuid (no randomness so
        conformance runs replay byte-identically)."""
        self._uuid_counter += 1
        return f"00000000-0000-0000-0000-{self._uuid_counter:012d}"


_PRIVILEGES = ("TABLE_READ_DATA", "TABLE_WRITE_DATA")


def _check_requirements(md: dict, reqs: list) -> str | None:
    """Validate Iceberg commit requirements against table metadata.
    Returns an error message on the FIRST failed assertion, else None
    (spec: TableRequirement — the optimistic-concurrency predicates a
    committer captured at read time)."""
    for r in reqs:
        typ = r.get("type")
        if typ == "assert-create":
            # table already exists (we only route commits to existing
            # tables), so a create assertion always conflicts
            return "requirement failed: table already exists"
        if typ == "assert-table-uuid":
            if md.get("table-uuid") != r.get("uuid"):
                return (f"requirement failed: uuid {md.get('table-uuid')} "
                        f"!= {r.get('uuid')}")
        elif typ == "assert-ref-snapshot-id":
            ref = r.get("ref")
            want = r.get("snapshot-id")  # None = ref must not exist yet
            have = (md.get("refs", {}).get(ref) or {}).get("snapshot-id")
            if have != want:
                return (f"requirement failed: ref {ref!r} is at {have}, "
                        f"expected {want}")
        elif typ == "assert-current-schema-id":
            if md.get("current-schema-id") != r.get("current-schema-id"):
                return "requirement failed: current-schema-id moved"
        elif typ == "assert-last-assigned-field-id":
            if md.get("last-assigned-field-id", -1) > r.get(
                    "last-assigned-field-id", -1):
                return "requirement failed: last-assigned-field-id moved"
        else:
            return f"unsupported requirement type {typ!r}"
    return None


# required payload fields per update kind — checked in the VALIDATION
# pass so a malformed update can never abort a transaction half-applied
_UPDATE_TYPES = {
    "add-snapshot": ("snapshot",),
    "set-snapshot-ref": ("ref-name", "snapshot-id"),
    "remove-snapshot-ref": ("ref-name",),
    "set-properties": (),
    "remove-properties": (),
    "set-current-schema": ("schema-id",),
}


def _update_kind(u: dict) -> str | None:
    """Discriminator: the Iceberg REST spec spells it ``action``; this
    mock's original client used ``type`` — accept both (when ``action``
    is present, ``type`` is the spec's ref-kind field, not the
    discriminator)."""
    return u.get("action") or u.get("type")


def _validate_update(u: dict) -> str | None:
    kind = _update_kind(u)
    if kind not in _UPDATE_TYPES:
        return f"unsupported update type {kind!r}"
    missing = [k for k in _UPDATE_TYPES[kind] if k not in u]
    if missing:
        return f"update {kind!r} missing field(s) {missing}"
    if kind == "add-snapshot" and not isinstance(u["snapshot"], dict):
        return "update 'add-snapshot': snapshot must be an object"
    return None


def _apply_updates(md: dict, updates: list) -> None:
    """Apply Iceberg metadata updates (spec: TableUpdate subset —
    snapshots, refs, properties, schema pointer). Kinds AND required
    fields are validated by :func:`_validate_update` BEFORE any table
    mutates, so this never raises mid-transaction."""
    for u in updates:
        kind = _update_kind(u)
        if kind == "add-snapshot":
            snap = u["snapshot"]
            md["snapshots"].append(snap)
            md["last-sequence-number"] = max(
                md.get("last-sequence-number", 0),
                snap.get("sequence-number", 0))
        elif kind == "set-snapshot-ref":
            ref = u["ref-name"]
            ref_kind = (
                u.get("type", "branch") if "action" in u  # spec spelling
                else u.get("type-ref", u.get("ref-type", "branch"))
            )
            md.setdefault("refs", {})[ref] = {
                "snapshot-id": u["snapshot-id"],
                "type": ref_kind,
            }
            if ref == "main":
                md["current-snapshot-id"] = u["snapshot-id"]
        elif kind == "remove-snapshot-ref":
            md.get("refs", {}).pop(u["ref-name"], None)
            if u["ref-name"] == "main":
                md["current-snapshot-id"] = None
        elif kind == "set-properties":
            md.setdefault("properties", {}).update(u.get("updates", {}))
        elif kind == "remove-properties":
            for k in u.get("removals", []):
                md.get("properties", {}).pop(k, None)
        elif kind == "set-current-schema":
            md["current-schema-id"] = u["schema-id"]


def _make_handler(state: _State):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # silence test output
            pass

        # -- plumbing ------------------------------------------------------
        def _send(self, code: int, body: dict | None = None) -> None:
            data = json.dumps(body or {}).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            if self.command != "HEAD":
                self.wfile.write(data)

        def _body(self) -> dict:
            n = int(self.headers.get("Content-Length") or 0)
            return json.loads(self.rfile.read(n)) if n else {}

        def _authed(self) -> bool:
            return self.headers.get("Authorization") == f"Bearer {_TOKEN}"

        def _route(self):
            parts = [p for p in self.path.split("?")[0].split("/") if p]
            # Iceberg REST optional catalog prefix (/v1/{prefix}/...,
            # the `prefix` a client gets from /v1/config): strip it and
            # remember which catalog the data-plane call targets, so
            # privilege enforcement resolves THAT catalog's roles —
            # grants on a runtime-created catalog govern its own data
            # plane, not open_catalog's (ADVICE r4). Un-prefixed calls
            # target the default catalog, as the conformance client does.
            self._catalog = "open_catalog"
            if (
                len(parts) >= 2 and parts[0] == "v1"
                and parts[1] not in ("namespaces", "oauth", "config",
                                     "transactions")
            ):
                self._catalog = parts[1]
                parts = [parts[0]] + parts[2:]
            return parts

        # -- permissions (spec §9) ----------------------------------------
        def _privileges(self) -> set:
            privs: set = set()
            for r in state.catalog_roles.get(self._catalog, []):
                privs |= state.grants.get(r, set())
            return privs

        def _forbid(self, priv: str) -> None:
            # Iceberg REST error envelope: the surface engines show the
            # user when a catalog privilege is missing.
            self._send(403, {"error": {
                "message": f"Principal is not authorized: missing {priv}",
                "type": "NotAuthorizedException", "code": 403,
            }})

        # -- dispatch ------------------------------------------------------
        def do_POST(self):  # noqa: N802 (http.server API)
            parts = self._route()
            # OAuth client-credentials exchange (tester :72-89)
            if parts == ["v1", "oauth", "tokens"]:
                return self._send(200, {"access_token": _TOKEN, "token_type": "bearer"})
            if not self._authed():
                return self._send(401, {"error": "unauthorized"})
            # data-plane writes require TABLE_WRITE_DATA (spec §9)
            if parts[:1] == ["v1"] and "TABLE_WRITE_DATA" not in self._privileges():
                return self._forbid("TABLE_WRITE_DATA")
            if parts[:2] == ["v1", "namespaces"] and len(parts) == 2:
                body = self._body()
                ns = ".".join(body.get("namespace", []))
                if ns in state.namespaces:
                    return self._send(409, {"error": "namespace exists"})
                state.namespaces[ns] = body.get("properties", {})
                return self._send(200, {"namespace": body.get("namespace", [])})
            if (
                len(parts) == 4
                and parts[:2] == ["v1", "namespaces"]
                and parts[3] == "tables"
            ):
                ns = parts[2]
                if ns not in state.namespaces:
                    return self._send(404, {"error": "no such namespace"})
                body = self._body()
                name = body["name"]
                loc = body.get("location")
                if loc == "__AUTO__":  # auto-expansion (opencatalog/README.md:95)
                    loc = f"file:///warehouse/{ns}/{name}"
                state.tables[(ns, name)] = {
                    "name": name,
                    "schema": body.get("schema", {}),
                    "properties": body.get("properties", {}),
                    "location": loc,
                    "metrics_reports": [],
                    # Iceberg TableMetadata subset the commit protocol
                    # mutates (spec: CommitTableRequest)
                    "metadata": {
                        "table-uuid": state.next_table_uuid(),
                        "current-snapshot-id": None,
                        "snapshots": [],
                        "refs": {},
                        "current-schema-id": 0,
                        "last-sequence-number": 0,
                    },
                }
                return self._send(200, {"metadata-location": f"{loc}/metadata.json"})
            if (
                len(parts) == 4
                and parts[:2] == ["v1", "namespaces"]
                and parts[3] == "views"
            ):
                ns = parts[2]
                if ns not in state.namespaces:
                    return self._send(404, {"error": "no such namespace"})
                body = self._body()
                state.views[(ns, body["name"])] = body
                return self._send(200, {"view": body["name"]})
            # Iceberg REST register: POST /v1/namespaces/{ns}/register
            # {"name", "metadata-location"} — the catalog-level
            # spelling of foreign-table adoption (spec: RegisterTable;
            # the reference's Polaris harness drives this lifecycle,
            # opencatalog/scripts/opencatalog_api_tester.py:680-715).
            # Delegates to the same chain walker behind
            # LakeTable.from_iceberg_metadata, so only a chain that
            # would actually adopt registers.
            if (
                len(parts) == 4
                and parts[:2] == ["v1", "namespaces"]
                and parts[3] == "register"
            ):
                ns = parts[2]
                if ns not in state.namespaces:
                    return self._send(404, {"error": "no such namespace"})
                body = self._body()
                name = body.get("name")
                mloc = body.get("metadata-location")
                if not name or not mloc:
                    return self._send(
                        400, {"error": "name and metadata-location required"})
                if (ns, name) in state.tables:
                    return self._send(409, {"error": "table exists"})
                from .iceberg_export import (
                    _parse_iceberg_v2, _resolve_metadata_path)
                from .table import _strip_scheme
                import json as _json
                try:
                    resolved = _resolve_metadata_path(_strip_scheme(mloc))
                    native = _parse_iceberg_v2(resolved)
                    # read once, inside the SAME error contract: an
                    # I/O race here must surface as the endpoint's 400,
                    # not an unhandled exception (review r12)
                    with open(resolved) as fh:
                        _fmd = _json.load(fh)
                except Exception as e:  # loud, spec: 400 BadRequest
                    return self._send(
                        400, {"error": f"cannot register {mloc!r}: {e}"})
                cur = str(native["current_schema_version"])
                head = native.get("current_snapshot_id")
                # serve the chain's OWN Iceberg schema JSON verbatim —
                # spec type spellings (long, not bigint) and nested
                # list/struct/map types with their element/field ids
                # survive exactly as the foreign writer emitted them;
                # the native-DDL reconstruction is only the fallback
                # for legacy v1 chains without a schemas list
                foreign_schema = next(
                    (sc for sc in _fmd.get("schemas") or []
                     if sc.get("schema-id") == _fmd.get("current-schema-id")),
                    None) or _fmd.get("schema")
                table = {
                    "name": name,
                    "schema": foreign_schema or {
                        "type": "struct", "fields": [
                            {"id": f["id"], "name": f["name"],
                             "type": f["type"]}
                            for f in native["schemas"][cur]]},
                    "properties": dict(native.get("properties") or {}),
                    # prefer the metadata's own location (the directory
                    # heuristic yields <table>/_meta for this repo's
                    # exports, which nest metadata two levels deep)
                    "location": native.get("source_location")
                    or os.path.dirname(os.path.dirname(resolved)),
                    "metrics_reports": [],
                    "metadata": {
                        "table-uuid": state.next_table_uuid(),
                        "current-snapshot-id": head,
                        "snapshots": [
                            {"snapshot-id": sn["snapshot_id"],
                             "sequence-number": sn.get("seq",
                                                       sn["snapshot_id"]),
                             "timestamp-ms": sn.get("timestamp_ms")}
                            for sn in native["snapshots"]],
                        "refs": {
                            "main": {"snapshot-id": head, "type": "branch"},
                            **{n: {"snapshot-id": sid, "type": "tag"}
                               for n, sid in
                               (native.get("refs") or {}).items()},
                            **{n: {"snapshot-id": sid, "type": "branch"}
                               for n, sid in
                               (native.get("branches") or {}).items()},
                        },
                        "current-schema-id":
                            native["current_schema_version"],
                        "last-sequence-number": max(
                            (sn.get("seq", 0)
                             for sn in native["snapshots"]), default=0),
                    },
                    "metadata-location": os.path.abspath(resolved),
                }
                state.tables[(ns, name)] = table
                return self._send(200, {
                    "metadata-location": table["metadata-location"],
                    "metadata": table["metadata"],
                })
            # table metrics report (tester :876-879)
            if (
                len(parts) == 6
                and parts[:2] == ["v1", "namespaces"]
                and parts[3] == "tables"
                and parts[5] == "metrics"
            ):
                key = (parts[2], parts[4])
                if key not in state.tables:
                    return self._send(404, {"error": "no such table"})
                state.tables[key]["metrics_reports"].append(self._body())
                return self._send(204)
            # Iceberg REST commit: POST /v1/namespaces/{ns}/tables/{t}
            # with {requirements, updates} — optimistic concurrency
            # (spec: CommitTableRequest → 409 CommitFailedException)
            if (
                len(parts) == 5
                and parts[:2] == ["v1", "namespaces"]
                and parts[3] == "tables"
            ):
                body = self._body()
                change = dict(body)
                change["identifier"] = {
                    "namespace": parts[2].split("."), "name": parts[4]}
                return self._commit_changes([change], single=True)
            # Iceberg REST multi-table transaction:
            # POST /v1/transactions/commit — ALL requirements validate
            # first, then ALL updates apply, or nothing does
            if parts == ["v1", "transactions", "commit"]:
                return self._commit_changes(
                    self._body().get("table-changes", []))
            return self._send(404, {"error": "no route"})

        # -- Iceberg REST commit protocol -----------------------------------
        def _commit_changes(self, changes: list, single: bool = False):
            with state.commit_lock:
                resolved = []
                for ch in changes:
                    ident = ch.get("identifier") or {}
                    key = (".".join(ident.get("namespace", [])),
                           ident.get("name"))
                    tbl = state.tables.get(key)
                    if tbl is None:
                        return self._send(404, {"error": {
                            "message": f"no such table {key}",
                            "type": "NoSuchTableException", "code": 404}})
                    err = _check_requirements(
                        tbl["metadata"], ch.get("requirements", []))
                    if err:
                        # atomic: first failed requirement aborts the
                        # WHOLE transaction before any update applies
                        return self._send(409, {"error": {
                            "message": err,
                            "type": "CommitFailedException", "code": 409}})
                    updates = ch.get("updates", [])
                    bad = [e for e in map(_validate_update, updates) if e]
                    if bad:
                        # malformed/unsupported updates surface in the
                        # VALIDATION pass so a partial transaction
                        # never applies
                        return self._send(400, {"error": {
                            "message": "; ".join(bad),
                            "type": "BadRequestException", "code": 400}})
                    resolved.append((tbl, updates))
                for tbl, updates in resolved:
                    _apply_updates(tbl["metadata"], updates)
            if single:
                tbl = resolved[0][0]
                return self._send(200, {
                    "metadata-location":
                        f"{tbl['location']}/metadata.json",
                    "metadata": tbl["metadata"],
                })
            return self._send(204)

        def do_GET(self):  # noqa: N802
            parts = self._route()
            if not self._authed():
                return self._send(401, {"error": "unauthorized"})
            # -- management API (Polaris-style, tester :272-460) -----------
            if parts[:3] == ["api", "management", "v1"]:
                m = parts[3:]
                if (
                    len(m) == 5 and m[0] == "catalogs" and m[2] == "catalog-roles"
                    and m[4] == "grants"
                ):
                    if m[1] not in state.catalogs or m[3] not in state.grants:
                        return self._send(404, {"error": "no such role"})
                    return self._send(200, {"grants": [
                        {"type": "catalog", "privilege": p}
                        for p in sorted(state.grants[m[3]])
                    ]})
                if m == ["catalogs"]:
                    return self._send(
                        200, {"catalogs": [state.catalogs[k] for k in sorted(state.catalogs)]}
                    )
                if len(m) == 2 and m[0] == "catalogs":
                    cat = state.catalogs.get(m[1])
                    if cat is None:
                        return self._send(404, {"error": "no such catalog"})
                    return self._send(200, cat)
                if len(m) == 3 and m[0] == "catalogs" and m[2] == "catalog-roles":
                    roles = state.catalog_roles.get(m[1])
                    if roles is None:
                        return self._send(404, {"error": "no such catalog"})
                    return self._send(200, {"roles": [{"name": r} for r in roles]})
                if m == ["principal-roles"]:
                    return self._send(
                        200, {"roles": [{"name": r} for r in state.principal_roles]}
                    )
                return self._send(404, {"error": "no route"})
            if parts == ["v1", "config"]:
                # config stays readable — clients must bootstrap before
                # any privilege check can even be reported to them
                return self._send(200, {"defaults": {}, "overrides": {"prefix": ""}})
            # data-plane reads require TABLE_READ_DATA (spec §9)
            if parts[:1] == ["v1"] and "TABLE_READ_DATA" not in self._privileges():
                return self._forbid("TABLE_READ_DATA")
            if parts == ["v1", "namespaces"]:
                return self._send(
                    200, {"namespaces": [ns.split(".") for ns in sorted(state.namespaces)]}
                )
            if len(parts) == 3 and parts[:2] == ["v1", "namespaces"]:
                ns = parts[2]
                if ns not in state.namespaces:
                    return self._send(404, {"error": "no such namespace"})
                return self._send(
                    200, {"namespace": ns.split("."), "properties": state.namespaces[ns]}
                )
            if len(parts) == 4 and parts[3] in ("tables", "views"):
                ns = parts[2]
                if ns not in state.namespaces:
                    return self._send(404, {"error": "no such namespace"})
                store = state.tables if parts[3] == "tables" else state.views
                idents = [
                    {"namespace": k[0].split("."), "name": k[1]}
                    for k in sorted(store) if k[0] == ns
                ]
                return self._send(200, {"identifiers": idents})
            if len(parts) == 5 and parts[3] in ("tables", "views"):
                store = state.tables if parts[3] == "tables" else state.views
                item = store.get((parts[2], parts[4]))
                if item is None:
                    return self._send(404, {"error": "not found"})
                return self._send(200, item)
            # applicable-policies: disabled policy store → 406 (tester :552)
            if parts[-1] == "applicable-policies":
                return self._send(406, {"error": "policy store disabled"})
            return self._send(404, {"error": "no route"})

        def do_PUT(self):  # noqa: N802
            parts = self._route()
            if not self._authed():
                return self._send(401, {"error": "unauthorized"})
            # grant a catalog privilege to a role (restore path):
            # PUT /api/management/v1/catalogs/{c}/catalog-roles/{r}/grants
            if (
                parts[:3] == ["api", "management", "v1"] and len(parts) == 8
                and parts[3] == "catalogs" and parts[5] == "catalog-roles"
                and parts[7] == "grants"
            ):
                if parts[4] not in state.catalogs or parts[6] not in state.grants:
                    return self._send(404, {"error": "no such role"})
                priv = (self._body().get("grant") or {}).get("privilege")
                if priv not in _PRIVILEGES:
                    return self._send(400, {"error": f"unknown privilege {priv!r}"})
                state.grants[parts[6]].add(priv)
                return self._send(201, {"grant": {"type": "catalog", "privilege": priv}})
            # optimistic-concurrency catalog update (tester :406-460):
            # the caller presents the entityVersion it read; a stale
            # version is a 409 conflict; success applies the changed
            # sections and bumps the version.
            if parts[:3] == ["api", "management", "v1"] and len(parts) == 5 \
                    and parts[3] == "catalogs":
                cat = state.catalogs.get(parts[4])
                if cat is None:
                    return self._send(404, {"error": "no such catalog"})
                body = self._body()
                presented = body.get("currentEntityVersion")
                if presented != cat["entityVersion"]:
                    return self._send(
                        409,
                        {"error": "entity version conflict",
                         "currentEntityVersion": cat["entityVersion"]},
                    )
                if isinstance(body.get("properties"), dict):
                    cat["properties"] = body["properties"]
                if isinstance(body.get("storageConfigInfo"), dict):
                    cat["storageConfigInfo"] = body["storageConfigInfo"]
                cat["entityVersion"] += 1
                return self._send(200, cat)
            return self._send(404, {"error": "no route"})

        def do_HEAD(self):  # noqa: N802
            parts = self._route()
            if not self._authed():
                return self._send(401)
            if parts[:1] == ["v1"] and "TABLE_READ_DATA" not in self._privileges():
                return self._send(403)
            if len(parts) == 3 and parts[:2] == ["v1", "namespaces"]:
                return self._send(200 if parts[2] in state.namespaces else 404)
            if len(parts) == 5 and parts[3] in ("tables", "views"):
                store = state.tables if parts[3] == "tables" else state.views
                return self._send(200 if (parts[2], parts[4]) in store else 404)
            return self._send(404)

        def do_DELETE(self):  # noqa: N802
            parts = self._route()
            if not self._authed():
                return self._send(401)
            # revoke a catalog privilege from a role:
            # DELETE /api/management/v1/catalogs/{c}/catalog-roles/{r}/grants
            if (
                parts[:3] == ["api", "management", "v1"] and len(parts) == 8
                and parts[3] == "catalogs" and parts[5] == "catalog-roles"
                and parts[7] == "grants"
            ):
                if parts[4] not in state.catalogs or parts[6] not in state.grants:
                    return self._send(404, {"error": "no such role"})
                priv = (self._body().get("grant") or {}).get("privilege")
                if priv not in _PRIVILEGES:
                    return self._send(400, {"error": f"unknown privilege {priv!r}"})
                state.grants[parts[6]].discard(priv)
                return self._send(204)
            # data-plane deletes require TABLE_WRITE_DATA (spec §9)
            if parts[:1] == ["v1"] and "TABLE_WRITE_DATA" not in self._privileges():
                return self._forbid("TABLE_WRITE_DATA")
            if len(parts) == 3 and parts[:2] == ["v1", "namespaces"]:
                ns = parts[2]
                if ns not in state.namespaces:
                    return self._send(404)
                if any(k[0] == ns for k in list(state.tables) + list(state.views)):
                    return self._send(409, {"error": "namespace not empty"})
                del state.namespaces[ns]
                return self._send(204)
            if len(parts) == 5 and parts[3] in ("tables", "views"):
                store = state.tables if parts[3] == "tables" else state.views
                key = (parts[2], parts[4])
                if key not in store:
                    return self._send(404)
                del store[key]
                return self._send(204)
            return self._send(404)

    return Handler


class RestCatalogServer:
    def __init__(self) -> None:
        self.state = _State()
        self._httpd = ThreadingHTTPServer(("127.0.0.1", 0), _make_handler(self.state))
        self._thread = threading.Thread(target=self._httpd.serve_forever, daemon=True)

    @property
    def url(self) -> str:
        host, port = self._httpd.server_address
        return f"http://{host}:{port}"

    def start(self) -> "RestCatalogServer":
        self._thread.start()
        return self

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()


# ---------------------------------------------------------------------------
# Client (mirrors opencatalog_api_tester.py's call inventory)
# ---------------------------------------------------------------------------


@dataclass
class CallResult:
    name: str
    status: int
    outcome: str  # PASS / EXP / FAIL
    body: dict = field(default_factory=dict)


class RestCatalogClient:
    def __init__(self, base_url: str):
        self.base = base_url.rstrip("/")
        self.token: str | None = None

    def _request(self, method: str, path: str, body: dict | None = None) -> tuple[int, dict]:
        req = urllib.request.Request(
            self.base + path,
            method=method,
            data=json.dumps(body).encode() if body is not None else None,
            headers={
                "Content-Type": "application/json",
                **({"Authorization": f"Bearer {self.token}"} if self.token else {}),
            },
        )
        try:
            with urllib.request.urlopen(req) as resp:
                raw = resp.read()
                return resp.status, (json.loads(raw) if raw else {})
        except urllib.error.HTTPError as e:
            raw = e.read()
            try:
                return e.code, (json.loads(raw) if raw else {})
            except json.JSONDecodeError:
                return e.code, {}

    def authenticate(self) -> int:
        status, body = self._request(
            "POST", "/v1/oauth/tokens",
            {"grant_type": "client_credentials", "client_id": "x", "client_secret": "y"},
        )
        self.token = body.get("access_token")
        return status

    def get_config(self):
        return self._request("GET", "/v1/config")

    def list_namespaces(self):
        return self._request("GET", "/v1/namespaces")

    def create_namespace(self, ns: str, properties: dict | None = None):
        return self._request(
            "POST", "/v1/namespaces", {"namespace": ns.split("."), "properties": properties or {}}
        )

    def describe_namespace(self, ns: str):
        return self._request("GET", f"/v1/namespaces/{ns}")

    def namespace_exists(self, ns: str):
        return self._request("HEAD", f"/v1/namespaces/{ns}")

    def drop_namespace(self, ns: str):
        return self._request("DELETE", f"/v1/namespaces/{ns}")

    def list_tables(self, ns: str):
        return self._request("GET", f"/v1/namespaces/{ns}/tables")

    def create_table(self, ns: str, name: str, schema: dict, location: str = "__AUTO__"):
        # body shape from opencatalog/samples/table_create_template.json
        return self._request(
            "POST", f"/v1/namespaces/{ns}/tables",
            {"name": name, "schema": schema, "location": location,
             "properties": {"format-version": "2", "commit.manifest.min-count-to-merge": "1"}},
        )

    def load_table(self, ns: str, name: str):
        return self._request("GET", f"/v1/namespaces/{ns}/tables/{name}")

    def table_exists(self, ns: str, name: str):
        return self._request("HEAD", f"/v1/namespaces/{ns}/tables/{name}")

    def drop_table(self, ns: str, name: str):
        return self._request("DELETE", f"/v1/namespaces/{ns}/tables/{name}")

    def register_table(self, ns: str, name: str, metadata_location: str):
        """Iceberg REST RegisterTable: adopt an existing chain by its
        metadata location (spec: POST /v1/{prefix}/namespaces/{ns}/register)."""
        return self._request(
            "POST", f"/v1/namespaces/{ns}/register",
            {"name": name, "metadata-location": metadata_location})

    def report_metrics(self, ns: str, name: str, report: dict):
        return self._request("POST", f"/v1/namespaces/{ns}/tables/{name}/metrics", report)

    def commit_table(self, ns: str, name: str,
                     requirements: list, updates: list):
        """Iceberg REST commit (CommitTableRequest): optimistic —
        requirements captured at read time must still hold or the
        server answers 409 CommitFailedException."""
        return self._request(
            "POST", f"/v1/namespaces/{ns}/tables/{name}",
            {"requirements": requirements, "updates": updates})

    def commit_transaction(self, table_changes: list):
        """Iceberg REST multi-table transaction: every change's
        requirements validate before ANY update applies (204), else
        nothing applies (409)."""
        return self._request(
            "POST", "/v1/transactions/commit",
            {"table-changes": table_changes})

    def list_views(self, ns: str):
        return self._request("GET", f"/v1/namespaces/{ns}/views")

    def create_view(self, ns: str, name: str, sql: str, schema: dict):
        # SQL-representation view metadata (view_create_template.json)
        return self._request(
            "POST", f"/v1/namespaces/{ns}/views",
            {"name": name, "schema": schema,
             "view-version": {"version-id": 1,
                              "representations": [{"type": "sql", "sql": sql, "dialect": "spark"}]}},
        )

    def load_view(self, ns: str, name: str):
        return self._request("GET", f"/v1/namespaces/{ns}/views/{name}")

    def drop_view(self, ns: str, name: str):
        return self._request("DELETE", f"/v1/namespaces/{ns}/views/{name}")

    def applicable_policies(self, ns: str):
        return self._request("GET", f"/v1/namespaces/{ns}/applicable-policies")

    # -- management API (tester :272-460) ----------------------------------

    def list_catalogs(self):
        return self._request("GET", "/api/management/v1/catalogs")

    def describe_catalog(self, name: str):
        return self._request("GET", f"/api/management/v1/catalogs/{name}")

    def list_catalog_roles(self, name: str):
        return self._request("GET", f"/api/management/v1/catalogs/{name}/catalog-roles")

    def list_principal_roles(self):
        return self._request("GET", "/api/management/v1/principal-roles")

    def list_grants(self, catalog: str, role: str):
        return self._request(
            "GET", f"/api/management/v1/catalogs/{catalog}/catalog-roles/{role}/grants"
        )

    def add_grant(self, catalog: str, role: str, privilege: str):
        return self._request(
            "PUT", f"/api/management/v1/catalogs/{catalog}/catalog-roles/{role}/grants",
            {"grant": {"type": "catalog", "privilege": privilege}},
        )

    def revoke_grant(self, catalog: str, role: str, privilege: str):
        return self._request(
            "DELETE", f"/api/management/v1/catalogs/{catalog}/catalog-roles/{role}/grants",
            {"grant": {"type": "catalog", "privilege": privilege}},
        )

    def update_catalog(self, name: str, current_entity_version: int,
                       properties: dict | None = None,
                       storage_config: dict | None = None):
        body: dict = {"currentEntityVersion": current_entity_version}
        if properties is not None:
            body["properties"] = properties
        if storage_config is not None:
            body["storageConfigInfo"] = storage_config
        return self._request("PUT", f"/api/management/v1/catalogs/{name}", body)


_ICEBERG_SCHEMA = {
    # struct< id: long required, name: string optional > — the sample
    # table template's Iceberg JSON schema
    "type": "struct",
    "fields": [
        {"id": 1, "name": "id", "type": "long", "required": True},
        {"id": 2, "name": "name", "type": "string", "required": False},
    ],
}


def run_conformance(base_url: str, ns: str = "conformance_ns") -> list[CallResult]:
    """The ordered conformance sequence with PASS/EXP/FAIL
    classification (tester :137-141) and tables/views-before-namespace
    cleanup (opencatalog/README.md:78)."""
    c = RestCatalogClient(base_url)
    results: list[CallResult] = []

    def check(name: str, resp: tuple[int, dict], ok=(200, 204), expected=()):
        status, body = resp
        outcome = "PASS" if status in ok else ("EXP" if status in expected else "FAIL")
        results.append(CallResult(name, status, outcome, body))
        return body

    check("oauth_token", (c.authenticate(), {}), ok=(200,))
    check("get_config", c.get_config())

    # -- management plane (tester :272-460): read surface, then the
    # optimistic-concurrency update-and-revert cycle on the catalog
    # entity, with entityVersion captured from each response ----------
    check("list_catalogs", c.list_catalogs())
    cat = check("describe_catalog", c.describe_catalog("open_catalog"))
    check("list_catalog_roles", c.list_catalog_roles("open_catalog"))
    check("list_principal_roles", c.list_principal_roles())
    version = cat.get("entityVersion")
    if not isinstance(version, int):
        # A failed/shape-changed describe means the optimistic-
        # concurrency cycle cannot run; record its calls as FAIL
        # rows (the suite's contract is PASS/EXP/FAIL, never an
        # unhandled exception) and continue with the data plane.
        for nm in (
            "update_catalog_base_location", "update_catalog_stale_version",
            "revert_catalog_base_location", "update_catalog_allowed_locations",
            "revert_catalog_allowed_locations", "describe_catalog_after_revert",
            "catalog_state_reverted",
        ):
            results.append(CallResult(
                nm, 0, "FAIL",
                {"error": "describe_catalog returned no entityVersion"},
            ))
    else:
        original_props = dict(cat.get("properties", {}))
        updated_props = dict(original_props)
        updated_props["default-base-location"] = (
            original_props.get("default-base-location", "") + "-conformance"
        )
        cat = check(
            "update_catalog_base_location",
            c.update_catalog("open_catalog", version, properties=updated_props),
        )
        version = cat.get("entityVersion", version)
        check(
            "update_catalog_stale_version",
            c.update_catalog("open_catalog", version - 1, properties=updated_props),
            ok=(), expected=(409,),
        )
        cat = check(
            "revert_catalog_base_location",
            c.update_catalog("open_catalog", version, properties=original_props),
        )
        version = cat.get("entityVersion", version)
        storage = dict(cat.get("storageConfigInfo", {}))
        original_locs = list(storage.get("allowedLocations", []))
        storage["allowedLocations"] = [
            (original_locs[0] + "-conformance") if original_locs else "file:///x"
        ] + original_locs[1:]
        cat = check(
            "update_catalog_allowed_locations",
            c.update_catalog("open_catalog", version, storage_config=storage),
        )
        version = cat.get("entityVersion", version)
        storage["allowedLocations"] = original_locs
        cat = check(
            "revert_catalog_allowed_locations",
            c.update_catalog("open_catalog", version, storage_config=storage),
        )
        final = check("describe_catalog_after_revert", c.describe_catalog("open_catalog"))
        check(
            "catalog_state_reverted",
            (200 if (final.get("properties") == original_props
                     and final.get("storageConfigInfo", {}).get("allowedLocations")
                     == original_locs) else 500, final),
            ok=(200,),
        )

    check("create_namespace", c.create_namespace(ns))
    check("create_namespace_conflict", c.create_namespace(ns), ok=(), expected=(409,))
    check("list_namespaces", c.list_namespaces())
    check("describe_namespace", c.describe_namespace(ns))
    check("head_namespace", c.namespace_exists(ns))
    check("applicable_policies_disabled", c.applicable_policies(ns), ok=(), expected=(406,))
    check("create_table", c.create_table(ns, "t1", _ICEBERG_SCHEMA))
    check("list_tables", c.list_tables(ns))
    check("load_table", c.load_table(ns, "t1"))
    check("head_table", c.table_exists(ns, "t1"))
    check("report_metrics", c.report_metrics(ns, "t1", {"report-type": "scan-report"}))
    check("create_view", c.create_view(ns, "v1", f"SELECT id, name FROM {ns}.t1", _ICEBERG_SCHEMA))
    check("list_views", c.list_views(ns))
    check("load_view", c.load_view(ns, "v1"))
    check("drop_namespace_not_empty", c.drop_namespace(ns), ok=(), expected=(409,))
    check("drop_view", c.drop_view(ns, "v1"))
    check("drop_table", c.drop_table(ns, "t1"))
    check("drop_namespace", c.drop_namespace(ns))
    check("head_namespace_gone", c.namespace_exists(ns), ok=(404,))

    # -- permissions: revoke read/write then restore (spec §9,
    # ICEBERG-Interoperability-Test-Spec.md:87-88) — correct error
    # surfaces (403 NotAuthorizedException envelope) while revoked,
    # full recovery after restore, catalog state intact throughout ----
    check("list_grants", c.list_grants("open_catalog", "catalog_admin"))
    check(
        "revoke_write",
        c.revoke_grant("open_catalog", "catalog_admin", "TABLE_WRITE_DATA"),
        ok=(204,),
    )
    check(
        "write_denied_after_revoke", c.create_namespace(f"{ns}_denied"),
        ok=(), expected=(403,),
    )
    check("read_still_allowed", c.list_namespaces())
    check(
        "revoke_read",
        c.revoke_grant("open_catalog", "catalog_admin", "TABLE_READ_DATA"),
        ok=(204,),
    )
    check("read_denied_after_revoke", c.list_namespaces(), ok=(), expected=(403,))
    check(
        "restore_read",
        c.add_grant("open_catalog", "catalog_admin", "TABLE_READ_DATA"),
        ok=(201,),
    )
    check(
        "restore_write",
        c.add_grant("open_catalog", "catalog_admin", "TABLE_WRITE_DATA"),
        ok=(201,),
    )
    check("read_recovered", c.list_namespaces())
    check("write_recovered", c.create_namespace(f"{ns}_recovered"))
    check("recovery_cleanup", c.drop_namespace(f"{ns}_recovered"))
    return results
