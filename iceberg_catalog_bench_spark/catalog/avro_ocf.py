"""Avro Object Container File codec, written from scratch against the
public Apache Avro 1.11 specification.

Real Iceberg chains carry their manifest lists and manifests as Avro
OCF files (Iceberg table spec, "Manifests" / "Manifest Lists") — that
is what the reference harness's Spark sessions write and validate
(``blob_dfs/blob-dfs_bench.py:104-105``,
``ICEBERG-Interoperability-Test-Spec.md:4-14``). No Avro library ships
in this environment (``fastavro``/``avro`` both absent), so this module
implements the subset of the Avro spec those files need, both ways:

- **reader** (:func:`read_ocf`): header magic ``Obj\\x01``, the
  file-metadata map (``avro.schema`` JSON, ``avro.codec``), the 16-byte
  sync marker, and data blocks in the ``null`` and ``deflate``
  (raw RFC 1951) codecs; binary decoding of every Avro type — zig-zag
  varint int/long, IEEE little-endian float/double, length-prefixed
  bytes/string, records, enums, fixed, arrays and maps (including the
  negative-count block form that carries a byte size), unions, and
  named-type references;
- **writer** (:func:`write_ocf`): the symmetric encoder, so exported
  chains round-trip through the REAL serialization rather than a JSON
  stand-in.

Byte-level fixtures in ``tests/test_avro_ocf.py`` pin both directions
against hand-computed buffers (no reader/writer circularity).
"""

from __future__ import annotations

import io
import json
import struct
import zlib

MAGIC = b"Obj\x01"

_PRIMITIVES = {
    "null", "boolean", "int", "long", "float", "double", "bytes", "string",
}


# ---------------------------------------------------------------- decoding

class _Reader:
    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def read(self, n: int) -> bytes:
        b = self.buf[self.pos:self.pos + n]
        if len(b) != n:
            raise EOFError(
                f"Avro buffer underrun: wanted {n} bytes at offset "
                f"{self.pos}, have {len(self.buf) - self.pos}"
            )
        self.pos += n
        return b

    def eof(self) -> bool:
        return self.pos >= len(self.buf)


def _read_long(r: _Reader) -> int:
    """Zig-zag base-128 varint (Avro spec: int/long encoding)."""
    shift = 0
    acc = 0
    while True:
        b = r.read(1)[0]
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
        if shift > 70:
            raise ValueError("varint too long for an Avro long")
    return (acc >> 1) ^ -(acc & 1)


def _read_bytes(r: _Reader) -> bytes:
    n = _read_long(r)
    if n < 0:
        raise ValueError(f"negative Avro bytes length {n}")
    return r.read(n)


def collect_names(schema, names: dict, namespace: str | None = None) -> None:
    """Pre-register every named type (record/enum/fixed) in declaration
    order so later name references resolve (Avro spec: named types may
    be referenced by full name after their first definition)."""
    if isinstance(schema, list):
        for branch in schema:
            collect_names(branch, names, namespace)
        return
    if not isinstance(schema, dict):
        return
    t = schema.get("type")
    if t in ("record", "enum", "fixed", "error"):
        ns = schema.get("namespace", namespace)
        names[schema["name"]] = schema
        if ns:
            names[f"{ns}.{schema['name']}"] = schema
        if t in ("record", "error"):
            for f in schema["fields"]:
                collect_names(f["type"], names, ns)
    elif t == "array":
        collect_names(schema["items"], names, namespace)
    elif t == "map":
        collect_names(schema["values"], names, namespace)
    elif isinstance(t, (dict, list)):
        collect_names(t, names, namespace)


def decode(schema, r: _Reader, names: dict):
    """Decode one datum of ``schema`` from ``r``. Records become dicts,
    arrays lists, maps dicts, enums their symbol string, fixed raw
    bytes. Logical types are NOT interpreted — callers get the raw
    underlying value (Iceberg's adapters interpret them knowingly)."""
    if isinstance(schema, list):  # union: long branch index, then value
        idx = _read_long(r)
        if not 0 <= idx < len(schema):
            raise ValueError(f"union branch {idx} out of range")
        return decode(schema[idx], r, names)
    if isinstance(schema, str):
        if schema in _PRIMITIVES:
            return _decode_primitive(schema, r)
        return decode(names[schema], r, names)  # named-type reference
    t = schema["type"]
    if isinstance(t, (dict, list)):
        return decode(t, r, names)
    if t == "record" or t == "error":
        return {f["name"]: decode(f["type"], r, names)
                for f in schema["fields"]}
    if t == "enum":
        idx = _read_long(r)
        return schema["symbols"][idx]
    if t == "fixed":
        return r.read(schema["size"])
    if t == "array":
        out = []
        while True:
            n = _read_long(r)
            if n == 0:
                break
            if n < 0:  # negative count ⇒ a long byte-size follows
                _read_long(r)
                n = -n
            for _ in range(n):
                out.append(decode(schema["items"], r, names))
        return out
    if t == "map":
        out = {}
        while True:
            n = _read_long(r)
            if n == 0:
                break
            if n < 0:
                _read_long(r)
                n = -n
            for _ in range(n):
                k = _read_bytes(r).decode("utf-8")
                out[k] = decode(schema["values"], r, names)
        return out
    if t in _PRIMITIVES:
        return _decode_primitive(t, r)
    if t in names:
        return decode(names[t], r, names)
    raise ValueError(f"unsupported Avro schema {schema!r}")


def _decode_primitive(t: str, r: _Reader):
    if t == "null":
        return None
    if t == "boolean":
        return r.read(1)[0] != 0
    if t in ("int", "long"):
        return _read_long(r)
    if t == "float":
        return struct.unpack("<f", r.read(4))[0]
    if t == "double":
        return struct.unpack("<d", r.read(8))[0]
    if t == "bytes":
        return _read_bytes(r)
    if t == "string":
        return _read_bytes(r).decode("utf-8")
    raise ValueError(f"unknown primitive {t!r}")


def _compile(schema, names: dict, memo: dict):
    """Compile a schema into a closure decoder ``fn(_Reader) -> value``
    — the schema walk (branch dispatch, field lists, symbol tables)
    happens ONCE instead of per value, which is what makes decoding a
    100k-entry manifest a seconds-not-minutes affair in pure Python.
    Semantics identical to :func:`decode` (which the byte-level tests
    pin); ``read_ocf`` uses this path."""
    if isinstance(schema, list):
        branches = [_compile(b, names, memo) for b in schema]

        def _union(r, _b=branches):
            idx = _read_long(r)
            # same range check as decode(): a corrupt OCF with a
            # negative index must raise, not silently decode via
            # Python negative indexing (ADVICE r9)
            if not 0 <= idx < len(_b):
                raise ValueError(f"union branch {idx} out of range")
            return _b[idx](r)
        return _union
    if isinstance(schema, str):
        t = schema
        if t not in _PRIMITIVES:
            # named reference — compile lazily (the definition may not
            # be memoized yet when referenced from a sibling branch)
            def _ref(r, _n=t):
                fn = memo.get(_n)
                if fn is None:
                    fn = memo[_n] = _compile(names[_n], names, memo)
                return fn(r)
            return _ref
    else:
        t = schema["type"]
        if isinstance(t, (dict, list)):
            return _compile(t, names, memo)
        if t == "record" or t == "error":
            key = schema["name"]
            fields = [(f["name"], _compile(f["type"], names, memo))
                      for f in schema["fields"]]

            def _record(r, _f=fields):
                return {n: fn(r) for n, fn in _f}
            memo[key] = _record
            return _record
        if t == "enum":
            syms = schema["symbols"]
            fn = lambda r, _s=syms: _s[_read_long(r)]  # noqa: E731
            memo[schema["name"]] = fn
            return fn
        if t == "fixed":
            size = schema["size"]
            fn = lambda r, _n=size: r.read(_n)  # noqa: E731
            memo[schema["name"]] = fn
            return fn
        if t == "array":
            item = _compile(schema["items"], names, memo)

            def _array(r, _i=item):
                out = []
                while True:
                    n = _read_long(r)
                    if n == 0:
                        return out
                    if n < 0:
                        _read_long(r)
                        n = -n
                    for _ in range(n):
                        out.append(_i(r))
            return _array
        if t == "map":
            val = _compile(schema["values"], names, memo)

            def _map(r, _v=val):
                out = {}
                while True:
                    n = _read_long(r)
                    if n == 0:
                        return out
                    if n < 0:
                        _read_long(r)
                        n = -n
                    for _ in range(n):
                        # explicit temporaries: Python evaluates the
                        # VALUE side of `out[k] = v` first, which would
                        # flip the key/value read order
                        k = _read_bytes(r).decode("utf-8")
                        out[k] = _v(r)
            return _map
    if t == "null":
        return lambda r: None
    if t == "boolean":
        return lambda r: r.read(1)[0] != 0
    if t in ("int", "long"):
        return _read_long
    if t == "float":
        return lambda r: struct.unpack("<f", r.read(4))[0]
    if t == "double":
        return lambda r: struct.unpack("<d", r.read(8))[0]
    if t == "bytes":
        return _read_bytes
    if t == "string":
        return lambda r: _read_bytes(r).decode("utf-8")
    raise ValueError(f"unsupported Avro schema {schema!r}")


_META_MAP_SCHEMA = {"type": "map", "values": "bytes"}


def read_ocf(path: str) -> tuple[dict, list]:
    """Read an Avro Object Container File → ``(file_metadata, records)``.

    ``file_metadata`` maps string keys to *bytes* values exactly as
    stored (``avro.schema`` etc. plus Iceberg's ``schema`` /
    ``partition-spec`` / ``content`` keys); ``records`` are decoded per
    the embedded writer schema."""
    with open(path, "rb") as fh:
        buf = fh.read()
    r = _Reader(buf)
    if r.read(4) != MAGIC:
        raise ValueError(f"{path!r} is not an Avro OCF (bad magic)")
    meta = decode(_META_MAP_SCHEMA, r, {})
    sync = r.read(16)
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported Avro codec {codec!r} in {path!r}")
    names: dict = {}
    collect_names(schema, names)
    dec = _compile(schema, names, {})
    records: list = []
    while not r.eof():
        count = _read_long(r)
        size = _read_long(r)
        block = r.read(size)
        if codec == "deflate":  # raw RFC 1951 — no zlib header
            d = zlib.decompressobj(-15)
            block = d.decompress(block) + d.flush()
        br = _Reader(block)
        append = records.append
        for _ in range(count):
            append(dec(br))
        if r.read(16) != sync:
            raise ValueError(f"sync-marker mismatch in {path!r}")
    return meta, records


# ---------------------------------------------------------------- encoding

def _write_long(out: io.BytesIO, v: int) -> None:
    v = (v << 1) ^ (v >> 63) if v >= 0 else (((-v - 1) << 1) | 1)
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.write(bytes((b | 0x80,)))
        else:
            out.write(bytes((b,)))
            return


def _write_bytes(out: io.BytesIO, b: bytes) -> None:
    _write_long(out, len(b))
    out.write(b)


def encode(schema, v, out: io.BytesIO, names: dict) -> None:
    """Encode ``v`` per ``schema`` into ``out``. Unions resolve null to
    the ``null`` branch and anything else to the first non-null branch
    (the only union shape Iceberg manifests use: ``[null, X]``)."""
    if isinstance(schema, list):
        if v is None:
            for i, b in enumerate(schema):
                if b == "null":
                    _write_long(out, i)
                    return
            raise ValueError("None for a union without a null branch")
        for i, b in enumerate(schema):
            if b != "null":
                _write_long(out, i)
                encode(b, v, out, names)
                return
        raise ValueError("union has no non-null branch")
    if isinstance(schema, str):
        if schema in _PRIMITIVES:
            return _encode_primitive(schema, v, out)
        return encode(names[schema], v, out, names)
    t = schema["type"]
    if isinstance(t, (dict, list)):
        return encode(t, v, out, names)
    if t == "record" or t == "error":
        for f in schema["fields"]:
            fv = v.get(f["name"], f.get("default"))
            encode(f["type"], fv, out, names)
        return
    if t == "enum":
        _write_long(out, schema["symbols"].index(v))
        return
    if t == "fixed":
        if len(v) != schema["size"]:
            raise ValueError(
                f"fixed {schema['name']} wants {schema['size']} bytes, "
                f"got {len(v)}")
        out.write(v)
        return
    if t == "array":
        if v:
            _write_long(out, len(v))
            for item in v:
                encode(schema["items"], item, out, names)
        _write_long(out, 0)
        return
    if t == "map":
        if v:
            _write_long(out, len(v))
            for k, mv in v.items():
                _write_bytes(out, k.encode("utf-8"))
                encode(schema["values"], mv, out, names)
        _write_long(out, 0)
        return
    if t in _PRIMITIVES:
        return _encode_primitive(t, v, out)
    if t in names:
        return encode(names[t], v, out, names)
    raise ValueError(f"unsupported Avro schema {schema!r}")


def _encode_primitive(t: str, v, out: io.BytesIO) -> None:
    if t == "null":
        if v is not None:
            raise ValueError(f"non-None {v!r} for Avro null")
        return
    if t == "boolean":
        out.write(b"\x01" if v else b"\x00")
        return
    if t in ("int", "long"):
        _write_long(out, int(v))
        return
    if t == "float":
        out.write(struct.pack("<f", float(v)))
        return
    if t == "double":
        out.write(struct.pack("<d", float(v)))
        return
    if t == "bytes":
        _write_bytes(out, bytes(v))
        return
    if t == "string":
        _write_bytes(out, v.encode("utf-8"))
        return
    raise ValueError(f"unknown primitive {t!r}")


def write_ocf(path: str, schema: dict, records: list, *,
              metadata: dict | None = None, codec: str = "deflate") -> None:
    """Write an Avro Object Container File.

    ``metadata`` values may be str or bytes; ``avro.schema`` and
    ``avro.codec`` are added automatically. The 16-byte sync marker is
    derived deterministically from the schema + record count so writes
    are reproducible byte-for-byte."""
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported codec {codec!r}")
    names: dict = {}
    collect_names(schema, names)
    schema_json = json.dumps(schema, separators=(",", ":"))
    meta: dict[str, bytes] = {}
    for k, v in (metadata or {}).items():
        meta[k] = v if isinstance(v, bytes) else str(v).encode("utf-8")
    meta["avro.schema"] = schema_json.encode("utf-8")
    meta["avro.codec"] = codec.encode("utf-8")
    import hashlib
    sync = hashlib.sha256(
        schema_json.encode("utf-8") + str(len(records)).encode()
    ).digest()[:16]

    body = io.BytesIO()
    for rec in records:
        encode(schema, rec, body, names)
    block = body.getvalue()
    if codec == "deflate":
        c = zlib.compressobj(level=6, wbits=-15)
        block = c.compress(block) + c.flush()

    out = io.BytesIO()
    out.write(MAGIC)
    encode(_META_MAP_SCHEMA, meta, out, {})
    out.write(sync)
    if records:
        _write_long(out, len(records))
        _write_long(out, len(block))
        out.write(block)
        out.write(sync)
    # atomic + concurrency-safe publication (shared helper): readers
    # racing a rewrite see either version whole, concurrent writers
    # never interleave
    from ._fsutil import atomic_write

    atomic_write(path, out.getvalue())


def is_ocf(path: str) -> bool:
    """True if the file starts with the Avro OCF magic."""
    try:
        with open(path, "rb") as fh:
            return fh.read(4) == MAGIC
    except OSError:
        return False
