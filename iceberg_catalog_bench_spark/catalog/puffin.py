"""Puffin statistics files (Iceberg's Puffin spec) — from scratch.

Iceberg persists table/column statistics in sidecar "Puffin" files
referenced from ``metadata.json``'s ``statistics`` list; the standard
blob type for column NDV is ``apache-datasketches-theta-v1`` — a
serialized DataSketches compact theta sketch. The reference's interop
goal (one engine reads what another wrote,
``ICEBERG-Interoperability-Test-Spec.md:4-14``) extends to statistics:
a conforming reader should recover the NDV this repo's ``ANALYZE``
computed instead of re-deriving it with a table scan.

File layout (Puffin spec, format version 1)::

    Magic  blob_1 ... blob_n  Magic FooterPayload FooterPayloadSize Flags Magic

- ``Magic`` = ``0x50 0x46 0x41 0x31`` ("PFA1")
- ``FooterPayload`` = UTF-8 JSON ``{"blobs": [...], "properties": {...}}``
  (uncompressed here — flag bit 0 clear)
- ``FooterPayloadSize`` = 4-byte little-endian int
- ``Flags`` = 4 bytes (bit 0 of byte 0: footer payload LZ4-compressed)

Blob metadata carries ``type``, ``fields`` (field ids), ``snapshot-id``,
``sequence-number``, ``offset``, ``length`` and free-form ``properties``
(the de-facto ``ndv`` property Iceberg writers include).

Theta sketches (DataSketches CompactSketch, serial version 3, the
serialization ``apache-datasketches-theta-v1`` names): 8-byte preamble
longs little-endian —

    byte 0: preamble longs (1 empty / 2 exact / 3 estimation)
    byte 1: serial version (3)      byte 2: family id (3 = COMPACT)
    byte 3-4: lgNomLongs/lgArrLongs (unused by compact readers)
    byte 5: flags (READ_ONLY | EMPTY? | COMPACT | ORDERED)
    byte 6-7: seed hash (murmur3 x64-128 of the update seed, low 16 bits)

then (preamble ≥ 2) a 4-byte retained-entries count + 4 pad bytes, then
(preamble = 3) the 8-byte theta long, then the retained hash values as
sorted uint64 longs < theta. ``getEstimate`` = retained / (theta/2^63).

``ANALYZE`` stores an HLL-derived NDV integer, not retained hashes, so
:func:`theta_sketch_bytes` synthesizes a VALID estimation-mode sketch
whose estimate rounds back to that NDV: retained = min(ndv, 4096)
evenly spaced values below theta ≈ retained/ndv (the integer theta is
probed so the reader's double arithmetic recovers the NDV exactly).
Exactness is information-bounded by theta's 63-bit granularity: exact
for NDV up to ≈ sqrt(retained·2^62) ≈ 1.4e11; beyond, the error is
bounded by the granularity itself (adjacent thetas are ndv²/(R·2^63)
apart) and adoption reconciles against the blob's ``ndv`` property.
Unions behave like a KMV union over deterministic values
(statistically conservative, never crashing). Small NDVs (≤ 4096)
emit exact-mode sketches — estimate exact by construction.
"""

from __future__ import annotations

import json
import struct

MAGIC = b"PFA1"

# --- murmur3 x64-128 (public algorithm; DataSketches seeds with it) --

_MASK = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK


def _fmix(k: int) -> int:
    k ^= k >> 33
    k = (k * 0xFF51AFD7ED558CCD) & _MASK
    k ^= k >> 33
    k = (k * 0xC4CEB9FE1A85EC53) & _MASK
    k ^= k >> 33
    return k


def murmur3_x64_128(data: bytes, seed: int = 0) -> tuple[int, int]:
    """MurmurHash3 x64 128-bit (little-endian block reads), the hash
    DataSketches' ``computeSeedHash`` and update path use."""
    c1, c2 = 0x87C37B91114253D5, 0x4CF5AD432745937F
    h1 = h2 = seed & _MASK
    n = len(data)
    nblocks = n // 16
    for i in range(nblocks):
        k1, k2 = struct.unpack_from("<qq", data, i * 16)
        k1 &= _MASK
        k2 &= _MASK
        k1 = (_rotl((k1 * c1) & _MASK, 31) * c2) & _MASK
        h1 ^= k1
        h1 = ((_rotl(h1, 27) + h2) * 5 + 0x52DCE729) & _MASK
        k2 = (_rotl((k2 * c2) & _MASK, 33) * c1) & _MASK
        h2 ^= k2
        h2 = ((_rotl(h2, 31) + h1) * 5 + 0x38495AB5) & _MASK
    tail = data[nblocks * 16:]
    k1 = k2 = 0
    if len(tail) > 8:
        k2 = int.from_bytes(tail[8:].ljust(8, b"\0"), "little")
        k2 = (_rotl((k2 * c2) & _MASK, 33) * c1) & _MASK
        h2 ^= k2
    if tail:
        k1 = int.from_bytes(tail[:8].ljust(8, b"\0"), "little")
        k1 = (_rotl((k1 * c1) & _MASK, 31) * c2) & _MASK
        h1 ^= k1
    h1 ^= n
    h2 ^= n
    h1 = (h1 + h2) & _MASK
    h2 = (h2 + h1) & _MASK
    h1 = _fmix(h1)
    h2 = _fmix(h2)
    h1 = (h1 + h2) & _MASK
    h2 = (h2 + h1) & _MASK
    return h1, h2


_DEFAULT_UPDATE_SEED = 9001


def _seed_hash(seed: int = _DEFAULT_UPDATE_SEED) -> int:
    """DataSketches Util.computeSeedHash: low 16 bits of
    murmur3_x64_128(seed-as-le-long, seed=seed); must be nonzero."""
    h1, _ = murmur3_x64_128(struct.pack("<q", seed), seed)
    sh = h1 & 0xFFFF
    if sh == 0:
        raise ValueError(f"seed {seed} hashes to 0; pick another seed")
    return sh


_FLAG_READ_ONLY = 2
_FLAG_EMPTY = 4
_FLAG_COMPACT = 8
_FLAG_ORDERED = 16

_THETA_MAX = 1 << 63  # Long.MAX_VALUE as the "theta = 1.0" sentinel
_MAX_RETAINED = 4096


def theta_sketch_bytes(ndv: int) -> bytes:
    """A valid ordered compact theta sketch whose estimate is exactly
    ``ndv`` (see module docstring for the synthesis rule)."""
    sh = _seed_hash()
    flags = _FLAG_READ_ONLY | _FLAG_COMPACT | _FLAG_ORDERED
    if ndv <= 0:
        header = struct.pack("<BBBBBBH", 1, 3, 3, 0, 0,
                             flags | _FLAG_EMPTY, sh)
        return header
    if ndv <= _MAX_RETAINED:
        # exact mode (theta = 1.0 implied): retained = ndv distinct
        # sorted values anywhere in [1, 2^63)
        retained = ndv
        step = _THETA_MAX // (retained + 1)
        entries = [(i + 1) * step for i in range(retained)]
        out = [struct.pack("<BBBBBBH", 2, 3, 3, 0, 0, flags, sh),
               struct.pack("<iI", retained, 0)]
        out += [struct.pack("<Q", e) for e in entries]
        return b"".join(out)
    # estimation mode: theta chosen so the READER's double arithmetic
    # retained/(theta/2^63) rounds back to ndv — probe the integer
    # neighbors of the exact ratio (float truncation here used to
    # drift the estimate by a few counts above ~1.4e11, review r12).
    # Exactness is information-bounded by theta's granularity at
    # ndv ≈ sqrt(retained·2^62) ≈ 1.4e11; past that the error is at
    # most the granularity ndv²/(R·2^63) and adoption reconciles
    # against the blob's ndv property (see iceberg_export adoption).
    retained = _MAX_RETAINED
    base = (_THETA_MAX * retained) // ndv  # exact integer arithmetic
    theta_long = max(1, base)
    for cand in (base, base + 1, base - 1):
        if 0 < cand <= _THETA_MAX and \
                round(retained / (cand / _THETA_MAX)) == ndv:
            theta_long = cand
            break
    step = theta_long // (retained + 1)
    if step == 0:
        raise ValueError(f"ndv {ndv} too large to synthesize")
    entries = [(i + 1) * step for i in range(retained)]
    out = [struct.pack("<BBBBBBH", 3, 3, 3, 0, 0, flags, sh),
           struct.pack("<iI", retained, 0),
           struct.pack("<Q", theta_long)]
    out += [struct.pack("<Q", e) for e in entries]
    return b"".join(out)


def theta_estimate(blob: bytes) -> float:
    """Estimate of a serialized compact theta sketch (any conforming
    writer's): retained / (theta / 2^63)."""
    if len(blob) < 8:
        raise ValueError("truncated theta sketch")
    pre, ser_ver, family, _lgn, _lga, flags, _sh = struct.unpack_from(
        "<BBBBBBH", blob, 0)
    if ser_ver != 3 or family != 3:
        raise ValueError(
            f"not a compact theta sketch (serVer={ser_ver}, family={family})")
    if pre == 1 or flags & _FLAG_EMPTY:
        return 0.0
    retained = struct.unpack_from("<i", blob, 8)[0]
    theta_long = _THETA_MAX if pre == 2 else struct.unpack_from(
        "<q", blob, 16)[0]
    if theta_long <= 0:
        raise ValueError(f"invalid theta {theta_long}")
    return retained / (theta_long / _THETA_MAX)


# --- the Puffin container -------------------------------------------


def write_puffin(path: str, blobs: list[tuple[dict, bytes]],
                 properties: dict | None = None) -> dict:
    """Write a Puffin file. ``blobs`` = [(metadata_without_offsets,
    payload_bytes)]; offsets/lengths are filled in here. Returns
    ``{"file-size-in-bytes", "file-footer-size-in-bytes"}`` for the
    metadata.json statistics entry."""
    import io

    from ._fsutil import atomic_write

    metas = []
    # built in memory, published atomically (shared uuid-tmp helper):
    # a re-export overwriting the same-named statistics file must
    # never expose a truncated Puffin container, and concurrent
    # exporters must never interleave
    fh = io.BytesIO()
    fh.write(MAGIC)
    for meta, payload in blobs:
        m = dict(meta)
        m["offset"] = fh.tell()
        m["length"] = len(payload)
        fh.write(payload)
        metas.append(m)
    payload_json = json.dumps(
        {"blobs": metas, "properties": dict(properties or {})},
        separators=(",", ":")).encode("utf-8")
    footer_start = fh.tell()
    fh.write(MAGIC)
    fh.write(payload_json)
    fh.write(struct.pack("<i", len(payload_json)))
    fh.write(struct.pack("<i", 0))  # flags: payload uncompressed
    fh.write(MAGIC)
    size = fh.tell()
    atomic_write(path, fh.getvalue())
    return {"file-size-in-bytes": size,
            "file-footer-size-in-bytes": size - footer_start}


def read_puffin(path: str) -> tuple[dict, list[tuple[dict, bytes]]]:
    """Read a Puffin file → (footer payload dict, [(blob metadata,
    payload bytes)])."""
    with open(path, "rb") as fh:
        data = fh.read()
    if data[:4] != MAGIC or data[-4:] != MAGIC:
        raise ValueError(f"{path!r} is not a Puffin file (bad magic)")
    flags = struct.unpack_from("<i", data, len(data) - 8)[0]
    if flags & 1:
        raise ValueError("compressed Puffin footers not supported")
    psize = struct.unpack_from("<i", data, len(data) - 12)[0]
    pstart = len(data) - 12 - psize
    if data[pstart - 4:pstart] != MAGIC:
        raise ValueError(f"{path!r}: footer payload magic mismatch")
    footer = json.loads(data[pstart:pstart + psize].decode("utf-8"))
    blobs = []
    for m in footer.get("blobs", []):
        off, ln = m["offset"], m["length"]
        blobs.append((m, data[off:off + ln]))
    return footer, blobs
