"""Atomic file publication — the one shared implementation of the
tmp + rename idiom every chain/metadata writer uses (review r12: the
hand-expanded copies had a fixed tmp name, which lets two concurrent
writers interleave into the SAME temp file and publish a torn
byte-mixture — ``_write_meta``'s uuid suffix exists precisely to
prevent that)."""

from __future__ import annotations

import os
import uuid


def atomic_write(path: str, data: bytes | str, fsync: bool = True) -> None:
    """Write ``data`` to a PRIVATE uuid-suffixed temp file, then
    ``os.replace`` onto ``path``: concurrent writers each own their
    tmp (last replace wins whole — never interleaved), readers see
    either version whole, and a crash leaves only ``*.tmp-*`` debris
    (collected by ``remove_orphan_files``). ``fsync`` flushes file
    data before the rename so the published content survives power
    loss; the directory entry itself may still lag (full durability
    would fsync the directory too — the same tradeoff the table's
    ``_write_meta`` takes)."""
    mode = "wb" if isinstance(data, (bytes, bytearray)) else "w"
    tmp = f"{path}.tmp-{uuid.uuid4().hex}"
    with open(tmp, mode) as fh:
        fh.write(data)
        if fsync:
            fh.flush()
            os.fsync(fh.fileno())
    os.replace(tmp, path)
