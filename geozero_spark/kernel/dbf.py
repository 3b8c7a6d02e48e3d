"""dBASE III (.dbf) attribute reader — the property side of the
shapefile feature stream (reference: geozero/src/shp/reader.rs
iter_features + property_processor.rs, which delegate to the ``dbase``
crate; semantics mirrored: numeric fields with decimals -> float,
without -> int, character fields trimmed, logical -> bool, deleted
records skipped)."""

from __future__ import annotations

import struct

FIELD_TERM = 0x0D


class DbfError(ValueError):
    pass


def read_fields(buf: bytes):
    """Header + field descriptors -> (n_records, header_size,
    record_size, [(name, type, length, decimals)])."""
    if len(buf) < 32:
        raise DbfError("truncated dbf header")
    n_rec = struct.unpack_from("<I", buf, 4)[0]
    hdr_size = struct.unpack_from("<H", buf, 8)[0]
    rec_size = struct.unpack_from("<H", buf, 10)[0]
    fields = []
    pos = 32
    while pos < len(buf) and buf[pos] != FIELD_TERM:
        if pos + 32 > len(buf):
            raise DbfError("truncated field descriptor")
        name = buf[pos:pos + 11].split(b"\0")[0].decode("ascii",
                                                        "replace")
        ftype = chr(buf[pos + 11])
        flen = buf[pos + 16]
        fdec = buf[pos + 17]
        fields.append((name, ftype, flen, fdec))
        pos += 32
    return n_rec, hdr_size, rec_size, fields


def _convert(ftype: str, fdec: int, raw: bytes):
    text = raw.decode("ascii", "replace").strip()
    if not text or set(text) == {"*"}:  # dbase null padding
        return None
    if ftype == "N":
        return float(text) if fdec > 0 else int(text)
    if ftype == "F":
        return float(text)
    if ftype == "L":
        return text in ("Y", "y", "T", "t")
    return text  # C (character), D (date) kept as trimmed text


def decode_records(buf: bytes) -> list[dict]:
    """Whole .dbf file -> one {field: value} dict per active record
    (deleted records — flag 0x2A — are skipped, dbase parity)."""
    n_rec, hdr_size, rec_size, fields = read_fields(buf)
    out = []
    pos = hdr_size
    for _ in range(n_rec):
        if pos + rec_size > len(buf):
            raise DbfError("truncated record")
        rec = buf[pos:pos + rec_size]
        pos += rec_size
        if rec[0] == 0x2A:  # deleted
            continue
        row = {}
        off = 1
        for name, ftype, flen, fdec in fields:
            row[name] = _convert(ftype, fdec, rec[off:off + flen])
            off += flen
        out.append(row)
    return out
