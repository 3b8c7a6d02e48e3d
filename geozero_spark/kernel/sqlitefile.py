"""Minimal read-only SQLite file walker — the GPKG file-level path.

The reference reads GeoPackages through a live SQLx connection
(geozero/tests/geopackage.rs:4-99); this sandbox has no DB server, so
the fair re-expression is FILE-level: walk the SQLite B-trees straight
out of the .gpkg bytes and feed the blobs to the existing gpkg-dialect
WKB decode (kernel/wkb.py). Implements exactly the read subset the
format needs (publicly documented at sqlite.org/fileformat2.html):

- database header (page size, reserved bytes),
- table B-trees: interior (type 5) / leaf (type 13) pages, cell
  pointer arrays, overflow-page chains,
- the record serial-type format (NULL/ints/float/0/1/blob/text),
- schema discovery via the sqlite_master table rooted at page 1.

Not implemented (not needed to read a GPKG): indexes, WITHOUT ROWID
tables, freelists, WAL, writing. tests/test_gpkg.py cross-checks every
decoded row against Python's stdlib sqlite3 on the same file.
"""

from __future__ import annotations

import re as _re
import struct

HEADER_MAGIC = b"SQLite format 3\x00"


class SqliteError(ValueError):
    pass


def _varint(buf: bytes, p: int):
    """SQLite big-endian 7-bit varint; 9th byte uses all 8 bits."""
    v = 0
    for i in range(8):
        b = buf[p + i]
        v = (v << 7) | (b & 0x7F)
        if not b & 0x80:
            return v, p + i + 1
    v = (v << 8) | buf[p + 8]
    return v, p + 9


def _twos(v: int, bits: int) -> int:
    return v - (1 << bits) if v >= (1 << (bits - 1)) else v


class SqliteFile:
    def __init__(self, buf: bytes):
        if buf[:16] != HEADER_MAGIC:
            raise SqliteError("not a SQLite database (bad magic)")
        ps = struct.unpack_from(">H", buf, 16)[0]
        self.page_size = 65536 if ps == 1 else ps
        self.reserved = buf[20]
        self.usable = self.page_size - self.reserved
        if buf[56:60] != b"\x00\x00\x00\x01":
            # text encoding 1 = UTF-8 (GPKG requirement)
            raise SqliteError("only UTF-8 databases are supported")
        self.buf = buf

    # -- page / cell walking -------------------------------------------

    def _page(self, number: int) -> int:
        """Byte offset of page ``number`` (1-based)."""
        return (number - 1) * self.page_size

    def _iter_table_cells(self, page_no: int):
        """Yield (payload bytes, rowid) for every row of the table
        B-tree rooted at ``page_no``, in rowid order."""
        buf = self.buf
        base = self._page(page_no)
        hdr = base + (100 if page_no == 1 else 0)
        ptype = buf[hdr]
        ncells = struct.unpack_from(">H", buf, hdr + 3)[0]
        if ptype == 5:      # table interior
            ptr_array = hdr + 12
            for i in range(ncells):
                cp = base + struct.unpack_from(
                    ">H", buf, ptr_array + 2 * i)[0]
                left = struct.unpack_from(">I", buf, cp)[0]
                yield from self._iter_table_cells(left)
            right = struct.unpack_from(">I", buf, hdr + 8)[0]
            yield from self._iter_table_cells(right)
            return
        if ptype != 13:     # table leaf
            raise SqliteError(f"unexpected page type {ptype} "
                              f"on page {page_no}")
        ptr_array = hdr + 8
        for i in range(ncells):
            cp = base + struct.unpack_from(
                ">H", buf, ptr_array + 2 * i)[0]
            plen, p = _varint(buf, cp)
            rowid, p = _varint(buf, p)
            # rowids are SIGNED 64-bit (AUTOINCREMENT tables can hold
            # sentinel negatives like srs_id -1)
            yield self._payload(p, plen), _twos(rowid & ((1 << 64) - 1),
                                                64)

    def _payload(self, p: int, plen: int) -> bytes:
        """Inline payload + overflow chain (fileformat2.html §1.6)."""
        u = self.usable
        x = u - 35
        if plen <= x:
            return self.buf[p:p + plen]
        m = ((u - 12) * 32) // 255 - 23
        k = m + (plen - m) % (u - 4)
        inline = k if k <= x else m
        parts = [self.buf[p:p + inline]]
        nxt = struct.unpack_from(">I", self.buf, p + inline)[0]
        need = plen - inline
        while need > 0:
            if nxt == 0:
                raise SqliteError("broken overflow chain")
            off = self._page(nxt)
            nxt = struct.unpack_from(">I", self.buf, off)[0]
            take = min(need, u - 4)
            parts.append(self.buf[off + 4:off + 4 + take])
            need -= take
        return b"".join(parts)

    # -- record decode --------------------------------------------------

    @staticmethod
    def _record(payload: bytes):
        hsize, p = _varint(payload, 0)
        stypes = []
        while p < hsize:
            st, p = _varint(payload, p)
            stypes.append(st)
        vals = []
        for st in stypes:
            if st == 0:
                vals.append(None)
            elif st in (1, 2, 3, 4, 5, 6):
                w = {1: 1, 2: 2, 3: 3, 4: 4, 5: 6, 6: 8}[st]
                v = int.from_bytes(payload[p:p + w], "big")
                vals.append(_twos(v, w * 8))
                p += w
            elif st == 7:
                vals.append(struct.unpack_from(">d", payload, p)[0])
                p += 8
            elif st == 8:
                vals.append(0)
            elif st == 9:
                vals.append(1)
            elif st >= 12 and st % 2 == 0:
                n = (st - 12) // 2
                vals.append(payload[p:p + n])
                p += n
            elif st >= 13:
                n = (st - 13) // 2
                vals.append(payload[p:p + n].decode("utf-8"))
                p += n
            else:
                raise SqliteError(f"unsupported serial type {st}")
        return vals

    # -- schema ----------------------------------------------------------

    def tables(self) -> dict:
        """{table name: (rootpage, create sql)} from sqlite_master —
        real tables only (virtual tables carry rootpage 0)."""
        out = {}
        for payload, _rowid in self._iter_table_cells(1):
            typ, name, _tbl, root, sql = self._record(payload)[:5]
            if typ == "table" and root:
                out[name] = (root, sql or "")
        return out

    @staticmethod
    def _split_defs(create_sql: str) -> list[str]:
        """Top-level comma-split of the CREATE TABLE parenthesis —
        quote-aware, so commas/parens inside quoted identifiers or
        string defaults don't shift the column list."""
        s = create_sql[create_sql.index("(") + 1:]
        depth, cur, defs = 0, [], []
        close = None  # active quote's closing char
        for ch in s:
            if close is not None:
                cur.append(ch)
                if ch == close:
                    close = None
                continue
            if ch in ('"', "'", "`"):
                close = ch
            elif ch == "[":
                close = "]"
            elif ch == "(":
                depth += 1
            elif ch == ")":
                if depth == 0:
                    defs.append("".join(cur))
                    break
                depth -= 1
            elif ch == "," and depth == 0:
                defs.append("".join(cur))
                cur = []
                continue
            cur.append(ch)
        return defs

    @staticmethod
    def _lead_ident(d: str) -> tuple[str, str, bool]:
        """Leading identifier of a column def -> (name, rest, quoted).
        Handles "..."/'...'/`...`/[...] quoting incl. doubled-quote
        escapes, so names with spaces parse whole."""
        d = d.lstrip()
        if not d:
            return "", "", False
        closers = {'"': '"', "`": "`", "'": "'", "[": "]"}
        ch = d[0]
        if ch in closers:
            close = closers[ch]
            i, out = 1, []
            while i < len(d):
                if d[i] == close:
                    if (close != "]" and i + 1 < len(d)
                            and d[i + 1] == close):
                        out.append(close)
                        i += 2
                        continue
                    return "".join(out), d[i + 1:], True
                out.append(d[i])
                i += 1
            return "".join(out), "", True
        m = _re.match(r"[^\s(]+", d)
        return m.group(0), d[m.end():], False

    _CONSTRAINT_WORDS = ("CONSTRAINT", "PRIMARY", "UNIQUE", "CHECK",
                         "FOREIGN")

    @classmethod
    def parse_columns(cls, create_sql: str):
        """(column names, rowid-alias column or None). A column
        aliases the rowid when its declared type is INTEGER and it is
        the single PRIMARY KEY — inline or via a table-level
        PRIMARY KEY(col) constraint (sqlite.org/lang_createtable.html
        §rowid; covers both DDL styles in GPKG files)."""
        names, types, ipk = [], {}, None
        pk_cols = None
        for d in cls._split_defs(create_sql):
            head, rest, quoted = cls._lead_ident(d)
            if not head:
                continue
            up = d.upper()
            # a quoted leading identifier is always a column name —
            # only bare words can start a table-level constraint
            if not quoted and head.upper() in cls._CONSTRAINT_WORDS:
                if "PRIMARY KEY" in up and "(" in d:
                    inner = d[d.index("(") + 1:d.rindex(")")]
                    pk_cols = [c.strip().strip('"`[]')
                               for c in inner.split(",")]
                continue
            names.append(head)
            rtoks = rest.split()
            typ = rtoks[0].strip('"`[]').upper() if rtoks else ""
            types[head] = typ
            if "PRIMARY KEY" in up and typ == "INTEGER":
                ipk = head
        if ipk is None and pk_cols and len(pk_cols) == 1 \
                and types.get(pk_cols[0]) == "INTEGER":
            ipk = pk_cols[0]
        return names, ipk

    def rows(self, table: str):
        """Yield dict rows of ``table`` (the INTEGER-PRIMARY-KEY rowid
        alias materializes from the rowid, per the record format's
        NULL placeholder convention)."""
        tabs = self.tables()
        if table not in tabs:
            raise SqliteError(f"no such table {table!r}")
        root, sql = tabs[table]
        names, ipk = self.parse_columns(sql)
        for payload, rowid in self._iter_table_cells(root):
            vals = self._record(payload)
            row = {}
            for i, n in enumerate(names):
                v = vals[i] if i < len(vals) else None
                if v is None and n == ipk:
                    v = rowid
                row[n] = v
            yield row
