"""Minimal SQLite database WRITER (public file format,
sqlite.org/fileformat2.html) — the sink half of kernel/sqlitefile.py.

Writes rowid-table B-trees: leaf pages (type 13), one interior level
(type 5) when rows span multiple leaves, and overflow chains for
payloads beyond the local maximum — the exact structures the reader
walks. sqlite_master lives on page 1 (as the format requires) and must
fit that single page (fine for the handful of tables a GeoPackage
needs; more tables raise). Output is readable by stdlib sqlite3 (pinned
in tests) — the parity target, not just our own reader.

Index B-trees: single-LEAF-page indexes (type 10) back the auto-
indexes a PRIMARY KEY / UNIQUE constraint implies — enough for the
GPKG registry tables (1-3 rows each) whose spec DDL promises them;
feature tables stay rowid-only. integrity_check verifies index<->table
consistency, so these are real, checked structures.

Limits (raised loudly, never silent): single-page sqlite_master,
single-leaf indexes, UTF-8 text only. Table B-trees grow interior
LEVELS bottom-up (unbounded depth).
"""

from __future__ import annotations

import struct

from .sqlitefile import SqliteError, SqliteFile

MAGIC = b"SQLite format 3\x00"


def _varint_enc(v: int) -> bytes:
    """SQLite varint (big-endian 7-bit groups; 9-byte form for values
    needing more than 56 bits — e.g. negative rowids as 2^64
    complements)."""
    v &= (1 << 64) - 1
    if v >> 56:
        rest = v >> 8
        parts = []
        for _ in range(8):
            parts.append(0x80 | (rest & 0x7F))
            rest >>= 7
        return bytes(parts[::-1] + [v & 0xFF])
    out = [v & 0x7F]
    v >>= 7
    while v:
        out.append(0x80 | (v & 0x7F))
        v >>= 7
    return bytes(out[::-1])


def _int_serial(v: int):
    """(serial type, bytes) for a signed integer, smallest width."""
    for st, w in ((1, 1), (2, 2), (3, 3), (4, 4), (5, 6), (6, 8)):
        lo, hi = -(1 << (8 * w - 1)), (1 << (8 * w - 1)) - 1
        if lo <= v <= hi:
            return st, v.to_bytes(w, "big", signed=True)
    raise SqliteError(f"integer out of 64-bit range: {v}")


def record_encode(values) -> bytes:
    """SQLite record format: header of serial types + body."""
    stypes, body = [], []
    for v in values:
        if v is None:
            stypes.append(0)
        elif isinstance(v, bool):
            st, b = _int_serial(int(v))
            stypes.append(st)
            body.append(b)
        elif isinstance(v, int):
            st, b = _int_serial(v)
            stypes.append(st)
            body.append(b)
        elif isinstance(v, float):
            stypes.append(7)
            body.append(struct.pack(">d", v))
        elif isinstance(v, (bytes, bytearray)):
            stypes.append(12 + 2 * len(v))
            body.append(bytes(v))
        elif isinstance(v, str):
            b = v.encode("utf-8")
            stypes.append(13 + 2 * len(b))
            body.append(b)
        else:
            raise SqliteError(f"unsupported value type {type(v)}")
    st_bytes = b"".join(_varint_enc(s) for s in stypes)
    # header size includes its own varint; sizes this small never need
    # a second adjustment round beyond one
    hsize = len(st_bytes) + 1
    if len(_varint_enc(hsize)) > 1:
        hsize = len(st_bytes) + len(_varint_enc(len(st_bytes) + 2))
    return _varint_enc(hsize) + st_bytes + b"".join(body)


def _index_sort_key(entry):
    """SQLite index key order: per-column type rank (NULL < numeric <
    text < blob), numerics by value, text/blob by byte order (BINARY
    collation), rowid last."""
    key, rowid = entry

    def k(v):
        if v is None:
            return (0, 0)
        if isinstance(v, bool):
            return (1, int(v))
        if isinstance(v, (int, float)):
            # keep the native type: Python compares int vs float
            # EXACTLY, while float(v) of an int >= 2^53 is lossy and
            # can mis-order large integer keys vs SQLite's collation
            return (1, v)
        if isinstance(v, str):
            return (2, v.encode("utf-8"))
        return (3, bytes(v))

    return tuple(k(v) for v in key) + ((1, rowid),)


class _Db:
    """Accumulates pages; page numbers are 1-based list indices."""

    def __init__(self, page_size: int):
        if page_size & (page_size - 1) or not 512 <= page_size <= 65536:
            raise SqliteError(f"invalid page size {page_size}")
        self.page_size = page_size
        self.usable = page_size  # reserved-per-page = 0
        self.pages: list = [None]  # page 1 reserved for sqlite_master

    def _alloc(self) -> int:
        self.pages.append(None)
        return len(self.pages)

    # -- cells -----------------------------------------------------------

    def _make_cell(self, rowid: int, payload: bytes) -> bytes:
        """Table-leaf cell; spills to overflow pages when the payload
        exceeds the local maximum (mirrors the reader's _payload)."""
        u = self.usable
        x = u - 35
        head = _varint_enc(len(payload)) + _varint_enc(rowid)
        if len(payload) <= x:
            return head + payload
        m = ((u - 12) * 32) // 255 - 23
        k = m + (len(payload) - m) % (u - 4)
        inline = k if k <= x else m
        rest = payload[inline:]
        chunks = [rest[i:i + (u - 4)] for i in range(0, len(rest), u - 4)]
        nums = [self._alloc() for _ in chunks]
        for i, (num, chunk) in enumerate(zip(nums, chunks)):
            nxt = nums[i + 1] if i + 1 < len(nums) else 0
            page = struct.pack(">I", nxt) + chunk
            self.pages[num - 1] = page.ljust(self.page_size, b"\x00")
        return head + payload[:inline] + struct.pack(">I", nums[0])

    # -- page assembly ---------------------------------------------------

    def _leaf_page(self, cells, first: bool = False,
                   ptype: int = 13) -> bytes:
        base = 100 if first else 0
        hdr_len = 8
        out = bytearray(self.page_size)
        content = self.page_size
        ptrs = []
        for c in cells:
            content -= len(c)
            out[content:content + len(c)] = c
            ptrs.append(content)
        struct.pack_into(">BHHHB", out, base, ptype, 0, len(cells),
                         content & 0xFFFF, 0)
        p = base + hdr_len
        for ptr in ptrs:
            struct.pack_into(">H", out, p, ptr)
            p += 2
        return bytes(out)

    def _interior_page(self, entries, right_most: int) -> bytes:
        """entries: [(child page, max rowid in child)]."""
        out = bytearray(self.page_size)
        content = self.page_size
        ptrs = []
        for child, key in entries:
            c = struct.pack(">I", child) + _varint_enc(key)
            content -= len(c)
            out[content:content + len(c)] = c
            ptrs.append(content)
        struct.pack_into(">BHHHBI", out, 0, 5, 0, len(entries),
                         content & 0xFFFF, 0, right_most)
        p = 12
        for ptr in ptrs:
            struct.pack_into(">H", out, p, ptr)
            p += 2
        return bytes(out)

    def _pack_leaves(self, cells, first_is_master: bool = False):
        """Greedy fill: [(cells per leaf, max rowid)]. Leaf capacity =
        usable - 8 header bytes; each cell costs len + 2 (pointer)."""
        cap0 = self.usable - 8 - (100 if first_is_master else 0)
        leaves, cur, used = [], [], 0
        for rowid, cell in cells:
            need = len(cell) + 2
            if cur and used + need > cap0:
                leaves.append((cur, cur[-1][0]))
                cur, used = [], 0
            if need > cap0:
                raise SqliteError(
                    f"cell of {len(cell)} bytes exceeds page capacity "
                    f"{cap0} (raise page_size)")
            cur.append((rowid, cell))
            used += need
        leaves.append((cur, cur[-1][0] if cur else 0))
        return leaves

    def add_table(self, rows_with_ids) -> int:
        """Write a table B-tree; returns its root page number.
        rows_with_ids: [(rowid, record payload bytes)] in ROWID order.

        Interior levels are built bottom-up until one root remains —
        the tree depth is unbounded (a single-interior-level writer
        caps out around 21k point features at page_size 4096; the
        partition-parallel gpkg sink routinely exceeds that per
        file)."""
        cells = [(rid, self._make_cell(rid, payload))
                 for rid, payload in rows_with_ids]
        leaves = self._pack_leaves(cells)
        children = []  # (page number, max rowid in subtree)
        for leaf_cells, mx in leaves:
            n = self._alloc()
            self.pages[n - 1] = self._leaf_page(
                [c for _, c in leaf_cells])
            children.append((n, mx))
        # conservative interior fan-out: each cell is 4-byte child +
        # varint key (<= 9) + 2-byte pointer slot = 15 bytes against
        # usable - 12 header bytes; one extra child rides the
        # right-most pointer
        fanout = (self.usable - 12) // 15 + 1
        while len(children) > 1:
            groups = [children[i:i + fanout]
                      for i in range(0, len(children), fanout)]
            # SQLite requires uniform B-tree depth: a lone trailing
            # child promoted directly into the parent level would sit
            # one level shallower than its siblings and integrity_check
            # rejects the file ("Child page depth differs") — recurs at
            # every child count == 1 mod fanout. Rebalance instead:
            # move one child from the penultimate group so the last two
            # groups are (fanout - 1, 2), then wrap EVERY group in an
            # interior page.
            if len(groups) > 1 and len(groups[-1]) == 1:
                groups[-1] = [groups[-2][-1]] + groups[-1]
                groups[-2] = groups[-2][:-1]
            parents = []
            for grp in groups:
                entries = grp[:-1]
                right, right_mx = grp[-1]
                n = self._alloc()
                self.pages[n - 1] = self._interior_page(entries, right)
                parents.append((n, right_mx))
            children = parents
        return children[0][0]

    def add_index(self, entries) -> int:
        """Write an index B-tree from [(key tuple, rowid)]; returns its
        root page number. A single LEAF page (type 10) — the capacity a
        registry-table auto-index needs (GPKG: 1-3 rows each); more
        raises loudly. Index cells carry (key columns..., rowid) as one
        record, sorted in BINARY-collation key order, which is what
        integrity_check re-derives from the table."""
        cells = []
        x = ((self.usable - 12) * 64) // 255 - 23
        for key, rowid in sorted(entries, key=_index_sort_key):
            payload = record_encode(tuple(key) + (rowid,))
            if len(payload) > x:
                raise SqliteError(
                    f"index payload of {len(payload)} bytes exceeds "
                    f"the local maximum {x} (auto-indexes are "
                    f"registry-sized by design)")
            cells.append(_varint_enc(len(payload)) + payload)
        if sum(len(c) + 2 for c in cells) > self.usable - 8:
            raise SqliteError(
                "auto-index exceeds one leaf page (this writer only "
                "emits single-leaf indexes for the registry tables)")
        n = self._alloc()
        self.pages[n - 1] = self._leaf_page(cells, ptype=10)
        return n

    def finish(self, master_cells, application_id: int = 0,
               user_version: int = 0) -> bytes:
        # capacity check BEFORE building: _leaf_page packs the type
        # byte at offset 100 unconditionally, so inspecting the built
        # page can never detect overflow — overfull master cells would
        # silently wrap the content offset and corrupt the file
        # (page 1 = 100 header + 8 page-header bytes; each cell costs
        # len + 2 pointer bytes)
        need = sum(len(c) + 2 for _, c in master_cells)
        if need > self.usable - 108:
            raise SqliteError(
                f"sqlite_master must fit page 1: {need} cell bytes > "
                f"{self.usable - 108} available (raise page_size or "
                f"reduce tables/DDL length)")
        page1 = bytearray(self._leaf_page(
            [c for _, c in master_cells], first=True))
        n_pages = len(self.pages)
        hdr = bytearray(100)
        hdr[0:16] = MAGIC
        struct.pack_into(">H", hdr, 16,
                         1 if self.page_size == 65536 else self.page_size)
        hdr[18] = hdr[19] = 1          # file format read/write version
        hdr[21], hdr[22], hdr[23] = 64, 32, 32
        struct.pack_into(">I", hdr, 24, 1)        # change counter
        struct.pack_into(">I", hdr, 28, n_pages)  # db size
        struct.pack_into(">I", hdr, 40, 1)        # schema cookie
        struct.pack_into(">I", hdr, 44, 1)        # schema format
        struct.pack_into(">I", hdr, 56, 1)        # UTF-8
        struct.pack_into(">i", hdr, 64, 0)
        struct.pack_into(">I", hdr, 68, application_id & 0xFFFFFFFF)
        struct.pack_into(">I", hdr, 60, user_version)
        struct.pack_into(">I", hdr, 92, 1)        # version-valid-for
        struct.pack_into(">I", hdr, 96, 3045000)  # sqlite version stamp
        page1[0:100] = hdr
        self.pages[0] = bytes(page1)
        return b"".join(self.pages)


def build_db(tables, page_size: int = 4096, application_id: int = 0,
             user_version: int = 0) -> bytes:
    """Build a database from [(name, create_sql, rows)] or
    [(name, create_sql, rows, index_col_lists)] where each row is a
    tuple in the DDL's column order. A column declared INTEGER
    PRIMARY KEY aliases the rowid (its value becomes the rowid and the
    record stores NULL there, the on-disk convention); otherwise
    rowids enumerate from 1.

    ``index_col_lists``: one auto-index B-tree per entry (a list of
    column names) — named sqlite_autoindex_<table>_<i> with NULL sql
    in sqlite_master, exactly what a PRIMARY KEY / UNIQUE constraint
    in the DDL implies (sqlite.org/fileformat2.html §index b-trees).
    The caller's DDL must carry the matching constraints or sqlite's
    schema parser will see indexes the schema never promised."""
    db = _Db(page_size)
    master = []
    for spec in tables:
        name, create_sql, rows = spec[0], spec[1], spec[2]
        index_specs = spec[3] if len(spec) > 3 else []
        names, ipk = SqliteFile.parse_columns(create_sql)
        ipk_idx = names.index(ipk) if ipk else None
        encoded = []
        originals = []  # (rowid, full row) for the index keys
        for i, row in enumerate(rows):
            if len(row) != len(names):
                raise SqliteError(
                    f"{name}: row has {len(row)} values, DDL declares "
                    f"{len(names)} columns")
            orig = tuple(row)
            if ipk_idx is not None:
                rid = row[ipk_idx]
                if not isinstance(rid, int):
                    raise SqliteError(
                        f"{name}: INTEGER PRIMARY KEY value must be an "
                        f"int, got {rid!r}")
                row = tuple(None if j == ipk_idx else v
                            for j, v in enumerate(row))
            else:
                rid = i + 1
            encoded.append((rid, record_encode(row)))
            originals.append((rid, orig))
        encoded.sort(key=lambda t: t[0])
        root = db.add_table(encoded)
        master.append(("table", name, name, root, create_sql))
        for i, cols in enumerate(index_specs):
            idxs = [names.index(c) for c in cols]
            entries = [(tuple(orig[j] for j in idxs), rid)
                       for rid, orig in originals]
            iroot = db.add_index(entries)
            master.append(("index", f"sqlite_autoindex_{name}_{i + 1}",
                           name, iroot, None))
    master_cells = []
    for i, (kind, name, tbl, root, sql) in enumerate(master):
        rec = record_encode((kind, name, tbl, root, sql))
        master_cells.append((i + 1, db._make_cell(i + 1, rec)))
    return db.finish(master_cells, application_id=application_id,
                     user_version=user_version)
