"""Minimal flatbuffers table access layer for the Arrow format metadata.

The reference vendors 6k lines of generated accessors
(arrow/internal/flatbuf); we instead drive the flatbuffers python runtime
directly with the stable slot ids of the Arrow format spec (format/*.fbs).
Slot id n lives at vtable offset 4 + 2n.
"""
from __future__ import annotations

import flatbuffers
import flatbuffers.number_types as N
from flatbuffers import table as fbtable


def vt(slot: int) -> int:
    return 4 + 2 * slot


class Reader:
    """Cursor over one flatbuffers table."""

    __slots__ = ("tab",)

    def __init__(self, buf: bytes, pos: int):
        self.tab = fbtable.Table(buf, pos)

    @staticmethod
    def root(buf: bytes) -> "Reader":
        import struct
        (pos,) = struct.unpack_from("<I", buf, 0)
        return Reader(buf, pos)

    def _off(self, slot: int) -> int:
        return self.tab.Offset(vt(slot))

    def bool_(self, slot: int, default: bool = False) -> bool:
        o = self._off(slot)
        return bool(self.tab.Get(N.BoolFlags, o + self.tab.Pos)) if o else default

    def i8(self, slot: int, default: int = 0) -> int:
        o = self._off(slot)
        return self.tab.Get(N.Int8Flags, o + self.tab.Pos) if o else default

    def u8(self, slot: int, default: int = 0) -> int:
        o = self._off(slot)
        return self.tab.Get(N.Uint8Flags, o + self.tab.Pos) if o else default

    def i16(self, slot: int, default: int = 0) -> int:
        o = self._off(slot)
        return self.tab.Get(N.Int16Flags, o + self.tab.Pos) if o else default

    def i32(self, slot: int, default: int = 0) -> int:
        o = self._off(slot)
        return self.tab.Get(N.Int32Flags, o + self.tab.Pos) if o else default

    def i64(self, slot: int, default: int = 0) -> int:
        o = self._off(slot)
        return self.tab.Get(N.Int64Flags, o + self.tab.Pos) if o else default

    def string(self, slot: int):
        o = self._off(slot)
        if not o:
            return None
        s = self.tab.String(o + self.tab.Pos)
        return s.decode("utf-8") if isinstance(s, bytes) else s

    def table(self, slot: int):
        o = self._off(slot)
        if not o:
            return None
        pos = self.tab.Indirect(o + self.tab.Pos)
        return Reader(self.tab.Bytes, pos)

    def union(self, slot: int):
        """Union value table (type comes from the preceding _type slot)."""
        o = self._off(slot)
        if not o:
            return None
        from flatbuffers.table import Table
        t = Table(bytes(0), 0)
        self.tab.Union(t, o)
        return Reader(self.tab.Bytes, t.Pos)

    def vector_len(self, slot: int) -> int:
        o = self._off(slot)
        return self.tab.VectorLen(o) if o else 0

    def vector_table(self, slot: int, i: int) -> "Reader":
        o = self._off(slot)
        pos = self.tab.Vector(o) + i * 4
        pos = self.tab.Indirect(pos)
        return Reader(self.tab.Bytes, pos)

    def vector_i64(self, slot: int, i: int) -> int:
        o = self._off(slot)
        return self.tab.Get(N.Int64Flags, self.tab.Vector(o) + i * 8)

    def vector_i32(self, slot: int, i: int) -> int:
        o = self._off(slot)
        return self.tab.Get(N.Int32Flags, self.tab.Vector(o) + i * 4)

    def vector_struct_pos(self, slot: int, i: int, struct_size: int) -> int:
        o = self._off(slot)
        return self.tab.Vector(o) + i * struct_size
