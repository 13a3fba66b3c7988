"""Stata .dta v118 writer (reference W1, src/stata/writer.rs:147-380).

Writes an Arrow table (or pandas DataFrame) to a modern XML-ish .dta:
header, map, dictionary, fixed-width records, GSO heap for long strings,
and value-label tables. Type mapping:

| input                | stored as                              |
|----------------------|----------------------------------------|
| int8 / bool          | byte                                   |
| int16                | int                                    |
| int32                | long                                   |
| int64                | long if in range else double           |
| float32 / float64    | float / double                         |
| string (<= 2045 B)   | str#  (max observed utf-8 width)       |
| string (> 2045 B)    | strL  (GSO heap)                       |
| date32               | long  %td (days since 1960)            |
| timestamp            | double %tc (ms since 1960)             |

Nulls become the Stata system-missing sentinels (ints: sentinel value,
floats: the 0x7f000000 / 0x7fe0000000000000 bit patterns, strings: "").
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

from .parser import DAY_MS, STATA_EPOCH_OFFSET_DAYS, STATA_EPOCH_OFFSET_MS  # noqa: F401

_MISS_I8 = 101
_MISS_I16 = 32741
_MISS_I32 = 2147483621
_MISS_F32 = np.uint32(0x7F000000)
_MISS_F64 = np.uint64(0x7FE0000000000000)
_MAX_STR = 2045

_TYPE_BYTE, _TYPE_INT, _TYPE_LONG, _TYPE_FLOAT, _TYPE_DOUBLE = 65530, 65529, 65528, 65527, 65526
_TYPE_STRL = 32768


def _pad(b: bytes, n: int) -> bytes:
    return b[:n] + b"\0" * (n - len(b))


class _Col:
    def __init__(self, name: str, arr: pa.ChunkedArray):
        self.name = name
        self.arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
        self.fmt = "%9.0g"
        self.label_name = ""
        t = self.arr.type
        n = len(self.arr)
        mask = np.zeros(n, dtype=bool)
        if self.arr.null_count:
            mask = ~np.asarray(self.arr.is_valid())
        self.strl_values: list[str] | None = None

        if pa.types.is_boolean(t) or pa.types.is_int8(t):
            self.typecode, self.width = _TYPE_BYTE, 1
            v = np.asarray(self.arr.cast(pa.int8()).fill_null(0), dtype=np.int8).copy()
            v[mask] = _MISS_I8
            self.data = v
        elif pa.types.is_int16(t):
            self.typecode, self.width = _TYPE_INT, 2
            v = np.asarray(self.arr.fill_null(0), dtype=np.int16).copy()
            v[mask] = _MISS_I16
            self.data = v
        elif pa.types.is_int32(t):
            self.typecode, self.width = _TYPE_LONG, 4
            v = np.asarray(self.arr.fill_null(0), dtype=np.int32).copy()
            v[mask] = _MISS_I32
            self.data = v
        elif pa.types.is_int64(t):
            v64 = np.asarray(self.arr.fill_null(0), dtype=np.int64)
            if ((v64 > 2147483620) | (v64 < -2147483647)).any():
                self.typecode, self.width = _TYPE_DOUBLE, 8
                v = v64.astype(np.float64)
                v.view(np.uint64)[mask] = _MISS_F64
                self.data = v
            else:
                self.typecode, self.width = _TYPE_LONG, 4
                v = v64.astype(np.int32)
                v[mask] = _MISS_I32
                self.data = v
        elif pa.types.is_float32(t):
            self.typecode, self.width = _TYPE_FLOAT, 4
            v = np.asarray(self.arr.fill_null(0), dtype=np.float32).copy()
            v.view(np.uint32)[mask] = _MISS_F32
            self.data = v
        elif pa.types.is_float64(t):
            self.typecode, self.width = _TYPE_DOUBLE, 8
            v = np.asarray(self.arr.fill_null(0), dtype=np.float64).copy()
            v.view(np.uint64)[mask] = _MISS_F64
            self.data = v
        elif pa.types.is_date32(t):
            self.typecode, self.width = _TYPE_LONG, 4
            self.fmt = "%td"
            v = np.asarray(self.arr.cast(pa.int32()).fill_null(0), dtype=np.int32).copy()
            v = v + STATA_EPOCH_OFFSET_DAYS
            v[mask] = _MISS_I32
            self.data = v
        elif pa.types.is_timestamp(t):
            self.typecode, self.width = _TYPE_DOUBLE, 8
            self.fmt = "%tc"
            ms = np.asarray(
                self.arr.cast(pa.timestamp("ms")).cast(pa.int64()).fill_null(0), dtype=np.int64
            )
            v = (ms + STATA_EPOCH_OFFSET_MS).astype(np.float64)
            v.view(np.uint64)[mask] = _MISS_F64
            self.data = v
        elif pa.types.is_string(t) or pa.types.is_large_string(t):
            vals = self.arr.to_pylist()
            enc = [(x or "").encode("utf-8") for x in vals]
            wmax = max((len(b) for b in enc), default=1)
            if wmax > _MAX_STR:
                self.typecode, self.width = _TYPE_STRL, 8
                self.fmt = "%9s"
                self.strl_values = [x or "" for x in vals]
                self.data = None
            else:
                w = max(1, wmax)
                self.typecode, self.width = w, w
                self.fmt = f"%{min(w, 99)}s"
                self.data = np.array([_pad(b, w) for b in enc], dtype=f"S{w}")
        else:
            raise ValueError(f"cannot write dtype {t} to .dta (column {name})")


def write_dta(
    table: pa.Table,
    path: str,
    value_labels: dict[str, dict[int, str]] | None = None,
    variable_labels: dict[str, str] | None = None,
    data_label: str = "",
) -> None:
    """Write an Arrow table as Stata .dta version 118."""
    if hasattr(table, "to_arrow"):  # pandas-free duck-typing for Spark DF
        table = table.to_arrow()
    elif not isinstance(table, pa.Table):
        table = pa.Table.from_pandas(table, preserve_index=False)

    cols = [_Col(n, table.column(i)) for i, n in enumerate(table.column_names)]
    value_labels = value_labels or {}
    variable_labels = variable_labels or {}
    for c in cols:
        if value_labels.get(c.name):
            c.label_name = c.name  # label table named after the column

    nvar, nobs = len(cols), table.num_rows
    rec_len = sum(c.width for c in cols)

    # ---- records block (vectorized via one structured array)
    dt = np.dtype(
        {
            "names": [f"f{i}" for i in range(nvar)],
            "formats": [_np_fmt(c) for c in cols],
            "offsets": np.cumsum([0] + [c.width for c in cols[:-1]]).tolist(),
            "itemsize": rec_len,
        }
    )
    rec = np.zeros(nobs, dtype=dt)
    strl_heap: list[bytes] = []
    for i, c in enumerate(cols):
        if c.typecode == _TYPE_STRL:
            refs = np.zeros(nobs, dtype="<u8")
            gso_entries = []
            for row, s in enumerate(c.strl_values):
                if not s:
                    refs[row] = 0
                    continue
                v, o = i + 1, row + 1
                refs[row] = (v & 0xFFFF) | ((o & 0xFFFF_FFFF_FFFF) << 16)
                payload = s.encode("utf-8") + b"\0"
                gso_entries.append(
                    b"GSO"
                    + struct.pack("<IQBI", v, o, 0x82, len(payload))
                    + payload
                )
            strl_heap.extend(gso_entries)
            rec[f"f{i}"] = refs.view("V8")
        else:
            rec[f"f{i}"] = c.data
    data_block = rec.tobytes()

    # ---- assemble sections
    out = bytearray()
    positions = {}

    def tag_pos(name):
        positions[name] = len(out)

    enc_label = data_label.encode("utf-8")[:320]
    out += b"<stata_dta><header><release>118</release><byteorder>LSF</byteorder>"
    out += b"<K>" + struct.pack("<H", nvar) + b"</K>"
    out += b"<N>" + struct.pack("<Q", nobs) + b"</N>"
    out += b"<label>" + struct.pack("<H", len(enc_label)) + enc_label + b"</label>"
    out += b"<timestamp>" + bytes([17]) + _pad(b"01 Jan 2026 00:00", 17) + b"</timestamp>"
    out += b"</header>"

    tag_pos("map")
    map_at = len(out)
    out += b"<map>" + b"\0" * (14 * 8) + b"</map>"

    tag_pos("types")
    out += b"<variable_types>"
    for c in cols:
        out += struct.pack("<H", c.typecode)
    out += b"</variable_types>"

    tag_pos("varnames")
    out += b"<varnames>"
    for c in cols:
        out += _pad(c.name.encode("utf-8"), 129)
    out += b"</varnames>"

    tag_pos("sortlist")
    out += b"<sortlist>" + b"\0" * (2 * (nvar + 1)) + b"</sortlist>"

    tag_pos("formats")
    out += b"<formats>"
    for c in cols:
        out += _pad(c.fmt.encode(), 57)
    out += b"</formats>"

    tag_pos("value_label_names")
    out += b"<value_label_names>"
    for c in cols:
        out += _pad(c.label_name.encode("utf-8"), 129)
    out += b"</value_label_names>"

    tag_pos("variable_labels")
    out += b"<variable_labels>"
    for c in cols:
        out += _pad(variable_labels.get(c.name, "").encode("utf-8"), 321)
    out += b"</variable_labels>"

    tag_pos("characteristics")
    out += b"<characteristics></characteristics>"

    tag_pos("data")
    out += b"<data>" + data_block + b"</data>"

    tag_pos("strls")
    out += b"<strls>" + b"".join(strl_heap) + b"</strls>"

    tag_pos("value_labels")
    out += b"<value_labels>"
    for c in cols:
        if not c.label_name:
            continue
        mapping = value_labels[c.name]
        keys = sorted(mapping)
        txt = bytearray()
        offs = []
        for k in keys:
            offs.append(len(txt))
            txt += mapping[k].encode("utf-8") + b"\0"
        n = len(keys)
        table_bytes = struct.pack("<II", n, len(txt))
        table_bytes += b"".join(struct.pack("<I", o) for o in offs)
        table_bytes += b"".join(struct.pack("<i", k) for k in keys)
        table_bytes += bytes(txt)
        out += b"<lbl>" + struct.pack("<I", len(table_bytes))
        out += _pad(c.label_name.encode("utf-8"), 129) + b"\0\0\0"
        out += table_bytes + b"</lbl>"
    out += b"</value_labels>"

    tag_pos("end")
    out += b"</stata_dta>"
    eof = len(out)

    # ---- back-patch the map (offsets of section tags)
    m = [
        0,
        positions["map"],
        positions["types"],
        positions["varnames"],
        positions["sortlist"],
        positions["formats"],
        positions["value_label_names"],
        positions["variable_labels"],
        positions["characteristics"],
        positions["data"],
        positions["strls"],
        positions["value_labels"],
        positions["end"],
        eof,
    ]
    out[map_at + 5 : map_at + 5 + 14 * 8] = struct.pack("<14Q", *m)

    with open(path, "wb") as f:
        f.write(out)


def _np_fmt(c: _Col) -> str:
    if c.typecode == _TYPE_BYTE:
        return "<i1"
    if c.typecode == _TYPE_INT:
        return "<i2"
    if c.typecode == _TYPE_LONG:
        return "<i4"
    if c.typecode == _TYPE_FLOAT:
        return "<f4"
    if c.typecode == _TYPE_DOUBLE:
        return "<f8"
    if c.typecode == _TYPE_STRL:
        return "V8"
    return f"S{c.width}"
