"""SPSS .sav writer (reference W2, src/spss/writer.rs).

Writes uncompressed (compression=0) .sav — deliberately: uncompressed
files are row-splittable, so a file written by this engine reads back
partition-parallel (reference limitation avoided; its RLE output forces
single-threaded reads, src/spss/polars_output.rs:403-405).

Limits mirror the reference (README.md:304-311): fixed-width strings up
to 255 bytes, numeric value labels, variable labels; long names go in a
subtype-13 record with auto short names; encoding is always UTF-8
(subtype 20).

Type mapping: ints/floats/bool -> numeric double; date32 -> numeric with
DATE format (code 20), timestamp -> DATETIME (22), string -> fixed width.
Nulls -> system missing (0xFFEFFFFFFFFFFFFF) / blank strings.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

from .parser import SAV_MISSING, SPSS_SEC_SHIFT

_MAX_STR = 255


def _short_names(names: list[str]) -> list[str]:
    used = set()
    out = []
    for i, n in enumerate(names):
        base = "".join(c for c in n.upper() if c.isalnum() or c in "@#$_")[:8] or f"V{i}"
        if base[0].isdigit():
            base = ("V" + base)[:8]
        cand, k = base, 1
        while cand in used:
            suffix = str(k)
            cand = base[: 8 - len(suffix)] + suffix
            k += 1
        used.add(cand)
        out.append(cand)
    return out


class _Col:
    def __init__(self, name: str, short: str, arr):
        self.name = name
        self.short = short
        self.arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
        t = self.arr.type
        n = len(self.arr)
        self.null_mask = ~np.asarray(self.arr.is_valid()) if self.arr.null_count else np.zeros(n, bool)
        self.fmt_code = 5  # F (plain numeric)
        if pa.types.is_string(t) or pa.types.is_large_string(t):
            vals = [(x or "").encode("utf-8") for x in self.arr.to_pylist()]
            w = min(max((len(b) for b in vals), default=1), _MAX_STR)
            w = max(w, 1)
            if any(len(b) > _MAX_STR for b in vals):
                raise ValueError(
                    f"column {name}: string values over {_MAX_STR} bytes are not supported "
                    "by the .sav writer (reference limit)"
                )
            self.is_str = True
            self.string_len = w
            self.width = (w + 7) // 8
            pad_w = self.width * 8
            self.data = np.array([b.ljust(pad_w, b" ") for b in vals], dtype=f"S{pad_w}")
            self.fmt_code = 1  # A
            return
        self.is_str = False
        self.string_len = 0
        self.width = 1
        if pa.types.is_date32(t):
            days = np.asarray(self.arr.cast(pa.int32()).fill_null(0), dtype=np.int64)
            v = (days * 86400 + SPSS_SEC_SHIFT).astype(np.float64)
            self.fmt_code = 20  # DATE
        elif pa.types.is_timestamp(t):
            us = np.asarray(
                self.arr.cast(pa.timestamp("us")).cast(pa.int64()).fill_null(0), dtype=np.int64
            )
            v = (us // 1_000_000 + SPSS_SEC_SHIFT).astype(np.float64)
            self.fmt_code = 22  # DATETIME
        elif pa.types.is_boolean(t):
            v = np.asarray(self.arr.cast(pa.int8()).fill_null(0), dtype=np.float64)
        else:
            v = np.asarray(self.arr.cast(pa.float64()).fill_null(0), dtype=np.float64)
        v = v.copy()
        v.view(np.uint64)[self.null_mask] = SAV_MISSING
        self.data = v


def write_sav(
    table: pa.Table,
    path: str,
    value_labels: dict[str, dict[float, str]] | None = None,
    variable_labels: dict[str, str] | None = None,
    data_label: str = "",
    user_missing: dict[str, list[float]] | None = None,
    endian: str = "<",
) -> None:
    """``user_missing``: up to 3 discrete user-declared missing doubles
    per numeric column (reference W2 / F3 fixture semantics).
    ``endian``: "<" (default) or ">" — big-endian output exists mainly to
    exercise the reader's byte-order handling."""
    if hasattr(table, "to_arrow"):
        table = table.to_arrow()
    elif not isinstance(table, pa.Table):
        table = pa.Table.from_pandas(table, preserve_index=False)
    value_labels = value_labels or {}
    variable_labels = variable_labels or {}
    user_missing = user_missing or {}

    names = list(table.column_names)
    shorts = _short_names(names)
    cols = [_Col(n, s, table.column(i)) for i, (n, s) in enumerate(zip(names, shorts))]
    nobs = table.num_rows

    out = bytearray()
    # ---- 176-byte header
    case_size = sum(c.width for c in cols)
    hdr = bytearray(176)
    hdr[0:4] = b"$FL2"
    hdr[4:64] = b"@(#) SPSS DATA FILE polars_readstat_rs_spark".ljust(60)[:60]
    struct.pack_into(endian + "i", hdr, 64, 2)  # layout code
    struct.pack_into(endian + "i", hdr, 68, case_size)
    struct.pack_into(endian + "i", hdr, 72, 0)  # compression: none
    struct.pack_into(endian + "i", hdr, 76, 0)  # weight index
    struct.pack_into(endian + "i", hdr, 80, nobs)
    struct.pack_into(endian + "d", hdr, 84, 100.0)
    hdr[92:101] = b"01 Jan 26"
    hdr[101:109] = b"00:00:00"
    lab = data_label.encode("utf-8")[:64]
    hdr[109 : 109 + len(lab)] = lab
    hdr[109 + len(lab) : 173] = b" " * (64 - len(lab))
    hdr[173:176] = b"\0\0\0"
    out += hdr

    # ---- variable records (type 2) with continuations for wide strings
    for c, short in zip(cols, shorts):
        vlabel = variable_labels.get(c.name, "").encode("utf-8")
        typ = c.string_len if c.is_str else 0
        miss = [] if c.is_str else list(user_missing.get(c.name, []))[:3]
        out += struct.pack(endian + "i", 2)
        out += struct.pack(endian + "iii", typ, 1 if vlabel else 0, len(miss))
        if c.is_str:
            print_fmt = (c.fmt_code << 16) | (min(c.string_len, 255) << 8)
        else:
            print_fmt = (c.fmt_code << 16) | (8 << 8) | 2
        out += struct.pack(endian + "I", print_fmt)
        out += struct.pack(endian + "I", print_fmt)
        out += short.encode("ascii").ljust(8)[:8]
        if vlabel:
            out += struct.pack(endian + "I", len(vlabel))
            pad = (len(vlabel) + 3) // 4 * 4
            out += vlabel.ljust(pad, b"\0")
        for m in miss:
            out += struct.pack(endian + "d", float(m))
        for _ in range(c.width - 1):  # string continuation records
            out += struct.pack(endian + "i", 2)
            out += struct.pack(endian + "iii", -1, 0, 0)
            out += struct.pack(endian + "II", 0, 0)
            out += b"        "

    # ---- value labels (type 3 + 4), numeric keys only
    offsets = {}
    seg = 0
    for c in cols:
        offsets[c.name] = seg
        seg += c.width
    for c in cols:
        mapping = value_labels.get(c.name)
        if not mapping or c.is_str:
            continue
        out += struct.pack(endian + "iI", 3, len(mapping))
        for k in sorted(mapping):
            out += struct.pack(endian + "d", float(k))
            lab = mapping[k].encode("utf-8")[:255]
            out += bytes([len(lab)])
            padded = (len(lab) + 8) // 8 * 8 - 1
            out += lab.ljust(padded, b" ")
        out += struct.pack(endian + "iII", 4, 1, offsets[c.name] + 1)

    # ---- subtype 13: long variable names
    entries = "\t".join(f"{s}={n}" for s, n in zip(shorts, names)).encode("utf-8")
    out += struct.pack(endian + "iiII", 7, 13, 1, len(entries)) + entries
    # ---- subtype 20: encoding
    out += struct.pack(endian + "iiII", 7, 20, 1, 5) + b"UTF-8"
    # ---- dict termination
    out += struct.pack(endian + "ii", 999, 0)

    # ---- data (uncompressed, fixed 8-byte segments)
    dt = np.dtype(
        {
            "names": [f"f{i}" for i in range(len(cols))],
            "formats": [endian + "f8" if not c.is_str else f"S{c.width * 8}" for c in cols],
            "offsets": np.cumsum([0] + [c.width * 8 for c in cols[:-1]]).tolist(),
            "itemsize": case_size * 8,
        }
    )
    rec = np.zeros(nobs, dtype=dt)
    for i, c in enumerate(cols):
        rec[f"f{i}"] = c.data
    out += rec.tobytes()

    with open(path, "wb") as f:
        f.write(out)
