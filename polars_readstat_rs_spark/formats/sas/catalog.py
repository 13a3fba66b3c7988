"""SAS format-catalog (.sas7bcat) reader, writer, and value-label apply.

Beyond-reference surface: the reference dispatches ``.sas7bcat`` to its
sas7bdat reader (``src/lib.rs:389``) which cannot decode catalog pages,
so catalog value labels are unreachable there. SAS stores value labels
(user formats) in a *separate* catalog file, unlike Stata/SPSS which
embed them — this module closes that gap so a sas7bdat scan can decode
coded values via ``.option("catalog", path)``, mirroring the reference's
in-file value-label behavior for the other two formats (P5).

Layout notes (reverse-engineered from a real SAS-produced catalog,
``/root/reference/tests/sas/data/data_gov/formats.sas7bcat`` — 32-bit
LE, 185 format blocks including a 177-entry multi-page block and a
character format; every structure below was verified against all 185):

- sas7bdat-style header (magic with byte 15 = 0x63); ``header_length``
  and ``page_length`` at the usual alignment-adjusted offsets.
- Pages of ``page_length``. Administrative pages carry ``XLCH`` /
  ``XLSR`` at page offset 16 and hold no value-label blocks; other
  non-block pages simply fail the block signature check.
- Block pages hold extents. Every extent begins with a 16-byte link
  header: two ``(u32 page, u16 offset, u16 length)`` pairs. The first
  pair ("linkA") is ``(0, 0, used_payload_len)`` on a block's FINAL
  extent and points onward otherwise; the second pair is physical-page
  bookkeeping our reader ignores. Small blocks live in 510-byte slots
  at page offsets ``16 + k*510``; a block too big for one slot occupies
  whole pages, continuing at offset 32 of each following page.
- Block payload: ``u16 3, u32 0x78, u16 0``, name (8 bytes,
  space-padded), 6 pad bytes, f64 creation datetime; ``n_ranges`` u32
  at +42, ``n_labels`` u32 at +46, fuzz f64 (little-endian) at +54,
  u32 120 at +74 and ``48*n_ranges`` at +78.
- Numeric range records from +126, 54 bytes each: ``u16 4, u16 48,
  u16 0`` then payload ``u16 1``, 6 pad, ``u32 label_index``, u32 0,
  four BIG-endian f64: lo, hi, and fuzzed copies. SAS missing encodes
  as tag byte (0x2E '.', 'A'-'Z', '_') followed by five 0xFF bytes.
- Character format records (name starts with '$'): ``u16 4, u16 L,
  u16 0`` then 8 bytes of width metadata, ``u32 label_index``, 4-byte
  marker, and an ``L-16``-byte space-padded value string.
- Label records immediately follow the range area: ``u16 5,
  u32 text_pool_offset, u16 6, u16 len``, text, NUL. Ranges reference
  labels by ``label_index`` (order of appearance), NOT ordinally —
  the fixture's missing-value range points at label 176 of 177.

The writer emits this same 32-bit LE structure (one leading XLCH admin
page, then block pages). It is validated by roundtrip through this
reader and by structural parity with the real fixture; SAS itself is
not available here to cross-check, and catalog directory structures
beyond the value-label blocks (the XLSR index) are not reproduced.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

from .parser import MAGIC, _pyencoding

_PAGE_LEN = 4096
_HEADER_LEN = 1024
_SLOT = 510
_BLOCK_SIG = (3, 0x78, 0)
_FUZZ = 1e-12


@dataclass
class SasFormat:
    """One user format: numeric ranges and/or char values -> label."""

    name: str
    is_char: bool = False
    # numeric: inclusive [lo, hi] -> label, in catalog order
    ranges: list[tuple[float, float, str]] = field(default_factory=list)
    # char: trimmed value -> label
    values: dict[str, str] = field(default_factory=dict)
    # missing tag ('.', 'A'..'Z', '_') -> label
    missing: dict[str, str] = field(default_factory=dict)

    def exact_map(self) -> dict[float, str]:
        return {lo: lab for lo, hi, lab in self.ranges if lo == hi}

    def span_ranges(self) -> list[tuple[float, float, str]]:
        return [(lo, hi, lab) for lo, hi, lab in self.ranges if lo != hi]


# ------------------------------------------------------------------ read


def _is_block_start(pay: bytes) -> bool:
    if len(pay) < 16:
        return False
    t, off, z = struct.unpack_from("<HIH", pay, 0)
    if (t, off, z) != _BLOCK_SIG:
        return False
    return all(0x20 <= c < 0x7F for c in pay[8:16])


def _decode_missing_tag(raw8: bytes) -> str | None:
    """Big-endian double bytes -> missing tag char, or None if a number."""
    if raw8[1:6] != b"\xff\xff\xff\xff\xff":
        return None
    b0 = raw8[0]
    if b0 == 0x2E:
        return "."
    if 0x41 <= b0 <= 0x5A:
        return chr(b0)
    if b0 == 0x5F:
        return "_"
    return None


def read_catalog(path: str, strict: bool = False) -> dict[str, SasFormat]:
    """Parse every value-label (format) block of a .sas7bcat file.

    strict=True raises on any undecodable block; default skips it
    (catalogs hold non-format entry types too — only blocks matching
    the verified format-block layout are consumed either way).
    """
    with open(path, "rb") as f:
        data = f.read()
    if len(data) < 300 or data[:15] != MAGIC[:15] or data[15] != 0x63:
        if len(data) >= 300 and data[15] == 0x60:
            raise ValueError(f"{path}: is a sas7bdat data file, not a catalog")
        raise ValueError(f"{path}: not a sas7bcat catalog (bad magic)")
    align1 = 4 if data[35] == ord("3") else 0
    endian = "<" if data[37] == 0x01 else ">"
    e = endian
    header_len = struct.unpack_from(e + "I", data, 196 + align1)[0]
    page_len = struct.unpack_from(e + "I", data, 200 + align1)[0]
    encoding = _pyencoding(data[70])
    npages = (len(data) - header_len) // page_len if page_len else 0

    def page(i: int) -> bytes:
        o = header_len + i * page_len
        return data[o : o + page_len]

    def read_block(pg: int, off: int) -> bytes:
        p = page(pg)
        a_page, a_off, a_len = struct.unpack_from(e + "IHH", p, off)
        if a_page == 0 and a_off == 0:
            return p[off + 16 : off + 16 + a_len]
        # multi-extent: rest of this page, then whole following pages
        # (continuation payload at offset 32) until the final extent's
        # (0, 0, used) link
        buf = bytearray(p[off + 16 :])
        q = pg + 1
        while q < npages:
            pq = page(q)
            if pq[16:20] in (b"XLSR", b"XLCH") or _is_block_start(pq[32:64]):
                break
            la = struct.unpack_from(e + "IHH", pq, 16)
            if la[0] == 0 and la[1] == 0:
                buf += pq[32 : 32 + la[2]]
                break
            buf += pq[32:]
            q += 1
        return bytes(buf)

    def parse_block(b: bytes) -> SasFormat:
        name = b[8:16].decode(encoding, "replace").strip()
        n_ranges = struct.unpack_from(e + "I", b, 42)[0]
        n_labels = struct.unpack_from(e + "I", b, 46)[0]
        if n_ranges > len(b) // 22 or n_labels > len(b) // 11:
            raise ValueError(f"{name}: implausible counts {n_ranges}/{n_labels}")
        is_char = name.startswith("$")
        o = 126
        # (label_index, value) pairs; labels resolved after label parse
        num_entries: list[tuple[int, float | str | None, float | str | None]] = []
        for _ in range(n_ranges):
            t, ln, _z = struct.unpack_from(e + "3H", b, o)
            if t != 4:
                raise ValueError(f"{name}: range record type {t} at +{o}")
            idx = struct.unpack_from(e + "I", b, o + 6 + 8)[0]
            if is_char:
                val = b[o + 6 + 16 : o + 6 + ln].decode(encoding, "replace").rstrip(" \x00")
                num_entries.append((idx, val, val))
            else:
                raw_lo = b[o + 6 + 16 : o + 6 + 24]
                raw_hi = b[o + 6 + 24 : o + 6 + 32]
                tag = _decode_missing_tag(raw_lo)
                if tag is not None:
                    num_entries.append((idx, tag, None))
                else:
                    lo = struct.unpack(">d", raw_lo)[0]
                    hi = struct.unpack(">d", raw_hi)[0]
                    num_entries.append((idx, lo, hi))
            o += 6 + ln
        labels: list[str] = []
        for _ in range(n_labels):
            t, _pool_off, six, ln = struct.unpack_from(e + "HIHH", b, o)
            if t != 5 or six != 6:
                raise ValueError(f"{name}: label record ({t},{six}) at +{o}")
            labels.append(b[o + 10 : o + 10 + ln].decode(encoding, "replace"))
            o += 10 + ln + 1
        fmt = SasFormat(name=name, is_char=is_char)
        for idx, lo, hi in num_entries:
            lab = labels[idx] if idx < len(labels) else ""
            if is_char:
                fmt.values[str(lo)] = lab
            elif hi is None:  # missing-tag range
                fmt.missing[str(lo)] = lab
            else:
                fmt.ranges.append((float(lo), float(hi), lab))
        return fmt

    out: dict[str, SasFormat] = {}
    pg = 0
    for pg in range(npages):
        p = page(pg)
        if p[16:20] in (b"XLSR", b"XLCH"):
            continue
        off = 16
        while off + 32 <= page_len:
            if not _is_block_start(p[off + 16 : off + 48]):
                off += _SLOT
                continue
            a_page, a_off, _a = struct.unpack_from(e + "IHH", p, off)
            try:
                fmt = parse_block(read_block(pg, off))
                out[fmt.name] = fmt
            except (ValueError, struct.error, IndexError):
                if strict:
                    raise
            # single-slot blocks advance one slot; page-spanning blocks
            # own the rest of this page (continuations skipped by the
            # _is_block_start check on following pages)
            off = off + _SLOT if (a_page == 0 and a_off == 0) else page_len
    return out


# ----------------------------------------------------------------- write


def _encode_block(fmt: SasFormat, encoding: str) -> bytes:
    name = fmt.name.upper()
    if len(name) > 8:
        raise ValueError(f"catalog format name {name!r} exceeds 8 characters")
    if fmt.is_char != name.startswith("$"):
        raise ValueError(f"{name!r}: char formats (and only them) need a '$' prefix")
    entries: list[tuple[bytes, bytes | None, str]] = []
    if fmt.is_char:
        for val, lab in fmt.values.items():
            entries.append((val.encode(encoding), None, lab))
    else:
        for lo, hi, lab in fmt.ranges:
            entries.append((struct.pack(">d", lo), struct.pack(">d", hi), lab))
        for tag, lab in fmt.missing.items():
            t = tag.upper()
            b0 = 0x2E if t == "." else (0x5F if t == "_" else ord(t))
            raw = bytes([b0]) + b"\xff" * 5 + b"\x00\x00"
            entries.append((raw, None, lab))
    labels = [lab for _, _, lab in entries]
    enc_labels = [lab.encode(encoding) for lab in labels]
    w = max([len(x) for x in enc_labels] + [1])

    rec_parts: list[bytes] = []
    for i, (lo, hi, _lab) in enumerate(entries):
        if fmt.is_char:
            vw = max(16, -(-len(lo) // 8) * 8)
            val = lo.ljust(vw, b" ")
            rec = struct.pack("<3H", 4, 16 + vw, 0)
            rec += struct.pack("<4H", 0, 0, 0, 0) + struct.pack("<I", i)
            rec += b"\x08\x03\x02\x00" + val
        else:
            rec = struct.pack("<3H", 4, 48, 0)
            rec += struct.pack("<H", 1) + b"\x00" * 6 + struct.pack("<II", i, 0)
            if hi is None:  # missing tag, pre-encoded 8 bytes
                rec += lo * 4
            else:
                lo_f = struct.unpack(">d", lo)[0]
                hi_f = struct.unpack(">d", hi)[0]
                fz = _FUZZ * max(1.0, abs(lo_f), abs(hi_f))
                rec += lo + hi + struct.pack(">dd", hi_f + fz, lo_f - fz)
        rec_parts.append(rec)
    ranges_area = b"".join(rec_parts)

    lab_parts: list[bytes] = []
    pool = 0
    for lab in enc_labels:
        lab_parts.append(struct.pack("<HIHH", 5, pool, 6, len(lab)) + lab + b"\x00")
        pool += len(lab) + 1
    labels_area = b"".join(lab_parts)

    hdr = bytearray(126)
    struct.pack_into("<HIH", hdr, 0, *_BLOCK_SIG)
    hdr[8:16] = name.encode(encoding).ljust(8, b" ")
    # +22 creation datetime: fixed zero (deterministic output)
    struct.pack_into("<5H", hdr, 30, 11 if fmt.is_char else 1, 1, w, w, w)
    struct.pack_into("<I", hdr, 42, len(entries))
    struct.pack_into("<I", hdr, 46, len(entries))
    struct.pack_into("<d", hdr, 54, _FUZZ)
    struct.pack_into("<II", hdr, 74, 120, sum(len(r) - 6 for r in rec_parts))
    return bytes(hdr) + ranges_area + labels_area


def write_catalog(path: str, formats: dict[str, SasFormat] | list[SasFormat],
                  encoding: str = "latin-1") -> None:
    """Write a .sas7bcat holding the given formats (32-bit LE layout)."""
    fmts = list(formats.values()) if isinstance(formats, dict) else list(formats)
    blocks = [_encode_block(f, encoding) for f in fmts]

    pages: list[bytearray] = []

    def admin_page(tag: bytes) -> bytearray:
        p = bytearray(_PAGE_LEN)
        p[16:20] = tag
        return p

    pages.append(admin_page(b"XLCH"))
    slot_page: bytearray | None = None
    slot_off = 0
    for blk in blocks:
        if len(blk) <= _SLOT - 16:
            if slot_page is None or slot_off + _SLOT > _PAGE_LEN:
                slot_page = bytearray(_PAGE_LEN)
                pages.append(slot_page)
                slot_off = 16
            struct.pack_into("<IHH", slot_page, slot_off, 0, 0, len(blk))
            struct.pack_into("<IHH", slot_page, slot_off + 8, 0, 16, _SLOT)
            slot_page[slot_off + 16 : slot_off + 16 + len(blk)] = blk
            slot_off += _SLOT
            continue
        # whole-page extents: first page carries 16B link + payload, each
        # continuation page a 16B link + payload at offset 32
        slot_page = None
        first_cap = _PAGE_LEN - 32
        cont_cap = _PAGE_LEN - 32
        n_cont = max(0, -(-(len(blk) - first_cap) // cont_cap))
        start = len(pages)
        for ci in range(n_cont + 1):
            p = bytearray(_PAGE_LEN)
            lo_b = blk[ci * cont_cap : ci * cont_cap + (first_cap if ci == 0 else cont_cap)]
            is_last = ci == n_cont
            if is_last:
                struct.pack_into("<IHH", p, 16, 0, 0, len(lo_b))
            else:
                struct.pack_into("<IHH", p, 16, start + ci + 2, 16, _PAGE_LEN - 32)
            struct.pack_into("<IHH", p, 24, start + ci + 1, 16, _PAGE_LEN - 16)
            p[32 : 32 + len(lo_b)] = lo_b
            pages.append(p)
        # NB: the per-extent byte ranges above intentionally mirror the
        # fixture: payload resumes at offset 32 of every continuation page
    hdr = bytearray(_HEADER_LEN)
    hdr[:15] = MAGIC[:15]
    hdr[15] = 0x63
    hdr[16:32] = MAGIC[16:32]
    hdr[32:40] = b'""\x003301\x32'  # 32-bit, align1=4, LE (mirrors fixture)
    hdr[37] = 0x01
    hdr[70] = 0x1D  # latin1
    struct.pack_into("<I", hdr, 200, _HEADER_LEN)
    struct.pack_into("<I", hdr, 204, _PAGE_LEN)
    with open(path, "wb") as f:
        f.write(bytes(hdr))
        for p in pages:
            f.write(bytes(p))


# ----------------------------------------------------------------- apply


def normalize_format_name(fmt: str) -> str:
    """Column format text -> catalog lookup key: strip width/decimals
    ('COMMA10.2' -> 'COMMA', 'NATIONF.' -> 'NATIONF'), uppercase."""
    s = fmt.strip().upper()
    while s and (s[-1].isdigit() or s[-1] == "."):
        s = s[:-1]
    return s


def _fmt_float(x: float) -> str:
    return str(int(x)) if float(x).is_integer() and abs(x) < 1e15 else repr(float(x))


def label_numeric(vals: np.ndarray, mask: np.ndarray, tags: np.ndarray | None,
                  fmt: SasFormat) -> pa.Array:
    """Numeric column -> labeled strings (unique+take: Python cost scales
    with distinct values, same pattern as the Stata/SPSS label decode).

    Unmatched values render as their numeric text (SAS shows the raw
    value when no range matches); missing values take the catalog's
    missing-tag label when one exists, else stay null.
    """
    exact = fmt.exact_map()
    spans = fmt.span_ranges()

    def decode(u: float) -> str:
        if u in exact:
            return exact[u]
        for lo, hi, lab in spans:
            if lo <= u <= hi:
                return lab
        return _fmt_float(u)

    uniq, inv = np.unique(vals, return_inverse=True)
    lut = pa.array([decode(float(u)) for u in uniq], type=pa.string())
    out = lut.take(pa.array(inv.astype(np.int64), mask=mask))
    if mask.any() and fmt.missing:
        # missing rows with a labeled tag ('.' covers system missing)
        py = out.to_pylist()
        if tags is None:
            tags = np.array([], dtype=object)
        for i in np.flatnonzero(mask):
            tag = tags[i] if i < len(tags) and tags[i] else "."
            tag = tag.lstrip(".") or "."
            lab = fmt.missing.get(tag) or fmt.missing.get(tag.upper())
            if lab is not None:
                py[i] = lab
        out = pa.array(py, type=pa.string())
    return out


def label_char(arr: pa.Array, fmt: SasFormat) -> pa.Array:
    """Char column -> labeled strings; unmatched values pass through."""
    vals = fmt.values
    py = arr.to_pylist()
    return pa.array(
        [vals.get(v, v) if v is not None else None for v in py], type=pa.string()
    )
