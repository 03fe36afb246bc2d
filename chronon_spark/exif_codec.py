"""From-scratch EXIF / TIFF metadata codec (public specs: TIFF 6.0,
EXIF 2.32, JPEG ISO/IEC 10918-1 segment layout, PNG eXIf extension of
2017-07) — the image-axis analog of the text PII scrubber
(operators/text.redact_pii): camera metadata, artist names and embedded
GPS coordinates are the PII channel of an image corpus, and a web-scale
training pipeline must be able to (a) surface them as queryable columns
and (b) remove them WITHOUT re-encoding pixels.

Reference parity: the reference engine has no image-metadata operator
(its payload columns are opaque); this extends the multimodal surface
the same way redact_pii extends text — same integrity-gate contract
(malformed containers raise ValueError and become parse_ok=false rows,
never a crash or a silently-wrong row).

Three layers:
  * TIFF blob: `parse_exif_tiff` (bounded IFD walk: entry caps, offset
    validation, chain-loop guard) and `encode_exif` (two-pass assembler
    used by fixtures/tests — both byte orders, out-of-line values,
    nested Exif + GPS IFDs).
  * Container: `extract_exif(data, fmt)` locates the blob (JPEG APP1
    "Exif\\0\\0", PNG eXIf chunk) and returns typed fields incl. decimal
    GPS; `insert_jpeg_exif` / `insert_png_exif` attach one (fixtures).
  * Scrub: `scrub_metadata(data, fmt, mode)`;
      mode='all' drops every metadata segment (JPEG: APP1 + COM;
        PNG: eXIf/tEXt/zTXt/iTXt) — pixels are untouched because JPEG
        entropy segments and PNG IDAT are copied verbatim;
      mode='gps' neutralizes ONLY the GPS IFD *in place* (zero the IFD
        + its out-of-line rationals, overwrite the IFD0 pointer entry
        with the public padding tag 0xEA1C): every other byte offset in
        the TIFF keeps its meaning, so Make/Model/orientation survive
        and the file length is unchanged.

All allocations are bounded by the container-declared sizes, which are
themselves validated against len(data) before use (same hardening rules
as codecs.py: no header-driven allocation larger than the payload).
"""

from __future__ import annotations

import struct
import zlib

_MAX_TIFF = 1 << 24          # 16 MB cap on an EXIF blob (APP1 is <=64KB;
                             # PNG eXIf can exceed it, but not unboundedly)
_MAX_ENTRIES = 512           # per-IFD entry cap (spec files use dozens)
_MAX_IFDS = 8                # IFD chain cap (IFD0 + IFD1 + nested)
_MAX_ASCII = 4096            # per-string cap

# TIFF field types -> element byte width
_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8}

# tags (TIFF 6.0 / EXIF 2.32 / GPS IFD)
TAG_IMAGE_DESCRIPTION = 0x010E
TAG_MAKE = 0x010F
TAG_MODEL = 0x0110
TAG_ORIENTATION = 0x0112
TAG_SOFTWARE = 0x0131
TAG_DATETIME = 0x0132
TAG_ARTIST = 0x013B
TAG_COPYRIGHT = 0x8298
TAG_EXIF_IFD = 0x8769
TAG_GPS_IFD = 0x8825
TAG_DATETIME_ORIGINAL = 0x9003
TAG_PADDING = 0xEA1C          # Microsoft/CIPA padding tag (public)

GPS_LAT_REF = 0x0001
GPS_LAT = 0x0002
GPS_LON_REF = 0x0003
GPS_LON = 0x0004


def _bo_char(tiff: bytes) -> str:
    if tiff[:2] == b"II":
        return "<"
    if tiff[:2] == b"MM":
        return ">"
    raise ValueError("bad TIFF byte-order mark")


# ---------------------------------------------------------------------------
# TIFF assembler (fixtures + tests)
# ---------------------------------------------------------------------------

def _rat(v: float, den: int = 10_000) -> tuple[int, int]:
    return int(round(v * den)), den


def _deg_to_dms(v: float) -> list[tuple[int, int]]:
    v = abs(v)
    d = int(v)
    m = int((v - d) * 60)
    s = (v - d - m / 60) * 3600
    return [(d, 1), (m, 1), _rat(s)]


class _IfdBuilder:
    """Collects (tag, type, count, payload bytes); `place` lays the IFD at
    a given offset with its out-of-line data immediately after it."""

    def __init__(self, bo: str):
        self.bo = bo
        self.entries: list[tuple[int, int, int, bytes]] = []

    def ascii(self, tag: int, s: str) -> None:
        b = s.encode("ascii") + b"\x00"
        self.entries.append((tag, 2, len(b), b))

    def short(self, tag: int, v: int) -> None:
        self.entries.append((tag, 3, 1, struct.pack(self.bo + "H", v)))

    def long(self, tag: int, v: int) -> None:
        self.entries.append((tag, 4, 1, struct.pack(self.bo + "I", v)))

    def rationals(self, tag: int, vals: list[tuple[int, int]]) -> None:
        b = b"".join(struct.pack(self.bo + "II", n, d) for n, d in vals)
        self.entries.append((tag, 5, len(vals), b))

    def raw_entry(self, tag: int, typ: int, cnt: int, raw4: bytes) -> None:
        """Copy an existing entry verbatim: raw4 is the 4-byte value-or-
        offset field, which stays valid because absolute offsets into the
        file keep their meaning when the IFD is rebuilt elsewhere."""
        self.entries.append((tag, typ, cnt, ("raw", raw4)))

    def shorts(self, tag: int, vals: list[int]) -> None:
        b = b"".join(struct.pack(self.bo + "H", v) for v in vals)
        self.entries.append((tag, 3, len(vals), b))

    def longs(self, tag: int, vals: list[int]) -> None:
        b = b"".join(struct.pack(self.bo + "I", v) for v in vals)
        self.entries.append((tag, 4, len(vals), b))

    def size(self) -> tuple[int, int]:
        """(ifd_bytes, outline_bytes)"""
        out = sum(
            len(p) + (len(p) & 1) for _, _, _, p in self.entries
            if not isinstance(p, tuple) and len(p) > 4
        )
        return 2 + 12 * len(self.entries) + 4, out

    def place(self, at: int, next_ifd: int = 0) -> bytes:
        ifd_len, _ = self.size()
        data_at = at + ifd_len
        head = struct.pack(self.bo + "H", len(self.entries))
        body = b""
        tail = b""
        for tag, typ, cnt, payload in sorted(
            self.entries, key=lambda e: e[:3]
        ):
            if isinstance(payload, tuple):       # verbatim value/offset
                val = payload[1]
            elif len(payload) <= 4:
                val = payload + b"\x00" * (4 - len(payload))
            else:
                val = struct.pack(self.bo + "I", data_at + len(tail))
                tail += payload + (b"\x00" if len(payload) & 1 else b"")
            body += struct.pack(self.bo + "HHI", tag, typ, cnt) + val
        return head + body + struct.pack(self.bo + "I", next_ifd) + tail


def encode_exif(fields: dict, byte_order: str = "II") -> bytes:
    """Build a TIFF/EXIF blob from a field dict. Recognized keys:
    make, model, software, artist, description, datetime (ASCII),
    orientation (1..8), datetime_original (nested Exif IFD) and
    gps=(lat, lon) in signed decimal degrees (nested GPS IFD)."""
    bo = "<" if byte_order == "II" else ">"
    ifd0 = _IfdBuilder(bo)
    for key, tag in (("description", TAG_IMAGE_DESCRIPTION),
                     ("make", TAG_MAKE), ("model", TAG_MODEL),
                     ("software", TAG_SOFTWARE), ("datetime", TAG_DATETIME),
                     ("artist", TAG_ARTIST), ("copyright", TAG_COPYRIGHT)):
        if fields.get(key) is not None:
            ifd0.ascii(tag, fields[key])
    if fields.get("orientation") is not None:
        ifd0.short(TAG_ORIENTATION, int(fields["orientation"]))

    exif_ifd = gps_ifd = None
    if fields.get("datetime_original") is not None:
        exif_ifd = _IfdBuilder(bo)
        exif_ifd.ascii(TAG_DATETIME_ORIGINAL, fields["datetime_original"])
        ifd0.long(TAG_EXIF_IFD, 0)          # patched below
    if fields.get("gps") is not None:
        lat, lon = fields["gps"]
        gps_ifd = _IfdBuilder(bo)
        gps_ifd.ascii(GPS_LAT_REF, "N" if lat >= 0 else "S")
        gps_ifd.rationals(GPS_LAT, _deg_to_dms(lat))
        gps_ifd.ascii(GPS_LON_REF, "E" if lon >= 0 else "W")
        gps_ifd.rationals(GPS_LON, _deg_to_dms(lon))
        ifd0.long(TAG_GPS_IFD, 0)           # patched below

    at0 = 8
    l0, o0 = ifd0.size()
    cursor = at0 + l0 + o0
    exif_at = gps_at = 0
    if exif_ifd is not None:
        exif_at = cursor
        le, oe = exif_ifd.size()
        cursor += le + oe
    if gps_ifd is not None:
        gps_at = cursor
    # patch the pointer entries now that offsets are known
    for i, (tag, typ, cnt, _) in enumerate(ifd0.entries):
        if tag == TAG_EXIF_IFD:
            ifd0.entries[i] = (tag, typ, cnt, struct.pack(bo + "I", exif_at))
        if tag == TAG_GPS_IFD:
            ifd0.entries[i] = (tag, typ, cnt, struct.pack(bo + "I", gps_at))

    blob = (byte_order.encode("ascii") + struct.pack(bo + "H", 42)
            + struct.pack(bo + "I", at0))
    blob += ifd0.place(at0)
    if exif_ifd is not None:
        blob += exif_ifd.place(exif_at)
    if gps_ifd is not None:
        blob += gps_ifd.place(gps_at)
    return blob


# ---------------------------------------------------------------------------
# TIFF parser (bounded)
# ---------------------------------------------------------------------------

def _read_ifd(tiff: bytes, bo: str, at: int):
    """-> (entries, next_ifd): entries are (tag, type, count, raw4, entry_pos)."""
    if at + 2 > len(tiff):
        raise ValueError("IFD offset past EOF")
    (n,) = struct.unpack_from(bo + "H", tiff, at)
    if n > _MAX_ENTRIES:
        raise ValueError(f"IFD entry count {n} exceeds cap")
    end = at + 2 + 12 * n + 4
    if end > len(tiff):
        raise ValueError("IFD extends past EOF")
    out = []
    for i in range(n):
        pos = at + 2 + 12 * i
        tag, typ, cnt = struct.unpack_from(bo + "HHI", tiff, pos)
        out.append((tag, typ, cnt, tiff[pos + 8:pos + 12], pos))
    (nxt,) = struct.unpack_from(bo + "I", tiff, end - 4)
    return out, nxt


def _value(tiff: bytes, bo: str, typ: int, cnt: int, raw4: bytes):
    """Decode one entry's value (ASCII -> str, SHORT/LONG -> int list,
    RATIONAL -> (num, den) list); None for unsupported types."""
    esz = _TYPE_SIZE.get(typ)
    if esz is None:
        return None
    total = esz * cnt
    if total > _MAX_ASCII * 8:
        raise ValueError("EXIF value too large")
    if total <= 4:
        buf = raw4[:total]
    else:
        (off,) = struct.unpack(bo + "I", raw4)
        if off + total > len(tiff):
            raise ValueError("EXIF value offset past EOF")
        buf = tiff[off:off + total]
    if typ == 2:
        return buf.split(b"\x00", 1)[0].decode("ascii", "replace")
    if typ == 3:
        return list(struct.unpack(bo + f"{cnt}H", buf))
    if typ in (4, 9):
        return list(struct.unpack(bo + ("%d" % cnt) + ("I" if typ == 4 else "i"), buf))
    if typ in (5, 10):
        ch = "I" if typ == 5 else "i"
        flat = struct.unpack(bo + ch * (2 * cnt), buf)
        return [(flat[2 * i], flat[2 * i + 1]) for i in range(cnt)]
    return buf


def _dms_to_deg(dms, ref: str | None) -> float | None:
    try:
        d = sum((n / den) / f for (n, den), f in zip(dms, (1, 60, 3600)) if den)
    except (TypeError, ZeroDivisionError):
        return None
    if ref in ("S", "W"):
        d = -d
    return round(d, 6)


_EMPTY = {
    "has_exif": False, "orientation": None, "make": None, "model": None,
    "datetime": None, "artist": None, "software": None,
    "gps_present": False, "gps_lat": None, "gps_lon": None,
}


def parse_exif_tiff(tiff: bytes) -> dict:
    """Bounded IFD walk -> typed field dict (the _EMPTY key set)."""
    if len(tiff) > _MAX_TIFF:
        raise ValueError("EXIF blob exceeds size cap")
    if len(tiff) < 8:
        raise ValueError("EXIF blob truncated")
    bo = _bo_char(tiff)
    (magic,) = struct.unpack_from(bo + "H", tiff, 2)
    if magic != 42:
        raise ValueError("bad TIFF magic")
    (at,) = struct.unpack_from(bo + "I", tiff, 4)

    out = dict(_EMPTY)
    out["has_exif"] = True
    seen: set[int] = set()
    queue: list[tuple[int, str]] = [(at, "ifd")]
    walked = 0
    gps_raw: dict[int, object] = {}
    while queue:
        at, kind = queue.pop(0)
        if at == 0 or at in seen:
            continue
        seen.add(at)
        walked += 1
        if walked > _MAX_IFDS:
            raise ValueError("IFD chain too long")
        entries, nxt = _read_ifd(tiff, bo, at)
        for tag, typ, cnt, raw4, _pos in entries:
            if kind == "ifd":
                if tag == TAG_ORIENTATION:
                    v = _value(tiff, bo, typ, cnt, raw4)
                    out["orientation"] = int(v[0]) if v else None
                elif tag in (TAG_MAKE, TAG_MODEL, TAG_DATETIME, TAG_ARTIST,
                             TAG_SOFTWARE):
                    key = {TAG_MAKE: "make", TAG_MODEL: "model",
                           TAG_DATETIME: "datetime", TAG_ARTIST: "artist",
                           TAG_SOFTWARE: "software"}[tag]
                    out[key] = _value(tiff, bo, typ, cnt, raw4)
                elif tag == TAG_EXIF_IFD and typ == 4:
                    (p,) = struct.unpack(bo + "I", raw4)
                    queue.append((p, "exif"))
                elif tag == TAG_GPS_IFD and typ == 4:
                    (p,) = struct.unpack(bo + "I", raw4)
                    queue.append((p, "gps"))
            elif kind == "gps":
                if tag in (GPS_LAT_REF, GPS_LAT, GPS_LON_REF, GPS_LON):
                    gps_raw[tag] = _value(tiff, bo, typ, cnt, raw4)
        if kind == "ifd" and nxt:
            queue.append((nxt, "ifd"))
    if GPS_LAT in gps_raw and GPS_LON in gps_raw:
        lat = _dms_to_deg(gps_raw[GPS_LAT], gps_raw.get(GPS_LAT_REF))
        lon = _dms_to_deg(gps_raw[GPS_LON], gps_raw.get(GPS_LON_REF))
        if lat is not None and lon is not None:
            out["gps_present"] = True
            out["gps_lat"], out["gps_lon"] = lat, lon
    return out


# ---------------------------------------------------------------------------
# Containers
# ---------------------------------------------------------------------------

_EXIF_HDR = b"Exif\x00\x00"
_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_TEXT_CHUNKS = (b"tEXt", b"zTXt", b"iTXt", b"eXIf")


def _jpeg_segments(data: bytes):
    """Yield (marker, seg_start, payload_start, payload_len) up to SOS;
    after SOS the stream is entropy-coded and is not walked."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        marker = data[pos + 1]
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7 or marker == 0x01:
            pos += 2
            continue
        (ln,) = struct.unpack_from(">H", data, pos + 2)
        if ln < 2 or pos + 2 + ln > len(data):
            raise ValueError("JPEG segment length past EOF")
        yield marker, pos, pos + 4, ln - 2
        if marker == 0xDA:                   # SOS: entropy data follows
            return
        pos += 2 + ln
    raise ValueError("JPEG truncated before SOS")


def _png_chunks(data: bytes):
    """Yield (type, chunk_start, data_start, data_len)."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    while pos + 8 <= len(data):
        (ln,) = struct.unpack_from(">I", data, pos)
        typ = data[pos + 4:pos + 8]
        if pos + 12 + ln > len(data):
            raise ValueError("PNG chunk length past EOF")
        yield typ, pos, pos + 8, ln
        pos += 12 + ln
        if typ == b"IEND":
            return
    raise ValueError("PNG truncated (no IEND)")


def insert_jpeg_exif(jpeg: bytes, tiff: bytes) -> bytes:
    """Attach an APP1 Exif segment right after SOI (fixture helper)."""
    payload = _EXIF_HDR + tiff
    if len(payload) + 2 > 0xFFFF:
        raise ValueError("EXIF blob too large for one APP1 segment")
    seg = b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    return jpeg[:2] + seg + jpeg[2:]


def insert_png_exif(png: bytes, tiff: bytes,
                    texts: dict[str, str] | None = None) -> bytes:
    """Attach an eXIf chunk (+ optional tEXt chunks) right after IHDR."""
    def chunk(typ: bytes, body: bytes) -> bytes:
        return (struct.pack(">I", len(body)) + typ + body
                + struct.pack(">I", zlib.crc32(typ + body)))

    extra = chunk(b"eXIf", tiff)
    for k, v in (texts or {}).items():
        extra += chunk(b"tEXt", k.encode("latin-1") + b"\x00"
                       + v.encode("latin-1"))
    for typ, start, dstart, dlen in _png_chunks(png):
        if typ == b"IHDR":
            end = dstart + dlen + 4
            return png[:end] + extra + png[end:]
    raise ValueError("PNG has no IHDR")


def insert_tiff_exif(data: bytes, fields: dict) -> bytes:
    """Attach metadata fields to a TIFF FILE (fixture helper): rebuild
    IFD0 at EOF carrying the existing entries verbatim (absolute offsets
    stay valid — pixel strips never move) plus the new metadata entries,
    nested Exif/GPS IFDs appended after it, header patched to point at
    the new IFD. The old IFD bytes become dead padding."""
    bo = _bo_char(data)
    (at0,) = struct.unpack_from(bo + "I", data, 4)
    entries, nxt = _read_ifd(data, bo, at0)

    ifd0 = _IfdBuilder(bo)
    for tag, typ, cnt, raw4, _pos in entries:
        ifd0.raw_entry(tag, typ, cnt, raw4)
    for key, tag in (("description", TAG_IMAGE_DESCRIPTION),
                     ("make", TAG_MAKE), ("model", TAG_MODEL),
                     ("software", TAG_SOFTWARE), ("datetime", TAG_DATETIME),
                     ("artist", TAG_ARTIST), ("copyright", TAG_COPYRIGHT)):
        if fields.get(key) is not None:
            ifd0.ascii(tag, fields[key])
    if fields.get("orientation") is not None:
        ifd0.short(TAG_ORIENTATION, int(fields["orientation"]))

    exif_ifd = gps_ifd = None
    if fields.get("datetime_original") is not None:
        exif_ifd = _IfdBuilder(bo)
        exif_ifd.ascii(TAG_DATETIME_ORIGINAL, fields["datetime_original"])
        ifd0.long(TAG_EXIF_IFD, 0)
    if fields.get("gps") is not None:
        lat, lon = fields["gps"]
        gps_ifd = _IfdBuilder(bo)
        gps_ifd.ascii(GPS_LAT_REF, "N" if lat >= 0 else "S")
        gps_ifd.rationals(GPS_LAT, _deg_to_dms(lat))
        gps_ifd.ascii(GPS_LON_REF, "E" if lon >= 0 else "W")
        gps_ifd.rationals(GPS_LON, _deg_to_dms(lon))
        ifd0.long(TAG_GPS_IFD, 0)

    new_at = len(data) + (len(data) & 1)
    l0, o0 = ifd0.size()
    cursor = new_at + l0 + o0
    exif_at = gps_at = 0
    if exif_ifd is not None:
        exif_at = cursor
        le, oe = exif_ifd.size()
        cursor += le + oe
    if gps_ifd is not None:
        gps_at = cursor
    for i, (tag, typ, cnt, p) in enumerate(ifd0.entries):
        if tag == TAG_EXIF_IFD and not isinstance(p, tuple):
            ifd0.entries[i] = (tag, typ, cnt, struct.pack(bo + "I", exif_at))
        if tag == TAG_GPS_IFD and not isinstance(p, tuple):
            ifd0.entries[i] = (tag, typ, cnt, struct.pack(bo + "I", gps_at))

    out = bytearray(data)
    out += b"\x00" * (new_at - len(data))
    out += ifd0.place(new_at, next_ifd=nxt)
    if exif_ifd is not None:
        out += exif_ifd.place(exif_at)
    if gps_ifd is not None:
        out += gps_ifd.place(gps_at)
    out[4:8] = struct.pack(bo + "I", new_at)
    return bytes(out)


def extract_exif(data: bytes, fmt: str) -> dict:
    """Locate + parse the EXIF blob for a container. Returns the _EMPTY
    key set plus `txt_chunks` (PNG textual-metadata chunk count; JPEG COM
    count) so scrub verification can assert removal. For fmt='tiff' the
    FILE is the TIFF structure (its IFD0 holds the metadata tags
    directly), so has_exif reports whether any recognized metadata FIELD
    is present — after in-place neutralization it turns false even
    though the container is still a TIFF. Formats without a standard
    EXIF channel (gif/bmp/...) return has_exif=False."""
    out = dict(_EMPTY)
    out["txt_chunks"] = 0
    if fmt == "jpeg":
        for marker, _s, ps, pl in _jpeg_segments(data):
            if marker == 0xE1 and data[ps:ps + 6] == _EXIF_HDR:
                out.update(parse_exif_tiff(data[ps + 6:ps + pl]))
            elif marker == 0xFE:
                out["txt_chunks"] += 1
    elif fmt == "png":
        for typ, _s, ds, dl in _png_chunks(data):
            if typ == b"eXIf":
                out.update(parse_exif_tiff(data[ds:ds + dl]))
            elif typ in (b"tEXt", b"zTXt", b"iTXt"):
                out["txt_chunks"] += 1
    elif fmt == "tiff":
        out.update(parse_exif_tiff(data))
        out["has_exif"] = bool(
            out["gps_present"]
            or any(out[k] is not None for k in
                   ("orientation", "make", "model", "datetime", "artist",
                    "software"))
        )
    elif fmt == "webp":
        from chronon_spark.webp_codec import webp_exif_chunk

        blob = webp_exif_chunk(data)
        if blob is not None:
            # the chunk may carry a leading "Exif\0\0" like JPEG APP1
            if blob[:6] == _EXIF_HDR:
                blob = blob[6:]
            out.update(parse_exif_tiff(blob))
    return out


# ---------------------------------------------------------------------------
# Scrub
# ---------------------------------------------------------------------------

def _zero_span(tiff: bytearray, off: int, total: int) -> None:
    """Zero an out-of-line value region, validating bounds FIRST: a
    crafted entry count (up to 2^32 -> total up to 32 GiB) must fail
    with the contractual ValueError, not an OOM allocation, and an
    out-of-range offset must never slice-assign past the end (bytearray
    slice assignment GROWS the buffer, breaking the length-preserving
    in-place guarantee and corrupting the enclosing APP1/chunk length)."""
    if total > _MAX_ASCII * 8:
        raise ValueError("EXIF value too large")
    if off + total > len(tiff):
        raise ValueError("EXIF value offset past EOF")
    tiff[off:off + total] = b"\x00" * total


def _neutralize_gps(tiff: bytearray) -> bool:
    """In-place GPS removal: zero the GPS IFD + its out-of-line values,
    overwrite the IFD0 pointer entry with the padding tag. Every other
    offset keeps its meaning (nothing moves). Returns True if GPS found."""
    bo = _bo_char(bytes(tiff[:2]) + b"\x00\x00")
    (at,) = struct.unpack_from(bo + "I", tiff, 4)
    seen: set[int] = set()
    walked = 0
    while at and at not in seen:
        seen.add(at)
        walked += 1
        if walked > _MAX_IFDS:
            raise ValueError("IFD chain too long")
        entries, nxt = _read_ifd(bytes(tiff), bo, at)
        for tag, typ, cnt, raw4, pos in entries:
            if tag == TAG_GPS_IFD and typ == 4:
                (gat,) = struct.unpack(bo + "I", raw4)
                if gat:
                    gentries, _gnxt = _read_ifd(bytes(tiff), bo, gat)
                    for _t, gtyp, gcnt, graw4, _gp in gentries:
                        esz = _TYPE_SIZE.get(gtyp, 1)
                        total = esz * gcnt
                        if total > 4:
                            (off,) = struct.unpack(bo + "I", graw4)
                            _zero_span(tiff, off, total)
                    gend = gat + 2 + 12 * len(gentries) + 4
                    tiff[gat:gend] = b"\x00" * (gend - gat)
                # pointer entry -> padding tag, value 0
                tiff[pos:pos + 12] = (struct.pack(bo + "HHI", TAG_PADDING, 7, 4)
                                      + b"\x00\x00\x00\x00")
                return True
        at = nxt
    return False


_TIFF_PII_TAGS = {
    TAG_IMAGE_DESCRIPTION, TAG_MAKE, TAG_MODEL, TAG_ORIENTATION,
    TAG_SOFTWARE, TAG_DATETIME, TAG_ARTIST, TAG_COPYRIGHT,
    TAG_DATETIME_ORIGINAL,
}


def _neutralize_all_tiff(tiff: bytearray) -> bool:
    """In-place neutralization of every recognized metadata field in a
    TIFF FILE (where dropping bytes would shift strip offsets): zero
    each PII entry's out-of-line value, zero nested Exif/GPS IFD
    regions, and overwrite the entries with the padding tag. The image
    layout tags (dimensions, strips, colormap) are untouched, so the
    file still decodes bit-identically. Returns True if anything was
    removed."""
    bo = _bo_char(bytes(tiff[:2]) + b"\x00\x00")
    (at,) = struct.unpack_from(bo + "I", tiff, 4)
    changed = _neutralize_gps(tiff)
    seen: set[int] = set()
    walked = 0
    queue = [at]
    while queue:
        at = queue.pop(0)
        if not at or at in seen:
            continue
        seen.add(at)
        walked += 1
        if walked > _MAX_IFDS:
            raise ValueError("IFD chain too long")
        entries, nxt = _read_ifd(bytes(tiff), bo, at)
        for tag, typ, cnt, raw4, pos in entries:
            if tag == TAG_EXIF_IFD and typ == 4:
                (eat,) = struct.unpack(bo + "I", raw4)
                if eat:
                    eentries, _en = _read_ifd(bytes(tiff), bo, eat)
                    for _t, etyp, ecnt, eraw4, _ep in eentries:
                        esz = _TYPE_SIZE.get(etyp, 1)
                        total = esz * ecnt
                        if total > 4:
                            (off,) = struct.unpack(bo + "I", eraw4)
                            _zero_span(tiff, off, total)
                    eend = eat + 2 + 12 * len(eentries) + 4
                    tiff[eat:eend] = b"\x00" * (eend - eat)
            elif tag not in _TIFF_PII_TAGS:
                continue
            esz = _TYPE_SIZE.get(typ, 1)
            total = esz * cnt
            if total > 4:
                (off,) = struct.unpack(bo + "I", raw4)
                if off + total <= len(tiff):
                    tiff[off:off + total] = b"\x00" * total
            tiff[pos:pos + 12] = (
                struct.pack(bo + "HHI", TAG_PADDING, 7, 4)
                + b"\x00\x00\x00\x00"
            )
            changed = True
        if nxt:
            queue.append(nxt)
    return changed


def scrub_metadata(data: bytes, fmt: str, mode: str = "all") -> bytes:
    """Remove metadata without touching pixel data.

    mode='all': drop every metadata segment/chunk (JPEG APP1+COM, PNG
    eXIf/tEXt/zTXt/iTXt). mode='gps': surgically neutralize only the GPS
    IFD inside the EXIF blob (same byte length out; Make/Model/datetime
    survive). Unknown-format rows pass through unchanged."""
    if mode not in ("all", "gps"):
        raise ValueError(f"unknown scrub mode {mode!r}")
    if fmt == "jpeg":
        if mode == "all":
            out = bytearray(b"\xff\xd8")
            last = 2
            for marker, s, ps, pl in _jpeg_segments(data):
                drop = (marker == 0xFE
                        or (marker == 0xE1))      # Exif or XMP — both PII
                if not drop:
                    out += data[s:ps + pl]
                last = ps + pl
                if marker == 0xDA:
                    out += data[last:]            # entropy stream verbatim
                    return bytes(out)
            raise ValueError("JPEG truncated before SOS")
        buf = bytearray(data)
        for marker, _s, ps, pl in _jpeg_segments(data):
            if marker == 0xE1 and data[ps:ps + 6] == _EXIF_HDR:
                tiff = bytearray(data[ps + 6:ps + pl])
                if _neutralize_gps(tiff):
                    buf[ps + 6:ps + pl] = tiff
        return bytes(buf)
    if fmt == "png":
        if mode == "all":
            out = bytearray(_PNG_SIG)
            for typ, s, ds, dl in _png_chunks(data):
                if typ not in _PNG_TEXT_CHUNKS:
                    out += data[s:ds + dl + 4]
            return bytes(out)
        out = bytearray(data)
        for typ, s, ds, dl in _png_chunks(data):
            if typ == b"eXIf":
                tiff = bytearray(data[ds:ds + dl])
                if _neutralize_gps(tiff):
                    out[ds:ds + dl] = tiff
                    crc = zlib.crc32(b"eXIf" + bytes(tiff))
                    out[ds + dl:ds + dl + 4] = struct.pack(">I", crc)
        return bytes(out)
    if fmt == "tiff":
        # the FILE is the TIFF: byte removal would shift strip offsets,
        # so both modes are in-place surgery (length preserved)
        buf = bytearray(data)
        if len(buf) < 8:
            raise ValueError("TIFF truncated")
        if mode == "gps":
            _neutralize_gps(buf)
        else:
            _neutralize_all_tiff(buf)
        return bytes(buf)
    if fmt == "webp":
        from chronon_spark.webp_codec import webp_scrub

        if mode == "all":
            return webp_scrub(data)

        def neutral(tiff: bytearray) -> bool:
            if tiff[:6] == _EXIF_HDR:
                sub = bytearray(tiff[6:])
                if _neutralize_gps(sub):
                    tiff[6:] = sub
                    return True
                return False
            return _neutralize_gps(tiff)

        return webp_scrub(data, gps_neutralizer=neutral)
    return data
