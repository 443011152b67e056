"""PDF document layer: xref resolution, object fetch, page tree.

From-scratch implementation of PDF 32000-1:2008 §7.5 (file structure):
classic cross-reference tables with /Prev incremental-update chains,
cross-reference streams (§7.5.8), object streams (§7.5.7), and a
brute-force ``N G obj`` scan fallback for damaged crawl documents.

Behavioral parity target: pypdf.PdfReader as used by
/root/reference/src/pdf_parser.py:97 (text), :152 (metadata).
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Optional, Tuple

from .filters import decode_stream
from .objects import IndirectRef, Name, StreamObject, parse_object, skip_ws


class PdfError(Exception):
    pass


class PdfDocument:
    def __init__(self, data: bytes) -> None:
        self.data = data
        # obj num -> ("file", offset) | ("objstm", stm_num, index)
        self.xref: Dict[int, Tuple] = {}
        self.trailer: dict = {}
        self._cache: Dict[int, Any] = {}
        self._objstm_cache: Dict[int, Dict[int, Any]] = {}
        self._scanned = False
        try:
            self._load_xref()
        except Exception:
            self._brute_scan()
        if "Root" not in self.trailer:
            self._brute_scan()
            self._find_root_by_scan()
        # standard security handler (empty user password) — common in
        # crawled PDFs; set up AFTER xref so get_object can decrypt
        self._decryptor = None
        self._enc_num = None
        enc_ref = self.trailer.get("Encrypt")
        if enc_ref is not None:
            from .crypt import build_decryptor

            if isinstance(enc_ref, IndirectRef):
                self._enc_num = enc_ref.num
            enc = self.resolve(enc_ref)
            if isinstance(enc, StreamObject):
                enc = enc.dict
            ids = self.resolve(self.trailer.get("ID"))
            id0 = ids[0] if isinstance(ids, list) and ids and \
                isinstance(ids[0], bytes) else b""
            try:
                self._decryptor = build_decryptor(enc, id0, self.resolve)
            except Exception:
                self._decryptor = None
            if self._decryptor is None and isinstance(enc, dict):
                raise PdfError("unsupported encryption scheme")
            self._cache.clear()  # re-fetch objects through decryption

    # ---------------- xref loading ----------------

    def _load_xref(self) -> None:
        tail = self.data[-2048:]
        m = None
        for m in re.finditer(rb"startxref\s+(\d+)", tail):
            pass
        if m is None:
            raise PdfError("no startxref")
        pos = int(m.group(1))
        seen = set()
        while pos and pos not in seen and 0 <= pos < len(self.data):
            seen.add(pos)
            pos = skip_ws(self.data, pos)
            if self.data.startswith(b"xref", pos):
                trailer = self._parse_xref_table(pos)
            else:
                trailer = self._parse_xref_stream(pos)
            for k, v in trailer.items():
                self.trailer.setdefault(k, v)
            nxt = trailer.get("Prev")
            # hybrid files: also walk XRefStm
            stm = trailer.get("XRefStm")
            if stm is not None and int(stm) not in seen:
                try:
                    t2 = self._parse_xref_stream(int(stm))
                    seen.add(int(stm))
                    for k, v in t2.items():
                        self.trailer.setdefault(k, v)
                except Exception:
                    pass
            pos = int(nxt) if nxt is not None else 0

    def _parse_xref_table(self, pos: int) -> dict:
        data = self.data
        pos += 4  # 'xref'
        while True:
            pos = skip_ws(data, pos)
            if data.startswith(b"trailer", pos):
                pos = skip_ws(data, pos + 7)
                trailer, _ = parse_object(data, pos)
                return trailer if isinstance(trailer, dict) else {}
            m = re.match(rb"(\d+)\s+(\d+)", data[pos : pos + 48])
            if not m:
                return {}
            start, count = int(m.group(1)), int(m.group(2))
            pos += m.end()
            pos = skip_ws(data, pos)
            for i in range(count):
                entry = data[pos : pos + 20]
                em = re.match(rb"(\d{10})\s+(\d{5})\s+([nf])", entry)
                if em:
                    if em.group(3) == b"n":
                        num = start + i
                        # earlier (newer) sections win in update chains
                        self.xref.setdefault(num, ("file", int(em.group(1))))
                    pos += em.end()
                    pos = skip_ws(data, pos)
                else:
                    pos = skip_ws(data, pos + 18)

    def _parse_xref_stream(self, pos: int) -> dict:
        obj, stream = self._parse_indirect_at(pos)
        if stream is None:
            raise PdfError("xref stream expected")
        d = stream.dict
        data = decode_stream(stream.raw, d, self.resolve)
        w = [int(self.resolve(x)) for x in self.resolve(d.get("W", [1, 1, 1]))]
        size = int(self.resolve(d.get("Size", 0)))
        index = self.resolve(d.get("Index")) or [0, size]
        index = [int(self.resolve(x)) for x in index]
        rowlen = sum(w)
        off = 0

        def field(row: bytes, i: int) -> int:
            s = sum(w[:i])
            chunk = row[s : s + w[i]]
            if not chunk:
                return 1 if i == 0 else 0
            return int.from_bytes(chunk, "big")

        for j in range(0, len(index), 2):
            start, count = index[j], index[j + 1]
            for k in range(count):
                row = data[off : off + rowlen]
                off += rowlen
                if len(row) < rowlen:
                    break
                t = field(row, 0) if w[0] else 1
                num = start + k
                if t == 1:
                    self.xref.setdefault(num, ("file", field(row, 1)))
                elif t == 2:
                    self.xref.setdefault(num, ("objstm", field(row, 1), field(row, 2)))
        return {k: v for k, v in d.items() if k in ("Root", "Info", "Prev", "ID", "Size", "XRefStm", "Encrypt")}

    def _brute_scan(self) -> None:
        if self._scanned:
            return
        self._scanned = True
        for m in re.finditer(rb"(\d+)\s+(\d+)\s+obj\b", self.data):
            # last definition wins (later = newer in incremental updates)
            self.xref[int(m.group(1))] = ("file", m.start())
        if not self.trailer:
            for m in re.finditer(rb"trailer", self.data):
                try:
                    t, _ = parse_object(self.data, skip_ws(self.data, m.end()))
                    if isinstance(t, dict):
                        for k, v in t.items():
                            self.trailer.setdefault(k, v)
                except Exception:
                    continue

    def _find_root_by_scan(self) -> None:
        if "Root" in self.trailer:
            return
        for num in list(self.xref):
            try:
                obj = self.get_object(num)
            except Exception:
                continue
            d = obj.dict if isinstance(obj, StreamObject) else obj
            if isinstance(d, dict) and d.get("Type") == "Catalog":
                self.trailer["Root"] = IndirectRef(num, 0)
                return

    # ---------------- object access ----------------

    def _parse_indirect_at(self, pos: int) -> Tuple[Any, Optional[StreamObject]]:
        data = self.data
        pos = skip_ws(data, pos)
        m = re.match(rb"(\d+)\s+(\d+)\s+obj\b", data[pos : pos + 48])
        if not m:
            raise PdfError(f"no obj header at {pos}")
        pos += m.end()
        obj, pos = parse_object(data, pos)
        pos = skip_ws(data, pos)
        if isinstance(obj, dict) and data.startswith(b"stream", pos):
            pos += 6
            if data[pos : pos + 2] == b"\r\n":
                pos += 2
            elif pos < len(data) and data[pos : pos + 1] in (b"\n", b"\r"):
                pos += 1
            length = self.resolve(obj.get("Length"))
            try:
                length = int(length)
            except (TypeError, ValueError):
                length = -1
            if length >= 0 and data.startswith(b"endstream", skip_ws(data, pos + length)):
                raw = data[pos : pos + length]
            else:
                end = data.find(b"endstream", pos)
                raw = data[pos : end if end >= 0 else len(data)]
                raw = raw.rstrip(b"\r\n")
            return obj, StreamObject(obj, raw)
        return obj, None

    def get_object(self, ref) -> Any:
        if isinstance(ref, IndirectRef):
            num = ref.num
        else:
            num = int(ref)
        if num in self._cache:
            return self._cache[num]
        entry = self.xref.get(num)
        if entry is None and not self._scanned:
            self._brute_scan()
            entry = self.xref.get(num)
        if entry is None:
            return None
        if entry[0] == "file":
            try:
                obj, stream = self._parse_indirect_at(entry[1])
            except Exception:
                if not self._scanned:
                    self._brute_scan()
                    entry2 = self.xref.get(num)
                    if entry2 and entry2 != entry and entry2[0] == "file":
                        obj, stream = self._parse_indirect_at(entry2[1])
                    else:
                        return None
                else:
                    return None
            dec = getattr(self, "_decryptor", None)
            if dec is not None and num != self._enc_num:
                # strings decrypt per object; stream raw decrypts whole
                # (object-stream CONTENTS are then parsed plain, per spec)
                if stream is not None:
                    stream = StreamObject(
                        dec.decrypt_object(stream.dict, num, 0),
                        dec.decrypt(stream.raw, num, 0),
                    )
                else:
                    obj = dec.decrypt_object(obj, num, 0)
            value = stream if stream is not None else obj
        else:
            _, stm_num, idx = entry
            value = self._objstm_lookup(stm_num, idx, num)
        self._cache[num] = value
        return value

    def _objstm_lookup(self, stm_num: int, idx: int, want_num: int) -> Any:
        objs = self._objstm_cache.get(stm_num)
        if objs is None:
            objs = {}
            stm = self.get_object(stm_num)
            if isinstance(stm, StreamObject):
                data = decode_stream(stm.raw, stm.dict, self.resolve)
                n = int(self.resolve(stm.dict.get("N", 0)))
                first = int(self.resolve(stm.dict.get("First", 0)))
                pos = 0
                pairs = []
                for _ in range(n):
                    pos = skip_ws(data, pos)
                    m = re.match(rb"(\d+)\s+(\d+)", data[pos:])
                    if not m:
                        break
                    pairs.append((int(m.group(1)), int(m.group(2))))
                    pos += m.end()
                for onum, ooff in pairs:
                    try:
                        obj, _ = parse_object(data, first + ooff)
                        objs[onum] = obj
                    except Exception:
                        objs[onum] = None
            self._objstm_cache[stm_num] = objs
        return objs.get(want_num)

    def resolve(self, obj: Any, depth: int = 0) -> Any:
        while isinstance(obj, IndirectRef) and depth < 32:
            obj = self.get_object(obj)
            depth += 1
        return obj

    def stream_data(self, obj: Any) -> bytes:
        obj = self.resolve(obj)
        if not isinstance(obj, StreamObject):
            return b""
        return decode_stream(obj.raw, obj.dict, self.resolve)

    # ---------------- document structure ----------------

    @property
    def catalog(self) -> dict:
        root = self.resolve(self.trailer.get("Root"))
        if isinstance(root, StreamObject):
            root = root.dict
        return root if isinstance(root, dict) else {}

    def info(self) -> Dict[str, Any]:
        """The trailer /Info dictionary with values resolved (raw types)."""
        info = self.resolve(self.trailer.get("Info"))
        if isinstance(info, StreamObject):
            info = info.dict
        return info if isinstance(info, dict) else {}

    _INHERITED = ("Resources", "MediaBox", "CropBox", "Rotate")

    def pages(self) -> List[dict]:
        """Flattened page list in document order, inherited attrs applied."""
        out: List[dict] = []
        root = self.catalog
        node = self.resolve(root.get("Pages"))
        if isinstance(node, StreamObject):
            node = node.dict
        if not isinstance(node, dict):
            # fallback: scan for /Type /Page objects in object-number order
            self._brute_scan()
            for num in sorted(self.xref):
                o = self.get_object(num)
                d = o.dict if isinstance(o, StreamObject) else o
                if isinstance(d, dict) and d.get("Type") == "Page":
                    out.append(d)
            if not out:
                # nothing recoverable: neither a catalog-rooted page
                # tree nor any /Type /Page object survived salvage.
                # Truncated/corrupt crawl payloads must surface in the
                # job's `error` column (reference parity: pypdf raises
                # PdfReadError on such files, src/pdf_parser.py catches
                # it per document) — a silent zero-page "success" would
                # miscount data quality at crawl scale.
                raise PdfError("no pages recovered (truncated or corrupt PDF)")
            return out
        seen: set = set()

        def walk(n: dict, inherited: dict) -> None:
            if len(out) > 50000:
                return
            inh = dict(inherited)
            for k in self._INHERITED:
                if k in n:
                    inh[k] = n[k]
            t = self.resolve(n.get("Type"))
            kids = self.resolve(n.get("Kids"))
            if t == "Page" or (kids is None and "Contents" in n):
                page = dict(n)
                for k, v in inh.items():
                    page.setdefault(k, v)
                out.append(page)
                return
            if isinstance(kids, list):
                for kid in kids:
                    key = (kid.num, kid.gen) if isinstance(kid, IndirectRef) else id(kid)
                    if key in seen:
                        continue
                    seen.add(key)
                    kd = self.resolve(kid)
                    if isinstance(kd, StreamObject):
                        kd = kd.dict
                    if isinstance(kd, dict):
                        walk(kd, inh)

        walk(node, {})
        return out

    def page_content(self, page: dict) -> bytes:
        """Concatenated decoded content streams of a page (joined by \\n)."""
        contents = self.resolve(page.get("Contents"))
        if contents is None:
            return b""
        if isinstance(contents, StreamObject):
            return self.stream_data(contents)
        if isinstance(contents, list):
            return b"\n".join(self.stream_data(c) for c in contents)
        return b""


def decode_pdf_text_string(raw: Any) -> str:
    """Decode a PDF text string (§7.9.2.2): UTF-16BE with BOM, else
    PDFDocEncoding (approximated by latin-1, matching pypdf for the
    ASCII range the cleaning step keeps)."""
    if isinstance(raw, str):
        return raw
    if not isinstance(raw, (bytes, bytearray)):
        return "" if raw is None else str(raw)
    b = bytes(raw)
    if b.startswith(b"\xfe\xff"):
        try:
            return b[2:].decode("utf-16-be", errors="replace")
        except Exception:
            pass
    if b.startswith(b"\xef\xbb\xbf"):
        try:
            return b[3:].decode("utf-8", errors="replace")
        except Exception:
            pass
    return b.decode("latin-1", errors="replace")
