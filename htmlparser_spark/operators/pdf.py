"""Minimal PDF text extraction (north_rule: "PDF/layout parse").

Lib-free subset parser for the text-showing core of PDF content
streams — the layout-parse sibling of the HTML kernel:

- ``synth_pdf_blob(text)``: a deterministic, structurally valid
  single-page PDF 1.4 (catalog/pages/page/contents/font objects,
  correct xref offsets) whose content stream shows ``text`` line by
  line with ``Tj`` + ``Td`` moves. Plays the role synth_ppm_blob
  plays for images: an in-repo generator so the decode path is REAL
  and byte-testable without binary fixtures.
- ``extract_pdf_text(blob)``: scans content streams (stream …
  endstream), walks BT…ET text objects and emits shown text in
  stream order with layout-driven line breaks:
  * ``(…) Tj`` literal strings — backslash escapes (\\n \\r \\t \\b
    \\f \\( \\) \\\\, 1–3-digit octal), BALANCED unescaped inner
    parens (spec-legal), line-continuation backslash-newline;
  * ``<…> Tj`` hex strings (whitespace-tolerant, odd-length pads 0);
  * ``[…] TJ`` arrays — string pieces concatenated, kerning numbers
    ignored (they are glyph-space offsets, not characters);
  * ``Td``/``TD`` with a vertical move, ``T*``, and the ``'`` and
    ``"`` next-line-show operators each emit a newline.
  FlateDecode streams are inflated first (stdlib zlib — declared via
  /Filter in the stream dict; a corrupt body shows nothing rather
  than raising mid-job). zlib at a fixed level is deterministic, so
  the identity round trip holds on the compressed path too.

Spark surface: an Arrow-batched pandas UDF over the binary column
(``with_pdf_text``) — same per-batch Python-kernel shape as the HTML
kernel; blobs stay in one column so pruning skips them when untouched.

Round-trip contract (the driver oracle `pdf_extract`):
extract_pdf_text(synth_pdf_blob(t)) == t for any text whose lines are
free of control bytes — certified against the documents table, where
the DuckDB side is the IDENTITY on text.
"""

from __future__ import annotations

import re
from typing import Iterable

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

__all__ = ["synth_pdf_blob", "extract_pdf_text", "with_pdf_text",
           "synth_pdf_col", "pdf_text_col"]


def _esc_literal(s: bytes) -> bytes:
    out = bytearray()
    for b in s:
        if b in (0x28, 0x29, 0x5C):          # ( ) backslash
            out += b"\\" + bytes([b])
        elif b == 0x0A:
            out += b"\\n"
        elif b == 0x0D:
            out += b"\\r"
        elif b == 0x09:
            out += b"\\t"
        else:
            out.append(b)
    return bytes(out)


def synth_pdf_blob(text: str, compress: bool = False) -> bytes:
    """Deterministic single-page PDF showing ``text`` (UTF-8 bytes in
    literal strings), one Tj per line, 14-unit leading. With
    ``compress`` the content stream is FlateDecode-compressed —
    zlib output at a fixed level is deterministic, so round-trip
    exactness holds on that path too."""
    lines = text.split("\n")
    ops = [b"BT", b"/F1 12 Tf", b"72 720 Td"]
    for i, ln in enumerate(lines):
        if i > 0:
            ops.append(b"0 -14 Td")
        ops.append(b"(" + _esc_literal(ln.encode("utf-8")) + b") Tj")
    ops.append(b"ET")
    content = b"\n".join(ops)
    filt = b""
    if compress:
        import zlib
        content = zlib.compress(content, 6)
        filt = b"/Filter /FlateDecode "

    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>",
        b"<< " + filt + b"/Length " + str(len(content)).encode()
        + b" >>\nstream\n" + content + b"\nendstream",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    buf = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objs, start=1):
        offsets.append(len(buf))
        buf += str(i).encode() + b" 0 obj\n" + body + b"\nendobj\n"
    xref_at = len(buf)
    buf += b"xref\n0 " + str(len(objs) + 1).encode() + b"\n"
    buf += b"0000000000 65535 f \n"
    for off in offsets:
        buf += str(off).zfill(10).encode() + b" 00000 n \n"
    buf += (b"trailer\n<< /Size " + str(len(objs) + 1).encode()
            + b" /Root 1 0 R >>\nstartxref\n"
            + str(xref_at).encode() + b"\n%%EOF\n")
    return bytes(buf)


def _content_streams(data: bytes) -> Iterable[bytes]:
    i = 0
    while True:
        s = data.find(b"stream", i)
        if s < 0:
            return
        j = s + 6
        if data[j:j + 2] == b"\r\n":
            j += 2
        elif data[j:j + 1] in (b"\n", b"\r"):
            j += 1
        e = data.find(b"endstream", j)
        if e < 0:
            return
        body = data[j:e]
        # stream dict precedes the `stream` keyword; honor its
        # /Length — the EOL before `endstream` is a separator, not
        # data, and compressed bodies may legitimately END in 0x0a/0x0d
        # so a blind rstrip would corrupt them
        dict_start = data.rfind(b"<<", max(0, s - 512), s)
        d = data[dict_start:s] if dict_start >= 0 else b""
        m = re.search(rb"/Length\s+(\d+)", d)
        if m and j + int(m.group(1)) <= e:
            body = data[j:j + int(m.group(1))]
        elif body.endswith(b"\r\n"):
            body = body[:-2]
        elif body.endswith((b"\n", b"\r")):
            body = body[:-1]
        if b"FlateDecode" in d:
            import zlib
            try:
                body = zlib.decompress(body)
            except zlib.error:
                body = b""            # corrupt stream: show nothing
        yield body
        i = e + 9


_OCTAL = b"01234567"


def _parse_literal(b: bytes, i: int) -> tuple[bytes, int]:
    """Parse from after the opening '(' to the matching ')' with
    escape handling and balanced inner parens; returns (bytes, next)."""
    out = bytearray()
    depth = 1
    n = len(b)
    while i < n:
        c = b[i]
        if c == 0x5C:                         # backslash
            i += 1
            if i >= n:
                break
            e = b[i]
            if e in _OCTAL:
                o = 0
                k = 0
                while i < n and k < 3 and b[i] in _OCTAL:
                    o = o * 8 + (b[i] - 0x30)
                    i += 1
                    k += 1
                out.append(o & 0xFF)
                continue
            mapped = {0x6E: 0x0A, 0x72: 0x0D, 0x74: 0x09,
                      0x62: 0x08, 0x66: 0x0C,
                      0x28: 0x28, 0x29: 0x29, 0x5C: 0x5C}.get(e)
            if mapped is not None:
                out.append(mapped)
                i += 1
            elif e in (0x0A, 0x0D):           # line continuation
                i += 1
                if e == 0x0D and i < n and b[i] == 0x0A:
                    i += 1
            else:                             # unknown escape: literal
                out.append(e)
                i += 1
        elif c == 0x28:
            depth += 1
            out.append(c)
            i += 1
        elif c == 0x29:
            depth -= 1
            if depth == 0:
                return bytes(out), i + 1
            out.append(c)
            i += 1
        else:
            out.append(c)
            i += 1
    return bytes(out), i


def _parse_hex(b: bytes, i: int) -> tuple[bytes, int]:
    digs = bytearray()
    n = len(b)
    while i < n and b[i] != 0x3E:             # '>'
        c = b[i]
        if c in b"0123456789abcdefABCDEF":
            digs.append(c)
        i += 1
    if len(digs) % 2:
        digs.append(0x30)
    return bytes.fromhex(digs.decode("ascii")), i + 1


def extract_pdf_text(data: bytes) -> str:
    """Shown text of every BT…ET block across content streams, with
    newlines at vertical moves (Td/TD dy≠0, T*, ', \")."""
    pieces: list[bytes] = []
    shown = False          # any string shown yet (gates line breaks)
    last_idx = -1          # pieces index of the most recent string
    last_prev_shown = False
    for stream in _content_streams(data):
        n = len(stream)
        i = 0
        in_text = False
        nums: list[bytes] = []                # recent numeric operands

        def _show(s: bytes):
            nonlocal shown, last_idx, last_prev_shown
            last_prev_shown = shown
            last_idx = len(pieces)
            pieces.append(s)
            shown = True

        while i < n:
            c = stream[i]
            if c in b" \t\r\n":
                i += 1
                continue
            if c == 0x28:                     # (
                s, i = _parse_literal(stream, i + 1)
                if in_text:
                    _show(s)
                continue
            if c == 0x3C and stream[i:i + 2] != b"<<":  # < hex string
                s, i = _parse_hex(stream, i + 1)
                if in_text:
                    _show(s)
                continue
            if c == 0x5B or c == 0x5D:        # [ ] — TJ array frame
                i += 1
                continue
            # token: operator or number or name
            j = i
            while j < n and stream[j] not in b" \t\r\n()<>[]/":
                j += 1
            if j == i:                        # '/' name or '<<'
                if c == 0x2F:                 # /Name
                    j = i + 1
                    while j < n and stream[j] not in b" \t\r\n()<>[]/":
                        j += 1
                    i = j
                    continue
                i += 2 if stream[i:i + 2] in (b"<<", b">>") else 1
                continue
            tok = stream[i:j]
            i = j
            if tok in (b"Tj",):
                nums = []
            elif tok in (b"'", b'"'):
                # show-next-line: the newline precedes the string the
                # scanner already captured — insert it BEFORE that
                # piece, and only if text had been shown before it
                if in_text and last_idx >= 0 and last_prev_shown:
                    pieces.insert(last_idx, b"\n")
                    last_idx += 1
                nums = []
            elif tok in (b"Td", b"TD"):
                if in_text and shown and len(nums) >= 1 \
                        and _is_nonzero(nums[-1]):
                    pieces.append(b"\n")
                nums = []
            elif tok == b"T*":
                if in_text and shown:
                    pieces.append(b"\n")
                nums = []
            elif tok == b"BT":
                in_text = True
                nums = []
            elif tok == b"ET":
                in_text = False
                nums = []
            elif tok == b"TJ":
                nums = []
            else:
                first = tok[0:1]
                if first in b"+-.0123456789":
                    nums.append(tok)
                else:
                    nums = []
    return b"".join(pieces).decode("utf-8", errors="replace")


def _is_nonzero(num: bytes) -> bool:
    try:
        return float(num) != 0.0
    except ValueError:
        return False


def synth_pdf_col(text: Column) -> Column:
    """Arrow-batched synthesizer UDF: text → deterministic PDF bytes
    (test/scaffolding path — production reads real blobs)."""
    from pyspark.sql.types import BinaryType

    @F.pandas_udf(BinaryType())
    def _synth(s: pd.Series) -> pd.Series:
        return s.map(lambda t: synth_pdf_blob(t) if t is not None
                     else None)
    return _synth(text)


def pdf_text_col(blob: Column) -> Column:
    """Arrow-batched extraction UDF over a binary PDF column."""
    @F.pandas_udf(StringType())
    def _extract(s: pd.Series) -> pd.Series:
        return s.map(lambda b: extract_pdf_text(bytes(b))
                     if b is not None else None)
    return _extract(blob)


def with_pdf_text(df: DataFrame, blob_col: str = "pdf_blob",
                  out: str = "pdf_text") -> DataFrame:
    return df.withColumn(out, pdf_text_col(F.col(blob_col)))
