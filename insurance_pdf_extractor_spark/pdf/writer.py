"""Deterministic minimal PDF 1.4 writer (fixtures only).

Produces uncompressed PDFs with:
- positioned text runs (``Tm`` + ``Tj``), optionally vertically oriented
  (for rotation-fixture pages, cf. reference backend/pdf_rotation.py:5-23);
- ruled table grids (``m``/``l``/``S`` line segments) with cell text;
- image-only "scanned" pages carrying a private ``/GraftOCRText`` entry
  that the engine's deterministic fake-OCR reads (the real Tesseract path
  is stubbed — see operators/tokenize.py);
- page-level ``/Rotate``.

This module exists so fixtures are synthesized with zero external data
and zero external libraries; it is NOT part of the extraction engine.
"""

from __future__ import annotations

from dataclasses import dataclass, field


def _esc(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


@dataclass
class _Page:
    width: float = 612.0
    height: float = 792.0
    rotate: int = 0
    ocr_text: str | None = None
    has_image: bool = False
    ops: list[str] = field(default_factory=list)

    # -- drawing API (y measured from the TOP of the page) ---------------

    def text(self, x: float, y_top: float, s: str, size: float = 10.0,
             vertical: bool = False) -> None:
        """One text run with its baseline ``size`` below ``y_top``."""
        y = self.height - y_top - size
        if vertical:
            # 90°-rotated glyph run: bbox becomes taller than wide.
            tm = f"0 1 -1 0 {x:.2f} {y:.2f} Tm"
        else:
            tm = f"1 0 0 1 {x:.2f} {y:.2f} Tm"
        self.ops.append(f"BT /F1 {size:g} Tf {tm} ({_esc(s)}) Tj ET")

    def hline(self, x0: float, x1: float, y_top: float) -> None:
        y = self.height - y_top
        self.ops.append(f"{x0:.2f} {y:.2f} m {x1:.2f} {y:.2f} l S")

    def vline(self, x: float, y0_top: float, y1_top: float) -> None:
        ya = self.height - y0_top
        yb = self.height - y1_top
        self.ops.append(f"{x:.2f} {ya:.2f} m {x:.2f} {yb:.2f} l S")

    def table(self, x: float, y_top: float, rows: list[list[str]],
              col_widths: list[float], row_height: float = 16.0,
              size: float = 9.0) -> float:
        """Draw a ruled grid with cell text; returns y_top below the table."""
        ncols = len(col_widths)
        nrows = len(rows)
        xs = [x]
        for w in col_widths:
            xs.append(xs[-1] + w)
        for r in range(nrows + 1):
            self.hline(x, xs[-1], y_top + r * row_height)
        for cx in xs:
            self.vline(cx, y_top, y_top + nrows * row_height)
        for r, row in enumerate(rows):
            for c, cell in enumerate(row[:ncols]):
                if cell:
                    self.text(xs[c] + 2.0, y_top + r * row_height + 3.0,
                              str(cell), size=size)
        return y_top + nrows * row_height

    def image_placeholder(self) -> None:
        """Mark the page as image-bearing (scanned fixture)."""
        self.has_image = True
        self.ops.append("q 612 0 0 792 0 0 cm /Im1 Do Q")


class PDFWriter:
    """Accumulates pages; ``tobytes()`` emits a complete PDF file."""

    def __init__(self) -> None:
        self.pages: list[_Page] = []

    def add_page(self, width: float = 612.0, height: float = 792.0,
                 rotate: int = 0, ocr_text: str | None = None) -> _Page:
        p = _Page(width=width, height=height, rotate=rotate, ocr_text=ocr_text)
        self.pages.append(p)
        return p

    def tobytes(self) -> bytes:
        objs: list[bytes] = []  # 1-indexed object bodies

        def add(body: bytes) -> int:
            objs.append(body)
            return len(objs)

        font_num = add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
        # tiny 1x1 gray image for scanned fixtures
        img_data = b"\x80"
        img_num = add(
            b"<< /Type /XObject /Subtype /Image /Width 1 /Height 1"
            b" /ColorSpace /DeviceGray /BitsPerComponent 8 /Length "
            + str(len(img_data)).encode()
            + b" >>\nstream\n" + img_data + b"\nendstream"
        )

        page_nums: list[int] = []
        kids_placeholder = len(objs) + 1 + 2 * len(self.pages)  # pages-root num
        for pg in self.pages:
            content = "\n".join(pg.ops).encode("latin-1")
            c_num = add(b"<< /Length " + str(len(content)).encode()
                        + b" >>\nstream\n" + content + b"\nendstream")
            extra = b""
            if pg.ocr_text is not None:
                extra += b" /GraftOCRText (" + _esc(pg.ocr_text).encode("latin-1") + b")"
            if pg.rotate:
                extra += b" /Rotate " + str(pg.rotate).encode()
            res = b"<< /Font << /F1 " + str(font_num).encode() + b" 0 R >>"
            if pg.has_image:
                res += b" /XObject << /Im1 " + str(img_num).encode() + b" 0 R >>"
            res += b" >>"
            p_num = add(
                b"<< /Type /Page /Parent " + str(kids_placeholder).encode()
                + b" 0 R /MediaBox [0 0 " + f"{pg.width:g} {pg.height:g}".encode()
                + b"] /Resources " + res
                + b" /Contents " + str(c_num).encode() + b" 0 R" + extra + b" >>"
            )
            page_nums.append(p_num)

        kids = b"[" + b" ".join(str(n).encode() + b" 0 R" for n in page_nums) + b"]"
        pages_num = add(b"<< /Type /Pages /Kids " + kids + b" /Count "
                        + str(len(page_nums)).encode() + b" >>")
        assert pages_num == kids_placeholder
        cat_num = add(b"<< /Type /Catalog /Pages " + str(pages_num).encode() + b" 0 R >>")

        out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
        offsets = [0]
        for i, body in enumerate(objs, start=1):
            offsets.append(len(out))
            out += str(i).encode() + b" 0 obj\n" + body + b"\nendobj\n"
        xref_at = len(out)
        out += b"xref\n0 " + str(len(objs) + 1).encode() + b"\n"
        out += b"0000000000 65535 f \n"
        for off in offsets[1:]:
            out += f"{off:010d} 00000 n \n".encode()
        out += (b"trailer\n<< /Size " + str(len(objs) + 1).encode()
                + b" /Root " + str(cat_num).encode() + b" 0 R >>\n"
                + b"startxref\n" + str(xref_at).encode() + b"\n%%EOF\n")
        return bytes(out)
