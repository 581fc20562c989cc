"""Page-layout reconstruction: line/word boxes, layout text, ruled tables.

Re-implements (from scratch, against our own parser's text runs) the
behaviors the reference gets from pdfplumber:

- ``extract_text(layout=True)`` — monospace grid rendering with preserved
  horizontal offsets (reference backend/pdf_plumber.py:150);
- ``extract_tables()`` / ``find_tables()`` — ruling-line grid detection
  and per-cell text (reference backend/pdf_plumber.py:147,155);
- bbox "crops" above / between / below tables
  (reference backend/pdf_plumber.py:159-197);
- rotation vote + fix: count vertical vs horizontal text boxes, rotate
  the page in memory when vertical wins
  (reference backend/pdf_rotation.py:5-53 — T8 in SURVEY.md §2.3).
"""

from __future__ import annotations

import bisect

from .parser import PDFPage, Segment, TextRun

CHAR_W = 6.0          # monospace grid cell width (pt) for layout rendering
LINE_TOL = 3.0        # y tolerance when grouping runs into lines


# --------------------------------------------------------------------------
# rotation (T8)
# --------------------------------------------------------------------------

def rotation_vote(page: PDFPage) -> int:
    """90 if vertical text boxes outnumber horizontal ones, else 0."""
    vertical = sum(1 for r in page.runs if r.height > r.width)
    horizontal = len(page.runs) - vertical
    return 90 if vertical > horizontal else 0


def rotate_page(page: PDFPage) -> PDFPage:
    """Return a new page rotated 90° so vertical runs read horizontally."""
    W, H = page.width, page.height
    out = PDFPage(number=page.number, width=H, height=W, rotate=0,
                  ocr_text=page.ocr_text, has_image=page.has_image)
    for r in page.runs:
        # device (x, y_top) → rotated-page coordinates
        out.runs.append(TextRun(x=r.y, y=W - r.x - r.size, text=r.text,
                                size=r.size, vertical=not r.vertical))
    for s in page.hlines:
        out.vlines.append(Segment(s.y0, W - s.x1, s.y0, W - s.x0))
    for s in page.vlines:
        out.hlines.append(Segment(s.y0, W - s.x0, s.y1, W - s.x0))
    return out


def auto_rotate(page: PDFPage) -> tuple[PDFPage, bool]:
    cached = getattr(page, "_auto_rotated", None)
    if cached is not None:
        return cached
    if rotation_vote(page) == 90:
        result = (rotate_page(page), True)
    else:
        result = (page, False)
    page._auto_rotated = result  # memoized: callers re-rotate per render
    return result


# --------------------------------------------------------------------------
# line reconstruction + text rendering
# --------------------------------------------------------------------------

def page_lines(page: PDFPage) -> list[list[TextRun]]:
    """Memoized full-page line grouping (rendered 2-3x per page)."""
    cached = getattr(page, "_lines", None)
    if cached is None:
        cached = page._lines = group_lines(page.runs)
    return cached


def group_lines(runs: list[TextRun]) -> list[list[TextRun]]:
    """Cluster horizontal runs into visual lines by y, each sorted by x."""
    horiz = [r for r in runs if not r.vertical]
    horiz.sort(key=lambda r: (r.y, r.x))
    lines: list[list[TextRun]] = []
    for r in horiz:
        if lines and abs(lines[-1][0].y - r.y) <= LINE_TOL:
            lines[-1].append(r)
        else:
            lines.append([r])
    for line in lines:
        line.sort(key=lambda r: r.x)
    return lines


def word_boxes(page: PDFPage) -> list[dict]:
    """T9: explicit line/word boxes — array<struct<x0,y0,x1,y1,text>>."""
    boxes = []
    rnd = round
    for r in page.runs:
        x = r.x
        w_unit = r.size * 0.6  # per-char advance, constant per run
        y0 = rnd(r.y, 2)
        y1 = rnd(r.y + r.size, 2)
        for word in r.text.split(" "):
            if word:
                boxes.append({"x0": rnd(x, 2), "y0": y0,
                              "x1": rnd(x + len(word) * w_unit, 2),
                              "y1": y1, "text": word})
            x += (len(word) + 1) * w_unit
    return boxes


def render_layout_page(page: PDFPage) -> str | None:
    return _render_layout_lines(page_lines(page), page.width)


def render_layout_text(runs: list[TextRun], page_width: float) -> str | None:
    """Monospace-grid rendering preserving horizontal offsets.

    Each run lands at column round(x / CHAR_W); lines are padded to the
    page's character width (matching the trailing-space behavior visible
    in the reference's golden fixtures).
    """
    return _render_layout_lines(group_lines(runs), page_width)


def _render_layout_lines(lines: list[list[TextRun]],
                         page_width: float) -> str | None:
    if not lines:
        return None
    width_chars = int(page_width // CHAR_W)
    out = []
    for line in lines:
        buf: list[str] = []
        for r in line:
            col = max(0, int(round(r.x / CHAR_W)))
            if col > len(buf):
                buf.extend(" " * (col - len(buf)))
            elif col < len(buf):
                buf.append(" ")  # never overwrite previous run
            buf.extend(r.text)
        s = "".join(buf)
        if len(s) < width_chars:
            s = s.ljust(width_chars)
        out.append(s)
    return "\n".join(out)


def render_plain_page(page: PDFPage) -> str:
    return "\n".join(" ".join(r.text for r in line)
                     for line in page_lines(page))


def render_plain_text(runs: list[TextRun]) -> str:
    """Raw reading-order text: one line per visual line, runs joined by a
    space — the engine's 'secondary extractor' rendering (cf. PyMuPDF
    ``page.get_text()``, reference backend/pdf_plumber.py:322)."""
    lines = group_lines(runs)
    return "\n".join(" ".join(r.text for r in line) for line in lines)


def crop_runs(runs: list[TextRun], y_top: float, y_bottom: float) -> list[TextRun]:
    """Runs whose vertical center lies in [y_top, y_bottom) — bbox crop."""
    out = []
    for r in runs:
        cy = r.y + r.height / 2.0
        if y_top <= cy < y_bottom:
            out.append(r)
    return out


# --------------------------------------------------------------------------
# ruled-table detection
# --------------------------------------------------------------------------

class Table:
    def __init__(self, bbox: tuple[float, float, float, float],
                 rows: list[list[str | None]]):
        self.bbox = bbox  # (x0, top, x1, bottom) in top-down coords
        self.rows = rows


def _cluster(vals: list[float], tol: float = 1.5) -> list[float]:
    out: list[float] = []
    for v in sorted(vals):
        if not out or v - out[-1] > tol:
            out.append(v)
    return out


def detect_tables(page: PDFPage) -> list[Table]:
    """Find ruled grids: ≥2 horizontal and ≥2 vertical overlapping lines.

    Grids are discovered by connectivity — segments whose bounding boxes
    intersect belong to one grid — so multiple disjoint tables per page
    are supported.
    """
    segs = page.hlines + page.vlines
    if len(segs) < 4:
        return []
    # union-find over segments by bbox intersection
    parent = list(range(len(segs)))

    def find(i: int) -> int:
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    def union(i: int, j: int) -> None:
        parent[find(i)] = find(j)

    def bbox(s: Segment) -> tuple[float, float, float, float]:
        return (min(s.x0, s.x1) - 1, min(s.y0, s.y1) - 1,
                max(s.x0, s.x1) + 1, max(s.y0, s.y1) + 1)

    boxes = [bbox(s) for s in segs]
    # sweep by x to keep this near O(n log n) for typical grids
    order = sorted(range(len(segs)), key=lambda i: boxes[i][0])
    for ii in range(len(order)):
        i = order[ii]
        for jj in range(ii + 1, len(order)):
            j = order[jj]
            if boxes[j][0] > boxes[i][2]:
                break
            if (boxes[i][0] <= boxes[j][2] and boxes[j][0] <= boxes[i][2]
                    and boxes[i][1] <= boxes[j][3] and boxes[j][1] <= boxes[i][3]):
                union(i, j)

    groups: dict[int, list[Segment]] = {}
    for i, s in enumerate(segs):
        groups.setdefault(find(i), []).append(s)

    tables = []
    for members in groups.values():
        hs = [s for s in members if abs(s.y1 - s.y0) <= 0.5]
        vs = [s for s in members if abs(s.x1 - s.x0) <= 0.5]
        if len(hs) < 2 or len(vs) < 2:
            continue
        row_ys = _cluster([s.y0 for s in hs])
        col_xs = _cluster([s.x0 for s in vs])
        if len(row_ys) < 2 or len(col_xs) < 2:
            continue
        x0, x1 = col_xs[0], col_xs[-1]
        top, bottom = row_ys[0], row_ys[-1]
        inside = [r for r in page.runs if not r.vertical
                  and x0 - 1 <= r.x <= x1 + 1
                  and top - 1 <= r.y + r.height / 2 <= bottom + 1]
        # single-pass bucket assignment (bisect) instead of scanning all
        # runs per cell — same membership as `cx0 <= x < cx1` /
        # `ry0 <= ymid < ry1` (bisect_right is exactly the half-open rule)
        n_rows, n_cols = len(row_ys) - 1, len(col_xs) - 1
        cells: dict[tuple[int, int], list] = {}
        for r in inside:
            ymid = r.y + r.height / 2
            ri = bisect.bisect_right(row_ys, ymid) - 1
            ci = bisect.bisect_right(col_xs, r.x) - 1
            if 0 <= ri < n_rows and 0 <= ci < n_cols:
                cells.setdefault((ri, ci), []).append(r)
        rows: list[list[str | None]] = []
        for ri in range(n_rows):
            row: list[str | None] = []
            for ci in range(n_cols):
                cell_runs = sorted(cells.get((ri, ci), ()),
                                   key=lambda r: (r.y, r.x))
                row.append(" ".join(r.text for r in cell_runs) or None)
            rows.append(row)
        tables.append(Table((x0, top, x1, bottom), rows))
    tables.sort(key=lambda t: (t.bbox[1], t.bbox[0]))
    return tables
