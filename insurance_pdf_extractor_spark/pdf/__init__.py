"""Minimal pure-Python PDF layer.

The sandbox ships no PDF libraries (no pdfplumber / PyMuPDF / pypdf), so
this package provides both halves from scratch:

- :mod:`.writer` — a deterministic PDF 1.4 writer used ONLY to synthesize
  test fixtures (uncompressed content streams, ruled tables, rotated /
  reversed / scanned page variants).
- :mod:`.parser` — the engine-side reader: object/xref-free scanning of
  the PDF body, content-stream tokenization into positioned text runs,
  ruling-line collection.
- :mod:`.layout` — line/word-box reconstruction, layout-preserving text
  rendering, ruling-grid table detection (the Spark-side equivalent of
  the reference's pdfplumber usage — reference backend/pdf_plumber.py).
"""
