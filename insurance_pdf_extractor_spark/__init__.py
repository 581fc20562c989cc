"""insurance_pdf_extractor_spark — a from-scratch PySpark-native document
extraction engine with the query/data-processing capabilities of the
reference repo kalaiyarasi2/Insurance_pdf_extractor (see SURVEY.md).

Input table shape (per BASELINE.json input_hint):
    (url string, warc_ts timestamp, html binary, text string, lang string)

Pipeline (five vectorized Arrow stages over salted, size-balanced
partitions — SURVEY.md §3.1 "Spark rebuild"):
    sniff → tokenize → segment → fields → finalize
"""

__version__ = "0.1.0"
