"""Deterministic Common-Crawl-style web-pages table + byte-identical
text extraction (the BASELINE.json input shape).

Table: ``(url string, warc_ts timestamp, html binary, text string,
lang string)``.  Synthesis is pure-deterministic from the TPC-H orders
rows (no external data, per the graft rule): each order becomes one
"profile page" whose HTML embeds the same person fields the ER pipeline
consumes, so the linkage runs unchanged over web pages.

The **extraction invariant** (BASELINE.json ``input_hint``): extracted
text must be byte-identical per url to the reference extractor.  The
reference pipeline has no HTML stage, so the reference extractor is
defined ONCE here (:func:`extract_text_py`, pure Python) and the Spark
path must reproduce it byte-for-byte through an Arrow-batched pandas UDF
(:func:`extract_text_udf`); pytest asserts equality.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from namematch_spark.sources.records import person_records

_HTML_TEMPLATE = (
    "<html><head><title>{title}</title></head><body>"
    "<h1>{first} {last}</h1>"
    "<p>DOB: {dob}</p><p>Gender: {gender}</p><p>Age: {age}</p>"
    "<div class=\"uid\">{uid}</div>"
    "<p>junk &amp; boilerplate</p></body></html>"
)


def synth_web_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One page per person record; html built with native expressions
    (format_string) so synthesis itself is distributed and seedless."""
    from namematch_spark.operators.preprocess import spread_input
    # spread: page synthesis AND the downstream Arrow-UDF extraction
    # inherit the scan's partitioning — one small input file would run
    # both on a single task (guide §2.5)
    recs = spread_input(person_records(spark, sf_dir))
    html_str = F.format_string(
        _HTML_TEMPLATE.replace("{title}", "%s").replace("{first}", "%s")
        .replace("{last}", "%s").replace("{dob}", "%s")
        .replace("{gender}", "%s").replace("{age}", "%s")
        .replace("{uid}", "%s"),
        F.col("record_id"), F.col("first_name"), F.col("last_name"),
        F.col("dob"), F.col("gender"), F.col("age"), F.col("uid"))
    return recs.select(
        F.concat(F.lit("https://example.org/profile/"),
                 F.col("record_id")).alias("url"),
        F.to_timestamp(F.lit("2024-06-01 00:00:00")).alias("warc_ts"),
        F.encode(html_str, "utf-8").alias("html"),
        html_str.alias("__html_str"),
        F.lit("en").alias("lang"),
        F.col("record_id").alias("__record_id"),
        F.col("uid").alias("__uid"),
        F.col("true_entity").alias("__true_entity"),
    ).withColumn("text", _extract_expr(F.col("__html_str"))) \
     .drop("__html_str")


_TAG_RE = re.compile(r"<[^>]+>")


def extract_text_py(html: bytes) -> str:
    """THE reference extractor (single source of truth): decode utf-8,
    strip tags to newline-separated text, unescape the minimal entity
    set, collapse blank runs.  Pure deterministic function of the bytes.
    """
    s = html.decode("utf-8", errors="replace")
    s = _TAG_RE.sub("\n", s)
    s = (s.replace("&amp;", "&").replace("&lt;", "<")
         .replace("&gt;", ">").replace("&quot;", '"'))
    lines = [ln.strip() for ln in s.split("\n")]
    return "\n".join(ln for ln in lines if ln)


def _extract_expr(html_str_col):
    """Native-expression mirror of :func:`extract_text_py` for *string*
    input (used only inside synthesis, where the string pre-exists)."""
    s = F.regexp_replace(html_str_col, "<[^>]+>", "\n")
    s = F.replace(s, F.lit("&amp;"), F.lit("&"))
    s = F.replace(s, F.lit("&lt;"), F.lit("<"))
    s = F.replace(s, F.lit("&gt;"), F.lit(">"))
    s = F.replace(s, F.lit("&quot;"), F.lit('"'))
    s = F.regexp_replace(s, r"[ \t\r]*\n[ \t\r]*", "\n")
    s = F.regexp_replace(s, r"\n+", "\n")
    return F.regexp_replace(s, r"^\n|\n$", "")


def extract_text_udf(pages: DataFrame, html_col: str = "html",
                     out_col: str = "extracted_text") -> DataFrame:
    """Arrow-batched extraction over the binary column — the production
    path for real WARC payloads (bytes → text), byte-identical per url
    to :func:`extract_text_py` by construction (it calls it)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf[out_col] = [
                extract_text_py(bytes(b)) if b is not None else ""
                for b in pdf[html_col]]
            yield pdf

    from pyspark.sql.types import StringType, StructField, StructType
    # build a fresh StructType: .add() would mutate the DataFrame's
    # cached schema object in place
    schema = StructType(list(pages.schema.fields)
                        + [StructField(out_col, StringType())])
    return pages.mapInPandas(run, schema=schema)


def pages_to_records(pages: DataFrame) -> DataFrame:
    """Parse extracted page text back into person records (the graft
    adapter: web pages → ER input).  record_id = url suffix; fields from
    the labeled text lines.  Pure native expressions."""
    txt = F.col("text")
    return pages.select(
        F.element_at(F.split(F.col("url"), "/"), -1).alias("record_id"),
        F.split(F.element_at(F.split(txt, "\n"), 2), " ")
        .getItem(0).alias("first_name"),
        F.array_join(F.slice(
            F.split(F.element_at(F.split(txt, "\n"), 2), " "), 2, 10), " ")
        .alias("last_name"),
        F.regexp_extract(txt, r"DOB: ?([0-9-]*)", 1).alias("dob"),
        F.regexp_extract(txt, r"Gender: ?([A-Z]*)", 1).alias("gender"),
        F.regexp_extract(txt, r"Age: ?([0-9]*)", 1).alias("age"),
        F.coalesce(F.regexp_extract(txt, r"(?m)^([0-9]+)$", 1),
                   F.lit("")).alias("uid"),
    )
