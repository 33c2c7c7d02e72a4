"""Stage 9 — run report (reference: ``generate_report.py:34-55``).

The reference renders a papermill notebook to HTML; the Spark-native
equivalent is a markdown + JSON report of the same content: per-stage
row counts, blocking pair-completeness, model metrics per model,
threshold(s), phat histogram, cluster-size distribution — everything
the reference's ``nm_info.yaml`` + report notebook surface.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def phat_histogram_df(scored: DataFrame, bins: int = 10) -> DataFrame:
    """A10 — phat distribution in 1/bins buckets as a DataFrame
    (``model_evaluation_functions.py:279-287``): the aggregation the
    report collects, exposed so the contract can value-check the
    binning itself (``er_phat_hist``)."""
    return (
        scored
        .withColumn("bucket", F.floor(F.col("phat") * bins) / bins)
        .groupBy("bucket").agg(F.count("*").alias("n")))


def phat_histogram(scored: DataFrame, bins: int = 10) -> list[dict]:
    """A10 — phat distribution in 1/bins buckets
    (``model_evaluation_functions.py:279-287``)."""
    rows = phat_histogram_df(scored, bins).orderBy("bucket").collect()
    total = sum(r["n"] for r in rows) or 1
    return [{"bucket": float(r["bucket"]), "n": int(r["n"]),
             "share": round(r["n"] / total, 4)} for r in rows]


def cluster_size_distribution_df(clusters: DataFrame) -> DataFrame:
    """A9/A10 — cluster-size frequency table as a DataFrame (the
    report's two-level count aggregation, oracle-checked via
    ``er_cluster_sizes``)."""
    return (
        clusters.groupBy("cluster_id").agg(F.count("*").alias("size"))
        .groupBy("size").agg(F.count("*").alias("n_clusters")))


def cluster_size_distribution(clusters: DataFrame) -> list[dict]:
    rows = cluster_size_distribution_df(clusters).orderBy("size").collect()
    return [{"size": int(r["size"]), "n_clusters": int(r["n_clusters"])}
            for r in rows]


def generate_report(result, out_dir: str) -> str:
    """Write ``matching_report.md`` + ``nm_info.json`` for a
    :class:`~namematch_spark.pipeline.PipelineResult` (the reference's
    ``matching_report.html`` + ``nm_info.yaml`` pair,
    ``generate_report.py:34-55``, ``base.py:203-209``).

    Returns the markdown path.
    """
    os.makedirs(out_dir, exist_ok=True)
    metrics = dict(result.metrics)
    counts = {
        "all_names": result.all_names.count(),
        "must_links": result.must_links.count(),
        "candidate_blockstring_pairs": result.candidate_nn_pairs.count(),
        "data_rows": result.data_rows.count(),
        "potential_links": result.potential_links.count(),
        "clusters": result.clusters.select("cluster_id")
        .distinct().count(),
    }
    hist = phat_histogram(result.potential_links)
    sizes = cluster_size_distribution(result.clusters)

    info = {"counts": counts, "metrics": metrics,
            "phat_histogram": hist, "cluster_sizes": sizes}
    with open(os.path.join(out_dir, "nm_info.json"), "w") as f:
        json.dump(info, f, indent=1, default=str)

    lines = ["# Matching report", "", "## Stage row counts", ""]
    lines += [f"- {k}: {v:,}" for k, v in counts.items()]
    lines += ["", "## Model(s)", ""]
    for name, m in metrics.get("models", {}).items():
        lines.append(f"- **{name}**: threshold {m.get('threshold')}, "
                     f"{m.get('n_features')} features, "
                     f"precision {m.get('precision')}, "
                     f"recall {m.get('recall')}")
        # M5 universe splits (model_evaluation_functions.py:266-329):
        # exactmatch pairs are where a linkage model degrades silently.
        # Always rendered (n=0 shows as empty) — the report's contract
        # is the 3-universe block, like the reference notebook.
        for univ, um in m.get("universes", {}).items():
            lines.append(
                f"    - {univ}: precision {um.get('precision')}, "
                f"recall {um.get('recall')}, "
                f"baserate {um.get('baserate')}, "
                f"n={um.get('n_eval', 0)}")
    if "pairwise" in metrics:
        pw = metrics["pairwise"]
        lines += ["", "## Pairwise evaluation (labeled pairs)", "",
                  f"- precision {pw['precision']:.4f}, "
                  f"recall {pw['recall']:.4f}, F1 {pw['f1']:.4f}"]
    if "pair_completeness" in metrics:
        lines += ["", f"Blocking pair completeness: "
                  f"{metrics['pair_completeness']:.4f}"]
    lines += ["", "## phat distribution (potential links)", ""]
    lines += [f"- [{h['bucket']:.1f}, +0.1): {h['n']:,} ({h['share']})"
              for h in hist]
    lines += ["", "## Cluster size distribution", ""]
    lines += [f"- size {s['size']}: {s['n_clusters']:,}" for s in sizes]
    path = os.path.join(out_dir, "matching_report.md")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    # the reference's e2e contract is an HTML artifact
    # (``generate_report.py:34-55`` renders a papermill notebook;
    # ``tests/unit/test_namematcher.py:6-20`` asserts it exists) — emit
    # the same content as standalone HTML from the markdown lines
    with open(os.path.join(out_dir, "matching_report.html"), "w") as f:
        f.write(_md_to_html(lines))
    return path


def _md_to_html(lines: list[str]) -> str:
    """Minimal renderer for the report's own markdown subset
    (headings + nested bullet lists + bold) — no external deps."""
    import html as _h
    out = ["<!DOCTYPE html><html><head><meta charset='utf-8'>"
           "<title>Matching report</title>"
           "<style>body{font-family:sans-serif;max-width:60em;"
           "margin:2em auto}li{margin:2px 0}</style></head><body>"]
    depth = 0

    def close_lists(to: int) -> None:
        nonlocal depth
        while depth > to:
            out.append("</ul>")
            depth -= 1

    for ln in lines:
        stripped = ln.lstrip()
        indent = (len(ln) - len(stripped)) // 4
        if stripped.startswith("#"):
            close_lists(0)
            level = len(stripped) - len(stripped.lstrip("#"))
            text = _h.escape(stripped[level:].strip())
            out.append(f"<h{level}>{text}</h{level}>")
        elif stripped.startswith("- "):
            while depth < indent + 1:
                out.append("<ul>")
                depth += 1
            close_lists(indent + 1)
            text = _h.escape(stripped[2:])
            # **bold** spans
            while "**" in text:
                text = text.replace("**", "<b>", 1) \
                    .replace("**", "</b>", 1)
            out.append(f"<li>{text}</li>")
        elif stripped:
            close_lists(0)
            out.append(f"<p>{_h.escape(stripped)}</p>")
    close_lists(0)
    out.append("</body></html>")
    return "".join(out)
