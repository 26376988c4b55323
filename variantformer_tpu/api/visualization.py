"""Tissue-expression visualization: self-contained HTML reports.

Lightweight counterpart of the reference's anatomagram widget (C22 in
SURVEY.md §2.1): renders per-tissue predictions as a sorted horizontal bar
heatmap grouped by organ system, with the same prediction-dataframe input
contract (gene_id / tissue names / values). Pure stdlib — emits a single
HTML file, no widget runtime required.
"""

from __future__ import annotations

import html
from pathlib import Path

# Coarse organ-system grouping of the released tissue vocabulary
# (vocabs/tissue_vocab.yaml names), used to organize the report.
TISSUE_GROUPS = {
    "brain": "nervous system",
    "nerve": "nervous system",
    "pituitary": "nervous system",
    "heart": "cardiovascular",
    "artery": "cardiovascular",
    "blood": "cardiovascular",
    "whole blood": "cardiovascular",
    "lung": "respiratory",
    "esophagus": "digestive",
    "stomach": "digestive",
    "colon": "digestive",
    "small intestine": "digestive",
    "liver": "digestive",
    "pancreas": "digestive",
    "minor salivary gland": "digestive",
    "kidney": "urinary",
    "bladder": "urinary",
    "testis": "reproductive",
    "ovary": "reproductive",
    "uterus": "reproductive",
    "vagina": "reproductive",
    "cervix": "reproductive",
    "fallopian tube": "reproductive",
    "prostate": "reproductive",
    "breast": "reproductive",
    "adipose": "connective",
    "muscle": "musculoskeletal",
    "skin": "integumentary",
    "adrenal gland": "endocrine",
    "thyroid": "endocrine",
    "spleen": "immune",
    "cells": "cell lines",
    "lcl": "cell lines",
}
_CELL_LINES = {"A549", "GM23248", "HepG2", "K562", "NCI-H460", "Panc1"}


def tissue_group(name: str) -> str:
    if name in _CELL_LINES:
        return "cell lines"
    lowered = name.lower()
    for prefix, group in TISSUE_GROUPS.items():
        if lowered.startswith(prefix):
            return group
    return "other"


def _color(frac: float) -> str:
    """White -> warm ramp."""
    r = 255
    g = int(245 - 160 * frac)
    b = int(240 - 200 * frac)
    return f"rgb({r},{g},{b})"


def expression_report(
    predictions: dict[str, dict[str, float]],
    out_path: str | Path,
    title: str = "Tissue-specific expression",
) -> str:
    """predictions: {gene_id: {tissue_name: value}} -> writes an HTML report."""
    parts = [
        "<!doctype html><html><head><meta charset='utf-8'>",
        f"<title>{html.escape(title)}</title>",
        "<style>body{font-family:system-ui,sans-serif;margin:2rem;max-width:60rem}"
        ".bar{height:1.1rem;border-radius:3px;display:inline-block;"
        "vertical-align:middle}"
        ".row{display:flex;align-items:center;gap:.5rem;margin:.15rem 0}"
        ".tname{width:18rem;font-size:.85rem;text-align:right}"
        ".val{font-size:.8rem;color:#555;width:4rem}"
        "h3{margin:.8rem 0 .2rem;color:#444}</style></head><body>",
        f"<h1>{html.escape(title)}</h1>",
    ]
    for gene, tissues in predictions.items():
        parts.append(f"<h2>{html.escape(str(gene))}</h2>")
        vmax = max(tissues.values()) or 1.0
        groups: dict[str, list[tuple[str, float]]] = {}
        for name, value in tissues.items():
            groups.setdefault(tissue_group(name), []).append((name, value))
        for group in sorted(groups):
            parts.append(f"<h3>{html.escape(group)}</h3>")
            for name, value in sorted(groups[group], key=lambda kv: -kv[1]):
                frac = max(0.0, min(1.0, value / vmax))
                width = max(2, int(420 * frac))
                parts.append(
                    f"<div class='row'><span class='tname'>{html.escape(name)}"
                    f"</span><span class='bar' style='width:{width}px;"
                    f"background:{_color(frac)};border:1px solid #ccc'></span>"
                    f"<span class='val'>{value:.3f}</span></div>"
                )
    parts.append("</body></html>")
    out_path = Path(out_path)
    out_path.write_text("".join(parts))
    return str(out_path)


def report_from_prediction_df(df, out_path: str | Path, value_column: str = "predicted_expression"):
    """Adapter for VCFProcessor.predict output (list-valued columns)."""
    predictions = {}
    for _, row in df.iterrows():
        predictions[row["gene_id"]] = dict(
            zip(row["tissue_names"], [float(v) for v in row[value_column]])
        )
    return expression_report(predictions, out_path)
