#!/usr/bin/env python
"""Generate the notebooks/ directory: runnable Jupyter equivalents of the
reference's notebook layer (/root/reference/notebooks/: vcf2exp, vcf2risk,
eqtl_analysis, variant2exp, snp_indel_predictions, variant2risk).

Each notebook wraps the same flow as its examples/ script — real released
artifacts when present, otherwise the self-contained synthetic genome +
tiny random model, so every notebook executes anywhere (CI runs one under
nbclient). Regenerate after editing:  python scripts/make_notebooks.py
"""

from __future__ import annotations

import sys
from pathlib import Path

import nbformat

REPO = Path(__file__).resolve().parent.parent

SETUP = """\
import sys
from pathlib import Path

REPO = Path().resolve()
while not (REPO / "variantformer_tpu").is_dir():
    if REPO == REPO.parent:  # reached filesystem root
        raise FileNotFoundError(
            "variantformer_tpu repo not found above the notebook's cwd -- "
            "launch jupyter from inside the repository checkout"
        )
    REPO = REPO.parent
sys.path[:0] = [str(REPO), str(REPO / "examples")]

import numpy as np
import pandas as pd
from IPython.display import HTML, display

from _common import artifacts_present, build_processor

if not artifacts_present():
    # Synthetic demo mode uses a tiny random model: run on CPU so the demo
    # is deterministic and does not hinge on accelerator availability
    # (CI executes this notebook under nbclient).
    import jax

    jax.config.update("jax_platforms", "cpu")
"""

RUN = """\
import runpy

mod = runpy.run_path(str(REPO / "examples" / "{script}.py"), run_name="notebook")
"""

ANATOMAGRAM_CELL = """\
# Visualize the per-tissue predictions on the interactive anatomagram
# (male/female/brain views, UBERON-mapped; hover for values).
from variantformer_tpu.api.anatomagram import anatomagram_from_prediction_df

page = anatomagram_from_prediction_df(out, "/tmp/anatomagram_vcf2exp.html")
display(HTML(Path(page).read_text()))
"""


def nb(cells):
    notebook = nbformat.v4.new_notebook()
    notebook.metadata["kernelspec"] = {
        "display_name": "Python 3", "language": "python", "name": "python3",
    }
    notebook.cells = [
        nbformat.v4.new_markdown_cell(src) if kind == "md"
        else nbformat.v4.new_code_cell(src)
        for kind, src in cells
    ]
    return notebook


NOTEBOOKS = {
    "vcf2exp": [
        ("md", "# vcf2exp — tissue-specific expression from a donor VCF\n\n"
               "Predicts per-tissue gene expression for query genes from a "
               "donor's phased VCF: diploid consensus → BPE windows → "
               "hierarchical CRE↔gene transformer → tissue heads.\n\n"
               "With the released artifacts this runs the full 1.2B-class "
               "model on TPU (~0.2 s/gene across 54 tissues vs the "
               "reference's ~3-4 min on H100); without them it demonstrates "
               "the identical flow on a synthetic genome with a tiny random "
               "model."),
        ("code", SETUP),
        ("code", RUN.format(script="vcf2exp") + "out = mod[\"main\"]()\n"
                 "out.explode([\"tissue_names\", \"predicted_expression\"])"
                 "[[\"gene_id\", \"tissue_names\", \"predicted_expression\"]]"),
        ("md", "## Anatomagram\n\nInteractive UBERON-mapped body/brain "
               "views; hover a region for the contributing tissues."),
        ("code", ANATOMAGRAM_CELL),
    ],
    "vcf2risk": [
        ("md", "# vcf2risk — Alzheimer's-disease risk from a donor VCF\n\n"
               "Runs the expression model to get gene–tissue embeddings, then "
               "the per-tissue gradient-boosted-tree AD-risk heads "
               "(framework-native GBT engine; treelite/sklearn checkpoints "
               "convert via `api.ad_risk`)."),
        ("code", SETUP),
        ("code", RUN.format(script="vcf2risk") + "out = mod[\"main\"]()\n"
                 "out[[\"gene_id\", \"tissue_name\", \"ad_risk\"]]"),
        ("md", "## Risk anatomagram"),
        ("code", "from variantformer_tpu.api.anatomagram import anatomagram_from_risk_df\n"
                 "page = anatomagram_from_risk_df(out, \"/tmp/anatomagram_risk.html\")\n"
                 "display(HTML(Path(page).read_text()))"),
    ],
    "eqtl_analysis": [
        ("md", "# eqtl_analysis — variant effect scores vs eQTL catalogs\n\n"
               "Scores variants with the VEP path (ref/het/hom triple "
               "forward), pivots `{POP}-{zyg}-exp` columns, computes log2 "
               "fold changes, and joins against an eQTL catalog."),
        ("code", SETUP),
        ("code", RUN.format(script="eqtl_analysis") + "result = mod[\"main\"]()\n"
                 "result"),
    ],
    "variant2exp": [
        ("md", "# variant2exp — single-variant expression effects (VEP)\n\n"
               "For (chrom, pos, ref, alt) variants near a gene: builds "
               "ref/het/hom consensus windows, runs the triple forward, and "
               "reports per-tissue expression under each zygosity plus "
               "log2fc effect sizes."),
        ("code", SETUP),
        ("code", RUN.format(script="variant2exp") + "scores = mod[\"main\"]()\n"
                 "scores.head()"),
    ],
    "snp_indel_predictions": [
        ("md", "# snp_indel_predictions — author VCFs from variant tables\n\n"
               "Creates VCFs from in-memory variant specs (SNPs + indels), "
               "merges variant sets into one bgzf+tabix VCF, and compares "
               "variant-carrying vs reference-genome expression."),
        ("code", SETUP),
        ("code", RUN.format(script="snp_indel_predictions") + "deltas = mod[\"main\"]()\n"
                 "deltas"),
    ],
    "variant2risk": [
        ("md", "# variant2risk — in-silico edits → AD-risk deltas\n\n"
               "Applies in-silico variants near a gene, recomputes gene–"
               "tissue embeddings under each zygosity, and runs the AD-risk "
               "heads to estimate per-variant risk shifts."),
        ("code", SETUP),
        ("code", RUN.format(script="variant2risk") + "out = mod[\"main\"]()\n"
                 "out"),
    ],
    "vcf2embed": [
        ("md", "# vcf2embed — embedding clustering and 2D projection\n\n"
               "Collects the model's pooled gene–tissue embeddings across "
               "genes × tissues, clusters them, and projects to 2D (UMAP "
               "when installed, PCA otherwise) — the reference's vcf2embed "
               "clustering flow. The scatter below is interactive: hover a "
               "point for its gene, tissue, predicted expression and "
               "cluster."),
        ("code", SETUP),
        ("code", RUN.format(script="vcf2embed") + "df = mod[\"main\"]()\n"
                 "df"),
        ("md", "## Interactive scatter"),
        ("code", "display(HTML(Path(mod[\"SCATTER_HTML\"]).read_text()))"),
    ],
}


def main():
    out_dir = REPO / "notebooks"
    out_dir.mkdir(exist_ok=True)
    for name, cells in NOTEBOOKS.items():
        path = out_dir / f"{name}.ipynb"
        nbformat.write(nb(cells), str(path))
        print("wrote", path)
    return 0


if __name__ == "__main__":
    sys.exit(main())
