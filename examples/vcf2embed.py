"""vcf2embed — gene-tissue embedding extraction, clustering, 2D projection.

Equivalent of the reference's vcf2embed notebook flow
(/root/reference/notebooks/vcf2embed.py: genome-wide expression profiles →
UMAP → interactive colored scatter): collect pooled gene-tissue embeddings
across genes x tissues, cluster them, project to 2D (UMAP when installed,
PCA otherwise), and write an interactive HTML scatter with hover tooltips.
"""

import sys

import numpy as np
import pandas as pd

from _common import artifacts_present, build_processor

SCATTER_HTML = "/tmp/vcf2embed_scatter.html"


def project_2d(embeddings: np.ndarray) -> np.ndarray:
    if len(embeddings) >= 4:  # UMAP needs n_neighbors >= 2 points of context
        try:
            import umap  # type: ignore

            return umap.UMAP(
                n_components=2, n_neighbors=min(30, len(embeddings) - 1),
                min_dist=0.05,
            ).fit_transform(embeddings)  # reference config (vcf2embed.py:258-262)
        except ImportError:
            pass
    centered = embeddings - embeddings.mean(0)
    _, _, vt = np.linalg.svd(centered, full_matrices=False)
    return centered @ vt[:2].T


def kmeans(x: np.ndarray, k: int, iters: int = 25, seed: int = 0) -> np.ndarray:
    """Tiny k-means (the reference colors by GO category from an annotation
    artifact we don't ship; unsupervised clusters are the standalone
    equivalent signal)."""
    rng = np.random.default_rng(seed)
    centers = x[rng.choice(len(x), size=k, replace=False)]
    assign = np.zeros(len(x), np.int32)
    for _ in range(iters):
        d = ((x[:, None, :] - centers[None]) ** 2).sum(-1)
        new = d.argmin(1).astype(np.int32)
        if (new == assign).all():
            break
        assign = new
        for j in range(k):
            sel = x[assign == j]
            if len(sel):
                centers[j] = sel.mean(0)
    return assign


def main():
    proc, extras = build_processor()
    if artifacts_present():
        genes = ["ENSG00000130203.9", "ENSG00000000457.13"]
        tissues = "brain - cortex,liver,whole blood,thyroid"
    else:
        genes = ["GENE1.1", "GENE2.1"]
        tissues = "tissue0,tissue1,tissue2,tissue3"
    query = pd.DataFrame({"gene_id": genes, "tissues": [tissues] * len(genes)})
    out = proc.predict(extras["vcf"], query)

    rows, embs = [], []
    for _, row in out.iterrows():
        for name, emb, val in zip(
            row["tissue_names"], row["embeddings"], row["predicted_expression"]
        ):
            rows.append({
                "gene_id": row["gene_id"], "tissue": name,
                "predicted_expression": round(float(val), 4),
            })
            embs.append(np.asarray(emb, np.float32))
    embs = np.stack(embs)
    coords = project_2d(embs)
    df = pd.DataFrame(rows)
    df["x"], df["y"] = coords[:, 0], coords[:, 1]
    df["cluster"] = [
        f"cluster {c}" for c in kmeans(embs, k=min(4, len(embs)))
    ]
    print(df.to_string())
    print(f"\nembedding matrix: {embs.shape}, projected to 2D")

    from variantformer_tpu.api.visualization import scatter_html

    page = scatter_html(
        df, SCATTER_HTML, color="cluster",
        hover=["gene_id", "tissue", "predicted_expression"],
        title="Gene-tissue embeddings (2D projection)",
    )
    print(f"interactive scatter: {page}")

    from variantformer_tpu.api.webapp import vcf2embed_app

    app = vcf2embed_app(df, "/tmp/vcf2embed_app.html")
    print(f"reactive embedding explorer: {app}")
    return df


if __name__ == "__main__":
    sys.exit(0 if main() is not None else 1)
