"""vcf2embed — gene-tissue embedding extraction and 2D projection.

Equivalent of the reference's vcf2embed notebook flow: collect pooled
gene-tissue embeddings across genes x tissues, project to 2D (PCA here; swap
in UMAP if installed), and write a scatter report.
"""

import sys

import numpy as np
import pandas as pd

from _common import artifacts_present, build_processor


def project_2d(embeddings: np.ndarray) -> np.ndarray:
    try:
        import umap  # type: ignore

        return umap.UMAP(n_components=2).fit_transform(embeddings)
    except ImportError:
        centered = embeddings - embeddings.mean(0)
        _, _, vt = np.linalg.svd(centered, full_matrices=False)
        return centered @ vt[:2].T


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
        for name, emb in zip(row["tissue_names"], row["embeddings"]):
            rows.append({"gene_id": row["gene_id"], "tissue": name})
            embs.append(np.asarray(emb, np.float32))
    embs = np.stack(embs)
    coords = project_2d(embs)
    df = pd.DataFrame(rows)
    df["x"], df["y"] = coords[:, 0], coords[:, 1]
    print(df.to_string())
    print(f"\nembedding matrix: {embs.shape}, projected to 2D")
    return df


if __name__ == "__main__":
    sys.exit(0 if main() is not None else 1)
