"""Alzheimer's-disease risk head: gradient-boosted-tree inference over
gene-tissue embeddings.

TPU-native replacement for the reference's treelite GTIL dependency
(/root/reference/processors/ad_risk.py, N5 in SURVEY.md §2.2): tree ensembles
are stored as flat node arrays (own .npz format) and evaluated either in
numpy (host) or as a vectorized JAX traversal (device, for cohort-scale
scoring). Converters load from sklearn gradient-boosting models and — when
the treelite package is importable — from the reference's serialized
predictors.

API mirrors the reference: ``ADrisk(gene_id, tissue_id)(embeds) -> P(AD)``
and ``ADriskFromVCF(...)(vcf, gene_ids, tissue_ids) -> DataFrame``.
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Sequence

import numpy as np

log = logging.getLogger(__name__)

VF_DIMS = 1536


@dataclasses.dataclass
class TreeEnsemble:
    """Binary decision-tree ensemble in structure-of-arrays form.

    Per node: feature index (-1 = leaf), threshold, left/right child ids,
    value (leaf contribution). Trees are concatenated; ``tree_offsets`` holds
    each tree's first node. Prediction = base_score + sum of leaf values,
    mapped through sigmoid when ``objective == "binary_logistic"``.
    """

    feature: np.ndarray       # [n_nodes] int32
    threshold: np.ndarray     # [n_nodes] f32
    left: np.ndarray          # [n_nodes] int32 (absolute node ids)
    right: np.ndarray         # [n_nodes] int32
    value: np.ndarray         # [n_nodes] f32
    tree_offsets: np.ndarray  # [n_trees] int32
    base_score: float = 0.0
    objective: str = "binary_logistic"
    default_left: np.ndarray | None = None  # NaN routing; defaults to left

    # -- evaluation --------------------------------------------------------
    def raw_margin(self, x: np.ndarray) -> np.ndarray:
        x = np.atleast_2d(np.asarray(x, np.float32))
        out = np.full(x.shape[0], self.base_score, np.float64)
        for root in self.tree_offsets:
            node = np.full(x.shape[0], root, np.int64)
            while True:
                feat = self.feature[node]
                leaf = feat < 0
                if leaf.all():
                    break
                fv = x[np.arange(x.shape[0]), np.maximum(feat, 0)]
                go_left = fv <= self.threshold[node]
                nxt = np.where(go_left, self.left[node], self.right[node])
                node = np.where(leaf, node, nxt)
            out += self.value[node]
        return out

    def predict_proba(self, x: np.ndarray) -> np.ndarray:
        margin = self.raw_margin(x)
        if self.objective == "binary_logistic":
            p1 = 1.0 / (1.0 + np.exp(-margin))
            return np.stack([1.0 - p1, p1], axis=1)
        return margin[:, None]

    def __call__(self, x: np.ndarray) -> np.ndarray:
        """P(positive class) per row — the reference ADrisk.__call__ contract."""
        return self.predict_proba(x)[:, 1]

    # -- serialization -----------------------------------------------------
    def save(self, path: str):
        np.savez_compressed(
            path,
            feature=self.feature, threshold=self.threshold,
            left=self.left, right=self.right, value=self.value,
            tree_offsets=self.tree_offsets,
            base_score=np.float64(self.base_score),
            objective=np.bytes_(self.objective.encode()),
        )

    @classmethod
    def load(cls, path: str) -> "TreeEnsemble":
        z = np.load(path, allow_pickle=False)
        return cls(
            feature=z["feature"], threshold=z["threshold"],
            left=z["left"], right=z["right"], value=z["value"],
            tree_offsets=z["tree_offsets"],
            base_score=float(z["base_score"]),
            objective=bytes(z["objective"]).decode(),
        )

    # -- converters --------------------------------------------------------
    @classmethod
    def from_sklearn_gbm(cls, model) -> "TreeEnsemble":
        """Convert a fitted sklearn GradientBoostingClassifier (binary)."""
        feats, thrs, lefts, rights, vals, offsets = [], [], [], [], [], []
        lr = model.learning_rate
        base = 0.0
        if hasattr(model, "_raw_predict_init"):
            base = float(
                model._raw_predict_init(np.zeros((1, model.n_features_in_)))[0, 0]
            )
        n = 0
        for stage in model.estimators_:
            tree = stage[0].tree_
            offsets.append(n)
            feats.append(np.where(tree.children_left < 0, -1, tree.feature))
            thrs.append(tree.threshold)
            lefts.append(np.where(tree.children_left < 0, 0, tree.children_left + n))
            rights.append(np.where(tree.children_right < 0, 0, tree.children_right + n))
            vals.append(
                np.where(tree.children_left < 0, tree.value[:, 0, 0] * lr, 0.0)
            )
            n += tree.node_count
        return cls(
            feature=np.concatenate(feats).astype(np.int32),
            threshold=np.concatenate(thrs).astype(np.float32),
            left=np.concatenate(lefts).astype(np.int32),
            right=np.concatenate(rights).astype(np.int32),
            value=np.concatenate(vals).astype(np.float32),
            tree_offsets=np.asarray(offsets, np.int32),
            base_score=base,
            objective="binary_logistic",
        )

    @classmethod
    def from_treelite(cls, path: str) -> "TreeEnsemble":
        """Load one of the reference's serialized treelite predictors
        (requires the treelite package)."""
        import treelite

        model = treelite.Model.deserialize(path)
        # Walk treelite's field accessors into flat arrays.
        header = model.get_header_accessor()
        n_trees = int(header.get_field("num_tree")[0])
        feats, thrs, lefts, rights, vals, offsets = [], [], [], [], [], []
        n = 0
        for t in range(n_trees):
            tree = model.get_tree_accessor(t)
            num_nodes = int(tree.get_field("num_nodes")[0])
            cleft = np.asarray(tree.get_field("cleft"))
            cright = np.asarray(tree.get_field("cright"))
            split = np.asarray(tree.get_field("split_index"))
            thr = np.asarray(tree.get_field("threshold"))
            leaf_val = np.asarray(tree.get_field("leaf_value"))
            is_leaf = cleft < 0
            offsets.append(n)
            feats.append(np.where(is_leaf, -1, split))
            thrs.append(thr)
            lefts.append(np.where(is_leaf, 0, cleft + n))
            rights.append(np.where(is_leaf, 0, cright + n))
            vals.append(np.where(is_leaf, leaf_val, 0.0))
            n += num_nodes
        return cls(
            feature=np.concatenate(feats).astype(np.int32),
            threshold=np.concatenate(thrs).astype(np.float32),
            left=np.concatenate(lefts).astype(np.int32),
            right=np.concatenate(rights).astype(np.int32),
            value=np.concatenate(vals).astype(np.float32),
            tree_offsets=np.asarray(offsets, np.int32),
            base_score=0.0,
            objective="binary_logistic",
        )


def jax_predict_margin(ensemble: TreeEnsemble, x, max_depth: int = 32):
    """Vectorized tree traversal on device: [N, F] -> [N] raw margins.

    All samples step all trees in lockstep for ``max_depth`` iterations
    (leaves self-loop), an XLA-friendly gather formulation for cohort-scale
    AD scoring.
    """
    import jax.numpy as jnp
    from jax import lax

    feature = jnp.asarray(ensemble.feature)
    threshold = jnp.asarray(ensemble.threshold)
    left = jnp.asarray(ensemble.left)
    right = jnp.asarray(ensemble.right)
    value = jnp.asarray(ensemble.value)
    roots = jnp.asarray(ensemble.tree_offsets)

    x = jnp.atleast_2d(x)
    n = x.shape[0]
    node = jnp.broadcast_to(roots[None, :], (n, roots.shape[0]))  # [N, T]

    def body(_, node):
        feat = feature[node]                       # [N, T]
        is_leaf = feat < 0
        fv = jnp.take_along_axis(x, jnp.maximum(feat, 0), axis=1)
        nxt = jnp.where(fv <= threshold[node], left[node], right[node])
        return jnp.where(is_leaf, node, nxt)

    node = lax.fori_loop(0, max_depth, body, node)
    return value[node].sum(axis=1) + ensemble.base_score


class ADrisk:
    """Per-(gene, tissue) AD-risk predictor (reference processors/ad_risk.py:20-66)."""

    def __init__(self, gene_id: str, tissue_id: int, model_class: str = "v4_pcg",
                 manifest=None):
        assert model_class in ("v4_ag", "v4_pcg")
        assert isinstance(tissue_id, int), "tissue_id should be an integer"
        assert isinstance(gene_id, str), "gene_id should be a string"
        self.gene_id = gene_id
        self.tissue_id = tissue_id
        if manifest is None:
            from variantformer_tpu.utils import assets

            manifest = assets.gene_tissue_manifest(model_class)
        path = manifest.get_file_path(gene_id, tissue_id)
        if path is None:
            raise FileNotFoundError(
                f"AD predictor not found for gene {gene_id} / tissue {tissue_id}"
            )
        self.predictor = load_predictor(path)

    def __call__(self, gene_tissue_embeds: np.ndarray) -> np.ndarray:
        return self.predictor(np.atleast_2d(gene_tissue_embeds))


def load_predictor(path: str) -> TreeEnsemble:
    """Load a predictor: our .npz format, or a treelite artifact if the
    treelite package is available."""
    if str(path).endswith(".npz"):
        return TreeEnsemble.load(path)
    try:
        return TreeEnsemble.from_treelite(path)
    except ImportError as exc:
        raise RuntimeError(
            f"{path} looks like a treelite artifact; install treelite or "
            "convert it to the .npz ensemble format"
        ) from exc


class ADriskFromVCF:
    """Full vcf2exp -> per-(gene, tissue) AD risk (reference ad_risk.py:69-206)."""

    def __init__(self, vcf_processor, model_class: str = "v4_pcg", manifest=None):
        self.vcf_processor = vcf_processor
        self.model_class = model_class
        if manifest is None:
            from variantformer_tpu.utils import assets

            manifest = assets.gene_tissue_manifest(model_class)
        self.manifest = manifest
        tissues = vcf_processor.tissue_vocab
        self.tissue_names = {v: k for k, v in tissues.items()}

    def __call__(self, vcf_file: str, gene_ids: Sequence[str],
                 tissue_ids: Sequence[int]):
        import pandas as pd

        assert len(gene_ids) == len(tissue_ids)
        query = pd.DataFrame(
            {
                "gene_id": list(gene_ids),
                "tissues": [self.tissue_names[t] for t in tissue_ids],
            }
        )
        preds = self.vcf_processor.predict(vcf_file, query)
        risks = []
        for _, row in preds.iterrows():
            tissue_id = row["tissues"][0]
            emb = np.atleast_2d(np.asarray(row["embeddings"][0], np.float32))
            path = self.manifest.get_file_path(row["gene_id"], tissue_id)
            if path is None:
                risks.append(np.nan)
                continue
            risks.append(float(load_predictor(path)(emb)[0]))
        preds = preds.rename(columns={"tissues": "tissue_id", "embeddings": "embedding"})
        preds["tissue_id"] = preds["tissue_id"].apply(lambda x: x[0])
        preds["tissue_name"] = preds["tissue_id"].map(self.tissue_names)
        preds["ad_risk"] = risks
        return preds
