"""AD-risk tree-ensemble tests: differential vs sklearn, serialization round
trip, JAX evaluator equivalence, and the processor-level API."""

import numpy as np
import pytest

from variantformer_tpu.api.ad_risk import (
    ADriskFromVCF,
    TreeEnsemble,
    jax_predict_margin,
)


@pytest.fixture(scope="module")
def fitted_gbm():
    sklearn = pytest.importorskip("sklearn")
    from sklearn.ensemble import GradientBoostingClassifier

    rng = np.random.default_rng(0)
    x = rng.standard_normal((400, 24)).astype(np.float32)
    y = (x[:, 0] + 0.5 * x[:, 3] - x[:, 7] > 0).astype(int)
    model = GradientBoostingClassifier(
        n_estimators=20, max_depth=3, random_state=0
    ).fit(x, y)
    return model, x


def test_matches_sklearn(fitted_gbm):
    model, x = fitted_gbm
    ens = TreeEnsemble.from_sklearn_gbm(model)
    ref = model.predict_proba(x)[:, 1]
    ours = ens(x)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_save_load_round_trip(fitted_gbm, tmp_path):
    model, x = fitted_gbm
    ens = TreeEnsemble.from_sklearn_gbm(model)
    path = str(tmp_path / "predictor.npz")
    ens.save(path)
    loaded = TreeEnsemble.load(path)
    np.testing.assert_allclose(loaded(x), ens(x), rtol=1e-7)


def test_jax_evaluator_matches_numpy(fitted_gbm):
    import jax.numpy as jnp

    model, x = fitted_gbm
    ens = TreeEnsemble.from_sklearn_gbm(model)
    ref = ens.raw_margin(x[:50])
    ours = np.asarray(jax_predict_margin(ens, jnp.asarray(x[:50])))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


@pytest.mark.mid
def test_ad_risk_processor_level(fitted_gbm, tmp_path_factory):
    import jax
    import pandas as pd

    from tests.test_api_end_to_end import _tiny_cfg
    from tests.test_api_end_to_end import fixture_env as _fx  # fixture func
    from variantformer_tpu.api.vcfprocessor import VCFProcessor
    from variantformer_tpu.models.init import init_seq2gene

    # materialize the same fixture layout inline
    env = _fx.__wrapped__(tmp_path_factory)
    cfg = _tiny_cfg(vocab_size=500)
    proc = VCFProcessor(sources=env["sources"], config=cfg)
    proc.set_params(init_seq2gene(jax.random.key(0), cfg))

    model, _ = fitted_gbm
    ens = TreeEnsemble.from_sklearn_gbm(model)
    pred_dir = tmp_path_factory.mktemp("predictors")
    path = str(pred_dir / "g1_t0.npz")
    ens.save(path)

    class FakeManifest:
        def get_file_path(self, gene_id, tissue_id):
            return path if tissue_id == 0 else None

    ad = ADriskFromVCF(proc, manifest=FakeManifest())
    out = ad(env["vcf"], ["GENEPLUS.1"], [0])
    assert "ad_risk" in out.columns
    assert 0.0 <= out["ad_risk"].iloc[0] <= 1.0
    assert out["tissue_name"].iloc[0] == "tissue0"
