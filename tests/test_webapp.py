"""Reactive HTML apps (api/webapp): structure + embedded-data contracts.

Browser behavior (selector switching, recoloring, threshold slider) was
driven manually via a real WebView during development; these tests pin the
generated artifacts: data JSON embedded, controls present, region geometry
reused from the anatomagram, and adapters accept the processors' output
schemas.
"""

import json
import re

import numpy as np
import pandas as pd

from variantformer_tpu.api.webapp import (
    vcf2embed_app,
    vcf2exp_app,
    vcf2risk_app,
)


def _pred_df():
    tissues = ["liver", "lung", "heart - left ventricle", "K562"]
    rng = np.random.default_rng(0)
    return pd.DataFrame(
        {
            "gene_id": ["GENE1.1", "GENE2.1"],
            "tissue_names": [tissues, tissues],
            "predicted_expression": [
                [float(v) for v in rng.uniform(0, 9, 4)] for _ in range(2)
            ],
        }
    )


def _embedded_data(page: str) -> dict:
    m = re.search(r"const DATA = (.*?);\n", page)
    assert m, "embedded DATA payload missing"
    _check_dom_refs(page)
    return json.loads(m.group(1))


def _check_dom_refs(page: str):
    """Every id the JS dereferences must exist in the markup (no browser or
    JS runtime on this rig, so typo'd ids are caught statically)."""
    for ref in set(re.findall(r"getElementById\('([^']+)'\)", page)):
        assert f"id='{ref}'" in page, f"JS references missing element #{ref}"
    # balanced template literals / braces in the inline script
    script = page.rsplit("<script>", 1)[1].rsplit("</script>", 1)[0]
    assert script.count("{") == script.count("}"), "unbalanced braces in JS"
    assert script.count("`") % 2 == 0, "unbalanced template literals in JS"


def test_vcf2exp_app(tmp_path):
    df = _pred_df()
    path = vcf2exp_app(df, tmp_path / "exp.html")
    page = open(path).read()
    data = _embedded_data(page)
    assert set(data) == {"GENE1.1", "GENE2.1"}
    assert data["GENE1.1"]["liver"] == df["predicted_expression"][0][0]
    # reactive controls + all three anatomagram views with region geometry
    for needle in (
        "id='gene'", "id='agg'", "id='search'", "const TISSUE_MAP",
        "data-view='male'", "data-view='female'", "data-view='brain'",
        "data-uberon=", "paintRegions", "makeSortable",
    ):
        assert needle in page, needle
    # fully self-contained: no external scripts or fetches (the only URLs
    # are SVG xmlns declarations)
    assert "<script src" not in page
    assert "fetch(" not in page and "XMLHttpRequest" not in page


def test_script_breaking_names_are_escaped(tmp_path):
    """A gene/tissue name containing '</script>' must not terminate the
    inline script block (markup injection); '</' is embedded as '<\\/'
    which parses to the identical string."""
    evil = "G1</script><script>alert(1)//"
    df = pd.DataFrame(
        {
            "gene_id": [evil],
            "tissue_names": [["liver"]],
            "predicted_expression": [[1.5]],
        }
    )
    path = vcf2exp_app(df, tmp_path / "evil.html")
    page = open(path).read()
    data_line = re.search(r"const DATA = (.*?);\n", page).group(1)
    assert "</script" not in data_line
    assert json.loads(data_line)[evil]["liver"] == 1.5
    # the page still ends with exactly one real closing script tag
    assert page.count("</script>") == 1


def test_vcf2risk_app(tmp_path):
    df = pd.DataFrame(
        {
            "tissue_name": ["liver", "brain - cortex", "lung"],
            "ad_risk": [0.7, 0.4, 0.55],
        }
    )
    path = vcf2risk_app(df, tmp_path / "risk.html", threshold=0.5)
    page = open(path).read()
    data = _embedded_data(page)
    assert data == {"liver": 0.7, "brain - cortex": 0.4, "lung": 0.55}
    for needle in ("id='thr'", "AT RISK", "paintRegions", "value='0.5'"):
        assert needle in page, needle


def test_vcf2embed_app(tmp_path):
    df = pd.DataFrame(
        {
            "gene_id": ["G1", "G1", "G2", "G2"],
            "tissue": ["liver", "lung", "liver", "lung"],
            "predicted_expression": [1.0, 2.0, 3.0, 4.0],
            "cluster": ["cluster 0", "cluster 1", "cluster 0", "cluster 1"],
            "x": np.asarray([0.0, 1.0, 2.0, 3.0], np.float32),
            "y": np.asarray([3.0, 2.0, 1.0, 0.0], np.float32),
        }
    )
    path = vcf2embed_app(df, tmp_path / "embed.html")
    page = open(path).read()
    data = _embedded_data(page)
    assert len(data["rows"]) == 4
    assert data["rows"][0]["x"] == 0.0  # numpy scalars serialized
    assert set(data["catCols"]) == {"gene_id", "tissue", "cluster"}
    for needle in ("id='color'", "id='legend'", "id='scatter'", "class='dot'"):
        assert needle in page.replace('"', "'"), needle
