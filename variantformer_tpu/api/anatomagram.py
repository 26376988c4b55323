"""Anatomagram: SVG human-body heatmap of per-tissue predictions.

Self-contained equivalent of the reference's anywidget-based anatomagram
(C22 in SURVEY.md §2.1): a stylized body map whose organ shapes are colored
by expression value, emitted as plain SVG/HTML (no widget runtime, no
external assets). Tissue names from the released vocabulary map onto organ
shapes; tissues without a drawn organ (cell lines etc.) render in a side
legend. ``anatomagram_html`` accepts the same prediction-dataframe contract
as the reference's converters.
"""

from __future__ import annotations

import html as _html
from pathlib import Path

# Organ shapes on a 240x520 canvas: (cx, cy, rx, ry, label_side)
_ORGANS: dict[str, tuple[float, float, float, float]] = {
    "brain": (120, 48, 30, 24),
    "pituitary": (120, 66, 6, 5),
    "thyroid": (120, 98, 12, 7),
    "esophagus": (120, 122, 6, 18),
    "lung": (94, 160, 22, 34),
    "lung_r": (146, 160, 22, 34),
    "heart": (126, 166, 17, 15),
    "breast": (94, 196, 14, 9),
    "liver": (102, 222, 26, 16),
    "stomach": (136, 220, 17, 12),
    "spleen": (152, 232, 9, 7),
    "pancreas": (126, 238, 16, 6),
    "adrenal gland": (98, 246, 7, 5),
    "kidney": (96, 258, 10, 13),
    "kidney_r": (144, 258, 10, 13),
    "colon": (120, 288, 34, 22),
    "small intestine": (120, 292, 18, 14),
    "bladder": (120, 324, 11, 8),
    "prostate": (120, 338, 8, 5),
    "uterus": (120, 330, 10, 7),
    "ovary": (104, 330, 5, 4),
    "testis": (120, 352, 7, 5),
    "muscle": (78, 300, 10, 46),
    "adipose": (162, 300, 10, 46),
    "nerve": (78, 410, 7, 40),
    "artery": (162, 410, 7, 40),
    "skin": (120, 470, 36, 10),
    "blood": (120, 492, 36, 8),
}

# tissue-name prefix -> organ key
_TISSUE_TO_ORGAN = [
    ("brain", "brain"),
    ("pituitary", "pituitary"),
    ("thyroid", "thyroid"),
    ("esophagus", "esophagus"),
    ("lung", "lung"),
    ("heart", "heart"),
    ("breast", "breast"),
    ("liver", "liver"),
    ("stomach", "stomach"),
    ("spleen", "spleen"),
    ("pancreas", "pancreas"),
    ("adrenal gland", "adrenal gland"),
    ("kidney", "kidney"),
    ("colon", "colon"),
    ("small intestine", "small intestine"),
    ("bladder", "bladder"),
    ("prostate", "prostate"),
    ("uterus", "uterus"),
    ("cervix", "uterus"),
    ("fallopian tube", "uterus"),
    ("ovary", "ovary"),
    ("testis", "testis"),
    ("muscle", "muscle"),
    ("adipose", "adipose"),
    ("nerve", "nerve"),
    ("artery", "artery"),
    ("skin", "skin"),
    ("whole blood", "blood"),
    ("blood", "blood"),
]

_MIRRORED = {"lung": "lung_r", "kidney": "kidney_r"}


def _organ_for(tissue: str) -> str | None:
    lowered = tissue.lower()
    for prefix, organ in _TISSUE_TO_ORGAN:
        if lowered.startswith(prefix):
            return organ
    return None


def _heat(frac: float) -> str:
    """Pale blue -> deep red ramp."""
    frac = max(0.0, min(1.0, frac))
    r = int(70 + 185 * frac)
    g = int(130 * (1 - frac) + 40)
    b = int(200 * (1 - frac) + 30)
    return f"rgb({r},{g},{b})"


def anatomagram_svg(tissue_values: dict[str, float], width: int = 240) -> str:
    """Render one gene's per-tissue values as a body-map SVG string."""
    vmax = max(tissue_values.values()) or 1.0
    organ_vals: dict[str, tuple[float, str]] = {}
    legend_only: list[tuple[str, float]] = []
    for tissue, value in tissue_values.items():
        organ = _organ_for(tissue)
        if organ is None:
            legend_only.append((tissue, value))
            continue
        prev = organ_vals.get(organ)
        if prev is None or value > prev[0]:
            organ_vals[organ] = (value, tissue)

    h = 520
    parts = [
        f"<svg xmlns='http://www.w3.org/2000/svg' viewBox='0 0 {width + 240} {h}' "
        f"width='{width + 240}' height='{h}'>",
        # body silhouette
        "<g fill='#f2ede6' stroke='#bbb'>"
        "<ellipse cx='120' cy='50' rx='34' ry='38'/>"          # head
        "<rect x='104' y='84' width='32' height='22' rx='8'/>"  # neck
        "<path d='M60 110 Q120 92 180 110 L190 320 Q120 350 50 320 Z'/>"  # torso
        "<rect x='58' y='330' width='38' height='160' rx='18'/>"  # legs
        "<rect x='144' y='330' width='38' height='160' rx='18'/>"
        "<rect x='38' y='120' width='24' height='150' rx='12'/>"  # arms
        "<rect x='178' y='120' width='24' height='150' rx='12'/>"
        "</g>",
    ]
    label_y = 20
    for organ, (value, tissue) in sorted(organ_vals.items()):
        color = _heat(value / vmax)
        for key in (organ, _MIRRORED.get(organ)):
            if key is None:
                continue
            cx, cy, rx, ry = _ORGANS[key]
            parts.append(
                f"<ellipse cx='{cx}' cy='{cy}' rx='{rx}' ry='{ry}' "
                f"fill='{color}' stroke='#666' stroke-width='0.6'>"
                f"<title>{_html.escape(tissue)}: {value:.3f}</title></ellipse>"
            )
        parts.append(
            f"<text x='{width + 14}' y='{label_y}' font-size='10' "
            f"font-family='sans-serif'><tspan fill='{color}'>&#9632;</tspan> "
            f"{_html.escape(tissue)}: {value:.3f}</text>"
        )
        label_y += 14
    for tissue, value in sorted(legend_only, key=lambda kv: -kv[1]):
        parts.append(
            f"<text x='{width + 14}' y='{label_y}' font-size='10' "
            f"font-family='sans-serif' fill='#555'>&#9633; "
            f"{_html.escape(tissue)}: {value:.3f}</text>"
        )
        label_y += 14
    parts.append("</svg>")
    return "".join(parts)


def anatomagram_html(
    predictions: dict[str, dict[str, float]],
    out_path: str | Path,
    title: str = "VariantFormer anatomagram",
) -> str:
    """Multi-gene page of body maps. predictions: {gene: {tissue: value}}."""
    parts = [
        "<!doctype html><html><head><meta charset='utf-8'>",
        f"<title>{_html.escape(title)}</title>",
        "<style>body{font-family:system-ui,sans-serif;margin:2rem}"
        ".maps{display:flex;flex-wrap:wrap;gap:2rem}</style></head><body>",
        f"<h1>{_html.escape(title)}</h1><div class='maps'>",
    ]
    for gene, tissues in predictions.items():
        parts.append(
            f"<div><h2>{_html.escape(str(gene))}</h2>{anatomagram_svg(tissues)}</div>"
        )
    parts.append("</div></body></html>")
    out_path = Path(out_path)
    out_path.write_text("".join(parts))
    return str(out_path)


def anatomagram_from_prediction_df(df, out_path, value_column="predicted_expression"):
    """Adapter for VCFProcessor.predict output."""
    predictions = {}
    for _, row in df.iterrows():
        predictions[row["gene_id"]] = dict(
            zip(row["tissue_names"], [float(v) for v in row[value_column]])
        )
    return anatomagram_html(predictions, out_path)
