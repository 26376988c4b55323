from variantformer_tpu.api.model_manager import ModelManager
from variantformer_tpu.api.vcfprocessor import DataSources, VCFProcessor
from variantformer_tpu.api.variantprocessor import VariantProcessor

__all__ = [
    "DataSources",
    "ModelManager",
    "VCFProcessor",
    "VariantProcessor",
]

# Heavier / optional-dependency surfaces import as submodules:
#   variantformer_tpu.api.ad_risk       ADrisk, ADriskFromVCF (own GBT engine)
#   variantformer_tpu.api.sweeps        genome_wide_expression, saturation_scan
#   variantformer_tpu.api.serving       export_forward, load_exported
#   variantformer_tpu.api.anatomagram   anatomagram_html + adapters
#   variantformer_tpu.api.visualization expression_report, scatter_html
