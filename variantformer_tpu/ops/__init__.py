from variantformer_tpu.ops.alibi import alibi_slopes
from variantformer_tpu.ops.attention import (
    cross_attention,
    self_attention,
)
