"""Oracle self-audit invariants (docs/ORACLE_AUDIT.md).

The dense flash-attn stub in tests/reference_oracle.py is the foundation of
every oracle-based parity test on this rig. Two of its simplifications are
only valid under invariants of the REFERENCE code; lock them so a silent
violation cannot void the oracle:

1. The stub's ALiBi slope table must equal the reference's own vendored
   ofirpress implementation for every head count (the reference registers the
   same formula as its `m` buffer next to each alibi MHA, layers.py:86).
2. The stub applies `-slope*|i-j|`, which equals flash-attn's real non-causal
   bias `-slope*|row + seqlen_k - seqlen_q - col|` ONLY when seqlen_q ==
   seqlen_k — true for self-attention segments, false for cross-attention.
   Therefore no alibi-enabled CROSS-attention MHA may exist in the shipped
   model graph.
"""

import numpy as np
import pytest
import torch

from tests import reference_oracle

if not reference_oracle.reference_available():
    pytest.skip("/root/reference not present", allow_module_level=True)

reference_oracle.install_reference_stubs()


def test_stub_slopes_match_reference_vendored_formula():
    from seq2gene.modules.layers import get_alibi_slopes

    for n in [1, 2, 3, 4, 5, 6, 7, 8, 12, 16, 24, 32, 48, 64, 96, 128]:
        np.testing.assert_allclose(
            reference_oracle._alibi_slopes(n).numpy(),
            get_alibi_slopes(n).numpy(),
            rtol=0, atol=0, err_msg=f"n={n}",
        )
    # and both match the repo's own JAX slope table
    from variantformer_tpu.ops.alibi import alibi_slopes

    for n in (8, 32):
        np.testing.assert_allclose(
            np.asarray(alibi_slopes(n)),
            reference_oracle._alibi_slopes(n).numpy(),
            rtol=1e-7,
        )


def test_no_alibi_cross_attention_in_shipped_model_graph():
    """If the reference ever enabled cross_alibi, the stub's |i-j| bias would
    be wrong (right-alignment rule, ORACLE_AUDIT.md §2) — fail loudly."""
    from seq2gene.model_combined_modulator import Seq2GenePredictorCombinedModulator
    from seq2reg.model import Seq2RegPredictor

    def _seq2reg():
        return Seq2RegPredictor(
            vocab_size=32, embedding_dim=16, num_heads=4, num_layers=2,
            num_tissues=5, num_classes=11, learning_rate=1e-4,
            loss_fn=["cross_entropy", 0], seq_pool="mean", cre_type="multi",
            token_length=None, use_context=False,
            positional_encoding="alibi", use_flash=True, mlp_dout=0.0,
        )

    model = Seq2GenePredictorCombinedModulator(
        num_tissues=5, emb_dim=32, gene_emb_dim=16, num_heads=4,
        num_layers=2, use_alibi=True, mlp_dout=0.0, use_context=True,
        token_dim=16, cre_tokenizer=_seq2reg(), gene_tokenizer=_seq2reg(),
        gene_pooling="multi_registry", only_cross_attention=False,
        use_bigger_head=True, multi_head=False, use_batching=True,
        train_gene_tokenizer=True, use_res=False,  # cross_alibi left DEFAULT
    )

    stubs = [
        m for m in model.modules()
        if isinstance(m, reference_oracle._StubMHA)
    ]
    assert stubs, "expected stub MHA modules in the reference graph"
    cross = [m for m in stubs if m.cross_attn]
    assert cross, "expected cross-attention MHAs in the reference graph"
    for m in cross:
        assert not m.use_alibi, (
            "alibi-enabled cross-attention found: the oracle stub's |i-j| "
            "bias is INVALID for seqlen_q != seqlen_k (docs/ORACLE_AUDIT.md)"
        )
    # self-attention alibi IS used (that's the path the |i-j| stub models)
    assert any(m.use_alibi for m in stubs if not m.cross_attn)


def test_stub_right_alignment_gap_is_real():
    """Demonstrate (not just assert) the gap §2 documents: for equal q/k
    lengths the stub bias equals flash-attn's right-aligned formula; for
    unequal lengths it does not — the reason cross-alibi must stay off."""
    slopes = reference_oracle._alibi_slopes(4)

    def flash_bias(sq, sk):
        row = torch.arange(sq)[:, None]
        col = torch.arange(sk)[None, :]
        return -slopes[:, None, None] * (row + sk - sq - col).abs().float()

    def stub_bias(sq, sk):
        row = torch.arange(sq)[:, None]
        col = torch.arange(sk)[None, :]
        return -slopes[:, None, None] * (row - col).abs().float()

    assert torch.equal(flash_bias(7, 7), stub_bias(7, 7))
    assert not torch.equal(flash_bias(4, 9), stub_bias(4, 9))


@pytest.mark.mid
def test_fp16_attention_gap_bounded():
    """ORACLE_AUDIT §5's last unverified limb, checked without a GPU: run the
    oracle with fp16-quantized attention (simulating layers.py:103,363 —
    flash-attn always runs fp16 on GPU, so the H100 gold parquets carry fp16
    noise) and bound that drift against the repo's bf16 compute path.

    Invariants locked here:
      * the fp16 mode actually engages (nonzero drift vs the fp32 oracle),
      * fp16-attention noise on predictions is small (rel-L2 <= 2e-3 — the
        scale the gold tolerances atol=1e-3..0.1 are built to absorb),
      * the repo's bf16 path deviates from the fp16-attn oracle (i.e. from
        H100-gold numerics) by no more than bf16's own quantization scale
        (rel-L2 <= 2e-2), so bf16-vs-gold disagreement beyond that signals a
        real defect, not precision noise.
    """
    from tests.test_reference_parity import _full_model_setup
    from variantformer_tpu.models.seq2gene import seq2gene_forward

    run_reference, params, batch, make_cfg = _full_model_setup()

    ref32 = run_reference()
    with reference_oracle.fp16_attention():
        ref16 = run_reference()

    def rel(a, b):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        return float(np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-12))

    drift_fp16 = {k: rel(ref16[k], ref32[k]) for k in ref32}
    assert all(v > 0 for v in drift_fp16.values()), drift_fp16  # mode engaged
    assert drift_fp16["pred"] <= 2e-3, drift_fp16
    assert drift_fp16["embd"] <= 2e-3, drift_fp16

    out = seq2gene_forward(params, batch, make_cfg("bfloat16"))
    drift_bf16 = {
        "pred": rel(out.pred_expression, ref16["pred"]),
        "embd": rel(out.pooled_embedding, ref16["embd"]),
        "gene_tok": rel(out.gene_token_embedding, ref16["gene_tok"]),
        "cre_tok": rel(out.cre_token_embedding, ref16["cre_tok"]),
    }
    assert all(v <= 2e-2 for v in drift_bf16.values()), drift_bf16
    print(f"fp16-attn oracle drift (rel-L2): {drift_fp16}")
    print(f"repo bf16 vs fp16-attn oracle (rel-L2): {drift_bf16}")
