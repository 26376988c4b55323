"""Parity vs the reference torch model at the REAL released geometry.

Round-1 parity only covered toy configs (e=48, 4 heads, 3 layers); this gate
instantiates the reference Seq2GenePredictorCombinedModulator at the shipped
checkpoint geometry — emb_dim 1536, 32 heads (head_dim 48), 25 layers,
token_dim 512, 63 tissues, gene_pooling=multi_registry, multi_head=False,
only_cross_attention=False (reference configs/vf_model.yaml:14-36) — with
random weights on CPU, converts through the production converter
(models/convert.py), and asserts forward parity for predictions, pooled
embeddings, and both VEP token-position gathers. Any head-packing, registry,
or head-dim-48 edge-case bug at real geometry trips here instead of on the
14 GB checkpoint.

Runtime is dominated by initializing/converting the ~1.25 B random
parameters; window/CRE counts are kept small (they don't change the packing
geometry).
"""

import numpy as np
import pytest
import torch

from tests import reference_oracle

if not reference_oracle.reference_available():
    pytest.skip("reference checkout not available", allow_module_level=True)

reference_oracle.install_reference_stubs()

import jax
import jax.numpy as jnp

from variantformer_tpu.config import (
    ModelConfig,
    PrecisionPolicy,
    Seq2GeneConfig,
    WindowEncoderConfig,
)
from variantformer_tpu.models import convert
from variantformer_tpu.models.seq2gene import Seq2GeneBatch, seq2gene_forward

# Released geometry (reference configs/vf_model.yaml:14-36).
VOCAB, TOKEN_E, EMB, HEADS, LAYERS = 500, 512, 1536, 32, 25
ENC_HEADS, ENC_LAYERS = 8, 8
TISSUES = 63
LENGTH = 16  # tokens per window — independent of the packing geometry


def _suffix_mask(lengths, width):
    return torch.arange(width)[None, :] >= torch.as_tensor(lengths)[:, None]


@pytest.mark.slow
def test_full_geometry_parity():
    from seq2gene.model_combined_modulator import Seq2GenePredictorCombinedModulator
    from seq2reg.model import Seq2RegPredictor

    torch.manual_seed(7)
    torch.set_float32_matmul_precision("highest")

    def _seq2reg():
        return Seq2RegPredictor(
            vocab_size=VOCAB, embedding_dim=TOKEN_E, num_heads=ENC_HEADS,
            num_layers=ENC_LAYERS, num_tissues=TISSUES, num_classes=11,
            learning_rate=1e-4, loss_fn=["cross_entropy", 0], seq_pool="mean",
            cre_type="multi", token_length=None, use_context=False,
            positional_encoding="alibi", use_flash=True, mlp_dout=0.0,
        ).eval()

    model = Seq2GenePredictorCombinedModulator(
        num_tissues=TISSUES, emb_dim=EMB, gene_emb_dim=TOKEN_E,
        num_heads=HEADS, num_layers=LAYERS, use_alibi=True, mlp_dout=0.0,
        use_context=True, token_dim=TOKEN_E,
        cre_tokenizer=_seq2reg(), gene_tokenizer=_seq2reg(),
        gene_pooling="multi_registry", only_cross_attention=False,
        use_bigger_head=True, multi_head=False, use_batching=True,
        train_gene_tokenizer=True, cross_alibi=False, use_res=False,
    ).eval()
    import types

    model.trainer = types.SimpleNamespace(precision="bf16-mixed")

    d = 1
    c_counts, g_counts = [6], [4]
    tissue_list = [0, 7, 62]  # first / middle / last released tissue id
    rng = np.random.default_rng(0)

    cl = torch.tensor(rng.integers(1, LENGTH + 1, c_counts[0]))
    gl = torch.tensor(rng.integers(1, LENGTH + 1, g_counts[0]))
    inp = [torch.randint(4, VOCAB, (c_counts[0], 1, LENGTH))]
    att = [_suffix_mask(cl, LENGTH).unsqueeze(1)]
    tiss = [torch.tensor(tissue_list)]
    labels = [torch.tensor(rng.integers(0, 9, c_counts[0]))]
    gene_inp = [torch.randint(4, VOCAB, (g_counts[0], 1, LENGTH))]
    gene_att = [_suffix_mask(gl, LENGTH).unsqueeze(1)]
    strand = torch.zeros(d, 1, dtype=torch.long)
    cre_pos = torch.tensor([2])
    gene_pos = torch.tensor([1])

    with torch.no_grad():
        pred, _, embd, gene_tok_emb, cre_tok_emb = model(
            inp, att, tiss, labels, strand, gene_inp, gene_att,
            return_embedding=True,
            cre_token_position=cre_pos, gene_token_position=gene_pos,
        )
    t = len(tissue_list)
    ref_pred = pred.numpy().reshape(d, t)
    ref_embd = embd.numpy().reshape(d, t, EMB)
    ref_gene_tok = gene_tok_emb.numpy().reshape(d, t, EMB)
    ref_cre_tok = cre_tok_emb.numpy().reshape(d, t, EMB)

    # --- our side, through the production converter ---
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = jax.tree.map(
        jnp.asarray,
        convert.convert_seq2gene(sd, num_heads=HEADS, encoder_num_heads=ENC_HEADS),
    )
    assert params["tissue_heads"]["w1"].shape == (1, EMB, EMB)  # shared head
    cfg = ModelConfig(
        window_encoder=WindowEncoderConfig(
            vocab_size=VOCAB, embedding_dim=TOKEN_E, num_heads=ENC_HEADS,
            num_layers=ENC_LAYERS, ffn_hidden_dim=2048, token_length=LENGTH,
            use_context=False,
        ),
        seq2gene=Seq2GeneConfig(
            emb_dim=EMB, gene_emb_dim=TOKEN_E, token_dim=TOKEN_E,
            num_heads=HEADS, num_layers=LAYERS, num_tissues=TISSUES,
            only_cross_attention=False, multi_head=False,
        ),
        precision=PrecisionPolicy(compute_dtype="float32"),
    )
    batch = Seq2GeneBatch(
        cre_tokens=jnp.asarray(inp[0][:, 0, :].numpy())[None],
        cre_tok_len=jnp.asarray(cl.numpy(), jnp.int32)[None],
        cre_count=jnp.asarray(c_counts, jnp.int32),
        cre_labels=jnp.asarray(labels[0].numpy(), jnp.int32)[None],
        gene_tokens=jnp.asarray(gene_inp[0][:, 0, :].numpy())[None],
        gene_tok_len=jnp.asarray(gl.numpy(), jnp.int32)[None],
        gene_count=jnp.asarray(g_counts, jnp.int32),
        tissue_ids=jnp.asarray(tissue_list, jnp.int32),
        cre_token_position=jnp.asarray(cre_pos.numpy(), jnp.int32),
        gene_token_position=jnp.asarray(gene_pos.numpy(), jnp.int32),
    )
    out = seq2gene_forward(params, batch, cfg)

    np.testing.assert_allclose(
        np.asarray(out.pooled_embedding), ref_embd, rtol=1e-3, atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(out.pred_expression), ref_pred, rtol=1e-3, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out.gene_token_embedding), ref_gene_tok, rtol=1e-3, atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(out.cre_token_embedding), ref_cre_tok, rtol=1e-3, atol=2e-3
    )
