"""Parity of the two-module Seq2GenePredictor model class (reference
seq2gene/model.py) against our forward — the modulator interleaving is
identical to the combined form; the converter maps the alternate state_dict
prefixes and the cross-attention-only gene layer flavor."""

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
from tests.test_reference_parity import _suffix_mask, _tiny_seq2reg

torch.manual_seed(7)


# use_res=True is exercised through the combined model class: the reference's
# two-module GeneModulator crashes on padded inputs with use_res (its residual
# is the padded stream while g_exp is unpadded — layers.py:912), a dead config.
@pytest.mark.parametrize(
    "model_kind,only_cross,use_res",
    [("two_module", True, False), ("two_module", False, False),
     ("combined", True, True)],
)
def test_two_module_model_parity(model_kind, only_cross, use_res):
    from seq2gene.model import Seq2GenePredictor
    from seq2gene.model_combined_modulator import (
        Seq2GenePredictorCombinedModulator,
    )

    vocab, token_e, e, heads, layers, length = 40, 32, 48, 4, 3, 12
    tissues_all = 7
    cre_tok = _tiny_seq2reg(vocab=vocab, e=token_e, tissues=tissues_all)
    gene_tok = _tiny_seq2reg(vocab=vocab, e=token_e, tissues=tissues_all)
    model_cls = (
        Seq2GenePredictor if model_kind == "two_module"
        else Seq2GenePredictorCombinedModulator
    )
    model = model_cls(
        num_tissues=tissues_all, emb_dim=e, gene_emb_dim=token_e, num_heads=heads,
        num_layers=layers, use_alibi=True, mlp_dout=0.0, use_context=True,
        token_dim=token_e, cre_tokenizer=cre_tok, gene_tokenizer=gene_tok,
        gene_pooling="multi_registry", only_cross_attention=only_cross,
        use_bigger_head=True, multi_head=True, use_batching=True,
        train_gene_tokenizer=True, cross_alibi=False, use_res=use_res,
    ).eval()
    import types

    model.trainer = types.SimpleNamespace(precision="bf16-mixed")

    d = 2
    tissue_list = [0, 4]
    c_counts = [4, 3]
    g_counts = [3, 2]
    rng = np.random.default_rng(1)
    inp, att, tiss, labels, gene_inp, gene_att = [], [], [], [], [], []
    for di in range(d):
        cl = torch.tensor(rng.integers(1, length + 1, c_counts[di]))
        gl = torch.tensor(rng.integers(1, length + 1, g_counts[di]))
        inp.append(torch.randint(4, vocab, (c_counts[di], 1, length)))
        att.append(_suffix_mask(cl, length).unsqueeze(1))
        tiss.append(torch.tensor(tissue_list))
        labels.append(torch.tensor(rng.integers(0, 9, c_counts[di])))
        gene_inp.append(torch.randint(4, vocab, (g_counts[di], 1, length)))
        gene_att.append(_suffix_mask(gl, length).unsqueeze(1))
    strand = torch.zeros(d, 1, dtype=torch.long)

    with torch.no_grad():
        pred, donors, embd, _, _ = model(
            inp, att, tiss, labels, strand, gene_inp, gene_att,
            return_embedding=True,
        )
    t = len(tissue_list)
    ref_pred = pred.numpy().reshape(d, t)
    ref_embd = embd.numpy().reshape(d, t, e)

    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = jax.tree.map(
        jnp.asarray, convert.convert_seq2gene(sd, num_heads=heads, encoder_num_heads=4)
    )
    cfg = ModelConfig(
        window_encoder=WindowEncoderConfig(
            vocab_size=vocab, embedding_dim=token_e, num_heads=4, num_layers=2,
            ffn_hidden_dim=2048, token_length=length,
        ),
        seq2gene=Seq2GeneConfig(
            emb_dim=e, gene_emb_dim=token_e, token_dim=token_e, num_heads=heads,
            num_layers=layers, num_tissues=tissues_all, multi_head=True,
            only_cross_attention=only_cross, use_res=use_res,
        ),
        precision=PrecisionPolicy(compute_dtype="float32"),
    )
    c_max, g_max = max(c_counts), max(g_counts)

    def pack(seqs, masks, counts, width):
        out = np.zeros((d, width, length), np.int32)
        lens = np.zeros((d, width), np.int32)
        for di in range(d):
            out[di, : counts[di]] = seqs[di][:, 0, :].numpy()
            lens[di, : counts[di]] = (~masks[di][:, 0, :].numpy()).sum(-1)
        return out, lens

    cre_tokens, cre_lens = pack(inp, att, c_counts, c_max)
    gene_tokens, gene_lens = pack(gene_inp, gene_att, g_counts, g_max)
    label_arr = np.zeros((d, c_max), np.int32)
    for di in range(d):
        label_arr[di, : c_counts[di]] = labels[di].numpy()

    batch = Seq2GeneBatch(
        cre_tokens=jnp.asarray(cre_tokens),
        cre_tok_len=jnp.asarray(cre_lens),
        cre_count=jnp.asarray(c_counts, jnp.int32),
        cre_labels=jnp.asarray(label_arr),
        gene_tokens=jnp.asarray(gene_tokens),
        gene_tok_len=jnp.asarray(gene_lens),
        gene_count=jnp.asarray(g_counts, jnp.int32),
        tissue_ids=jnp.asarray(tissue_list, jnp.int32),
    )
    out = seq2gene_forward(params, batch, cfg)
    np.testing.assert_allclose(
        np.asarray(out.pooled_embedding), ref_embd, rtol=1e-3, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out.pred_expression), ref_pred, rtol=1e-3, atol=1e-5
    )
