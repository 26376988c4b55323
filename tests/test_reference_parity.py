"""Differential tests against the reference implementation's own forward code.

The reference (read-only at /root/reference) runs on CPU torch with its
flash-attn/lightning dependencies stubbed by dense equivalents
(tests/reference_oracle.py). Weights are exported through the production
checkpoint converter (models/convert.py), so these tests cover the converter,
the layer topology, and the end-to-end model semantics in one shot.
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
from variantformer_tpu.models import convert, core
from variantformer_tpu.models.core import AttnSpec
from variantformer_tpu.models.seq2gene import Seq2GeneBatch, seq2gene_forward
from variantformer_tpu.models.seq2reg import encode_windows
from variantformer_tpu.ops.alibi import alibi_slopes

torch.manual_seed(0)

FP32 = jnp.float32


def _prefixed(sd, prefix):
    return {f"{prefix}.{k}": v.detach().numpy() for k, v in sd.items()}


def _suffix_mask(lengths, width):
    """torch padding mask, True = padded."""
    return torch.arange(width)[None, :] >= torch.as_tensor(lengths)[:, None]


def test_context_layer_parity():
    from seq2gene.modules.layers import ContextFlashAttentionEncoderLayer

    d_model, heads, b, s, sk = 32, 4, 3, 10, 7
    layer = ContextFlashAttentionEncoderLayer(
        d_model=d_model, nhead=heads, use_alibi=True, mlp_dout=0.0, hidden_dim=64
    ).eval()
    x = torch.randn(b, s, d_model)
    ctx = torch.randn(b, sk, d_model)
    x_len = [10, 6, 3]
    ctx_len = [7, 5, 2]
    with torch.no_grad():
        ref = layer(
            x, ctx,
            src_key_padding_mask=_suffix_mask(x_len, s),
            context_padding_mask=_suffix_mask(ctx_len, sk),
            precision=None,
        )

    sd = _prefixed(layer.state_dict(), "transformer_encoder.0")
    p = convert._context_layer(sd, "transformer_encoder.0", heads)
    p = jax.tree.map(jnp.asarray, p)
    spec = AttnSpec(num_heads=heads, head_dim=d_model // heads)
    out = core.context_encoder_layer(
        p, jnp.asarray(x.numpy()), jnp.asarray(ctx.numpy()),
        jnp.asarray(x_len), jnp.asarray(ctx_len),
        jnp.asarray(alibi_slopes(heads)), spec, FP32,
    )
    valid = np.arange(s)[None, :, None] < np.asarray(x_len)[:, None, None]
    np.testing.assert_allclose(
        np.asarray(out) * valid, ref.numpy() * valid, rtol=1e-4, atol=1e-4
    )


def test_cross_only_layer_parity():
    from seq2gene.modules.layers import ContextFlashCrossAttentionEncoderLayer

    d_model, heads, b, s, sk = 32, 4, 2, 6, 9
    layer = ContextFlashCrossAttentionEncoderLayer(
        d_model=d_model, nhead=heads, use_alibi=True, mlp_dout=0.0, hidden_dim=64
    ).eval()
    x = torch.randn(b, s, d_model)
    ctx = torch.randn(b, sk, d_model)
    x_len = [6, 4]
    ctx_len = [9, 5]
    with torch.no_grad():
        ref = layer(
            x, ctx,
            src_key_padding_mask=_suffix_mask(x_len, s),
            context_padding_mask=_suffix_mask(ctx_len, sk),
            precision=None,
        )
    sd = _prefixed(layer.state_dict(), "L.0")
    p = {
        "norm1": convert._norm(sd, "L.0.norm1"),
        "norm2": convert._norm(sd, "L.0.norm2"),
        "cross": {
            "wq": convert._lin(sd, "L.0.crossMHA.MHA.Wq"),
            "wkv": convert._packed_lin(sd, "L.0.crossMHA.MHA.Wkv", 2, heads),
            "out": convert._lin(sd, "L.0.crossMHA.MHA.out_proj"),
        },
        "ffn_in": convert._lin(sd, "L.0.linear_geglu_1"),
        "ffn_out": convert._lin(sd, "L.0.linear_geglu_2"),
    }
    p = jax.tree.map(jnp.asarray, p)
    spec = AttnSpec(num_heads=heads, head_dim=d_model // heads)
    out = core.cross_only_encoder_layer(
        p, jnp.asarray(x.numpy()), jnp.asarray(ctx.numpy()),
        jnp.asarray(ctx_len), spec, FP32,
    )
    valid = np.arange(s)[None, :, None] < np.asarray(x_len)[:, None, None]
    np.testing.assert_allclose(
        np.asarray(out) * valid, ref.numpy() * valid, rtol=1e-4, atol=1e-4
    )


def _tiny_seq2reg(vocab=40, e=32, heads=4, layers=2, tissues=5, use_context=False):
    from seq2reg.model import Seq2RegPredictor

    return Seq2RegPredictor(
        vocab_size=vocab, embedding_dim=e, num_heads=heads, num_layers=layers,
        num_tissues=tissues, num_classes=11, learning_rate=1e-4,
        loss_fn=["cross_entropy", 0], seq_pool="mean", cre_type="multi",
        token_length=None, use_context=use_context, positional_encoding="alibi",
        use_flash=True, mlp_dout=0.0,
    ).eval()


def _wcfg(vocab=40, e=32, heads=4, layers=2, use_context=False):
    return WindowEncoderConfig(
        vocab_size=vocab, embedding_dim=e, num_heads=heads, num_layers=layers,
        ffn_hidden_dim=2048, token_length=12, use_context=use_context,
    )


@pytest.mark.parametrize("use_context", [False, True])
def test_window_encoder_parity(use_context):
    torch.set_float32_matmul_precision("highest")
    model = _tiny_seq2reg(use_context=use_context)
    n, length = 6, 12
    tokens = torch.randint(4, 40, (n, 1, length))
    lens = torch.tensor([12, 9, 5, 1, 7, 12])
    pad_mask = _suffix_mask(lens, length).unsqueeze(1)  # [N, 1, L], True=pad
    context = torch.randint(0, 9, (n,))
    tissue = torch.zeros(n, dtype=torch.long)
    with torch.no_grad():
        if use_context:
            ref = model(tokens, pad_mask, tissue, context=context,
                        only_embed=True, precision=None)
        else:
            ref = model(tokens, pad_mask, tissue, only_embed=True, precision=None)
    ref = ref[:, 0, :].numpy()

    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    assert convert.window_encoder_uses_context(sd) == use_context
    params = jax.tree.map(jnp.asarray, convert.convert_window_encoder(sd, num_heads=4))
    cfg = _wcfg(use_context=use_context)
    spec = AttnSpec(num_heads=4, head_dim=8)
    out = encode_windows(
        params, jnp.asarray(tokens[:, 0, :].numpy()), jnp.asarray(lens.numpy()),
        jnp.asarray(context.numpy()), cfg, spec, FP32,
    )
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


def _full_model_setup():
    """Shared construct for full-model oracle comparisons: returns
    (run_reference, params, batch, make_cfg) where run_reference() executes
    the reference model under the CURRENT oracle mode (fp32 or
    reference_oracle.fp16_attention()) and make_cfg(dtype) builds our
    ModelConfig at the given compute dtype."""
    from seq2gene.model_combined_modulator import Seq2GenePredictorCombinedModulator

    vocab, token_e, e, heads, layers, length = 40, 32, 48, 4, 3, 12
    tissues_all = 7
    cre_tok = _tiny_seq2reg(vocab=vocab, e=token_e, heads=4, layers=2, tissues=tissues_all)
    gene_tok = _tiny_seq2reg(vocab=vocab, e=token_e, heads=4, layers=2, tissues=tissues_all)
    model = Seq2GenePredictorCombinedModulator(
        num_tissues=tissues_all, emb_dim=e, gene_emb_dim=token_e, num_heads=heads,
        num_layers=layers, use_alibi=True, mlp_dout=0.0, use_context=True,
        token_dim=token_e, cre_tokenizer=cre_tok, gene_tokenizer=gene_tok,
        gene_pooling="multi_registry", only_cross_attention=False,
        use_bigger_head=True, multi_head=True, use_batching=True,
        train_gene_tokenizer=True, cross_alibi=False, use_res=False,
    ).eval()
    import types

    model.trainer = types.SimpleNamespace(precision="bf16-mixed")

    d = 2
    tissue_list = [1, 3, 6]
    c_counts = [4, 3]
    g_counts = [3, 2]
    rng = np.random.default_rng(0)

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
    cre_pos = torch.tensor([1, 0])
    gene_pos = torch.tensor([0, 1])
    t = len(tissue_list)

    def run_reference():
        with torch.no_grad():
            pred, donors, embd, gene_tok_emb, cre_tok_emb = model(
                inp, att, tiss, labels, strand, gene_inp, gene_att,
                return_embedding=True,
                cre_token_position=cre_pos, gene_token_position=gene_pos,
            )
        return {
            "pred": pred.numpy().reshape(d, t),
            "embd": embd.numpy().reshape(d, t, e),
            "gene_tok": gene_tok_emb.numpy().reshape(d, t, e),
            "cre_tok": cre_tok_emb.numpy().reshape(d, t, e),
        }

    # --- our side, through the production converter ---
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = jax.tree.map(jnp.asarray, convert.convert_seq2gene(sd, num_heads=heads, encoder_num_heads=4))

    def make_cfg(compute_dtype="float32"):
        return ModelConfig(
            window_encoder=_wcfg(vocab=vocab, e=token_e, heads=4, layers=2),
            seq2gene=Seq2GeneConfig(
                emb_dim=e, gene_emb_dim=token_e, token_dim=token_e, num_heads=heads,
                num_layers=layers, num_tissues=tissues_all, only_cross_attention=False,
                multi_head=True,
            ),
            precision=PrecisionPolicy(compute_dtype=compute_dtype),
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
        cre_token_position=jnp.asarray(cre_pos.numpy(), jnp.int32),
        gene_token_position=jnp.asarray(gene_pos.numpy(), jnp.int32),
    )
    return run_reference, params, batch, make_cfg


def test_full_model_parity():
    """End-to-end: reference Seq2GenePredictorCombinedModulator vs our forward."""
    run_reference, params, batch, make_cfg = _full_model_setup()
    ref = run_reference()
    out = seq2gene_forward(params, batch, make_cfg("float32"))

    np.testing.assert_allclose(np.asarray(out.pooled_embedding), ref["embd"], rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.pred_expression), ref["pred"], rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.gene_token_embedding), ref["gene_tok"], rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.cre_token_embedding), ref["cre_tok"], rtol=1e-3, atol=1e-4)


def test_window_classifier_parity():
    """Full seq2reg classification path (logits) vs the reference forward."""
    torch.set_float32_matmul_precision("highest")
    model = _tiny_seq2reg(tissues=5)
    n, length = 8, 12
    tokens = torch.randint(4, 40, (n, 1, length))
    lens = torch.full((n,), length)
    pad_mask = _suffix_mask(lens, length).unsqueeze(1)
    tissue = torch.tensor([0, 1, 2, 3, 4, 0, 2, 4])
    with torch.no_grad():
        logits, _ = model(tokens, pad_mask, tissue, precision=None)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = jax.tree.map(jnp.asarray, convert.convert_window_encoder(sd, num_heads=4))
    from variantformer_tpu.models.seq2reg import classify_windows

    cfg = _wcfg()
    spec = AttnSpec(num_heads=4, head_dim=8)
    emb = encode_windows(
        params, jnp.asarray(tokens[:, 0, :].numpy()), jnp.asarray(lens.numpy()),
        jnp.zeros((n,), jnp.int32), cfg, spec, FP32,
    )
    ours = classify_windows(params, emb, jnp.asarray(tissue.numpy()))
    np.testing.assert_allclose(
        np.asarray(ours), logits.numpy(), rtol=1e-3, atol=1e-4
    )


@pytest.mark.mid
def test_model_manager_round_trip(tmp_path):
    """Synthetic torch .pth checkpoints through the production loader:
    ModelManager calibrates configs from hyper-parameters, converts, and the
    loaded model matches the reference forward."""
    import dataclasses

    from seq2gene.model_combined_modulator import Seq2GenePredictorCombinedModulator

    from variantformer_tpu.api.model_manager import ModelManager
    from variantformer_tpu.config import ModelConfig

    vocab, token_e, e, heads, layers, length = 40, 32, 48, 4, 2, 12
    cre_tok = _tiny_seq2reg(vocab=vocab, e=token_e, tissues=7)
    gene_tok = _tiny_seq2reg(vocab=vocab, e=token_e, tissues=7)
    model = Seq2GenePredictorCombinedModulator(
        num_tissues=7, emb_dim=e, gene_emb_dim=token_e, num_heads=heads,
        num_layers=layers, use_alibi=True, mlp_dout=0.0, use_context=True,
        token_dim=token_e, cre_tokenizer=cre_tok, gene_tokenizer=gene_tok,
        gene_pooling="multi_registry", only_cross_attention=False,
        use_bigger_head=True, multi_head=True, use_batching=True,
        train_gene_tokenizer=True, cross_alibi=False, use_res=False,
    ).eval()

    tok_path = str(tmp_path / "tokenizer.pth")
    torch.save(
        {
            "state_dict": cre_tok.state_dict(),
            "hyper_parameters": vars(cre_tok.hparams),
        },
        tok_path,
    )
    model_path = str(tmp_path / "model.pth")
    torch.save(
        {
            "state_dict": model.state_dict(),
            "hyper_parameters": {
                "num_tissues": 7, "emb_dim": e, "gene_emb_dim": token_e,
                "num_heads": heads, "num_layers": layers, "use_alibi": True,
                "use_context": True, "token_dim": token_e,
                "gene_pooling": "multi_registry",
                "only_cross_attention": False, "use_bigger_head": True,
            },
        },
        model_path,
    )

    cfg = ModelConfig(checkpoint_path=model_path)
    manager = ModelManager(cfg, tokenizer_checkpoint_path=tok_path)
    loaded = manager.load_model(param_dtype=jnp.float32)
    assert loaded.config.window_encoder.embedding_dim == token_e
    assert loaded.config.window_encoder.num_heads == heads
    assert loaded.config.seq2gene.emb_dim == e
    assert loaded.config.seq2gene.only_cross_attention is False
    assert loaded.config.window_encoder.use_context is False  # detected from weights

    # forward parity against the torch model
    import types

    model.trainer = types.SimpleNamespace(precision="bf16-mixed")
    rng = np.random.default_rng(0)
    c, g = 3, 2
    inp = [torch.randint(4, vocab, (c, 1, length))]
    att = [torch.zeros(c, 1, length, dtype=torch.bool)]
    tiss = [torch.tensor([1, 5])]
    labels = [torch.tensor(rng.integers(0, 9, c))]
    gene_inp = [torch.randint(4, vocab, (g, 1, length))]
    gene_att = [torch.zeros(g, 1, length, dtype=torch.bool)]
    with torch.no_grad():
        pred, _, _, _, _ = model(
            inp, att, tiss, labels, torch.zeros(1, 1, dtype=torch.long),
            gene_inp, gene_att, return_embedding=True,
        )
    cfg2 = dataclasses.replace(
        loaded.config,
        precision=PrecisionPolicy(compute_dtype="float32"),
    )
    batch = Seq2GeneBatch(
        cre_tokens=jnp.asarray(inp[0][:, 0, :].numpy())[None],
        cre_tok_len=jnp.full((1, c), length, jnp.int32),
        cre_count=jnp.asarray([c], jnp.int32),
        cre_labels=jnp.asarray(labels[0].numpy())[None],
        gene_tokens=jnp.asarray(gene_inp[0][:, 0, :].numpy())[None],
        gene_tok_len=jnp.full((1, g), length, jnp.int32),
        gene_count=jnp.asarray([g], jnp.int32),
        tissue_ids=jnp.asarray([1, 5], jnp.int32),
    )
    out = seq2gene_forward(loaded.params, batch, cfg2)
    np.testing.assert_allclose(
        np.asarray(out.pred_expression)[0], pred.numpy().reshape(2),
        rtol=1e-3, atol=1e-5,
    )
