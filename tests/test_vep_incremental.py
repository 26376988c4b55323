"""Incremental VEP sample construction must EXACTLY match a full rebuild.

VepSampleBuilder.build caches the per-(gene, population) reference state and
re-tokenizes only the variant-covering CRE windows plus a spliced gene-stream
neighborhood (utils/bpe.splice_encode). This suite fuzzes that path against
the pre-incremental construction — full re-tokenization of every window for
each zygosity (reference vepdataset.py:347-493 semantics) — demanding exact
token equality, and locks the splice-encode primitive itself.
"""

import numpy as np
import pandas as pd
import pytest

from variantformer_tpu.config import DatasetConfig
from variantformer_tpu.data.pipeline import GeneSampleBuilder
from variantformer_tpu.data.vep import Variant, VepSampleBuilder
from variantformer_tpu.utils.assets import resolve_vocab_path
from variantformer_tpu.utils.bpe import BPETokenizer, splice_encode
from variantformer_tpu.utils.fasta import FastaReader
from variantformer_tpu.utils.sequence import reverse_complement

VOCAB = resolve_vocab_path("bpe_vocabulary_500.json")


def _full_rebuild(vb: VepSampleBuilder, variant: Variant, gene_info: dict):
    """The pre-incremental construction: full re-tokenization per zygosity."""
    gene_id = gene_info["gene_id"]
    cre_df = vb._cre_sequences(gene_id, gene_info)
    gene = vb._gene_sequence(gene_info)
    strand = gene_info["strand"]

    overlap_cre = False
    cre_token_position = float("nan")
    df_het, df_hom = cre_df.copy(), cre_df.copy()
    for i, row in cre_df.iterrows():
        if row["start_cre"] > variant.pos and strand == "+":
            break
        if row["end_cre"] < variant.pos and strand == "-":
            break
        if row["start_cre"] < variant.pos <= row["end_cre"]:
            overlap_cre = True
            cre_token_position = i
            pos_on_seq = variant.pos - row["start_cre"] - 1
            het, hom = vb._apply(row["sequence"], pos_on_seq, variant.ref, variant.alt)
            df_het.at[i, "sequence"] = het
            df_hom.at[i, "sequence"] = hom

    overlap_gene = False
    gene_het, gene_hom = dict(gene), dict(gene)
    gtp = [float("nan")] * 3
    if gene["start"] < variant.pos <= gene["end"]:
        overlap_gene = True
        pos_on_gene = variant.pos - gene["start"] - 1
        fwd = gene["sequence"]
        het, hom = vb._apply(fwd, pos_on_gene, variant.ref, variant.alt)
        gtp = [
            vb._gene_token_window(strand, s, pos_on_gene) for s in (fwd, het, hom)
        ]
        gene_het["sequence"] = het
        gene_hom["sequence"] = hom

    if not overlap_cre and not overlap_gene:
        return None
    samples = [
        vb._tokenize(cre_df, gene, gene_id),
        vb._tokenize(df_het, gene_het, gene_id),
        vb._tokenize(df_hom, gene_hom, gene_id),
    ]
    return samples, cre_token_position, gtp


def _make_env(tmp_path, seed, strand, glen=6000):
    rng = np.random.default_rng(seed)
    genome = "".join(rng.choice(list("ACGT"), glen))
    # N runs inside the gene window exercise segment-boundary handling
    for p in (2200, 3100):
        genome = genome[:p] + "N" * int(rng.integers(1, 6)) + genome[p + 5 :]
        genome = genome[:glen]
    fasta = tmp_path / "g.fa"
    with open(fasta, "w") as fh:
        fh.write(">chr1\n")
        for i in range(0, glen, 60):
            fh.write(genome[i : i + 60] + "\n")
    gene_start, gene_end = 1500, 4200
    gencode = pd.DataFrame(
        [{"gene_id": "G.1", "gene_name": "G", "chromosome": "chr1",
          "start": gene_start, "end": gene_end, "strand": strand}]
    )
    cre_map = pd.DataFrame(
        [
            {"chromosome": "chr1", "start_cre": 300, "end_cre": 420, "cre_name": "PLS"},
            {"chromosome": "chr1", "start_cre": 430, "end_cre": 520, "cre_name": "dELS"},
            # overlapping pair: one variant can hit BOTH windows
            {"chromosome": "chr1", "start_cre": 900, "end_cre": 1010, "cre_name": "pELS"},
            {"chromosome": "chr1", "start_cre": 960, "end_cre": 1100, "cre_name": "PLS"},
            {"chromosome": "chr1", "start_cre": 1700, "end_cre": 1800, "cre_name": "CA"},
        ]
    )
    cfg = DatasetConfig(
        max_length=24, max_chunks=32, cre_neighbour_hood=5,
        gene_upstream_neighbour_hood=40, gene_downstream_neighbour_hood=2000,
    )
    builder = GeneSampleBuilder(
        cfg=cfg,
        fasta=FastaReader(str(fasta)),
        tokenizer=BPETokenizer.from_file(VOCAB),
        gencode=gencode,
        cre_map_provider=lambda gid: cre_map,
    )
    return VepSampleBuilder(builder), genome, gene_start, gene_end


def _assert_samples_equal(got, want, ctx):
    for zyg, (g, w) in enumerate(zip(got, want)):
        for field in ("cre_tokens", "cre_tok_len", "cre_labels",
                      "gene_tokens", "gene_tok_len"):
            np.testing.assert_array_equal(
                getattr(g, field), getattr(w, field),
                err_msg=f"{ctx} zyg={zyg} field={field}",
            )
        assert g.strand == w.strand


@pytest.mark.parametrize("strand", ["+", "-"])
def test_incremental_matches_full_rebuild(tmp_path, strand):
    vb, genome, gs, ge = _make_env(tmp_path, 11 if strand == "+" else 12, strand)
    gene_info = vb.b.gene_info("G.1")
    rng = np.random.default_rng(99)
    checked = 0
    # sweep positions across CREs, CRE overlaps, gene body, and both at once
    positions = list(rng.integers(300, 4300, 60)) + [905, 965, 1000, 1710, 1750]
    for pos1 in positions:  # 1-based VCF position
        pos1 = int(pos1)
        ref = genome[pos1 - 1]
        if ref not in "ACGT":
            continue
        alts = [a for a in "ACGT" if a != ref]
        alt = alts[int(rng.integers(0, 3))]
        if rng.integers(0, 4) == 0:
            alt = alt + "GT"  # insertion: hom replaces 1 char with 3
        variant = Variant(chrom="chr1", pos=pos1, ref=ref, alt=alt, tissue=[0])
        got_exc = want_exc = None
        try:
            got = vb.build(variant, gene_info, validate_ref=True)
        except ValueError as exc:
            got_exc = str(exc)
        try:
            want = _full_rebuild(vb, variant, gene_info)
        except ValueError as exc:
            want_exc = str(exc)
        if want_exc is not None or got_exc is not None:
            # e.g. an insertion overlapping the gene: het code is 'N', and
            # encode_with_position's invalid-character error must reproduce
            assert got_exc is not None and want_exc is not None, (
                pos1, alt, got_exc, want_exc)
            assert "invalid character" in got_exc
            checked += 1
            continue
        if want is None:
            assert got.variant_type == "No overlap" and got.samples == []
            continue
        want_samples, want_ctp, want_gtp = want
        _assert_samples_equal(got.samples, want_samples, f"pos={pos1} alt={alt}")
        assert (got.cre_token_position == want_ctp
                or (np.isnan(got.cre_token_position) and np.isnan(want_ctp)))
        for a, b in zip(got.gene_token_positions, want_gtp):
            assert a == b or (np.isnan(a) and np.isnan(b)), (pos1, a, b)
        checked += 1
    assert checked >= 30  # the sweep actually exercised overlapping variants


def test_ref_sample_cached_and_shared(tmp_path):
    vb, genome, gs, ge = _make_env(tmp_path, 21, "+")
    gene_info = vb.b.gene_info("G.1")
    pos1 = gs + 50
    ref = genome[pos1 - 1]
    alt = "A" if ref != "A" else "C"
    v1 = Variant(chrom="chr1", pos=pos1, ref=ref, alt=alt, tissue=[0])
    s1 = vb.build(v1, gene_info)
    pos2 = gs + 300
    ref2 = genome[pos2 - 1]
    v2 = Variant(chrom="chr1", pos=pos2, ref=ref2,
                 alt="A" if ref2 != "A" else "C", tissue=[0])
    s2 = vb.build(v2, gene_info)
    # the ref GeneSample object is the SAME cached instance across variants
    assert s1.samples[0] is s2.samples[0]
    # cache eviction keeps the map bounded
    assert len(vb._cache) <= vb._cache_max


def test_splice_encode_exact_randomized():
    tok = BPETokenizer.from_file(VOCAB)
    rng = np.random.default_rng(5)
    for trial in range(60):
        n = int(rng.integers(200, 8000))
        seq = "".join(rng.choice(list("ACGT"), n))
        for _ in range(int(rng.integers(0, 3))):
            p = int(rng.integers(0, n - 10))
            seq = seq[: p] + "N" * int(rng.integers(1, 5)) + seq[p + 3 :]
        seq = seq[:n]
        ids, st, en = tok.encode_with_offsets(seq)
        while True:
            pos = int(rng.integers(0, len(seq)))
            if seq[pos] in "ACGT":
                break
        repl = ["A", "T", "W", "K", "N", "ACGTA"][int(rng.integers(0, 6))]
        out, _, _, _, _ = splice_encode(tok, seq, ids, st, en, pos, repl)
        expect = tok.encode_ids(seq[: pos] + repl + seq[pos + 1 :])
        np.testing.assert_array_equal(out, expect, err_msg=f"trial={trial}")


def test_splice_encode_tiny_margin_falls_back_exact():
    """Force the escalation/fallback path with a pathological margin."""
    tok = BPETokenizer.from_file(VOCAB)
    rng = np.random.default_rng(7)
    seq = "".join(rng.choice(list("ACGT"), 500))
    ids, st, en = tok.encode_with_offsets(seq)
    for pos in (0, 1, 250, 498, 499):
        out, _, _, _, _ = splice_encode(tok, seq, ids, st, en, pos, "W", margin=1)
        expect = tok.encode_ids(seq[:pos] + "W" + seq[pos + 1 :])
        np.testing.assert_array_equal(out, expect)
