"""Differential test of the VEP data path against the reference VEPDataset.

Both pipelines consume identical synthesized precomputed-population fixtures
(per-chromosome CRE pickle + per-gene npz + gene->CRE map CSV, the manifest
contract) and must produce the same ref/het/hom token tensors, attention
masks, cCRE labels, and variant token positions. This covers variant
application, IUPAC het encoding, strand handling, window chunking, and
``encode_with_position`` semantics end to end at the tensor level.
"""

import gzip
import pickle

import numpy as np
import pandas as pd
import pytest

from tests import reference_oracle

if not reference_oracle.reference_available():
    pytest.skip("reference checkout not available", allow_module_level=True)

reference_oracle.install_reference_stubs()

tokenizers = pytest.importorskip("tokenizers")

from variantformer_tpu.config import DatasetConfig
from variantformer_tpu.data.pipeline import GeneSampleBuilder
from variantformer_tpu.data.vep import Variant, VepSampleBuilder
from variantformer_tpu.utils.assets import resolve_vocab_path
from variantformer_tpu.utils.bpe import BPETokenizer
from variantformer_tpu.utils.fasta import FastaReader
from variantformer_tpu.utils.sequence import reverse_complement

VOCAB = resolve_vocab_path("bpe_vocabulary_500.json")


class _PathManifest:
    def __init__(self, mapping):
        self.mapping = mapping

    def get_file_path(self, *key):
        return self.mapping.get(tuple(key))


@pytest.mark.parametrize("strand", ["+", "-"])
def test_vep_batch_parity_precomputed(tmp_path, strand):
    from datasets.vepdataset import VEPDataset
    from utils.seq import BPEEncoder

    rng = np.random.default_rng(3 if strand == "+" else 4)
    chrom = "chr1"
    # --- synthesize a genome region, gene, and CREs ---
    glen = 2400
    genome = "".join(rng.choice(list("ACGT"), glen))
    gene_start, gene_end = 700, 1900
    nb = 5
    up, down = 30, 600
    cre_rows = [
        {"chromosome": chrom, "start_cre": 200, "end_cre": 260, "cre_name": "PLS"},
        {"chromosome": chrom, "start_cre": 400, "end_cre": 470, "cre_name": "dELS"},
        {"chromosome": chrom, "start_cre": 1000, "end_cre": 1080, "cre_name": "pELS"},
    ]
    # gene window arithmetic (reference load_gene_data)
    if strand == "-":
        seq_start = max(gene_start, gene_end - down)
        seq_end = gene_end + up
    else:
        seq_start = max(0, gene_start - up)
        seq_end = min(gene_end, gene_start + down)
    gene_seq = genome[seq_start:seq_end]

    # --- write reference-format fixtures ---
    cre_map_csv = tmp_path / "cre_map.csv"
    pd.DataFrame(cre_rows).assign(strand=strand).rename(
        columns={}
    ).to_csv(cre_map_csv, index=False)

    bpe_hf = BPEEncoder()
    bpe_hf.load_vocabulary(VOCAB)
    pkl_rows = []
    for row in cre_rows:
        s, e = row["start_cre"] - nb, row["end_cre"] + nb
        fwd = genome[s:e]
        rev = reverse_complement(fwd)
        f_ids, _, r_ids, _ = bpe_hf.encode([fwd, rev])
        pkl_rows.append(
            {
                "chrom": chrom, "start": s, "end": e,
                "sequence": fwd + "," + rev,
                "encoded_seq": [[float(x) for x in f_ids], [float(x) for x in r_ids]],
                "cCRE": row["cre_name"],
            }
        )
    cre_pkl = tmp_path / "cres.pkl.gz"
    pd.DataFrame(pkl_rows).to_pickle(cre_pkl, compression="gzip")
    gene_npz = tmp_path / "gene.npz"
    np.savez(
        gene_npz,
        sequence=gene_seq + "," + reverse_complement(gene_seq),
        strand=strand,
    )

    gene_info = {
        "gene_id": "GX.1", "start": gene_start, "end": gene_end,
        "strand": strand, "chromosome": chrom, "gene_name": "GX",
    }
    max_length, max_chunks = 16, 12
    # variant inside the second CRE and the gene window when possible
    pos = 431  # 1-based, inside CRE [395, 475)
    ref_base = genome[pos - 1]
    alt_base = {"A": "G", "C": "T", "G": "A", "T": "C"}[ref_base]

    # --- reference pipeline ---
    ref_ds = VEPDataset(
        bpe_encoder=bpe_hf,
        gene_cre_manifest=_PathManifest({("GX.1",): str(cre_map_csv)}),
        gene_seq_manifest=_PathManifest({("GX.1", "POP"): str(gene_npz)}),
        cre_seq_manifest=_PathManifest({(chrom, "POP"): str(cre_pkl)}),
        max_length=max_length,
        context_window=max_chunks,
        cre_neighbour_hood=nb,
        gene_upstream_neighbour_hood=up,
        gene_downstream_neighbour_hood=down,
    )
    from datasets.vepdataset import Variant as RefVariant

    ref_out = ref_ds.process_variant_gene_pair(
        RefVariant(chrom=chrom, pos=pos, ref=ref_base, alt=alt_base,
                   tissue=[2, 5], gene_id=["GX"]),
        gene_info, population="POP", sample_name="hg38", tissue=[2, 5],
    )
    assert ref_out["variant_type"] != "No overlap"

    # --- our pipeline (precomputed path) ---
    fa = tmp_path / "genome.fa"
    with open(fa, "w") as fh:
        fh.write(">chr1\n")
        for i in range(0, glen, 60):
            fh.write(genome[i : i + 60] + "\n")
    cfg = DatasetConfig(
        max_length=max_length, max_chunks=max_chunks, cre_neighbour_hood=nb,
        gene_upstream_neighbour_hood=up, gene_downstream_neighbour_hood=down,
    )
    tok = BPETokenizer.from_file(VOCAB)
    base = GeneSampleBuilder(
        cfg, FastaReader(fa), tok,
        pd.DataFrame([{**gene_info, "chromosome": chrom}]),
        lambda g: pd.DataFrame(cre_rows),
    )
    builder = VepSampleBuilder(base)
    mine = builder.build(
        Variant(chrom=chrom, pos=pos, ref=ref_base, alt=alt_base, tissue=[2, 5]),
        gene_info,
        precomputed=(
            "POP",
            _PathManifest({(chrom, "POP"): str(cre_pkl)}),
            _PathManifest({("GX.1", "POP"): str(gene_npz)}),
        ),
    )

    # --- compare the three zygosity batches tensor by tensor ---
    for zyg, ref_batch in (("ref", ref_out["ref_batch"]),
                           ("het", ref_out["het_batch"]),
                           ("hom", ref_out["hom_batch"])):
        sample = mine.samples[{"ref": 0, "het": 1, "hom": 2}[zyg]]
        ref_tokens = ref_batch["cre_sequences"][0][:, 0, :].numpy()
        np.testing.assert_array_equal(sample.cre_tokens, ref_tokens, err_msg=zyg)
        ref_mask = ref_batch["cre_attention_masks"][0][:, 0, :].numpy()
        ours_valid_counts = sample.cre_tok_len
        np.testing.assert_array_equal(
            (~ref_mask).sum(-1), ours_valid_counts, err_msg=zyg
        )
        ref_labels = ref_batch["ref_labels"][0].numpy()
        np.testing.assert_array_equal(sample.cre_labels, ref_labels, err_msg=zyg)
        ref_gene = ref_batch["gene_embeddings"][0][:, 0, :].numpy()
        np.testing.assert_array_equal(sample.gene_tokens, ref_gene, err_msg=zyg)
        ref_gene_mask = ref_batch["gene_attention_masks"][0][:, 0, :].numpy()
        np.testing.assert_array_equal(
            (~ref_gene_mask).sum(-1), sample.gene_tok_len, err_msg=zyg
        )
    # variant positions
    ref_cre_pos = float(ref_out["ref_batch"]["cre_token_position"][0, 0])
    assert mine.cre_token_position == ref_cre_pos
    for i, key in enumerate(["ref_batch", "het_batch", "hom_batch"]):
        ref_gene_pos = float(ref_out[key]["gene_token_position"][0, 0])
        if np.isnan(ref_gene_pos):
            assert np.isnan(mine.gene_token_positions[i])
        else:
            assert mine.gene_token_positions[i] == ref_gene_pos
