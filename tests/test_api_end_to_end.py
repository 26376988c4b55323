"""End-to-end API tests on a synthetic genome: vcf2exp and VEP paths.

Builds a tiny FASTA + VCF + gencode + CRE map fixture set and drives the
public processors with a tiny random model — the full pipeline from raw
files to expression predictions, with variant-effect invariants:
  * a het variant inside a CRE changes predictions vs the reference genome,
  * ref-zygosity predictions equal the no-VCF vcf2exp predictions,
  * minus-strand genes run the reverse-complement path.
"""

import numpy as np
import pandas as pd
import pytest

import jax

from variantformer_tpu.api.vcfprocessor import DataSources, VCFProcessor
from variantformer_tpu.api.variantprocessor import VariantProcessor
from variantformer_tpu.config import (
    DatasetConfig,
    ModelConfig,
    Seq2GeneConfig,
    WindowEncoderConfig,
)
from variantformer_tpu.models.init import init_seq2gene
from variantformer_tpu.utils.bgzf import write_bgzf


def _tiny_cfg(vocab_size: int) -> ModelConfig:
    return ModelConfig(
        window_encoder=WindowEncoderConfig(
            vocab_size=vocab_size, embedding_dim=16, num_heads=2, num_layers=2,
            ffn_hidden_dim=32, token_length=16,
        ),
        seq2gene=Seq2GeneConfig(
            emb_dim=24, gene_emb_dim=16, token_dim=16, num_heads=4,
            num_layers=2, ffn_hidden_dim=48,
        ),
        dataset=DatasetConfig(
            max_length=16, max_chunks=8, cre_neighbour_hood=5,
            gene_upstream_neighbour_hood=20, gene_downstream_neighbour_hood=400,
        ),
    )


@pytest.fixture(scope="module")
def fixture_env(tmp_path_factory):
    root = tmp_path_factory.mktemp("genome")
    rng = np.random.default_rng(0)
    chr_len = 3000
    seq = "".join(rng.choice(list("ACGT"), chr_len))
    fasta = root / "genome.fa"
    with open(fasta, "w") as fh:
        fh.write(">chr1 synthetic\n")
        for i in range(0, chr_len, 60):
            fh.write(seq[i : i + 60] + "\n")

    gencode = root / "gencode.csv"
    pd.DataFrame(
        [
            {"gene_id": "GENEPLUS.1", "gene_name": "PLUS", "chromosome": "chr1",
             "start": 500, "end": 1400, "strand": "+"},
            {"gene_id": "GENEMINUS.1", "gene_name": "MINUS", "chromosome": "chr1",
             "start": 1600, "end": 2500, "strand": "-"},
        ]
    ).to_csv(gencode, index=False)

    cre_maps = {
        "GENEPLUS.1": pd.DataFrame(
            [
                {"chromosome": "chr1", "start_cre": 100, "end_cre": 160,
                 "cre_name": "PLS"},
                {"chromosome": "chr1", "start_cre": 300, "end_cre": 380,
                 "cre_name": "dELS"},
                {"chromosome": "chr1", "start_cre": 700, "end_cre": 760,
                 "cre_name": "pELS"},
            ]
        ),
        "GENEMINUS.1": pd.DataFrame(
            [
                {"chromosome": "chr1", "start_cre": 1700, "end_cre": 1780,
                 "cre_name": "PLS,CTCF-bound"},
                {"chromosome": "chr1", "start_cre": 2600, "end_cre": 2660,
                 "cre_name": "dELS"},
            ]
        ),
    }

    # VCF: het SNP inside GENEPLUS's second CRE (+ gene body), hom SNP
    # upstream of nothing (outside all regions).
    def base_at(i):
        return seq[i]

    pos_in_cre = 321  # 1-based; inside CRE [300,380) and not the ref base
    ref1 = base_at(pos_in_cre - 1)
    alt1 = {"A": "G", "C": "T", "G": "A", "T": "C"}[ref1]
    pos_in_gene = 901
    ref2 = base_at(pos_in_gene - 1)
    alt2 = {"A": "C", "C": "A", "G": "T", "T": "G"}[ref2]
    vcf_lines = [
        "##fileformat=VCFv4.2",
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1",
        f"chr1\t{pos_in_cre}\t.\t{ref1}\t{alt1}\t.\tPASS\t.\tGT\t0|1",
        f"chr1\t{pos_in_gene}\t.\t{ref2}\t{alt2}\t.\tPASS\t.\tGT\t1|1",
    ]
    vcf = root / "donor.vcf.gz"
    write_bgzf(str(vcf), ("\n".join(vcf_lines) + "\n").encode())

    # vocab: derive from the real 500-token file if present, else synth small
    from variantformer_tpu.utils.assets import resolve_vocab_path

    vocab_path = resolve_vocab_path("bpe_vocabulary_500.json")
    tissue_vocab = root / "tissues.yaml"
    tissue_vocab.write_text(
        "".join(f"tissue{i}: {i}\n" for i in range(8))
    )
    sources = DataSources(
        fasta_path=str(fasta),
        gencode_path=str(gencode),
        bpe_vocab_path=vocab_path,
        tissue_vocab_path=str(tissue_vocab),
        cre_map_provider=lambda g: cre_maps[g],
    )
    return {
        "sources": sources,
        "vcf": str(vcf),
        "root": root,
        "variant": ("chr1", pos_in_cre, ref1, alt1),
        "seq": seq,
    }


@pytest.fixture(scope="module")
def processor(fixture_env):
    cfg = _tiny_cfg(vocab_size=500)
    proc = VCFProcessor(sources=fixture_env["sources"], config=cfg)
    params = init_seq2gene(jax.random.key(0), cfg)
    proc.set_params(params)
    return proc


def test_vcf2exp_end_to_end(processor, fixture_env):
    query = pd.DataFrame(
        {
            "gene_id": ["GENEPLUS.1", "GENEMINUS.1"],
            "tissues": ["tissue0,tissue3", "tissue0,tissue3"],
        }
    )
    out = processor.predict(fixture_env["vcf"], query)
    assert len(out) == 2
    for pred, emb in zip(out["predicted_expression"], out["embeddings"]):
        assert pred.shape == (2,)
        assert emb.shape == (2, 24)
        assert np.all(np.isfinite(pred))
        assert np.all(pred >= 0)


def test_variant_changes_prediction(processor, fixture_env):
    query = pd.DataFrame({"gene_id": ["GENEPLUS.1"], "tissues": ["tissue1"]})
    with_vcf = processor.predict(fixture_env["vcf"], query)
    without = processor.predict(None, query)
    assert not np.allclose(
        with_vcf["predicted_expression"][0], without["predicted_expression"][0]
    ), "a variant inside a CRE must change the prediction"


def test_unknown_gene_and_tissue_filtered(processor):
    query = pd.DataFrame(
        {
            "gene_id": ["GENEPLUS.1", "NOPE.1"],
            "tissues": ["tissue0,badtissue", "tissue0"],
        }
    )
    validated = processor.validate_query(query)
    assert len(validated) == 1
    assert validated.iloc[0]["tissues"] == [0]


def test_create_vcf_from_variant(processor, fixture_env, tmp_path):
    seq = fixture_env["seq"]
    variant_df = pd.DataFrame(
        {"chrom": ["chr1"], "pos": [50], "ref": [seq[49]],
         "alt": ["A" if seq[49] != "A" else "C"], "GT": ["0|1"]}
    )
    out_path = processor.create_vcf_from_variant(
        variant_df, str(tmp_path / "new.vcf.gz")
    )
    from variantformer_tpu.utils.vcf import VCFReader

    reader = VCFReader(out_path)
    assert len(reader.query("chr1", 0, 100)) == 1
    # reference mismatch must raise
    bad = variant_df.assign(ref=["N"])
    with pytest.raises(ValueError, match="Reference mismatch"):
        processor.create_vcf_from_variant(bad, str(tmp_path / "bad.vcf.gz"))


def test_vep_end_to_end(fixture_env, tmp_path):
    cfg = _tiny_cfg(vocab_size=500)
    vp = VariantProcessor(sources=fixture_env["sources"], config=cfg)
    params = init_seq2gene(jax.random.key(1), cfg)
    vp.set_params(params)
    chrom, pos, ref, alt = fixture_env["variant"]
    var_df = pd.DataFrame(
        {
            "chrom": [chrom], "pos": [pos], "ref": [ref], "alt": [alt],
            "tissue": ["tissue0,tissue2"],
        }
    )
    df = vp.predict(
        var_df, str(tmp_path / "vep_out"),
        vcf_path=fixture_env["vcf"], sample_name="S1",
    )
    # long frame: populations SAMPLE + REF_HG38, zygosity 0/1/2, 2 tissues,
    # genes within 1Mb (both synthetic genes)
    assert set(df["population"]) == {"SAMPLE", "REF_HG38"}
    assert set(df["zygosity"]) == {"0", "1", "2"}
    sub = df[(df["population"] == "REF_HG38") & (df["genes"] == "GENEPLUS.1")]
    by_zyg = {z: g["gene_exp"].to_numpy() for z, g in sub.groupby("zygosity")}
    # hom vs ref must differ: the variant is inside a CRE of GENEPLUS
    assert not np.allclose(by_zyg["0"], by_zyg["2"])

    scores = vp.format_scores(df)
    assert "REF_HG38-0-exp" in scores.columns
    assert "SAMPLE-2-exp" in scores.columns
    eqtl = vp.eqtl_scores(scores)
    assert any(c.endswith("-log2fc") for c in eqtl.columns)
    ref0 = scores["REF_HG38-0-exp"].to_numpy()
    hom = scores["REF_HG38-2-exp"].to_numpy()
    expected = np.log2((hom + 1e-10) / (ref0 + 1e-10))
    got = eqtl["VF-REF_HG38-2-exp-log2fc"].to_numpy()
    np.testing.assert_allclose(got, expected, rtol=1e-3, atol=1e-6)


def test_vep_six_population_end_to_end(fixture_env, tmp_path, monkeypatch):
    """The 6-population mode (no sample VCF): per-population precomputed
    sequences load through the manifest layer (synthesized artifacts under
    VFX_ARTIFACTS_DIR, the reference's cres_seqs/genes_seqs manifest
    contract), the long frame carries all six populations x 3 zygosities,
    and a population whose precomputed sequence carries the variant allele
    predicts differently from REF_HG38 (proof the per-population sequences
    are actually consumed)."""
    from variantformer_tpu.api.variantprocessor import POPULATIONS

    seq = fixture_env["seq"]
    cfg = _tiny_cfg(vocab_size=500)
    nb, up, down = 5, 20, 400

    # Variant inside GENEPLUS's third CRE (700-760) AND its gene window.
    pos = 721  # 1-based; sequence index 720
    ref = seq[720]
    alt = {"A": "G", "C": "T", "G": "A", "T": "C"}[ref]

    arts = tmp_path / "arts"
    geno = arts / "model" / "common" / "reference_genomes"
    geno.mkdir(parents=True)
    monkeypatch.setenv("VFX_ARTIFACTS_DIR", str(arts))

    genes = {
        # gene_id -> (strand, gene start/end, CRE (start, end, class) rows)
        "GENEPLUS.1": ("+", 500, 1400,
                       [(100, 160, "PLS"), (300, 380, "dELS"),
                        (700, 760, "pELS")]),
        "GENEMINUS.1": ("-", 1600, 2500,
                        [(1700, 1780, "PLS,CTCF-bound"), (2600, 2660, "dELS")]),
    }

    # EUR's haplotype differs from hg38 at a BACKGROUND site (not the
    # queried variant): that background must flow into EUR's predictions.
    bg_pos = 710
    bg_alt = {"A": "C", "C": "G", "G": "T", "T": "A"}[seq[bg_pos - 1]]

    def pop_seq(pop: str, lo: int, hi: int) -> str:
        s = seq[lo:hi]
        if pop == "EUR" and lo < bg_pos <= hi:
            i = bg_pos - lo - 1
            s = s[:i] + bg_alt + s[i + 1 :]
        return s

    cre_rows, gene_rows = [], []
    for pop in POPULATIONS:
        pop_sample = "hg38" if pop == "REF_HG38" else pop
        # one per-chromosome CRE pickle per population
        rows = []
        for gid, (strand, gs, ge, cres) in genes.items():
            for lo, hi, name in cres:
                lo, hi = lo - nb, hi + nb
                rows.append({
                    "start": lo, "end": hi, "cre_name": name,
                    f"{pop_sample}_sequence":
                        f"{pop_seq(pop_sample, lo, hi)},revcomp-unused",
                })
        pkl = geno / f"chr1_{pop}.pkl.gz"
        pd.DataFrame(rows).sort_values("start").to_pickle(
            pkl, compression="gzip"
        )
        cre_rows.append({"chromosome": "chr1", "population": pop,
                         "file_path": str(pkl)})
        # one gene npz per (gene, population), precomputed window arithmetic
        for gid, (strand, gs, ge, _) in genes.items():
            if strand == "-":
                w0, w1 = max(gs, ge - down), ge + up
            else:
                w0, w1 = max(0, gs - up), min(ge, gs + down)
            npz = geno / f"{gid}_{pop}.npz"
            np.savez(npz, sequence=f"{pop_seq(pop_sample, w0, w1)},rev-unused")
            gene_rows.append({"gene_id": gid, "population": pop,
                              "file_path": str(npz)})
    pd.DataFrame(cre_rows).to_parquet(geno / "cres_seqs_manifest.parquet")
    pd.DataFrame(gene_rows).to_parquet(geno / "genes_seqs_manifest.parquet")

    vp = VariantProcessor(sources=fixture_env["sources"], config=cfg)
    vp.set_params(init_seq2gene(jax.random.key(1), cfg))
    var_df = pd.DataFrame(
        {"chrom": ["chr1"], "pos": [pos], "ref": [ref], "alt": [alt],
         "tissue": ["tissue0,tissue2"]}
    )
    df = vp.predict(var_df, str(tmp_path / "vep_pop_out"))

    assert set(df["population"]) == set(POPULATIONS)
    # zygosity-0 rows are kept only for REF_HG38 (reference
    # variantprocessor.py:432-436 drops the rest before the pivot)
    assert set(df.loc[df["zygosity"] == "0", "population"]) == {"REF_HG38"}
    scores = vp.format_scores(df)
    assert "REF_HG38-0-exp" in scores.columns
    for pop in POPULATIONS:
        assert f"{pop}-1-exp" in scores.columns, pop
        assert f"{pop}-2-exp" in scores.columns, pop
    plus = scores[scores["genes"] == "GENEPLUS.1"]
    for zyg in ("1", "2"):
        refz = plus[f"REF_HG38-{zyg}-exp"].to_numpy()
        # AFR shares the hg38 haplotype -> identical predictions; EUR's
        # background site must shift them (per-population sequences are
        # actually consumed, not silently falling back to hg38).
        np.testing.assert_allclose(
            plus[f"AFR-{zyg}-exp"].to_numpy(), refz, rtol=1e-5, atol=1e-6
        )
        assert not np.allclose(plus[f"EUR-{zyg}-exp"].to_numpy(), refz,
                               rtol=1e-4)


@pytest.mark.mid
def test_vep_batched_dispatch_matches_single(fixture_env, tmp_path):
    """variants_per_dispatch=2 (D=6 per device call) must reproduce the
    per-variant (D=3) predictions — variant batching only amortizes
    dispatch latency, never changes the math. With 3 variants the second
    group is partial (1 triple) and exercises the pad-to-canonical-k path
    (outputs of the pad rows must be dropped, not mixed in)."""
    import dataclasses

    from variantformer_tpu.config import PrecisionPolicy

    seq = fixture_env["seq"]
    cfg = dataclasses.replace(
        _tiny_cfg(vocab_size=500),
        precision=PrecisionPolicy(compute_dtype="float32"),
    )
    # Three SNPs inside GENEPLUS CREs/gene body at distinct positions.
    rows = []
    for pos in (321, 721, 755):
        ref = seq[pos - 1]
        rows.append({
            "chrom": "chr1", "pos": pos, "ref": ref,
            "alt": {"A": "G", "C": "T", "G": "A", "T": "C"}[ref],
            "tissue": "tissue0,tissue2",
        })
    var_df = pd.DataFrame(rows)

    def run(out_name, k):
        vp = VariantProcessor(sources=fixture_env["sources"], config=cfg)
        vp.set_params(init_seq2gene(jax.random.key(1), cfg))
        df = vp.predict(
            var_df, str(tmp_path / out_name),
            vcf_path=fixture_env["vcf"], sample_name="S1",
            variants_per_dispatch=k,
        )
        return df.sort_values(
            ["pos", "genes", "tissues", "population", "zygosity"]
        ).reset_index(drop=True)

    single = run("single", 1)
    batched = run("batched", 2)
    assert len(single) == len(batched) and len(single) > 0
    np.testing.assert_allclose(
        batched["gene_exp"].to_numpy(float),
        single["gene_exp"].to_numpy(float),
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.stack(batched["gene_emb"].to_list()).astype(float),
        np.stack(single["gene_emb"].to_list()).astype(float),
        rtol=1e-4, atol=1e-5,
    )


@pytest.mark.mid
def test_vep_canonical_cres_matches_bucketed(fixture_env, tmp_path):
    """canonical_cres (one CRE-axis device shape for the whole sweep) must
    reproduce the bucketed predictions exactly — suffix window padding is
    masked, so shape canonicalization never changes the math. It exists
    because each distinct c-bucket is a fresh multi-minute compile on
    remote-compile rigs (measured ~8 min/bucket inside a timed VEP run)."""
    import dataclasses

    from variantformer_tpu.config import PrecisionPolicy

    seq = fixture_env["seq"]
    cfg = dataclasses.replace(
        _tiny_cfg(vocab_size=500),
        precision=PrecisionPolicy(compute_dtype="float32"),
    )
    rows = []
    for pos in (321, 755):
        ref = seq[pos - 1]
        rows.append({
            "chrom": "chr1", "pos": pos, "ref": ref,
            "alt": {"A": "G", "C": "T", "G": "A", "T": "C"}[ref],
            "tissue": "tissue0,tissue2",
        })
    var_df = pd.DataFrame(rows)

    def run(out_name, canonical):
        vp = VariantProcessor(sources=fixture_env["sources"], config=cfg)
        vp.set_params(init_seq2gene(jax.random.key(1), cfg))
        df = vp.predict(
            var_df, str(tmp_path / out_name),
            vcf_path=fixture_env["vcf"], sample_name="S1",
            canonical_cres=canonical,
        )
        return df.sort_values(
            ["pos", "genes", "tissues", "population", "zygosity"]
        ).reset_index(drop=True)

    bucketed = run("bucketed", None)
    canonical = run("canonical", 96)  # well above the fixture's CRE counts
    assert len(bucketed) == len(canonical) and len(bucketed) > 0
    np.testing.assert_allclose(
        canonical["gene_exp"].to_numpy(float),
        bucketed["gene_exp"].to_numpy(float),
        rtol=1e-5, atol=1e-6,
    )


def test_create_vcf_streaming_merge(processor, fixture_env, tmp_path):
    """Merging into an existing donor VCF must splice new records in position
    order, override at equal positions, handle fresh chromosomes, and stay a
    valid indexed BGZF (the merge STREAMS the donor VCF — O(1) memory)."""
    from variantformer_tpu.utils.bgzf import write_bgzf
    from variantformer_tpu.utils.vcf import VCFReader

    seq = fixture_env["seq"]
    donor = tmp_path / "donor.vcf.gz"
    donor_lines = [
        "##fileformat=VCFv4.2",
        "##contig=<ID=chr1>",
        '##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">',
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tDONOR7",
        f"chr1\t100\t.\t{seq[99]}\tT\t.\tPASS\t.\tGT\t0|1",
        f"chr1\t200\t.\t{seq[199]}\tG\t.\tPASS\t.\tGT\t1|1",
        f"chr1\t300\t.\t{seq[299]}\tA\t.\tPASS\t.\tGT\t0|1",
    ]
    # a donor alt equal to REF would be dropped; patch alts distinct from ref
    def _alt(p, c):
        return c if seq[p - 1] != c else ("A" if c != "A" else "C")
    donor_lines[4] = f"chr1\t100\t.\t{seq[99]}\t{_alt(100,'T')}\t.\tPASS\t.\tGT\t0|1"
    donor_lines[5] = f"chr1\t200\t.\t{seq[199]}\t{_alt(200,'G')}\t.\tPASS\t.\tGT\t1|1"
    donor_lines[6] = f"chr1\t300\t.\t{seq[299]}\t{_alt(300,'A')}\t.\tPASS\t.\tGT\t0|1"
    write_bgzf(str(donor), ("\n".join(donor_lines) + "\n").encode())

    new_df = pd.DataFrame(
        {
            "chrom": ["chr1", "chr1"],
            "pos": [150, 200],           # one spliced between, one override
            "ref": [seq[149], seq[199]],
            "alt": [_alt(150, "C"), _alt(200, "T")],
            "GT": ["0|1", "0|1"],
        }
    )
    out = processor.create_vcf_from_variant(
        new_df, str(tmp_path / "merged.vcf.gz"), vcf_path=str(donor)
    )
    reader = VCFReader(out, sample="DONOR7")
    got = reader.query("chr1", 0, 1000)
    assert [v.pos for v in got] == [100, 150, 200, 300]
    # override at 200: the new 0|1 GT replaced the donor's 1|1
    v200 = got[2]
    assert v200.alleles[0] == seq[199] and v200.alleles[1] == _alt(200, "T")
    # sample name carried over from the donor header
    assert reader.sample_names == ["DONOR7"]
    # unsorted donor input is rejected with a clear error
    bad = tmp_path / "unsorted.vcf.gz"
    write_bgzf(str(bad), ("\n".join(
        donor_lines[:4] + [donor_lines[6], donor_lines[4]]) + "\n").encode())
    with pytest.raises(ValueError, match="not coordinate-sorted"):
        processor.create_vcf_from_variant(
            new_df, str(tmp_path / "bad_merge.vcf.gz"), vcf_path=str(bad)
        )


@pytest.mark.mid
def test_vep_ref_once_matches_legacy(fixture_env, tmp_path, monkeypatch):
    """The ref-once cache (first variant per gene dispatches a full triple +
    streams; later variants run as het/hom pairs with the ref row
    reconstructed from the cache) must reproduce the legacy all-triples
    path on every output column, INCLUDING the position-dependent ref
    token embeddings (host gathers from the cached streams)."""
    import dataclasses

    from variantformer_tpu.config import PrecisionPolicy

    seq = fixture_env["seq"]
    cfg = dataclasses.replace(
        _tiny_cfg(vocab_size=500),
        precision=PrecisionPolicy(compute_dtype="float32"),
    )
    rows = []
    for pos in (321, 721, 755):
        ref = seq[pos - 1]
        rows.append({
            "chrom": "chr1", "pos": pos, "ref": ref,
            "alt": {"A": "G", "C": "T", "G": "A", "T": "C"}[ref],
            "tissue": "tissue0,tissue2",
        })
    var_df = pd.DataFrame(rows)

    def run(out_name, ref_once):
        monkeypatch.setenv("VFX_VEP_REF_ONCE", "1" if ref_once else "0")
        vp = VariantProcessor(sources=fixture_env["sources"], config=cfg)
        vp.set_params(init_seq2gene(jax.random.key(1), cfg))
        df = vp.predict(
            var_df, str(tmp_path / out_name),
            vcf_path=fixture_env["vcf"], sample_name="S1",
        )
        return df.sort_values(
            ["pos", "genes", "tissues", "population", "zygosity"]
        ).reset_index(drop=True)

    legacy = run("legacy", False)
    cached = run("cached", True)
    assert len(legacy) == len(cached) and len(legacy) > 0
    np.testing.assert_allclose(
        cached["gene_exp"].to_numpy(float),
        legacy["gene_exp"].to_numpy(float),
        rtol=1e-5, atol=1e-6,
    )
    for col in ("gene_emb", "gene_token_embedding", "cre_token_embedding"):
        np.testing.assert_allclose(
            np.stack(cached[col].to_list()).astype(float),
            np.stack(legacy[col].to_list()).astype(float),
            rtol=1e-4, atol=1e-5, err_msg=col,
        )


@pytest.mark.mid
def test_vep_ref_cache_eviction_safety(fixture_env, tmp_path, monkeypatch):
    """Pair batching (k=2) + a 1-entry ref cache: buffered het/hom pairs PIN
    their ref entry, so an interleaving (gene, population) group can never
    evict a ref that a later grouped flush still needs (the pre-fix failure
    was a KeyError mid-sweep). Outputs must match the all-triples path and
    telemetry must record the reuse."""
    import dataclasses

    from variantformer_tpu.config import PrecisionPolicy

    seq = fixture_env["seq"]
    cfg = dataclasses.replace(
        _tiny_cfg(vocab_size=500),
        precision=PrecisionPolicy(compute_dtype="float32"),
    )
    # 130/321 sit in CREs only (gene-position NaN), 721/755 in CRE + gene
    # window: two shape-group buffers per (gene, pop) ckey, and the odd
    # count leaves a PARTIAL pair buffer outstanding when the next ckey's
    # ref-miss inserts into the 1-entry cache — the pin must protect it.
    rows = []
    for pos in (130, 321, 721, 755):
        ref = seq[pos - 1]
        rows.append({
            "chrom": "chr1", "pos": pos, "ref": ref,
            "alt": {"A": "G", "C": "T", "G": "A", "T": "C"}[ref],
            "tissue": "tissue0,tissue2",
        })
    var_df = pd.DataFrame(rows)

    def run(out_name, ref_once, cache_max, k):
        monkeypatch.setenv("VFX_VEP_REF_ONCE", "1" if ref_once else "0")
        monkeypatch.setenv("VFX_VEP_REF_CACHE", str(cache_max))
        vp = VariantProcessor(sources=fixture_env["sources"], config=cfg)
        vp.set_params(init_seq2gene(jax.random.key(1), cfg))
        df = vp.predict(
            var_df, str(tmp_path / out_name),
            vcf_path=fixture_env["vcf"], sample_name="S1",
            variants_per_dispatch=k,
        )
        return vp, df.sort_values(
            ["pos", "genes", "tissues", "population", "zygosity"]
        ).reset_index(drop=True)

    _, legacy = run("legacy", False, 8, 1)
    vp, cached = run("cached", True, 1, 2)
    assert len(legacy) == len(cached) and len(legacy) > 0
    np.testing.assert_allclose(
        cached["gene_exp"].to_numpy(float),
        legacy["gene_exp"].to_numpy(float),
        rtol=1e-5, atol=1e-6,
    )
    for col in ("gene_emb", "gene_token_embedding", "cre_token_embedding"):
        np.testing.assert_allclose(
            np.stack(cached[col].to_list()).astype(float),
            np.stack(legacy[col].to_list()).astype(float),
            rtol=1e-4, atol=1e-5, err_msg=col,
        )
    stats = vp.vep_stats
    # 4 in-context variants x 2 populations on one gene: one miss per
    # (gene, pop) ckey, every later variant a het/hom pair (75% ref reuse
    # even at cache_max=1, thanks to pair scheduling); pins mean the
    # outstanding partial buffer never loses its ref (no triple fallback).
    assert stats["ref_misses"] == 2
    assert stats["ref_hits"] == 6
    assert stats.get("ref_fallbacks", 0) == 0
    assert not vp._ref_pins, "all pins released at end of sweep"


@pytest.mark.mid
def test_vep_window_dedup_matches_plain(fixture_env, tmp_path, monkeypatch):
    """Window-dedup pools (encode each unique window once, gather per donor)
    must reproduce the plain per-donor layout on every output column."""
    import dataclasses

    from variantformer_tpu.config import PrecisionPolicy

    seq = fixture_env["seq"]
    cfg = dataclasses.replace(
        _tiny_cfg(vocab_size=500),
        precision=PrecisionPolicy(compute_dtype="float32"),
    )
    rows = []
    for pos in (321, 721):
        ref = seq[pos - 1]
        rows.append({
            "chrom": "chr1", "pos": pos, "ref": ref,
            "alt": {"A": "G", "C": "T", "G": "A", "T": "C"}[ref],
            "tissue": "tissue0,tissue2",
        })
    var_df = pd.DataFrame(rows)

    def run(out_name, dedup):
        monkeypatch.setenv("VFX_VEP_DEDUP", "1" if dedup else "0")
        vp = VariantProcessor(sources=fixture_env["sources"], config=cfg)
        vp.set_params(init_seq2gene(jax.random.key(1), cfg))
        df = vp.predict(
            var_df, str(tmp_path / out_name),
            vcf_path=fixture_env["vcf"], sample_name="S1",
            variants_per_dispatch=2,
        )
        return df.sort_values(
            ["pos", "genes", "tissues", "population", "zygosity"]
        ).reset_index(drop=True)

    plain = run("plain", False)
    dedup = run("dedup", True)
    assert len(plain) == len(dedup) and len(plain) > 0
    np.testing.assert_allclose(
        dedup["gene_exp"].to_numpy(float),
        plain["gene_exp"].to_numpy(float),
        rtol=1e-5, atol=1e-6,
    )
    for col in ("gene_emb", "gene_token_embedding", "cre_token_embedding"):
        np.testing.assert_allclose(
            np.stack(dedup[col].to_list()).astype(float),
            np.stack(plain[col].to_list()).astype(float),
            rtol=1e-4, atol=1e-5, err_msg=col,
        )


def test_dedup_pool_construction():
    """The pool layout itself: unique rows keyed by (len, tokens), gathers
    reconstructing the plain layout exactly, canonical cap padding."""
    from variantformer_tpu.api.variantprocessor import VariantProcessor
    from variantformer_tpu.models.seq2gene import Seq2GeneBatch

    rng = np.random.default_rng(0)
    d, c, g, l = 3, 5, 4, 8
    base_cre = rng.integers(4, 30, (c, l)).astype(np.int32)
    cre_tokens = np.tile(base_cre, (d, 1, 1))
    cre_tokens[1, 2] = rng.integers(4, 30, l)  # one edited window
    base_gene = rng.integers(4, 30, (g, l)).astype(np.int32)
    gene_tokens = np.tile(base_gene, (d, 1, 1))
    batch = Seq2GeneBatch(
        cre_tokens=cre_tokens,
        cre_tok_len=np.full((d, c), l, np.int32),
        cre_count=np.full((d,), c, np.int32),
        cre_labels=np.zeros((d, c), np.int32),
        gene_tokens=gene_tokens,
        gene_tok_len=np.full((d, g), l, np.int32),
        gene_count=np.full((d,), g, np.int32),
        tissue_ids=np.zeros((2,), np.int32),
    )
    out = VariantProcessor._dedup_windows(batch, slack=16)
    assert out.cre_pool_tokens is not None
    assert out.cre_pool_tokens.shape == (c + 16, l)
    # c unique ref windows + 1 edit
    pools = np.asarray(out.cre_pool_tokens)
    gather = np.asarray(out.cre_gather)
    lens = np.asarray(out.cre_pool_len)
    used = np.unique(gather)
    assert len(used) == c + 1
    np.testing.assert_array_equal(pools[gather], cre_tokens)
    np.testing.assert_array_equal(
        lens[gather], np.asarray(batch.cre_tok_len)
    )
    # gene windows are fully shared -> g unique rows
    assert len(np.unique(np.asarray(out.gene_gather))) == g


@pytest.mark.mid
def test_live_app_model_in_the_loop(processor, fixture_env, tmp_path):
    """The live app (api/live.py — the marimo-reactivity equivalent) must
    re-run the MODEL on interaction: a gene/tissue request returns fresh
    predictions over HTTP, an in-silico edit inside a CRE changes them,
    and repeated identical requests hit the app's cache."""
    import json as _json
    import threading
    import urllib.request

    from variantformer_tpu.api.live import LiveExpressionApp

    app = LiveExpressionApp(
        processor, vcf_path=None, workdir=str(tmp_path / "live")
    )
    srv = app.make_server(port=0)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    try:
        host, port = srv.server_address

        def post(payload):
            req = urllib.request.Request(
                f"http://{host}:{port}/api/predict",
                data=_json.dumps(payload).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=120) as resp:
                return _json.loads(resp.read())

        page = urllib.request.urlopen(
            f"http://{host}:{port}/", timeout=30
        ).read().decode()
        for needle in ("id='gene'", "id='edits'", "/api/predict",
                       "data-uberon="):
            assert needle in page, needle

        base = post({"gene": "GENEPLUS.1", "tissues": ["tissue0", "tissue2"]})
        assert set(base["values"]) == {"tissue0", "tissue2"}
        assert base["cached"] is False and base["seconds"] >= 0

        again = post({"gene": "GENEPLUS.1", "tissues": ["tissue0", "tissue2"]})
        assert again["cached"] is True
        assert again["values"] == base["values"]

        seq = fixture_env["seq"]
        pos = 321  # inside GENEPLUS's second CRE
        ref = seq[pos - 1]
        alt = {"A": "G", "C": "T", "G": "A", "T": "C"}[ref]
        edited = post({
            "gene": "GENEPLUS.1", "tissues": ["tissue0", "tissue2"],
            "edits": [{"chrom": "chr1", "pos": pos, "ref": ref, "alt": alt,
                       "zygosity": "het"}],
        })
        assert edited["values"] != base["values"], (
            "an in-silico edit inside a CRE must change the prediction"
        )

        # bad input surfaces as a JSON error, not a server crash
        err = urllib.request.Request(
            f"http://{host}:{port}/api/predict",
            data=_json.dumps({"gene": "NOPE.1"}).encode(),
            headers={"Content-Type": "application/json"},
        )
        try:
            urllib.request.urlopen(err, timeout=30)
            raise AssertionError("expected HTTP 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
            assert "unknown gene" in _json.loads(e.read())["error"]
    finally:
        srv.shutdown()
        srv.server_close()
