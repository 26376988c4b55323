"""Artifact downloader: fetch the released model/data artifacts from the
public bucket into the local artifacts directory.

Declarative equivalent of the reference's download_artifacts.py (C10 in
SURVEY.md §2.1), built on the process-safe cached fetcher — already-present
files are skipped, concurrent invocations converge on one download. Requires
network access and s3fs; everything else in the framework degrades gracefully
when artifacts are absent.

Usage:
    python -m variantformer_tpu.data.download_artifacts [--only SUBSTR] [--list]
"""

from __future__ import annotations

import argparse
import dataclasses
import logging

from variantformer_tpu.utils.assets import CachedFetcher, artifacts_dir

log = logging.getLogger(__name__)

BUCKET = "czi-variantformer"


@dataclasses.dataclass(frozen=True)
class Artifact:
    remote_key: str   # bucket-relative S3 key, or a full http(s) URL
    local_path: str   # path under the artifacts dir

    @property
    def is_url(self) -> bool:
        return self.remote_key.startswith("http")


# Vocabulary/config data files ship in the reference's git repo (not the S3
# bucket); fetch them from raw.githubusercontent for standalone deployments.
_REF_RAW = "https://raw.githubusercontent.com/czi-ai/variantformer/main"
VOCAB_ARTIFACTS = [
    Artifact(f"{_REF_RAW}/vocabs/bpe_vocabulary_500.json",
             "vocabs/bpe_vocabulary_500.json"),
    Artifact(f"{_REF_RAW}/vocabs/bpe_vocabulary_500_using_huggingface.json",
             "vocabs/bpe_vocabulary_500_using_huggingface.json"),
    Artifact(f"{_REF_RAW}/vocabs/tissue_vocab.yaml", "vocabs/tissue_vocab.yaml"),
    Artifact(f"{_REF_RAW}/vocabs/tissue_prob.yaml", "vocabs/tissue_prob.yaml"),
    Artifact(f"{_REF_RAW}/vocabs/dataset_vocab.yaml", "vocabs/dataset_vocab.yaml"),
]


def _af_tables():
    chroms = [f"chr{i}" for i in range(1, 23)] + ["chrX", "chrY"]
    return [
        Artifact(
            f"data/1KG_af_hg38_tables/1KG_hg38_af_{c}.tsv",
            f"1KG_af_hg38_tables/1KG_hg38_af_{c}.tsv",
        )
        for c in chroms
    ]


ARTIFACTS: list[Artifact] = [
    # gene annotations + tokenizer/model checkpoints
    Artifact("model/v4_ag/all_genes_gencodeV24.csv", "all_genes_ag_gencodeV24.csv"),
    Artifact("model/v4_pcg/all_genes_gencodeV24.csv", "all_genes_v1_pcg_gencodeV24.csv"),
    Artifact("model/v4_pcg/tokenizer_checkpoint.pth", "pretrained_tokenizers_checkpoint.pth"),
    Artifact("model/v4_ag/checkpoint.pth", "v4_ag_epoch9_checkpoint.pth"),
    Artifact("model/v4_pcg/checkpoint.pth", "v4_pcg_epoch11_checkpoint.pth"),
    # reference genome + example donor VCF + cCRE bed
    Artifact("data/GRCh38_no_alt_analysis_set_GCA_000001405.15.fasta.gz",
             "GRCh38_no_alt_analysis_set_GCA_000001405.15.fasta.gz"),
    Artifact("data/HG00096.vcf.gz", "HG00096.vcf.gz"),
    Artifact("data/HG00096.vcf.gz.tbi", "HG00096.vcf.gz.tbi"),
    Artifact("model/common/ENCFF234XEZ.bed.gz", "ENCFF234XEZ.bed.gz"),
    # gold regression artifacts
    Artifact("gold_data/f9bbc0ba.pq", "f9bbc0ba.pq"),
    Artifact("gold_data/a0063c48.pq", "a0063c48.pq"),
    Artifact("gold_data/9a83db58.pq", "9a83db58.pq"),
    Artifact("gold_data/924979a7.pq", "924979a7.pq"),
    Artifact("gold_data/befd2388.npz", "befd2388.npz"),
    Artifact("gold_data/be73e19a.pq", "be73e19a.pq"),
    Artifact("gold_data/b23c9b69.pq", "b23c9b69.pq"),
    # parquet manifests addressing the per-population precomputed sequences
    # and the per-(gene, tissue) AD predictors (reference utils/assets.py:27-37)
    Artifact("model/common/cres_all_genes_manifest.parquet",
             "model/common/cres_all_genes_manifest.parquet"),
    Artifact("model/common/reference_genomes/genes_seqs_manifest.parquet",
             "model/common/reference_genomes/genes_seqs_manifest.parquet"),
    Artifact("model/common/reference_genomes/cres_seqs_manifest.parquet",
             "model/common/reference_genomes/cres_seqs_manifest.parquet"),
    Artifact("alzheimer_disease/v4_pcg/manifest.parquet",
             "alzheimer_disease/v4_pcg/manifest.parquet"),
    Artifact("alzheimer_disease/v4_ag/manifest.parquet",
             "alzheimer_disease/v4_ag/manifest.parquet"),
    # example precomputed population sequences (APOE locus)
    Artifact(
        "model/common/reference_genomes/data_split/hg38/cres/data_split/hg38_chr19.pkl.gz",
        "reference_genomes/data_split/hg38/cres/data_split/hg38_chr19.pkl.gz",
    ),
    Artifact(
        "model/common/reference_genomes/data/hg38/genes/data/ENSG00000130203.9_hg38.npz",
        "reference_genomes/data/hg38/genes/data/ENSG00000130203.9_hg38.npz",
    ),
    *_af_tables(),
    *VOCAB_ARTIFACTS,
]

# Bulk per-population mirrors (tens of GB each) — only fetched with
# --prefixes. A trailing "/" marks a prefix: every object under it is
# downloaded (reference download_artifacts.py:289-301 semantics).
PREFIX_ARTIFACTS: list[Artifact] = [
    Artifact("model/common/reference_genomes/data_split/",
             "reference_genomes/data_split/"),
    Artifact("model/common/reference_genomes/data/",
             "reference_genomes/data/"),
    Artifact("alzheimer_disease/v4_pcg/", "alzheimer_disease/v4_pcg/"),
    Artifact("alzheimer_disease/v4_ag/", "alzheimer_disease/v4_ag/"),
]

# Loci exercised by the gold-parity gates (tests/test_gold_parity.py;
# reference tests/test_vep.py:37-42,356-366, tests/test_ad_risk.py):
# every (gene|chrom) x population combination present in the manifests is
# resolved THROUGH the downloaded manifests — no filename-pattern guessing.
GOLD_GENES = ["ENSG00000185989.10", "ENSG00000130203.9"]
GOLD_CHROMS = ["chr13", "chr19"]
GOLD_AD_PREDICTORS = [("ENSG00000130203.9", 7)]


def download_gold_locus_data(dest: str | None = None) -> list[str]:
    """Stage 2: resolve the gold-gate loci through the (already downloaded)
    parquet manifests and fetch every per-population file they address, so
    `scripts/run_gold_parity.py` can run with zero at-test-time network."""
    from variantformer_tpu.utils import assets

    fetched: list[str] = []

    def _fetch_all(lookup, keys_per_population):
        try:
            populations = lookup.get_unique("population")
        except Exception:
            populations = [None]
        for key_head in keys_per_population:
            for pop in populations:
                key = (key_head,) if pop is None else (key_head, pop)
                try:
                    path = lookup.get_file_path(*key)
                except Exception as exc:  # file absent in bucket: record, go on
                    log.warning("gold locus fetch failed %s: %s", key, exc)
                    continue
                if path:
                    fetched.append(path)
                    log.info("ok %s", path)

    _fetch_all(assets.gene_sequences_manifest(), GOLD_GENES)
    _fetch_all(assets.cre_sequences_manifest(), GOLD_CHROMS)
    # gene -> CRE-map CSVs (single-key manifest)
    gm = assets.gene_cre_manifest()
    for gene in GOLD_GENES:
        path = gm.get_file_path(gene)
        if path:
            fetched.append(path)
            log.info("ok %s", path)
    for model_class in ("v4_pcg", "v4_ag"):
        tm = assets.gene_tissue_manifest(model_class)
        for gene, tissue in GOLD_AD_PREDICTORS:
            try:
                path = tm.get_file_path(gene, tissue)
            except Exception as exc:
                log.warning("AD predictor fetch failed (%s,%s): %s",
                            gene, tissue, exc)
                continue
            if path:
                fetched.append(path)
                log.info("ok %s", path)
    return fetched


def validate(include_prefixes: bool = True) -> None:
    """Offline sanity: no two artifacts may share a local path, prefixes and
    only prefixes end with '/'. Raises ValueError on violation."""
    arts = ARTIFACTS + (PREFIX_ARTIFACTS if include_prefixes else [])
    seen: dict[str, str] = {}
    for art in arts:
        if art.local_path in seen:
            raise ValueError(
                f"duplicate local path {art.local_path!r}: "
                f"{seen[art.local_path]!r} and {art.remote_key!r}"
            )
        seen[art.local_path] = art.remote_key
        if art in PREFIX_ARTIFACTS:
            if not (art.remote_key.endswith("/") and art.local_path.endswith("/")):
                raise ValueError(f"prefix artifact must end with '/': {art}")
        elif art.remote_key.endswith("/"):
            raise ValueError(f"non-prefix artifact ends with '/': {art}")


def _expand_prefix(art: Artifact) -> list[Artifact]:
    """List every object under a trailing-'/' prefix as single-file artifacts."""
    import fsspec

    fs = fsspec.filesystem("s3", anon=True)
    out = []
    for key in fs.find(f"{BUCKET}/{art.remote_key}"):
        rel = key.removeprefix(f"{BUCKET}/")
        sub = rel.removeprefix(art.remote_key)
        if not sub or sub.endswith("/"):
            continue
        out.append(Artifact(rel, art.local_path + sub))
    return out


def download(
    only: str | None = None,
    dest: str | None = None,
    prefixes: bool = False,
    gold_locus: bool = True,
) -> list[str]:
    validate()
    fetcher = CachedFetcher(bucket=BUCKET, tmp_dir=dest or artifacts_dir())

    def transport_factory(art: Artifact):
        def transport(rel, dst_tmp):
            import shutil

            if art.is_url:
                import urllib.request

                with urllib.request.urlopen(art.remote_key) as src, open(
                    dst_tmp, "wb"
                ) as out:
                    shutil.copyfileobj(src, out)
                return
            import fsspec

            with fsspec.open(f"s3://{BUCKET}/{art.remote_key}", "rb", anon=True) as src, \
                    open(dst_tmp, "wb") as out:
                shutil.copyfileobj(src, out)
        return transport

    worklist = list(ARTIFACTS)
    if prefixes:
        for art in PREFIX_ARTIFACTS:
            worklist.extend(_expand_prefix(art))

    done = []
    for art in worklist:
        if only and only not in art.remote_key and only not in art.local_path:
            continue
        fetcher._transport = transport_factory(art)
        path = fetcher.get(art.local_path)
        log.info("ok %s", path)
        done.append(path)
    if gold_locus and not only:
        done.extend(download_gold_locus_data(dest))
    return done


def main():
    logging.basicConfig(level=logging.INFO, format="%(message)s")
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--only", help="substring filter on artifact paths")
    ap.add_argument("--dest", help="artifacts directory (default: _artifacts)")
    ap.add_argument("--list", action="store_true", help="list artifacts and exit")
    ap.add_argument("--prefixes", action="store_true",
                    help="also mirror the bulk per-population/AD prefixes (tens of GB)")
    ap.add_argument("--no-gold-locus", action="store_true",
                    help="skip the manifest-resolved gold-locus stage")
    args = ap.parse_args()
    if args.list:
        validate()
        for art in ARTIFACTS + PREFIX_ARTIFACTS:
            print(f"{art.remote_key} -> {art.local_path}")
        return
    download(args.only, args.dest, prefixes=args.prefixes,
             gold_locus=not args.no_gold_locus)


if __name__ == "__main__":
    main()
