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


def download(only: str | None = None, dest: str | None = None) -> list[str]:
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

    done = []
    for art in ARTIFACTS:
        if only and only not in art.remote_key and only not in art.local_path:
            continue
        fetcher._transport = transport_factory(art)
        path = fetcher.get(art.local_path)
        log.info("ok %s", path)
        done.append(path)
    return done


def main():
    logging.basicConfig(level=logging.INFO, format="%(message)s")
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--only", help="substring filter on artifact paths")
    ap.add_argument("--dest", help="artifacts directory (default: _artifacts)")
    ap.add_argument("--list", action="store_true", help="list artifacts and exit")
    args = ap.parse_args()
    if args.list:
        for art in ARTIFACTS:
            print(f"{art.remote_key} -> {art.local_path}")
        return
    download(args.only, args.dest)


if __name__ == "__main__":
    main()
