"""variantformer_tpu — a TPU-native framework for personalized, tissue-specific
gene-expression prediction from diploid genomes (VariantFormer-class capability).

Built from scratch on JAX / XLA / Pallas / pjit: diploid VCF+FASTA windows are
encoded with IUPAC ambiguity codes, BPE-tokenized on the host, and run through a
hierarchical transformer (CRE window encoder -> interleaved CRE<->gene
cross-attention stack -> per-tissue expression heads) with fused whole-stack
Pallas kernels on the TPU compute path.

Public surface mirrors the reference framework (czi-ai/variantformer):
  - api.VCFProcessor     — vcf2exp expression prediction
  - api.VariantProcessor — VEP / eQTL variant scoring
  - api.ADrisk           — Alzheimer's-disease risk head
See SURVEY.md at the repo root for the component map.
"""

__version__ = "0.1.0"
