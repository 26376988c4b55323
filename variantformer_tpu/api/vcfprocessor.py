"""VCFProcessor — the vcf2exp public API.

Mirrors the reference's surface (/root/reference/processors/vcfprocessor.py):
the same query-df schema (gene_id, tissues) and output columns
(predicted_expression, embeddings), with the torch/Lightning/bcftools stack
replaced by the in-process sequence engine and jitted JAX forward.

Data sources are explicit and overridable (DataSources) so the processor runs
against local fixtures as well as the reference's S3 artifact layout.
"""

from __future__ import annotations

import dataclasses
import logging
from collections import deque
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
import yaml

from variantformer_tpu.config import ModelConfig, load_model_config
from variantformer_tpu.data.pipeline import GeneSampleBuilder, pack_samples
from variantformer_tpu.models.seq2gene import Seq2GeneBatch, seq2gene_forward
from variantformer_tpu.utils import assets
from variantformer_tpu.utils.bgzf import write_bgzf_lines
from variantformer_tpu.utils.bpe import BPETokenizer
from variantformer_tpu.utils.fasta import FastaReader
from variantformer_tpu.utils.vcf import VCFReader, VCFStream

log = logging.getLogger(__name__)


@dataclasses.dataclass
class DataSources:
    fasta_path: str = ""
    gencode_path: str = ""
    bpe_vocab_path: str | None = None
    tissue_vocab_path: str | None = None
    checkpoint_path: str = ""
    tokenizer_checkpoint_path: str | None = None
    af_path: str | None = None
    cre_map_provider: object | None = None  # gene_id -> DataFrame

    def resolve_defaults(self):
        if self.bpe_vocab_path is None:
            self.bpe_vocab_path = assets.resolve_vocab_path("bpe_vocabulary_500.json")
        if self.tissue_vocab_path is None:
            self.tissue_vocab_path = assets.resolve_vocab_path("tissue_vocab.yaml")
        return self

    def default_cre_map_provider(self):
        """Per-gene CRE map CSVs via the reference's S3 manifest."""
        manifest = assets.gene_cre_manifest()

        def provider(gene_id: str) -> pd.DataFrame:
            path = manifest.get_file_path(gene_id)
            if path is None:
                raise KeyError(f"No CRE map for gene {gene_id}")
            df = pd.read_csv(path)
            return df[["chromosome", "start_cre", "end_cre", "cre_name"]]

        return provider


class VCFProcessor:
    def __init__(
        self,
        model_class: str = "v4_pcg",
        sources: DataSources | None = None,
        config: ModelConfig | None = None,
        config_path: str | None = None,
        impl: str = "fused2",
    ):
        from variantformer_tpu.utils.jax_setup import enable_cache

        enable_cache()
        self.model_class = model_class
        self.config = config or load_model_config(config_path, model_class)
        self.sources = (sources or DataSources()).resolve_defaults()
        self.impl = impl
        with open(self.sources.tissue_vocab_path) as fh:
            self.tissue_vocab: dict[str, int] = yaml.safe_load(fh)
        self.tokenizer = BPETokenizer.from_file(self.sources.bpe_vocab_path)
        self._gencode: pd.DataFrame | None = None
        self._params = None
        self._fwd_cache: dict = {}

    # -- reference-compatible introspection --------------------------------
    def get_tissues(self):
        return self.tissue_vocab.keys()

    def get_genes(self) -> pd.DataFrame:
        return self._load_gencode()

    def _load_gencode(self) -> pd.DataFrame:
        if self._gencode is None:
            self._gencode = pd.read_csv(self.sources.gencode_path)
        return self._gencode

    # -- VCF authoring ------------------------------------------------------
    def create_vcf_from_variant(
        self, variant_df: pd.DataFrame, output_path: str, vcf_path: str | None = None
    ) -> str:
        """Write (and optionally merge) a bgzip VCF from a variant dataframe.

        Replaces the reference's bgzip/tabix/bcftools subprocess chain
        (vcfprocessor.py:62-214): reference alleles are validated against the
        FASTA; when merging, the donor VCF is STREAMED (O(1) memory — a
        multi-million-record donor file is never materialized) with the new
        records spliced in position order, a new record replacing any donor
        record at the same position; output is BGZF + an in-process .tbi.
        """
        for col in ("chrom", "pos", "ref", "alt", "GT"):
            assert col in variant_df.columns, f"{col} column is required"
        if len(variant_df) == 0:
            raise ValueError("variant_df is empty")
        fasta = FastaReader(self.sources.fasta_path)
        for _, row in variant_df.iterrows():
            pos, ref = int(row["pos"]), str(row["ref"])
            found = fasta.fetch(row["chrom"], pos - 1, pos - 1 + len(ref)).upper()
            if found != ref.upper():
                raise ValueError(
                    f"Reference mismatch at {row['chrom']}:{pos}: "
                    f"expected {ref!r} but found {found!r}"
                )

        # New records: keep-last per (chrom, pos) within variant_df, queued
        # per chromosome in position order (the old all-in-pandas merge is
        # preserved as dedup semantics: a new record REPLACES any existing
        # record at the same position).
        new: dict[tuple[str, int], tuple[str, str, str]] = {}
        for _, row in variant_df.iterrows():
            key = (str(row["chrom"]), int(row["pos"]))
            new[key] = (str(row["ref"]), str(row["alt"]), str(row["GT"]))
        pending: dict[str, deque] = {}
        for (chrom, pos) in sorted(new):
            ref, alt, gt = new[(chrom, pos)]
            pending.setdefault(chrom, deque()).append((pos, ref, alt, gt))

        sample_name = "SAMPLE"
        contigs = sorted(pending)
        if vcf_path is not None:
            # One cheap header pass: sample name + declared contigs, so the
            # header can be emitted before streaming a single record.
            hdr_scan = VCFReader.__new__(VCFReader)
            hdr_scan.path = vcf_path
            existing_contigs = []
            for raw in hdr_scan._lines():
                if raw.startswith(b"##contig=<ID="):
                    existing_contigs.append(
                        raw.decode().split("ID=", 1)[1].split(",", 1)[0].rstrip(">")
                    )
                    continue
                if raw.startswith(b"#CHROM"):
                    names = raw.decode().split("\t")[9:]
                    sample_name = names[0] if names else "SAMPLE"
                    break
                if not raw.startswith(b"#"):
                    break
            contigs = list(dict.fromkeys(existing_contigs + contigs))

        def _fmt(chrom, pos, ref, alt, gt):
            return f"{chrom}\t{pos}\t.\t{ref}\t{alt}\t.\tPASS\t.\tGT\t{gt}"

        def merged_lines():
            yield "##fileformat=VCFv4.2"
            yield f"##reference={self.sources.fasta_path}"
            for chrom in contigs:
                yield f"##contig=<ID={chrom}>"
            yield '##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">'
            yield ("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t"
                   + sample_name)
            seen: set[str] = set()
            cur: str | None = None
            q: deque = deque()
            last_pos = -1
            if vcf_path is not None:
                # Stream the donor VCF (O(1) memory) and splice the new
                # records in position order; the input must be coordinate-
                # sorted with grouped chromosomes (the VCF/tabix contract).
                for chrom, var in VCFStream(vcf_path):
                    if chrom != cur:
                        while q:  # flush the finished chromosome's tail
                            yield _fmt(cur, *q.popleft())
                        if chrom in seen:
                            raise ValueError(
                                f"{vcf_path} is not coordinate-sorted: "
                                f"chromosome {chrom} appears twice")
                        seen.add(chrom)
                        cur, last_pos = chrom, -1
                        q = pending.pop(chrom, deque())
                    if var.pos < last_pos:
                        raise ValueError(
                            f"{vcf_path} is not coordinate-sorted at "
                            f"{chrom}:{var.pos}")
                    last_pos = var.pos
                    while q and q[0][0] < var.pos:
                        yield _fmt(chrom, *q.popleft())
                    if q and q[0][0] == var.pos:
                        yield _fmt(chrom, *q.popleft())  # new record wins
                        continue
                    a0, a1 = var.alleles
                    alts = sorted({a for a in (a0, a1) if a != var.ref})
                    gt0 = 0 if a0 == var.ref else alts.index(a0) + 1
                    gt1 = 0 if a1 == var.ref else alts.index(a1) + 1
                    yield _fmt(chrom, var.pos, var.ref, ",".join(alts),
                               f"{gt0}|{gt1}")
                while q:
                    yield _fmt(cur, *q.popleft())
            for chrom in sorted(pending):  # chroms absent from the donor VCF
                for rec in pending[chrom]:
                    yield _fmt(chrom, *rec)

        final = output_path if output_path.endswith(".vcf.gz") else output_path + ".vcf.gz"
        Path(final).parent.mkdir(parents=True, exist_ok=True)
        write_bgzf_lines(final, merged_lines())
        from variantformer_tpu.utils.tabix import write_tbi

        write_tbi(final)
        log.info("Wrote VCF %s + .tbi (streamed merge)", final)
        return final

    # -- query validation ---------------------------------------------------
    def validate_query(self, query_df: pd.DataFrame) -> pd.DataFrame:
        """Filter query rows to known genes/tissues (VCFDataset._check_filter_query_df)."""
        gencode = self._load_gencode()
        known_genes = set(gencode["gene_id"])
        rows = []
        for _, row in query_df.iterrows():
            gene_id = row["gene_id"]
            if gene_id not in known_genes:
                log.warning("Gene %s not in gencode; skipping", gene_id)
                continue
            ids, names = [], []
            for t in str(row["tissues"]).split(","):
                if t in self.tissue_vocab:
                    ids.append(self.tissue_vocab[t])
                    names.append(t)
                else:
                    log.warning("Tissue %r not in vocab; skipping", t)
            if not ids:
                continue
            rows.append({"gene_id": gene_id, "tissues": ids, "tissue_names": names})
        if not rows:
            raise ValueError("No valid (gene, tissue) rows in query")
        return pd.DataFrame(rows)

    def create_data(self, vcf_path: str | None, query_df: pd.DataFrame):
        """Reference-compatible surface (vcfprocessor.py:224-247): returns
        (dataset, loader) where the dataset is the validated query plus a
        sample builder, and the loader lazily yields (row, GeneSample)."""
        query = self.validate_query(query_df)
        builder = GeneSampleBuilder(
            cfg=self.config.dataset,
            fasta=FastaReader(self.sources.fasta_path),
            tokenizer=self.tokenizer,
            gencode=self._load_gencode(),
            cre_map_provider=(
                self.sources.cre_map_provider
                or self.sources.default_cre_map_provider()
            ),
            vcf=VCFReader(vcf_path) if vcf_path else None,
        )

        def loader():
            for _, row in query.iterrows():
                yield row, builder.build(row["gene_id"])

        return (query, builder), loader()

    # -- model --------------------------------------------------------------
    def load_model(self, param_dtype=None):
        from variantformer_tpu.api.model_manager import ModelManager

        import jax.numpy as jnp

        manager = ModelManager(
            dataclasses.replace(
                self.config, checkpoint_path=self.sources.checkpoint_path
            ),
            tokenizer_checkpoint_path=self.sources.tokenizer_checkpoint_path,
        )
        loaded = manager.load_model(param_dtype or jnp.bfloat16)
        self.config = loaded.config
        self.set_params(loaded.params)
        return loaded.params

    def set_params(self, params, config: ModelConfig | None = None):
        """Inject parameters directly (testing / pre-converted checkpoints).
        Clears any use_mesh state: new params are unsharded, so mixing them
        with mesh-sharded batches would fail — call use_mesh again after."""
        self._reset_mesh()
        self._params = params
        if config is not None:
            self.config = config
        # Pack the gene stack for the fused modulator ONCE at load time —
        # padding/transposing ~1.2 GB of weights must not run per forward.
        self._ensure_packed()

    def cleanup(self):
        """Release model memory: drop the device param arrays and the cached
        jitted executables (reference variantprocessor.py:515-525 parity)."""
        self._reset_mesh()
        self._params = None
        self._fwd_cache.clear()

    def _reset_mesh(self):
        """Undo use_mesh: restore the pre-mesh impl so a reloaded model runs
        the fused kernels again, and stop sharding batches."""
        if getattr(self, "_mesh", None) is not None:
            self._mesh = None
            self._mesh_partition = "donor"
            self._mesh_fused = False
            self.impl = self._impl_before_mesh
            self._fwd_cache.clear()

    def _ensure_packed(self):
        """Pack the gene stack for the fused modulator if absent (idempotent)."""
        if self.impl == "fused2" and "gene_layers_packed" not in self._params:
            from variantformer_tpu.ops.fused_modulator import pack_gene_layers

            mcfg = self.config.seq2gene
            self._params = dict(self._params)
            self._params["gene_layers_packed"] = pack_gene_layers(
                self._params["gene_layers"], mcfg.num_heads,
                mcfg.emb_dim // mcfg.num_heads,
            )

    def use_mesh(self, mesh=None, partition: str = "donor"):
        """Scale every flow (vcf2exp, VEP, sweeps) across a device mesh.
        Call after load_model()/set_params().

        partition="donor" (default): pure donor data parallelism. The fused
        Pallas kernels SURVIVE this mesh: weights replicate, donor batches
        split over all devices jointly via shard_map, and each chip runs the
        intact fused forward on its shard with zero collectives — the meshed
        per-chip rate is the single-chip fused rate. Batches whose donor
        count does not divide the device count are suffix-padded in _forward
        and the pad rows sliced off.

        partition="tissue": single-donor scale-out — use when batches are
        donor-thin (one donor, genome-wide sweep) but the tissue list is
        wide. With a fused impl the Pallas kernels SURVIVE this mesh too
        (parallel/mesh.tissue_dp_forward): window axes shard across chips
        for the encoder, embeddings all-gather (~3.6 MB), and each chip runs
        the intact fused modulator on its tissue shard. An explicitly
        impl="xla" processor instead runs layered XLA with head/FFN tensor
        parallelism over the "model" axis (parallel/mesh.py)."""
        from variantformer_tpu.parallel.mesh import (
            make_mesh,
            replicate_params,
            shard_params,
        )

        assert self._params is not None, "call load_model()/set_params() first"
        assert partition in ("donor", "tissue")
        mesh = mesh or make_mesh()
        self._mesh_partition = partition
        if getattr(self, "_mesh", None) is None:
            # Only record the pre-mesh impl on the first call — re-meshing an
            # already-meshed processor must not overwrite it with "xla", or
            # _reset_mesh could never restore the fused kernels.
            self._impl_before_mesh = self.impl
        else:
            # Re-meshing (e.g. tissue -> donor): decide from the ORIGINAL
            # impl, not whatever the previous partition downgraded it to.
            self.impl = self._impl_before_mesh
        wcfg = self.config.window_encoder
        tissue_fusable = (
            partition == "donor"
            or (not wcfg.use_context and wcfg.seq_pool == "mean")
        )  # the tissue-DP body needs the dual fused-encoder path
        self._mesh_fused = (
            self.impl in ("fused", "fused2") and tissue_fusable
        )
        if self._mesh_fused:
            self._ensure_packed()  # repack if a prior tissue-mesh popped it
            self._params = replicate_params(self._params, mesh)
        else:
            if self.impl != "xla":
                log.info(
                    "use_mesh: impl %r -> 'xla' (GSPMD cannot partition the "
                    "fused kernels under partition=%r)", self.impl, partition,
                )
                self.impl = "xla"
                self._params = dict(self._params)
                self._params.pop("gene_layers_packed", None)
            self._params = shard_params(self._params, mesh)
        self._mesh = mesh
        self._fwd_cache.clear()

    def _forward(
        self, batch, return_streams: bool = False,
        narrow_embeddings: bool = False,
    ):
        """``narrow_embeddings``: emit the three embedding outputs as bf16
        (pred_expression stays f32). LOSSLESS when the compute dtype is
        bf16 — the f32 embedding outputs are upcasts of bf16 stream values —
        and a no-op otherwise; halves the VEP path's dominant per-dispatch
        output transfer on relay-fronted rigs."""
        mesh = getattr(self, "_mesh", None)
        mesh_fused = getattr(self, "_mesh_fused", False)
        if return_streams and mesh is not None:
            raise ValueError(
                "return_streams is a single-device path (VEP ref-once cache)"
            )
        import jax.numpy as _jnp

        narrow_embeddings = narrow_embeddings and (
            _jnp.dtype(self.config.precision.compute_dtype) == _jnp.bfloat16
        )
        d = batch.cre_tokens.shape[0]
        t = batch.tissue_ids.shape[0]
        if mesh is not None:
            from variantformer_tpu.parallel.mesh import (
                pad_tissue_axis,
                shard_batch,
                shard_batch_donor_all,
                shard_batch_tissue_all,
            )

            partition = getattr(self, "_mesh_partition", "donor")
            # Fused donor-DP splits donors over ALL devices jointly
            # (shard_map); the GSPMD path splits over the "data" axis only.
            data = mesh.devices.size if mesh_fused else mesh.shape["data"]
            if partition == "donor" and d % data:
                pad = data - d % data
                batch = Seq2GeneBatch(
                    **{
                        name: (
                            leaf if leaf is None or leaf.ndim == 0
                            or name == "tissue_ids"
                            else jnp.concatenate(
                                [leaf] + [leaf[-1:]] * pad, axis=0
                            )
                        )
                        for name in batch._fields
                        for leaf in [getattr(batch, name)]
                    }
                )
            elif partition == "tissue":
                # fused tissue-DP shards windows+tissues over ALL devices
                batch, _ = pad_tissue_axis(
                    batch, mesh, multiple=data if mesh_fused else None
                )
            if mesh_fused:
                batch = (
                    shard_batch_donor_all(batch, mesh)
                    if partition == "donor"
                    else shard_batch_tissue_all(batch, mesh)
                )
            else:
                batch = shard_batch(batch, mesh, partition)
        key = (
            batch.cre_tokens.shape,
            batch.gene_tokens.shape,
            batch.tissue_ids.shape,
            return_streams,
            narrow_embeddings,
        )
        if key not in self._fwd_cache:
            cfg = self.config
            impl = self.impl
            if mesh is not None and mesh_fused:
                from variantformer_tpu.parallel.mesh import (
                    donor_dp_forward,
                    tissue_dp_forward,
                )

                fwd = (
                    donor_dp_forward
                    if getattr(self, "_mesh_partition", "donor") == "donor"
                    else tissue_dp_forward
                )
                self._fwd_cache[key] = fwd(cfg, mesh, batch, impl=impl)
            else:

                def fwd(p, b, rs=return_streams, ne=narrow_embeddings):
                    out = seq2gene_forward(
                        p, b, cfg, impl=impl, return_streams=rs
                    )
                    if ne:
                        out = out._replace(
                            pooled_embedding=out.pooled_embedding.astype(
                                jnp.bfloat16
                            ),
                            gene_token_embedding=(
                                out.gene_token_embedding.astype(jnp.bfloat16)
                            ),
                            cre_token_embedding=(
                                out.cre_token_embedding.astype(jnp.bfloat16)
                            ),
                        )
                    return out

                self._fwd_cache[key] = jax.jit(fwd)
        out = self._fwd_cache[key](self._params, batch)
        if batch.cre_tokens.shape[0] != d:  # slice off donor padding
            out = type(out)(*(None if leaf is None else leaf[:d] for leaf in out))
        if batch.tissue_ids.shape[0] != t:  # slice off tissue padding
            out = type(out)(
                *(None if leaf is None else leaf[:, :t] for leaf in out)
            )
        return out

    # -- prediction ---------------------------------------------------------
    def predict(
        self,
        vcf_path: str | None,
        query_df: pd.DataFrame,
        batch_size: int = 4,
    ) -> pd.DataFrame:
        """vcf2exp: per query row, predicted expression + pooled embedding per
        tissue. Output schema matches the reference (predicted_expression,
        embeddings list-valued columns appended to the validated query df)."""
        assert self._params is not None, "call load_model()/set_params() first"
        query = self.validate_query(query_df)
        builder = GeneSampleBuilder(
            cfg=self.config.dataset,
            fasta=FastaReader(self.sources.fasta_path),
            tokenizer=self.tokenizer,
            gencode=self._load_gencode(),
            cre_map_provider=(
                self.sources.cre_map_provider
                or self.sources.default_cre_map_provider()
            ),
            vcf=VCFReader(vcf_path) if vcf_path else None,
        )

        pred_col: list = [None] * len(query)
        emb_col: list = [None] * len(query)
        # Group rows by tissue tuple so each batch shares one tissue axis.
        by_tissues: dict[tuple, list[int]] = {}
        for i, row in query.iterrows():
            by_tissues.setdefault(tuple(row["tissues"]), []).append(i)
        for tissues, row_ids in by_tissues.items():
            for start in range(0, len(row_ids), batch_size):
                ids = row_ids[start : start + batch_size]
                samples = [
                    builder.build(query.iloc[i]["gene_id"]) for i in ids
                ]
                batch = pack_samples(samples, list(tissues))
                out = self._forward(batch)
                preds = np.asarray(out.pred_expression)       # [D, T]
                embs = np.asarray(out.pooled_embedding)       # [D, T, E]
                for j, i in enumerate(ids):
                    pred_col[i] = preds[j]
                    emb_col[i] = embs[j]
        query = query.copy()
        query["predicted_expression"] = pred_col
        query["embeddings"] = emb_col
        return query
