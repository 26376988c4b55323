#!/usr/bin/env python
"""Differential test of the consensus engine vs real bcftools.

This rig has neither bcftools nor network; run this on any machine with
``samtools``/``bcftools``/``bgzip``/``tabix`` on PATH to confirm the
hand-encoded `-H I` fixture semantics (tests/test_consensus_fixtures.py) —
in particular the ASSUMED het-indel behavior — against the real tools:

    python scripts/bcftools_differential.py [--fasta ref.fa --vcf s.vcf.gz \
        --sample HG00096 --regions chr1:10000-12000,...]

With no arguments it synthesizes a small genome + VCF covering every
behavior class (het/hom SNPs, het/hom indels, multi-allelic, overlapping,
boundary-crossing records) and compares region by region, mirroring the
reference pipeline's exact command (utils/data_process.py:27-67):

    samtools faidx REF REGION | bcftools consensus -H I -s SAMPLE \
        -e 'ALT~"<.*>"' calls.vcf.gz
"""

from __future__ import annotations

import argparse
import os
import shutil
import subprocess
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def require(tool: str):
    if shutil.which(tool) is None:
        sys.exit(f"{tool} not found on PATH — run on a bcftools-equipped machine")


def synth_env(tmp: Path):
    import numpy as np

    rng = np.random.default_rng(0)
    seq = "".join(rng.choice(list("ACGT"), 5000))
    fasta = tmp / "ref.fa"
    fasta.write_text(">chr1\n" + "\n".join(seq[i:i + 60] for i in range(0, len(seq), 60)) + "\n")
    subprocess.run(["samtools", "faidx", str(fasta)], check=True)

    def rec(pos, ref, alt, gt):
        return f"chr1\t{pos}\t.\t{ref}\t{alt}\t.\tPASS\t.\tGT\t{gt}"

    body = []
    # one case per behavior class, spread out so regions isolate them
    body.append(rec(101, seq[100], "G" if seq[100] != "G" else "A", "0|1"))      # het SNP
    body.append(rec(201, seq[200], "T" if seq[200] != "T" else "C", "1|1"))      # hom SNP
    body.append(rec(301, seq[300], f"{'C' if seq[300] != 'C' else 'A'},{'G' if seq[300] not in 'CG' else 'T'}", "1|2"))  # multiallelic het
    body.append(rec(401, seq[400], seq[400] + "TTA", "1|1"))                     # hom insertion
    body.append(rec(501, seq[500:504], seq[500], "1|1"))                         # hom deletion
    body.append(rec(601, seq[600], seq[600] + "CC", "0|1"))                      # het insertion (ASSUMED class)
    body.append(rec(701, seq[700:704], seq[700], "0|1"))                         # het deletion (ASSUMED class)
    body.append(rec(801, seq[800:806], seq[800], "1|1"))                         # deletion...
    body.append(rec(803, seq[802], "A" if seq[802] != "A" else "T", "1|1"))      # ...overlapped SNP
    body.append(rec(901, seq[900], "0/0 placeholder", "0|0").replace("0/0 placeholder", "A" if seq[900] != "A" else "C"))  # hom-ref
    vcf = tmp / "calls.vcf"
    vcf.write_text(
        "##fileformat=VCFv4.2\n"
        '##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">\n'
        "##contig=<ID=chr1,length=5000>\n"
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1\n"
        + "\n".join(body) + "\n"
    )
    subprocess.run(["bgzip", "-f", str(vcf)], check=True)
    subprocess.run(["tabix", "-p", "vcf", str(vcf) + ".gz"], check=True)
    regions = [f"chr1:{a}-{b}" for a, b in
               [(50, 150), (150, 250), (250, 350), (350, 450), (450, 550),
                (550, 650), (650, 750), (750, 850), (850, 950), (1, 1000)]]
    return str(fasta), str(vcf) + ".gz", "S1", regions


def bcftools_consensus(fasta, vcf, sample, region) -> str:
    faidx = subprocess.run(["samtools", "faidx", fasta, region],
                           capture_output=True, check=True)
    cons = subprocess.run(
        ["bcftools", "consensus", "-H", "I", "-s", sample,
         "-e", 'ALT~"<.*>"', vcf],
        input=faidx.stdout, capture_output=True, check=True,
    )
    return "".join(cons.stdout.decode().splitlines()[1:])


def ours(fasta, vcf, sample, region) -> str:
    from variantformer_tpu.utils.fasta import FastaReader
    from variantformer_tpu.utils.vcf import ConsensusEngine, VCFReader

    chrom, span = region.split(":")
    a, b = span.split("-")
    eng = ConsensusEngine(FastaReader(fasta), VCFReader(vcf, sample=sample))
    out, _ = eng.consensus(chrom, int(a) - 1, int(b))  # 1-based incl -> 0-based
    return out


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--fasta")
    ap.add_argument("--vcf")
    ap.add_argument("--sample", default=None)
    ap.add_argument("--regions", default=None, help="comma-separated chr:a-b")
    args = ap.parse_args()
    for tool in ("samtools", "bcftools", "bgzip", "tabix"):
        require(tool)

    if args.fasta and args.vcf:
        fasta, vcf, sample = args.fasta, args.vcf, args.sample
        regions = args.regions.split(",")
        tmp = None
    else:
        tmp = tempfile.mkdtemp()
        fasta, vcf, sample, regions = synth_env(Path(tmp))

    mismatches = 0
    for region in regions:
        theirs = bcftools_consensus(fasta, vcf, sample, region)
        mine = ours(fasta, vcf, sample, region)
        status = "OK " if theirs.upper() == mine.upper() else "DIFF"
        if status == "DIFF":
            mismatches += 1
            for i, (x, y) in enumerate(zip(theirs.upper(), mine.upper())):
                if x != y:
                    print(f"  first diff at offset {i}: bcftools={x} ours={y}")
                    break
            if len(theirs) != len(mine):
                print(f"  length: bcftools={len(theirs)} ours={len(mine)}")
        print(f"{status} {region}")
    if tmp:
        shutil.rmtree(tmp, ignore_errors=True)
    sys.exit(1 if mismatches else 0)


if __name__ == "__main__":
    main()
