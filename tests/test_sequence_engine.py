"""Sequence-engine tests: BGZF round trip, FASTA indexing, VCF parsing, and
diploid IUPAC consensus semantics (the ``bcftools consensus -H I`` contract)."""

import gzip

import numpy as np
import pytest

from variantformer_tpu.utils.bgzf import BGZFReader, is_bgzf, write_bgzf
from variantformer_tpu.utils.fasta import FastaReader
from variantformer_tpu.utils.sequence import het_iupac_code, reverse_complement
from variantformer_tpu.utils.vcf import ConsensusEngine, VCFReader


# ---------------------------------------------------------------- fixtures
def _write_fasta(path, contigs, width=10):
    with open(path, "w") as fh:
        for name, seq in contigs.items():
            fh.write(f">{name} test\n")
            for i in range(0, len(seq), width):
                fh.write(seq[i : i + width] + "\n")


def _write_vcf(path, records, sample="S1", bgzf=False):
    lines = [
        "##fileformat=VCFv4.2",
        f"#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t{sample}",
    ]
    for chrom, pos, ref, alt, gt in records:
        lines.append(f"{chrom}\t{pos}\t.\t{ref}\t{alt}\t.\tPASS\t.\tGT\t{gt}")
    data = ("\n".join(lines) + "\n").encode()
    if bgzf:
        write_bgzf(str(path), data)
    else:
        path.write_bytes(data)


CHR1 = "ACGTACGTACGTACGTACGTAAAACCCCGGGGTTTTACGTACGT"


# ---------------------------------------------------------------- BGZF
def test_bgzf_round_trip(tmp_path):
    data = bytes(np.random.default_rng(0).integers(65, 90, 300_000, dtype=np.uint8))
    path = tmp_path / "x.gz"
    write_bgzf(str(path), data)
    assert is_bgzf(str(path))
    # standard gzip can decompress BGZF
    assert gzip.decompress(path.read_bytes()) == data
    reader = BGZFReader(path)
    assert reader.read_at(0, 100) == data[:100]
    assert reader.read_at(70_000, 200) == data[70_000:70_200]
    assert reader.read_at(299_990, 100) == data[299_990:]
    reader.save_index()
    reader2 = BGZFReader(path)  # now loads the .gzi
    assert reader2.read_at(123_456, 77) == data[123_456:123_533]


# ---------------------------------------------------------------- FASTA
def test_fasta_fetch_plain(tmp_path):
    fa = tmp_path / "g.fa"
    _write_fasta(fa, {"chr1": CHR1, "chr2": "GGGGAAAATTTT"})
    r = FastaReader(fa)
    assert r.fetch("chr1", 0, 4) == "ACGT"
    assert r.fetch("chr1", 9, 23) == CHR1[9:23]
    assert r.fetch("chr2", 4, 8) == "AAAA"
    assert r.contig_length("chr1") == len(CHR1)
    # bounds clamping
    assert r.fetch("chr1", -5, 4) == "ACGT"
    assert r.fetch("chr1", 40, 999) == CHR1[40:]


def test_fasta_fetch_bgzf(tmp_path):
    raw_lines = []
    for name, seq in {"chr1": CHR1}.items():
        raw_lines.append(f">{name}")
        for i in range(0, len(seq), 7):
            raw_lines.append(seq[i : i + 7])
    raw = ("\n".join(raw_lines) + "\n").encode()
    fa = tmp_path / "g.fa.gz"
    write_bgzf(str(fa), raw)
    r = FastaReader(fa)
    assert r.fetch("chr1", 3, 17) == CHR1[3:17]
    assert r.fetch("chr1", 0, len(CHR1)) == CHR1


# ---------------------------------------------------------------- VCF
def test_vcf_parse_and_query(tmp_path):
    vcf = tmp_path / "s.vcf"
    _write_vcf(
        vcf,
        [
            ("chr1", 3, "G", "C", "0|1"),
            ("chr1", 10, "G", "A", "1|1"),
            ("chr1", 21, "A", "AT", "0/1"),
            ("chr1", 25, "C", "<DEL>", "0/1"),  # symbolic -> dropped
            ("chr2", 5, "A", "T", "0/0"),       # hom ref -> dropped
        ],
    )
    r = VCFReader(str(vcf))
    assert r.sample_names == ["S1"]
    vars_all = r.query("chr1", 0, 50)
    assert [v.pos for v in vars_all] == [3, 10, 21]
    assert r.query("chr1", 3, 10)[0].pos == 10 or len(r.query("chr1", 3, 10)) == 1
    assert r.query("chr2", 0, 50) == []


def test_vcf_bgzf(tmp_path):
    vcf = tmp_path / "s.vcf.gz"
    _write_vcf(vcf, [("chr1", 3, "G", "C", "0|1")], bgzf=True)
    r = VCFReader(str(vcf))
    assert len(r.query("chr1", 0, 10)) == 1


# ---------------------------------------------------------------- consensus
def test_consensus_het_snp_iupac(tmp_path):
    fa = tmp_path / "g.fa"
    _write_fasta(fa, {"chr1": CHR1})
    vcf = tmp_path / "s.vcf"
    _write_vcf(vcf, [("chr1", 3, "G", "C", "0|1"), ("chr1", 11, "G", "A", "1|1")])
    engine = ConsensusEngine(FastaReader(fa), VCFReader(str(vcf)))
    seq, n = engine.consensus("chr1", 0, 12)
    # pos 3 (1-based) = index 2: G/C het -> S; pos 11 = index 10: G->A hom
    expected = list(CHR1[:12])
    expected[2] = het_iupac_code("G", "C")
    expected[10] = "A"
    assert seq == "".join(expected)
    assert n == 2


def test_consensus_region_excludes_outside_variants(tmp_path):
    fa = tmp_path / "g.fa"
    _write_fasta(fa, {"chr1": CHR1})
    vcf = tmp_path / "s.vcf"
    _write_vcf(vcf, [("chr1", 3, "G", "C", "1|1"), ("chr1", 30, "G", "T", "1|1")])
    engine = ConsensusEngine(FastaReader(fa), VCFReader(str(vcf)))
    seq, n = engine.consensus("chr1", 10, 20)
    assert seq == CHR1[10:20]
    assert n == 0


def test_consensus_indels_shift_downstream(tmp_path):
    fa = tmp_path / "g.fa"
    _write_fasta(fa, {"chr1": CHR1})
    vcf = tmp_path / "s.vcf"
    _write_vcf(
        vcf,
        [
            ("chr1", 2, "CG", "C", "1|1"),   # deletion of index-2 base
            ("chr1", 9, "A", "ATT", "1|1"),  # insertion after index 8
        ],
    )
    engine = ConsensusEngine(FastaReader(fa), VCFReader(str(vcf)))
    seq, n = engine.consensus("chr1", 0, 12)
    # ACGTACGTACGT -> del idx2 G, insert TT after idx8 A
    assert seq == "ACTACGTATTCGT"
    assert n == 2


def test_consensus_snps_only_filter(tmp_path):
    fa = tmp_path / "g.fa"
    _write_fasta(fa, {"chr1": CHR1})
    vcf = tmp_path / "s.vcf"
    _write_vcf(
        vcf,
        [("chr1", 2, "CG", "C", "1|1"), ("chr1", 6, "C", "T", "1|1")],
    )
    engine = ConsensusEngine(FastaReader(fa), VCFReader(str(vcf)))
    seq, n = engine.consensus("chr1", 0, 8, snps_only=True)
    expected = list(CHR1[:8])
    expected[5] = "T"
    assert seq == "".join(expected)
    assert n == 1


def test_consensus_ref_mismatch_skipped(tmp_path):
    fa = tmp_path / "g.fa"
    _write_fasta(fa, {"chr1": CHR1})
    vcf = tmp_path / "s.vcf"
    _write_vcf(vcf, [("chr1", 3, "T", "C", "1|1")])  # ref is actually G
    engine = ConsensusEngine(FastaReader(fa), VCFReader(str(vcf)))
    seq, n = engine.consensus("chr1", 0, 8)
    assert seq == CHR1[:8]
    assert n == 0


def test_reverse_complement_iupac():
    assert reverse_complement("ACGT") == "ACGT"
    assert reverse_complement("RYSWKM") == "KMWSRY"
    assert reverse_complement("acgtN-") == "-Nacgt"


def test_native_consensus_matches_python(tmp_path):
    """Property test: the C++ consensus agrees with the Python engine on
    random variant sets (SNPs + indels, het/hom, both filters)."""
    from variantformer_tpu.utils.native import get_seq_library

    if get_seq_library() is None:
        pytest.skip("native sequence library not built")
    rng = np.random.default_rng(7)
    n = 4000
    genome = "".join(rng.choice(list("ACGT"), n))
    fa = tmp_path / "g.fa"
    _write_fasta(fa, {"chr1": genome}, width=73)

    records = []
    pos = 10
    while pos < n - 10:
        kind = rng.choice(["snp", "ins", "del", "homref"])
        ref = genome[pos - 1]
        if kind == "snp":
            alt = rng.choice([b for b in "ACGT" if b != ref])
            gt = rng.choice(["0|1", "1|1", "1|0"])
        elif kind == "ins":
            alt = ref + "".join(rng.choice(list("ACGT"), rng.integers(1, 4)))
            gt = rng.choice(["0/1", "1/1"])
        elif kind == "del":
            ref = genome[pos - 1 : pos - 1 + int(rng.integers(2, 5))]
            alt = ref[0]
            gt = rng.choice(["0|1", "1|1"])
        else:
            alt = rng.choice([b for b in "ACGT" if b != ref])
            gt = "0|0"
        records.append(("chr1", pos, ref, alt, gt))
        pos += int(rng.integers(5, 40))
    vcf = tmp_path / "s.vcf"
    _write_vcf(vcf, records)

    fasta = FastaReader(fa)
    reader = VCFReader(str(vcf))
    native_engine = ConsensusEngine(fasta, reader, use_native=True)
    py_engine = ConsensusEngine(fasta, reader, use_native=False)
    for _ in range(30):
        a = int(rng.integers(0, n - 100))
        b = a + int(rng.integers(20, 600))
        for snps_only in (False, True):
            sn, cn = native_engine.consensus("chr1", a, b, snps_only)
            sp, cp = py_engine.consensus("chr1", a, b, snps_only)
            assert sn == sp, f"region {a}:{b} snps_only={snps_only}"
            assert cn == cp


def test_tabix_round_trip(tmp_path):
    """write_tbi + indexed VCFReader queries match full-scan queries over
    random regions on a multi-chromosome VCF."""
    from variantformer_tpu.utils.tabix import TabixIndex, write_tbi

    rng = np.random.default_rng(11)
    records = []
    for chrom in ("chr1", "chr2"):
        pos = 100
        while pos < 200_000:
            ref = "ACGT"[rng.integers(4)]
            alt = "ACGT"[rng.integers(4)]
            if ref != alt:
                records.append((chrom, pos, ref, alt,
                                ["0|1", "1|1", "0|0"][rng.integers(3)]))
            pos += int(rng.integers(50, 2000))
    vcf = tmp_path / "big.vcf.gz"
    _write_vcf(vcf, records, bgzf=True)
    tbi = write_tbi(str(vcf))
    assert tbi.endswith(".tbi")
    idx = TabixIndex(tbi)
    assert set(idx.names) == {"chr1", "chr2"}

    indexed = VCFReader(str(vcf))
    full = VCFReader(str(vcf), use_index=False)
    assert indexed._index is not None, "index must be active"
    assert full._index is None
    for _ in range(40):
        chrom = ["chr1", "chr2"][rng.integers(2)]
        a = int(rng.integers(0, 200_000))
        b = a + int(rng.integers(1, 30_000))
        vi = indexed.query(chrom, a, b)
        vf = full.query(chrom, a, b)
        assert [(v.pos, v.ref, v.alleles) for v in vi] == \
               [(v.pos, v.ref, v.alleles) for v in vf], f"{chrom}:{a}-{b}"
    assert indexed.query("chrX", 0, 1000) == []


# ------------------------------------------------------- thread safety
def test_concurrent_reads_match_serial(tmp_path):
    """One shared reader must serve many threads without torn reads.

    Regression: genome-wide sweeps share one FastaReader/BGZFReader across
    builder workers; a shared-file-position seek+read raced and silently
    returned wrong bytes (observed as spurious 'gene window shorter than
    1000bp' skips in the sustained probe)."""
    from concurrent.futures import ThreadPoolExecutor

    rng = np.random.default_rng(7)
    seq = "".join(rng.choice(list("ACGT"), 400_000))
    fa_plain = tmp_path / "g.fa"
    _write_fasta(fa_plain, {"chr1": seq}, width=70)
    fa_gz = tmp_path / "g.fa.gz"
    raw = (">chr1 t\n" + "\n".join(
        seq[i : i + 70] for i in range(0, len(seq), 70)
    ) + "\n").encode()
    write_bgzf(str(fa_gz), raw)

    regions = [
        (int(s), int(s) + int(l))
        for s, l in zip(
            rng.integers(0, 390_000, 200), rng.integers(1, 9_000, 200)
        )
    ]
    for reader in (FastaReader(fa_plain), FastaReader(fa_gz)):
        expected = [seq[s:e] for s, e in regions]
        with ThreadPoolExecutor(max_workers=8) as pool:
            got = list(pool.map(lambda r: reader.fetch("chr1", *r), regions))
        assert got == expected
        reader.close()


def test_warm_page_cache(tmp_path):
    """Readahead is best-effort: missing paths and None are ignored, real
    files are fully read, and the background thread joins cleanly."""
    from variantformer_tpu.utils.readahead import warm_page_cache

    p = tmp_path / "blob.bin"
    p.write_bytes(b"x" * (1 << 20))
    t = warm_page_cache([str(p), None, str(tmp_path / "missing")], background=True)
    assert t is not None
    t.join(timeout=30)
    assert not t.is_alive()
    # foreground mode returns None and doesn't raise
    assert warm_page_cache([str(p)], background=False) is None
