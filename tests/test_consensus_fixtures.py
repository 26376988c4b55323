"""Golden fixtures for every `bcftools consensus -H I` behavior class.

bcftools is not installable on this rig (no network), so these fixtures
hand-encode the semantics of the reference's consensus command
(/root/reference/utils/data_process.py:27-67: ``samtools faidx region |
bcftools consensus -H I -s SAMPLE [-e filter]``) from the bcftools
documentation and well-known behavior. Verification status per class:

DOC-VERIFIED (bcftools man page / the reference's own command line):
  * het SNP -> IUPAC ambiguity code ("-H I: IUPAC codes, e.g. R for A/G")
  * hom-alt -> ALT allele; hom-ref (0/0) and missing (./.) -> unchanged
    (default: "the reference allele is used at missing genotypes")
  * overlapping records: a record overlapping a previously applied variant
    is skipped with a warning (bcftools "The site ... overlaps with another
    variant, skipping")
  * records whose REF runs past the region end are skipped
  * symbolic ALTs excluded — the reference passes ``-e 'ALT~"<.*>"'``
  * snps_only: the reference's VEP path passes ``-e 'TYPE!="snp"'``
    (vepdataset.py:278-345), dropping all non-SNP records
  * multi-allelic het (GT 1/2) -> IUPAC of the two ALT alleles

ASSUMED (documented here, not verifiable without bcftools):
  * het indel under -H I: we apply the non-reference allele. Run
    scripts/bcftools_differential.py on a bcftools-equipped machine to
    confirm; if bcftools instead keeps REF, only VEP het-indel cases differ.

DELIBERATE DEVIATION (default) + COMPAT SWITCH:
  * REF-mismatch records: bcftools aborts the whole region (the reference
    then falls back to the raw reference slice, data_process.py:74-84); we
    skip just the bad record and still apply the rest — strictly more
    information, never less. ConsensusEngine(ref_mismatch="region_fallback")
    (or VFX_CONSENSUS_REF_MISMATCH=region_fallback) reproduces the
    reference's whole-region fallback exactly — gold-parity runs force it
    (tests/test_gold_parity.py, scripts/run_gold_parity.py).

Each case runs against BOTH the Python engine and the C++ one
(native/consensus.cpp) when built.
"""

import numpy as np
import pytest

from variantformer_tpu.utils.vcf import ConsensusEngine, VcfVariant


class _FakeFasta:
    def __init__(self, seq: str, offset: int = 0):
        self.seq = seq
        self.offset = offset

    def fetch(self, chrom, start, end):
        return self.seq[start - self.offset : end - self.offset]


class _FakeVcf:
    def __init__(self, variants):
        self.variants = variants

    def query(self, chrom, start, end):
        return [v for v in self.variants if start < v.pos <= end]


def _consensus(seq, variants, start=0, snps_only=False, use_native=None):
    eng = ConsensusEngine(_FakeFasta(seq, start), _FakeVcf(variants),
                          use_native=use_native)
    out, applied = eng.consensus("chr1", start, start + len(seq),
                                 snps_only=snps_only)
    return out, applied


def _both_engines(seq, variants, expect, applied_expect, snps_only=False):
    out_py, n_py = _consensus(seq, variants, snps_only=snps_only,
                              use_native=False)
    assert out_py == expect, f"python: {out_py!r} != {expect!r}"
    assert n_py == applied_expect
    try:
        from variantformer_tpu.utils.native import native_consensus  # noqa: F401
    except Exception:
        return
    out_c, n_c = _consensus(seq, variants, snps_only=snps_only, use_native=True)
    assert out_c == expect, f"c++: {out_c!r} != {expect!r}"
    assert n_c == applied_expect


V = VcfVariant


@pytest.mark.parametrize(
    "ref,alt,code",
    [("A", "G", "R"), ("C", "T", "Y"), ("C", "G", "S"),
     ("A", "T", "W"), ("G", "T", "K"), ("A", "C", "M")],
)
def test_het_snp_every_iupac_code(ref, alt, code):
    seq = f"GG{ref}GG"
    _both_engines(seq, [V(pos=3, ref=ref, alleles=(ref, alt))],
                  f"GG{code}GG", 1)


def test_hom_alt_snp():
    _both_engines("AAAAA", [V(pos=3, ref="A", alleles=("T", "T"))], "AATAA", 1)


def test_hom_ref_and_missing_unchanged():
    # 0/0 and ./. records never reach the engine (VCFReader drops them), and
    # an explicit ref-call variant contributes nothing.
    _both_engines("ACGTA", [V(pos=2, ref="C", alleles=("C", "C"))], "ACGTA", 0)


def test_multiallelic_het_alt_alt_iupac_of_alts():
    # A>C,G with GT 1/2: IUPAC(C,G)=S — NOT IUPAC(REF, first alt).
    _both_engines("TTATT", [V(pos=3, ref="A", alleles=("C", "G"))], "TTSTT", 1)


def test_hom_insertion_shifts_downstream():
    #      123456
    # ref  ACGTAC ; insertion CA->CTTA at pos 2, then SNP at pos 5 (A->G hom)
    _both_engines(
        "ACGTAC",
        [V(pos=2, ref="C", alleles=("CTT", "CTT")),
         V(pos=5, ref="A", alleles=("G", "G"))],
        "ACTTGTGC", 2,
    )


def test_hom_deletion():
    _both_engines("ACGTAC", [V(pos=2, ref="CGT", alleles=("C", "C"))], "ACAC", 1)


def test_het_indel_applies_nonref_allele__ASSUMED():
    # ASSUMED -H I semantics (see module docstring): het indel applies the
    # non-reference allele.
    _both_engines("ACGTAC", [V(pos=2, ref="C", alleles=("C", "CTT"))],
                  "ACTTGTAC", 1)
    _both_engines("ACGTAC", [V(pos=2, ref="CGT", alleles=("CGT", "C"))],
                  "ACAC", 1)


def test_overlapping_record_skipped():
    # Deletion spans pos 2-4; the SNP at pos 3 overlaps the applied edit and
    # must be skipped (bcftools "overlaps with another variant, skipping").
    _both_engines(
        "ACGTAC",
        [V(pos=2, ref="CGT", alleles=("C", "C")),
         V(pos=3, ref="G", alleles=("T", "T"))],
        "ACAC", 1,
    )


def test_record_past_region_end_skipped():
    # REF runs past the slice: bcftools skips it ("beyond the end").
    _both_engines("ACGTA", [V(pos=4, ref="TAC", alleles=("T", "T"))],
                  "ACGTA", 0)


def test_snps_only_drops_indels_keeps_snps():
    # The VEP-from-VCF path filters -e 'TYPE!="snp"'.
    _both_engines(
        "ACGTAC",
        [V(pos=2, ref="C", alleles=("C", "CTT")),
         V(pos=5, ref="A", alleles=("A", "G"))],
        "ACGTRC", 1, snps_only=True,
    )


def test_ref_mismatch_record_skipped_deviation():
    # DELIBERATE DEVIATION: the bad record is skipped, the good one applies.
    _both_engines(
        "ACGTAC",
        [V(pos=2, ref="T", alleles=("G", "G")),     # REF disagrees with FASTA
         V(pos=5, ref="A", alleles=("G", "G"))],
        "ACGTGC", 1,
    )


def test_ref_mismatch_region_fallback_compat_mode(monkeypatch):
    """ref_mismatch="region_fallback" reproduces the reference pipeline: any
    REF-mismatch record voids the ENTIRE region (raw reference slice, 0
    applied) — even variants before/after the bad record."""
    seq = "ACGTAC"
    variants = [
        V(pos=2, ref="C", alleles=("G", "G")),  # good (would apply)
        V(pos=4, ref="G", alleles=("A", "A")),  # REF disagrees with FASTA (T)
        V(pos=5, ref="A", alleles=("G", "G")),  # good (would apply)
    ]
    for use_native in (False, True):
        if use_native:
            try:
                from variantformer_tpu.utils.native import native_consensus  # noqa: F401
            except Exception:
                break
        eng = ConsensusEngine(
            _FakeFasta(seq), _FakeVcf(variants), use_native=use_native,
            ref_mismatch="region_fallback",
        )
        out, n = eng.consensus("chr1", 0, len(seq))
        assert (out, n) == (seq, 0), f"native={use_native}: {out!r}, {n}"

    # a record skipped for OVERLAP never reaches bcftools' REF check: the
    # region still applies (mirrors the apply loop's cursor semantics)
    overlap = [
        V(pos=2, ref="CGT", alleles=("C", "C")),   # deletion spans 2-4
        V(pos=3, ref="X", alleles=("T", "T")),     # bogus REF, but overlapped
    ]
    eng = ConsensusEngine(
        _FakeFasta(seq), _FakeVcf(overlap), use_native=False,
        ref_mismatch="region_fallback",
    )
    assert eng.consensus("chr1", 0, len(seq)) == ("ACAC", 1)

    # env-var default resolution
    monkeypatch.setenv("VFX_CONSENSUS_REF_MISMATCH", "region_fallback")
    eng = ConsensusEngine(_FakeFasta(seq), _FakeVcf(variants), use_native=False)
    assert eng.ref_mismatch == "region_fallback"
    assert eng.consensus("chr1", 0, len(seq)) == (seq, 0)


def test_region_offset_coordinates():
    # Engine coordinates are genomic: slice starting at 1000 applies POS 1003.
    out, n = _consensus("AAAAA", [V(pos=1003, ref="A", alleles=("A", "T"))],
                        start=1000, use_native=False)
    assert out == "AAWAA" and n == 1


def test_random_differential_python_vs_native():
    """Property test: both engines agree on random variant soups."""
    try:
        from variantformer_tpu.utils.native import native_consensus  # noqa: F401
    except Exception:
        pytest.skip("native library not built")
    rng = np.random.default_rng(11)
    bases = np.array(list("ACGT"))
    for _ in range(25):
        n = int(rng.integers(50, 200))
        seq = "".join(rng.choice(bases, n))
        variants = []
        pos = 1
        while True:
            pos += int(rng.integers(1, 12))
            if pos + 4 >= n:
                break
            ref_len = int(rng.integers(1, 4))
            ref = seq[pos - 1 : pos - 1 + ref_len]
            kind = rng.integers(0, 4)
            if kind == 0:      # het SNP
                alt = str(rng.choice(bases))
                variants.append(V(pos=pos, ref=ref[0], alleles=(ref[0], alt)))
            elif kind == 1:    # hom SNP
                alt = str(rng.choice(bases))
                variants.append(V(pos=pos, ref=ref[0], alleles=(alt, alt)))
            elif kind == 2:    # hom indel
                alt = ref[0] + "".join(rng.choice(bases, int(rng.integers(0, 3))))
                variants.append(V(pos=pos, ref=ref, alleles=(alt, alt)))
            else:              # het indel
                alt = ref[0] + "".join(rng.choice(bases, int(rng.integers(0, 3))))
                variants.append(V(pos=pos, ref=ref, alleles=(ref, alt)))
        for snps_only in (False, True):
            out_py, n_py = _consensus(seq, variants, snps_only=snps_only,
                                      use_native=False)
            out_c, n_c = _consensus(seq, variants, snps_only=snps_only,
                                    use_native=True)
            assert out_py == out_c
            assert n_py == n_c
