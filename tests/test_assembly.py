"""De Bruijn assembly tests (reference semantics: filters/assemble-reads.go)."""

import numpy as np

from elprep_tpu.hc import assembly
from elprep_tpu.ops import sw

_BASES = np.frombuffer(b"ACGT", np.uint8)


def _ref(rng, n):
    return rng.choice(_BASES, n).tobytes()


def _reads_from(hap: bytes, n_reads: int, read_len: int, rng, qual=35):
    reads = []
    for _ in range(n_reads):
        start = rng.randint(0, len(hap) - read_len + 1)
        seq = hap[start : start + read_len]
        reads.append((seq, bytes([qual]) * read_len))
    return reads


def test_ref_only_reads_give_ref_haplotype():
    rng = np.random.RandomState(1)
    ref = _ref(rng, 120)
    reads = _reads_from(ref, 30, 50, rng)
    haps = assembly.assemble_reads(ref, 1000, reads)
    assert haps[0].is_ref and haps[0].bases == ref
    # no spurious alt haplotypes beyond the reference
    assert all(h.bases == ref for h in haps[:1])


def test_snp_haplotype_recovered():
    rng = np.random.RandomState(2)
    ref = _ref(rng, 120)
    alt = ref[:60] + (b"A" if ref[60:61] != b"A" else b"C") + ref[61:]
    reads = _reads_from(ref, 20, 50, rng) + _reads_from(alt, 20, 50, rng)
    haps = assembly.assemble_reads(ref, 1000, reads)
    bases = {h.bases for h in haps}
    assert ref in bases
    assert alt in bases, "SNP haplotype not assembled"
    alt_h = next(h for h in haps if h.bases == alt)
    assert alt_h.cigar == [(len(ref), "M")]
    assert alt_h.location == 1000
    assert not alt_h.is_ref


def test_deletion_haplotype_recovered():
    rng = np.random.RandomState(3)
    ref = _ref(rng, 140)
    alt = ref[:70] + ref[75:]  # 5bp deletion
    reads = _reads_from(ref, 20, 60, rng) + _reads_from(alt, 20, 60, rng)
    haps = assembly.assemble_reads(ref, 500, reads)
    bases = {h.bases for h in haps}
    assert ref in bases
    assert alt in bases, "deletion haplotype not assembled"
    alt_h = next(h for h in haps if h.bases == alt)
    ops = [op for _, op in alt_h.cigar]
    assert "D" in ops
    assert sw.reference_length(alt_h.cigar) == len(ref)


def test_insertion_haplotype_recovered():
    rng = np.random.RandomState(4)
    ref = _ref(rng, 140)
    alt = ref[:70] + b"ACGTA" + ref[70:]
    reads = _reads_from(ref, 20, 60, rng) + _reads_from(alt, 20, 60, rng)
    haps = assembly.assemble_reads(ref, 500, reads)
    bases = {h.bases for h in haps}
    assert alt in bases, "insertion haplotype not assembled"
    alt_h = next(h for h in haps if h.bases == alt)
    assert "I" in [op for _, op in alt_h.cigar]


def test_low_weight_chains_pruned():
    # a single read with an error should NOT produce a haplotype
    rng = np.random.RandomState(5)
    ref = _ref(rng, 120)
    alt = ref[:60] + (b"A" if ref[60:61] != b"A" else b"C") + ref[61:]
    reads = _reads_from(ref, 30, 50, rng) + _reads_from(alt, 1, 50, rng)
    haps = assembly.assemble_reads(ref, 0, reads)
    assert alt not in {h.bases for h in haps}


def test_low_qual_bases_excluded():
    rng = np.random.RandomState(6)
    ref = _ref(rng, 120)
    alt = ref[:60] + (b"A" if ref[60:61] != b"A" else b"C") + ref[61:]
    # alt reads carry only low-qual bases -> unusable for assembly
    reads = _reads_from(ref, 20, 50, rng) + _reads_from(alt, 20, 50, rng, qual=5)
    haps = assembly.assemble_reads(ref, 0, reads)
    assert alt not in {h.bases for h in haps}


def test_short_reference_returns_ref_only():
    haps = assembly.assemble_reads(b"ACGTA", 0, [])
    assert len(haps) == 1 and haps[0].is_ref
