"""De Bruijn assembly tests (reference semantics: filters/assemble-reads.go)."""

import math

import numpy as np
import pytest

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


def test_native_assembly_matches_python_fuzz():
    """The native graph engine must reproduce the Python module
    (its oracle) exactly: same candidate scores and haplotype bases on
    randomized regions with SNPs, indels, low-qual runs and N bases."""
    from elprep_tpu import native
    from elprep_tpu.hc import assembly as A

    if not native.available():
        pytest.skip("native lib unavailable")

    rng = np.random.RandomState(123)
    bases4 = np.frombuffer(b"ACGT", np.uint8)
    n_checked = 0
    for trial in range(40):
        ref_len = int(rng.randint(120, 500))
        ref = rng.choice(bases4, ref_len).tobytes()
        # alternate haplotype with 1-3 events
        alt = bytearray(ref)
        for _ in range(rng.randint(1, 4)):
            p = int(rng.randint(10, ref_len - 10))
            kind = rng.randint(3)
            if kind == 0:  # SNP
                alt[p] = (alt[p] + 1) if alt[p] != ord("T") else ord("A")
            elif kind == 1 and len(alt) > 40:  # deletion
                del alt[p : p + int(rng.randint(1, 6))]
            else:  # insertion
                ins = rng.choice(bases4, int(rng.randint(1, 5))).tobytes()
                alt[p:p] = ins
        alt = bytes(alt)
        reads = []
        for i in range(int(rng.randint(10, 40))):
            hap = ref if i % 2 == 0 else alt
            if len(hap) < 60:
                continue
            start = int(rng.randint(0, len(hap) - 50))
            ln = int(rng.randint(40, min(90, len(hap) - start)))
            seq = bytearray(hap[start : start + ln])
            qual = rng.randint(8, 40, ln).astype(np.uint8)
            # sprinkle N bases and low-qual positions
            for _ in range(rng.randint(0, 3)):
                seq[int(rng.randint(ln))] = ord("N")
            reads.append((bytes(seq), qual.tobytes()))
        for k in (10, 25):
            if ref_len < k:
                continue
            got = native.assembly_try(ref, reads, k, 10, False)
            # python oracle for the same attempt
            if A.non_unique_kmers_exist(ref, k):
                expected = False
            else:
                g = A.KmerGraph(k)
                seqs = [A.Kmer(bases=ref, start=0, stop=len(ref), is_ref=True)]
                for s, q in reads:
                    seqs = A.add_sequences_for_kmers(seqs, s, q, k, 10)
                g.initialize_non_unique_kmers(seqs)
                rs = ref[:k]
                for ks in seqs:
                    u = g.find_start_of_kmers(ks)
                    if u == -1:
                        continue
                    v = g.get_kmer_vertex(ks, u)
                    g.increase_counts_matched_kmers(ks, v)
                    for i in range(u + 1, ks.stop - k + 1):
                        v = g.extend_chain_by_one(rs, v, ks, i)
                if not g.vertices:
                    expected = False
                else:
                    g.prune_chains_with_low_weight()
                    if not g.vertices or g.has_cycle() or g.is_low_complexity():
                        expected = False
                    else:
                        g.recover_dangling_tails()
                        g.recover_dangling_heads(k)
                        g.remove_paths_not_connected_to_reference()
                        g.convert_to_sequence_graph()
                        g.clean_sequence_graph()
                        ref_h = A.make_reference_haplotype(ref, 1)
                        # capture raw candidates via the shared tail: run
                        # add_best_haplotypes with an empty result and no
                        # filtering shortcut — compare through full
                        # assemble path instead (below)
                        expected = None
            if expected is False:
                assert got is False, (trial, k)
                continue
            # full-path comparison (covers candidate production + tail)
            n_checked += 1
            import os

            os.environ["ELPREP_TPU_NO_NATIVE_ASSEMBLY"] = "1"
            try:
                py = A.assemble_reads(ref, 1, reads, min_base_qual=10)
            finally:
                del os.environ["ELPREP_TPU_NO_NATIVE_ASSEMBLY"]
            nat = A.assemble_reads(ref, 1, reads, min_base_qual=10)
            assert len(py) == len(nat), (trial, k, len(py), len(nat))
            for hp, hn in zip(py, nat):
                assert hp.bases == hn.bases, (trial, k)
                assert hp.cigar == hn.cigar, (trial, k)
                assert (hp.score == hn.score) or (
                    math.isnan(hp.score) and math.isnan(hn.score)), (trial, k)
            break  # full-path check once per trial is enough
    assert n_checked >= 10, f"fuzz exercised only {n_checked} full paths"


def test_assembly_try_columnar_matches_tuples():
    """The columnar (seq_flat, qual_flat, offs) input form of the native
    assembly_try returns identical candidates to the per-read tuples
    form (pure transport; no per-read bytes objects)."""
    import numpy as np

    from elprep_tpu import native

    if native.get_lib() is None:
        import pytest

        pytest.skip("native lib unavailable")
    rng = np.random.RandomState(99)
    for trial in range(6):
        ref = bytes(rng.choice(np.frombuffer(b"ACGT", np.uint8), 160))
        reads = []
        for _ in range(int(rng.randint(3, 40))):
            s = int(rng.randint(0, 100))
            ln = int(rng.randint(20, 60))
            seq = bytearray(ref[s:s + ln])
            if rng.rand() < 0.5 and len(seq) > 10:
                seq[int(rng.randint(len(seq)))] = ord("ACGT"[int(rng.randint(4))])
            reads.append((bytes(seq),
                          bytes(rng.randint(10, 40, len(seq)).astype(np.uint8))))
        offs = np.zeros(len(reads) + 1, np.int64)
        for i, (s, _) in enumerate(reads):
            offs[i + 1] = offs[i] + len(s)
        seq_c = np.frombuffer(b"".join(s for s, _ in reads), np.uint8)
        qual_c = np.frombuffer(b"".join(q for _, q in reads), np.uint8)
        for k, last in ((10, False), (25, True)):
            a = native.assembly_try(ref, reads, k, 10, last)
            b = native.assembly_try(ref, (seq_c, qual_c, offs), k, 10, last)
            assert a == b, (trial, k)


def test_native_assembly_matches_python_with_n_reference():
    """References containing N runs (real genomes do) drive kmers into
    the engine's string tier while pure-ACGT kmers ride the 2-bit u64
    tier — membership must stay exact across the mix (Python oracle is
    the contract)."""
    import os

    from elprep_tpu import native
    from elprep_tpu.hc import assembly as A

    if not native.available():
        pytest.skip("native lib unavailable")
    rng = np.random.RandomState(321)
    bases4 = np.frombuffer(b"ACGT", np.uint8)
    for trial in range(12):
        ref_len = int(rng.randint(150, 400))
        ref = bytearray(rng.choice(bases4, ref_len).tobytes())
        # N singletons and a short N run inside the reference
        for _ in range(int(rng.randint(1, 5))):
            ref[int(rng.randint(ref_len))] = ord("N")
        p = int(rng.randint(20, ref_len - 20))
        ref[p:p + int(rng.randint(2, 6))] = b"N" * int(rng.randint(2, 6))
        ref = bytes(ref)
        reads = []
        for i in range(int(rng.randint(8, 30))):
            start = int(rng.randint(0, ref_len - 60))
            ln = int(rng.randint(40, 60))
            seq = bytearray(ref[start:start + ln])
            if rng.rand() < 0.5:
                seq[int(rng.randint(ln))] = ord("ACGT"[int(rng.randint(4))])
            reads.append((bytes(seq),
                          rng.randint(12, 40, ln).astype(np.uint8).tobytes()))
        os.environ["ELPREP_TPU_NO_NATIVE_ASSEMBLY"] = "1"
        try:
            py = A.assemble_reads(ref, 1, reads, min_base_qual=10)
        finally:
            del os.environ["ELPREP_TPU_NO_NATIVE_ASSEMBLY"]
        nat = A.assemble_reads(ref, 1, reads, min_base_qual=10)
        assert len(py) == len(nat), trial
        for hp, hn in zip(py, nat):
            assert hp.bases == hn.bases, trial
            # the bare reference haplotype carries score NaN: NaN != NaN
            same_score = (hp.score == hn.score
                          or (hp.score != hp.score and hn.score != hn.score))
            assert same_score, trial
