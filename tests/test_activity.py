"""Activity model / assembly region tests
(reference semantics: filters/pileup.go, haplotypecaller.go:286-443)."""

import numpy as np

from elprep_tpu.filters.clipping import ClipRead
from elprep_tpu.hc import activity
from elprep_tpu.hc.activity import JavaRandom, make_hc_params

_BASES = np.frombuffer(b"ACGT", np.uint8)


def _read(pos, seq, qual=35, flag=0x63, tlen=200, pnext=None, cigar=None, qname=b"r"):
    n = len(seq)
    return ClipRead(
        flag=flag, pos=pos, pnext=pnext if pnext is not None else pos + 100,
        tlen=tlen, mapq=60,
        cigar=cigar if cigar is not None else [(n, "M")],
        seq=seq, qual=bytes([qual]) * n, rname=b"c1", rnext=b"=", qname=qname,
    )


def _mkref(rng, n):
    return rng.choice(_BASES, n).tobytes()


def test_java_random_matches_java():
    # anchored: the same LCG yields Random(42).nextInt() == -1170105035
    r = JavaRandom(42)
    assert [r.int31n(100) for _ in range(5)] == [30, 63, 48, 84, 70]


def test_params():
    p = make_hc_params("NONE")
    assert abs(p.log10_priors[1] - (-3.0)) < 1e-12
    assert p.standard_confidence_for_activity_by_min10 == -0.4
    p2 = make_hc_params("GVCF")
    assert p2.standard_confidence_for_calling == 0.0


def test_ref_only_reads_inactive():
    rng = np.random.RandomState(0)
    ref = _mkref(rng, 300)
    params = make_hc_params()
    reads = [_read(i * 10 + 1, ref[i * 10 : i * 10 + 50]) for i in range(20)]
    is_active, hq = activity.compute_activity(reads, ref, 1, 301, params)
    assert np.all(is_active == 0.0)


def test_snp_cluster_active():
    rng = np.random.RandomState(1)
    ref = _mkref(rng, 300)
    params = make_hc_params()
    # half the reads carry an alt base at position 150 (1-based)
    reads = []
    for i in range(30):
        start = 120 + (i % 10)
        seq = bytearray(ref[start - 1 : start - 1 + 60])
        if i % 2 == 0:
            k = 150 - start
            seq[k] = ord("A") if seq[k] != ord("A") else ord("C")
        reads.append(_read(start, bytes(seq)))
    reads.sort(key=lambda r: r.pos)
    is_active, hq = activity.compute_activity(reads, ref, 1, 301, params)
    assert is_active[149] > 0.9, is_active[145:155]
    # neighbors without variants stay inactive
    assert is_active[100] == 0.0


def test_deletion_active():
    rng = np.random.RandomState(2)
    ref = _mkref(rng, 300)
    params = make_hc_params()
    reads = []
    for i in range(30):
        start = 120 + (i % 10)
        if i % 2 == 0:
            # 3bp deletion at ref pos 150..152
            k = 150 - start
            seq = ref[start - 1 : start - 1 + k] + ref[start + 2 + k : start + 2 + k + 40 - k]
            cigar = [(k, "M"), (3, "D"), (40 - k, "M")]
            reads.append(_read(start, seq, cigar=cigar))
        else:
            reads.append(_read(start, ref[start - 1 : start - 1 + 43]))
    reads.sort(key=lambda r: r.pos)
    is_active, hq = activity.compute_activity(reads, ref, 1, 301, params)
    assert is_active[149] > 0.5


def test_band_pass_and_regions():
    params = make_hc_params()
    n = 400
    is_active = np.zeros(n)
    hq = np.zeros(n)
    is_active[200] = 1.0
    states = activity.band_pass_states(is_active, hq, params)
    assert states[200] == is_active[200] * activity.tables.GAUSSIAN_KERNEL[50]
    assert states[150] > 0 and states[250] > 0 and states[100] == 0.0
    regions = activity.compute_assembly_regions("c1", b"A" * n, 0, n, n, states, params)
    # regions tile the window exactly
    assert regions[0].start == 1
    assert regions[-1].end == n
    for a, b in zip(regions, regions[1:]):
        assert b.start == a.end + 1
    actives = [r for r in regions if r.is_active]
    assert len(actives) == 1
    act = actives[0]
    assert act.start <= 201 <= act.end


def test_finalize_region_clips_and_sorts():
    rng = np.random.RandomState(3)
    ref = _mkref(rng, 400)
    params = make_hc_params()
    r1 = _read(120, ref[119:179], qual=30, qname=b"a")
    r2 = _read(100, ref[99:159], qual=30, qname=b"b")
    region = activity.AssemblyRegion(
        contig="c1", reference=ref, reads=[r1, r2], start=101, end=200,
        extension=100, contig_length=400,
    )
    activity.finalize_assembly_region(region, params)
    assert [r.pos for r in region.reads] == sorted(r.pos for r in region.reads)
    assert all(len(r.seq) > 0 for r in region.reads)


def test_overlapping_pair_qual_reconciliation():
    ref = b"ACGTACGTACGTACGTACGTACGTACGTACGT"
    # mates overlap at positions 11..20 with one disagreement
    s1 = ref[0:20]
    s2 = bytearray(ref[10:30])
    s2[2] = ord("A") if s2[2] != ord("A") else ord("C")
    r1 = _read(1, s1, qual=35, flag=0x63, pnext=11, tlen=30, qname=b"p")
    r2 = _read(11, bytes(s2), qual=35, flag=0x93, pnext=1, tlen=-30, qname=b"p")
    activity.for_each_read_pair([r1, r2], activity.clean_overlapping_read_pair)
    # agreeing overlap bases capped at half PCR error qual (=20)
    assert r1.qual[10] == activity.HALF_PCR_SNV_ERROR_QUAL
    assert r2.qual[0] == activity.HALF_PCR_SNV_ERROR_QUAL
    # disagreeing base zeroed
    assert r2.qual[2] == 0 and r1.qual[12] == 0


def test_downsampler_caps_reads_per_start():
    params = make_hc_params()
    reads = [_read(5, b"ACGTACGTAC", qname=b"r%d" % i) for i in range(120)]
    out = activity.downsample(reads, params)
    assert len(out) == params.max_reads_per_alignment_start


def test_vectorized_expand_elements_matches_oracle():
    """Vectorized expand_elements == per-op loop oracle on randomized
    reads with M/I/S/X/=/D/N cigars (reference: pileup.go:88-405)."""
    import random

    import numpy as np

    from elprep_tpu.filters.clipping import ClipRead
    from elprep_tpu.hc import activity

    rng = random.Random(11)
    bases = b"ACGT"

    def mk_read(pos):
        n = rng.randrange(20, 140)
        seq = bytes(rng.choice(bases) for _ in range(n))
        qual = bytes(rng.randrange(2, 41) for _ in range(n))
        cigar = []
        left = n
        while left > 0:
            ln = min(left, rng.randrange(1, 50))
            cigar.append((ln, rng.choice("MMMMMISX=")))
            left -= ln
            if rng.random() < 0.4:
                cigar.append((rng.randrange(1, 6), rng.choice("DDN")))
        return ClipRead(
            flag=rng.choice([0x63, 0x93, 0x53, 0xA3]), pos=pos,
            pnext=pos + rng.randrange(-80, 80),
            tlen=rng.choice([0, 50, 150, -150, 200]), mapq=60, cigar=cigar,
            seq=seq, qual=qual, rname=b"c1", rnext=b"=", qname=b"q")

    for _ in range(40):
        reads = sorted((mk_read(rng.randrange(1, 800))
                        for _ in range(rng.randrange(1, 25))),
                       key=lambda r: r.pos)
        low, high = 100, 100 + rng.randrange(50, 700)
        a = activity.expand_elements(reads, low, high)
        b = activity._expand_elements_py(reads, low, high)
        bb = activity._expand_bases(reads, low, high)
        for k in ("refpos", "read_idx", "qual", "alt", "is_del",
                  "next_to_sc", "keep", "hq"):
            assert np.array_equal(a[k], b[k]), k
        assert np.array_equal(a["base"], bb)


def test_flip_jump_assembly_regions_match_oracle():
    """Flip-jump compute_assembly_regions == position-loop oracle
    (reference: computeAssemblyRegions, haplotypecaller.go:328-378)."""
    import numpy as np

    from elprep_tpu.hc import activity
    from elprep_tpu.hc.activity import make_hc_params

    params = make_hc_params("GVCF")
    rng = np.random.RandomState(3)
    for _ in range(60):
        n = rng.randint(50, 5000)
        states = np.zeros(n)
        for _ in range(rng.randint(0, 8)):
            c = rng.randint(0, n)
            w = rng.randint(1, 400)
            states[max(0, c - w):c + w] += rng.rand() * 0.1
        rs = rng.randint(0, 50)
        a = activity.compute_assembly_regions(
            "c", b"A" * (rs + n + 10), rs, rs + n, rs + n + 10, states, params)
        b = activity._compute_assembly_regions_py(
            "c", b"A" * (rs + n + 10), rs, rs + n, rs + n + 10, states, params)
        assert [(x.start, x.end, x.is_active) for x in a] == \
               [(y.start, y.end, y.is_active) for y in b]


def test_band_pass_states_vectorized_matches_oracle():
    from elprep_tpu.hc.activity import (band_pass_states,
                                        _band_pass_states_py, make_hc_params)

    rng = np.random.RandomState(5)
    params = make_hc_params("GVCF")
    for n in (1, 7, 99, 5000):
        ia = np.where(rng.rand(n) < 0.2, rng.rand(n), 0.0)
        hq = rng.rand(n) * 12
        a = band_pass_states(ia, hq, params)
        b = _band_pass_states_py(ia, hq, params)
        # bitwise identical (same accumulation order)
        assert a.tobytes() == b.tobytes(), n
