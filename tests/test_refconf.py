"""Vectorized ref-confidence vs the cursor oracle
(reference: filters/ref-confidence.go)."""

import numpy as np
import pytest

from elprep_tpu.filters.clipping import ClipRead
from elprep_tpu.hc import refconf
from elprep_tpu.hc.activity import AssemblyRegion, make_hc_params

_BASES = np.frombuffer(b"ACGT", np.uint8)


def _mk_reads(rng, ref, n_reads, read_len=60):
    reads = []
    for i in range(n_reads):
        start = rng.randint(1, len(ref) - read_len - 10)
        seq = bytearray(ref[start - 1 : start - 1 + read_len])
        cigar = [(read_len, "M")]
        # random mutations and occasional indels in the cigar
        for _ in range(rng.randint(0, 3)):
            seq[rng.randint(read_len)] = _BASES[rng.randint(4)]
        roll = rng.rand()
        if roll < 0.2:
            k = rng.randint(10, read_len - 10)
            cigar = [(k, "M"), (rng.randint(1, 4), "D"), (read_len - k, "M")]
        elif roll < 0.3:
            k = rng.randint(10, read_len - 10)
            cigar = [(k, "M"), (rng.randint(1, 4), "I"), (read_len - k - 2, "M")]
            # keep read length consistent with cigar
            ins = cigar[1][0]
            cigar = [(k, "M"), (ins, "I"), (read_len - k - ins, "M")]
        reads.append(ClipRead(
            flag=0x63 if i % 2 == 0 else 0x93, pos=start,
            pnext=start + 80, tlen=150 if i % 2 == 0 else -150, mapq=60,
            cigar=cigar, seq=bytes(seq),
            qual=bytes(rng.randint(4, 41, read_len).astype(np.uint8)),
            rname=b"c1", rnext=b"=", qname=b"r%04d" % i,
        ))
    reads.sort(key=lambda r: r.pos)
    return reads


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_vectorized_matches_cursor(seed):
    rng = np.random.RandomState(seed)
    ref = rng.choice(_BASES, 1200).tobytes()
    reads = _mk_reads(rng, ref, 60)
    params = make_hc_params("GVCF")
    region = AssemblyRegion(contig="c1", reference=ref, reads=list(reads),
                            start=100, end=900, extension=100,
                            contig_length=len(ref))
    got = refconf.calculate_ref_confidence(params, [], region, list(reads),
                                           None, True)
    want = refconf.calculate_ref_confidence_cursor(params, [], region,
                                                   list(reads), None, True)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g.location == w.location
        assert g.dp == w.dp, (g.location, g.dp, w.dp)
        assert g.ad == w.ad, (g.location, g.ad, w.ad)
        assert g.pls == w.pls, (g.location, g.pls, w.pls)
        assert g.gq == w.gq, (g.location, g.gq, w.gq)


def test_vectorized_with_calls():
    rng = np.random.RandomState(9)
    ref = rng.choice(_BASES, 800).tobytes()
    reads = _mk_reads(rng, ref, 40)
    params = make_hc_params("GVCF")
    from elprep_tpu.io.vcf import Variant

    calls = [Variant(chrom="c1", pos=300, ref=ref[299:302].decode(), alt=["A"]),
             Variant(chrom="c1", pos=500, ref="A", alt=["T"])]
    region = AssemblyRegion(contig="c1", reference=ref, reads=list(reads),
                            start=100, end=700, extension=100,
                            contig_length=len(ref))
    got = refconf.calculate_ref_confidence(params, [], region, list(reads),
                                           calls, True)
    want = refconf.calculate_ref_confidence_cursor(params, [], region,
                                                   list(reads), calls, True)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert (g.full_variant is None) == (w.full_variant is None)
        if g.full_variant is None:
            assert (g.location, g.dp, g.ad, g.pls, g.gq) == \
                   (w.location, w.dp, w.ad, w.pls, w.gq)
        else:
            assert g.full_variant is w.full_variant


def test_native_informative_bits_match_python():
    """Native refconf_informative matches the pure-Python bitset loop on
    randomized reads/refs (reference: ref-confidence.go:137-200)."""
    import random

    import numpy as np

    import elprep_tpu.native as nat
    from elprep_tpu.hc import refconf
    from elprep_tpu.hc.activity import make_hc_params

    if not nat.available():
        return
    params = make_hc_params()

    class R:
        def __init__(self, seq, qual, cigar):
            self.seq = seq
            self.qual = qual
            self.cigar = cigar

    rng = random.Random(7)
    bases = b"ACGT"
    for _ in range(150):
        n = rng.randrange(12, 160)
        seq = bytes(rng.choice(bases) for _ in range(n))
        qual = bytes(rng.randrange(2, 40) for _ in range(n))
        cigar = []
        left = n
        while left > 0:
            ln = min(left, rng.randrange(1, 60))
            cigar.append((ln, rng.choice("MMMMIS")))
            left -= ln
            if rng.random() < 0.3:
                cigar.append((rng.randrange(1, 5), "D"))
        r = R(seq, qual, cigar)
        ref = bytes(rng.choice(bases + b"N") for _ in range(400))
        read_start = rng.randrange(0, max(1, n - 5))
        ref_index = rng.randrange(0, 200)
        padded_end = rng.randrange(ref_index + 1, 400)

        cache_n = {}
        got = refconf.read_has_no_plausible_indels(
            cache_n, params, r, read_start, ref, ref_index, padded_end)
        bits_n = cache_n[id(r)].copy()

        orig = nat.available
        nat.available = lambda: False
        try:
            cache_p = {}
            got_p = refconf.read_has_no_plausible_indels(
                cache_p, params, r, read_start, ref, ref_index, padded_end)
            bits_p = cache_p[id(r)].copy()
        finally:
            nat.available = orig
        assert got == got_p
        assert np.array_equal(bits_n, bits_p)


@pytest.mark.parametrize("seed", [4, 5])
def test_merge_run_matches_merge_variant(seed):
    """RefRun vectorized banding == per-position merge_variant
    (variant-combiner.go:141-263)."""
    rng = np.random.RandomState(seed)
    ref = rng.choice(_BASES, 1200).tobytes()
    reads = _mk_reads(rng, ref, 60)
    params = make_hc_params("GVCF")
    from elprep_tpu.io.vcf import Variant

    calls = [Variant(chrom="c1", pos=300, ref=ref[299:304].decode(), alt=["A"]),
             Variant(chrom="c1", pos=500, ref="A", alt=["T"])]
    region = AssemblyRegion(contig="c1", reference=ref, reads=list(reads),
                            start=100, end=900, extension=100,
                            contig_length=len(ref))
    per_pos = refconf.calculate_ref_confidence(params, [], region, list(reads),
                                               calls, True)
    runs = refconf.calculate_ref_confidence(params, [], region, list(reads),
                                            calls, True, as_runs=True)
    assert any(isinstance(x, refconf.RefRun) for x in runs)

    def combine(svs):
        comb = refconf.VariantCombiner(params, lambda c: ref)
        out = []
        for sv in svs:
            out = comb.set_contig(out, "c1")
            if isinstance(sv, refconf.RefRun):
                out = comb.merge_run(out, sv)
            else:
                out = comb.merge_variant(out, sv)
        fin = comb.finalize()
        if fin is not None:
            out.append(fin)
        return out

    a, b_raw = combine(per_pos), combine(runs)
    # batch text form must match the per-record formatter byte-for-byte
    from elprep_tpu.io.vcf import format_variant

    for entry in b_raw:
        if isinstance(entry, refconf.RefBlockBatch):
            assert entry.format_lines() == "".join(
                format_variant(v) for v in entry.expand())
    b = refconf.expand_variants(b_raw)
    assert len(a) == len(b)
    for va, vb in zip(a, b):
        assert (va.chrom, va.pos, va.ref, va.alt) == (vb.chrom, vb.pos, vb.ref, vb.alt)
        assert va.info.get("END") == vb.info.get("END")
        if va.genotypes and va.genotypes[0].data:
            assert va.genotypes[0].data == vb.genotypes[0].data


@pytest.mark.parametrize("seed", [6, 7])
def test_concat_ref_runs_equals_sequential_merge(seed):
    """merge_run(concat(adjacent runs)) == sequential merge_run per run —
    the driver's run-buffer batching must not change the banding."""
    rng = np.random.RandomState(seed)
    ref = rng.choice(_BASES, 1200).tobytes()
    reads = _mk_reads(rng, ref, 60)
    params = make_hc_params("GVCF")
    region = AssemblyRegion(contig="c1", reference=ref, reads=list(reads),
                            start=100, end=900, extension=100,
                            contig_length=len(ref))
    runs = refconf.calculate_ref_confidence(params, [], region, list(reads),
                                            None, True, as_runs=True)
    runs = [r for r in runs if isinstance(r, refconf.RefRun)]
    assert runs and all(
        runs[k + 1].pos0 == runs[k].pos0 + len(runs[k])
        for k in range(len(runs) - 1))
    # re-split each run into random adjacent pieces to stress the concat
    pieces = []
    for r in runs:
        i = 0
        while i < len(r):
            j = min(len(r), i + int(rng.randint(1, 80)))
            pieces.append(refconf.RefRun(r.pos0 + i, r.dp[i:j], r.ad_ref[i:j],
                                         r.ad_nonref[i:j], r.pls[i:j],
                                         r.gq[i:j]))
            i = j

    def combine(svs, batch):
        comb = refconf.VariantCombiner(params, lambda c: ref)
        out = comb.set_contig([], "c1")
        if batch:
            out = comb.merge_run(out, refconf.concat_ref_runs(svs))
        else:
            for sv in svs:
                out = comb.merge_run(out, sv)
        fin = comb.finalize()
        if fin is not None:
            out.append(fin)
        return refconf.expand_variants(out)

    a = combine(pieces, batch=False)
    b = combine(pieces, batch=True)
    assert len(a) == len(b) and len(a) > 3
    for va, vb in zip(a, b):
        assert (va.chrom, va.pos, va.ref, va.alt) == (vb.chrom, vb.pos, vb.ref, vb.alt)
        assert va.info.get("END") == vb.info.get("END")
        assert va.genotypes[0].data == vb.genotypes[0].data


@pytest.mark.parametrize("seed", list(range(8)))
def test_merge_run_rle_matches_positional(seed):
    """The run-level RLE merge path (_merge_run_rle, used for runs that
    arrive pickled from HC workers) must emit record-identical output to
    the positional paths, across adjacent-run continuation, gaps,
    next_start skips from interleaved full variants, and single-run-only
    (open block) merges."""
    import pickle

    from elprep_tpu.io.vcf import Variant

    rng = np.random.RandomState(100 + seed)
    params = make_hc_params("GVCF")
    ref = rng.choice(_BASES, 50_000).tobytes()

    def col(n, lo, hi):
        out = []
        left = n
        while left:
            ln = int(min(left, rng.randint(1, 60)))
            out.append(np.full(ln, rng.randint(lo, hi)))
            left -= ln
        return np.concatenate(out).astype(np.int32)

    def col3(n):
        out = []
        left = n
        while left:
            ln = int(min(left, rng.randint(1, 60)))
            v = np.array([0, rng.randint(0, 40), rng.randint(0, 90)])
            out.append(np.tile(v, (ln, 1)))
            left -= ln
        return np.vstack(out).astype(np.int32)

    def mk_run(pos0, n):
        dp = col(n, 0, 60)
        ad_r = np.minimum(dp, col(n, 0, 50))
        return refconf.RefRun(pos0, dp, ad_r, (dp - ad_r).astype(np.int32),
                              col3(n), col(n, 0, 120))

    events = []
    pos = 101
    for _ in range(12):
        n = int(rng.randint(1, 400))
        events.append(("run", mk_run(pos, n)))
        pos += n
        roll = rng.rand()
        if roll < 0.25:
            pos += int(rng.randint(1, 30))  # gap -> finalize + fresh block
        elif roll < 0.5:
            # full variant whose span reaches into the next run ->
            # exercises the next_start prefix skip
            v = Variant(chrom="c1", pos=max(1, pos - 3),
                        ref="A" * int(rng.randint(1, 12)), alt=["T"])
            events.append(("var", v))

    def combine(rle):
        comb = refconf.VariantCombiner(params, lambda c: ref)
        out = comb.set_contig([], "c1")
        for kind, x in events:
            if kind == "run":
                if rle:
                    x = pickle.loads(pickle.dumps(x))
                    assert x._rle is not None and not x._cols
                out = comb.merge_run(out, x)
            else:
                out = comb.merge_variant(
                    out, refconf.SingleVariant(full_variant=x))
        fin = comb.finalize()
        if fin is not None:
            out.append(fin)
        return refconf.expand_variants(out)

    a = combine(rle=False)  # positional paths (the oracle)
    b = combine(rle=True)   # run-level RLE path
    assert len(a) == len(b) and len(a) > 5
    for va, vb in zip(a, b):
        assert (va.chrom, va.pos, va.ref, va.alt) == \
            (vb.chrom, vb.pos, vb.ref, vb.alt)
        assert va.info.get("END") == vb.info.get("END")
        if va.genotypes:
            assert va.genotypes[0].data == vb.genotypes[0].data


def test_vectorized_refconf_expansion_matches_oracle():
    """Vectorized _expand_refconf_elements == per-op loop oracle on
    randomized cigars (reference: ref-confidence.go:266-361)."""
    import random

    from elprep_tpu.filters.clipping import ClipRead

    rng = random.Random(13)
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
        a = refconf._expand_refconf_elements(reads, low, high)
        b = refconf._expand_refconf_elements_py(reads, low, high)
        assert (a is None) == (b is None)
        if a is None:
            continue
        for k in a:
            assert np.array_equal(a[k], b[k]), k


def test_jacobian_index_nonfinite():
    # -inf likelihood lanes (qual-0 bases) must not fault the table
    # gather; the caller masks those lanes to `big` afterwards.
    from elprep_tpu.hc import tables
    diff = np.array([0.0, 1.0, np.inf, np.nan, 1e9])
    idx = tables.jacobian_index(diff)
    assert idx.dtype == np.int64
    assert (idx >= 0).all() and (idx < len(tables.JACOBIAN_LOG_TABLE)).all()


def test_native_gvcf_formatter_matches_python_fallback():
    """gvcf_format_blocks (elprep_native.cpp) must emit exactly the
    bytes of RefBlockBatch's Python %-format fallback, including
    extreme field widths and an empty batch."""
    from elprep_tpu import native

    if native.get_lib() is None:
        pytest.skip("native lib unavailable")
    rng = np.random.RandomState(11)
    for trial in range(25):
        n = [0, 1, rng.randint(2, 60)][min(trial, 2) if trial < 3
                                       else 2]
        chrom = ["1", "chrUn_KI270752v1", "chrM"][trial % 3]
        b = refconf.RefBlockBatch.__new__(refconf.RefBlockBatch)
        b.chrom = chrom
        b.ref_base = rng.randint(65, 90, n).astype(np.uint8)
        b.pos = rng.choice([1, 9, 10, 99999999, 2**31 - 1],
                           n).astype(np.int64)
        b.end = rng.choice([1, 248956422, 2**31 - 1], n).astype(np.int64)
        b.dp = rng.randint(0, 100000, n).astype(np.int64)
        b.gq = rng.randint(0, 100, n).astype(np.int64)
        b.min_dp = rng.randint(0, 100000, n).astype(np.int64)
        b.pls = rng.randint(0, 10**7, (n, 3)).astype(np.int64)
        fast = native.gvcf_format_blocks(
            chrom.encode(), b.ref_base, b.pos, b.end, b.dp, b.gq,
            b.min_dp, b.pls)
        rb = b.ref_base.tobytes().decode("latin-1")
        slow = "".join(
            "%s\t%d\t.\t%s\t<NON_REF>\t.\t.\tEND=%d"
            "\tGT:DP:GQ:MIN_DP:PL\t0/0:%d:%d:%d:%d,%d,%d\n"
            % (chrom, p, rb[k], e, d, q, m, p0, p1, p2)
            for k, (p, e, d, q, m, (p0, p1, p2)) in enumerate(
                zip(b.pos.tolist(), b.end.tolist(), b.dp.tolist(),
                    b.gq.tolist(), b.min_dp.tolist(),
                    b.pls.tolist()))).encode("latin-1")
        assert fast == slow


@pytest.mark.parametrize("seed", [11, 12, 13])
def test_native_gvcf_band_blocks_match_numpy(seed):
    """Fuzz the C++ band-block scan against the numpy
    searchsorted/reduceat/median section of _merge_run_impl: random GQ
    band patterns (incl. constant runs, singleton blocks, even/odd
    median counts), merged through full VariantCombiner streams with
    the native path on vs forced off."""
    from elprep_tpu import native as nat
    from elprep_tpu.io.vcf import format_variant

    if nat.gvcf_band_blocks(np.zeros(2, np.int32), np.zeros(2, np.int32),
                            np.zeros((2, 3), np.int32), 0,
                            [0, 10, 99]) is None:
        pytest.skip("native lib unavailable")
    rng = np.random.RandomState(seed)
    ref = rng.choice(_BASES, 8000).tobytes()
    params = make_hc_params("GVCF")

    def mk_runs():
        runs, pos = [], 1
        for _ in range(rng.randint(3, 8)):
            n = int(rng.randint(1, 900))
            gq = rng.choice([0, 1, 5, 17, 44, 98, 99, 120],
                            n).astype(np.int32)
            if rng.rand() < 0.5:  # long constant stretches
                gq[:] = gq[0]
            dp = rng.randint(0, 60, n).astype(np.int32)
            pls = rng.randint(0, 500, (n, 3)).astype(np.int32)
            runs.append(refconf.RefRun(pos, dp, dp, 0 * dp, pls, gq))
            pos += n + (0 if rng.rand() < 0.7 else rng.randint(1, 5))
        return runs

    def combine(runs):
        comb = refconf.VariantCombiner(params, lambda c: ref)
        out = []
        for r in runs:
            out = comb.set_contig(out, "c1")
            out = comb.merge_run(out, r)
        fin = comb.finalize()
        if fin is not None:
            out.append(fin)
        return "".join(format_variant(v)
                       for v in refconf.expand_variants(out))

    for _ in range(4):
        runs = mk_runs()
        a = combine(runs)
        orig = nat.gvcf_band_blocks
        nat.gvcf_band_blocks = lambda *args, **kw: None
        try:
            b = combine(runs)
        finally:
            nat.gvcf_band_blocks = orig
        assert a == b
