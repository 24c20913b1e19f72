"""PairHMM tests: exact oracle vs wavefront implementations
(reference semantics: filters/pairhmm.go)."""

import numpy as np
import pytest

from elprep_tpu.ops import pairhmm
from elprep_tpu.hc import tables


_BASES = np.frombuffer(b"ACGT", np.uint8)


def _rand_case(rng, lr, lh):
    seq = rng.choice(_BASES, lr).tobytes()
    qual = rng.randint(2, 42, lr).astype(np.uint8)
    hap = rng.choice(_BASES, lh).tobytes()
    return seq, qual, hap


def test_tandem_repeats():
    #            0123456789
    bases = b"AACACACTTT"
    unit, rl = pairhmm.find_tandem_repeat_units(bases, 2)  # at 'C' of ACAC run
    assert rl >= 2
    unit, rl = pairhmm.find_tandem_repeat_units(b"AAAAAAA", 3)
    assert unit == b"A" and rl == 7
    _, rl = pairhmm.find_tandem_repeat_units(b"A" * 30, 15)
    assert rl == 20  # capped (pairhmm.go:150-152)


def test_match_probs_last_base_sentinel():
    m2m, m2i = pairhmm.match_probs_for_read(b"ACGTACGT")
    assert m2i[-1] == tables.MATCH_TO_INDEL[21]
    assert m2m[-1] == tables.MATCH_TO_MATCH[21]


def test_diag_matches_exact():
    rng = np.random.RandomState(3)
    for _ in range(5):
        seq, qual, hap = _rand_case(rng, rng.randint(5, 30), rng.randint(10, 60))
        a = pairhmm.pairhmm_exact(seq, qual, 60, hap)
        b = pairhmm.pairhmm_f64_diag(seq, qual, 60, hap)
        assert a == pytest.approx(b, rel=0, abs=1e-12)


def test_identical_read_high_likelihood():
    hap = b"ACGTACGTACGTACGTACGTACGTACGT"
    seq = hap[4:20]
    qual = np.full(len(seq), 40, np.uint8)
    ll = pairhmm.pairhmm_exact(seq, qual, 60, hap)
    # perfect match: likelihood close to log10(1/hap_len-ish), > -2
    assert ll > -2.0
    # introduce mismatches: likelihood drops
    seq2 = bytearray(seq)
    seq2[5] = ord("A") if seq[5:6] != b"A" else ord("C")
    seq2[10] = ord("A") if seq[10:11] != b"A" else ord("C")
    ll2 = pairhmm.pairhmm_exact(bytes(seq2), qual, 60, hap)
    assert ll2 < ll - 3.0


def test_f32_batch_matches_f64():
    rng = np.random.RandomState(11)
    reads = []
    for _ in range(4):
        seq, qual, _ = _rand_case(rng, rng.randint(8, 40), 10)
        reads.append((seq, qual, 60))
    haps = [rng.choice(_BASES, rng.randint(20, 80)).tobytes() for _ in range(3)]
    got = pairhmm.pairhmm_f32_batch(reads, haps)
    for r in range(len(reads)):
        for h in range(len(haps)):
            want = pairhmm.pairhmm_f64_diag(reads[r][0], reads[r][1], 60, haps[h])
            assert got[r, h] == pytest.approx(want, abs=2e-3), (r, h)


def test_f32_variable_lengths_alignment():
    # pairs with very different hap lengths in one batch must not leak
    rng = np.random.RandomState(7)
    reads = [(b"ACGTACGTAC", np.full(10, 30, np.uint8), 60)]
    haps = [b"ACGTACGTAC", rng.choice(np.frombuffer(b"ACGT", np.uint8), 73).tobytes()]
    got = pairhmm.pairhmm_f32_batch(reads, haps)
    for h in range(2):
        want = pairhmm.pairhmm_f64_diag(reads[0][0], reads[0][1], 60, haps[h])
        assert got[0, h] == pytest.approx(want, abs=2e-3)


def test_compute_read_likelihoods_cap_and_filter():
    hap_ref = b"ACGTACGTACGTACGTACGTACGT"
    hap_alt = hap_ref[:10] + b"T" + hap_ref[11:]
    # read matches alt perfectly
    seq = hap_alt[2:20]
    qual = np.full(len(seq), 40, np.uint8)
    # junk read models poorly everywhere
    junk = b"G" * 18
    vals, keep = pairhmm.compute_read_likelihoods(
        [(seq, qual, 60), (junk, qual, 60)],
        [hap_ref, hap_alt],
        [True, False],
        use_device=False,
    )
    assert keep[0] and not keep[1]
    assert vals.shape == (2, 1)
    # cap: ref-hap value >= best_alt - 4.5
    assert vals[0, 0] >= vals[1, 0] + tables.GLOBAL_READ_MISMAPPING_RATE - 1e-12


def test_pallas_kernel_matches_scan_interpret():
    """The Pallas wavefront (interpret mode off-TPU) must match the
    lax.scan formulation and the f64 oracle on mixed-length pairs."""
    from elprep_tpu.ops import pairhmm_pallas as pp

    rng = np.random.RandomState(9)
    reads = []
    for lr in (17, 33, 48):
        seq, qual, hap = _rand_case(rng, lr, 0 or 1)
        seq = rng.choice(_BASES, lr).tobytes()
        qual = rng.randint(2, 42, lr).astype(np.uint8)
        reads.append((seq, qual, 60))
    haps = [rng.choice(_BASES, lh).tobytes() for lh in (40, 67, 129)]
    # inject 'N' bases (both sides) to cover the sentinel-match path
    reads[1] = (reads[1][0][:5] + b"N" + reads[1][0][6:], reads[1][1], 60)
    haps[0] = haps[0][:10] + b"NN" + haps[0][12:]
    pair_r = np.repeat(np.arange(len(reads)), len(haps))
    pair_h = np.tile(np.arange(len(haps)), len(reads))
    got = pp.pairhmm_pallas_pairs(reads, haps, pair_r, pair_h)
    for b in range(len(pair_r)):
        seq, qual, _ = reads[pair_r[b]]
        exact = pairhmm.pairhmm_f64_diag(seq, qual, 60, haps[pair_h[b]])
        assert abs(got[b] - exact) < 5e-4, (b, got[b], exact)


def test_native_repeat_lengths_match_python_oracle():
    """Fuzz the C++ tandem-repeat scan against the Python loop —
    homopolymers, dinucleotide repeats, 8-mer units, and the quirk that
    an unrepeated unit still reports the last tried unit's count."""
    from elprep_tpu import native
    from elprep_tpu.ops.pairhmm import (_repeat_lengths_for_read_py,
                                        repeat_lengths_for_read)

    if native.pairhmm_repeat_lengths(b"ACGT") is None:
        import pytest

        pytest.skip("native lib unavailable")
    rng = np.random.RandomState(5)
    cases = [b"", b"A", b"AA", b"ACACACAC", b"AAAAAAAAAA",
             b"ACGTACGTACGTACGT", b"ACGTACGT" * 4 + b"TTTT"]
    for _ in range(60):
        n = int(rng.randint(0, 60))
        cases.append(rng.choice(np.frombuffer(b"ACGT", np.uint8), n)
                     .tobytes())
    for _ in range(20):  # low-entropy: repeats are common
        n = int(rng.randint(2, 80))
        unit = rng.choice(np.frombuffer(b"ACGT", np.uint8),
                          rng.randint(1, 9)).tobytes()
        cases.append((unit * (n // max(1, len(unit)) + 1))[:n])
    for bases in cases:
        got = repeat_lengths_for_read(bases)
        want = _repeat_lengths_for_read_py(bases)
        assert got.tolist() == want.tolist(), bases
