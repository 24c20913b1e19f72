"""Direct unit tests for hc/genotyping.py: annotations (ExcessHet,
FS/SOR, rank sums, QD), phasing, and the deletions side channel
(reference: filters/assigngls.go:1102-1924).

Expected values are computed INDEPENDENTLY in the tests (math.comb /
brute-force enumerations / externally known constants), not by
transliterating the implementation."""

import math

import numpy as np
import pytest

from elprep_tpu.hc import genotyping as G
from elprep_tpu.hc.assembly import Haplotype
from elprep_tpu.io.vcf import Genotype, Variant


# ---------------------------------------------------------------------------
# ExcessHet exact test
# ---------------------------------------------------------------------------


def _hw_exact_prob(n_ab, n_a, n):
    """Independent Hardy-Weinberg exact probability of n_ab hets among n
    diploid samples with n_a copies of the rare allele (Wigginton et al.
    2005, the distribution underlying GATK's ExcessHet)."""
    n_aa = (n_a - n_ab) // 2
    n_bb = n - n_aa - n_ab
    n_b = 2 * n - n_a
    return (math.factorial(n) / (math.factorial(n_aa) * math.factorial(n_ab) * math.factorial(n_bb))
            * 2 ** n_ab
            * math.factorial(n_a) * math.factorial(n_b) / math.factorial(2 * n))


def test_exact_test_single_het_sample():
    # one het sample: rare_copies = 1 -> p = 0.5 (the reference's early
    # exit), so ExcessHet = -10*log10(0.5) = 3.0103
    assert G.exact_test(1, 0, 0) == 0.5
    assert abs(-10 * math.log10(G.exact_test(1, 0, 0)) - 3.0103) < 1e-3


def test_exact_test_matches_independent_hw_distribution():
    # het=2, ref=2, hom=1: rare copies = 4, n = 5 samples.
    # p(right tail, mid-p) = P(het>obs) + P(het==obs)/2 under HW exact.
    het, ref, hom = 2, 2, 1
    n = het + ref + hom
    n_a = 2 * min(ref, hom) + het
    support = [h for h in range(n_a + 1) if (n_a - h) % 2 == 0 and
               (n_a - h) // 2 + h <= n]
    probs = {h: _hw_exact_prob(h, n_a, n) for h in support}
    total = sum(probs.values())
    expected = (probs[het] / 2 + sum(p for h, p in probs.items() if h > het)) / total
    got = G.exact_test(het, ref, hom)
    assert abs(got - expected) < 1e-9


def test_calculate_eh_het_call():
    v = Variant(chrom="c", pos=10, ref="A", alt=["T"],
                genotypes=[Genotype(gt=[0, 1], data={"PL": [40, 0, 45]})])
    # GLs strongly favoring het: counts (0, 1, 0) -> p = 0.5 -> 3.0103
    gls = [-4.0, 0.0, -4.5]
    assert abs(G.calculate_eh(v, gls) - 3.0103) < 1e-3


# ---------------------------------------------------------------------------
# erf_inv / binomial / hypergeometric building blocks
# ---------------------------------------------------------------------------


def test_erf_inv_round_trip():
    for x in (0.0, 0.1, -0.3, 0.5, 0.9, -0.99, 0.999999):
        assert abs(math.erf(G.erf_inv(x)) - x) < 1e-12
    # known constant: erf_inv(0.5)
    assert abs(G.erf_inv(0.5) - 0.4769362762044699) < 1e-12


def test_log_binomial_probability_exact():
    for x, n, p in ((2, 5, 0.3), (0, 7, 0.05), (7, 7, 0.9), (13, 40, 0.31)):
        expected = math.log(math.comb(n, x) * p ** x * (1 - p) ** (n - x))
        got = G.log_binomial_probability(x, n, p, 1 - p)
        assert abs(got - expected) < 1e-10, (x, n, p)


def test_hypergeometric_log_probability_exact():
    # P(X = x) = C(K, x) C(N-K, k-x) / C(N, k)
    N, K, k = 12, 5, 6
    dist = G.HypergeometricDistribution(N, K, k)
    for x in range(0, min(K, k) + 1):
        expected = math.log(math.comb(K, x) * math.comb(N - K, k - x) / math.comb(N, k))
        assert abs(dist.log_probability(x) - expected) < 1e-10, x


# ---------------------------------------------------------------------------
# Mann-Whitney U rank sum (incl. tie handling)
# ---------------------------------------------------------------------------


def test_rank_sum_all_tied_is_zero():
    t = G.RankSumTest()
    t.alts = [20.0, 20.0]
    t.refs = [20.0, 20.0]
    z, ok = t.mann_whitney_u()
    assert ok and z == 0.0


def test_rank_sum_exact_small_sample_brute_force():
    # exact permutation path (n1, n2 < 10): verify p against a
    # brute-force enumeration of all C(4,2) labelings
    from itertools import combinations

    alts, refs = [1.0, 2.0], [3.0, 4.0]
    values = sorted(alts + refs)
    ranks = {v: i + 1 for i, v in enumerate(values)}  # no ties here
    u_obs = sum(ranks[v] for v in alts) - 2 * 3 // 2
    us = []
    for combo in combinations(range(4), 2):
        u = sum(ranks[values[i]] for i in combo) - 3
        us.append(u)
    p = (sum(1 for u in us if u < u_obs) + sum(1 for u in us if u == u_obs) / 2) / len(us)
    expected_z = math.sqrt(2) * G.erf_inv(2 * p - 1)
    t = G.RankSumTest()
    t.alts = list(alts)
    t.refs = list(refs)
    z, ok = t.mann_whitney_u()
    assert ok
    assert abs(z - expected_z) < 1e-6


def test_rank_sum_sign_flips_with_groups():
    t1 = G.RankSumTest()
    t1.alts = [1.0, 2.0, 3.0]
    t1.refs = [4.0, 5.0, 6.0]
    z1, _ = t1.mann_whitney_u()
    t2 = G.RankSumTest()
    t2.alts = [4.0, 5.0, 6.0]
    t2.refs = [1.0, 2.0, 3.0]
    z2, _ = t2.mann_whitney_u()
    assert z1 < 0 < z2
    assert abs(z1 + z2) < 1e-6


def test_rank_sum_normal_approx_with_ties():
    # n1 >= 10 takes the normal approximation with tie correction;
    # verify against the standard formula computed independently
    alts = [10.0] * 6 + [12.0] * 4
    refs = [10.0] * 4 + [14.0] * 8
    both = sorted(alts + refs)
    # average ranks with ties (float64 is fine for the expectation here;
    # the implementation's float32 accumulation stays within tolerance)
    rank_of = {}
    i = 0
    while i < len(both):
        j = i
        while j < len(both) and both[j] == both[i]:
            j += 1
        rank_of[both[i]] = (i + 1 + j) / 2
        i = j
    n1, n2 = len(alts), len(refs)
    r1 = sum(rank_of[v] for v in alts)
    u = r1 - n1 * (n1 + 1) / 2
    nties = sum((c := both.count(v)) ** 3 - c for v in set(both))
    m = n1 * n2 / 2
    sigma = math.sqrt((n1 * n2 / 12) * ((n1 + n2 + 1) - nties / ((n1 + n2) * (n1 + n2 - 1))))
    expected = (u - m - (-0.5 if nties else 0.0)) / sigma
    t = G.RankSumTest()
    t.alts = list(alts)
    t.refs = list(refs)
    z, ok = t.mann_whitney_u()
    assert ok
    assert abs(z - expected) < 1e-4


# ---------------------------------------------------------------------------
# FS / SOR strand bias
# ---------------------------------------------------------------------------


def test_sor_balanced_table():
    # perfectly balanced strands: ratio = 2, both strand ratios 1 ->
    # SOR = ln 2
    assert abs(G.compute_sor((2, 2, 2, 2)) - math.log(2.0)) < 1e-12


def test_sor_known_asymmetric():
    # refFwd=10, refRev=0, altFwd=0, altRev=10 (maximal strand bias):
    # t = (11,1,1,11); ratio = 121 + 1/121; refRatio = altRatio = 1/11
    expected = math.log(121 + 1 / 121.0)
    assert abs(G.compute_sor((10, 0, 0, 10)) - expected) < 1e-12


def test_fs_small_table_exact():
    # table refFwd=2 refRev=0 altFwd=0 altRev=2: margins (2,2)x(2,2);
    # hypergeometric probs 1/6, 4/6, 1/6 -> two-sided p = 1/3
    expected = -10 * math.log10(1 / 3)
    assert abs(G.compute_fs((2, 0, 0, 2)) - expected) < 1e-9


def test_fs_tiny_or_balanced():
    assert G.compute_fs((1, 1, 0, 0)) == 0.0  # total <= 2
    # most-probable observed table includes every table -> p = 1 -> 0
    assert abs(G.compute_fs((2, 2, 2, 2))) < 1e-9


def test_fix_too_high_qd():
    assert G.fix_too_high_qd(17.3) == 17.3
    assert G.fix_too_high_qd(34.99) == 34.99
    # fixed_high_qd variant clamps to 30 (fixed-max-qd.go:25-30)
    assert G.fix_too_high_qd(35.1) == 30.0
    assert G.fix_too_high_qd(80.0) == 30.0


# ---------------------------------------------------------------------------
# Deletions side channel
# ---------------------------------------------------------------------------


def test_deletion_covering_and_expiry():
    d = G.DeletionsHandler([(100, 110)])
    snp_inside = Variant(chrom="c", pos=105, ref="A", alt=["T"])
    assert G.is_vc_covered_by_deletion(d, snp_inside)
    assert d.slice == [(100, 110)]  # still active
    # a variant AT the deletion start is not "covered"
    at_start = Variant(chrom="c", pos=100, ref="A", alt=["T"])
    assert not G.is_vc_covered_by_deletion(G.DeletionsHandler([(100, 110)]), at_start)
    # expired deletions are dropped as the scan passes them
    d2 = G.DeletionsHandler([(100, 110)])
    past = Variant(chrom="c", pos=200, ref="A", alt=["T"])
    assert not G.is_vc_covered_by_deletion(d2, past)
    assert d2.slice == []


# ---------------------------------------------------------------------------
# Physical phasing (PGT/PID/PS)
# ---------------------------------------------------------------------------


def _call(pos, ref, alt, gt=(0, 1)):
    return Variant(chrom="c", pos=pos, ref=ref, alt=[alt],
                   genotypes=[Genotype(gt=list(gt))])


def _hap(events):
    h = Haplotype(bases=b"ACGT", location=1, cigar=[(4, "M")], is_ref=False)
    h.events = events
    return h


def test_phasing_cis_pair():
    # both alt alleles on haplotype 1, none on haplotype 0 -> 0|1 / 0|1
    calls = [_call(100, "A", "T"), _call(150, "G", "C")]
    h0 = _hap([])
    h1 = _hap([Variant(chrom="c", pos=100, ref="A", alt=["T"]),
               Variant(chrom="c", pos=150, ref="G", alt=["C"])])
    hmap = G.construct_haplotype_mapping(calls, [h0, h1])
    assert hmap == {0: {1}, 1: {1}}
    mapping, count = G.construct_phase_set_mapping(calls, hmap, 2)
    assert count == 1
    G.construct_phase_groups(calls, mapping, count)
    for c in calls:
        g = c.genotypes[0]
        assert g.phased
        assert g.data["PGT"] == "0|1"
        assert g.data["PID"] == "100_A_T"
        assert g.data["PS"] == 100


def test_phasing_trans_pair():
    # alt of call0 on hap0, alt of call1 on hap1 (disjoint, covering all
    # haplotypes) -> 0|1 and 1|0, het GT order swapped for the second
    calls = [_call(100, "A", "T"), _call(150, "G", "C")]
    h0 = _hap([Variant(chrom="c", pos=100, ref="A", alt=["T"])])
    h1 = _hap([Variant(chrom="c", pos=150, ref="G", alt=["C"])])
    hmap = G.construct_haplotype_mapping(calls, [h0, h1])
    mapping, count = G.construct_phase_set_mapping(calls, hmap, 2)
    assert count == 1
    G.construct_phase_groups(calls, mapping, count)
    assert calls[0].genotypes[0].data["PGT"] == "0|1"
    assert calls[1].genotypes[0].data["PGT"] == "1|0"
    assert calls[1].genotypes[0].gt == [1, 0]
    assert calls[0].genotypes[0].data["PS"] == calls[1].genotypes[0].data["PS"] == 100


def test_phasing_non_biallelic_excluded():
    tri = Variant(chrom="c", pos=100, ref="A", alt=["T", "G"],
                  genotypes=[Genotype(gt=[1, 2])])
    calls = [tri, _call(150, "G", "C")]
    hmap = G.construct_haplotype_mapping(calls, [_hap([]), _hap([])])
    assert hmap[0] == set()
    mapping, count = G.construct_phase_set_mapping(calls, hmap, 2)
    assert mapping == {} and count == 0


# ---------------------------------------------------------------------------
# Genotype likelihood helpers
# ---------------------------------------------------------------------------


def test_find_best_alleles():
    # GLs over 3 alleles (6 diploid genotypes): best = index of max
    gls = [-10.0, -1.0, -20.0, -3.0, -0.5, -30.0]  # best is idx 4 (alleles 1,2)
    first, second, best = G.find_best_alleles(3, gls)
    assert best == 4
    assert {first, second} == {1, 2}


def test_compute_diploid_genotype_counts_biallelic():
    v = Variant(chrom="c", pos=1, ref="A", alt=["T"],
                genotypes=[Genotype(gt=[0, 1], data={"PL": [30, 0, 40]})])
    # ref prob ~ 10^-3, het ~ 1, hom ~ 10^-4 -> counts (0, 1, 0)
    ref, het, hom = G.compute_diploid_genotype_counts(v, [-3.0, 0.0, -4.0])
    assert (ref, het, hom) == (0, 1, 0)


# ---------------------------------------------------------------------------
# Spanning-deletion e2e through the driver (DeletionsHandler consumed at
# genotype time; the overlapped site gets the '*' allele,
# assigngls.go:830-879)
# ---------------------------------------------------------------------------


def test_spanning_deletion_star_allele():
    from elprep_tpu.core.header import Header
    from elprep_tpu.filters.clipping import ClipRead
    from elprep_tpu.hc import driver
    from elprep_tpu.hc.activity import make_hc_params

    rng = np.random.RandomState(11)
    bases = np.frombuffer(b"ACGT", np.uint8)
    ref = rng.choice(bases, 2000).tobytes()
    # haplotype A: 12 bp deletion after pos 1000 (1-based)
    hap_del = ref[:1000] + ref[1012:]
    # haplotype B: SNP inside the deleted span, at 1-based pos 1006
    sub = b"A" if ref[1005:1006] != b"A" else b"C"
    hap_snp = ref[:1005] + sub + ref[1006:]

    reads = []
    for i in range(60):
        hap = hap_del if i % 2 == 0 else hap_snp
        start = 880 + (i * 4) % 120
        seq = hap[start : start + 130]
        flag = 0x63 if i % 2 == 0 else 0x93
        reads.append(ClipRead(
            flag=flag, pos=start + 1, pnext=start + 151,
            tlen=300 if i % 2 == 0 else -300, mapq=60,
            cigar=[(len(seq), "M")], seq=seq, qual=b"$" * len(seq) if False else bytes([35]) * len(seq),
            rname=b"chr1", rnext=b"=", qname=b"sd%04d" % i))
    reads.sort(key=lambda r: r.pos)
    hdr = Header()
    hdr.sq = [{"SN": "chr1", "LN": str(len(ref))}]
    params = make_hc_params("NONE", command_line="t")
    _, variants = driver.call_variants(
        params, hdr, {"chr1": reads}, lambda c: ref,
        sample_name="s1", use_device_pairhmm=False)
    dels = [v for v in variants if v.pos == 1000 and len(v.ref) > len(v.alt[0])]
    assert dels, [(v.pos, v.ref, v.alt) for v in variants]
    spanned = [v for v in variants if "*" in v.alt]
    assert spanned, "expected a spanning-deletion '*' allele at the SNP site: %r" % [
        (v.pos, v.ref, v.alt) for v in variants]
    assert any(v.pos == 1006 for v in spanned)


def test_formatf_matches_go_strconv_vectors():
    """formatf == Go strconv.FormatFloat(v, 'f', p, 64) on adversarial
    vectors (unpedantic.go:38-41). Both produce the unique correctly-
    rounded decimal rendering of the binary double, so these expected
    strings are what a Go build prints: half-to-even ties on the BINARY
    value (2.675 is really 2.67499...), negative zero, the exact
    expansion of 0.1 at 20 digits, huge magnitudes without exponent."""
    vectors = [
        (0.125, 2, "0.12"),            # binary-exact tie -> even
        (0.375, 2, "0.38"),            # binary-exact tie -> even
        (2.675, 2, "2.67"),            # looks like a tie, binary is below
        (9.995, 2, "9.99"),
        (-0.0, 3, "-0.000"),
        (0.1, 20, "0.10000000000000000555"),
        (1e21, 2, "1000000000000000000000.00"),
        (-1.5, 0, "-2"),
        (2.5, 0, "2"),
        (35.25, 3, "35.250"),
        (1.0000000000000002, 16, "1.0000000000000002"),
        (float("nan"), 2, "NaN"),
        (float("inf"), 2, "+Inf"),
        (float("-inf"), 2, "-Inf"),
    ]
    for v, p, expected in vectors:
        assert G.formatf(v, p) == expected, (v, p)


def test_randomized_qd_flag():
    G.set_randomized_qd(True)
    try:
        vals = {G.fix_too_high_qd(40.0) for _ in range(8)}
        assert len(vals) > 1  # jittered
        assert all(15.0 < v < 45.0 for v in vals)  # 30 +/- 3sigma-ish
        assert G.fix_too_high_qd(20.0) == 20.0  # below threshold untouched
    finally:
        G.set_randomized_qd(False)
    assert G.fix_too_high_qd(40.0) == 30.0
