"""Independent model of the HaplotypeCaller output contract.

This module is the config-3 analog of tests/test_pedantic_external.py's
bit-pattern models: a clean-room implementation of the DOCUMENTED
GATK 4.1 variant-calling math, written only from the published
semantics — the PairHMM (Durbin et al. ch.4; GATK PairHMM docs with the
PCR-conservative gap model, reference: pairhmm.go:88-316), the
genotype-likelihood marginalization (reference: assigngls.go:2102-2145),
the GATK 4.1 AlleleFrequencyCalculator ("newQual" model, Dirichlet
pseudocount EM; reference: assigngls.go:652-830), the exact-permutation
Mann-Whitney U (reference: assigngls.go:1253-1358), and the Fisher/SOR
strand annotations (reference: assigngls.go:1360-1460).  It shares NO
code with elprep_tpu — the package computes likelihoods with an f32
anti-diagonal wavefront (Pallas) plus f64 rescue, marginalizes in
columnar batches, and formats through its own writers; this model is
straight row-major f64 with exact arithmetic where it matters.

test_hc_golden.py uses it to pin the hc_golden fixture's VCF output —
every PL, QUAL, GQ and annotation — to numbers derivable from the
documented model alone, with explicit margins to the integer/decimal
rounding boundaries so f32-vs-f64 drift cannot silently flip a value.

Model constants (all documented):
  - base mismatch probability eps = 10^(-q/10), tri-state prior eps/3
  - quals capped at MAPQ; q < 18 -> 6  (pairhmm.go:77-86)
  - per-base gap-open quality = PCR-conservative table indexed by the
    tandem-repeat length at the base (units up to 8 bp, counted
    backward+forward, capped at 20); the final read base uses the
    no-info default 45  (pairhmm.go:88-162)
  - gap continuation 10 (prob 0.1); indel->match 0.9
  - global read mismapping rate 45: per read, every haplotype
    likelihood is raised to >= (best NON-reference haplotype) - 4.5
    (pairhmm.go:297-316)
  - AF prior pseudocounts: ref = heterozygosity/stddev^2 = 0.001/1e-4
    = 10; alt = heterozygosity(indel 1.25e-4) * ref for alleles of
    length <= 1 or symbolic, else SNP heterozygosity 1e-3 * ref
    (assigngls.go:652-690); EM stops when every expected allele count
    moves <= 0.1
"""

from __future__ import annotations

import math
from decimal import ROUND_HALF_UP, Decimal
from typing import List, Sequence, Tuple

import numpy as np

GOP_BY_REPEAT_LENGTH = [40, 40, 40, 40, 39, 39, 39, 39, 39, 38, 38, 38,
                        37, 37, 37, 36, 36, 35, 34, 33, 33]
GAP_CONTINUATION = 0.1
INDEL_TO_MATCH = 0.9
MISMAPPING_CAP = 4.5            # Q45 global read mismapping rate
LOG10_2 = math.log10(2.0)


# ---------------------------------------------------------------------------
# PCR-conservative tandem-repeat gap model (pairhmm.go:88-162)
# ---------------------------------------------------------------------------


def _n_fwd(unit: str, s: str) -> int:
    n = 0
    while s.startswith(unit):
        n += 1
        s = s[len(unit):]
    return n


def _n_bwd(unit: str, s: str) -> int:
    n = 0
    while s.endswith(unit):
        n += 1
        s = s[:-len(unit)]
    return n


def repeat_length(bases: str, i: int) -> int:
    """Tandem-repeat length at read offset i: the first unit (1..8 bp)
    that repeats >1x backward from i, plus forward repeats of the first
    unit that repeats >1x after i; capped at 20."""
    o1 = i + 1
    max_bw = 0
    best_bw = bases[i:o1]
    for L in range(1, 9):
        if o1 - L < 0:
            break
        unit = bases[o1 - L:o1]
        max_bw = _n_bwd(unit, bases[:o1])
        if max_bw > 1:
            best_bw = unit
            break
    mrl = max_bw
    if o1 < len(bases):
        max_fw = 0
        best_fw = bases[o1:o1 + 1]
        for L in range(1, 9):
            if o1 + L > len(bases):
                break
            unit = bases[o1:o1 + L]
            max_fw = _n_fwd(unit, bases[o1:])
            if max_fw > 1:
                best_fw = unit
                break
        if best_fw != best_bw:
            max_bw = _n_bwd(best_fw, bases[:o1])
        mrl = max_fw + max_bw
    return min(mrl, 20)


# ---------------------------------------------------------------------------
# PairHMM (Durbin et al. ch.4, GATK parameterization) — row-major f64
# ---------------------------------------------------------------------------


def pairhmm_log10(read: str, quals: Sequence[int], hap: str,
                  mapq: int = 60) -> float:
    """log10 P(read | haplotype): 3-state pair HMM, free start/end over
    the haplotype (initial mass 1/len(hap) in the deletion row; summed
    over match+insert in the final read row)."""
    lr, lh = len(read), len(hap)
    q = np.minimum(np.asarray(quals, np.int64), mapq)
    q = np.where(q < 18, 6, q)
    eps = 10.0 ** (-q / 10.0)
    m2i = np.empty(lr)
    for i in range(lr):
        gop = 45.0 if i == lr - 1 else GOP_BY_REPEAT_LENGTH[repeat_length(read, i)]
        m2i[i] = 10.0 ** (-gop / 10.0)
    m2m = 1.0 - 2.0 * m2i
    xi, gm = GAP_CONTINUATION, INDEL_TO_MATCH
    hapv = np.frombuffer(hap.encode(), np.uint8)
    readv = np.frombuffer(read.encode(), np.uint8)
    M = np.zeros(lh + 1)
    I = np.zeros(lh + 1)
    D = np.full(lh + 1, 1.0 / lh)
    D[0] = 1.0 / lh  # row 0: deletion mass everywhere (free start)
    for i in range(1, lr + 1):
        prior = np.where(hapv == readv[i - 1], 1.0 - eps[i - 1], eps[i - 1] / 3.0)
        Mn = np.zeros(lh + 1)
        Mn[1:] = prior * (m2m[i - 1] * M[:-1] + gm * (I[:-1] + D[:-1]))
        In = m2i[i - 1] * M + xi * I
        In[0] = 0.0
        Dn = np.zeros(lh + 1)
        for j in range(1, lh + 1):  # exact sequential recurrence
            Dn[j] = m2i[i - 1] * Mn[j - 1] + xi * Dn[j - 1]
        M, I, D = Mn, In, Dn
    return math.log10(M[1:].sum() + I[1:].sum())


def cap_to_best_nonref(hap_liks: List[List[float]],
                       hap_is_ref: List[bool]) -> List[List[float]]:
    """Global read mismapping cap: per read, raise every haplotype
    likelihood to >= max over NON-reference haplotypes - 4.5."""
    n_haps = len(hap_liks)
    n_reads = len(hap_liks[0])
    out = [list(col) for col in hap_liks]
    for r in range(n_reads):
        best = max(hap_liks[h][r] for h in range(n_haps) if not hap_is_ref[h])
        cap = best - MISMAPPING_CAP
        for h in range(n_haps):
            out[h][r] = max(hap_liks[h][r], cap)
    return out


def nonref_liks(ref_l: List[float], alt_l: List[float]) -> List[float]:
    """<NON_REF> likelihood per read: the median of the allele
    likelihoods strictly below the read's best (for two real alleles:
    the worse one)."""
    out = []
    for a, b in zip(ref_l, alt_l):
        best = max(a, b)
        qual = sorted(v for v in (a, b) if v < best)
        if not qual:
            out.append(float("nan"))
        elif len(qual) == 1:
            out.append(qual[0])
        else:
            out.append(qual[0] + 0.5 * (qual[1] - qual[0]))
    return out


# ---------------------------------------------------------------------------
# Genotyping (assigngls.go:2102-2145) + newQual AF model (652-830)
# ---------------------------------------------------------------------------

# diploid genotype order over alleles (0=ref, 1=alt, 2=<NON_REF>)
GENOTYPES_3 = [(0, 0), (0, 1), (1, 1), (0, 2), (1, 2), (2, 2)]
GENOTYPES_2 = [(0, 0), (0, 1), (1, 1)]


def genotype_pls(allele_liks: List[List[float]],
                 genotypes: List[Tuple[int, int]]) -> Tuple[List[int], List[float]]:
    """(rounded normalized PLs, raw -10*(GL - maxGL)) for a diploid
    sample: GL(a,b) = sum_r log10((L(r|a) + L(r|b)) / 2)."""
    n_reads = len(allele_liks[0])
    gls = []
    for a, b in genotypes:
        if a == b:
            gls.append(sum(allele_liks[a]))
        else:
            gls.append(sum(
                math.log10((10.0 ** allele_liks[a][r] + 10.0 ** allele_liks[b][r]) / 2.0)
                for r in range(n_reads)))
    m = max(gls)
    raw = [-10.0 * (g - m) for g in gls]
    return [round(v) for v in raw], raw


def af_qual(pls: List[int], n_alleles: int = 3,
            heterozygosity: float = 1e-3, het_stddev: float = 1e-2,
            indel_heterozygosity: float = 1.25e-4,
            alt_is_len1_or_symbolic: bool = True) -> Tuple[float, List[int]]:
    """GATK 4.1 AlleleFrequencyCalculator: EM over expected allele
    counts with Dirichlet pseudocount priors; returns
    (QUAL = -10*log10 posterior(AC=0), MLE alt allele counts).
    Genotype likelihoods enter as the ROUNDED PLs / -10 (the emitted
    contract; assigngls.go:663-668)."""
    ref_pc = heterozygosity / het_stddev ** 2
    alt_h = indel_heterozygosity if alt_is_len1_or_symbolic else heterozygosity
    pcs = [ref_pc] + [alt_h * ref_pc] * (n_alleles - 1)
    genotypes = GENOTYPES_3 if n_alleles == 3 else GENOTYPES_2
    gls = [p / -10.0 for p in pls]
    f = [math.log10(1.0 / n_alleles)] * n_alleles
    ac = None
    while True:
        pri = [(2 * f[a] if a == b else LOG10_2 + f[a] + f[b])
               for a, b in genotypes]
        post = [g + p for g, p in zip(gls, pri)]
        mx = max(post)
        norm = mx + math.log10(sum(10.0 ** (p - mx) for p in post))
        post = [p - norm for p in post]
        n = [0.0] * n_alleles
        for (a, b), p in zip(genotypes, post):
            w = 10.0 ** p
            if a == b:
                n[a] += 2 * w
            else:
                n[a] += w
                n[b] += w
        done = ac is not None and max(abs(x - y) for x, y in zip(n, ac)) <= 0.1
        ac = n
        tot = sum(p + c for p, c in zip(pcs, n))
        f = [math.log10((p + c) / tot) for p, c in zip(pcs, n)]
        if done:
            break
    pri = [(2 * f[a] if a == b else LOG10_2 + f[a] + f[b]) for a, b in genotypes]
    post = [g + p for g, p in zip(gls, pri)]
    mx = max(post)
    norm = mx + math.log10(sum(10.0 ** (p - mx) for p in post))
    qual = -10.0 * (post[0] - norm)
    mle = [int(round(c)) for c in ac[1:]]
    return qual, mle


# ---------------------------------------------------------------------------
# Annotations
# ---------------------------------------------------------------------------


def mann_whitney_z(alts: Sequence[float], refs: Sequence[float]) -> float:
    """Exact-permutation Mann-Whitney U z-score for small samples
    (n1, n2 < 10): midranks, U from alt rank sum, two-sided mid-p
    converted through the normal quantile (assigngls.go:1253-1358)."""
    import itertools

    n1, n2 = len(alts), len(refs)
    vals = list(alts) + list(refs)
    order = sorted(range(n1 + n2), key=lambda k: vals[k])
    ranks = [0.0] * (n1 + n2)
    i = 0
    while i < len(order):
        j = i
        while j + 1 < len(order) and vals[order[j + 1]] == vals[order[i]]:
            j += 1
        mid = (i + j) / 2.0 + 1.0
        for k in range(i, j + 1):
            ranks[order[k]] = mid
        i = j + 1
    u = sum(ranks[:n1]) - n1 * (n1 + 1) / 2.0
    # exact permutation histogram of U over all labelings
    counts: dict = {}
    rank_arr = ranks
    total = 0
    for combo in itertools.combinations(range(n1 + n2), n1):
        uu = sum(rank_arr[k] for k in combo) - n1 * (n1 + 1) / 2.0
        key = round(2 * uu)
        counts[key] = counts.get(key, 0) + 1
        total += 1
    u2 = round(2 * u)
    smaller = counts.get(u2, 0) / 2.0 + sum(
        c for k, c in counts.items() if k < u2)
    p = smaller / total
    # z = sqrt(2) * erfinv(2p - 1) = standard normal quantile of p
    from statistics import NormalDist

    return NormalDist().inv_cdf(p)


def sor(ref_fw: int, ref_rv: int, alt_fw: int, alt_rv: int) -> float:
    """Symmetric odds ratio (StrandOddsRatio): ln of the symmetrized
    pseudocounted ratio times the ref/alt read-balance correction."""
    r = (ref_fw + 1.0) * (alt_rv + 1.0) / ((ref_rv + 1.0) * (alt_fw + 1.0))
    sym = r + 1.0 / r
    ref_ratio = (min(ref_fw, ref_rv) + 1.0) / (max(ref_fw, ref_rv) + 1.0)
    alt_ratio = (min(alt_fw, alt_rv) + 1.0) / (max(alt_fw, alt_rv) + 1.0)
    return math.log(sym) + math.log(ref_ratio) - math.log(alt_ratio)


def excess_het_single_het_sample() -> float:
    """ExcessHet for one diploid het sample: phred of the one-sided
    exact Hardy-Weinberg p-value = -10 log10(0.5)."""
    return -10.0 * math.log10(0.5)


def mq_rms(mapqs: Sequence[int]) -> float:
    return math.sqrt(sum(m * m for m in mapqs) / len(mapqs))


def formatf(value: float, digits: int) -> str:
    """Java %.Nf — HALF_UP on the shortest decimal representation (same
    external model as test_pedantic_external.py)."""
    return str(Decimal(repr(value)).quantize(
        Decimal(1).scaleb(-digits), rounding=ROUND_HALF_UP))


# ---------------------------------------------------------------------------
# GVCF reference-band model (ref-confidence.go:112-373)
# ---------------------------------------------------------------------------

SNP_PL_HET_PER_READ = -10.0 * math.log10(((1.0 - 1e-4) + 1e-4 / 3.0) / 2.0)
SNP_PL_HOM_PER_READ = -10.0 * math.log10(1e-4 / 3.0)
# indel model per informative read (Q45 no-indel vs indel, diploid)
_NO_INDEL = math.log10(1.0 - 10.0 ** -4.5)
_INDEL = -4.5
INDEL_PL_HET_PER_READ = -10.0 * (math.log10((10.0 ** _NO_INDEL + 10.0 ** _INDEL) / 2.0))
INDEL_PL_HOM_PER_READ = -10.0 * (math.log10((10.0 ** _INDEL * 2.0) / 2.0))


def band_pls(n_snp_reads: int, n_indel_informative: int) -> Tuple[int, List[int]]:
    """Per-position hom-ref (GQ, [PL0, PL1, PL2]) for clean Q40 matching
    reads: the SNP model over the pileup vs the indel model over
    indel-informative reads; the reported PLs are whichever model has
    the LOWER INTEGER GQ (ties keep the SNP model).

    Indel informativeness (readHasNoPlausibleIndelsOfMaxIndelSize,
    ref-confidence.go:137-200) specializes, for gapless exact-match
    reads over a repeat-free reference, to pure span arithmetic: every
    size<=10 alternative alignment mismatches immediately, so a read is
    informative at p exactly when it covers p with >= 10 bases of
    aligned reference after it (read_end - p >= 10)."""
    snp = [0,
           round(SNP_PL_HET_PER_READ * n_snp_reads),
           round(SNP_PL_HOM_PER_READ * n_snp_reads)]
    ind = [0,
           round(INDEL_PL_HET_PER_READ * n_indel_informative),
           round(INDEL_PL_HOM_PER_READ * n_indel_informative)]
    pls = ind if ind[1] < snp[1] else snp
    return pls[1], pls
