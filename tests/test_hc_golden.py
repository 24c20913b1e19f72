"""Externally grounded HaplotypeCaller golden (BASELINE config 3).

The fixture (tests/fixtures/hc_golden.*, generator hc_golden_gen.py) is
a 600 bp repeat-free reference with 16 clean Q40/MAPQ60 40M reads
engineered so every number in the VCF output is derivable from the
documented GATK 4.1 model alone (tests/hc_external_model.py — a
clean-room f64 implementation sharing no code with elprep_tpu):

* het SNP chr1:201 A>C — 4 ref reads / 4 alt reads at staggered starts
  170..198 (alt on odd starts), read offsets chosen so the ReadPos
  rank-sum is exactly symmetric (z = 0.000);
* het 3 bp deletion of ref[402..404] — left-aligned by the caller to
  chr1:399 CACA>C, 4 ref / 4 alt (18M3D22M-style) reads at starts
  370..398.

The test pins three layers:

1. BYTE level: both run modes reproduce the committed expected files
   (only the ##elPrepCommandLine meta line is masked — it embeds paths).
2. MODEL level: the independent model recomputes, from the documented
   semantics, every field of both variant records — PL (3- and
   6-genotype), QUAL, GQ, GT, AD, DP, MQ, RAW_MQandDP, all three
   rank sums, SOR, FS, QD, ExcessHet, MLEAC/MLEAF, AC/AF/AN — and the
   clean GVCF reference bands (DP / MIN_DP / GQ / PL with the
   SNP-vs-indel-informative crossover), asserting they equal the
   committed fixture values.
3. MARGIN level: every rounded integer/decimal the model predicts is
   asserted to sit a safe distance from its rounding boundary, so the
   package's f32 wavefront (vs the model's f64) cannot silently flip a
   value; and the PairHMM-derived PLs are asserted invariant across
   assembly-window paddings 60..120, proving the hand-derivation does
   not depend on the region-trimming details.

Hand-derivation highlights (full math in hc_external_model.py):

  ReadPosRankSum(SNP): distance-from-nearer-read-end transform of the
    variant offsets gives ref {8,16,15,7} / alt {12,19,11,3}; the alt
    rank sum is 18 -> U = 8 = n1*n2/2 -> exact mid-p = 0.5 -> z = 0.
  ReadPosRankSum(DEL): offsets at the left-aligned POS 399 transform to
    ref {10,18,13,5} / alt {14,17,9,1}; U = 7; the exact 4x4
    permutation distribution gives mid-p = 27.5/70 -> z = -0.2718.
  SOR: contingency (4,0,4,0) -> ln((5*1)/(1*5) + (1*5)/(5*1)) = ln 2.
  QD: QUAL/8 -> 145.60/8 = 18.20 ; 148.60/8 = 18.575 -> HALF_UP 18.58.
  Bands: clean-position hom-ref PLs are per-read constants
    (het 3.0103, hom 44.77 for Q40; 3.0088/45.0 for the Q45 indel
    model), the indel model over reads with read_end - pos >= 10;
    blocks report min PL / min GQ / median DP over their span.
"""

import gzip
import math
import os

import pytest

import hc_external_model as model
from elprep_tpu import cli

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")

SNP_POS, SNP_REF, SNP_ALT = 201, "A", "C"
DEL_POS = 401             # anchor of the engineered deletion (402-404)
DEL_VCF_POS = 399         # left-aligned VCF position (CACA > C)
SNP_STARTS = [170, 174, 178, 182, 186, 190, 194, 198]   # odd index = alt
DEL_STARTS = [366, 374, 378, 382, 386, 390, 394, 398]   # odd index = del
READ_LEN = 40
Q = [40] * READ_LEN

# assembly regions the caller derives (activity profile over the two
# variant sites; spans captured once via --assembly-regions and held
# fixed here only to CENTER the windows — the window-robustness sweep
# below proves the derived numbers do not depend on their exact bounds)
SNP_REGION = (164, 238)
DEL_REGION = (355, 451)


def _ref_seq():
    with open(os.path.join(FIXTURES, "hc_golden.ref.fasta")) as fh:
        return fh.read().split("\n")[1]


def _mask(data: bytes) -> bytes:
    return b"\n".join(
        b"##elPrepCommandLine=<masked>" if l.startswith(b"##elPrepCommandLine")
        else l for l in data.split(b"\n"))


def _run(tmp_path, mode: str) -> bytes:
    out_vcf = str(tmp_path / ("out_%s.vcf" % mode))
    rc = cli.main([
        "filter", os.path.join(FIXTURES, "hc_golden.in.sam"),
        str(tmp_path / ("out_%s.sam" % mode)),
        "--reference", str(tmp_path / "ref.elfasta"),
        "--haplotypecaller", out_vcf,
        "--reference-confidence", mode,
    ])
    assert rc == 0
    with open(out_vcf, "rb") as fh:
        return fh.read()


@pytest.fixture(scope="module")
def outputs(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("hc_golden")
    assert cli.main(["fasta-to-elfasta",
                     os.path.join(FIXTURES, "hc_golden.ref.fasta"),
                     str(tmp_path / "ref.elfasta")]) == 0
    return {"NONE": _run(tmp_path, "NONE"), "GVCF": _run(tmp_path, "GVCF")}


def _expected(name: str) -> bytes:
    with open(os.path.join(FIXTURES, name), "rb") as fh:
        return fh.read()


def test_byte_equal_vcf(outputs):
    assert _mask(outputs["NONE"]) == _expected("hc_golden.expected.vcf")


def test_byte_equal_gvcf(outputs):
    assert _mask(outputs["GVCF"]) == _expected("hc_golden.expected.gvcf")


# ---------------------------------------------------------------------------
# model-level derivation
# ---------------------------------------------------------------------------


def _snp_reads(ref):
    reads = []
    for i, s in enumerate(SNP_STARTS):
        seq = ref[s - 1:s - 1 + READ_LEN]
        if i % 2 == 1:
            off = SNP_POS - s
            seq = seq[:off] + SNP_ALT + seq[off + 1:]
        reads.append(seq)
    return reads


def _del_reads(ref):
    reads = []
    for i, s in enumerate(DEL_STARTS):
        if i % 2 == 0:
            reads.append(ref[s - 1:s - 1 + READ_LEN])
        else:
            k = DEL_POS - s + 1
            reads.append(ref[s - 1:s - 1 + k] + ref[s - 1 + k + 3:s - 1 + READ_LEN + 3])
    return reads


def _haps(ref, region, pad, kind):
    lo = max(1, region[0] - pad)
    hi = min(len(ref), region[1] + pad)
    hap_ref = ref[lo - 1:hi]
    if kind == "snp":
        i = SNP_POS - lo
        hap_alt = hap_ref[:i] + SNP_ALT + hap_ref[i + 1:]
    else:
        cut = DEL_POS - lo + 1
        hap_alt = hap_ref[:cut] + hap_ref[cut + 3:]
    return hap_ref, hap_alt


def _derive_case(ref, kind, pad=100):
    reads = _snp_reads(ref) if kind == "snp" else _del_reads(ref)
    hap_ref, hap_alt = _haps(ref, SNP_REGION if kind == "snp" else DEL_REGION,
                             pad, kind)
    lr = [model.pairhmm_log10(r, Q, hap_ref) for r in reads]
    la = [model.pairhmm_log10(r, Q, hap_alt) for r in reads]
    capped = model.cap_to_best_nonref([lr, la], [True, False])
    lrc, lac = capped
    lnc = model.nonref_liks(lrc, lac)
    pl6, raw6 = model.genotype_pls([lrc, lac, lnc], model.GENOTYPES_3)
    pl3, raw3 = model.genotype_pls([lrc, lac], model.GENOTYPES_2)
    qual, mle = model.af_qual(pl6)
    all_capped = all(abs(a - b) > model.MISMAPPING_CAP for a, b in zip(lr, la))
    return {"pl6": pl6, "raw6": raw6, "pl3": pl3, "raw3": raw3,
            "qual": qual, "mle": mle, "all_capped": all_capped}


@pytest.fixture(scope="module")
def derived():
    ref = _ref_seq()
    return {"snp": _derive_case(ref, "snp"), "del": _derive_case(ref, "del")}


def _records(data: bytes):
    out = {}
    for line in data.split(b"\n"):
        if not line or line.startswith(b"#"):
            continue
        f = line.decode().split("\t")
        alt = f[4]
        if alt not in ("<NON_REF>",):
            out[int(f[1])] = f
    return out


def _info(fields):
    return dict(kv.split("=", 1) for kv in fields[7].split(";"))


def _fmt(fields):
    return dict(zip(fields[8].split(":"), fields[9].split(":")))


def test_model_pls_and_qual(outputs, derived):
    vrec = _records(outputs["NONE"])
    grec = _records(outputs["GVCF"])
    for kind, pos, ref_a, alt_a in (("snp", SNP_POS, "A", "C"),
                                    ("del", DEL_VCF_POS, "CACA", "C")):
        d = derived[kind]
        v, g = vrec[pos], grec[pos]
        assert v[3] == ref_a and v[4] == alt_a
        assert g[4] == alt_a + ",<NON_REF>"
        # PL vectors — model-derived integers match the emitted ones
        assert [int(x) for x in _fmt(v)["PL"].split(",")] == d["pl3"]
        assert [int(x) for x in _fmt(g)["PL"].split(",")] == d["pl6"]
        # rounding-margin discipline: every PL must sit >0.03 from its
        # rounding boundary — an order of magnitude above the
        # f32-wavefront-vs-f64 drift (the package's PairHMM is held to
        # the f64 oracle within 5e-4 log10 per pair,
        # tests/test_pairhmm.py). The deletion fixture's first ref read
        # starts at 366 precisely to keep the (ALT,<NON_REF>) genotype
        # clear of the boundary (at 370 it sat 0.007 away).
        for raw in d["raw3"] + d["raw6"]:
            assert abs(raw - round(raw)) < 0.47, raw
        # QUAL formats identically under the Java HALF_UP model, with a
        # margin to the half-cent boundary
        assert v[5] == g[5] == model.formatf(d["qual"], 2)
        cents = d["qual"] * 100
        assert abs(cents - math.floor(cents) - 0.5) > 0.03  # clear of x.xx5
        # GT/GQ: PL(0/1)=0 -> het; GQ = min(99, next-best PL)
        assert _fmt(v)["GT"] == "0/1"
        nxt = sorted(d["pl3"])[1]
        assert int(_fmt(v)["GQ"]) == min(99, nxt)
        # MLEAC/MLEAF from the AF EM expected counts
        assert _info(v)["MLEAC"] == str(d["mle"][0])
        assert _info(g)["MLEAC"] == "%d,%d" % tuple(d["mle"])


def test_model_annotations(outputs):
    vrec = _records(outputs["NONE"])
    v = vrec[SNP_POS]
    info = _info(v)
    fmt = _fmt(v)
    # AD/DP: all 16 reads informative (margins ~4.4 >> 0.2 threshold)
    assert fmt["AD"] == "4,4" and fmt["DP"] == "8" and info["DP"] == "8"
    assert info["AC"] == "1" and info["AN"] == "2" and info["AF"] == "0.500"
    assert info["MQ"] == model.formatf(model.mq_rms([60] * 8), 2) == "60.00"
    assert info["ExcessHet"] == model.formatf(model.excess_het_single_het_sample(), 4) == "3.0103"
    # identical base quals / mapqs -> all midranks tie -> z = 0
    assert info["BaseQRankSum"] == model.formatf(model.mann_whitney_z([40.0] * 4, [40.0] * 4), 3) == "0.000"
    assert info["MQRankSum"] == model.formatf(model.mann_whitney_z([60.0] * 4, [60.0] * 4), 3) == "0.000"
    # ReadPos: offset -> distance-from-nearer-end transform
    def readpos(starts, pos):
        vals = []
        for s in starts:
            off = pos - s
            vals.append(float(READ_LEN - off - 1 if off > READ_LEN // 2 else off))
        return vals
    snp_all = readpos(SNP_STARTS, SNP_POS)
    z = model.mann_whitney_z(snp_all[1::2], snp_all[0::2])
    assert info["ReadPosRankSum"] == model.formatf(z, 3) == "0.000"
    # strand: all-forward contingency (4,0,4,0)
    assert info["SOR"] == model.formatf(model.sor(4, 0, 4, 0), 3) == "0.693"
    assert info["FS"] == "0.000"  # Fisher exact of a one-sided table: p=1
    qual = float(v[5])
    assert info["QD"] == model.formatf(qual / 8.0, 2)

    d = vrec[DEL_VCF_POS]
    dinfo = _info(d)
    del_all = readpos(DEL_STARTS, DEL_VCF_POS)
    z = model.mann_whitney_z(del_all[1::2], del_all[0::2])
    assert dinfo["ReadPosRankSum"] == model.formatf(z, 3) == "0.000"
    assert dinfo["QD"] == model.formatf(float(d[5]) / 8.0, 2) == "18.58"
    assert dinfo["SOR"] == "0.693" and dinfo["FS"] == "0.000"


def test_window_robustness():
    """The PairHMM-derived integers must not depend on the assembly
    window bounds: identical across paddings 60..120 (the 1/hap_len
    initial mass cancels for the SNP and enters the deletion's PLs only
    as log10(L/(L-3)) ~ 0.006 — far inside the rounding margins)."""
    ref = _ref_seq()
    base = {k: _derive_case(ref, k, pad=100) for k in ("snp", "del")}
    for pad in (60, 120):
        for kind in ("snp", "del"):
            d = _derive_case(ref, kind, pad=pad)
            assert d["pl6"] == base[kind]["pl6"], (kind, pad)
            assert model.formatf(d["qual"], 2) == model.formatf(base[kind]["qual"], 2)


def test_model_gvcf_bands(outputs):
    """Clean reference-band rows derive from the documented per-position
    model: SNP pileup depth vs indel-informative count (read_end - pos
    >= 10), min PL / min GQ / median DP per block."""
    rows = []
    for line in outputs["GVCF"].split(b"\n"):
        if not line or line.startswith(b"#"):
            continue
        f = line.decode().split("\t")
        if f[4] == "<NON_REF>":
            end = int(_info(f)["END"])
            fmt = _fmt(f)
            rows.append((int(f[1]), end, int(fmt["DP"]), int(fmt["GQ"]),
                         int(fmt["MIN_DP"]), [int(x) for x in fmt["PL"].split(",")]))
    by_start = {r[0]: r for r in rows}

    ends = [s + READ_LEN - 1 for s in SNP_STARTS]

    def counts(pos):
        snp = sum(1 for s, e in zip(SNP_STARTS, ends) if s <= pos <= e)
        ind = sum(1 for s, e in zip(SNP_STARTS, ends) if s <= pos <= e and e - pos >= 10)
        return snp, ind

    def band_over(lo, hi):
        gqs, pls, dps = [], [], []
        for p in range(lo, hi + 1):
            snp, ind = counts(p)
            gq, pl = model.band_pls(snp, ind)
            gqs.append(gq)
            pls.append(pl)
            dps.append(snp)
        dps.sort()
        med = dps[len(dps) // 2]  # upper median (variant-combiner.go)
        return (med, min(gqs), min(dps),
                [min(p[i] for p in pls) for i in range(3)])

    # zero-coverage blocks (whole-span, GQ 0)
    assert by_start[1][:2] == (1, 169) and by_start[1][3] == 0
    assert by_start[228][:2] == (228, 365) and by_start[228][5] == [0, 0, 0]
    assert by_start[429][1] == 600 and by_start[429][5] == [0, 0, 0]

    # every SNP-side coverage block between 170 and 227
    for start, row in sorted(by_start.items()):
        if not (170 <= start <= 227) or start == SNP_POS:
            continue
        lo, hi = row[0], row[1]
        med, gq, mindp, minpl = band_over(lo, hi)
        assert (row[2], row[3], row[4], row[5]) == (med, gq, mindp, minpl), row

    # boundary pin for the crossover: 199 is the last position where
    # s00 (end 209) is still indel-informative (209-199 >= 10)
    assert counts(199) == (8, 8) and counts(200) == (8, 7)
    assert model.band_pls(8, 8) == (24, [0, 24, 358])   # SNP model kept on tied int GQ
    assert model.band_pls(8, 7) == (21, [0, 21, 315])   # indel model takes over
