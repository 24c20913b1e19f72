"""Externally grounded golden-output tests.

Unlike the oracle tests (tests/oracle.py transliterations), the expected
outputs here were derived BY HAND from the published, documented
semantics — the SAM spec (samtools.github.io/hts-specs/SAMv1.pdf) and
Picard MarkDuplicates' documented behavior — and committed only after
every line of the vendored file was manually checked against that
derivation. They pin the config-1 contract (sort + duplicate marking)
to something outside this repository's own code.

Derivation for dedup_golden (see tests/fixtures/dedup_golden.in.sam):

Scoring (Picard SUM_OF_BASE_QUALITIES strategy, the elPrep default):
  score(read) = sum of base quals >= 15 over ALL bases (clipped incl.);
  pair score = mate scores summed. QUAL '?'=Q30, ':'=Q25, '5'=Q20, so a
  10bp read scores 300 / 250 / 200 respectively.

Unclipped 5' position (SAM spec soft/hard clips + Picard convention):
  forward: POS - leading S/H lengths; reverse: reference end + trailing
  S/H lengths (end = POS + ref-consuming lengths - 1).

Case-by-case expected verdicts (dup = FLAG |= 0x400):
  pA/pB    pairs at (100F,209R): scores 600 vs 400 -> pB dup (both mates).
  pC/pD    pairs at (300F,409R): scores tie at 600 -> smallest QNAME wins
           (elPrep's documented deterministic tiebreak) -> pD dup.
  fE       unpaired fragment at 100F: a true pair (pA) occupies the same
           fragment key -> unpaired loses to paired regardless of score.
  fF/fG    unpaired at 500F: 300 vs 200 -> fG dup.
  fH       2S8M at POS 502: unclipped 502-2 = 500F joins the fF group,
           score 250 -> dup.
  fI       500F but library lib2: own group -> NOT dup.
  fJ/fK    reverse at unclipped end 609 (fJ: 600+10-1; fK 6M4S:
           600+6-1+4): 300 vs 250 -> fK dup.
  sM       secondary (0x100): excluded from dedup, never marked.
  fL       unmapped (0x4): excluded, sorts after all mapped reads.

Coordinate order (SAM spec primary keys + elPrep's documented total
order for ties: forward before reverse, then QNAME): pos 100 fE < pA <
pB (QNAME), 200 pA < pB, ..., pos 500 fF < fG < fI, 502 fH, 600 fJ <
fK, 700 sM, then unmapped fL last.
"""

import os

from elprep_tpu import cli

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def _read(path):
    with open(path, "rb") as fh:
        return fh.read()


def test_dedup_sort_golden(tmp_path):
    out = str(tmp_path / "out.sam")
    rc = cli.main([
        "filter", os.path.join(FIXTURES, "dedup_golden.in.sam"), out,
        "--mark-duplicates", "--sorting-order", "coordinate",
        "--pg-cmd-line",
        "elprep filter dedup_golden.in.sam dedup_golden.out.sam "
        "--mark-duplicates --sorting-order coordinate",
    ])
    assert rc == 0
    expected = _read(os.path.join(FIXTURES, "dedup_golden.expected.sam"))
    assert _read(out) == expected


def test_metrics_golden(tmp_path):
    """Picard DuplicationMetrics, hand-computed from the documented
    formulas (fixtures/metrics_golden.in.sam; lib1 only):

      pairs P1(Q30)/P2(Q20)/P3(Q20) share unclipped key (100F,209R) ->
      P2+P3 dup; P2 is 10px from P1 -> optical (<=100px default);
      P3 is ~8000px away -> not. Fragments fA(Q30)/fB(Q20) at 400F ->
      fB dup.

      UNPAIRED_READS_EXAMINED=2  READ_PAIRS_EXAMINED=3
      UNPAIRED_READ_DUPLICATES=1 READ_PAIR_DUPLICATES=2  OPTICAL=1
      PERCENT_DUPLICATION = (1 + 2*2)/(2 + 2*3) = 0.625
      ESTIMATED_LIBRARY_SIZE: solve c/x - 1 + e^(-n/x) = 0 with
        n = pairs-optical = 2, c = pairs-pairdups = 1 -> x ~= 1.256,
        truncated to 1 (Picard's documented c*(1-e^(-n/x))=x model).
      Histogram CoverageMult(x) = els*(1-e^(-x*pairs/els))/unique
        = 1 - e^(-3x): x=1 -> 0.950213, x=2 -> 0.997521.

    The vendored file starts at "## METRICS CLASS" (the StringHeader
    carries a timestamp)."""
    out = str(tmp_path / "out.sam")
    metrics = str(tmp_path / "metrics.txt")
    rc = cli.main([
        "filter", os.path.join(FIXTURES, "metrics_golden.in.sam"), out,
        "--mark-duplicates", "--mark-optical-duplicates", metrics,
        "--sorting-order", "coordinate",
    ])
    assert rc == 0
    got = _read(metrics)
    got = got[got.index(b"## METRICS CLASS"):]
    expected = _read(os.path.join(FIXTURES, "metrics_golden.expected.txt"))
    assert got == expected


def test_bqsr_recal_golden(tmp_path):
    """GATKReport recalibration tables, hand-derived from the
    documented BQSR covariate conventions (config-2 contract;
    fixtures/bqsr_golden.in.sam over a committed 60bp reference).

    Reads (RG u1):
      bA  flag 99 (first-of-pair, fwd), pos 11, 10M, Q25 except
          idx1=Q2 (below minInterestingQual 6 -> skipped), ONE
          mismatch at idx4. Counted: 9 obs / 1 error. Cycles = 1+i
          (fwd, first-of-pair): {1,3..10}, error at cycle 5. Contexts
          = preceding 2-mer of the READ sequence: error context "TC".
      bB  flag 147 (second-of-pair, rev), pos 31, 10M exact, Q20.
          10 obs / 0 errors. Cycles NEGATED and counted from the
          original 5' end (= stored 3' end): -10..-1. Contexts =
          reverse-complement 2-mers; stored idx 9 (original first
          base) has none -> AC x2, CG x2, AA, CC, GG, GT, TA.
      bC  flag 1024 (duplicate) and bD MAPQ 0: ineligible, contribute
          nothing (gate: MAPQ in 1..254, not dup/secondary/QC-fail,
          mapped, RG present).
      bE  flag 0, pos 1, 5S5M, Q30: soft clip hard-clipped first ->
          5 obs, cycles 1..5, contexts AC,CG,GT,TA.

    Totals: RecalTable0 u1 = 24 obs / 1 error, EstimatedQReported =
    -10*log10((9*10^-2.5 + 10*10^-2 + 5*10^-3)/24) = 22.5486 (hand
    computed); RecalTable1 rows (Q20 10/0, Q25 9/1, Q30 5/0); the
    Quantized histogram counts 10@20, 9@25, 5@30. Every Observations/
    Errors/CovariateValue cell in the vendored file was checked
    against this derivation; the EmpiricalQuality column is
    formula-pinned (Bayesian estimate, oracle-tested in
    tests/test_bqsr.py) rather than hand-derived."""
    ref = str(tmp_path / "ref.elfasta")
    assert cli.main(["fasta-to-elfasta",
                     os.path.join(FIXTURES, "bqsr_golden.ref.fasta"),
                     ref]) == 0
    out = str(tmp_path / "out.sam")
    recal = str(tmp_path / "out.recal")
    rc = cli.main([
        "filter", os.path.join(FIXTURES, "bqsr_golden.in.sam"), out,
        "--bqsr", recal, "--reference", ref,
    ])
    assert rc == 0
    expected = _read(os.path.join(FIXTURES, "bqsr_golden.expected.recal"))
    assert _read(recal) == expected


def test_dedup_golden_sharded_matches(tmp_path):
    """The multi-chip path must reproduce the hand-verified golden."""
    out = str(tmp_path / "out.sam")
    rc = cli.main([
        "filter", os.path.join(FIXTURES, "dedup_golden.in.sam"), out,
        "--mark-duplicates", "--sorting-order", "coordinate", "--sharded",
        "--pg-cmd-line",
        "elprep filter dedup_golden.in.sam dedup_golden.out.sam "
        "--mark-duplicates --sorting-order coordinate",
    ])
    assert rc == 0
    expected = _read(os.path.join(FIXTURES, "dedup_golden.expected.sam"))
    assert _read(out) == expected
