"""haplotype_call_aln columnar fast path vs the per-read Python oracle,
including the native good_cigar_mask grammar kernel."""

import random

import numpy as np
import pytest

from elprep_tpu import native
from elprep_tpu.core.batch import Ragged
from elprep_tpu.filters.hcprep import _is_good_cigar, haplotype_call_aln
from elprep_tpu.io import sam as samio


def _random_cigars(rng, n):
    """Adversarial op sequences hitting every grammar branch."""
    ops_pool = "MIDNSHP=X"
    cigars = []
    for _ in range(n):
        m = rng.randrange(0, 7)
        cig = []
        for _ in range(m):
            ln = rng.choice([0, 1, 1, 2, 5, 10])
            cig.append((ln, rng.choice(ops_pool)))
        cigars.append(cig)
    # plus classic shapes
    cigars += [
        [], [(100, "M")], [(10, "S"), (90, "M")], [(90, "M"), (10, "S")],
        [(10, "H"), (90, "M")], [(10, "H"), (5, "S"), (85, "M")],
        [(50, "M"), (2, "I"), (48, "M")], [(50, "M"), (2, "D"), (48, "M")],
        [(2, "I"), (98, "M")], [(98, "M"), (2, "I")], [(98, "M"), (2, "D")],
        [(5, "S")], [(5, "H")], [(50, "M"), (1, "I"), (1, "D"), (48, "M")],
        [(50, "M"), (10, "N"), (50, "M")], [(1, "P"), (100, "M")],
        [(100, "M"), (1, "P")], [(10, "S"), (90, "M"), (10, "S"), (1, "H")],
        [(10, "S"), (90, "M"), (10, "S"), (1, "H"), (1, "M")],
        [(0, "M")], [(10, "H"), (10, "H")],
    ]
    return cigars


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
def test_good_cigar_mask_matches_oracle():
    rng = random.Random(7)
    cigars = _random_cigars(rng, 3000)
    lens = Ragged(
        np.array([ln for c in cigars for ln, _ in c], np.int32),
        np.concatenate([[0], np.cumsum([len(c) for c in cigars])]).astype(np.int64))
    ops = Ragged(
        np.array([ord(op) for c in cigars for _, op in c], np.uint8),
        lens.offsets)
    got = native.good_cigar_mask(lens, ops)
    want = np.array([_is_good_cigar(c) for c in cigars], bool)
    mism = np.flatnonzero(got != want)
    assert not len(mism), [(i, cigars[i], bool(got[i]), bool(want[i]))
                           for i in mism[:5]]


def test_haplotype_call_aln_fast_path_matches_loop(monkeypatch):
    from samgen import make_genome, make_header_lines, reads_from_genome

    contigs = [("chr1", 20_000), ("chr2", 9_000)]
    genome = make_genome(contigs, seed=3)
    lines = make_header_lines(
        contigs, rgs=[{"ID": "rg1", "LB": "lib1", "SM": "s1", "PU": "u1"}])
    lines += reads_from_genome(600, contigs, genome, seed=3, rg_ids=["rg1"])
    text = ("\n".join(lines) + "\n").encode()

    hdr, batch_a = samio.parse_sam(text)
    keep_fast = haplotype_call_aln(hdr)(batch_a)

    monkeypatch.setenv("ELPREP_TPU_NO_NATIVE_GOODCIG", "1")
    hdr2, batch_b = samio.parse_sam(text)
    keep_loop = haplotype_call_aln(hdr2)(batch_b)
    assert np.array_equal(keep_fast, keep_loop)
    assert keep_fast.sum() > 0
