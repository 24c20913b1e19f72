"""Native GVCF reference-confidence region engine vs the Python oracle.

native.refconf_region (clipping_native.cpp refconf_region_columnar) runs
finalize + pair reconciliation + filterNonPassingReads +
calculateRefConfidence in one C++ call; hc/refconf.py remains the
oracle. Outputs are integers derived from float64 intermediates, so the
comparison is exact equality.
"""

import copy

import numpy as np
import pytest

from elprep_tpu import native
from elprep_tpu.hc.activity import (
    AssemblyRegion,
    finalize_assembly_region,
    make_hc_params,
)
from elprep_tpu.hc.driver import prepare_region
from elprep_tpu.hc.readblock import ContigReadBlock, preclip_block
from elprep_tpu.hc.refconf import (
    RefRun,
    native_ref_model_for_no_variation,
    reference_model_for_no_variation,
)
from elprep_tpu.io import sam as samio

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native lib unavailable")


def _mk_block(seed, n=400, contig="chr1", length=30_000):
    from samgen import make_genome, make_header_lines, reads_from_genome

    contigs = [(contig, length)]
    genome = make_genome(contigs, seed=seed)
    lines = make_header_lines(contigs) + reads_from_genome(
        n, contigs, genome, seed=seed)
    text = ("\n".join(lines) + "\n").encode()
    hdr, batch = samio.parse_sam(text)
    batch = batch.select(np.lexsort((batch.pos, batch.rname_id)))
    rid = [i for i, nm in enumerate(batch.names) if nm == contig.encode()][0]
    block = ContigReadBlock.from_batch(
        batch, np.flatnonzero(batch.rname_id == rid), contig.encode())
    return genome[contig], block


def _slice_rows(block, positions, ends, mrl, lo, hi):
    j = int(np.searchsorted(positions, lo - mrl + 1, side="left"))
    k = int(np.searchsorted(positions, hi, side="right"))
    return j + np.flatnonzero(ends[j:k] >= lo)


def _python_ref_model(params, region, reads, preclip):
    finalize_assembly_region(region, params, preclip)
    return reference_model_for_no_variation(
        params, [], region, params.confidence_mode != "NONE")


def _flatten(variants):
    """RefRuns / SingleVariants -> comparable per-position tuples."""
    out = []
    for v in variants:
        if isinstance(v, RefRun):
            for i in range(len(v)):
                out.append((v.pos0 + i, int(v.dp[i]), int(v.ad_ref[i]),
                            int(v.ad_nonref[i]), tuple(int(x) for x in v.pls[i]),
                            int(v.gq[i])))
        else:
            out.append((v.location, v.dp, v.ad[0], v.ad[1],
                        tuple(int(x) for x in v.pls), int(v.gq)))
    return out


@pytest.mark.parametrize("mode", ["GVCF", "BP_RESOLUTION"])
@pytest.mark.parametrize("seed", [3, 11, 29])
def test_native_matches_python_fuzz(mode, seed):
    import random

    reference, block = _mk_block(seed)
    params = make_hc_params(mode)
    block_reads = block.materialize()
    preclip, cols = preclip_block(block, block_reads, params)
    assert cols is not None
    positions = block.pos
    ends = block.ends()
    mrl = block.max_reference_length()
    rng = random.Random(seed)
    n_checked = 0
    for _ in range(60):
        start = rng.randrange(1, 29_000)
        end = min(start + rng.randrange(1, 400), 29_999)
        region = AssemblyRegion(
            contig="chr1", reference=reference, start=start, end=end,
            extension=100, contig_length=30_000, is_active=False)
        rows = _slice_rows(block, positions, ends, mrl,
                           region.padded_start(), region.padded_end())
        got = native_ref_model_for_no_variation(
            params, [], copy.deepcopy(region), cols, rows, reference)
        assert got is not None
        region.reads = [block_reads[i] for i in rows]
        want = _python_ref_model(params, region, region.reads, preclip)
        assert _flatten(got) == _flatten(want)
        n_checked += 1
    assert n_checked == 60


def test_env_gate_forces_python(monkeypatch):
    monkeypatch.setenv("ELPREP_TPU_NO_NATIVE_REFCONF", "1")
    reference, block = _mk_block(5)
    params = make_hc_params("GVCF")
    region = AssemblyRegion(contig="chr1", reference=reference, start=100,
                            end=200, extension=100, contig_length=30_000,
                            is_active=False)
    assert native_ref_model_for_no_variation(
        params, [], region, {}, np.zeros(0, np.int64), reference) is None


def test_prepare_region_native_path_matches(monkeypatch):
    """prepare_region with span_cols takes the native exit and returns
    the same variants as the Python path."""
    reference, block = _mk_block(17)
    params = make_hc_params("GVCF")
    block_reads = block.materialize()
    preclip, cols = preclip_block(block, block_reads, params)
    positions, ends, mrl = block.pos, block.ends(), block.max_reference_length()
    region = AssemblyRegion(contig="chr1", reference=reference, start=2_000,
                            end=2_300, extension=100, contig_length=30_000,
                            is_active=False)
    rows = _slice_rows(block, positions, ends, mrl, region.padded_start(),
                       region.padded_end())
    r_native = copy.deepcopy(region)
    r_native.reads = [block_reads[i] for i in rows]
    got, pend = prepare_region(params, r_native, preclip, span_cols=cols,
                               span_rows=rows, span_reference=reference)
    assert pend is None
    r_py = copy.deepcopy(region)
    r_py.reads = [block_reads[i] for i in rows]
    want, pend2 = prepare_region(params, r_py, preclip)
    assert pend2 is None
    assert _flatten(got) == _flatten(want)


@pytest.mark.parametrize("mode", ["GVCF", "BP_RESOLUTION"])
def test_batch_matches_per_region(mode):
    """refconf_regions_batch (one native call, row selection in C++)
    against the per-region native calls and the Python oracle."""
    import random

    from elprep_tpu.hc.refconf import native_ref_models_batch

    reference, block = _mk_block(41)
    params = make_hc_params(mode)
    block_reads = block.materialize()
    preclip, cols = preclip_block(block, block_reads, params)
    assert cols is not None
    positions, ends, mrl = block.pos, block.ends(), block.max_reference_length()
    rng = random.Random(41)
    regions = []
    for _ in range(40):
        start = rng.randrange(1, 29_000)
        end = min(start + rng.randrange(1, 400), 29_999)
        regions.append(AssemblyRegion(
            contig="chr1", reference=reference, start=start, end=end,
            extension=100, contig_length=30_000, is_active=False))
    # include the early-out shapes (end < start -> high - low <= 0)
    regions.append(AssemblyRegion(contig="chr1", reference=reference,
                                  start=500, end=499, extension=100,
                                  contig_length=30_000, is_active=False))
    outs = native_ref_models_batch(params, regions, positions, ends, mrl,
                                   cols, reference)
    assert len(outs) == len(regions)
    assert outs[-1] == []  # early-out region
    n_checked = 0
    for region, got in zip(regions[:-1], outs[:-1]):
        assert got is not None
        rows = _slice_rows(block, positions, ends, mrl,
                           region.padded_start(), region.padded_end())
        per_region = native_ref_model_for_no_variation(
            params, [], copy.deepcopy(region), cols, rows, reference)
        assert _flatten(got) == _flatten(per_region)
        r_py = copy.deepcopy(region)
        r_py.reads = [block_reads[i] for i in rows]
        want = _python_ref_model(params, r_py, r_py.reads, preclip)
        assert _flatten(got) == _flatten(want)
        n_checked += 1
    assert n_checked == 40


@pytest.mark.parametrize("seed", [5, 17, 41])
def test_finalize_region_seq_quals_matches_python(seed):
    """native.finalize_region_seq_quals (the assembly-input columnar
    finalize) must emit exactly the (seq, qual) list the Python
    finalize_assembly_region + comprehension produces — same reads,
    same sorted order, same region-clipped windows, same
    pair-reconciled quals."""
    import random

    reference, block = _mk_block(seed)
    params = make_hc_params("GVCF")
    block_reads = block.materialize()
    preclip, cols = preclip_block(block, block_reads, params)
    assert cols is not None
    positions = block.pos
    ends = block.ends()
    mrl = block.max_reference_length()
    rng = random.Random(seed)
    n_nonempty = 0
    for _ in range(60):
        start = rng.randrange(1, 29_000)
        end = min(start + rng.randrange(1, 400), 29_999)
        region = AssemblyRegion(
            contig="chr1", reference=reference, start=start, end=end,
            extension=100, contig_length=30_000, is_active=True)
        rows = _slice_rows(block, positions, ends, mrl,
                           region.padded_start(), region.padded_end())
        fin = native.finalize_region_seq_quals(
            rows, cols, region.padded_start(), region.padded_end())
        assert fin is not None
        offs, seq_c, qual_c = fin
        got = [(seq_c[offs[k]:offs[k + 1]].tobytes(),
                qual_c[offs[k]:offs[k + 1]].tobytes())
               for k in range(len(offs) - 1)]
        region.reads = [block_reads[i] for i in rows]
        finalize_assembly_region(region, params, preclip)
        want = [(r.seq, r.qual) for r in region.reads]
        assert got == want
        n_nonempty += bool(want)
    assert n_nonempty > 30  # the sweep must actually exercise reads
