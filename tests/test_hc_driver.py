"""End-to-end HaplotypeCaller tests on synthetic data
(reference semantics: filters/call-region.go, haplotypecaller.go)."""

import numpy as np
import pytest

from elprep_tpu.core.header import Header
from elprep_tpu.filters.clipping import ClipRead
from elprep_tpu.hc import driver
from elprep_tpu.hc.activity import make_hc_params
from elprep_tpu.io import vcf as vcfmod

_BASES = np.frombuffer(b"ACGT", np.uint8)


def _mkref(rng, n):
    return rng.choice(_BASES, n).tobytes()


def _read(qname, pos, seq, qual=35, first=True, tlen=300, pnext=None):
    flag = 0x63 if first else 0x93
    return ClipRead(
        flag=flag, pos=pos,
        pnext=pnext if pnext is not None else pos + 150,
        tlen=tlen if first else -tlen, mapq=60,
        cigar=[(len(seq), "M")], seq=seq, qual=bytes([qual]) * len(seq),
        rname=b"chr1", rnext=b"=", qname=qname,
    )


def _sam_header(n):
    hdr = Header()
    hdr.sq = [{"SN": "chr1", "LN": str(n)}]
    return hdr


def _make_pileup_reads(hap, ref_len, n_reads, read_len, rng, start_offset=0):
    reads = []
    for i in range(n_reads):
        start = start_offset + (i * 7) % max(1, len(hap) - read_len)
        seq = hap[start : start + read_len]
        if len(seq) < read_len:
            continue
        reads.append(_read(b"r%04d" % i, start + 1, seq, first=(i % 2 == 0)))
    return reads


@pytest.fixture(scope="module")
def snp_setup():
    rng = np.random.RandomState(42)
    ref = _mkref(rng, 2000)
    # het SNP at 1-based position 1001
    alt = ref[:1000] + (b"A" if ref[1000:1001] != b"A" else b"C") + ref[1001:]
    reads = []
    for i in range(40):
        hap = ref if i % 2 == 0 else alt
        start = 900 + (i * 5) % 100
        seq = hap[start : start + 120]
        reads.append(_read(b"rd%04d" % i, start + 1, seq, first=(i % 2 == 0)))
    reads.sort(key=lambda r: r.pos)
    return ref, alt, reads


def test_snp_called(snp_setup):
    ref, alt, reads = snp_setup
    params = make_hc_params("NONE", command_line="test")
    hdr, variants = driver.call_variants(
        params, _sam_header(len(ref)), {"chr1": reads}, lambda c: ref,
        sample_name="s1", use_device_pairhmm=False,
    )
    assert len(variants) >= 1
    v = next((v for v in variants if v.pos == 1001), None)
    assert v is not None, [x.pos for x in variants]
    assert v.ref == chr(ref[1000])
    assert v.alt == [chr(alt[1000])]
    gt = v.genotypes[0]
    assert sorted(gt.gt) == [0, 1]  # heterozygous
    assert "PL" in gt.data and "GQ" in gt.data and "AD" in gt.data
    assert "DP" in v.info and "MQ" in v.info and "QD" in v.info
    assert v.qual is not None and v.qual > 50
    # format line sanity through the VCF formatter
    line = vcfmod.format_variant(v)
    assert line.startswith("chr1\t1001\t.\t")
    assert "GT:AD:DP:GQ:PL" in line


def test_hom_deletion_called():
    rng = np.random.RandomState(7)
    ref = _mkref(rng, 2000)
    alt = ref[:1000] + ref[1004:]  # 4bp homozygous deletion after pos 1000
    reads = []
    for i in range(40):
        start = 900 + (i * 5) % 100
        seq = alt[start : start + 120]
        reads.append(_read(b"rd%04d" % i, start + 1, seq, first=(i % 2 == 0)))
    reads.sort(key=lambda r: r.pos)
    params = make_hc_params("NONE", command_line="test")
    hdr, variants = driver.call_variants(
        params, _sam_header(len(ref)), {"chr1": reads}, lambda c: ref,
        sample_name="s1", use_device_pairhmm=False,
    )
    v = next((v for v in variants if v.pos == 1000), None)
    assert v is not None, [(x.pos, x.ref, x.alt) for x in variants]
    assert len(v.ref) == 5 and len(v.alt[0]) == 1
    assert v.genotypes[0].gt == [1, 1]


def test_no_variants_no_calls(snp_setup):
    rng = np.random.RandomState(3)
    ref = _mkref(rng, 1500)
    reads = []
    for i in range(30):
        start = 600 + (i * 6) % 120
        reads.append(_read(b"q%04d" % i, start + 1, ref[start : start + 100],
                           first=(i % 2 == 0)))
    reads.sort(key=lambda r: r.pos)
    params = make_hc_params("NONE", command_line="test")
    hdr, variants = driver.call_variants(
        params, _sam_header(len(ref)), {"chr1": reads}, lambda c: ref,
        sample_name="s1", use_device_pairhmm=False,
    )
    assert variants == []


def test_gvcf_mode_blocks(snp_setup):
    ref, alt, reads = snp_setup
    params = make_hc_params("GVCF", command_line="test")
    hdr, variants = driver.call_variants(
        params, _sam_header(len(ref)), {"chr1": reads}, lambda c: ref,
        sample_name="s1", use_device_pairhmm=False,
    )
    from elprep_tpu.hc.refconf import expand_variants

    variants = expand_variants(variants)
    assert variants, "GVCF should emit reference blocks and the call"
    # the SNP site appears with <NON_REF> in alts
    v = next((v for v in variants if v.pos == 1001 and len(v.alt) > 1), None)
    assert v is not None, [(x.pos, x.alt) for x in variants[:20]]
    assert v.alt[-1] == "<NON_REF>"
    # reference blocks carry END info and GT:DP:GQ:MIN_DP:PL format
    blocks = [v for v in variants if v.alt == ["<NON_REF>"]]
    assert blocks
    b = blocks[0]
    assert "END" in b.info
    assert b.genotype_format == ["GT", "DP", "GQ", "MIN_DP", "PL"]
    # header has GVCF machinery
    text = vcfmod.format_header(hdr)
    assert "##ALT=<ID=NON_REF" in text
    assert "##GVCFBlock0-1=" in text


def test_vcf_header_none_mode(snp_setup):
    ref, alt, reads = snp_setup
    params = make_hc_params("NONE", command_line="cmd")
    hdr = driver.write_vcf_header(params, _sam_header(len(ref)), "s1", lambda c: ref,
                                  now="Mon Jan 02 15:04:05 UTC 2006")
    text = vcfmod.format_header(hdr)
    assert "##contig=<ID=chr1,length=2000>" in text
    assert "##INFO=<ID=QD" in text
    assert "##FORMAT=<ID=GT" in text
    assert text.rstrip().endswith("FORMAT\ts1")


def test_bp_resolution_mode(snp_setup):
    """BP_RESOLUTION: per-position reference confidence with NO GVCF
    banding — every covered position gets its own record
    (reference: haplotypecaller.go:117-123,213-224)."""
    ref, alt, reads = snp_setup
    params = make_hc_params("BP_RESOLUTION", command_line="test")
    hdr, variants = driver.call_variants(
        params, _sam_header(len(ref)), {"chr1": reads}, lambda c: ref,
        sample_name="s1", use_device_pairhmm=False,
    )
    from elprep_tpu.hc.refconf import expand_variants

    variants = expand_variants(variants)
    assert variants
    # the het SNP site is present with <NON_REF> appended
    v = next((v for v in variants if v.pos == 1001 and len(v.alt) > 1), None)
    assert v is not None
    # reference records are single-position (no multi-position END blocks)
    ref_blocks = [v for v in variants if v.alt == ["<NON_REF>"]]
    assert ref_blocks
    for v in ref_blocks:
        end = v.info.get("END")
        assert end is None or end == v.pos, (v.pos, end)
    # contiguous coverage: consecutive records advance by their span
    poss = [v.pos for v in variants]
    assert poss == sorted(poss)


def test_streaming_sink_flushes_by_record_count(snp_setup, tmp_path,
                                                monkeypatch):
    """The streaming sink must flush on RECORD count (one RefBlockBatch
    item holds thousands of reference-block records): with a small
    threshold the sink receives many mid-run batches, and the resulting
    file is byte-identical to an unbuffered all-at-end write."""
    ref, alt, reads = snp_setup

    # small run-buffer bound so RefBlockBatches reach out_variants
    # mid-run even on this 2 kb fixture
    monkeypatch.setattr(driver, "_RUN_BUF_POSITIONS", 100)

    def run(threshold, path):
        monkeypatch.setattr(driver, "_SINK_FLUSH_RECORDS", threshold)
        params = make_hc_params("GVCF", command_line="test")
        writer = vcfmod.StreamingVcfWriter(
            str(path), driver.write_vcf_header(
                params, _sam_header(len(ref)), "s1", lambda c: ref,
                now="Mon Jan 02 15:04:05 UTC 2006"))
        batches = []
        orig = writer.write_variants

        def recording(variants):
            batches.append(len(variants))
            orig(variants)

        writer.write_variants = recording
        sink = vcfmod.AsyncVariantSink(writer)
        hdr, variants = driver.call_variants(
            params, _sam_header(len(ref)), {"chr1": list(reads)},
            lambda c: ref, sample_name="s1", use_device_pairhmm=False,
            variant_sink=sink)
        assert variants == []  # everything went through the sink
        sink.close()
        return batches

    small = run(5, tmp_path / "small.vcf")
    large = run(1 << 30, tmp_path / "large.vcf")
    assert (tmp_path / "small.vcf").read_bytes() == \
        (tmp_path / "large.vcf").read_bytes()
    # the low threshold actually streamed mid-run; the huge one did not
    assert len(small) > len(large)


@pytest.mark.parametrize("mode", ["NONE", "GVCF"])
def test_parallel_pool_matches_serial(snp_setup, mode):
    """call_variants with the worker pool == serial, record for record
    (covers the block distribution, bare-region shipping, speculative
    deletions protocol, and ordered emission)."""
    rng = np.random.RandomState(17)
    ref = _mkref(rng, 6000)
    # two variant clusters incl. a long deletion crossing region-size
    # boundaries, plus a SNP inside the deleted span on the other hap
    hap_del = ref[:2000] + ref[2200:]           # 200bp deletion @2000
    sub = b"A" if ref[2104:2105] != b"A" else b"C"
    hap_snp = ref[:2104] + sub + ref[2105:]
    snp2 = b"G" if ref[4000:4001] != b"G" else b"T"
    hap_b = ref[:4000] + snp2 + ref[4001:]
    reads = []
    for i in range(120):
        hap = (hap_del, hap_snp, hap_b)[i % 3]
        start = (1800 + (i * 13) % 500) if i % 3 != 2 else (3850 + (i * 11) % 250)
        seq = hap[start : start + 120]
        flag = 0x63 if i % 2 == 0 else 0x93
        reads.append(ClipRead(
            flag=flag, pos=start + 1, pnext=start + 151,
            tlen=300 if i % 2 == 0 else -300, mapq=60,
            cigar=[(len(seq), "M")], seq=seq, qual=bytes([35]) * len(seq),
            rname=b"chr1", rnext=b"=", qname=b"pp%04d" % i))
    reads.sort(key=lambda r: r.pos)
    hdr = _sam_header(len(ref))
    params_a = make_hc_params(mode, command_line="t")
    _, serial = driver.call_variants(
        params_a, hdr, {"chr1": list(reads)}, lambda c: ref,
        sample_name="s1", use_device_pairhmm=False, nr_workers=1)
    params_b = make_hc_params(mode, command_line="t")
    _, pooled = driver.call_variants(
        params_b, hdr, {"chr1": list(reads)}, lambda c: ref,
        sample_name="s1", use_device_pairhmm=False, nr_workers=2)
    from elprep_tpu.hc.refconf import expand_variants
    from elprep_tpu.io.vcf import format_variant

    a = [format_variant(v) for v in expand_variants(serial)]
    b = [format_variant(v) for v in expand_variants(pooled)]
    assert a == b
    assert a  # fixture produced calls


def test_parallel_pool_redo_path_on_deletions_carry():
    """Force the cross-region deletions carry (tiny regions + a 150bp
    het deletion): the pooled run must take the speculative-redo path
    and still match the serial output exactly."""
    rng = np.random.RandomState(23)
    ref = _mkref(rng, 4000)
    hap_del = ref[:2000] + ref[2150:]
    reads = []
    for i in range(80):
        hap = hap_del if i % 2 == 0 else ref
        start = 1850 + (i * 7) % 300
        seq = hap[start : start + 120]
        flag = 0x63 if i % 2 == 0 else 0x93
        reads.append(ClipRead(
            flag=flag, pos=start + 1, pnext=start + 151,
            tlen=300 if i % 2 == 0 else -300, mapq=60,
            cigar=[(len(seq), "M")], seq=seq, qual=bytes([35]) * len(seq),
            rname=b"chr1", rnext=b"=", qname=b"dd%04d" % i))
    reads.sort(key=lambda r: r.pos)
    hdr = _sam_header(len(ref))

    def mk_params():
        p = make_hc_params("GVCF", command_line="t")
        p.max_region_size = 60
        p.min_region_size = 20
        return p

    # serial run, instrumented: assert the carry actually fires (which
    # guarantees the pooled run below must issue a redo for that region)
    carried = []
    orig = driver.genotype_region
    def spy(params, pending, vals, keep, incoming):
        if incoming:
            carried.append(list(incoming))
        return orig(params, pending, vals, keep, incoming)
    driver.genotype_region = spy
    try:
        _, serial = driver.call_variants(
            mk_params(), hdr, {"chr1": list(reads)}, lambda c: ref,
            sample_name="s1", use_device_pairhmm=False, nr_workers=1)
    finally:
        driver.genotype_region = orig
    assert carried, "fixture no longer exercises the deletions carry"

    _, pooled = driver.call_variants(
        mk_params(), hdr, {"chr1": list(reads)}, lambda c: ref,
        sample_name="s1", use_device_pairhmm=False, nr_workers=2)
    from elprep_tpu.hc.refconf import expand_variants
    from elprep_tpu.io.vcf import format_variant

    a = [format_variant(v) for v in expand_variants(serial)]
    b = [format_variant(v) for v in expand_variants(pooled)]
    assert a == b and a


def test_parallel_pool_matches_serial_multispan_bed():
    """Pooled == serial with multiple BED spans per contig plus a second
    contig: exercises the cross-span pre-start (regions of span k+1
    prepare while span k drains), the per-contig reference refcounting
    (one broadcast for both chr1 spans, dropped after the second), and
    the deletions carry within a span."""
    rng = np.random.RandomState(41)
    ref1 = _mkref(rng, 9000)
    ref2 = _mkref(rng, 5000)
    refs = {"chr1": ref1, "chr2": ref2}
    hap_del = ref1[:2000] + ref1[2150:]          # 150bp deletion @2000
    snp2 = b"G" if ref1[6004:6005] != b"G" else b"T"
    hap_b = ref1[:6004] + snp2 + ref1[6005:]
    snp3 = b"C" if ref2[2504:2505] != b"C" else b"A"
    hap_c = ref2[:2504] + snp3 + ref2[2505:]
    reads = {"chr1": [], "chr2": []}
    for i in range(90):
        hap = (hap_del, ref1, hap_b)[i % 3]
        start = (1850 + (i * 7) % 300) if i % 3 != 2 else (5870 + (i * 11) % 250)
        seq = hap[start : start + 120]
        flag = 0x63 if i % 2 == 0 else 0x93
        reads["chr1"].append(ClipRead(
            flag=flag, pos=start + 1, pnext=start + 151,
            tlen=300 if i % 2 == 0 else -300, mapq=60,
            cigar=[(len(seq), "M")], seq=seq, qual=bytes([35]) * len(seq),
            rname=b"chr1", rnext=b"=", qname=b"ms%04d" % i))
    for i in range(40):
        hap = hap_c if i % 2 == 0 else ref2
        start = 2380 + (i * 9) % 220
        seq = hap[start : start + 120]
        flag = 0x63 if i % 2 == 0 else 0x93
        reads["chr2"].append(ClipRead(
            flag=flag, pos=start + 1, pnext=start + 151,
            tlen=300 if i % 2 == 0 else -300, mapq=60,
            cigar=[(len(seq), "M")], seq=seq, qual=bytes([35]) * len(seq),
            rname=b"chr2", rnext=b"=", qname=b"mt%04d" % i))
    for c in reads:
        reads[c].sort(key=lambda r: r.pos)
    hdr = Header()
    hdr.hd = {"VN": "1.6", "SO": "coordinate"}
    hdr.sq = [{"SN": "chr1", "LN": str(len(ref1))},
              {"SN": "chr2", "LN": str(len(ref2))}]
    bed = {"chr1": [(1500, 2600), (5600, 6500)], "chr2": [(2200, 2900)]}

    def run(nw):
        p = make_hc_params("GVCF", command_line="t")
        p.max_region_size = 60
        p.min_region_size = 20
        _, out = driver.call_variants(
            p, hdr, {c: list(v) for c, v in reads.items()},
            lambda c: refs[c], sample_name="s1", bed_regions=bed,
            use_device_pairhmm=False, nr_workers=nw)
        return out

    from elprep_tpu.hc.refconf import expand_variants
    from elprep_tpu.io.vcf import format_variant

    a = [format_variant(v) for v in expand_variants(run(1))]
    b = [format_variant(v) for v in expand_variants(run(3))]
    assert a == b
    assert a  # fixture produced records


def test_combiner_pump_error_propagates():
    """A failure inside the pump thread (combiner/sink work) must
    re-raise on the producer side — sticky, not swallowed, no hang."""
    import pytest

    from elprep_tpu.hc.driver import _CombinerPump

    def bad_combine(contig, reference, region_variants):
        raise RuntimeError("combiner exploded")

    pump = _CombinerPump(bad_combine, lambda: None, max_queue=4)
    pump.put_batch("chr1", b"A", [object()])
    with pytest.raises(RuntimeError, match="combiner exploded"):
        # the failure lands on a later put or at close, whichever
        # the producer reaches first
        for _ in range(100):
            pump.put_batch("chr1", b"A", [object()])
        pump.close()
    # sticky: close (again) keeps raising rather than resetting
    with pytest.raises(RuntimeError, match="combiner exploded"):
        pump.close()


def test_combiner_pump_ordered_and_flush_markers():
    from elprep_tpu.hc.driver import _CombinerPump

    seen = []
    pump = _CombinerPump(
        lambda contig, ref, batch: seen.append(("b", contig, tuple(batch))),
        lambda: seen.append(("f",)), max_queue=2)
    pump.put_batch("chr1", b"", [1, 2])
    pump.put_flush()
    pump.put_batch("chr2", b"", [3])
    pump.close()
    assert seen == [("b", "chr1", (1, 2)), ("f",), ("b", "chr2", (3,))]
