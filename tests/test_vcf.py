"""VCF model/format tests (reference semantics: vcf/vcf-files.go)."""

from elprep_tpu.io import vcf
from elprep_tpu.io.vcf import (
    FormatInformation,
    Genotype,
    MetaInformation,
    NUMBER_A,
    NUMBER_G,
    NUMBER_R,
    Variant,
    VcfHeader,
    format_value,
    format_variant,
)


def test_format_value_float_rules():
    # (reference: formatValue, vcf-files.go:1048-1063)
    assert format_value(0.0) == "0.00"
    assert format_value(1e-21) == "0.00"
    assert format_value(0.005) == "5.000e-03"
    assert format_value(0.5) == "0.500"
    assert format_value(1.0) == "1.00"
    assert format_value(35.25) == "35.25"
    assert format_value(42) == "42"
    assert format_value("a;b") == "a%3Bb"


def test_format_variant_basic():
    v = Variant(chrom="chr1", pos=12345, id=["rs1"], ref="A", alt=["T"],
                qual=51.77, filter=["PASS"], info={"DP": 10, "AF": [0.5]})
    assert format_variant(v) == "chr1\t12345\trs1\tA\tT\t51.77\tPASS\tDP=10;AF=0.500\n"


def test_format_variant_qual_strip():
    v = Variant(chrom="c", pos=1, ref="A", alt=["T"], qual=50.0)
    assert format_variant(v) == "c\t1\t.\tA\tT\t50\t.\t.\n"
    v.qual = None
    assert format_variant(v) == "c\t1\t.\tA\tT\t.\t.\t.\n"


def test_format_genotypes_and_trim():
    v = Variant(
        chrom="c", pos=5, ref="A", alt=["G"], qual=12.0,
        genotype_format=["GT", "AD", "DP", "GQ", "PL"],
        genotypes=[Genotype(phased=False, gt=[0, 1],
                            data={"AD": [3, 4], "DP": 7, "GQ": 55, "PL": [12, 0, 60]})],
    )
    assert format_variant(v).rstrip("\n").split("\t")[-1] == "0/1:3,4:7:55:12,0,60"
    # trailing missing fields are trimmed (vcf-files.go:1140-1182)
    v.genotypes = [Genotype(gt=[0, 0], data={"AD": [1, 0], "DP": None, "GQ": None, "PL": None})]
    assert format_variant(v).rstrip("\n").split("\t")[-1] == "0/0:1,0"
    # phased separator
    v.genotypes = [Genotype(phased=True, gt=[1, -1], data={"AD": None, "DP": 3, "GQ": None, "PL": None})]
    assert format_variant(v).rstrip("\n").split("\t")[-1] == "1|.:.:3"


def test_flag_info():
    v = Variant(chrom="c", pos=1, ref="A", alt=["T"], info={"DB": True, "DP": 3})
    assert "DB;DP=3" in format_variant(v)


def test_header_format_and_reparse():
    hdr = VcfHeader()
    hdr.infos.append(FormatInformation(id="DP", number=1, type="Integer",
                                       description="Approximate read depth"))
    hdr.infos.append(FormatInformation(id="AF", number=NUMBER_A, type="Float",
                                       description="Allele Frequency"))
    hdr.formats.append(FormatInformation(id="GT", number=1, type="String",
                                         description="Genotype"))
    hdr.formats.append(FormatInformation(id="PL", number=NUMBER_G, type="Integer",
                                         description="Phred-scaled likelihoods"))
    hdr.meta["contig"] = [MetaInformation(id="chr1", fields={"length": "1000"})]
    hdr.meta["source"] = ["elprep_tpu"]
    hdr.columns = vcf.DEFAULT_COLUMNS + ["FORMAT", "sample1"]
    text = vcf.format_header(hdr)
    assert text.startswith("##fileformat=VCFv4.2\n")
    assert '##INFO=<ID=DP,Number=1,Type=Integer,Description="Approximate read depth">' in text
    assert "##INFO=<ID=AF,Number=A,Type=Float" in text
    assert "##FORMAT=<ID=PL,Number=G,Type=Integer" in text
    assert "##contig=<ID=chr1,length=1000>" in text
    assert "##source=elprep_tpu" in text
    assert text.rstrip().endswith("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tsample1")

    hdr2 = vcf.parse_header(text.rstrip().split("\n"))
    assert [f.id for f in hdr2.infos] == ["DP", "AF"]
    assert hdr2.infos[1].number == NUMBER_A
    assert hdr2.formats[1].number == NUMBER_G
    assert hdr2.columns[-1] == "sample1"
    # reformat is stable
    assert vcf.format_header(hdr2) == text


def test_vcf_roundtrip(tmp_path):
    hdr = VcfHeader()
    hdr.infos.append(FormatInformation(id="DP", number=1, type="Integer", description="d"))
    hdr.formats.append(FormatInformation(id="GT", number=1, type="String", description="g"))
    hdr.formats.append(FormatInformation(id="AD", number=NUMBER_R, type="Integer", description="a"))
    hdr.columns = vcf.DEFAULT_COLUMNS + ["FORMAT", "s1"]
    variants = [
        Variant(chrom="chr1", pos=100, ref="A", alt=["T"], qual=31.5, filter=["PASS"],
                info={"DP": 5},
                genotype_format=["GT", "AD"],
                genotypes=[Genotype(gt=[0, 1], data={"AD": [2, 3]})]),
        Variant(chrom="chr1", pos=200, ref="G", alt=["C", "T"], qual=None,
                info={}, genotype_format=["GT"],
                genotypes=[Genotype(phased=True, gt=[1, 2])]),
    ]
    for name in ("t.vcf", "t.vcf.gz"):
        p = str(tmp_path / name)
        vcf.write_vcf_file(p, hdr, variants)
        hdr2, variants2 = vcf.read_vcf_file(p)
        assert vcf.format_vcf(hdr2, variants2) == vcf.format_vcf(hdr, variants)
        assert variants2[0].info == {"DP": 5}
        assert variants2[0].genotypes[0].gt == [0, 1]
        assert variants2[0].genotypes[0].data["AD"] == [2, 3]
        assert variants2[1].genotypes[0].phased
        assert variants2[1].genotypes[0].gt == [1, 2]


def test_variant_end():
    v = Variant(chrom="c", pos=100, ref="ACGT")
    assert v.end() == 103
    v.info["END"] = 250
    assert v.end() == 250


def test_non_ref_block_fast_path_matches_generic():
    """The GVCF reference-block fast path in format_variant emits the
    same text as the generic formatter (vcf-files.go:1185-1225)."""
    from elprep_tpu.io import vcf as vcfio

    g = vcfio.Genotype(phased=False, gt=[0, 0])
    g.data["DP"] = 7
    g.data["GQ"] = 21
    g.data["MIN_DP"] = 5
    g.data["PL"] = [0, 21, 315]
    v = vcfio.Variant(chrom="chr1", pos=1234, ref="T", alt=["<NON_REF>"],
                      genotype_format=["GT", "DP", "GQ", "MIN_DP", "PL"],
                      genotypes=[g])
    v.info["END"] = 1300
    fast = vcfio.format_variant(v)
    saved = vcfio._NON_REF_FMT
    vcfio._NON_REF_FMT = ["__disabled__"]
    try:
        slow = vcfio.format_variant(v)
    finally:
        vcfio._NON_REF_FMT = saved
    assert fast == slow
    assert fast == ("chr1\t1234\t.\tT\t<NON_REF>\t.\t.\tEND=1300\t"
                    "GT:DP:GQ:MIN_DP:PL\t0/0:7:21:5:0,21,315\n")


def test_streaming_vcf_writer_byte_identical(tmp_path):
    hdr = VcfHeader()
    hdr.infos.append(FormatInformation(id="DP", number=1, type="Integer", description="d"))
    hdr.formats.append(FormatInformation(id="GT", number=1, type="String", description="g"))
    hdr.columns = vcf.DEFAULT_COLUMNS + ["FORMAT", "s1"]
    variants = [
        Variant(chrom="chr1", pos=100 + i, ref="A", alt=["T"], qual=31.5,
                info={"DP": i}, genotype_format=["GT"],
                genotypes=[Genotype(gt=[0, 1])])
        for i in range(500)
    ]
    whole = tmp_path / "w.vcf.gz"
    vcf.write_vcf_file(str(whole), hdr, variants)
    stream = tmp_path / "s.vcf.gz"
    w = vcf.StreamingVcfWriter(str(stream), hdr)
    for v in variants:
        w.write_variants([v])
    w.close()
    assert whole.read_bytes() == stream.read_bytes()


def test_scan_vcf_sites_matches_full_parse():
    text = (b"##fileformat=VCFv4.2\n"
            b'##INFO=<ID=END,Number=1,Type=Integer,Description="e">\n'
            b"#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n"
            b"chr1\t100\t.\tACGT\tA\t.\t.\t.\n"
            b"chr1\t200\trs1\tG\tC\t50\tPASS\tEND=260\n"
            b"chr2\t5\t.\tT\tTTT\t.\t.\tDP=3;END=9;MQ=1\n")
    sites = vcf.scan_vcf_sites(text)
    hdr, variants = vcf.parse_vcf(text)
    expected = {}
    for v in variants:
        expected.setdefault(v.chrom, []).append((v.pos - 1, v.end()))
    assert sites == expected
    assert sites == {"chr1": [(99, 103), (199, 260)], "chr2": [(4, 9)]}


def test_parse_vcf_many_records_roundtrip():
    """Bulk parse equivalence: format->parse over hundreds of variants
    with mixed INFO/FORMAT shapes (the serial-by-design full parse; see
    the parse_vcf design note re vcf-files.go:1425-1449)."""
    hdr = VcfHeader()
    hdr.infos.append(FormatInformation(id="DP", number=1, type="Integer", description="d"))
    hdr.infos.append(FormatInformation(id="AF", number=vcf.NUMBER_A, type="Float", description="f"))
    hdr.formats.append(FormatInformation(id="GT", number=1, type="String", description="g"))
    hdr.formats.append(FormatInformation(id="PL", number=vcf.NUMBER_G, type="Integer", description="p"))
    hdr.columns = vcf.DEFAULT_COLUMNS + ["FORMAT", "s1"]
    variants = []
    for i in range(401):
        variants.append(Variant(
            chrom="chr%d" % (1 + i % 3), pos=100 + i, ref="A",
            alt=["T"] if i % 2 else ["T", "C"],
            qual=None if i % 5 == 0 else i / 7.0,
            filter=["PASS"], info={"DP": i, "AF": [0.5] if i % 2 else [0.25, 0.25]},
            genotype_format=["GT", "PL"],
            genotypes=[Genotype(gt=[0, 1], data={"PL": [i, 0, i + 1]})]))
    data = vcf.format_vcf(hdr, variants)
    hdr2, parsed = vcf.parse_vcf(data)
    assert len(parsed) == 401
    assert vcf.format_vcf(hdr2, parsed) == data
